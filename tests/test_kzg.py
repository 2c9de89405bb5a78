"""EIP-4844 KZG path: golden vectors from the reference + pairing checks.

The zero-blob versioned hash is the reference's own committed test vector
(lib/src/primitives/eip4844.rs:148-160); the v%64 workload mirrors its
test_verify_kzg_proof / test_verify_kzg_proof_in_precompile (:161-214).
"""

import numpy as np
import pytest

from raiko_tpu.kzg import eip4844 as e
from raiko_tpu.kzg import host_curve as hc

BLOB_PATTERN = bytes(v % 64 for v in range(e.BYTES_PER_BLOB))


def test_zero_blob_versioned_hash_golden():
    c = e.blob_to_kzg_commitment(bytes(e.BYTES_PER_BLOB), use_tpu=False)
    vh = e.commitment_to_version_hash(c)
    assert (
        vh.hex()
        == "010657f37554c781402a22917dee2f75def7ab966d7b770905398eba3c444014"
    )


def test_all_ones_blob_commits_to_generator():
    # evaluation form all-1 => p(X) = 1 => commitment = G1 generator
    one = (1).to_bytes(32, "big")
    blob = one * e.FIELD_ELEMENTS_PER_BLOB
    c = e.blob_to_kzg_commitment(blob, use_tpu=False)
    assert hc.g1_decompress(c) == hc.G1_GEN


def test_blob_validation():
    with pytest.raises(e.Eip4844Error):
        e.blob_to_field_elements(b"\x00" * 100)
    bad = bytearray(e.BYTES_PER_BLOB)
    bad[:32] = e.BLS_MODULUS.to_bytes(32, "big")  # == modulus: out of range
    with pytest.raises(e.Eip4844Error):
        e.blob_to_field_elements(bytes(bad))


def test_prove_verify_cycle():
    x = e.hash_to_bls_field(bytes([5] * 32))
    c = e.blob_to_kzg_commitment(BLOB_PATTERN, use_tpu=False)
    proof, y = e.compute_kzg_proof(BLOB_PATTERN, x, use_tpu=False)
    assert e.verify_kzg_proof(c, x, y, proof)
    assert not e.verify_kzg_proof(c, x, (y + 1) % e.BLS_MODULUS, proof)
    # proof for a different point fails against this (x, y)
    proof6, _ = e.compute_kzg_proof(
        BLOB_PATTERN, e.hash_to_bls_field(bytes([6] * 32)), use_tpu=False
    )
    assert not e.verify_kzg_proof(c, x, y, proof6)


def test_proof_at_domain_point():
    # z equal to a root of unity exercises the special quotient row
    z = e.setup()["roots_brp"][3]
    fields = e.blob_to_field_elements(BLOB_PATTERN)
    c = e.blob_to_kzg_commitment(BLOB_PATTERN, use_tpu=False)
    proof, y = e.compute_kzg_proof(BLOB_PATTERN, z, use_tpu=False)
    assert y == fields[3]
    assert e.verify_kzg_proof(c, z, y, proof)


def test_point_evaluation_precompile():
    x = e.hash_to_bls_field(bytes([5] * 32))
    c = e.blob_to_kzg_commitment(BLOB_PATTERN, use_tpu=False)
    proof, y = e.compute_kzg_proof(BLOB_PATTERN, x, use_tpu=False)
    vh = e.commitment_to_version_hash(c)
    inp = vh + x.to_bytes(32, "big") + y.to_bytes(32, "big") + c + proof
    out = e.point_evaluation_precompile(inp)
    assert out == e.FIELD_ELEMENTS_PER_BLOB_BYTES + e.BLS_MODULUS_BYTES
    # corrupted y
    bad = vh + x.to_bytes(32, "big") + ((y + 1) % e.BLS_MODULUS).to_bytes(32, "big") + c + proof
    assert e.point_evaluation_precompile(bad) is None
    # wrong versioned hash
    bad_vh = bytes(32) + inp[32:]
    assert e.point_evaluation_precompile(bad_vh) is None
    # wrong length
    assert e.point_evaluation_precompile(inp[:191]) is None


def test_proof_of_equivalence_deterministic():
    vh = e.commitment_to_version_hash(
        e.blob_to_kzg_commitment(BLOB_PATTERN, use_tpu=False)
    )
    x1, y1 = e.proof_of_equivalence(BLOB_PATTERN, vh)
    x2, y2 = e.proof_of_equivalence(BLOB_PATTERN, vh)
    assert (x1, y1) == (x2, y2)
    assert len(x1) == len(y1) == 32
    # evaluation really is the barycentric value at x
    fields = e.blob_to_field_elements(BLOB_PATTERN)
    y = e.evaluate_polynomial_in_evaluation_form(
        fields, int.from_bytes(x1, "big")
    )
    assert y == int.from_bytes(y1, "big")


def test_blob_to_limbs_matches_int_path():
    rng = np.random.default_rng(8)
    blob = b"".join(
        (int.from_bytes(rng.bytes(31), "big")).to_bytes(32, "big")
        for _ in range(e.FIELD_ELEMENTS_PER_BLOB)
    )
    limbs = e.blob_to_limbs(blob)
    fields = e.blob_to_field_elements(blob)
    from raiko_tpu.ops import msm as msmmod

    assert np.array_equal(limbs, msmmod.scalars_to_limbs(fields))
    # out-of-range element rejected at the right index
    bad = bytearray(blob)
    bad[32 * 7 : 32 * 8] = e.BLS_MODULUS.to_bytes(32, "big")
    with pytest.raises(e.Eip4844Error, match="element 7"):
        e.blob_to_limbs(bytes(bad))


from conftest import subprocess_isolated


@pytest.mark.slow
@subprocess_isolated
def test_tpu_msm_matches_host():
    """Tiny MSM through the full TPU Pippenger pipeline."""
    import jax.numpy as jnp

    from raiko_tpu.kzg import curve
    from raiko_tpu.ops import msm as msmmod

    rng = np.random.default_rng(5)
    n = 8
    scalars = [int.from_bytes(rng.bytes(32), "big") % hc.R for _ in range(n)]
    pts = [hc.g1_mul(hc.G1_GEN, int(rng.integers(1, 1 << 62))) for _ in range(n)]
    pts[3] = None
    scalars[5] = 0
    res = msmmod.msm(
        jnp.asarray(curve.points_from_affine(pts)),
        jnp.asarray(msmmod.scalars_to_limbs(scalars)),
    )
    assert curve.to_affine(np.asarray(res)) == hc.g1_msm(pts, scalars)


@pytest.mark.slow
@subprocess_isolated
def test_tpu_msm_multi_matches_host():
    """Batched multi-MSM (shared points, B scalar vectors) vs host."""
    import jax.numpy as jnp

    from raiko_tpu.kzg import curve
    from raiko_tpu.ops import msm as msmmod

    rng = np.random.default_rng(6)
    n, b = 8, 3
    pts = [hc.g1_mul(hc.G1_GEN, int(rng.integers(1, 1 << 62))) for _ in range(n)]
    pts[2] = None
    scal = [
        [int.from_bytes(rng.bytes(32), "big") % hc.R for _ in range(n)]
        for _ in range(b)
    ]
    scal[1][4] = 0
    limbs = np.stack([msmmod.scalars_to_limbs(s) for s in scal])
    res = np.asarray(
        msmmod.msm_multi(
            jnp.asarray(curve.points_from_affine(pts)), jnp.asarray(limbs)
        )
    )
    for i in range(b):
        assert curve.to_affine(res[i]) == hc.g1_msm(pts, scal[i])
