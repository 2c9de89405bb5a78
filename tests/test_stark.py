"""End-to-end STARK prove/verify + soundness (tamper) tests."""

import copy

import numpy as np
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.fields import babybear_ext as ef
from raiko_tpu.stark import prover, verifier
from raiko_tpu.stark.airs.fib import FibAir


@pytest.fixture(scope="module")
def fib_proof():
    air = FibAir()
    trace, publics = FibAir.trace(6)
    proof = prover.prove(air, trace, publics)
    return air, trace, publics, proof


def test_ext_field():
    # x^4 = 11 in the extension; inverse round-trips
    x = (0, 1, 0, 0)
    x4 = ef.h_pow(x, 4)
    assert x4 == (11, 0, 0, 0)
    a = (123456, 789, 2013265920, 42)
    assert ef.h_mul(a, ef.h_inv(a)) == ef.H_ONE
    # device/host agreement
    b = (5, 6, 7, 8)
    dev = ef.from_device(ef.ef_mul(ef.to_device([a]), ef.to_device([b])))[0]
    assert dev == ef.h_mul(a, b)


def test_prove_verify_roundtrip(fib_proof):
    air, _, _, proof = fib_proof
    assert verifier.verify(air, proof)


def test_wrong_publics_rejected(fib_proof):
    air, trace, publics, _ = fib_proof
    bad = list(publics)
    bad[2] = (bad[2] + 1) % bb.P
    proof = prover.prove(air, trace, bad)
    assert not verifier.verify(air, proof)


def test_tampered_trace_rejected(fib_proof):
    air, trace, publics, _ = fib_proof
    bad_trace = trace.copy()
    bad_trace[13, 0] = (int(bad_trace[13, 0]) + 1) % bb.P
    proof = prover.prove(air, bad_trace, publics)
    assert not verifier.verify(air, proof)


def test_tampered_proof_fields_rejected(fib_proof):
    air, _, _, proof = fib_proof
    p = copy.deepcopy(proof)
    p.trace_at_zeta = [list(v) for v in p.trace_at_zeta]
    p.trace_at_zeta[0][0] = (p.trace_at_zeta[0][0] + 1) % bb.P
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.queries[0]["trace_row"][0] = (p.queries[0]["trace_row"][0] + 1) % bb.P
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.fri_proof.final_values[0] = tuple(
        (v + 1) % bb.P for v in p.fri_proof.final_values[0]
    )
    assert not verifier.verify(air, p)

    p = copy.deepcopy(proof)
    p.quotient_root[0] = (p.quotient_root[0] + 1) % bb.P
    assert not verifier.verify(air, p)


def test_sparse_fixed_eval_matches_interpolation():
    """_eval_fixed_at (sparse Lagrange, device-free) must agree with the
    dense NTT-interpolation route the prover uses."""
    import jax.numpy as jnp

    from raiko_tpu.ops import ntt
    from raiko_tpu.stark.domain import Domain
    from raiko_tpu.stark.prover import _ef_dot, _ef_powers_device
    from raiko_tpu.stark.verifier import _eval_fixed_at

    rng = np.random.default_rng(7)
    n = 64
    dom = Domain(n.bit_length() - 1)
    # sparse bit-style columns + one dense column + one all-zero column
    fixed = np.zeros((5, n), dtype=np.uint32)
    fixed[0, rng.choice(n, 9, replace=False)] = 1
    fixed[1, rng.choice(n, 3, replace=False)] = rng.integers(1, bb.P, 3)
    fixed[2] = rng.integers(0, bb.P, n)
    fixed[4, 0] = bb.P - 1
    zeta = tuple(int(v) for v in rng.integers(0, bb.P, 4))
    got = _eval_fixed_at(fixed, zeta, dom)
    coeffs = ntt.interpolate(bb.to_mont(jnp.asarray(fixed)))
    want = ef.from_device(_ef_dot(coeffs, _ef_powers_device(zeta, n)))
    assert got == want


def test_proof_is_succinct(fib_proof):
    """The proof must not contain the trace itself (spot size check)."""
    _, trace, _, proof = fib_proof
    n_query_vals = sum(len(q["trace_row"]) for q in proof.queries)
    assert n_query_vals < trace.size  # opens far fewer values than the trace
