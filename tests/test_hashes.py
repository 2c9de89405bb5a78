"""Batched keccak / sha256 / poseidon2 / merkle kernel tests."""

import hashlib

import numpy as np
import jax.numpy as jnp

from raiko_tpu.fields import babybear as bb
from raiko_tpu.ops import keccak as ktpu
from raiko_tpu.ops import merkle
from raiko_tpu.ops import poseidon2 as p2
from raiko_tpu.ops import sha256 as stpu
from raiko_tpu.utils.keccak_py import keccak256 as keccak_host

RNG = np.random.default_rng(7)


def test_keccak_batch_vs_host():
    msgs = [
        b"",
        b"abc",
        b"a" * 135,
        b"b" * 136,  # exactly one rate block -> two-block padded
        b"c" * 137,
        RNG.bytes(500),
        b"x" * 32,
        b"y" * 64,
    ]
    got = ktpu.keccak256_tpu(msgs)
    for m, g in zip(msgs, got):
        assert g == keccak_host(m), m[:8]


def test_keccak_fixed_device_path():
    data = RNG.integers(0, 256, size=(5, 64), dtype=np.uint8)
    digs = np.asarray(ktpu.keccak256_fixed(jnp.asarray(data)))
    raw = digs.astype("<u4").tobytes()
    for i in range(5):
        assert raw[32 * i : 32 * i + 32] == keccak_host(data[i].tobytes())


def test_sha256_batch_vs_hashlib():
    msgs = [b"", b"abc", b"a" * 55, b"b" * 56, b"c" * 64, RNG.bytes(300)]
    got = stpu.sha256_tpu(msgs)
    for m, g in zip(msgs, got):
        assert g == hashlib.sha256(m).digest()


def test_sha256_constants_are_standard():
    # classic spot checks of the derived tables
    assert int(stpu.K[0]) == 0x428A2F98
    assert int(stpu.K[63]) == 0xC67178F2
    assert int(stpu.H0[0]) == 0x6A09E667
    assert int(stpu.H0[7]) == 0x5BE0CD19


def test_poseidon2_permutation_properties():
    x = bb.to_mont(jnp.asarray(RNG.integers(0, bb.P, (3, 16), np.uint32)))
    y = p2.permute(x)
    assert y.shape == (3, 16)
    # deterministic
    y2 = p2.permute(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # different inputs -> different outputs
    assert not np.array_equal(np.asarray(y[0]), np.asarray(y[1]))
    # outputs in range
    assert (np.asarray(bb.from_mont(y)) < bb.P).all()


def test_poseidon2_golden_pin():
    """Pin the derived parameterization so it can never silently drift."""
    zero = jnp.zeros((1, 16), dtype=jnp.uint32)
    out = np.asarray(bb.from_mont(p2.permute(zero)))[0]
    # recorded at first generation; any change to constant derivation,
    # matrix structure, or round counts breaks this
    pinned = getattr(test_poseidon2_golden_pin, "_pinned", None)
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "golden", "poseidon2_zero.json")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump([int(v) for v in out], f)
    with open(path) as f:
        expected = json.load(f)
    assert [int(v) for v in out] == expected


def test_poseidon2_compress_and_hash_rows():
    a = bb.to_mont(jnp.asarray(RNG.integers(0, bb.P, (4, 8), np.uint32)))
    b = bb.to_mont(jnp.asarray(RNG.integers(0, bb.P, (4, 8), np.uint32)))
    c = p2.compress(a, b)
    assert c.shape == (4, 8)
    rows = bb.to_mont(jnp.asarray(RNG.integers(0, bb.P, (4, 20), np.uint32)))
    d = p2.hash_rows(rows)
    assert d.shape == (4, 8)
    # width domain separation: same data zero-padded to a longer width must
    # hash differently
    rows24 = jnp.concatenate([rows, jnp.zeros((4, 4), jnp.uint32)], axis=1)
    d24 = p2.hash_rows(rows24)
    assert not np.array_equal(np.asarray(d), np.asarray(d24))


def test_merkle_commit_and_paths():
    n = 32
    leaves = bb.to_mont(jnp.asarray(RNG.integers(0, bb.P, (n, 8), np.uint32)))
    levels = merkle.commit(leaves)
    assert len(levels) == 6
    rt = np.asarray(merkle.root(levels))
    for idx in [0, 1, 17, 31]:
        path = merkle.open_path(levels, idx)
        assert merkle.verify_path(np.asarray(leaves[idx]), idx, path, rt)
    # tampered leaf fails
    bad = np.asarray(leaves[3]).copy()
    bad[0] ^= 1
    path = merkle.open_path(levels, 3)
    assert not merkle.verify_path(bad, 3, path, rt)
    # wrong index fails
    assert not merkle.verify_path(np.asarray(leaves[3]), 4, path, rt)


def test_merkle_open_paths_batched_matches_single():
    import numpy as np
    import jax.numpy as jnp
    from raiko_tpu.fields import babybear as bb
    from raiko_tpu.ops import merkle, poseidon2 as p2

    rng = np.random.default_rng(3)
    leaves = p2.hash_rows(
        bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (64, 8), np.uint32)))
    )
    levels = merkle.commit(leaves)
    idxs = [0, 5, 31, 63, 5]
    batched = merkle.open_paths(levels, idxs)  # standard form (wire format)
    for i, idx in enumerate(idxs):
        single = merkle.open_path(levels, idx)  # Montgomery form
        assert all(
            (a == np.asarray(bb.from_mont(jnp.asarray(b)))).all()
            for a, b in zip(batched[i], single)
        )
        # host path walk over the standard-form path reaches the root
        from raiko_tpu.ops.poseidon2 import host_compress

        cur = np.asarray(bb.from_mont(levels[0][idx])).tolist()
        k = idx
        for sib in batched[i]:
            s = sib.tolist()
            cur = host_compress(s, cur) if k & 1 else host_compress(cur, s)
            k >>= 1
        assert cur == np.asarray(bb.from_mont(merkle.root(levels))).tolist()
