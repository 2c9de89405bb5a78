"""Batched TPU secp256k1 recovery vs the host reference implementation."""

import numpy as np
import pytest

from raiko_tpu.utils import secp256k1 as host
from conftest import subprocess_isolated


@subprocess_isolated
def test_point_formulas_match_host():
    import jax.numpy as jnp

    from raiko_tpu.ops import secp

    rng = np.random.default_rng(21)
    pts = [host._mul(host.G, int(rng.integers(1, 1 << 62))) for _ in range(6)]
    dev = jnp.asarray(np.stack([secp.make_point(*p) for p in pts]))
    # pairwise adds (includes P+P handled by completeness? no: distinct)
    got = secp.add(dev[:3], dev[3:])
    for i in range(3):
        assert secp.to_affine(np.asarray(got[i])) == host._add(pts[i], pts[3 + i])
    # doubling
    got2 = secp.double(dev)
    for i in range(6):
        assert secp.to_affine(np.asarray(got2[i])) == host._add(pts[i], pts[i])
    # identity handling (complete formulas)
    idn = secp.identity((3,))
    got3 = secp.add(dev[:3], idn)
    for i in range(3):
        assert secp.to_affine(np.asarray(got3[i])) == pts[i]


@subprocess_isolated
def test_batch_sender_recovery_matches_per_tx(monkeypatch):
    """execute.py's batched sender path == per-tx recover_sender."""
    from raiko_tpu.evm import execute
    from raiko_tpu.proto.types import Transaction

    monkeypatch.setenv("RAIKO_TPU_ECRECOVER", "1")
    rng = np.random.default_rng(23)
    txs = []
    for i in range(17):
        tx = Transaction(
            tx_type=2,
            chain_id=167001,
            nonce=i,
            max_fee_per_gas=10**9,
            gas_limit=21000,
            to=bytes(rng.integers(0, 256, 20, dtype=np.uint8)),
            value=int(rng.integers(0, 10**9)),
        )
        tx.sign(int(rng.integers(1, 1 << 62)))
        txs.append(tx)
    # corrupt one signature so an error lane is exercised
    txs[9].s = 1  # valid range but wrong signature -> wrong (not None) key
    txs[4].v = 7  # invalid y_parity -> ValueError slot
    got = execute._batch_recover_senders(txs)
    assert got is not None
    for i, tx in enumerate(txs):
        try:
            want = tx.recover_sender()
        except ValueError:
            assert isinstance(got[i], Exception)
            continue
        assert got[i] == want


@subprocess_isolated
def test_recover_batch_matches_host():
    from raiko_tpu.ops import secp

    rng = np.random.default_rng(22)
    items = []
    for i in range(5):
        secret = int(rng.integers(1, 1 << 62))
        h = rng.bytes(32)
        r, s, rec = host.sign(h, secret)
        items.append((h, r, s, rec))
    # one corrupted signature (x not on curve / wrong parity still recovers
    # a DIFFERENT key; make one definitively invalid: r = 0)
    items.append((rng.bytes(32), 0, 5, 0))
    got = secp.recover_pubkeys_batch(items)
    want = [host.recover_pubkey(*it) for it in items]
    assert got == want
    assert want[0] is not None and want[-1] is None


@subprocess_isolated
def test_pallas_limb_helpers_match_field():
    """The limbs-major field helpers of the Pallas ladder (16-limb CIOS,
    deferred carries) vs exact integer arithmetic — including values at
    the modulus boundary, where the top limb's high half overflows 2^256
    (the carry-loss class fields/limbs.py documents)."""
    import random

    import jax.numpy as jnp

    from raiko_tpu.ops import secp_pallas as sp

    random.seed(5)
    FP16 = sp.FP
    P = host.P
    pcol = jnp.asarray(FP16.p_limbs)[:, None]
    a = [random.randrange(P) for _ in range(12)] + [P - 1, P - 2, 1, 0]
    b = [random.randrange(P) for _ in range(12)] + [P - 1, 1, P - 1, 0]
    am = jnp.asarray(np.stack([FP16.to_mont_int(v) for v in a], axis=1))
    bm = jnp.asarray(np.stack([FP16.to_mont_int(v) for v in b], axis=1))

    def back(x):
        return [FP16.from_mont_limbs(np.asarray(x)[:, i]) for i in range(len(a))]

    assert back(sp._mont_mul(am, bm, pcol)) == [x * y % P for x, y in zip(a, b)]
    assert back(sp._addf(am, bm, pcol)) == [(x + y) % P for x, y in zip(a, b)]
    assert back(sp._subf(am, bm, pcol)) == [(x - y) % P for x, y in zip(a, b)]


@subprocess_isolated
def test_pallas_formulas_bitexact_with_xla():
    """_ec_add_lm/_ec_double_lm (limbs-major) vs secp.add/double:
    identical algebraic sequence, so outputs must be bit-identical."""
    import random

    import jax.numpy as jnp

    from raiko_tpu.ops import secp
    from raiko_tpu.ops import secp_pallas as sp

    random.seed(6)
    pcol = jnp.asarray(sp.FP.p_limbs)[:, None]
    pts = [
        secp.make_point(*host._mul(host.G, random.randrange(1, host.N)))
        for _ in range(8)
    ]
    P = jnp.asarray(np.stack(pts))
    Q = jnp.asarray(np.stack(pts[::-1]))

    def lm(pt):
        return pt[:, 0, :].T, pt[:, 1, :].T, pt[:, 2, :].T

    def back(X, Y, Z):
        return np.stack(
            [np.asarray(X).T, np.asarray(Y).T, np.asarray(Z).T], axis=1
        )

    assert np.array_equal(
        np.asarray(secp.double(P)), back(*sp._ec_double_lm(*lm(P), pcol))
    )
    assert np.array_equal(
        np.asarray(secp.add(P, Q)), back(*sp._ec_add_lm(*lm(P), *lm(Q), pcol))
    )
    # identity operand (completeness)
    identity = jnp.asarray(
        np.broadcast_to(np.asarray(secp.identity(())), (8, 3, 16))
    )
    assert np.array_equal(
        np.asarray(secp.add(P, identity)),
        back(*sp._ec_add_lm(*lm(P), *lm(identity), pcol)),
    )


@pytest.mark.slow
@subprocess_isolated
def test_pallas_ladder_bitexact_with_xla_shamir():
    """The full 256-iteration Pallas ladder (interpret mode on CPU) vs
    the XLA _shamir ladder — the production TPU path's correctness
    anchor."""
    import random

    import jax.numpy as jnp

    from raiko_tpu.ops import secp, secp_pallas

    random.seed(3)
    B = 8
    table = np.zeros((B, 4, 3, 16), dtype=np.uint32)
    table[:, 0, 1] = secp.FP.to_mont_int(1)
    for i in range(B):
        k = random.randrange(1, host.N)
        table[i, 1] = secp.make_point(*host._mul(host.G, k))
        table[i, 2] = secp.make_point(host.GX, host.P - host.GY)
    td = jnp.asarray(table)
    td = td.at[:, 3].set(secp.add(td[:, 1], td[:, 2]))
    u1 = [random.randrange(1, host.N) for _ in range(B)]
    u2 = [random.randrange(1, host.N) for _ in range(B)]
    bits1 = jnp.asarray(secp._bits_msb(u1))
    bits2 = jnp.asarray(secp._bits_msb(u2))
    ref = np.asarray(secp._shamir(td, bits1, bits2))
    got = np.asarray(secp_pallas.shamir_ladder(td, bits1 + 2 * bits2))
    assert np.array_equal(ref, got)
