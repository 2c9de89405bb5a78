"""Batched secp256k1 ECDSA recovery on TPU.

Role: transaction sender recovery is one ecrecover per tx (reference
lib/src/builder.rs:108-110 `with_recovered_senders`, patched secp256k1
crate; SURVEY.md §2.2 "batched ecrecover kernel (per-tx parallel)").
Recovery is embarrassingly parallel across transactions, so the block's
whole signature set runs as ONE device launch.

TPU-first design
----------------
secp256k1 is an a = 0 short-Weierstrass curve like BLS12-381 G1, so the
same Renes–Costello–Batina complete projective formulas apply with
b3 = 3·7 = 21 over a 16-limb (256-bit) Montgomery field
(fields/limbs.LimbField) — points are (..., 3, 16) u32 arrays and the
field multiplies are regrouped into two stacked ``mont_mul`` calls per
add/double exactly as in kzg/curve.py.

Recovery math per lane (Q = r^{-1}(s·R - e·G)):
  host: decompress R from (r, rec_id), u1 = s·r^{-1} mod n,
        u2 = e·r^{-1} mod n        (cheap exact int math, ~µs/tx)
  device: Q_i = u1_i·R_i + u2_i·(-G) for all lanes at once — Shamir's
        double-scalar ladder: 256 iterations of one batched double + one
        batched complete add, the addend gathered per lane from the
        4-entry table [∞, R, -G, R-G].  Completeness makes the ladder
        branch-free (adding ∞ is just the formula).
  host: batch-invert Z to affine, keccak-256 -> address.

Invalid signatures (range checks, non-residue x) are detected host-side
and their lanes replaced by dummies; callers get None back.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LimbField
from ..utils import secp256k1 as host

NLIMBS = 16
FP = LimbField(host.P, NLIMBS)

_MIN_LANES = 8


# -- point helpers (mirrors kzg/curve.py at 16 limbs) -----------------------


def identity(shape=()) -> jnp.ndarray:
    z = np.zeros((3, NLIMBS), dtype=np.uint32)
    z[1] = FP.to_mont_int(1)
    return jnp.broadcast_to(jnp.asarray(z), shape + (3, NLIMBS))


def make_point(x_int: int, y_int: int) -> np.ndarray:
    return np.stack(
        [FP.to_mont_int(x_int), FP.to_mont_int(y_int), FP.to_mont_int(1)]
    )


def to_affine(pt) -> tuple[int, int] | None:
    pt = np.asarray(pt)
    x = FP.from_mont_limbs(pt[0])
    y = FP.from_mont_limbs(pt[1])
    z = FP.from_mont_limbs(pt[2])
    if z == 0:
        return None
    zinv = pow(z, -1, host.P)
    return (x * zinv % host.P, y * zinv % host.P)


def select(mask, p, q):
    return jnp.where(mask[..., None, None], p, q)


def _stk(*xs):
    return jnp.stack(xs, axis=-2)


def add(p: jax.Array, q: jax.Array) -> jax.Array:
    """Complete projective addition (RCB15 Alg. 7, a=0, b3=21); same
    two-layer batched-mul structure as kzg/curve.add."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    sA = FP.add(_stk(X1, X2, Y1, Y2, X1, X2), _stk(Y1, Y2, Z1, Z2, Z1, Z2))
    m1 = FP.mont_mul(
        _stk(X1, Y1, Z1, sA[..., 0, :], sA[..., 2, :], sA[..., 4, :]),
        _stk(X2, Y2, Z2, sA[..., 1, :], sA[..., 3, :], sA[..., 5, :]),
    )
    t0, t1, t2 = m1[..., 0, :], m1[..., 1, :], m1[..., 2, :]
    s1, s2, s3 = m1[..., 3, :], m1[..., 4, :], m1[..., 5, :]
    u = FP.add(_stk(t0, t1, t0), _stk(t1, t2, t2))
    v = FP.sub(_stk(s1, s2, s3), u)
    t3, t4, y3a = v[..., 0, :], v[..., 1, :], v[..., 2, :]
    # constant chains: 3*t0, 21*t2, 21*y3a (21x = 24x - 3x)
    x1s = _stk(t0, t2, y3a)
    x2s = FP.add(x1s, x1s)  # 2x
    x3s = FP.add(x2s, x1s)  # 3x  (3t0 ready)
    pair3 = x3s[..., 1:3, :]
    x6 = FP.add(pair3, pair3)
    x12 = FP.add(x6, x6)
    x24 = FP.add(x12, x12)
    x21 = FP.sub(x24, pair3)
    t0b = x3s[..., 0, :]
    t2b = x21[..., 0, :]
    y3b = x21[..., 1, :]
    z3a = FP.add(t1, t2b)
    t1b = FP.sub(t1, t2b)
    m2 = FP.mont_mul(
        _stk(t4, t3, y3b, t1b, t0b, z3a),
        _stk(y3b, t1b, t0b, z3a, t3, t4),
    )
    X3 = FP.sub(m2[..., 1, :], m2[..., 0, :])
    yz = FP.add(
        _stk(m2[..., 3, :], m2[..., 5, :]), _stk(m2[..., 2, :], m2[..., 4, :])
    )
    return _stk(X3, yz[..., 0, :], yz[..., 1, :])


def double(p: jax.Array) -> jax.Array:
    """Complete projective doubling (RCB15 Alg. 9, a=0, b3=21)."""
    X, Y, Z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    m1 = FP.mont_mul(_stk(Y, Y, Z, X), _stk(Y, Z, Z, Y))
    t0, t1, t2, txy = (m1[..., i, :] for i in range(4))
    z3 = FP.add(t0, t0)
    z3 = FP.add(z3, z3)
    z3 = FP.add(z3, z3)  # 8*Y^2
    # t2b = 21*t2 = 16x + 4x + x
    x2 = FP.add(t2, t2)
    x4 = FP.add(x2, x2)
    x8 = FP.add(x4, x4)
    x16 = FP.add(x8, x8)
    t2b = FP.add(FP.add(x16, x4), t2)
    y3a = FP.add(t0, t2b)
    t2x3 = FP.add(FP.add(t2b, t2b), t2b)
    t0b = FP.sub(t0, t2x3)
    m2 = FP.mont_mul(_stk(t2b, t1, t0b, t0b), _stk(z3, z3, y3a, txy))
    X3 = FP.add(m2[..., 3, :], m2[..., 3, :])
    Y3 = FP.add(m2[..., 0, :], m2[..., 2, :])
    Z3 = m2[..., 1, :]
    return _stk(X3, Y3, Z3)


# -- Shamir double-scalar ladder --------------------------------------------


@jax.jit
def _shamir(table: jax.Array, bits1: jax.Array, bits2: jax.Array) -> jax.Array:
    """sum-per-lane of u1*T1 + u2*T2 with table = [∞, T1, T2, T1+T2].

    table: (B, 4, 3, 16); bits1/bits2: (256, B) uint32, MSB first.
    256 iterations; each is ONE batched double + ONE batched complete add.
    """
    bsz = table.shape[0]

    def body(k, acc):
        acc = double(acc)
        idx = bits1[k] + 2 * bits2[k]  # (B,) in 0..3
        addend = jnp.take_along_axis(
            table, idx[:, None, None, None].astype(jnp.int32), axis=1
        )[:, 0]
        return add(acc, addend)

    return jax.lax.fori_loop(0, 256, body, identity((bsz,)))


def _bits_msb(vals: list[int]) -> np.ndarray:
    """(256, B) uint32, out[k, b] = bit (255-k) of vals[b] (vectorized:
    the Python double loop cost ~0.1 s per 256-tx block)."""
    buf = b"".join(v.to_bytes(32, "big") for v in vals)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
    return bits.reshape(len(vals), 256).T.astype(np.uint32)


_NEG_G = (host.GX, host.P - host.GY)


def recover_pubkeys_batch(
    items: list[tuple[bytes, int, int, int]],
) -> list[tuple[int, int] | None]:
    """Batch of (msg_hash, r, s, rec_id) -> public-key points (or None).

    Exact drop-in for [host.recover_pubkey(*it) for it in items], with all
    the curve arithmetic in one device launch.
    """
    n = host.N
    lanes: list[dict | None] = []
    for msg_hash, r, s, rec_id in items:
        if not (1 <= r < n and 1 <= s < n) or rec_id not in (0, 1, 2, 3):
            lanes.append(None)
            continue
        x = r + (n if rec_id >= 2 else 0)
        if x >= host.P:
            lanes.append(None)
            continue
        y2 = (pow(x, 3, host.P) + 7) % host.P
        y = pow(y2, (host.P + 1) // 4, host.P)
        if y * y % host.P != y2:
            lanes.append(None)
            continue
        if (y & 1) != (rec_id & 1):
            y = host.P - y
        e = int.from_bytes(msg_hash, "big") % n
        r_inv = pow(r, -1, n)
        lanes.append(
            {"R": (x, y), "u1": s * r_inv % n, "u2": e * r_inv % n}
        )
    live = [ln for ln in lanes if ln is not None]
    if not live:
        return [None] * len(lanes)
    # pad to a power of two (>= _MIN_LANES) to bound jit specializations
    bsz = max(_MIN_LANES, 1 << (len(live) - 1).bit_length())
    dummy = {"R": host.G, "u1": 1, "u2": 1}
    padded = live + [dummy] * (bsz - len(live))

    table = np.zeros((bsz, 4, 3, NLIMBS), dtype=np.uint32)
    table[:, 0, 1] = FP.to_mont_int(1)  # ∞, built host-side (no dispatch)
    neg_g = make_point(*_NEG_G)
    for i, ln in enumerate(padded):
        table[i, 1] = make_point(*ln["R"])
        table[i, 2] = neg_g
    bits1 = _bits_msb([ln["u1"] for ln in padded])
    bits2 = _bits_msb([ln["u2"] for ln in padded])
    # ONE device dispatch: the table-completion add (entry 3 = R - G) and
    # the whole ladder fuse into a single jitted launch — through the TPU
    # relay each dispatch costs ~0.1-0.5 s fixed, which used to dwarf the
    # ~2-10 ms of actual device work (BASELINE.md ecrecover analysis)
    if jax.default_backend() == "tpu":
        # VMEM-resident Pallas ladder (ops/secp_pallas.py): the whole
        # 256-iteration chain at ALU speed; bit-exact with _shamir
        q = np.asarray(
            _recover_launch_tpu(jnp.asarray(table), jnp.asarray(bits1 + 2 * bits2))
        )
    else:
        q = np.asarray(
            _recover_launch_xla(
                jnp.asarray(table), jnp.asarray(bits1), jnp.asarray(bits2)
            )
        )

    out: list[tuple[int, int] | None] = []
    li = 0
    for ln in lanes:
        if ln is None:
            out.append(None)
        else:
            out.append(to_affine(q[li]))
            li += 1
    return out


@jax.jit
def _recover_launch_tpu(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Complete the window table (entry 3 = R + (-G)) and run the Pallas
    ladder in one compiled launch."""
    from . import secp_pallas

    table = table.at[:, 3].set(add(table[:, 1], table[:, 2]))
    return secp_pallas.shamir_ladder(table, idx)


@jax.jit
def _recover_launch_xla(
    table: jax.Array, bits1: jax.Array, bits2: jax.Array
) -> jax.Array:
    table = table.at[:, 3].set(add(table[:, 1], table[:, 2]))
    return _shamir(table, bits1, bits2)


def use_device_recovery() -> bool:
    """Policy: batch on device when running on real TPU, or when forced
    (RAIKO_TPU_ECRECOVER=1).  On the CPU backend the host path wins for
    typical block sizes once compile time is counted."""
    flag = os.environ.get("RAIKO_TPU_ECRECOVER")
    if flag is not None:
        return flag not in ("0", "false", "no")
    return jax.default_backend() == "tpu"
