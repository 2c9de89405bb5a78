"""Pallas secp256k1 Shamir ladder: the whole 256-iteration double-scalar
multiplication in VMEM.

Role: the device half of batched ecrecover (ops/secp.py) — the TPU-native
replacement for the reference's patched secp256k1 crate's per-tx recovery
(lib/src/builder.rs:108-110).  The XLA ladder (ops/secp._shamir) issues
256 sequential double+add steps as separate HBM-roundtripping fusions;
at block-sized batches (~256 lanes) each step's multiplies are far too
small to fill the VPU and the ladder is latency-bound (~240 tx/s
measured).  Here the accumulator, the 4-entry per-lane window table, and
the scalar bit planes all live in VMEM for the entire ladder, so the 256
iterations run back-to-back at ALU speed.

Design (mirrors ops/ec_pallas.py at 16 limbs, b3 = 21):
* limbs-major (16, W) planes in-kernel; the batch axis fills VPU lanes.
* CIOS with fully deferred carries: 16-bit limbs, accumulator columns
  stay < 2^22 over the 16 reduction steps, one Kogge-Stone carry pass
  per multiply.
* lane-stacked multiplies: the 6 (add) / 4 (double) independent products
  of each RCB15 layer concatenate on the lane axis into one CIOS sweep.
* the per-iteration table select is a 4-way masked sum (no dynamic
  gather inside the kernel).

Bit-exact with ops/secp.py's XLA ladder (tests/test_secp_tpu.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import LimbField
from ..utils import secp256k1 as host

NLIMBS = 16
MASK16 = np.uint32(0xFFFF)
FP = LimbField(host.P, NLIMBS)
_NPRIME = np.uint32(FP.NPRIME)
_TILE = 256  # lanes (signatures) per kernel invocation


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# -- limbs-major field helpers: arrays are (16, W) u32 ----------------------


def _shift_down(x, d, fill=0):
    return jnp.pad(x[:-d, :], ((d, 0), (0, 0)), constant_values=fill)


def _ks_carry(g, p):
    d = 1
    while d < NLIMBS:
        g = g | (p & _shift_down(g, d, 0))
        p = p & _shift_down(p, d, 1)
        d <<= 1
    return g


def _carry_norm(s):
    # the top limb's high half carries past the last position; for
    # moduli within a bit of 2^(16n) (secp256k1: 2p > 2^256) it is
    # routinely nonzero and must flow into the top carry, not vanish
    # (fields/limbs.py documents the same bound; the 24-limb BLS kernel
    # never hits it because p is far below 2^384)
    dropped = s[-1:, :] >> 16
    s = (s & MASK16) + _shift_down(s >> 16, 1)
    g = s >> 16
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    carry = _ks_carry(g, p)
    return (s + _shift_down(carry, 1)) & MASK16, carry[-1:, :] + dropped


def _sub_limbs(a, b):
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    borrow = _ks_carry(g, p)
    diff = (a + jnp.uint32(0x10000) - b - _shift_down(borrow, 1)) & MASK16
    return diff, borrow[-1:, :]


def _sub_if_ge(a, pcol, top_extra=None):
    diff, borrow = _sub_limbs(a, jnp.broadcast_to(pcol, a.shape))
    ge = borrow == 0
    if top_extra is not None:
        ge = ge | (top_extra > 0)
    return jnp.where(ge, diff, a)


def _addf(a, b, pcol):
    s, carry = _carry_norm(a + b)
    return _sub_if_ge(s, pcol, top_extra=carry)


def _subf(a, b, pcol):
    diff, borrow = _sub_limbs(a, b)
    corrected, _ = _carry_norm(diff + jnp.broadcast_to(pcol, a.shape))
    return jnp.where(borrow != 0, corrected, diff)


def _mont_mul(a, b, pcol):
    """CIOS Montgomery product over (16, W); columns < 2^22, carries
    deferred to one final normalization."""
    w = a.shape[1]
    acc = jnp.zeros((NLIMBS + 2, w), jnp.uint32)
    for i in range(NLIMBS):
        t = a[i : i + 1, :] * b
        acc = (
            acc
            + jnp.pad(t & MASK16, ((0, 2), (0, 0)))
            + jnp.pad(t >> 16, ((1, 1), (0, 0)))
        )
        m = ((acc[0:1, :] & MASK16) * _NPRIME) & MASK16
        u = m * pcol
        acc = (
            acc
            + jnp.pad(u & MASK16, ((0, 2), (0, 0)))
            + jnp.pad(u >> 16, ((1, 1), (0, 0)))
        )
        carry = acc[0:1, :] >> 16
        acc = jnp.concatenate(
            [acc[1:2, :] + carry, acc[2:, :], jnp.zeros((1, w), jnp.uint32)],
            axis=0,
        )
    res, top = _carry_norm(acc[:NLIMBS, :])
    return _sub_if_ge(res, pcol, top_extra=top + acc[NLIMBS : NLIMBS + 1, :])


# -- RCB15 complete formulas, a = 0, b3 = 21 --------------------------------


def _cat(*xs):
    return jnp.concatenate(xs, axis=1)


def _split(x, k):
    w = x.shape[1] // k
    return [x[:, i * w : (i + 1) * w] for i in range(k)]


def _ec_add_lm(X1, Y1, Z1, X2, Y2, Z2, pcol):
    """Complete projective addition; mirrors ops/secp.py:add
    (21x computed as 24x - 3x)."""
    sA = _addf(_cat(X1, X2, Y1, Y2, X1, X2), _cat(Y1, Y2, Z1, Z2, Z1, Z2), pcol)
    a0, a1, a2, a3, a4, a5 = _split(sA, 6)
    m1 = _mont_mul(_cat(X1, Y1, Z1, a0, a2, a4), _cat(X2, Y2, Z2, a1, a3, a5), pcol)
    t0, t1, t2, s1, s2, s3 = _split(m1, 6)
    u = _addf(_cat(t0, t1, t0), _cat(t1, t2, t2), pcol)
    v = _subf(_cat(s1, s2, s3), u, pcol)
    t3, t4, y3a = _split(v, 3)
    # constant chains: 3*t0, 21*t2, 21*y3a  (21x = 24x - 3x)
    x1s = _cat(t0, t2, y3a)
    x2s = _addf(x1s, x1s, pcol)
    x3s = _addf(x2s, x1s, pcol)  # 3x
    t0b, t2_3, y3_3 = _split(x3s, 3)
    pair3 = _cat(t2_3, y3_3)
    x6 = _addf(pair3, pair3, pcol)
    x12 = _addf(x6, x6, pcol)
    x24 = _addf(x12, x12, pcol)
    x21 = _subf(x24, pair3, pcol)
    t2b, y3b = _split(x21, 2)
    z3a = _addf(t1, t2b, pcol)
    t1b = _subf(t1, t2b, pcol)
    m2 = _mont_mul(
        _cat(t4, t3, y3b, t1b, t0b, z3a), _cat(y3b, t1b, t0b, z3a, t3, t4), pcol
    )
    p0, p1, p2, p3, p4, p5 = _split(m2, 6)
    X3 = _subf(p1, p0, pcol)
    yz = _addf(_cat(p3, p5), _cat(p2, p4), pcol)
    Y3, Z3 = _split(yz, 2)
    return X3, Y3, Z3


def _ec_double_lm(X, Y, Z, pcol):
    """Complete projective doubling; mirrors ops/secp.py:double
    (21x = 16x + 4x + x)."""
    m1 = _mont_mul(_cat(Y, Y, Z, X), _cat(Y, Z, Z, Y), pcol)
    t0, t1, t2, txy = _split(m1, 4)
    z3 = _addf(t0, t0, pcol)
    z3 = _addf(z3, z3, pcol)
    z3 = _addf(z3, z3, pcol)  # 8*Y^2
    x2 = _addf(t2, t2, pcol)
    x4 = _addf(x2, x2, pcol)
    x8 = _addf(x4, x4, pcol)
    x16 = _addf(x8, x8, pcol)
    t2b = _addf(_addf(x16, x4, pcol), t2, pcol)
    y3a = _addf(t0, t2b, pcol)
    t2x3 = _addf(_addf(t2b, t2b, pcol), t2b, pcol)
    t0b = _subf(t0, t2x3, pcol)
    m2 = _mont_mul(_cat(t2b, t1, t0b, t0b), _cat(z3, z3, y3a, txy), pcol)
    q0, q1, q2, q3 = _split(m2, 4)
    X3 = _addf(q3, q3, pcol)
    Y3 = _addf(q0, q2, pcol)
    return X3, Y3, q1


# -- the ladder kernel ------------------------------------------------------


def _ladder_kernel(table_ref, idx_ref, pp_ref, one_ref, o_ref):
    """One full 256-iteration Shamir ladder for a tile of T lanes.

    table_ref: (T, 4, 3, 16)  [∞, R, -G, R-G] per lane
    idx_ref:   (256, T)       window index per iteration (0..3), MSB first
    pp_ref/one_ref: (16, 1)   modulus / Montgomery one limb columns
    o_ref:     (T, 3, 16)     resulting projective points
    """
    pcol = pp_ref[:]  # (16, 1)
    tab = table_ref[:]  # (T, 4, 3, 16)
    # limbs-major planes per table entry: tX[e], tY[e], tZ[e] are (16, T)
    tX = [tab[:, e, 0, :].T for e in range(4)]
    tY = [tab[:, e, 1, :].T for e in range(4)]
    tZ = [tab[:, e, 2, :].T for e in range(4)]
    T = tab.shape[0]
    X0 = jnp.zeros((NLIMBS, T), jnp.uint32)
    Y0 = jnp.broadcast_to(one_ref[:], (NLIMBS, T))
    Z0 = jnp.zeros((NLIMBS, T), jnp.uint32)

    def body(k, carry):
        X, Y, Z = carry
        X, Y, Z = _ec_double_lm(X, Y, Z, pcol)
        row = idx_ref[pl.ds(k, 1), :]  # (1, T) dynamic row load
        Xa = jnp.zeros_like(X)
        Ya = jnp.zeros_like(Y)
        Za = jnp.zeros_like(Z)
        for e in range(4):
            m = row == np.uint32(e)  # (1, T) broadcasts over limbs
            Xa = jnp.where(m, tX[e], Xa)
            Ya = jnp.where(m, tY[e], Ya)
            Za = jnp.where(m, tZ[e], Za)
        return _ec_add_lm(X, Y, Z, Xa, Ya, Za, pcol)

    X, Y, Z = jax.lax.fori_loop(0, 256, body, (X0, Y0, Z0))
    o_ref[:] = jnp.stack([X.T, Y.T, Z.T], axis=1)


def _pad_lanes(x, tile, axis=0):
    pad = (-x.shape[axis]) % tile
    if pad:
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        x = jnp.pad(x, widths)
    return x


@functools.partial(jax.jit, static_argnames=())
def shamir_ladder(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched u1*T1 + u2*T2 via one VMEM-resident ladder per tile.

    table: (B, 4, 3, 16) u32 Montgomery projective [∞, T1, T2, T1+T2]
    idx:   (256, B) u32 in 0..3, bit k of (u1, u2) packed as b1 + 2*b2,
           MSB first.
    Returns (B, 3, 16) projective points; bit-exact with
    ops/secp._shamir.
    """
    assert table.shape[1:] == (4, 3, NLIMBS)
    assert idx.shape[0] == 256 and idx.shape[1] == table.shape[0]
    b = table.shape[0]
    tile = min(_TILE, max(8, b))
    tablep = _pad_lanes(table, tile, axis=0)
    idxp = _pad_lanes(idx, tile, axis=1)
    # padding lanes run the ladder on table entry 0 = ∞: harmless
    out = pl.pallas_call(
        _ladder_kernel,
        out_shape=jax.ShapeDtypeStruct((tablep.shape[0], 3, NLIMBS), jnp.uint32),
        grid=(tablep.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec(
                (tile, 4, 3, NLIMBS), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((256, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 3, NLIMBS), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(
        tablep,
        idxp,
        jnp.asarray(FP.p_limbs)[:, None],
        jnp.asarray(np.asarray(FP.to_mont_int(1), dtype=np.uint32))[:, None],
    )
    return out[:b]
