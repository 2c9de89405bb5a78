"""Pallas BLS12-381 G1 point add/double: the whole RCB15 formula in VMEM.

Role: the EC-add inner loop of the Pippenger MSM (ops/msm.py) — the
TPU-native replacement for blst's assembly point ops (SURVEY.md §2.2) at
Pallas speed.  The XLA path (kzg/curve.py) materializes the (M, 24, 48)
schoolbook intermediates of every 24-limb Montgomery multiply through HBM
(~600 MB per multiply batch); here a tile of points is DMA'd to VMEM once,
all 12 field multiplies + adds of the complete-addition formula run on-chip
in a limbs-major (24, lanes) layout, and the tile is written back once.

Design
------
* **Limbs-major in-kernel layout.**  Global arrays stay (M, 3, 24)
  (limbs-minor: friendly to XLA gathers in the Pippenger sort/scan); the
  kernel transposes each coordinate tile to (24, T) so the batch axis fills
  VPU lanes and the limb axis sits on sublanes where CIOS column shifts are
  cheap pad/slice ops.
* **CIOS with deferred carries.**  16-bit limbs in u32 lanes: every partial
  product fits u32 exactly and accumulator columns stay < 2^23 across all
  24 reduction steps, so there is NO carry propagation inside the loop —
  one Kogge-Stone normalization at the end (mirrors fields/limbs.py, which
  documents the bound).
* **Lane-stacked multiplies.**  The 6 independent products of each RCB15
  layer concatenate along the LANE axis into one (24, 6T) multiply — the
  kernel runs exactly two CIOS sweeps per point addition.

Bit-exact with kzg/curve.py add/double (tests/test_limbs_curve.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import FP

NLIMBS = 24
MASK16 = np.uint32(0xFFFF)
_NPRIME = np.uint32(FP.NPRIME)
_TILE = 512  # points per kernel invocation (lanes = 512 per coordinate)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# limbs-major field helpers: arrays are (24, W) u32, limb axis on sublanes
# ---------------------------------------------------------------------------


def _shift_down(x, d, fill=0):
    """x[i] <- x[i-d] along the limb (first) axis."""
    return jnp.pad(x[:-d, :], ((d, 0), (0, 0)), constant_values=fill)


def _ks_carry(g, p):
    d = 1
    while d < NLIMBS:
        g = g | (p & _shift_down(g, d, 0))
        p = p & _shift_down(p, d, 1)
        d <<= 1
    return g


def _carry_norm(s):
    """Normalize (24, W) limbs < 2^31 to < 2^16; returns (limbs, top_carry)."""
    s = (s & MASK16) + _shift_down(s >> 16, 1)
    g = s >> 16
    p = ((s & MASK16) == MASK16).astype(jnp.uint32)
    carry = _ks_carry(g, p)
    return (s + _shift_down(carry, 1)) & MASK16, carry[-1:, :]


def _sub_limbs(a, b):
    """(a - b) limbwise with borrow lookahead; returns (diff, top_borrow)."""
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
    """CIOS Montgomery product over (24, W): a*b*R^-1 mod p, result < p.

    Accumulator columns stay < 2^23 (24 steps x 4 sixteen-bit halves), so
    carries are fully deferred to one final Kogge-Stone normalization.
    """
    w = a.shape[1]
    acc = jnp.zeros((NLIMBS + 2, w), jnp.uint32)
    for i in range(NLIMBS):
        t = a[i : i + 1, :] * b  # (24, W) exact u32 products
        acc = (
            acc
            + jnp.pad(t & MASK16, ((0, 2), (0, 0)))
            + jnp.pad(t >> 16, ((1, 1), (0, 0)))
        )
        m = ((acc[0:1, :] & MASK16) * _NPRIME) & MASK16
        u = m * pcol  # (24, W)
        acc = (
            acc
            + jnp.pad(u & MASK16, ((0, 2), (0, 0)))
            + jnp.pad(u >> 16, ((1, 1), (0, 0)))
        )
        # acc[0] = 0 mod 2^16 now; fold its high part into acc[1] and shift
        carry = acc[0:1, :] >> 16
        acc = jnp.concatenate(
            [acc[1:2, :] + carry, acc[2:, :], jnp.zeros((1, w), jnp.uint32)], axis=0
        )
    res, top = _carry_norm(acc[:NLIMBS, :])
    return _sub_if_ge(res, pcol, top_extra=top + acc[NLIMBS : NLIMBS + 1, :])


# ---------------------------------------------------------------------------
# RCB15 complete formulas on limbs-major coordinates
# ---------------------------------------------------------------------------


def _cat(*xs):
    return jnp.concatenate(xs, axis=1)


def _split(x, k):
    w = x.shape[1] // k
    return [x[:, i * w : (i + 1) * w] for i in range(k)]


def _ec_add_lm(X1, Y1, Z1, X2, Y2, Z2, pcol):
    """Complete projective addition (RCB15 Alg. 7, a=0, b3=12) over (24, T)
    coordinate planes.  Mirrors kzg/curve.py:add with lane-stacked layers."""
    sA = _addf(_cat(X1, X2, Y1, Y2, X1, X2), _cat(Y1, Y2, Z1, Z2, Z1, Z2), pcol)
    a0, a1, a2, a3, a4, a5 = _split(sA, 6)
    m1 = _mont_mul(_cat(X1, Y1, Z1, a0, a2, a4), _cat(X2, Y2, Z2, a1, a3, a5), pcol)
    t0, t1, t2, s1, s2, s3 = _split(m1, 6)
    u = _addf(_cat(t0, t1, t0), _cat(t1, t2, t2), pcol)
    v = _subf(_cat(s1, s2, s3), u, pcol)
    t3, t4, y3a = _split(v, 3)
    # b3 chains: 3*t0, 12*t2, 12*y3a via batched doublings
    d1 = _addf(_cat(t0, t2, y3a), _cat(t0, t2, y3a), pcol)
    d1a, d1b, d1c = _split(d1, 3)
    d2 = _addf(d1, _cat(t0, d1b, d1c), pcol)
    d2a, d2b, d2c = _split(d2, 3)
    d3 = _addf(_cat(d2b, d2c), _cat(d2b, d2c), pcol)
    d4 = _addf(d3, _cat(d2b, d2c), pcol)
    t0b = d2a
    t2b, y3b = _split(d4, 2)
    z3a = _addf(t1, t2b, pcol)
    t1b = _subf(t1, t2b, pcol)
    m2 = _mont_mul(_cat(t4, t3, y3b, t1b, t0b, z3a), _cat(y3b, t1b, t0b, z3a, t3, t4), pcol)
    p0, p1, p2, p3, p4, p5 = _split(m2, 6)
    X3 = _subf(p1, p0, pcol)
    yz = _addf(_cat(p3, p5), _cat(p2, p4), pcol)
    Y3, Z3 = _split(yz, 2)
    return X3, Y3, Z3


def _ec_double_lm(X, Y, Z, pcol):
    """Complete projective doubling (RCB15 Alg. 9, a=0, b3=12)."""
    m1 = _mont_mul(_cat(Y, Y, Z, X), _cat(Y, Z, Z, Y), pcol)
    t0, t1, t2, txy = _split(m1, 4)
    z3 = _addf(t0, t0, pcol)
    z3 = _addf(z3, z3, pcol)
    z3 = _addf(z3, z3, pcol)  # 8*Y^2
    # t2b = 12*t2
    t2_2 = _addf(t2, t2, pcol)
    t2_4 = _addf(t2_2, t2_2, pcol)
    t2_8 = _addf(t2_4, t2_4, pcol)
    t2b = _addf(t2_8, t2_4, pcol)
    y3a = _addf(t0, t2b, pcol)
    t2x3 = _addf(_addf(t2b, t2b, pcol), t2b, pcol)
    t0b = _subf(t0, t2x3, pcol)
    m2 = _mont_mul(_cat(t2b, t1, t0b, t0b), _cat(z3, z3, y3a, txy), pcol)
    q0, q1, q2, q3 = _split(m2, 4)
    X3 = _addf(q3, q3, pcol)
    Y3 = _addf(q0, q2, pcol)
    return X3, Y3, q1


# ---------------------------------------------------------------------------
# pallas kernels + public wrappers
# ---------------------------------------------------------------------------


def _coords_lm(ref_block):
    """(T, 3, 24) block -> three (24, T) coordinate planes."""
    return (
        ref_block[:, 0, :].T,
        ref_block[:, 1, :].T,
        ref_block[:, 2, :].T,
    )


def _store_lm(o_ref, X, Y, Z):
    o_ref[:] = jnp.stack([X.T, Y.T, Z.T], axis=1)


def _add_kernel(p_ref, q_ref, pp_ref, o_ref):
    pcol = pp_ref[:]  # (24, 1) modulus limbs
    X1, Y1, Z1 = _coords_lm(p_ref[:])
    X2, Y2, Z2 = _coords_lm(q_ref[:])
    _store_lm(o_ref, *_ec_add_lm(X1, Y1, Z1, X2, Y2, Z2, pcol))


def _double_kernel(p_ref, pp_ref, o_ref):
    pcol = pp_ref[:]
    X, Y, Z = _coords_lm(p_ref[:])
    _store_lm(o_ref, *_ec_double_lm(X, Y, Z, pcol))


def _pad_to_tile(x, tile):
    m = x.shape[0]
    pad = (-m) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    return x, m


@functools.partial(jax.jit, static_argnames=())
def ec_add(p: jax.Array, q: jax.Array) -> jax.Array:
    """Batched complete G1 addition, bit-exact with kzg/curve.py:add.

    p, q: (M, 3, 24) u32 Montgomery projective -> (M, 3, 24).
    """
    assert p.shape == q.shape and p.shape[-2:] == (3, NLIMBS)
    lead = p.shape[:-2]
    p2 = p.reshape((-1, 3, NLIMBS))
    q2 = q.reshape((-1, 3, NLIMBS))
    tile = min(_TILE, max(128, p2.shape[0]))
    p2, m = _pad_to_tile(p2, tile)
    q2, _ = _pad_to_tile(q2, tile)
    out = pl.pallas_call(
        _add_kernel,
        out_shape=jax.ShapeDtypeStruct(p2.shape, jnp.uint32),
        grid=(p2.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3, NLIMBS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, NLIMBS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 3, NLIMBS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(p2, q2, jnp.asarray(FP.p_limbs)[:, None])
    return out[:m].reshape(lead + (3, NLIMBS))


def _fold_kernel(v_ref, pp_ref, o_ref):
    """Horner fold  acc_b = Σ_j 2^j v_{b,j}  with the BATCH on lanes.

    v_ref: (J, 3, 24, B) — each lane runs an independent Horner chain, so
    the whole 2(J-1)-step double/add sequence is ONE kernel launch.
    Through the XLA op path each of those tiny sequential point ops costs
    ~0.1 ms of dispatch (the round-4 window fold alone was ~45 ms of the
    122 ms blob MSM); in VMEM the chain is microseconds per step.
    Lane-width-1 states break Mosaic's pad/concat lowering, hence the
    lanes-not-grid batch layout (padded to 128 on the host side)."""
    pcol = pp_ref[:]
    J = v_ref.shape[0]
    top = v_ref[J - 1]  # (3, 24, B)

    def coords(blk):
        return blk[0], blk[1], blk[2]  # three (24, B) planes

    def body(i, st):
        X, Y, Z = st
        X, Y, Z = _ec_double_lm(X, Y, Z, pcol)
        blk = v_ref[pl.dslice(J - 2 - i, 1)]
        X2, Y2, Z2 = coords(blk[0])
        return _ec_add_lm(X, Y, Z, X2, Y2, Z2, pcol)

    X, Y, Z = jax.lax.fori_loop(0, J - 1, body, coords(top))
    o_ref[:] = jnp.stack([X, Y, Z], axis=0)


@functools.partial(jax.jit, static_argnames=())
def ec_weighted_fold(vals: jax.Array) -> jax.Array:
    """Σ_j 2^j · vals[..., j, :, :] for vals (..., J, 3, 24) Montgomery
    projective — the Pippenger bucket/window recombination in ONE kernel
    launch, batch entries on VPU lanes."""
    assert vals.shape[-2:] == (3, NLIMBS)
    lead = vals.shape[:-3]
    j = vals.shape[-3]
    v = vals.reshape((-1, j, 3, NLIMBS))
    bsz = v.shape[0]
    bp = max(128, -(-bsz // 128) * 128)
    # (B, J, 3, 24) -> (J, 3, 24, B) with lanes padded to a full tile
    vt = jnp.pad(
        jnp.transpose(v, (1, 2, 3, 0)), ((0, 0), (0, 0), (0, 0), (0, bp - bsz))
    )
    out = pl.pallas_call(
        _fold_kernel,
        out_shape=jax.ShapeDtypeStruct((3, NLIMBS, bp), jnp.uint32),
        in_specs=[
            pl.BlockSpec(vt.shape, lambda: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, 1), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, NLIMBS, bp), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(vt, jnp.asarray(FP.p_limbs)[:, None])
    return jnp.transpose(out[:, :, :bsz], (2, 0, 1)).reshape(
        lead + (3, NLIMBS)
    )


@functools.partial(jax.jit, static_argnames=())
def ec_double(p: jax.Array) -> jax.Array:
    """Batched complete G1 doubling, bit-exact with kzg/curve.py:double."""
    assert p.shape[-2:] == (3, NLIMBS)
    lead = p.shape[:-2]
    p2 = p.reshape((-1, 3, NLIMBS))
    tile = min(_TILE, max(128, p2.shape[0]))
    p2, m = _pad_to_tile(p2, tile)
    out = pl.pallas_call(
        _double_kernel,
        out_shape=jax.ShapeDtypeStruct(p2.shape, jnp.uint32),
        grid=(p2.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, 3, NLIMBS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 3, NLIMBS), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(p2, jnp.asarray(FP.p_limbs)[:, None])
    return out[:m].reshape(lead + (3, NLIMBS))
