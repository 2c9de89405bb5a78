"""Fused Pallas NTT: the whole four-step transform in one VMEM-resident kernel.

Role: same as ops/ntt.py (the BabyBear NTT/LDE stage of STARK proving,
reference analog: the NTT inside the vendored risc0/sp1 prover cores,
SURVEY.md §2.2).

Measured result (BASELINE.md): this kernel reaches ~16 G butterflies/s on
v5e — slower than the plain XLA four-step (~50 G), because Mosaic's sublane
interleaves for the stack/reshape butterfly patterns cost more than XLA's
own stage fusion saves.  Kept as a tested, bit-exact alternative and as the
substrate for future in-kernel experiments; production paths use
ops/ntt.py.

Why fused
---------
The XLA four-step path (ops/ntt.py:ntt_fourstep) materializes every butterfly
stage to HBM: log2(N) stages x (batch, N) x 2 round-trips.  The arithmetic is
tiny (a Montgomery multiply is 8 u32 multiplies), so the path is bound by the
inter-stage traffic and the interleave relayouts XLA emits between stages.
Here a batch tile of rows is DMA'd to VMEM once, ALL stages of both four-step
passes plus the cross-twiddle multiply and the (R, C) transposes run on
registers/VMEM, and the tile is written back once: HBM traffic drops from
~2*log2(N) passes to exactly 2.

Layout notes
------------
* Rows are viewed as (R, C) with butterflies always along the sublane axis
  (R or C) and full-width lanes — the same lane-friendly structure as
  ntt_fourstep, now without inter-stage spills.
* Per-stage twiddle tables are packed COLUMN-wise into one (M/2, log_m)
  array so each stage reads a (half, 1) sublane vector directly — no
  in-kernel lane->sublane transposes of the tables.
* Output is bit-exact with ops.ntt.ntt / ntt_fourstep (global bit-reversed
  order), verified in tests/test_babybear.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import babybear as bb
from . import ntt as nttmod

# fall back to the XLA path beyond this size (VMEM: one row of 2^20 u32 = 4MB)
MAX_FUSED_LOG_N = 20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=32)
def _packed_stage_tables(log_m: int, inverse: bool) -> np.ndarray:
    """(M/2, log_m) u32: column s = stage-s twiddle table (Montgomery),
    zero-padded below its half=M>>(s+1) live entries."""
    m = 1 << log_m
    tabs = nttmod._twiddles(log_m, inverse)
    out = np.zeros((max(m // 2, 1), log_m), dtype=np.uint32)
    for s in range(log_m):
        half = m >> (s + 1)
        out[:half, s] = tabs[s]
    return out


def _stages_minor_ref(v: jax.Array, log_m: int, tw_ref) -> jax.Array:
    """DIF butterflies along axis -2 of (bt, M, L); twiddles from a packed
    (M/2, log_m) VMEM ref.  Mirrors ops/ntt.py:_ntt_axis_minor."""
    bt, m, lanes = v.shape
    for s in range(log_m):
        half = m >> (s + 1)
        tw = tw_ref[0:half, s : s + 1]  # (half, 1) broadcast over lanes
        y = v.reshape(bt, 1 << s, 2, half, lanes)
        u = y[:, :, 0]
        w = y[:, :, 1]
        x0 = bb.add(u, w)
        x1 = bb.mont_mul(bb.sub(u, w), tw)
        v = jnp.stack([x0, x1], axis=2).reshape(bt, m, lanes)
    return v


def _istages_minor_ref(v: jax.Array, log_m: int, tw_ref) -> jax.Array:
    """DIT butterflies (inverse stage order) along axis -2 of (bt, M, L)."""
    bt, m, lanes = v.shape
    for s in reversed(range(log_m)):
        half = m >> (s + 1)
        tw = tw_ref[0:half, s : s + 1]
        y = v.reshape(bt, 1 << s, 2, half, lanes)
        u = y[:, :, 0]
        w = bb.mont_mul(y[:, :, 1], tw)
        x0 = bb.add(u, w)
        x1 = bb.sub(u, w)
        v = jnp.stack([x0, x1], axis=2).reshape(bt, m, lanes)
    return v


def _pick_tile(batch: int, n: int) -> int:
    """Batch-tile size: keep a tile around <=1MB so in/out double buffers fit
    VMEM comfortably alongside intermediates."""
    rows = max(1, (1 << 18) // (n * 4))
    while batch % rows:
        rows -= 1
    return rows


@functools.partial(jax.jit, static_argnames=("inverse",))
def _fourstep_fused(x: jax.Array, inverse: bool = False) -> jax.Array:
    """x: (B, N) u32 Montgomery -> (B, N), bit-exact with ntt_fourstep
    (forward) / its DIT mirror (inverse, before the 1/N scale)."""
    bsz, n = x.shape
    log_n = n.bit_length() - 1
    log_r = log_n // 2
    log_c = log_n - log_r
    r, c = 1 << log_r, 1 << log_c
    bt = _pick_tile(bsz, n)

    rtw = jnp.asarray(_packed_stage_tables(log_r, inverse))
    ctw = jnp.asarray(_packed_stage_tables(log_c, inverse))
    cross = jnp.asarray(nttmod._fourstep_twiddles(log_r, log_c))
    if inverse:
        # inverse cross twiddles: elementwise inverse of the forward table
        cross = jnp.asarray(_fourstep_itwiddles(log_r, log_c))

    def kernel(x_ref, rtw_ref, ctw_ref, cross_ref, o_ref):
        v = x_ref[:]  # (bt, R, C)
        if inverse:
            # mirror of forward: undo pass-2 (C axis), cross, then pass-1
            v = jnp.swapaxes(v, -1, -2)  # (bt, C, R)
            v = _istages_minor_ref(v, log_c, ctw_ref)
            v = jnp.swapaxes(v, -1, -2)  # (bt, R, C)
            v = bb.mont_mul(v, cross_ref[:])
            v = _istages_minor_ref(v, log_r, rtw_ref)
            o_ref[:] = v
        else:
            v = _stages_minor_ref(v, log_r, rtw_ref)
            v = bb.mont_mul(v, cross_ref[:])
            v = jnp.swapaxes(v, -1, -2)  # (bt, C, R)
            v = _stages_minor_ref(v, log_c, ctw_ref)
            o_ref[:] = jnp.swapaxes(v, -1, -2)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, r, c), jnp.uint32),
        grid=(bsz // bt,),
        in_specs=[
            pl.BlockSpec((bt, r, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(rtw.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ctw.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cross.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, r, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(x.reshape(bsz, r, c), rtw, ctw, cross)
    return out.reshape(bsz, n)


@functools.lru_cache(maxsize=32)
def _fourstep_itwiddles(log_r: int, log_c: int) -> np.ndarray:
    """Inverse cross twiddles w_N^{-k1*n2}, rows in bitrev-k1 order."""
    r, c = 1 << log_r, 1 << log_c
    w = bb.h_inv(bb.two_adic_generator(log_r + log_c))
    rev = nttmod.bit_reverse_indices(r)
    out = np.empty((r, c), dtype=np.uint32)
    for row in range(r):
        base = pow(w, int(rev[row]), bb.P)
        cur = 1
        for n2 in range(c):
            out[row, n2] = cur
            cur = cur * base % bb.P
    return bb.np_to_mont(out)


def ntt_fused(x: jax.Array) -> jax.Array:
    """Forward NTT, natural in -> bit-reversed out, bit-exact with
    ops.ntt.ntt.  x: (..., N) u32 Montgomery.  Uses the fused Pallas kernel
    for 2^14 <= N <= 2^MAX_FUSED_LOG_N, else defers to the XLA path."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n < 14 or log_n > MAX_FUSED_LOG_N:
        return nttmod.ntt_fourstep(x)
    lead = x.shape[:-1]
    flat = x.reshape((-1, n))
    return _fourstep_fused(flat, inverse=False).reshape(lead + (n,))


def intt_fused(x: jax.Array) -> jax.Array:
    """Inverse NTT, bit-reversed in -> natural out, bit-exact with
    ops.ntt.intt (includes the 1/N scale)."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n < 14 or log_n > MAX_FUSED_LOG_N:
        return nttmod.intt(x)
    lead = x.shape[:-1]
    flat = x.reshape((-1, n))
    out = _fourstep_fused(flat, inverse=True)
    n_inv = bb.np_to_mont(np.array([bb.h_inv(n)], dtype=np.uint32))[0]
    return bb.mont_mul(out, jnp.uint32(n_inv)).reshape(lead + (n,))
