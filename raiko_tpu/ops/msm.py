"""Pippenger multi-scalar multiplication on TPU — the KZG hot kernel.

Role: blob -> KZG commitment and KZG opening proofs are 4096-point MSMs
over the embedded trusted setup (reference lib/src/primitives/
eip4844.rs:80-89 via vendored blst; "MSM G1 point-ops/s" is a north-star
metric, BASELINE.md).

TPU-first design (SURVEY.md §7 "MSM bucket scatter")
----------------------------------------------------
Data-dependent bucket scatter is hostile to XLA, so bucket accumulation is
re-expressed as sort + segmented scan:

1. decompose scalars into 32 8-bit window digits (a reshape of the 16-bit
   limb representation);
2. give every (point, window) pair a flat bucket key, push zero digits to a
   dump slot, and ``argsort`` the keys (one XLA sort of N*32 u32 keys);
3. gather points into key order and run ``lax.associative_scan`` with a
   *segmented* EC-add combiner — the complete RCB15 addition makes the
   combiner branch-free, so the scan is a pure vectorized reduction tree;
4. segment boundaries scatter bucket sums into a dense (windows, 256)
   bucket matrix (unique keys -> well-defined scatter);
5. the classic suffix-sum bucket reduction runs as one ``lax.scan`` over
   255 steps vectorized across all 32 windows at once;
6. windows fold top-down with 8 doublings each.

Multi-chip: points shard over the batch axis; each chip computes partial
bucket sums and the (windows, 256) bucket matrices are combined with a
single collective before reduction (see raiko_tpu/parallel/msm_dist.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kzg import curve

WINDOW_BITS = 8
NWINDOWS = 32  # 256-bit scalars
NBUCKETS = 1 << WINDOW_BITS
_DUMP = NWINDOWS * NBUCKETS  # dump slot for zero digits


def scalars_to_limbs(scalars: list[int]) -> np.ndarray:
    """Host: scalar ints -> (N, 16) u32 array of 16-bit limbs (LE)."""
    out = np.zeros((len(scalars), 16), dtype=np.uint32)
    for i, s in enumerate(scalars):
        for j in range(16):
            out[i, j] = (s >> (16 * j)) & 0xFFFF
    return out


def _segmented_scan(points: jax.Array, flags: jax.Array):
    """Segmented inclusive scan (EC-add) via Hillis-Steele doubling.

    points: (M, 3, 24), flags: (M,) u32 with 1 marking a segment start.
    A ``fori_loop`` over log2(M) distance-doubling sweeps instantiates the
    EC-add combiner exactly once in the compiled graph (an
    ``associative_scan`` would inline it per level, which XLA compiles
    pathologically slowly for big-integer bodies); the cost is log(M)*M
    instead of 2M combine work — acceptable, fully vector-parallel."""
    m = points.shape[0]
    levels = max(1, (m - 1).bit_length())
    idx = jnp.arange(m)

    def body(i, carry):
        pts, fl = carry
        d = jnp.left_shift(1, i)
        src = jnp.maximum(idx - d, 0)
        prev_pts = pts[src]
        prev_fl = fl[src]
        valid = idx >= d
        merged = curve.add(prev_pts, pts)
        new_pts = curve.select(valid & (fl == 0), merged, pts)
        new_fl = jnp.where(valid, fl | prev_fl, fl)
        return (new_pts, new_fl)

    pts, _ = jax.lax.fori_loop(0, levels, body, (points, flags))
    return pts


@jax.jit
def msm(points: jax.Array, scalar_limbs: jax.Array) -> jax.Array:
    """MSM: sum_i scalar_i * P_i.

    points: (N, 3, 24) u32 Montgomery projective.
    scalar_limbs: (N, 16) u32 of 16-bit limbs (standard form integers).
    Returns one (3, 24) projective point.
    """
    return combine_buckets(bucket_matrix(points, scalar_limbs))


def bucket_matrix(points: jax.Array, scalar_limbs: jax.Array) -> jax.Array:
    """Steps 1-4 of the Pippenger pipeline: per-(window, bucket) partial
    sums as a dense (NWINDOWS, NBUCKETS, 3, 24) matrix.  Exposed separately
    so the distributed MSM can reduce per-chip bucket matrices with a
    collective before the shared suffix-sum reduction
    (raiko_tpu/parallel/msm_dist.py)."""
    n = points.shape[0]
    # 1. window digits (N, 32): limb w -> digits 2w (low byte), 2w+1 (high)
    lo = scalar_limbs & 0xFF
    hi = scalar_limbs >> 8
    digits = jnp.stack([lo, hi], axis=-1).reshape(n, NWINDOWS)
    # 2. flat keys; zero digits to the dump slot
    win_ids = jnp.arange(NWINDOWS, dtype=jnp.uint32)[None, :]
    keys = win_ids * NBUCKETS + digits
    keys = jnp.where(digits == 0, jnp.uint32(_DUMP), keys).reshape(-1)
    order = jnp.argsort(keys)
    keys_sorted = keys[order]
    point_idx = order // NWINDOWS  # flat entry e = i * NWINDOWS + w
    pts = points[point_idx]  # (N*32, 3, 24)
    # 3. segmented inclusive scan with EC-add combiner
    starts = jnp.concatenate(
        [jnp.ones(1, jnp.uint32), (keys_sorted[1:] != keys_sorted[:-1]).astype(jnp.uint32)]
    )
    # dump-slot entries become identities so they can't pollute anything
    valid = keys_sorted != _DUMP
    pts = curve.select(valid, pts, curve.identity((pts.shape[0],)))
    scanned = _segmented_scan(pts, starts)
    # 4. segment boundaries -> dense bucket matrix
    is_last = jnp.concatenate(
        [(keys_sorted[1:] != keys_sorted[:-1]), jnp.ones(1, bool)]
    )
    scatter_keys = jnp.where(is_last & valid, keys_sorted, jnp.uint32(_DUMP))
    buckets = curve.identity((NWINDOWS * NBUCKETS + 1,))
    buckets = buckets.at[scatter_keys].set(scanned)
    return buckets[:_DUMP].reshape(NWINDOWS, NBUCKETS, 3, 24)


def combine_buckets(buckets: jax.Array) -> jax.Array:
    """(NWINDOWS, NBUCKETS, 3, 24) bucket sums -> final MSM point.

    Suffix-sum reduction vectorized over windows, then top-down window fold.
    Exposed separately so the distributed MSM can psum partial buckets
    before reduction."""

    def bucket_step(carry, b):
        running, acc = carry
        running = curve.add(running, buckets[:, b])
        acc = curve.add(acc, running)
        return (running, acc), None

    init = (curve.identity((NWINDOWS,)), curve.identity((NWINDOWS,)))
    (running, acc), _ = jax.lax.scan(
        bucket_step, init, jnp.arange(NBUCKETS - 1, 0, -1)
    )

    # 5. fold windows top-down: res = 2^8 * res + W_w (lax loops keep the
    # compiled graph to one double + one add body)
    def fold_body(i, result):
        result = jax.lax.cond(
            i == 0,
            lambda r: r,
            lambda r: jax.lax.fori_loop(
                0, WINDOW_BITS, lambda _, x: curve.double(x), r
            ),
            result,
        )
        return curve.add(result, acc[NWINDOWS - 1 - i])

    return jax.lax.fori_loop(0, NWINDOWS, fold_body, curve.identity(()))
