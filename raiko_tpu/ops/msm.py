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
3. gather points into key order and run a work-efficient 3-phase
   *segmented* scan with an EC-add combiner (``_segmented_scan``: in-block
   scan -> compact block-sum scan -> carry combine, ~3.5M adds instead of
   Hillis-Steele's M·log2 M) — the complete RCB15 addition makes the
   combiner branch-free, and on TPU every wide add runs through the Pallas
   CIOS kernel (ops/ec_pallas.py);
4. segment boundaries scatter bucket sums into a dense (windows, 256)
   bucket matrix (unique keys -> well-defined scatter);
5. the bucket/window reduction expands bucket indices over their bits
   (Σ_w 2^{8w} Σ_b b·B_{w,b} = Σ_j 2^j S'_j) — 8 levels of halving
   batched EC adds, then ONE in-kernel 256-entry double-and-add chain
   (ec_pallas.ec_weighted_fold).

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
    """Host: scalar ints -> (N, 16) u32 array of 16-bit limbs (LE).
    Packs through bytes + frombuffer (one to_bytes per scalar) instead of
    16 Python shifts each — the old loop cost ~80 ms per 4096-scalar blob,
    comparable to the whole device MSM."""
    buf = b"".join(s.to_bytes(32, "little") for s in scalars)
    return (
        np.frombuffer(buf, dtype="<u2").reshape(len(scalars), 16).astype(np.uint32)
    )


def _add(p: jax.Array, q: jax.Array) -> jax.Array:
    """EC add dispatch: the fused Pallas VMEM kernel on TPU for batches big
    enough to fill its lanes (16.8x the XLA formula, BASELINE.md), the XLA
    complete formula otherwise (CPU tests, tiny batches)."""
    if jax.default_backend() == "tpu" and p.ndim == 3 and p.shape[0] >= 1024:
        from . import ec_pallas

        return ec_pallas.ec_add(p, q)
    return curve.add(p, q)


_SCAN_BLOCK = 4  # phase-1 block width (2 unrolled levels)


def _hs_segmented(points: jax.Array, flags: jax.Array):
    """Plain Hillis-Steele segmented inclusive scan (one EC-add body in a
    fori_loop; used for the compact block-sum array of the 3-phase scan and
    as the whole scan for small inputs)."""
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
        merged = _add(prev_pts, pts)
        new_pts = curve.select(valid & (fl == 0), merged, pts)
        new_fl = jnp.where(valid, fl | prev_fl, fl)
        return (new_pts, new_fl)

    pts, fl = jax.lax.fori_loop(0, levels, body, (points, flags))
    return pts, fl


def _segmented_scan(points: jax.Array, flags: jax.Array, _depth: int = 0):
    """Segmented inclusive scan (EC-add), work-efficient 3-phase form.

    points: (M, 3, 24), flags: (M,) u32 with 1 marking a segment start.
    Returns the inclusive segmented scan (each position = EC sum from its
    segment start); only segment-end positions are consumed downstream.

    Phase 1: segmented scan WITHIN blocks of _SCAN_BLOCK elements — two
    unrolled full-width Hillis-Steele levels (2M adds, every one a
    full-lane batch for the Pallas EC kernel).
    Phase 2: the per-block tails (sum since the last flag in the block)
    form an (M/4)-element segmented-scan problem, solved by the classic
    Hillis-Steele fori_loop — uniform shapes keep the compiled graph to ONE
    extra EC-add body (~0.5M adds).
    Phase 3: each element whose in-block prefix contains no flag absorbs
    its block's carry-in with one more full-width add + select (M adds).

    Total ≈ 3.5M EC adds vs the naive Hillis-Steele's M·log2(M) (≈17M at
    the 131k scan width of a blob MSM), with only 4 instantiations of the
    big-integer EC-add body in the graph (vs 2·log2(M) for a fully
    unrolled Blelloch sweep, which XLA compiles pathologically slowly)."""
    m_orig = points.shape[0]
    # recursion policy: each extra depth instantiates another set of
    # pallas/XLA add bodies at a new shape.  On TPU (fast remote
    # compiles) recurse down to 8192 — below that the H-S tail is ~12%
    # of total adds, not worth another depth.  On CPU keep round-4's
    # depth-1 shape (phase-2 tails solved by one H-S pass): XLA:CPU's
    # LLVM codegen of the big-integer add bodies is minutes-per-shape
    # and the CPU path only serves tests.
    if m_orig <= 1024 or (
        _depth >= 1 and (jax.default_backend() != "tpu" or m_orig <= 8192)
    ):
        return _hs_segmented(points, flags)[0]
    s = _SCAN_BLOCK
    pad = (-m_orig) % s
    if pad:  # pad: each pad element is its own empty segment
        points = jnp.concatenate([points, curve.identity((pad,))], axis=0)
        flags = jnp.concatenate([flags, jnp.ones((pad,), flags.dtype)], axis=0)
    m = points.shape[0]
    nb = m // s

    # ---- phase 1: in-block segmented H-S scan (unrolled, full width) ---
    # Same recurrence as _hs_segmented, but the shift is a per-block
    # slice+concat (no gather) and `valid` masks at block edges.  After the
    # loop: v[j, i]  = EC sum since max(block start, last flag) and
    #        fl[j, i] = OR of original flags over [block start, i].
    v = points.reshape(nb, s, 3, 24)
    fl = flags.reshape(nb, s)
    inblock = jnp.arange(s)[None, :]
    d = 1
    while d < s:
        prev_v = jnp.concatenate([v[:, :1].repeat(d, 1), v[:, :-d]], axis=1)
        prev_f = jnp.concatenate(
            [jnp.zeros((nb, d), fl.dtype), fl[:, :-d]], axis=1
        )
        valid = inblock >= d
        merged = _add(v.reshape(m, 3, 24), prev_v.reshape(m, 3, 24)).reshape(
            v.shape
        )
        v = curve.select(valid & (fl == 0), merged, v)
        fl = jnp.where(valid, fl | prev_f, fl)
        d <<= 1

    # ---- phase 2: segmented scan of per-block tails (compact) ----------
    # RECURSE into the 3-phase form instead of one Hillis-Steele pass:
    # H-S on the (M/4) tails costs (M/4)·log2(M/4) adds — over half the
    # scan's EC work at blob size (measured 55 of 80 ms) — while the
    # recursion totals 3M(1 + 1/4 + ...) ≈ 4M, i.e. ~1.7x fewer adds.
    tails = v[:, s - 1]  # (NB, 3, 24): sum since last flag in the block
    bflags = fl[:, s - 1]  # OR of the block's flags
    incl = _segmented_scan(tails, bflags, _depth + 1)
    carry = jnp.concatenate([curve.identity((1,)), incl[:-1]], axis=0)

    # ---- phase 3: absorb the block carry where no flag intervenes ------
    carry_b = jnp.broadcast_to(carry[:, None], (nb, s, 3, 24))
    merged = _add(
        v.reshape(m, 3, 24), carry_b.reshape(m, 3, 24)
    ).reshape(v.shape)
    out = curve.select(fl == 0, merged, v)
    return out.reshape(m, 3, 24)[:m_orig]


@jax.jit
def msm(points: jax.Array, scalar_limbs: jax.Array) -> jax.Array:
    """MSM: sum_i scalar_i * P_i.

    points: (N, 3, 24) u32 Montgomery projective.
    scalar_limbs: (N, 16) u32 of 16-bit limbs (standard form integers).
    Returns one (3, 24) projective point.
    """
    return combine_buckets(bucket_matrix(points, scalar_limbs))


@jax.jit
def msm_multi(points: jax.Array, scalar_limbs: jax.Array) -> jax.Array:
    """B independent MSMs over the SAME point set in one launch.

    points: (N, 3, 24); scalar_limbs: (B, N, 16) -> (B, 3, 24).

    The per-blob KZG workload (EIP-4844: every commitment/opening is an
    MSM over the same 4096-point trusted setup) makes this the natural
    batch shape.  One flat key space of B*N*32 entries shares a single
    sort + segmented scan + suffix-sum reduction, amortizing the fixed
    sort/dispatch cost that dominates a lone 4096-point MSM (BASELINE.md
    "batch several blobs per launch" roadmap item)."""
    bsz, n = scalar_limbs.shape[:2]
    per = NWINDOWS * NBUCKETS
    dump = bsz * per
    lo = scalar_limbs & 0xFF
    hi = scalar_limbs >> 8
    digits = jnp.stack([lo, hi], axis=-1).reshape(bsz, n, NWINDOWS)
    win_ids = jnp.arange(NWINDOWS, dtype=jnp.uint32)[None, None, :]
    batch_ids = jnp.arange(bsz, dtype=jnp.uint32)[:, None, None]
    keys = batch_ids * per + win_ids * NBUCKETS + digits
    keys = jnp.where(digits == 0, jnp.uint32(dump), keys).reshape(-1)
    order = jnp.argsort(keys)
    keys_sorted = keys[order]
    point_idx = (order // NWINDOWS) % n  # flat e = (b*n + i)*32 + w
    pts = points[point_idx]
    starts = jnp.concatenate(
        [
            jnp.ones(1, jnp.uint32),
            (keys_sorted[1:] != keys_sorted[:-1]).astype(jnp.uint32),
        ]
    )
    valid = keys_sorted != dump
    pts = curve.select(valid, pts, curve.identity((pts.shape[0],)))
    scanned = _segmented_scan(pts, starts)
    is_last = jnp.concatenate(
        [(keys_sorted[1:] != keys_sorted[:-1]), jnp.ones(1, bool)]
    )
    scatter_keys = jnp.where(is_last & valid, keys_sorted, jnp.uint32(dump))
    buckets = curve.identity((dump + 1,))
    buckets = buckets.at[scatter_keys].set(scanned)
    buckets = buckets[:dump].reshape(bsz, NWINDOWS, NBUCKETS, 3, 24)
    return combine_buckets(buckets)


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
    """(..., NWINDOWS, NBUCKETS, 3, 24) bucket sums -> final MSM point(s).

    Round 5: bit-masked partial sums + one in-kernel Horner fold, replacing
    the former double suffix scan + 288-step window fold.  Expanding each
    bucket index over its bits,

        Σ_w 2^{8w} Σ_b b·B_{w,b}  =  Σ_{j=0}^{255} 2^j · S'_j ,
        S'_{8w+k} = Σ_{b: bit k of b set} B_{w,b} ,

    so the whole reduction is (a) 8 levels of halving batched EC adds over
    a (W, 8, NBUCKETS) masked selection (65k adds vs the suffix scans'
    131k, all full-lane Pallas batches) and (b) a single 256-entry
    double-and-add chain that runs INSIDE one Pallas kernel
    (ec_pallas.ec_weighted_fold) — through the XLA op path that chain was
    ~510 sequential ~0.1 ms dispatches, the top fixed cost of a blob MSM.
    Leading batch axes are supported directly (msm_multi passes (B, W,
    NBUCKETS, 3, 24)); exposed separately so the distributed MSM can psum
    partial buckets before reduction."""
    lead = buckets.shape[:-4]
    w = buckets.shape[-4]
    b = buckets.reshape((-1, w, NBUCKETS, 3, 24))
    bsz = b.shape[0]
    if jax.default_backend() != "tpu":
        # CPU/tests: round-4's double-suffix-scan + Horner fold — one
        # fori add body per scan (XLA:CPU compiles of per-shape
        # big-integer adds are minutes each; see _segmented_scan note).
        # bsz==1 skips vmap so the graph (and its compile cache entry)
        # is bit-identical to round 4's.
        if bsz == 1:
            return _combine_suffix(b[0]).reshape(lead + (3, 24))
        out = jax.vmap(_combine_suffix)(b)
        return out.reshape(lead + (3, 24))
    from . import ec_pallas

    # masked per-bit selection: (B, W, 8, NBUCKETS, 3, 24)
    bit = (
        (jnp.arange(NBUCKETS, dtype=jnp.uint32)[None, :]
         >> jnp.arange(WINDOW_BITS, dtype=jnp.uint32)[:, None]) & 1
    ) == 1  # (8, NBUCKETS)
    sel = curve.select(
        jnp.broadcast_to(bit[None, None], (bsz, w, WINDOW_BITS, NBUCKETS)),
        b[:, :, None],
        curve.identity((bsz, w, WINDOW_BITS, NBUCKETS)),
    )
    arr = sel
    while arr.shape[3] > 1:
        half = arr.shape[3] // 2
        lo = arr[:, :, :, :half].reshape(-1, 3, 24)
        hi = arr[:, :, :, half:].reshape(-1, 3, 24)
        arr = _add(lo, hi).reshape(bsz, w, WINDOW_BITS, half, 3, 24)
    # j = 8w + k -> row-major (w, k) flatten gives S'_j at index j
    sprime = arr[:, :, :, 0].reshape(bsz, w * WINDOW_BITS, 3, 24)
    out = ec_pallas.ec_weighted_fold(sprime)
    return out.reshape(lead + (3, 24))


def _combine_suffix(buckets: jax.Array) -> jax.Array:
    """(NWINDOWS, NBUCKETS, 3, 24) -> (3, 24): W_w = Σ_b S_b via two
    Hillis-Steele suffix scans + sequential window fold (the round-4
    reduction, kept as the CPU path)."""
    s0 = jnp.concatenate(
        [buckets[:, 1:], curve.identity((NWINDOWS, 1))], axis=1
    )  # (W, 256, 3, 24)
    nb = s0.shape[1]
    levels = (nb - 1).bit_length()
    idx = jnp.arange(nb)

    def suffix_scan(arr):
        def body(i, a):
            d = jnp.left_shift(1, i)
            src = jnp.minimum(idx + d, nb - 1)
            shifted = jnp.take(a, src, axis=1)
            merged = _add(
                a.reshape(-1, 3, 24), shifted.reshape(-1, 3, 24)
            ).reshape(a.shape)
            return curve.select(
                jnp.broadcast_to(idx + d <= nb - 1, (a.shape[0], nb)), merged, a
            )

        return jax.lax.fori_loop(0, levels, body, arr)

    acc = suffix_scan(suffix_scan(s0))[:, 0]  # (W, 3, 24)

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
