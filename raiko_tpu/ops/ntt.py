"""Number-theoretic transform over BabyBear — TPU-friendly formulation.

Role: the NTT/LDE stage of STARK proving (reference analog: the BabyBear
NTT/low-degree-extension inside the vendored risc0/sp1 prover cores,
SURVEY.md §2.2 / §7 step 3).  This is one of the two north-star kernels
("NTT butterflies/s per chip", BASELINE.md).

TPU-first design
----------------
* **No bit-reversal gathers.**  The forward transform is decimation-in-
  frequency (natural input -> bit-reversed output) and the inverse is
  decimation-in-time (bit-reversed input -> natural output).  Downstream
  consumers (LDE, Merkle commit, FRI fold) are written to work directly in
  bit-reversed order, as is standard in STARK provers, so the O(N) gather
  never materializes.  Every stage is a static reshape + vectorized
  butterfly — exactly the shape XLA tiles well onto the VPU.
* **Batch-first layout.**  Arrays are (batch, N); the batch axis maps onto
  sublanes so each butterfly is a full-width VPU op.
* **Montgomery everywhere.**  Twiddles are precomputed host-side in
  Montgomery form once per size and cached.
* Multi-chip: see raiko_tpu/parallel/ntt_dist.py (column/row four-step split
  with an all-to-all transpose between local stages).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb


@functools.lru_cache(maxsize=64)
def _twiddles(log_n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Per-stage twiddle tables (Montgomery form).

    Stage s of the DIF transform needs w_{N/2^s}^j for j < N/2^{s+1}.
    For the inverse (DIT) transform the same tables with inverse roots are
    consumed in reverse stage order.
    """
    n = 1 << log_n
    w = bb.two_adic_generator(log_n)
    if inverse:
        w = bb.h_inv(w)
    tables = []
    for s in range(log_n):
        half = n >> (s + 1)
        ws = pow(w, 1 << s, bb.P)  # root of order N/2^s
        tbl = np.empty(half, dtype=np.uint32)
        cur = 1
        for j in range(half):
            tbl[j] = cur
            cur = (cur * ws) % bb.P
        tables.append(bb.np_to_mont(tbl))
    return tuple(tables)


def ntt(x: jax.Array) -> jax.Array:
    """Forward NTT, natural order in -> bit-reversed order out.

    x: uint32 array (..., N) in Montgomery form, N a power of two.
    """
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    tables = _twiddles(log_n, inverse=False)
    lead = x.shape[:-1]
    for s in range(log_n):
        half = n >> (s + 1)
        tw = jnp.asarray(tables[s])
        y = x.reshape(lead + (1 << s, 2, half))
        u = y[..., 0, :]
        v = y[..., 1, :]
        x0 = bb.add(u, v)
        x1 = bb.mont_mul(bb.sub(u, v), tw)
        x = jnp.stack([x0, x1], axis=-2).reshape(lead + (n,))
    return x


def intt(x: jax.Array) -> jax.Array:
    """Inverse NTT, bit-reversed order in -> natural order out."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    tables = _twiddles(log_n, inverse=True)
    lead = x.shape[:-1]
    # DIT: undo DIF stages in reverse order
    for s in reversed(range(log_n)):
        half = n >> (s + 1)
        tw = jnp.asarray(tables[s])
        y = x.reshape(lead + (1 << s, 2, half))
        u = y[..., 0, :]
        v = bb.mont_mul(y[..., 1, :], tw)
        x0 = bb.add(u, v)
        x1 = bb.sub(u, v)
        x = jnp.stack([x0, x1], axis=-2).reshape(lead + (n,))
    n_inv = bb.np_to_mont(np.array([bb.h_inv(n)], dtype=np.uint32))[0]
    return bb.mont_mul(x, jnp.uint32(n_inv))


@functools.lru_cache(maxsize=32)
def _fourstep_twiddles(log_r: int, log_c: int) -> np.ndarray:
    """w_N^{k1*n2} with rows in bitrev-k1 order — (R, C) Montgomery."""
    r, c = 1 << log_r, 1 << log_c
    w = bb.two_adic_generator(log_r + log_c)
    rev = bit_reverse_indices(r)
    out = np.empty((r, c), dtype=np.uint32)
    for row in range(r):
        base = pow(w, int(rev[row]), bb.P)
        cur = 1
        for n2 in range(c):
            out[row, n2] = cur
            cur = cur * base % bb.P
    return bb.np_to_mont(out)


def _ntt_axis_minor(x: jax.Array, log_m: int, tables) -> jax.Array:
    """DIF butterflies along axis -2 of (..., M, L): the lane axis L stays
    untouched, so every reshape keeps full-width vector lanes."""
    m = 1 << log_m
    lead = x.shape[:-2]
    lanes = x.shape[-1]
    for s in range(log_m):
        half = m >> (s + 1)
        tw = jnp.asarray(tables[s])[:, None]  # (half, 1) broadcast over lanes
        y = x.reshape(lead + (1 << s, 2, half, lanes))
        u = y[..., 0, :, :]
        v = y[..., 1, :, :]
        x0 = bb.add(u, v)
        x1 = bb.mont_mul(bb.sub(u, v), tw)
        x = jnp.stack([x0, x1], axis=-3).reshape(lead + (m, lanes))
    return x


def ntt_fourstep(x: jax.Array) -> jax.Array:
    """Forward NTT via the R x C four-step decomposition — identical output
    to ``ntt`` (global bit-reversed order) but TPU-layout-friendly: both
    butterfly passes run along a non-lane axis (lane width R or C >= 128)
    and the only data movement between them is one (R, C) transpose.

    x: (..., N) Montgomery; N = R*C with both factors >= 128 preferred."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    if log_n < 14:  # small sizes: plain iterative NTT is fine
        return ntt(x)
    log_r = log_n // 2
    log_c = log_n - log_r
    r, c = 1 << log_r, 1 << log_c
    lead = x.shape[:-1]
    mat = x.reshape(lead + (r, c))
    a = _ntt_axis_minor(mat, log_r, _twiddles(log_r, False))
    a = bb.mont_mul(a, jnp.asarray(_fourstep_twiddles(log_r, log_c)))
    at = jnp.swapaxes(a, -1, -2)  # (C, R)
    out = _ntt_axis_minor(at, log_c, _twiddles(log_c, False))
    # out holds [brp_C(k2), brp_R(k1)]; global bitrev order is
    # [brp_R(k1), brp_C(k2)] row-major — transpose back before flattening
    return jnp.swapaxes(out, -1, -2).reshape(lead + (n,))


def bit_reverse_indices(n: int) -> np.ndarray:
    """Permutation taking bit-reversed order to natural order (host-side)."""
    log_n = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def lde(x: jax.Array, blowup_log: int, shift: int | None = None) -> jax.Array:
    """Low-degree extension by 2^blowup_log onto a shifted coset.

    x: (..., N) evaluations over the size-N subgroup in **natural** order,
    Montgomery form.  Returns (..., N * 2^blowup) coset evaluations in
    **bit-reversed** order (the order Merkle commitment consumes).

    The coset shift defaults to the field generator (as STARK provers use to
    keep the extended domain disjoint from the trace domain).
    """
    return lde_from_coeffs(interpolate(x), blowup_log, shift)


def lde_from_coeffs(coeffs: jax.Array, blowup_log: int, shift: int | None = None):
    """Evaluate a coefficient-form polynomial (..., N) over the shifted coset
    of size N*2^blowup_log.  Output in bit-reversed order, Montgomery form."""
    n = coeffs.shape[-1]
    m = n << blowup_log
    if shift is None:
        shift = bb.GENERATOR
    # scale coefficients by shift^i, zero-pad to m, forward NTT
    powers = np.empty(n, dtype=np.uint32)
    cur = 1
    for i in range(n):
        powers[i] = cur
        cur = (cur * shift) % bb.P
    scaled = bb.mont_mul(coeffs, jnp.asarray(bb.np_to_mont(powers)))
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, m - n)]
    padded = jnp.pad(scaled, pad)
    # large domains take the lane-friendly four-step path
    return ntt_fourstep(padded) if m >= (1 << 14) else ntt(padded)


def interpolate(evals: jax.Array) -> jax.Array:
    """Natural-order subgroup evaluations -> coefficient form (both
    Montgomery).  evals: (..., N)."""
    # forward DIF produces bitrev; we need coefficients = iNTT of evals.
    # intt consumes bit-reversed input, so first run ntt-style reordering:
    # coefficients c = INTT(evals). Our intt() takes bitrev input; evals are
    # natural, so feed them through the DIF/DIT pair: intt(bitrev(evals)).
    # Avoid the gather: DIF forward with inverse twiddles computes the
    # inverse transform up to ordering. Concretely: run the DIF structure
    # with inverse twiddle tables on natural input -> bit-reversed
    # coefficients; then consumers that need natural order use
    # bit_reverse_indices. For simplicity and because N is moderate here,
    # we use intt on an explicit bit-reversal.
    n = evals.shape[-1]
    rev = jnp.asarray(bit_reverse_indices(n).astype(np.int32))
    return intt(jnp.take(evals, rev, axis=-1))
