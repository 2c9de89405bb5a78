"""MXU-accelerated NTT: 128-point DFT stages as int8 limb matmuls.

The four-step NTT's local transforms are 128-point DFTs = multiplication
by a fixed 128x128 matrix over BabyBear.  The MXU can't do modular math,
but it can do *exact integer* matmuls: decompose every operand into four
BALANCED signed 8-bit limbs (digits in [-128, 128), exact for values
< 2^31), run the 16 limb-pair products as int8 x int8 -> int32 systolic
matmuls (each dot sums 128 products of magnitude <= 2^14 -> < 2^21,
exactly representable), then recombine the seven diagonal sums
S_s = sum_{i+j=s} P_ij with modular scaling by 2^{8s}.

This moves the butterfly arithmetic from the VPU's (slow) u32 multiplier
onto the systolic array: ~8.6 G int8-MACs per (64 x 16384) NTT vs ~44 M
serial u32 multiplies on the VPU path — the "NTT via MXU" design from
SURVEY.md §7.

Output is bit-exact with ops.ntt.ntt (global bitrev order); verified in
tests.  Supported sizes: N = R*C with R, C <= 128 (one matmul level);
larger sizes compose with the four-step butterflies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb
from . import ntt as nttmod

_OFFSET = 1 << 23  # recentering offset for signed diagonal sums


def _balanced_limbs_int(v: int) -> list[int]:
    """Four balanced signed 8-bit digits of v < 2^31 (host)."""
    digits = [(v >> (8 * i)) & 0xFF for i in range(4)]
    out = []
    carry = 0
    for i in range(4):
        d = digits[i] + carry
        if d >= 128:
            out.append(d - 256)
            carry = 1
        else:
            out.append(d)
            carry = 0
    assert carry == 0, "top digit overflow"
    return out


@functools.lru_cache(maxsize=8)
def _dft_matrix_limbs(log_m: int):
    """W[k, j] = w_M^{brp(k) * j} as (4, M, M) int8 balanced limbs."""
    m = 1 << log_m
    w = bb.two_adic_generator(log_m)
    rev = nttmod.bit_reverse_indices(m)
    mat = np.empty((m, m), dtype=np.int64)
    for k in range(m):
        base = pow(w, int(rev[k]), bb.P)
        cur = 1
        for j in range(m):
            mat[k, j] = cur
            cur = cur * base % bb.P
    limbs = np.empty((4, m, m), dtype=np.int8)
    for k in range(m):
        for j in range(m):
            for i, l in enumerate(_balanced_limbs_int(int(mat[k, j]))):
                limbs[i, k, j] = l
    return limbs  # numpy; callers convert (jnp constants inside traces)


@functools.lru_cache(maxsize=8)
def _recombine_consts(m: int):
    """(b_s) with b_s = 2^{8s}*R mod p (so mont_mul(T_s, b_s) = T_s*2^{8s})
    and the offset correction K = 2^23 * sum_s 2^{8s} * (m-term count)."""
    bs = [pow(2, 8 * s, bb.P) * bb.R % bb.P for s in range(7)]
    k_const = sum(_OFFSET * pow(2, 8 * s, bb.P) for s in range(7)) % bb.P
    return bs, k_const  # python ints: embeddable in pallas kernels


def _device_balanced_limbs(x: jax.Array) -> list[jax.Array]:
    """u32 (..., ) -> four int8 arrays of balanced digits."""
    out = []
    carry = jnp.zeros_like(x)
    for i in range(4):
        d = ((x >> (8 * i)) & 0xFF) + carry
        carry = (d >= 128).astype(jnp.uint32)
        out.append((d.astype(jnp.int32) - 256 * carry.astype(jnp.int32)).astype(jnp.int8))
    return out


def _mxu_dft_minor(mat: jax.Array, log_m: int) -> jax.Array:
    """DFT along axis -2 of (..., M, L) via ONE stacked limb matmul.

    The 16 limb-pair products run as a single (4M, M) @ (..., M, 4L) int8
    matmul (best MXU utilization, one launch); the diagonal sums S_s are
    sliced out of the (..., 4M, 4L) result."""
    m = 1 << log_m
    wl = _dft_matrix_limbs(log_m)  # (4, M, M) numpy
    xl = _device_balanced_limbs(mat)  # 4 x (..., M, L)
    lead = mat.shape[:-2]
    lanes = mat.shape[-1]
    w_stack = jnp.asarray(wl.reshape(4 * m, m))
    x_stack = jnp.concatenate(xl, axis=-1)  # (..., M, 4L)
    pfull = jnp.einsum(
        "Kj,...jL->...KL", w_stack, x_stack, preferred_element_type=jnp.int32
    )
    pfull = pfull.reshape(lead + (4, m, 4, lanes))
    s_terms: list = [None] * 7
    for i in range(4):
        for j in range(4):
            p = pfull[..., i, :, j, :]
            s = i + j
            s_terms[s] = p if s_terms[s] is None else s_terms[s] + p
    bs, k_const = _recombine_consts(1 << log_m)
    acc = None
    for s in range(7):
        t = (s_terms[s] + _OFFSET).astype(jnp.uint32)  # non-negative < 2^24
        term = bb.mont_mul(t, jnp.uint32(bs[s]))
        acc = term if acc is None else bb.add(acc, term)
    return bb.sub(acc, jnp.uint32(k_const))


def _mxu_dft_pallas(mat: jax.Array, log_m: int) -> jax.Array:
    """Pallas-fused variant of _mxu_dft_minor: the stacked limb matmul AND
    the modular recombination run inside one kernel, so the (4M, 4L) i32
    product never touches HBM.  mat: (B, M, L) -> (B, M, L)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = 1 << log_m
    bsz, mm, lanes = mat.shape
    assert mm == m
    wl = _dft_matrix_limbs(log_m)  # (4, M, M) int8 numpy
    w_stack = jnp.asarray(wl.reshape(4 * m, m).astype(np.float32), dtype=jnp.bfloat16)
    bs, k_const = _recombine_consts(m)

    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[0]  # (M, L) u32
        # balanced limbs -> (M, 4L) bf16
        limbs = []
        carry = jnp.zeros_like(x)
        for i in range(4):
            d = ((x >> (8 * i)) & 0xFF) + carry
            carry = (d >= 128).astype(jnp.uint32)
            limbs.append(
                (d.astype(jnp.int32) - 256 * carry.astype(jnp.int32)).astype(
                    jnp.bfloat16
                )
            )
        x_stack = jnp.concatenate(limbs, axis=-1)
        p = jnp.dot(w_ref[...], x_stack, preferred_element_type=jnp.float32)
        p = p.reshape(4, m, 4, lanes)
        acc = None
        for s in range(7):
            st = None
            for i in range(4):
                j = s - i
                if 0 <= j < 4:
                    blk = p[i, :, j, :]
                    st = blk if st is None else st + blk
            t = (st.astype(jnp.int32) + _OFFSET).astype(jnp.uint32)
            term = bb.mont_mul(t, jnp.uint32(bs[s]))
            acc = term if acc is None else bb.add(acc, term)
        o_ref[0] = bb.sub(acc, jnp.uint32(k_const))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, m, lanes), jnp.uint32),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, m, lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * m, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m, lanes), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )(mat, w_stack)


def ntt_mxu_pallas(x: jax.Array) -> jax.Array:
    """Forward NTT with Pallas-fused MXU DFT stages (bit-exact with ntt).
    x: (B, N) Montgomery, N = R*C with R, C <= 128."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    log_r = log_n // 2
    log_c = log_n - log_r
    r, c = 1 << log_r, 1 << log_c
    bsz = x.shape[0]
    mat = x.reshape(bsz, r, c)
    a = _mxu_dft_pallas(mat, log_r)
    a = bb.mont_mul(a, jnp.asarray(nttmod._fourstep_twiddles(log_r, log_c)))
    at = jnp.swapaxes(a, -1, -2)
    out = _mxu_dft_pallas(at, log_c)
    return jnp.swapaxes(out, -1, -2).reshape(bsz, n)


def ntt_mxu(x: jax.Array) -> jax.Array:
    """Forward NTT, bit-exact with ops.ntt.ntt, using MXU limb matmuls for
    both four-step passes.  x: (..., N) Montgomery; N = R*C, R, C <= 128."""
    n = x.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    log_r = log_n // 2
    log_c = log_n - log_r
    assert log_r <= 7 and log_c <= 7, "use ntt_fourstep for larger sizes"
    r, c = 1 << log_r, 1 << log_c
    lead = x.shape[:-1]
    mat = x.reshape(lead + (r, c))
    a = _mxu_dft_minor(mat, log_r)
    a = bb.mont_mul(a, jnp.asarray(nttmod._fourstep_twiddles(log_r, log_c)))
    at = jnp.swapaxes(a, -1, -2)
    out = _mxu_dft_minor(at, log_c)
    return jnp.swapaxes(out, -1, -2).reshape(lead + (n,))
