"""BabyBear prime field (p = 2^31 - 2^27 + 1) — vectorized JAX arithmetic.

This is the base field of the STARK pipeline (the role it plays inside the
reference's vendored risc0/sp1 prover cores, SURVEY.md §2.2): trace values,
NTT/LDE, FRI folding and Poseidon2 hashing all run over BabyBear.

TPU-first design
----------------
Field elements live in ``uint32`` lanes (one element per lane) in Montgomery
form with R = 2^32.  The TPU VPU has native u32 add/sub/shift/logic and a
32x32->low-32 multiply; the needed 32x32->64 products are composed from four
16x16->32 partial products whose 16-bit halves are accumulated
carry-safely in u32 (every intermediate is < 2^18 above a 16-bit limb, so no
carry detection is required).  One Montgomery multiply therefore costs
8 u32 multiplies + ~20 cheap VPU ops, fully vectorized over arrays of any
shape — no scalar loops, no 64-bit emulation.

All functions are shape-polymorphic over ``jnp.uint32`` arrays and are safe
inside ``jit`` / ``shard_map`` / Pallas kernels.  Host-side scalar helpers
(``to_int`` etc.) use Python ints and exist for tests and transcripts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

P = 2013265921  # 15 * 2^27 + 1
TWO_ADICITY = 27
# multiplicative generator of F_p^* (smallest: 31)
GENERATOR = 31
# R = 2^32 mod p, Montgomery radix
R = (1 << 32) % P
R2 = (R * R) % P
# -p^{-1} mod 2^32
NPRIME = (-pow(P, -1, 1 << 32)) % (1 << 32)

_U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


def _mul_64(a, b):
    """Full 64-bit product of two u32 arrays -> (hi, lo) u32 arrays.

    Composed from 16x16->32 partial products; all column accumulations stay
    below 2^18 over 16-bit halves, so plain u32 adds are carry-safe.
    """
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    # column sums of 16-bit halves
    c1 = (p00 >> 16) + (p01 & MASK16) + (p10 & MASK16)
    c2 = (p01 >> 16) + (p10 >> 16) + (p11 & MASK16) + (c1 >> 16)
    c3 = (p11 >> 16) + (c2 >> 16)
    lo = (p00 & MASK16) | ((c1 & MASK16) << 16)
    hi = (c2 & MASK16) | ((c3 & MASK16) << 16)
    return hi, lo


def mont_mul(a, b):
    """Montgomery product: a*b*R^{-1} mod p, for u32 arrays in [0, p)."""
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    t_hi, t_lo = _mul_64(a, b)
    m = t_lo * np.uint32(NPRIME)  # np scalar: >= 2^31 consts embed in pallas kernels
    u_hi, u_lo = _mul_64(m, jnp.uint32(P))
    # t_lo + u_lo == 0 mod 2^32 by construction; carry is 1 iff t_lo != 0
    carry = (t_lo != 0).astype(_U32)
    res = t_hi + u_hi + carry  # < 2p, no u32 overflow since both < p
    return jnp.where(res >= P, res - jnp.uint32(P), res)


def add(a, b):
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    s = a + b
    return jnp.where(s >= P, s - jnp.uint32(P), s)


def sub(a, b):
    a = jnp.asarray(a, _U32)
    b = jnp.asarray(b, _U32)
    return jnp.where(a >= b, a - b, a + jnp.uint32(P) - b)


def neg(a):
    a = jnp.asarray(a, _U32)
    return jnp.where(a == 0, a, jnp.uint32(P) - a)


def to_mont(a):
    """Standard -> Montgomery form: a*R mod p."""
    return mont_mul(a, jnp.uint32(R2))


def from_mont(a):
    """Montgomery -> standard form: a*R^{-1} mod p."""
    return mont_mul(a, jnp.uint32(1))


def mont_pow(a, e: int):
    """a^e (a in Montgomery form, e a Python int) -> Montgomery form."""
    result = jnp.full_like(jnp.asarray(a, _U32), jnp.uint32(R))  # mont(1)
    base = jnp.asarray(a, _U32)
    while e > 0:
        if e & 1:
            result = mont_mul(result, base)
        base = mont_mul(base, base)
        e >>= 1
    return result


def mont_inv(a):
    """Multiplicative inverse via Fermat (a in Montgomery form)."""
    return mont_pow(a, P - 2)


# ---------------------------------------------------------------------------
# host-side helpers (Python ints / numpy; for twiddle precompute and tests)
# ---------------------------------------------------------------------------


def h_pow(a: int, e: int, p: int = P) -> int:
    return pow(a, e, p)


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


def two_adic_generator(bits: int) -> int:
    """Primitive 2^bits-th root of unity (standard form)."""
    assert 0 <= bits <= TWO_ADICITY
    return pow(GENERATOR, (P - 1) >> bits, P)


def np_to_mont(x: np.ndarray) -> np.ndarray:
    """numpy u32 standard-form -> Montgomery form (host precompute)."""
    v = (x.astype(np.uint64) * np.uint64(R)) % np.uint64(P)
    return v.astype(np.uint32)


def np_from_mont(x: np.ndarray) -> np.ndarray:
    rinv = pow(R, -1, P)
    v = (x.astype(np.uint64) * np.uint64(rinv)) % np.uint64(P)
    return v.astype(np.uint32)
