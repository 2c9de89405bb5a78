"""Quartic extension of BabyBear: F_p[x] / (x^4 - 11).

Role: FRI/DEEP soundness needs challenges drawn from a field of ~124 bits;
the STARK protocol samples its mixing/folding/OOD challenges from this
extension (the same role the quartic BabyBear extension plays inside the
reference's vendored risc0/sp1 provers).  Irreducibility of x^4 - 11 was
verified computationally (x^{p^4} = x, x^{p^2} != x mod f) and is pinned by
tests.

Device representation: (..., 4) uint32 Montgomery coordinate arrays; all
ops vectorize over leading axes.  Host representation: 4-tuples of ints
(standard form) for the verifier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import babybear as bb

W = 11  # x^4 = W
DEGREE = 4
_W_MONT = np.uint32((W * bb.R) % bb.P)


# ----------------------------------------------------------- device side --


def ef_zero(shape=()) -> jax.Array:
    return jnp.zeros(shape + (4,), dtype=jnp.uint32)


def ef_one(shape=()) -> jax.Array:
    z = np.zeros(4, dtype=np.uint32)
    z[0] = bb.R  # mont(1)
    return jnp.broadcast_to(jnp.asarray(z), shape + (4,))


def ef_from_base(x: jax.Array) -> jax.Array:
    """Lift base-field (...,) to EF (..., 4)."""
    return jnp.stack(
        [x, jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1
    )


def ef_add(a, b):
    return bb.add(a, b)


def ef_sub(a, b):
    return bb.sub(a, b)


def ef_neg(a):
    return bb.neg(a)


def ef_mul(a, b):
    """Schoolbook quartic multiply with x^4 = W reduction (16 base muls)."""
    c = [None] * 7
    for i in range(4):
        for j in range(4):
            t = bb.mont_mul(a[..., i], b[..., j])
            k = i + j
            c[k] = t if c[k] is None else bb.add(c[k], t)
    w = jnp.uint32(_W_MONT)
    out0 = bb.add(c[0], bb.mont_mul(c[4], w))
    out1 = bb.add(c[1], bb.mont_mul(c[5], w))
    out2 = bb.add(c[2], bb.mont_mul(c[6], w))
    out3 = c[3]
    return jnp.stack([out0, out1, out2, out3], axis=-1)


def ef_mul_base(a, x):
    """EF (..., 4) times base (...,) -> EF."""
    return bb.mont_mul(a, x[..., None])


def ef_pow(a, e: int):
    result = ef_one(a.shape[:-1])
    base = a
    while e:
        if e & 1:
            result = ef_mul(result, base)
        base = ef_mul(base, base)
        e >>= 1
    return result


# ------------------------------------------------------------- host side --


def h_add(a, b):
    return tuple((x + y) % bb.P for x, y in zip(a, b))


def h_sub(a, b):
    return tuple((x - y) % bb.P for x, y in zip(a, b))


def h_neg(a):
    return tuple((-x) % bb.P for x in a)


def h_mul(a, b):
    c = [0] * 7
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + a[i] * b[j]) % bb.P
    return tuple((c[k] + W * c[k + 4]) % bb.P for k in range(3)) + (c[3],)


def h_from_base(x: int):
    return (x % bb.P, 0, 0, 0)


H_ZERO = (0, 0, 0, 0)
H_ONE = (1, 0, 0, 0)


def h_pow(a, e: int):
    result = H_ONE
    base = a
    while e:
        if e & 1:
            result = h_mul(result, base)
        base = h_mul(base, base)
        e >>= 1
    return result


def h_batch_inv(vals: list[tuple]) -> list[tuple]:
    """Batch inversion (Montgomery's trick): one h_inv + 3(k-1) h_muls."""
    if not vals:
        return []
    prefix = [H_ONE]
    for v in vals:
        prefix.append(h_mul(prefix[-1], v))
    inv = h_inv(prefix[-1])
    out: list[tuple] = [H_ZERO] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = h_mul(prefix[i], inv)
        inv = h_mul(inv, vals[i])
    return out


def h_inv(a):
    """Inverse via the norm map: a^{-1} = conj / norm with
    conj = a^{p} * a^{p^2} * a^{p^3} (norm lands in F_p)."""
    ap = h_pow(a, bb.P)
    ap2 = h_pow(ap, bb.P)
    ap3 = h_pow(ap2, bb.P)
    conj = h_mul(h_mul(ap, ap2), ap3)
    norm = h_mul(a, conj)
    assert norm[1] == norm[2] == norm[3] == 0
    n_inv = pow(norm[0], bb.P - 2, bb.P)
    return tuple(c * n_inv % bb.P for c in conj)


# ------------------------------------------------- vectorized host side --
# Standard-form (n, 4) uint64 numpy arrays — for challenge-dependent aux
# traces (LogUp helpers) over 10k+ rows, where per-row Python-tuple math
# would dominate proving time.

_PU = np.uint64(bb.P)


def npef_from_base(x: np.ndarray) -> np.ndarray:
    out = np.zeros(x.shape + (4,), dtype=np.uint64)
    out[..., 0] = x % _PU
    return out


def npef_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a + b) % _PU


def npef_sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a + _PU - b % _PU) % _PU


def npef_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Schoolbook quartic product; operands broadcast over leading axes."""
    a = a % _PU
    b = b % _PU
    shape = np.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    c = [np.zeros(shape, dtype=np.uint64) for _ in range(7)]
    for i in range(4):
        for j in range(4):
            c[i + j] = (c[i + j] + (a[..., i] * b[..., j]) % _PU) % _PU
    w = np.uint64(W)
    return np.stack(
        [
            (c[0] + w * c[4]) % _PU,
            (c[1] + w * c[5]) % _PU,
            (c[2] + w * c[6]) % _PU,
            c[3],
        ],
        axis=-1,
    )


def _npef_pow(a: np.ndarray, e: int) -> np.ndarray:
    result = np.zeros_like(a)
    result[..., 0] = 1
    base = a
    while e:
        if e & 1:
            result = npef_mul(result, base)
        base = npef_mul(base, base)
        e >>= 1
    return result


def _np_base_inv(x: np.ndarray) -> np.ndarray:
    """Vectorized Fermat inverse in the base field ((n,) uint64)."""
    result = np.ones_like(x)
    base = x % _PU
    e = bb.P - 2
    while e:
        if e & 1:
            result = (result * base) % _PU
        base = (base * base) % _PU
        e >>= 1
    return result


def npef_inv(a: np.ndarray) -> np.ndarray:
    """Vectorized EF inverse via the norm map (see h_inv)."""
    ap = _npef_pow(a, bb.P)
    ap2 = _npef_pow(ap, bb.P)
    ap3 = _npef_pow(ap2, bb.P)
    conj = npef_mul(npef_mul(ap, ap2), ap3)
    norm = npef_mul(a, conj)
    n_inv = _np_base_inv(norm[..., 0])
    return (conj * n_inv[..., None]) % _PU


def to_device(vals: list[tuple]) -> jax.Array:
    """Host EF tuples -> (N, 4) Montgomery device array."""
    arr = np.array(vals, dtype=np.uint64)
    return jnp.asarray(((arr * bb.R) % bb.P).astype(np.uint32))


def from_device(arr) -> list[tuple]:
    a = np.asarray(bb.from_mont(arr))
    return [tuple(int(v) for v in row) for row in a.reshape(-1, 4)]
