"""Generic multi-limb Montgomery field arithmetic on u32 lanes (16-bit limbs).

Role: BLS12-381 Fp (24 limbs) and Fr (16 limbs) for the EIP-4844 KZG path —
the TPU-native replacement for the reference's vendored blst assembly
(SURVEY.md §2.2: "381-bit field as limb-sliced u32 arrays").

TPU-first design
----------------
A field element is a (..., NLIMBS) uint32 array of 16-bit limbs, little-
endian.  16-bit limbs make every partial product fit u32 and let column
accumulations of up to 48 lo/hi halves stay below 2^23 — no carry detection,
no 64-bit emulation, pure VPU adds/muls.  Montgomery reduction is operand-
scanning with one 16-bit reduction digit per step (NPRIME = -p^-1 mod 2^16).
Static Python loops over limb indices build a ~500-op graph per multiply
that XLA vectorizes over the batch; there is no data-dependent control flow.

Mirrors the design of raiko_tpu.fields.babybear at multi-limb scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = np.uint32(0xFFFF)


def int_to_limbs(v: int, nlimbs: int) -> np.ndarray:
    return np.array([(v >> (16 * i)) & 0xFFFF for i in range(nlimbs)], dtype=np.uint32)


def limbs_to_int(a) -> int:
    a = np.asarray(a)
    return sum(int(x) << (16 * i) for i, x in enumerate(a.tolist()))


class LimbField:
    """A prime field with elements as (..., nlimbs) u32 arrays of 16-bit limbs."""

    def __init__(self, modulus: int, nlimbs: int):
        assert modulus < (1 << (16 * nlimbs))
        self.modulus = modulus
        self.nlimbs = nlimbs
        self.R = (1 << (16 * nlimbs)) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.NPRIME = (-pow(modulus, -1, 1 << 16)) % (1 << 16)
        self.p_limbs = int_to_limbs(modulus, nlimbs)
        self.r_limbs = int_to_limbs(self.R, nlimbs)
        self.r2_limbs = int_to_limbs(self.R2, nlimbs)
        self.zero_limbs = np.zeros(nlimbs, dtype=np.uint32)

    # -- helpers ----------------------------------------------------------
    def to_limbs(self, v: int) -> np.ndarray:
        return int_to_limbs(v % self.modulus, self.nlimbs)

    def to_mont_int(self, v: int) -> np.ndarray:
        return int_to_limbs((v * self.R) % self.modulus, self.nlimbs)

    def from_mont_limbs(self, a) -> int:
        return limbs_to_int(a) * pow(self.R, -1, self.modulus) % self.modulus

    # -- normalized-limb primitives --------------------------------------
    #
    # Carry/borrow propagation uses Kogge-Stone lookahead over the limb
    # axis (log2(n) doubling steps of whole-array shifts) instead of an
    # n-step sequential chain: ~4x fewer ops, no 24-deep scalar dependency
    # chain starving the VPU, and far faster XLA compiles.

    @staticmethod
    def _shift_down(x, d, fill):
        """x[i] <- x[i-d] along the limb axis; positions < d get `fill`."""
        nb = x.ndim - 1
        return jnp.pad(
            x[..., :-d], [(0, 0)] * nb + [(d, 0)], constant_values=fill
        )

    def _ks_carry(self, g, p):
        """Kogge-Stone prefix: G[i] = carry out of limbs 0..i given
        per-limb generate g and propagate p (both 0/1 u32)."""
        d = 1
        while d < self.nlimbs:
            g = g | (p & self._shift_down(g, d, 0))
            p = p & self._shift_down(p, d, 1)
            d <<= 1
        return g

    def _carry_normalize(self, s):
        """Normalize limbs to < 2^16.  Input limbs must be < 2^31.
        Returns (normalized, top_carry)."""
        # the top limb's high half carries past the last position; for
        # moduli within a bit of 2^(16n) (secp256k1: 2p > 2^256) it is
        # routinely nonzero and must flow into top_carry, not vanish
        dropped = s[..., -1] >> 16
        # one elementwise pass leaves limbs < 2^16 + 2^15 with carries <= 1
        s = (s & MASK16) + self._shift_down(s >> 16, 1, 0)
        g = s >> 16
        p = ((s & MASK16) == MASK16).astype(jnp.uint32)
        carry_out = self._ks_carry(g, p)
        carry_in = self._shift_down(carry_out, 1, 0)
        return (s + carry_in) & MASK16, carry_out[..., -1] + dropped

    def _sub_limbs(self, a, b):
        """(a - b) limbwise with borrow lookahead; both normalized.
        Returns (difference mod 2^(16n), final_borrow)."""
        g = (a < b).astype(jnp.uint32)
        p = (a == b).astype(jnp.uint32)
        borrow_out = self._ks_carry(g, p)
        borrow_in = self._shift_down(borrow_out, 1, 0)
        diff = (a + jnp.uint32(0x10000) - b - borrow_in) & MASK16
        return diff, borrow_out[..., -1]

    def _sub_if_ge(self, a, top_extra=None):
        """Conditionally subtract the modulus when a >= p (a < 2p)."""
        p = jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape)
        diff, borrow = self._sub_limbs(a, p)
        if top_extra is not None:
            # a has a virtual limb `top_extra` above the top; subtracting p
            # borrows from it. a >= p iff top_extra > 0 or no borrow.
            ge = (top_extra > 0) | (borrow == 0)
        else:
            ge = borrow == 0
        return jnp.where(ge[..., None], diff, a)

    def add(self, a, b):
        s, carry = self._carry_normalize(a + b)
        return self._sub_if_ge(s, top_extra=carry)

    def neg(self, a):
        """p - a for a in [0, p); maps 0 -> 0."""
        p = jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape)
        res, _ = self._sub_limbs(p, a)
        is_zero = jnp.all(a == 0, axis=-1)
        return jnp.where(is_zero[..., None], a, res)

    def sub(self, a, b):
        """a - b mod p; adds p back on borrow."""
        diff, borrow = self._sub_limbs(a, b)
        p = jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape)
        corrected, _ = self._carry_normalize(diff + p)
        return jnp.where((borrow != 0)[..., None], corrected, diff)

    def mont_mul(self, a, b):
        """Montgomery product a*b*R^{-1} mod p over (..., nlimbs) arrays.

        Scatter-free: the schoolbook product is one broadcast multiply
        against a shifted-operand matrix reduced along the limb axis, and
        the per-digit reduction uses pad+add column shifts — XLA compiles
        slice/pad/reduce orders of magnitude faster than scatter updates,
        and they map directly onto VPU lanes."""
        n = self.nlimbs
        p = jnp.asarray(self.p_limbs)
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, shape + (n,))
        b = jnp.broadcast_to(b, shape + (n,))
        nb = len(shape)
        # shifted-operand matrix: row i = b at columns i..i+n-1 -> (..., n, 2n)
        rows = [jnp.pad(b, [(0, 0)] * nb + [(i, n - i)]) for i in range(n)]
        bmat = jnp.stack(rows, axis=-2)
        prod = a[..., :, None] * bmat  # (..., n, 2n) full u32 products
        lo = jnp.sum(prod & MASK16, axis=-2)  # (..., 2n), cols < 2^21
        hi = jnp.sum(prod >> 16, axis=-2)
        # acc: 2n+1 columns (hi halves shift up one column)
        acc = jnp.concatenate(
            [lo, jnp.zeros(shape + (1,), jnp.uint32)], axis=-1
        ) + jnp.pad(hi, [(0, 0)] * nb + [(1, 0)])
        # reduction: one 16-bit Montgomery digit per step; the accumulator
        # shifts down a column each step instead of being indexed into
        npr = jnp.uint32(self.NPRIME)
        for _ in range(n):
            t0 = acc[..., 0]
            m = ((t0 & MASK16) * npr) & MASK16
            mp = m[..., None] * p  # (..., n)
            carry = (t0 + (mp[..., 0] & MASK16)) >> 16
            width = acc.shape[-1] - 1
            tail = jnp.pad(
                (mp & MASK16)[..., 1:], [(0, 0)] * nb + [(0, width - (n - 1))]
            ) + jnp.pad(mp >> 16, [(0, 0)] * nb + [(0, width - n)])
            head = jnp.pad(carry[..., None], [(0, 0)] * nb + [(0, width - 1)])
            acc = acc[..., 1:] + tail + head
        res, top = self._carry_normalize(acc[..., :n])
        top = top + acc[..., n]
        return self._sub_if_ge(res, top_extra=top)

    def to_mont(self, a):
        return self.mont_mul(a, jnp.asarray(self.r2_limbs))

    def from_mont(self, a):
        one = jnp.zeros(self.nlimbs, dtype=jnp.uint32).at[0].set(1)
        return self.mont_mul(a, one)

    def mont_one(self, shape=()) -> jax.Array:
        return jnp.broadcast_to(jnp.asarray(self.r_limbs), shape + (self.nlimbs,))

    def mont_pow(self, a, e: int):
        result = jnp.broadcast_to(jnp.asarray(self.r_limbs), a.shape)
        base = a
        while e > 0:
            if e & 1:
                result = self.mont_mul(result, base)
            base = self.mont_mul(base, base)
            e >>= 1
        return result

    def mont_inv(self, a):
        return self.mont_pow(a, self.modulus - 2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)


# BLS12-381 base and scalar fields
P_FP = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
P_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

FP = LimbField(P_FP, 24)
FR = LimbField(P_FR, 16)
