"""Batched Keccak-256 on TPU — lane-parallel over many messages.

Role: the reference hashes every MPT node, block header and the protocol
instance with Keccak-256 (lib/src/primitives/keccak.rs, mpt.rs:117-121).
State-root recomputation touches thousands of nodes per block; this kernel
hashes them in one shot, batch-parallel (SURVEY.md §2.2 "vectorized Keccak
permutation kernel (lane-parallel over many nodes)").

TPU-first design
----------------
u64 lanes are split into (lo, hi) u32 pairs — the VPU has no 64-bit ints.
The state is kept as two (B, 25) arrays so every step (theta, rho, pi, chi)
is a handful of *whole-state* vector ops: xor-reductions and static rolls
over the 5x5 lane grid, elementwise variable-shift rotations (the per-lane
rho offsets ride in a constant vector), and one static lane permutation for
pi.  Rounds run under ``lax.scan`` with the round constants as scanned
inputs — the compiled program is one ~60-op round body, not a 10k-op unroll
(which XLA:CPU takes minutes to compile and XLA:TPU schedules worse).

Host side packs/pads messages into fixed-block-count groups (most MPT nodes
fit one 136-byte rate block); the device loops absorb over a *static* block
count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.keccak_py import RHO_OFFSETS, ROUND_CONSTANTS

RATE = 136  # bytes, Keccak-256
_U32 = jnp.uint32

# per-lane rho rotation amounts, indexed by lane = x + 5y
_RHO_VEC = np.array(
    [RHO_OFFSETS[i % 5][i // 5] for i in range(25)], dtype=np.uint32
)
# pi: dst lane j receives src lane _PI_SRC[j]
_PI_SRC = np.zeros(25, dtype=np.int32)
for _x in range(5):
    for _y in range(5):
        _PI_SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
_RC_ARR = np.array(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in ROUND_CONSTANTS], dtype=np.uint32
)


def _rot_pair(lo, hi, n):
    """Rotate (lo, hi) u32 pairs left by elementwise amounts n in [0, 64)."""
    swap = n >= 32
    lo1 = jnp.where(swap, hi, lo)
    hi1 = jnp.where(swap, lo, hi)
    m = n & 31
    inv = (32 - m) & 31
    zero = m == 0
    new_lo = jnp.where(zero, lo1, (lo1 << m) | jnp.where(zero, 0, hi1 >> inv))
    new_hi = jnp.where(zero, hi1, (hi1 << m) | jnp.where(zero, 0, lo1 >> inv))
    return new_lo, new_hi


def keccak_f1600_batch(state: jax.Array) -> jax.Array:
    """One permutation over a batch. state: (B, 25, 2) u32, [..., 0]=lo."""
    lo = state[:, :, 0]
    hi = state[:, :, 1]
    rho = jnp.asarray(_RHO_VEC)
    pi_src = jnp.asarray(_PI_SRC)

    def round_body(carry, rc):
        lo, hi = carry
        bsz = lo.shape[0]
        # theta: column parities + rotated neighbour mix
        g_lo = lo.reshape(bsz, 5, 5)  # [y][x]
        g_hi = hi.reshape(bsz, 5, 5)
        c_lo = g_lo[:, 0] ^ g_lo[:, 1] ^ g_lo[:, 2] ^ g_lo[:, 3] ^ g_lo[:, 4]
        c_hi = g_hi[:, 0] ^ g_hi[:, 1] ^ g_hi[:, 2] ^ g_hi[:, 3] ^ g_hi[:, 4]
        r_lo = (c_lo << 1) | (c_hi >> 31)  # rotl64 by 1
        r_hi = (c_hi << 1) | (c_lo >> 31)
        d_lo = jnp.roll(c_lo, 1, axis=1) ^ jnp.roll(r_lo, -1, axis=1)
        d_hi = jnp.roll(c_hi, 1, axis=1) ^ jnp.roll(r_hi, -1, axis=1)
        lo = (g_lo ^ d_lo[:, None, :]).reshape(bsz, 25)
        hi = (g_hi ^ d_hi[:, None, :]).reshape(bsz, 25)
        # rho: elementwise per-lane rotation
        lo, hi = _rot_pair(lo, hi, rho[None, :])
        # pi: static lane permutation
        lo = lo[:, pi_src]
        hi = hi[:, pi_src]
        # chi: rowwise nonlinear mix
        g_lo = lo.reshape(bsz, 5, 5)
        g_hi = hi.reshape(bsz, 5, 5)
        lo = (g_lo ^ (~jnp.roll(g_lo, -1, axis=2) & jnp.roll(g_lo, -2, axis=2))).reshape(bsz, 25)
        hi = (g_hi ^ (~jnp.roll(g_hi, -1, axis=2) & jnp.roll(g_hi, -2, axis=2))).reshape(bsz, 25)
        # iota
        lo = lo.at[:, 0].set(lo[:, 0] ^ rc[0])
        hi = hi.at[:, 0].set(hi[:, 0] ^ rc[1])
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(round_body, (lo, hi), jnp.asarray(_RC_ARR))
    return jnp.stack([lo, hi], axis=-1)


@functools.partial(jax.jit, static_argnums=(1,))
def _keccak256_blocks(blocks: jax.Array, nblocks: int) -> jax.Array:
    """Absorb nblocks rate-blocks per message and squeeze 256 bits.

    blocks: (B, nblocks, 34) u32 — each block is 17 u64 lanes as lo/hi
    interleaved pairs (lane i -> [2i]=lo, [2i+1]=hi).
    Returns (B, 8) u32: the 256-bit digests as 8 little-endian words.
    """
    bsz = blocks.shape[0]
    state = jnp.zeros((bsz, 25, 2), dtype=_U32)
    for blk in range(nblocks):
        xor_block = blocks[:, blk, :].reshape(bsz, 17, 2)
        state = state.at[:, :17, :].set(state[:, :17, :] ^ xor_block)
        state = keccak_f1600_batch(state)
    return state[:, :4, :].reshape(bsz, 8)


def pack_messages(msgs: list[bytes]) -> tuple[np.ndarray, int]:
    """Pad equal-block-count messages into the device layout.

    All messages must need the same number of rate blocks
    (len // RATE equal after padding).  Returns ((B, nblocks, 34) u32 array,
    nblocks)."""
    nblocks = max(len(m) // RATE + 1 for m in msgs)
    assert all(len(m) // RATE + 1 == nblocks for m in msgs), (
        "group messages by block count before packing"
    )
    buf = np.zeros((len(msgs), nblocks * RATE), dtype=np.uint8)
    for i, m in enumerate(msgs):
        buf[i, : len(m)] = np.frombuffer(m, dtype=np.uint8)
        buf[i, len(m)] ^= 0x01
        buf[i, nblocks * RATE - 1] ^= 0x80
    words = buf.view(np.uint32).reshape(len(msgs), nblocks, RATE // 4)
    # RATE//4 = 34 u32 words; u64 lane i occupies words 2i (lo), 2i+1 (hi)
    # little-endian host: already in (lo, hi) order
    return words, nblocks


def keccak256_tpu(msgs: list[bytes]) -> list[bytes]:
    """Hash a batch of messages on the accelerator, grouping by block count.

    Results are bit-exact with the scalar host implementation."""
    if not msgs:
        return []
    order: dict[int, list[int]] = {}
    for i, m in enumerate(msgs):
        order.setdefault(len(m) // RATE + 1, []).append(i)
    out: list[bytes | None] = [None] * len(msgs)
    for nblocks, idxs in order.items():
        words, nb = pack_messages([msgs[i] for i in idxs])
        digests = np.asarray(_keccak256_blocks(jnp.asarray(words), nb))
        raw = digests.astype("<u4").tobytes()
        for j, i in enumerate(idxs):
            out[i] = raw[32 * j : 32 * j + 32]
    return out  # type: ignore[return-value]


def keccak256_fixed(data: jax.Array) -> jax.Array:
    """Device-resident fixed-size hashing: data (B, L) u8 with L < RATE
    static.  Returns (B, 8) u32 digests.  Used for hashing device-produced
    32/64-byte values (e.g. Merkle layers) without a host roundtrip."""
    bsz, length = data.shape
    assert length < RATE
    padded = jnp.zeros((bsz, RATE), dtype=jnp.uint8)
    padded = padded.at[:, :length].set(data)
    padded = padded.at[:, length].set(padded[:, length] ^ 0x01)
    padded = padded.at[:, RATE - 1].set(padded[:, RATE - 1] ^ 0x80)
    # u8 -> u32 little-endian words
    w = (
        padded[:, 0::4].astype(_U32)
        | (padded[:, 1::4].astype(_U32) << 8)
        | (padded[:, 2::4].astype(_U32) << 16)
        | (padded[:, 3::4].astype(_U32) << 24)
    )
    return _keccak256_blocks(w.reshape(bsz, 1, 34), 1)
