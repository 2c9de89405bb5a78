"""Batched SHA-256 on TPU.

Role: the EIP-4844 path hashes blob commitments into versioned hashes and
derives evaluation points with SHA-256 (reference lib/src/primitives/
eip4844.rs:44-48,91-95); the zkVM guests patch a SHA-256 precompile
(provers/risc0/guest/src/zk_op.rs:27-30).  This kernel covers the batch
side; small host-side hashes use hashlib.

Constants are *derived* (integer cube/square roots of the first primes) at
import time rather than transcribed — same policy as keccak.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _primes(n: int) -> list[int]:
    ps, c = [], 2
    while len(ps) < n:
        if all(c % p for p in ps):
            ps.append(c)
        c += 1
    return ps


def _iroot(x: int, k: int) -> int:
    """Integer k-th root via Newton iteration on Python ints."""
    if x == 0:
        return 0
    r = 1 << ((x.bit_length() + k - 1) // k)
    while True:
        nr = ((k - 1) * r + x // r ** (k - 1)) // k
        if nr >= r:
            return r
        r = nr


# frac(cbrt(p)) * 2^32 for first 64 primes / frac(sqrt(p)) * 2^32 for first 8
K = np.array([_iroot(p << 96, 3) & 0xFFFFFFFF for p in _primes(64)], dtype=np.uint32)
H0 = np.array([_iroot(p << 64, 2) & 0xFFFFFFFF for p in _primes(8)], dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def sha256_compress_batch(state: jax.Array, block: jax.Array) -> jax.Array:
    """One compression. state: (B, 8) u32, block: (B, 16) u32 (BE words).

    The 48-step message-schedule expansion is a short vectorized unroll; the
    64 rounds run under ``lax.scan`` with (K[i], w[i]) as scanned inputs so
    the compiled graph stays small."""
    w = [block[:, i] for i in range(16)]
    for i in range(16, 64):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    w_scan = jnp.stack(w, axis=0)  # (64, B)

    def round_body(carry, xs):
        a, b, c, d, e, f, g, h = carry
        k_i, w_i = xs
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + k_i + w_i
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g), None

    init = tuple(state[:, i] for i in range(8))
    out, _ = jax.lax.scan(round_body, init, (jnp.asarray(K), w_scan))
    return state + jnp.stack(out, axis=1)


@functools.partial(jax.jit, static_argnums=(1,))
def _sha256_blocks(blocks: jax.Array, nblocks: int) -> jax.Array:
    bsz = blocks.shape[0]
    state = jnp.broadcast_to(jnp.asarray(H0), (bsz, 8))
    for i in range(nblocks):
        state = sha256_compress_batch(state, blocks[:, i, :])
    return state


def pack_messages(msgs: list[bytes]) -> tuple[np.ndarray, int]:
    """Pad equal-block-count messages to (B, nblocks, 16) big-endian words."""
    nblocks = max((len(m) + 8) // 64 + 1 for m in msgs)
    assert all((len(m) + 8) // 64 + 1 == nblocks for m in msgs)
    buf = np.zeros((len(msgs), nblocks * 64), dtype=np.uint8)
    for i, m in enumerate(msgs):
        buf[i, : len(m)] = np.frombuffer(m, dtype=np.uint8)
        buf[i, len(m)] = 0x80
        buf[i, -8:] = np.frombuffer(
            (8 * len(m)).to_bytes(8, "big"), dtype=np.uint8
        )
    words = buf.reshape(len(msgs), nblocks, 16, 4)
    w = (
        words[..., 0].astype(np.uint32) << 24
        | words[..., 1].astype(np.uint32) << 16
        | words[..., 2].astype(np.uint32) << 8
        | words[..., 3].astype(np.uint32)
    )
    return w, nblocks


def sha256_tpu(msgs: list[bytes]) -> list[bytes]:
    """Batch SHA-256, grouped by block count; bit-exact with hashlib."""
    if not msgs:
        return []
    groups: dict[int, list[int]] = {}
    for i, m in enumerate(msgs):
        groups.setdefault((len(m) + 8) // 64 + 1, []).append(i)
    out: list[bytes | None] = [None] * len(msgs)
    for nb, idxs in groups.items():
        words, n = pack_messages([msgs[i] for i in idxs])
        dig = np.asarray(_sha256_blocks(jnp.asarray(words), n))
        raw = dig.astype(">u4").tobytes()
        for j, i in enumerate(idxs):
            out[i] = raw[32 * j : 32 * j + 32]
    return out  # type: ignore[return-value]
