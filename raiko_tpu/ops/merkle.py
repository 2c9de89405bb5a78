"""Merkle tree commitment over Poseidon2 digests — level-parallel on TPU.

Role: vector commitments for STARK trace/FRI layers (reference analog: the
Merkle hashing inside risc0/sp1 prover cores; "embarrassingly parallel
Merkle hashing", SURVEY.md §2.3(e)).

Each level halves the node count with one batched ``compress`` call — the
whole tree is log2(N) kernel launches, every one fully vector-parallel.
Leaves arrive in bit-reversed LDE order (see ops/ntt.py), which makes
sibling pairs adjacent in memory — pairing is a reshape, not a gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import poseidon2 as p2


def commit(leaves: jax.Array) -> list[jax.Array]:
    """Build all levels. leaves: (N, 8) Montgomery u32, N a power of two.

    Returns [leaves, level1, ..., root] where root has shape (1, 8)."""
    n = leaves.shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        pairs = cur.reshape(cur.shape[0] // 2, 2, p2.OUT)
        cur = p2.compress(pairs[:, 0, :], pairs[:, 1, :])
        levels.append(cur)
    return levels


def root(levels: list[jax.Array]) -> jax.Array:
    return levels[-1][0]


def open_path(levels: list[jax.Array], index: int) -> list[np.ndarray]:
    """Authentication path for leaf ``index`` (host-side)."""
    path = []
    for lvl in levels[:-1]:
        sib = index ^ 1
        path.append(np.asarray(lvl[sib]))
        index >>= 1
    return path


def open_paths(
    levels: list[jax.Array], indices: list[int]
) -> list[list[np.ndarray]]:
    """Authentication paths for MANY leaves in STANDARD form (the proof
    wire format): one device gather + one transfer per tree level instead
    of one per node — per-node slicing is relay-latency-bound on TPU (each
    eager dispatch costs ~150 ms through the tunnel, and a query phase
    opens hundreds of nodes)."""
    from ..fields import babybear as bb

    idx = np.asarray(indices, np.int64)
    gathered = []
    for lvl in levels[:-1]:
        sib = jnp.asarray((idx ^ 1).astype(np.int32))
        gathered.append(bb.from_mont(jnp.take(lvl, sib, axis=0)))  # device
        idx = idx >> 1
    if not gathered:
        return [[] for _ in indices]
    # ONE host transfer for the whole path set
    flat = np.asarray(jnp.concatenate([g.reshape(-1) for g in gathered]))
    per_level, off = [], 0
    for g in gathered:
        n = g.shape[0] * g.shape[1]
        per_level.append(flat[off : off + n].reshape(g.shape))
        off += n
    return [
        [per_level[lev][q] for lev in range(len(per_level))]
        for q in range(len(indices))
    ]


def verify_path(
    leaf: np.ndarray, index: int, path: list[np.ndarray], expected_root: np.ndarray
) -> bool:
    """Host-side path verification (the verifier never needs a TPU)."""
    cur = jnp.asarray(leaf).reshape(1, p2.OUT)
    for sib in path:
        s = jnp.asarray(sib).reshape(1, p2.OUT)
        if index & 1:
            cur = p2.compress(s, cur)
        else:
            cur = p2.compress(cur, s)
        index >>= 1
    return bool((np.asarray(cur[0]) == np.asarray(expected_root)).all())
