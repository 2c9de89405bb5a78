"""Sharded STARK trace commitment: the multi-chip prover step.

Parallelism axes over the mesh (the sharding plan the driver's multi-chip
dry-run exercises):

- **column parallel** (tensor-parallel analog): trace columns shard across
  chips; per-column interpolation + coset LDE are fully local NTT work;
- **all-to-all reshard** (sequence-parallel analog): LDE output resharded
  from column-shards to row-shards — one collective;
- **row parallel** (data-parallel analog): Poseidon2 leaf hashing and the
  lower Merkle levels run on local row shards; subtree roots are
  all-gathered and the top of the tree is folded identically on every
  chip (replicated, log2(D) compressions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import babybear as bb
from ..ops import merkle, ntt as nttmod, poseidon2 as p2
from ..stark.prover import BLOWUP_LOG


def make_trace_commit_dist(mesh: Mesh, axis: str = "d"):
    """Build a jitted sharded trace-commitment step.

    Takes a (n, W) uint32 standard-form trace (W a multiple of the mesh
    size) and returns the (8,) Merkle root (replicated)."""
    ndev = mesh.shape[axis]

    def local(trace_cols):
        # trace_cols: (W/D, n) — this chip's column shard (Montgomery)
        coeffs = nttmod.interpolate(trace_cols)
        lde = nttmod.lde_from_coeffs(coeffs, BLOWUP_LOG, bb.GENERATOR)  # (W/D, m)
        m = lde.shape[-1]
        # reshard: columns -> row blocks (all-to-all on the domain axis)
        rows = jax.lax.all_to_all(lde, axis, 1, 0, tiled=True)  # (W, m/D)
        leaves = p2.hash_rows(rows.T)  # (m/D, 8)
        levels = merkle.commit(leaves)
        sub_root = levels[-1][0]  # (8,)
        gathered = jax.lax.all_gather(sub_root, axis)  # (D, 8)
        # fold the top of the tree identically on every chip
        cur = gathered
        while cur.shape[0] > 1:
            cur = p2.compress(cur[0::2], cur[1::2])
        return cur[0]

    shmapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=P(),
        check_rep=False,
    )

    @jax.jit
    def run(trace: jax.Array) -> jax.Array:
        tm = bb.to_mont(trace.T)  # (W, n)
        tm = jax.lax.with_sharding_constraint(
            tm, NamedSharding(mesh, P(axis, None))
        )
        return shmapped(tm)

    return run


def make_commit_cols_dist(mesh: Mesh, axis: str = "d"):
    """Mesh-sharded drop-in for the production prover's ``_commit_cols``
    (stark/prover.py): same (coeffs, lde, levels) outputs BIT-EXACT, with
    the round-2 dryrun plan now carrying the real statement:

      column-parallel iNTT + coset LDE (shard_map, fully local NTTs)
        -> reshard (GSPMD transpose)
        -> row-parallel Poseidon2 leaf hashing (shard_map)
        -> Merkle fold (XLA-partitioned; top levels are tiny).

    Column counts that don't divide the mesh are zero-padded for the NTT
    stage and sliced back before hashing, so roots match the single-chip
    path exactly.  Activated through stark.prover.set_mesh()."""
    import functools

    ndev = mesh.shape[axis]

    @functools.partial(jax.jit, static_argnames=("shift",))
    def commit(cols_m: jax.Array, shift: int):
        k, n = cols_m.shape
        pad = (-k) % ndev
        cp = jnp.pad(cols_m, ((0, pad), (0, 0)))
        cp = jax.lax.with_sharding_constraint(
            cp, NamedSharding(mesh, P(axis, None))
        )

        def loc_lde(c):
            coeffs = nttmod.interpolate(c)
            return coeffs, nttmod.lde_from_coeffs(coeffs, BLOWUP_LOG, shift)

        coeffs_p, lde_p = shard_map(
            loc_lde,
            mesh=mesh,
            in_specs=(P(axis, None),),
            out_specs=(P(axis, None), P(axis, None)),
            check_rep=False,
        )(cp)
        coeffs, lde = coeffs_p[:k], lde_p[:k]
        rows = jax.lax.with_sharding_constraint(
            lde.T, NamedSharding(mesh, P(axis, None))
        )
        leaves = shard_map(
            p2.hash_rows,
            mesh=mesh,
            in_specs=(P(axis, None),),
            out_specs=P(axis, None),
            check_rep=False,
        )(rows)
        return coeffs, lde, merkle.commit(leaves)

    return commit
