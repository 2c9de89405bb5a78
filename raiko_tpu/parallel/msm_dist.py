"""Distributed Pippenger MSM: points sharded per chip, bucket matrices
reduced with collectives (SURVEY.md §2.3(b)).

Each chip runs the sort/segmented-scan bucket accumulation over its point
shard (ops/msm.bucket_matrix), producing a dense (windows, buckets) EC
matrix; the matrices are EC-added across the mesh with an all-gather +
log-depth fold (EC addition is not a ring `psum`, so the combine is an
explicit reduction over gathered operands), and the shared suffix-sum /
window fold finishes identically on every chip."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..kzg import curve
from ..ops import msm as msmmod


def make_msm_dist(mesh: Mesh, axis: str = "d"):
    """Build a jitted distributed MSM.  Takes (N, 3, 24) points and
    (N, 16) scalar limbs with N a multiple of the mesh size; returns one
    (3, 24) projective point (replicated)."""
    ndev = mesh.shape[axis]

    def local(pts, limbs):
        # pts: (N/D, 3, 24), limbs: (N/D, 16)
        buckets = msmmod.bucket_matrix(pts, limbs)  # (32, 256, 3, 24)
        gathered = jax.lax.all_gather(buckets, axis)  # (D, 32, 256, 3, 24)
        acc = gathered[0]
        for i in range(1, ndev):
            acc = msmmod._add(
                acc.reshape(-1, 3, 24), gathered[i].reshape(-1, 3, 24)
            ).reshape(acc.shape)
        return msmmod.combine_buckets(acc)

    shmapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_rep=False,
    )

    @jax.jit
    def run(points: jax.Array, scalar_limbs: jax.Array) -> jax.Array:
        points = jax.lax.with_sharding_constraint(
            points, NamedSharding(mesh, P(axis))
        )
        scalar_limbs = jax.lax.with_sharding_constraint(
            scalar_limbs, NamedSharding(mesh, P(axis))
        )
        return shmapped(points, scalar_limbs)

    return run
