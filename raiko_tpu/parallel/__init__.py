"""Multi-chip distribution layer (SURVEY.md §2.3, §7 step 7).

The role NCCL/MPI plays elsewhere is filled by jax.sharding + shard_map
collectives over the device mesh: ICI within a slice, DCN across hosts.
Components: distributed NTT (all-to-all four-step), distributed MSM
(per-chip bucket matrices + collective EC reduction), sharded STARK trace
commitment."""
