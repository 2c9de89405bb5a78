"""raiko-tpu: a TPU-native block-proving framework.

A from-scratch rebuild of the capabilities of raiko (Taiko's multi-backend
block prover, see /root/reference) designed TPU-first:

- the dense proof arithmetic (BabyBear NTT/LDE, FRI folding, Poseidon2 /
  Keccak / SHA-256 hashing, BLS12-381 KZG & Pippenger MSM) is implemented as
  JAX + Pallas TPU kernels over limb-sliced integer arrays,
- multi-chip scaling goes through ``jax.sharding.Mesh`` + ``shard_map``
  collectives (psum / all_to_all / ppermute) over ICI, not NCCL/MPI,
- the host runtime (HTTP proof service, task queue + status state machine,
  preflight, input cache, metrics) mirrors the reference's behaviour
  (raiko host/, core/, tasks/ crates) with an asyncio actor + aiohttp.

Subpackages
-----------
fields    -- BabyBear + BLS12-381 finite-field arithmetic (limb-sliced, JAX)
ops       -- Pallas/JAX kernels: keccak, sha256, poseidon2, ntt, msm, merkle
stark     -- AIR framework, FRI, STARK prover/verifier
kzg       -- EIP-4844 blob / KZG commitment path
mpt       -- sparse Merkle-Patricia trie (reference: lib/src/primitives/mpt.rs)
evm       -- in-guest DB + deterministic block re-execution (lib/src/builder.rs)
chain     -- chain specs / forks (lib/src/consts.rs)
proto     -- GuestInput/GuestOutput, ProtocolInstance, RLP, ABI (lib/src/input.rs)
core      -- orchestrator, preflight, providers (core/)
provers   -- native / tee / tpu-stark proof backends (provers/)
parallel  -- device-mesh utilities, distributed NTT/MSM
host      -- HTTP service, scheduler, metrics, cache (host/)
tasks     -- task manager: in-memory + sqlite backends (tasks/)
utils     -- keccak/sha fallbacks, secp256k1, tx-list codec, timers
"""

__version__ = "0.1.0"
