"""Scaling-efficiency measurements on the virtual CPU mesh
(BASELINE.json's "ops/s scaling at 1 chip / 1 host / N hosts" obligation,
measured to the extent single-chip hardware allows — VERDICT r4 missing
#5: report numbers, don't just assert bit-exactness).

Prints ONE JSON line:
  {"commit": {"1": s, "8": s, "overhead_x": r},
   "ntt_dist": {"1": s, "8": s, "overhead_x": r}}

On N VIRTUAL devices pinned to the same physical cores, perfect sharding
shows up as wall-time parity (the same total work, cut into N local
shards + collectives); the overhead factor vs the single-device run IS
the communication+partition cost the real multi-chip target must
amortize.  Runs under JAX_PLATFORMS=cpu in a fresh process.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, repo)
    import numpy as np

    from raiko_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from raiko_tpu.fields import babybear as bb
    from raiko_tpu.ops import merkle, ntt as nttmod, poseidon2 as p2
    from raiko_tpu.parallel.ntt_dist import make_ntt_dist
    from raiko_tpu.parallel.stark_dist import make_trace_commit_dist
    from raiko_tpu.stark.prover import BLOWUP_LOG

    rng = np.random.default_rng(0)
    devices = jax.devices()
    assert len(devices) >= 8, f"need 8 virtual devices, have {len(devices)}"

    def timed(fn, *args, reps=5):
        np.asarray(fn(*args))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    out = {}

    # sharded trace commitment: 128 columns x 2^12 rows
    trace = jnp.asarray(rng.integers(0, bb.P, (1 << 12, 128), np.uint32))

    def commit_local(tr):
        tm = bb.to_mont(tr.T)
        lde = nttmod.lde_from_coeffs(
            nttmod.interpolate(tm), BLOWUP_LOG, bb.GENERATOR
        )
        return merkle.commit(p2.hash_rows(lde.T))[-1][0]

    t1 = timed(commit_local, trace)
    mesh8 = Mesh(np.array(devices[:8]), ("d",))
    commit8 = make_trace_commit_dist(mesh8)
    t8 = timed(commit8, trace)
    out["commit"] = {
        "cols": 128,
        "log_rows": 12,
        "local_s": round(t1, 4),
        "mesh8_s": round(t8, 4),
        "overhead_x": round(t8 / t1, 2) if t1 else None,
    }

    # distributed four-step NTT, 2^18 points
    log_n = 18
    x = bb.to_mont(
        jnp.asarray(rng.integers(0, bb.P, 1 << log_n, np.uint32))
    )
    tl = timed(lambda v: nttmod.ntt_fourstep(v[None, :])[0], x)
    run8 = make_ntt_dist(mesh8, log_n)
    t8n = timed(run8, x)
    out["ntt_dist"] = {
        "log_n": log_n,
        "local_s": round(tl, 4),
        "mesh8_s": round(t8n, 4),
        "overhead_x": round(t8n / tl, 2) if tl else None,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
