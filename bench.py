"""Benchmark entry point (driver-run on real TPU hardware).

Measures the north-star kernel metrics (BASELINE.md): BabyBear NTT
butterflies/s (headline), plus Poseidon2 hash and keccak-f throughput as
secondary fields.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no absolute numbers (BASELINE.json "published": {}),
so vs_baseline is reported as 1.0 against our own established baseline.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE", "1")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache", "jax"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from raiko_tpu.fields import babybear as bb
    from raiko_tpu.ops import ntt as nttmod
    from raiko_tpu.ops import poseidon2 as p2

    backend = jax.default_backend()
    rng = np.random.default_rng(7)

    # Timing methodology: each kernel runs REPS times INSIDE one jitted
    # fori_loop (a real data-dependent chain) and the result is forced to
    # host with np.asarray.  This measures pure device throughput and is
    # immune to two sandbox artifacts: block_until_ready() not reliably
    # waiting through the axon relay, and ~5 ms per-call dispatch latency.
    reps = 20

    def chained(fn, x0):
        @jax.jit
        def run(v):
            return jax.lax.fori_loop(0, reps, lambda i, s: fn(s), v)

        np.asarray(run(x0))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(x0))
        return (time.perf_counter() - t0) / reps

    # ---- headline: NTT butterflies/s ---------------------------------
    batch, log_n = 64, 14
    n = 1 << log_n
    x = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (batch, n), np.uint32)))
    dt = chained(nttmod.ntt_fourstep, x)
    butterflies = batch * (n // 2) * log_n
    ntt_rate = butterflies / dt

    # ---- secondary: Poseidon2 permutations/s --------------------------
    pbatch = 1 << 14
    state = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (pbatch, 16), np.uint32)))
    p2_rate = pbatch / chained(p2.permute, state)

    # ---- secondary: keccak-f permutations/s ---------------------------
    from raiko_tpu.ops.keccak import keccak_f1600_batch

    kbatch = 1 << 13
    kstate = jnp.asarray(
        rng.integers(0, 2**32, (kbatch, 25, 2), dtype=np.uint32).astype(np.uint32)
    )
    keccak_rate = kbatch / chained(keccak_f1600_batch, kstate)

    print(
        json.dumps(
            {
                "metric": "babybear_ntt_butterflies_per_s",
                "value": round(ntt_rate),
                "unit": "butterflies/s",
                "vs_baseline": 1.0,
                "backend": backend,
                "config": {"batch": batch, "log_n": log_n},
                "secondary": {
                    "poseidon2_perms_per_s": round(p2_rate),
                    "keccak_f1600_per_s": round(keccak_rate),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
