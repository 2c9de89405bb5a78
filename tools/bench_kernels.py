"""Per-kernel benchmark harness + speed-of-light analysis
(SURVEY.md §7 step 9 / BASELINE.md north-star metrics).

Runs on whatever backend JAX selects (real TPU under the default env).
Prints a table plus a JSON blob; bench.py remains the driver's canonical
one-line entry point.
"""

from __future__ import annotations

import argparse
import json
import time


def timeit(fn, *args, reps=10):
    """Differential-chain timing (see bench.py): fn runs chained inside one
    jitted fori_loop; the per-iteration time is the difference between a
    long and a short chain, cancelling the relay's fixed per-call cost
    (which used to inflate these numbers 8-50x — BASELINE.md).

    Works for non-shape-preserving kernels too: the output is mixed back
    into the carried input (a real data dependence, so no iteration can be
    elided) while keeping the carry shape fixed."""
    import jax
    import numpy as np

    x0 = args[0]
    rest = args[1:]
    preserves = jax.eval_shape(fn, x0, *rest).shape == x0.shape

    def step(s):
        out = fn(s, *rest)
        if preserves:
            return out
        flat = s.reshape(-1)
        flat = flat.at[0].add(out.reshape(-1)[0].astype(flat.dtype))
        return flat.reshape(s.shape)

    def total(r):
        @jax.jit
        def run(v):
            out = jax.lax.fori_loop(0, r, lambda i, s: step(s), v)
            return out.reshape(-1)[:8]

        np.asarray(run(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = max(2, reps // 2), reps * 5
    return (total(r2) - total(r1)) / (r2 - r1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--msm", action="store_true", help="include the 4096-point blob MSM (slow compile)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from raiko_tpu.fields import babybear as bb
    from raiko_tpu.ops import ntt as nttmod
    from raiko_tpu.ops import poseidon2 as p2
    from raiko_tpu.ops.keccak import keccak_f1600_batch
    from raiko_tpu.ops.ntt_mxu import ntt_mxu

    rng = np.random.default_rng(7)
    results = {}
    backend = jax.default_backend()

    # HBM bandwidth reference for speed-of-light notes (v5e ~ 820 GB/s)
    HBM_GBPS = 820 if backend == "tpu" else 50

    # NTT variants
    batch, log_n = 64, 14
    n = 1 << log_n
    x = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (batch, n), np.uint32)))
    butterflies = batch * (n // 2) * log_n
    for name, f in (
        ("ntt_iterative", nttmod.ntt),
        ("ntt_fourstep", nttmod.ntt_fourstep),
        ("ntt_mxu", ntt_mxu),
    ):
        dt = timeit(jax.jit(f), x)
        results[name] = {
            "butterflies_per_s": butterflies / dt,
            "ms": dt * 1e3,
        }
    # memory-bound bound: ~2 passes (r+w) per stage pair after fusion
    bytes_min = batch * n * 4 * 2 * (log_n / 2)
    results["ntt_speed_of_light_note"] = (
        f"~{bytes_min / HBM_GBPS / 1e6:.2f} ms if HBM-bound at {HBM_GBPS} GB/s "
        "with perfect per-stage fusion; VPU u32-multiply throughput is the "
        "actual limiter"
    )

    # Poseidon2
    pbatch = 1 << 14
    state = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (pbatch, 16), np.uint32)))
    dt = timeit(p2.permute, state)
    results["poseidon2"] = {"perms_per_s": pbatch / dt, "ms": dt * 1e3}

    # keccak-f
    kbatch = 1 << 13
    kstate = jnp.asarray(rng.integers(0, 2**32, (kbatch, 25, 2), dtype=np.uint32).astype(np.uint32))
    dt = timeit(jax.jit(keccak_f1600_batch), kstate)
    results["keccak_f1600"] = {"perms_per_s": kbatch / dt, "ms": dt * 1e3}

    # hash_rows + merkle commit (the trace-commitment inner loop)
    rows = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (1 << 13, 48), np.uint32)))
    dt = timeit(jax.jit(p2.hash_rows), rows)
    results["hash_rows_48w"] = {"rows_per_s": (1 << 13) / dt, "ms": dt * 1e3}

    if args.msm:
        from raiko_tpu.kzg import eip4844 as e
        from raiko_tpu.ops import msm as msmmod

        pts = e._device_setup()
        scalars = [
            int.from_bytes(rng.bytes(32), "big") % e.BLS_MODULUS for _ in range(4096)
        ]
        limbs = jnp.asarray(msmmod.scalars_to_limbs(scalars))
        dt = timeit(msmmod.msm, pts, limbs, reps=3)
        m_entries = 4096 * 32
        # 3-phase scan (2M + M/4*log + M) + two bucket suffix scans + fold
        ec_adds = m_entries * 3 + (m_entries // 4) * 15 + 2 * 8 * 8192 + 280
        results["blob_msm_4096"] = {
            "ms": dt * 1e3,
            "commitments_per_s": 1 / dt,
            "g1_point_ops_per_s": ec_adds / dt,
        }

    print(json.dumps({"backend": backend, "kernels": results}, indent=2))


if __name__ == "__main__":
    main()
