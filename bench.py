"""Benchmark entry point (driver-run on real TPU hardware).

Measures the north-star kernel metrics (BASELINE.md): BabyBear NTT
butterflies/s (headline), plus Poseidon2 hash and keccak-f throughput as
secondary fields.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no absolute numbers (BASELINE.json "published": {}),
so vs_baseline is reported against our own established baseline
(BASELINE.md: 55 G butterflies/s measured on TPU v5e with this harness).

Timing methodology (differential chaining)
------------------------------------------
Each kernel runs R times inside ONE jitted fori_loop (a real data-dependent
chain) and only a tiny slice of the result transfers to host.  The sandbox's
TPU relay adds a large fixed per-call cost (dispatch + transfer, ~10-100 ms)
that single-run timing wrongly attributes to the kernel, so throughput is
computed from the DIFFERENCE between a long chain and a short chain:
(t(R2) - t(R1)) / (R2 - R1) cancels every per-call constant and leaves pure
device time per iteration.
"""

import json
import os
import sys
import time

import numpy as np

NTT_BASELINE = 55.4e9  # butterflies/s, TPU v5e single chip (BASELINE.md)


def main() -> None:
    from raiko_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    # ---- taiko_a7 sim-block proof wall-clock (SURVEY §6 obligation) ----
    # Runs FIRST, in subprocesses, before this process initializes the
    # TPU backend: the sandbox relay admits ONE process at a time, so the
    # tpu_stark child must hold it alone.  The persistent XLA cache makes
    # the child's compiles one-time; null on timeout.
    import subprocess

    def block_bench(
        backend: str, timeout_s: int, cpu: bool = False, extra_env=None
    ):
        env = dict(os.environ)
        if cpu:
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = ""
        env.update(extra_env or {})
        try:
            r = subprocess.run(
                [sys.executable, os.path.join("tools", "bench_block.py"), backend],
                capture_output=True,
                text=True,
                timeout=timeout_s,
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            return json.loads(line) if r.returncode == 0 and line else None
        except Exception:
            return None

    def json_tool(args, timeout_s, extra_env=None):
        env = dict(os.environ)
        env.update(extra_env or {})
        try:
            r = subprocess.run(
                [sys.executable] + args,
                capture_output=True,
                text=True,
                timeout=timeout_s,
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
            return json.loads(line) if r.returncode == 0 and line else None
        except Exception:
            return None

    # the 100-tx / 20-contract block (VERDICT r5: real-scale, cold+warm)
    blk_native = block_bench("native", 900, cpu=True)
    blk_stark = block_bench("tpu_stark", 3600)
    # scaling: shard-parallel proving wall-clock vs worker count on a
    # 12-tx block (the BASELINE.json scaling-efficiency obligation,
    # measured on the one real chip + host threads)
    shard_scaling = {}
    for w in (1, 2, 4):
        r = block_bench(
            "tpu_shard",
            900,
            extra_env={
                "BENCH_BLOCK_TXS": "12",
                "BENCH_SHARD_WORKERS": str(w),
                "RAIKO_FRAME_WORKERS": str(w),
            },
        )
        shard_scaling[str(w)] = r and {
            "prove_cold_s": r.get("prove_cold_s"),
            "prove_warm_s": r.get("prove_warm_s"),
        }
    # scaling: virtual-mesh sharded commit + distributed NTT overhead
    mesh_scaling = json_tool(
        [os.path.join("tools", "bench_scaling.py")],
        1500,
        extra_env={"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
    )
    # scaling: multi-host (2 vs 4 jax.distributed processes, CPU)
    import time as _time

    multihost = {}
    for nproc in (2, 4):
        t0 = _time.time()
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.join("tools", "multihost_sim.py"),
                    "--nprocs",
                    str(nproc),
                ],
                capture_output=True,
                text=True,
                timeout=900,
                env={
                    **os.environ,
                    "JAX_PLATFORMS": "cpu",
                    "PALLAS_AXON_POOL_IPS": "",
                },
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            multihost[str(nproc)] = {
                "ok": r.returncode == 0,
                "wall_s": round(_time.time() - t0, 1),
            }
        except Exception:
            multihost[str(nproc)] = None
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

    def diff_time(fn, x0, r1=5, r2=205, trials=5):
        """Device seconds per fn application, fixed per-call costs
        cancelled.  The relay's per-call cost VARIES run to run (measured
        std ~±12% at r2-r1=50), so the chain delta is long (200) to
        shrink that noise and the measurement repeats `trials` times;
        returns (median, spread dict)."""

        def total(r):
            @jax.jit
            def run(v):
                out = jax.lax.fori_loop(0, r, lambda i, s: fn(s), v)
                return out.reshape(-1)[:8]  # tiny transfer

            np.asarray(run(x0))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(run(x0))
                best = min(best, time.perf_counter() - t0)
            return best

        samples = sorted(
            (total(r2) - total(r1)) / (r2 - r1) for _ in range(trials)
        )
        med = samples[len(samples) // 2]
        return med, {"min": samples[0], "max": samples[-1], "n": trials}

    # ---- headline: NTT butterflies/s ---------------------------------
    batch, log_n = 64, 14
    n = 1 << log_n
    x = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (batch, n), np.uint32)))
    dt, ntt_spread = diff_time(nttmod.ntt_fourstep, x)
    butterflies = batch * (n // 2) * log_n
    ntt_rate = butterflies / dt

    # ---- secondary: Poseidon2 permutations/s --------------------------
    pbatch = 1 << 14
    state = bb.to_mont(jnp.asarray(rng.integers(0, bb.P, (pbatch, 16), np.uint32)))
    p2_rate = pbatch / diff_time(p2.permute, state, trials=3)[0]

    # ---- secondary: keccak-f permutations/s ---------------------------
    from raiko_tpu.ops.keccak import keccak_f1600_batch

    kbatch = 1 << 13
    kstate = jnp.asarray(
        rng.integers(0, 2**32, (kbatch, 25, 2), dtype=np.uint32).astype(np.uint32)
    )
    keccak_rate = kbatch / diff_time(keccak_f1600_batch, kstate, trials=3)[0]

    # ---- secondary: blob KZG commitment (4096-pt BLS12-381 MSM) -------
    # Pallas EC adds + 3-phase segmented scan (BASELINE.md); the output is
    # one point, so plain wall-clock timing is honest here.
    from raiko_tpu.kzg import curve, host_curve as hc
    from raiko_tpu.ops import msm as msmmod

    base = curve.points_from_affine(
        [hc.g1_mul(hc.G1_GEN, k + 1) for k in range(64)]
    )
    pts = jnp.asarray(np.tile(base, (4096 // 64, 1, 1)))
    limbs = jnp.asarray(
        msmmod.scalars_to_limbs(
            [int.from_bytes(rng.bytes(32), "little") for _ in range(4096)]
        )
    )
    np.asarray(msmmod.msm(pts, limbs))  # compile + warm
    msm_s = min(
        (lambda t0: (np.asarray(msmmod.msm(pts, limbs)), time.perf_counter() - t0)[
            1
        ])(time.perf_counter())
        for _ in range(3)
    )

    # ---- secondary: batched multi-blob commitment (amortized s/blob) --
    nblobs = 4
    limbs4 = jnp.asarray(
        np.stack(
            [
                msmmod.scalars_to_limbs(
                    [int.from_bytes(rng.bytes(32), "little") for _ in range(4096)]
                )
                for _ in range(nblobs)
            ]
        )
    )
    np.asarray(msmmod.msm_multi(pts, limbs4))  # compile + warm
    msm_multi_s = min(
        (
            lambda t0: (
                np.asarray(msmmod.msm_multi(pts, limbs4)),
                time.perf_counter() - t0,
            )[1]
        )(time.perf_counter())
        for _ in range(3)
    )

    # ---- secondary: batched ecrecover (tx sender recovery) ------------
    from raiko_tpu.ops import secp
    from raiko_tpu.utils import secp256k1 as hostsecp

    nrec = 256
    items = []
    for i in range(nrec):
        h = rng.bytes(32)
        r, s, rec = hostsecp.sign(h, int(rng.integers(1, 1 << 62)))
        items.append((h, r, s, rec))
    secp.recover_pubkeys_batch(items)  # compile + warm
    rec_s = min(
        (
            lambda t0: (secp.recover_pubkeys_batch(items), time.perf_counter() - t0)[1]
        )(time.perf_counter())
        for _ in range(3)
    )

    print(
        json.dumps(
            {
                "metric": "babybear_ntt_butterflies_per_s",
                "value": round(ntt_rate),
                "unit": "butterflies/s",
                "vs_baseline": round(ntt_rate / NTT_BASELINE, 3),
                "backend": backend,
                "config": {"batch": batch, "log_n": log_n},
                # relay noise bars: min/max butterflies/s over the trials
                "spread": {
                    "butterflies_per_s_min": round(
                        butterflies / ntt_spread["max"]
                    ),
                    "butterflies_per_s_max": round(
                        butterflies / ntt_spread["min"]
                    ),
                    "trials": ntt_spread["n"],
                },
                "secondary": {
                    "poseidon2_perms_per_s": round(p2_rate),
                    "keccak_f1600_per_s": round(keccak_rate),
                    "kzg_blob_commitment_s": round(msm_s, 4),
                    "kzg_blob_commitment_amortized_s": round(msm_multi_s / nblobs, 4),
                    "ecrecover_batch_txs_per_s": round(nrec / rec_s),
                    "taiko_a7_block_proof_native_s": (
                        blk_native and blk_native["total_s"]
                    ),
                    "taiko_a7_block_proof_tpu_stark_cold_s": (
                        blk_stark and blk_stark.get("prove_cold_s")
                    ),
                    "taiko_a7_block_proof_tpu_stark_warm_s": (
                        blk_stark and blk_stark.get("prove_warm_s")
                    ),
                    "taiko_a7_block_proof_detail": {
                        "native": blk_native,
                        "tpu_stark": blk_stark,
                    },
                },
                "scaling": {
                    "shard_workers_12tx": shard_scaling,
                    "virtual_mesh": mesh_scaling,
                    "multihost": multihost,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
