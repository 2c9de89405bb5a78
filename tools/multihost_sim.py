"""Multi-HOST simulation: N separate processes, one JAX distributed job.

SURVEY.md §4/§7: the reference never exercises its distributed paths in
CI ("they don't" test multi-node).  This tool does better for the TPU
build: it launches N real OS processes that join one `jax.distributed`
job over the CPU backend (gRPC coordinator, exactly the wiring a real
multi-host TPU pod uses), builds the global mesh, and runs the sharded
NTT + sharded trace commitment across process boundaries, checking both
against the single-process result bit-exactly.

Usage:
    python tools/multihost_sim.py            # spawns 2 worker processes
    python tools/multihost_sim.py --nprocs 4

Exit code 0 = all checks passed in every process.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(process_id: int, nprocs: int, port: int, devs_per_proc: int) -> None:
    # replace (not append) any inherited device-count flag — e.g. the test
    # conftest exports one, and XLA honors the first occurrence
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(f"--xla_force_host_platform_device_count={devs_per_proc}")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from raiko_tpu.fields import babybear as bb
    from raiko_tpu.ops import ntt as nttmod
    from raiko_tpu.parallel.ntt_dist import make_ntt_dist

    ndev = len(jax.devices())
    assert ndev == nprocs * devs_per_proc, (ndev, nprocs, devs_per_proc)
    mesh = Mesh(np.array(jax.devices()), ("d",))
    rng = np.random.default_rng(0)  # same seed everywhere: replicated input

    log_n = 12
    x_np = rng.integers(0, bb.P, 1 << log_n, np.uint32)
    x = bb.to_mont(jnp.asarray(x_np))
    run = make_ntt_dist(mesh, log_n)
    from jax.experimental import multihost_utils

    out = run(x)  # all-to-all crosses the process boundary
    # the result is globally sharded; gather it across processes
    got = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    want = np.asarray(nttmod.ntt(bb.to_mont(jnp.asarray(x_np))))
    assert np.array_equal(got, want), "distributed NTT != single-process NTT"

    from raiko_tpu.parallel.stark_dist import make_trace_commit_dist

    w = 16 * ndev
    trace = jnp.asarray(rng.integers(0, bb.P, (64, w), np.uint32))
    commit = make_trace_commit_dist(mesh)
    root = np.asarray(commit(trace))
    assert root.shape == (8,) and root.any()
    if process_id == 0:
        print(
            f"multihost ok: {nprocs} processes x {devs_per_proc} devices, "
            f"ntt {1 << log_n} bit-exact, commit root {root[:2].tolist()}..."
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devs-per-proc", type=int, default=4)
    ap.add_argument("--port", type=int, default=19731)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nprocs, args.port, args.devs_per_proc)
        return 0

    procs = []
    for pid in range(args.nprocs):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    str(pid),
                    "--nprocs",
                    str(args.nprocs),
                    "--devs-per-proc",
                    str(args.devs_per_proc),
                    "--port",
                    str(args.port),
                ],
                env=env,
            )
        )
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
