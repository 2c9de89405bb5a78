"""Test configuration: force an 8-device virtual CPU mesh.

The test-suite exercises multi-chip sharding (mesh collectives, distributed
NTT/MSM) without TPU hardware by running JAX's CPU backend with 8 virtual
devices, mirroring how the reference's CI would have needed multi-process
runs (it never had them, SURVEY.md §4).  Real-TPU benchmarking happens in
``bench.py``, not here.

This must run before any module imports trigger JAX backend initialisation.
The sandbox's sitecustomize force-registers a TPU tunnel backend ("axon"),
so we override the platform selection in-process.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

# Large FINITE stack rlimit before any XLA thread spawns: glibc sizes new
# pthread stacks from a finite RLIMIT_STACK, and LLVM codegen of the big
# EC/MSM graphs has segfaulted XLA:CPU compile threads on this sandbox's
# 8 MB default ("unlimited" does NOT enlarge thread stacks).
try:
    import resource

    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 512 << 20
    if _hard == resource.RLIM_INFINITY or _hard >= _want:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except Exception:  # pragma: no cover
    pass

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the big-integer EC kernels compile slowly
# on XLA:CPU; cache them across test runs.  Directory keying + foreign-
# cache detection live in raiko_tpu.utils.jaxcache.
# Persistent cache ONLY in subprocess-isolated children (fresh, short-
# lived processes): serializing OR deserializing the big EC executables
# inside the long-lived suite process segfaults XLA:CPU (observed at
# cache get/put for the MSM and curve graphs, jaxlib 0.9.0), while the
# identical put/get works every time in a fresh process.  The suite
# process therefore compiles in-memory only; the expensive graphs are
# wrapped in subprocess_isolated (below) so they still hit the cache.
if os.environ.get("RAIKO_ISOLATED_TEST"):
    from raiko_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, f"expected 8 virtual devices, got {devs.size}"
    return Mesh(devs.reshape(8), ("d",))


_ISOLATE_ENV = "RAIKO_ISOLATED_TEST"


def subprocess_isolated(fn):
    """Run the decorated test in a FRESH pytest subprocess.

    The giant BLS12-381 MSM graphs reproducibly segfault XLA:CPU when
    compiled (or even deserialized from the compilation cache) inside a
    process already holding the suite's working set, while the identical
    test passes every time in a fresh process.  Isolation both avoids
    the crash and keeps a crash, if one still happens, from killing the
    whole suite."""
    import functools
    import inspect
    import subprocess
    import sys

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get(_ISOLATE_ENV) == fn.__name__:
            return fn(*args, **kwargs)
        node = f"{inspect.getfile(fn)}::{fn.__name__}"
        env = dict(os.environ)
        env[_ISOLATE_ENV] = fn.__name__
        r = subprocess.run(
            [sys.executable, "-m", "pytest", node, "-q", "-p", "no:cacheprovider"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3000,
        )
        assert r.returncode == 0, (
            f"isolated test {fn.__name__} failed (rc {r.returncode}):\n"
            + r.stdout[-3000:]
            + r.stderr[-1500:]
        )

    return wrapper
