"""Distributed NTT: four-step decomposition with an all-to-all transpose.

The big-N NTT (LDE of long traces, SURVEY.md §2.3(c)) splits as N = R x C
(n = n1*C + n2): local size-R column NTTs on each chip, a twiddle
multiply, ONE all-to-all transpose across the mesh, then local size-C row
NTTs.  Butterfly stages stay chip-local on both sides of the transpose —
the all-to-all is the only inter-chip traffic, riding ICI.

Order bookkeeping (verified bit-exact against ops.ntt in tests): with
bitrev-output local NTTs, the step-4 output matrix indexed
[brp_R(k1), brp_C(k2)] holds X[k1 + R*k2]; its row-major flattening is
precisely the global bit-reversed order of N = R*C.  So
``ntt_dist(x) == ops.ntt.ntt(x)`` element-for-element, with the result
contiguously sharded across the mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import babybear as bb
from ..ops import ntt as nttmod


@functools.lru_cache(maxsize=16)
def _twiddle_matrix(log_r: int, log_c: int) -> np.ndarray:
    """w_N^{k1*n2} with rows in bitrev-k1 order: (R, C) Montgomery."""
    r, c = 1 << log_r, 1 << log_c
    w = bb.two_adic_generator(log_r + log_c)
    rev = nttmod.bit_reverse_indices(r)
    out = np.empty((r, c), dtype=np.uint32)
    for row in range(r):
        base = pow(w, int(rev[row]), bb.P)
        cur = 1
        for n2 in range(c):
            out[row, n2] = cur
            cur = cur * base % bb.P
    return bb.np_to_mont(out)


def make_ntt_dist(mesh: Mesh, log_n: int, axis: str = "d"):
    """Build a jitted distributed forward NTT for size 2^log_n."""
    ndev = mesh.shape[axis]
    log_r = log_n // 2
    log_c = log_n - log_r
    r, c = 1 << log_r, 1 << log_c
    assert r % ndev == 0 and c % ndev == 0, "mesh must divide both factors"
    tw = jnp.asarray(_twiddle_matrix(log_r, log_c))

    def local(xs, tws):
        # xs: (R, C/D) — this chip's column slice of the (R, C) matrix
        a = nttmod.ntt(xs.T).T  # size-R column NTTs -> bitrev rows
        a = bb.mont_mul(a, tws)  # twiddle w_N^{k1*n2}
        # all-to-all transpose: rows chunked out, columns gathered in
        recv = jax.lax.all_to_all(a, axis, 0, 1, tiled=True)  # (R/D, C)
        return nttmod.ntt(recv)  # size-C row NTTs -> bitrev columns

    shmapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis)),
        out_specs=P(axis, None),
        check_rep=False,
    )

    @jax.jit
    def run(x: jax.Array) -> jax.Array:
        mat = x.reshape(r, c)
        mat = jax.lax.with_sharding_constraint(
            mat, NamedSharding(mesh, P(None, axis))
        )
        out = shmapped(mat, tw)
        return out.reshape(-1)

    return run
