"""STARK prover — TPU compute path.

Pipeline (SURVEY.md §7 step 6; the TPU-native analog of the vendored
risc0/sp1 prover cores):

  trace (n x W)
    -> column iNTT (interpolation) + coset LDE (ops/ntt.py)     [TPU]
    -> row hashing + Merkle commit (ops/poseidon2.py, merkle)   [TPU]
    -> vectorized constraint evaluation over the LDE domain     [TPU]
    -> DEEP-ALI quotient, chunked + committed                   [TPU]
    -> out-of-domain openings at zeta, zeta*g                   [TPU]
    -> DEEP composition polynomial                              [TPU]
    -> FRI commit/fold (stark/fri.py)                           [TPU]
    -> query openings (Merkle paths)                            [host]

All committed data stays in bit-reversed coset order end to end, so no
bit-reversal gather ever materializes (see ops/ntt.py docstring).

Degree budget: per-Air via ``quotient_chunks`` = max constraint degree
minus 1.  The simple AIRs run degree <= 3 (2 chunks, quotient degree
< 2n); the keccak/EVM AIRs run degree <= 5 (4 chunks, quotient degree
< 4n = m).  In every case each committed chunk has deg < n, every other
committed polynomial deg < n, and the DEEP composition deg < n - 1 <
m/4 = FRI bound — blowup 4 supports up to degree 5.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb
from ..fields import babybear_ext as ef
from ..ops import merkle, ntt, poseidon2 as p2
from . import fri
from .air import Air, ConstraintBuilder, Probe
from ..utils.measurement import Measurement
from .channel import Channel
from .domain import Domain

BLOWUP_LOG = 2
# 45 queries * 2 bits/query (rate 1/4, capacity conjecture) + 10 grind
# bits = ~100-bit conjectured query soundness (docs/SOUNDNESS.md) —
# matching the security class of the provers this engine replaces.
NUM_QUERIES = 45
GRIND_BITS = 10  # FRI proof-of-work (channel.grind)


@dataclass
class StarkProof:
    log_n: int
    width: int
    pow_nonce: int
    publics: list
    trace_root: list
    quotient_root: list
    trace_at_zeta: list  # W EF tuples
    trace_at_zeta_g: list  # W EF tuples
    quotient_at_zeta: list  # 8 EF tuples (2 chunks x 4 coords)
    fri_proof: fri.FriProof
    queries: list  # per query: trace_row, trace_path, quot_row, quot_path
    # auxiliary segment (permutation/lookup arguments); empty when unused.
    # queries additionally carry aux_row/aux_path.
    aux_root: list = field(default_factory=list)
    aux_at_zeta: list = field(default_factory=list)
    aux_at_zeta_g: list = field(default_factory=list)
    # challenge-dependent public EF scalars (global LogUp bus contributions)
    bus: list = field(default_factory=list)
    # committed fixed segment (Air.commit_fixed): deterministic
    # preprocessed-column commitment whose root the verifier recomputes
    # from the statement; openings replace the dense OOD evaluation so a
    # recursive verifier pays O(F) wires instead of O(nnz) gates.
    # queries additionally carry fixed_row/fixed_path.
    fixed_root: list = field(default_factory=list)
    fixed_at_zeta: list = field(default_factory=list)


class _ProverAlgebra:
    """Vectorized base-field constraint evaluation over the LDE domain."""

    def __init__(
        self,
        lde: jax.Array,
        next_perm: np.ndarray,
        publics: jax.Array,
        fixed_lde: jax.Array | None = None,
        aux_lde: jax.Array | None = None,
        chal: jax.Array | None = None,
        bus: jax.Array | None = None,
    ):
        self._lde = lde  # (W, m) Montgomery
        self._next = jnp.asarray(next_perm)
        self._publics = publics  # (k,) Montgomery device array (traced!)
        self._fixed = fixed_lde
        self._aux = aux_lde  # (aux_W, m) Montgomery
        self._chal = chal  # (4 * num_challenges,) Montgomery (traced!)
        self._bus = bus  # (4 * num_bus_values,) Montgomery (traced!)

    def local(self, c: int):
        return self._lde[c]

    def next(self, c: int):
        return self._lde[c][self._next]

    def fixed(self, c: int):
        return self._fixed[c]

    def aux(self, c: int):
        return self._aux[c]

    def aux_next(self, c: int):
        return self._aux[c][self._next]

    def challenge_coord(self, k: int):
        return self._chal[k]

    def bus_coord(self, k: int):
        return self._bus[k]

    def public(self, i: int):
        return self._publics[i]

    def constant(self, v: int):
        return jnp.uint32((v % bb.P) * bb.R % bb.P)

    # block access (vectorized AIRs): (k, m) arrays
    def local_block(self, cols):
        return self._lde[jnp.asarray(cols)]

    def next_block(self, cols):
        return self._lde[jnp.asarray(cols)][:, self._next]

    def fixed_block(self, cols):
        return self._fixed[jnp.asarray(cols)]

    def aux_block(self, cols):
        return self._aux[jnp.asarray(cols)]

    def aux_next_block(self, cols):
        return self._aux[jnp.asarray(cols)][:, self._next]

    def public_block(self, idxs):
        return self._publics[jnp.asarray(idxs)][:, None]  # (k, 1) broadcast

    def scale(self, k: int, a):
        """Small-integer scaling via Montgomery constant multiply."""
        return bb.mont_mul(a, self.constant(k))

    def bit_block_code(self, bits_block, chi4: list, key, nbytes: int) -> list:
        """Fast path for ConstraintBuilder.bit_block_code: one stacked
        weight tensor + a log-depth modular reduction instead of ~10k
        scalar graph nodes (which XLA:CPU compiles for tens of minutes).

        bits_block: (8*nbytes, m); chi4: 4 scalar traced values; key: (m,)
        or scalar.  Returns 4 (m,)-coordinate arrays."""
        chi = jnp.stack([jnp.asarray(c).reshape(()) for c in chi4])  # (4,)
        # chi^1..chi^nbytes via doubling on growing (j, 4) arrays
        pows = chi[None, :]  # pows[i] = chi^(i+1)
        while pows.shape[0] < nbytes:
            top = pows[-1]  # chi^L
            ext = ef.ef_mul(pows, top[None, :])  # chi^(L+1) .. chi^(2L)
            pows = jnp.concatenate([pows, ext], axis=0)
        pows = pows[:nbytes]  # (nbytes, 4) Montgomery
        scales = jnp.asarray(
            np.array([(1 << b) * bb.R % bb.P for b in range(8)], dtype=np.uint32)
        )
        w = bb.mont_mul(pows[:, None, :], scales[None, :, None])  # (nb, 8, 4)
        w = w.reshape(8 * nbytes, 4)
        t = bb.mont_mul(bits_block[:, :, None], w[:, None, :])  # (k, m, 4)
        s = _tree_sum_axis0(t)  # (m, 4)
        out = [s[:, c] for c in range(4)]
        out[0] = bb.add(out[0], key)
        return out

    def add(self, a, b):
        return bb.add(a, b)

    def sub(self, a, b):
        return bb.sub(a, b)

    def mul(self, a, b):
        return bb.mont_mul(a, b)

    # block fast paths (ConstraintBuilder.stack_block/linmap/...) --------
    def stack(self, exprs):
        return jnp.stack(exprs)

    def linmap(self, mat, blk):
        """Integer linear map of block rows: one broadcast Montgomery
        multiply against the (k_out, k_in) constant matrix + a log-depth
        modular reduction — a handful of HLO ops regardless of k (no u64
        needed; jax runs without x64)."""
        w = np.asarray(mat, dtype=np.uint64) % bb.P
        w_mont = jnp.asarray(((w * bb.R) % bb.P).astype(np.uint32))
        prods = bb.mont_mul(w_mont[:, :, None], blk[None, :, :])
        t = prods
        while t.shape[1] > 1:
            if t.shape[1] % 2:
                t = jnp.concatenate(
                    [t, jnp.zeros((t.shape[0], 1, t.shape[2]), t.dtype)], axis=1
                )
            t = bb.add(t[:, 0::2], t[:, 1::2])
        return t[:, 0]

    def const_vec(self, vals):
        arr = np.array([(int(v) % bb.P) * bb.R % bb.P for v in vals], np.uint32)
        return jnp.asarray(arr)[:, None]

    def block_rowsum(self, blk):
        t = blk
        while t.shape[0] > 1:
            if t.shape[0] % 2:
                t = jnp.concatenate([t, jnp.zeros((1,) + t.shape[1:], t.dtype)])
            t = bb.add(t[0::2], t[1::2])
        return t[0]

    def concat_rows(self, parts):
        return jnp.concatenate(
            [p if p.ndim == 2 else p[None, :] for p in parts], axis=0
        )


def _tree_sum_axis0(x: jax.Array) -> jax.Array:
    """Modular sum over axis 0 via a log-depth add tree (pads to pow2)."""
    k = x.shape[0]
    p2k = 1 << max(0, (k - 1).bit_length())
    if p2k != k:
        x = jnp.concatenate(
            [x, jnp.zeros((p2k - k,) + x.shape[1:], x.dtype)], axis=0
        )
    while x.shape[0] > 1:
        x = bb.add(x[0::2], x[1::2])
    return x[0]


def _ef_powers_device(z: tuple, count: int) -> jax.Array:
    """(count, 4) Montgomery array of z^0..z^{count-1} via doubling."""
    pows = ef.to_device([ef.H_ONE, z])
    while pows.shape[0] < count:
        top = ef.h_pow(z, pows.shape[0])
        scaled = ef.ef_mul(pows, ef.to_device([top]))
        pows = jnp.concatenate([pows, scaled], axis=0)
    return pows[:count]


def _ef_dot(coeffs: jax.Array, zpows: jax.Array) -> jax.Array:
    """sum_i coeffs[..., i] * z^i.  coeffs: (K, n) base; zpows: (n, 4).
    Returns (K, 4) EF, via a log-depth modular reduction."""
    t = bb.mont_mul(coeffs[:, :, None], zpows[None, :, :])  # (K, n, 4)
    while t.shape[1] > 1:
        t = bb.add(t[:, 0::2], t[:, 1::2])
    return t[:, 0]


def _bb_inv_device(x: jax.Array) -> jax.Array:
    """Fermat inverse in the base field (vectorized square-and-multiply)."""
    e = bb.P - 2
    result = jnp.broadcast_to(jnp.uint32(bb.R), x.shape)
    base = x
    while e:
        if e & 1:
            result = bb.mont_mul(result, base)
        base = bb.mont_mul(base, base)
        e >>= 1
    return result


def _ef_inv_linear(xs: jax.Array, z: tuple) -> jax.Array:
    """1/(x - z) for base-field array xs and EF scalar z, via the norm
    trick: N(x) = prod_sigma (x - sigma(z)) is a base-field quartic, so one
    vectorized base inversion + a cubic EF polynomial evaluation suffice."""
    conjs = []
    c = z
    for _ in range(3):
        c = ef.h_pow(c, bb.P)
        conjs.append(c)
    # conj polynomial prod (X - conj_i): EF coefficients, degree 3 monic
    coeffs = [ef.H_ONE]  # leading
    for r in conjs:
        new = [ef.H_ZERO] * (len(coeffs) + 1)
        for i, cf in enumerate(coeffs):
            new[i] = ef.h_sub(new[i], ef.h_mul(cf, r))
            new[i + 1] = ef.h_add(new[i + 1], cf)
        coeffs = new
    # norm polynomial = conj_poly * (X - z): base-field degree-4
    norm = [ef.H_ZERO] * 5
    for i, cf in enumerate(coeffs):
        norm[i] = ef.h_sub(norm[i], ef.h_mul(cf, z))
        norm[i + 1] = ef.h_add(norm[i + 1], cf)
    assert all(c[1] == c[2] == c[3] == 0 for c in norm)
    norm_base = [c[0] for c in norm]
    # device evaluation
    nb = [jnp.uint32(v * bb.R % bb.P) for v in norm_base]
    acc = jnp.broadcast_to(nb[4], xs.shape)
    for k in range(3, -1, -1):
        acc = bb.add(bb.mont_mul(acc, xs), nb[k])
    n_inv = _bb_inv_device(acc)  # (m,)
    cdev = ef.to_device(coeffs)  # (4, 4) EF coeffs of conj poly
    ef_acc = jnp.broadcast_to(cdev[3], xs.shape + (4,))
    for k in range(2, -1, -1):
        ef_acc = ef.ef_add(bb.mont_mul(ef_acc, xs[:, None]), cdev[k][None, :])
    return bb.mont_mul(ef_acc, n_inv[:, None])


_FIXED_ROOT_CACHE: dict = {}


def fixed_commit_root(fixed: np.ndarray, shift: int) -> list[int]:
    """Deterministic commitment root of a fixed-column matrix (the value
    a committed-fixed proof's fixed_root must equal).  The verifier and
    the recursion builder recompute it from the statement; cached by
    content hash since statements repeat."""
    import hashlib

    key = (
        hashlib.sha256(np.ascontiguousarray(fixed).tobytes()).digest(),
        fixed.shape,
        shift,
    )
    r = _FIXED_ROOT_CACHE.get(key)
    if r is None:
        fixed_m = bb.to_mont(jnp.asarray(np.ascontiguousarray(fixed)))
        _, _, levels = _commit_cols(fixed_m, shift)
        r = np.asarray(bb.from_mont(merkle.root(levels))).tolist()
        _FIXED_ROOT_CACHE[key] = r
    return r


@functools.partial(jax.jit, static_argnames=("shift",))
def _commit_cols_local(cols_m: jax.Array, shift: int):
    coeffs = ntt.interpolate(cols_m)
    lde = ntt.lde_from_coeffs(coeffs, BLOWUP_LOG, shift)
    levels = merkle.commit(p2.hash_rows(lde.T))
    return coeffs, lde, levels


# mesh-sharded commitment (parallel/stark_dist.make_commit_cols_dist);
# None = single chip.  set_mesh routes the trace/aux/fixed commitments of
# EVERY prove/prove_tables call through the mesh — the production prover
# running the multi-chip plan, not a side demo.
_DIST_COMMIT = None
_MESH = None


def set_mesh(mesh=None, axis: str = "d") -> None:
    """Route the prover's column commitments over a device mesh
    (bit-exact with the single-chip path; pass None to reset)."""
    global _DIST_COMMIT, _MESH
    if mesh is None:
        _DIST_COMMIT = None
        _MESH = None
        return
    from ..parallel.stark_dist import make_commit_cols_dist

    _DIST_COMMIT = make_commit_cols_dist(mesh, axis)
    _MESH = (mesh, axis)


def _table_device(air: Air, trace) -> object | None:
    """Per-table execution-device policy (TPU-first design decision):
    tiny tables run on the HOST CPU backend — through the remote TPU
    relay every launch costs ~10-100 ms of fixed dispatch, which dwarfs
    the microseconds of device time a 32-row bridge table needs, while
    the big tables (keccak sponge chunks, containment traces, frame
    CPUs) keep the TPU's NTT/hash throughput.  Returns a jax device to
    pin the table's pipeline to, or None for the default placement.
    `RAIKO_TPU_MIN_CELLS` tunes the cutoff (cells = rows x columns of
    the committed segments); 0 disables the routing."""
    if _MESH is not None or jax.default_backend() == "cpu":
        return None
    thresh = int(os.environ.get("RAIKO_TPU_MIN_CELLS", str(1 << 20)))
    if thresh <= 0:
        return None
    n = trace.shape[0]
    fixed_w = 0
    if getattr(air, "commit_fixed", False):
        fx = air.fixed_columns(n)
        fixed_w = fx.shape[0] if fx is not None else 0
    cells = n * (air.width + air.aux_width + fixed_w + 4 * air.quotient_chunks)
    if cells >= thresh:
        return None
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _device_ctx(dev):
    import contextlib

    return jax.default_device(dev) if dev is not None else contextlib.nullcontext()


def _commit_cols(cols_m: jax.Array, shift: int):
    """Columns (K, n) Montgomery -> (coeffs, lde, merkle levels).

    On a mesh, only commitments big enough to amortize the collective
    overhead take the sharded path — sharding a 32-row bridge table
    costs more in shard_map compiles and all-to-alls than it saves
    (bit-exact either way; `RAIKO_DIST_MIN_CELLS` tunes the cutoff)."""
    if _DIST_COMMIT is not None:
        thresh = int(os.environ.get("RAIKO_DIST_MIN_CELLS", str(1 << 18)))
        if cols_m.size >= thresh:
            return _DIST_COMMIT(cols_m, shift)
    return _commit_cols_local(cols_m, shift)


@functools.lru_cache(maxsize=16)
def _sinv_pows(shift: int, m: int) -> np.ndarray:
    sinv = pow(shift, -1, bb.P)
    out = np.empty(m, dtype=np.uint32)
    cur = 1
    for k in range(m):
        out[k] = cur
        cur = cur * sinv % bb.P
    return bb.np_to_mont(out)


def _constraint_counts(air: Air) -> list[int]:
    from .air import Probe

    b = ConstraintBuilder(Probe())
    air.eval(b)
    return [c.count for c in b.constraints]


def _inv_linear_consts(z: tuple):
    """Host part of _ef_inv_linear: (norm-poly base coeffs (5,), conj-poly
    EF coeffs (4, 4)) as device-ready Montgomery arrays."""
    conjs = []
    c = z
    for _ in range(3):
        c = ef.h_pow(c, bb.P)
        conjs.append(c)
    coeffs = [ef.H_ONE]
    for r in conjs:
        new = [ef.H_ZERO] * (len(coeffs) + 1)
        for i, cf in enumerate(coeffs):
            new[i] = ef.h_sub(new[i], ef.h_mul(cf, r))
            new[i + 1] = ef.h_add(new[i + 1], cf)
        coeffs = new
    norm = [ef.H_ZERO] * 5
    for i, cf in enumerate(coeffs):
        norm[i] = ef.h_sub(norm[i], ef.h_mul(cf, z))
        norm[i + 1] = ef.h_add(norm[i + 1], cf)
    assert all(c[1] == c[2] == c[3] == 0 for c in norm)
    nb = np.array([c[0] * bb.R % bb.P for c in norm], dtype=np.uint32)
    return jnp.asarray(nb), ef.to_device(coeffs)


def _inv_linear_dev(xs: jax.Array, nb: jax.Array, cdev: jax.Array) -> jax.Array:
    """Device part of 1/(x - z): norm-trick inversion (see _ef_inv_linear)."""
    acc = jnp.broadcast_to(nb[4], xs.shape)
    for k in range(3, -1, -1):
        acc = bb.add(bb.mont_mul(acc, xs), nb[k])
    n_inv = _bb_inv_device(acc)
    ef_acc = jnp.broadcast_to(cdev[3], xs.shape + (4,))
    for k in range(2, -1, -1):
        ef_acc = ef.ef_add(bb.mont_mul(ef_acc, xs[:, None]), cdev[k][None, :])
    return bb.mont_mul(ef_acc, n_inv[:, None])


# Cached per (AIR class, shape) jitted stages.  Requirement (holds for all
# shipped AIRs): Air.eval must be STRUCTURE-pure — its constraint graph may
# depend on the class and trace shape but not on per-instance data (per-
# instance values flow through fixed columns and publics, which are traced
# stage inputs).
_QUOTIENT_STAGES: dict = {}


def _quotient_stage_for(air: Air, dom: Domain, has_fixed: bool):
    key = (
        type(air),
        air.structure_key(),
        air.width,
        air.aux_width,
        dom.log_n,
        air.quotient_chunks,
        has_fixed,
        bool(os.environ.get("RAIKO_EAGER_QUOTIENT")),
    )
    fn = _QUOTIENT_STAGES.get(key)
    if fn is not None:
        return fn
    nq = air.quotient_chunks
    m = dom.m
    next_perm = dom.next_perm
    sels_np = {
        "transition": dom.trans_sel,
        "first_row": dom.first_inv,
        "last_row": dom.last_inv,
        "all_rows": dom.all_inv,
    }
    shift = dom.shift
    n = dom.n
    def _eval_slice(alg, lo, hi, apows_, q_ef):
        builder = ConstraintBuilder(alg)
        air.eval(builder)
        sels = {k: jnp.asarray(v) for k, v in sels_np.items()}
        for con, pd in zip(builder.constraints[lo:hi], apows_):
            if con.count == 1:
                base_val = bb.mont_mul(con.expr, sels[con.kind])  # (m,)
                q_ef = ef.ef_add(
                    q_ef, bb.mont_mul(pd[0][None, :], base_val[:, None])
                )
            else:
                blk = bb.mont_mul(con.expr, sels[con.kind][None, :])  # (k, m)
                contrib = bb.mont_mul(pd[:, None, :], blk[:, :, None])
                q_ef = ef.ef_add(q_ef, _tree_sum_axis0(contrib))
        return q_ef

    def _finish(q_ef, sinvp_):
        # chunking: intt over the coset -> unshift -> nq chunks -> LDE+commit
        q_coeffs = bb.mont_mul(ntt.intt(q_ef.T), sinvp_)
        chunks = jnp.concatenate(
            [q_coeffs[:, j * n : (j + 1) * n] for j in range(nq)], axis=0
        )  # (4*nq, n)
        q_lde = ntt.lde_from_coeffs(chunks, BLOWUP_LOG, shift)
        q_levels = merkle.commit(p2.hash_rows(q_lde.T))
        return chunks, q_lde, q_levels

    # Very wide AIRs with many distinct medium-sized constraint groups
    # (the zkEVM CPU table: ~2000 columns, ~250 constraint groups) defeat
    # both jit (XLA:CPU compiles the HLO for tens of MINUTES) and eager
    # dispatch (~3 ms/op through jax's machinery).  Such AIRs opt in via
    # `eager_quotient`: the constraint evaluation runs on the HOST with
    # vectorized standard-form numpy (the debug checker's algebra —
    # microsecond dispatch, exact modular arithmetic), and only the
    # NTT / chunk-LDE / Merkle stages stay on device.
    host_eval = bool(getattr(air, "eager_quotient", False))
    # RAIKO_EAGER_QUOTIENT=1 forces host-numpy constraint evaluation for
    # EVERY table — zero XLA quotient compiles.  Used by the multi-chip
    # dryrun (driver machines start with a cold compilation cache and a
    # hard wall-clock budget); block-proof entry points keep the jitted
    # path, whose one-time compiles amortize across chunks and runs.
    if os.environ.get("RAIKO_EAGER_QUOTIENT"):
        host_eval = True

    if not host_eval:

        @jax.jit
        def qfn(t_lde_, aux_lde_, chal_, bus_, fixed_m_, apows_, sinvp_, publics_dev):
            fixed_lde = (
                ntt.lde_from_coeffs(ntt.interpolate(fixed_m_), BLOWUP_LOG, shift)
                if fixed_m_ is not None
                else None
            )
            alg = _ProverAlgebra(
                t_lde_, next_perm, publics_dev, fixed_lde, aux_lde_, chal_, bus_
            )
            q_ef = jnp.zeros((m, 4), dtype=jnp.uint32)
            q_ef = _eval_slice(alg, 0, None, apows_, q_ef)
            return _finish(q_ef, sinvp_)

        _QUOTIENT_STAGES[key] = qfn
        return qfn

    from .debug import _DebugAlgebra

    _P64 = np.uint64(bb.P)
    rinv = pow(bb.R, bb.P - 2, bb.P)
    sels_std = {
        k: (np.asarray(v, dtype=np.uint64) * np.uint64(rinv)) % _P64
        for k, v in sels_np.items()
    }

    @jax.jit
    def _fixed_stage(fixed_m_):
        return ntt.lde_from_coeffs(ntt.interpolate(fixed_m_), BLOWUP_LOG, shift)

    finish_jit = jax.jit(_finish)

    def _std(x):
        return np.asarray(bb.from_mont(x), dtype=np.uint64)

    def qfn(t_lde_, aux_lde_, chal_, bus_, fixed_m_, apows_, sinvp_, publics_dev):
        t_std = _std(t_lde_)
        nxt = t_std[:, next_perm]
        aux_std = _std(aux_lde_) if aux_lde_ is not None else np.zeros((0, m), np.uint64)
        aux_nxt = aux_std[:, next_perm] if aux_std.shape[0] else aux_std
        fixed_std = (
            _std(_fixed_stage(fixed_m_)) if fixed_m_ is not None else np.zeros((0, m), np.uint64)
        )
        chal_std = _std(chal_).tolist() if chal_ is not None else []
        bus_std = _std(bus_).tolist() if bus_ is not None else []
        pub_std = _std(publics_dev).tolist()
        alg = _DebugAlgebra(
            t_std, nxt, fixed_std, aux_std, aux_nxt, pub_std, chal_std, bus_std
        )
        builder = ConstraintBuilder(alg)
        air.eval(builder)
        q = np.zeros((m, 4), dtype=np.uint64)
        for con, pd in zip(builder.constraints, apows_):
            pdd = _std(pd)  # (count, 4)
            if con.count == 1:
                bv = (np.asarray(con.expr, dtype=np.uint64) * sels_std[con.kind]) % _P64
                q = (q + pdd[0][None, :] * bv[:, None]) % _P64
            else:
                blk = (
                    np.asarray(con.expr, dtype=np.uint64)
                    * sels_std[con.kind][None, :]
                ) % _P64
                contrib = (pdd[:, None, :] * blk[:, :, None]) % _P64
                q = (q + contrib.sum(axis=0, dtype=np.uint64)) % _P64
        q_m = bb.to_mont(jnp.asarray(q.astype(np.uint32)))
        return finish_jit(q_m, sinvp_)

    _QUOTIENT_STAGES[key] = qfn
    return qfn


@jax.jit
def _ood_stage(t_coeffs_, chunks_, zp_, zgp_):
    return (
        _ef_dot(t_coeffs_, zp_),
        _ef_dot(t_coeffs_, zgp_),
        _ef_dot(chunks_, zp_),
    )


@jax.jit
def _deep_stage(t_lde_, q_lde_, g1d, g2d, c1d, c2d, xs_, nbz, cdz, nbzg, cdzg):
    m = t_lde_.shape[1]
    p1 = jnp.concatenate([t_lde_, q_lde_], axis=0)
    s1 = _tree_sum_axis0(bb.mont_mul(g1d[:, None, :], p1[:, :, None]))
    s2 = _tree_sum_axis0(bb.mont_mul(g2d[:, None, :], t_lde_[:, :, None]))
    inv_z = _inv_linear_dev(xs_, nbz, cdz)
    inv_zg = _inv_linear_dev(xs_, nbzg, cdzg)
    h1 = ef.ef_mul(ef.ef_sub(s1, jnp.broadcast_to(c1d, (m, 4))), inv_z)
    h2 = ef.ef_mul(ef.ef_sub(s2, jnp.broadcast_to(c2d, (m, 4))), inv_zg)
    return ef.ef_add(h1, h2)


def prove(air: Air, trace: np.ndarray, publics: list[int] | None = None) -> StarkProof:
    """Prove one AIR execution.  trace: (n, W) uint32 standard-form."""
    return prove_tables([(air, trace, publics or [])])[0]


def prove_tables(
    tables: list[tuple[Air, np.ndarray, list[int]]],
) -> list[StarkProof]:
    """Prove several AIR tables in ONE Fiat-Shamir transcript with SHARED
    aux challenges and a global LogUp bus.

    The transcript absorbs every table's preamble + publics, then every
    main-trace root, and only THEN squeezes the shared challenges — so no
    table's committed data can be chosen adaptively against the bus
    challenge (the standard multi-table / "interactions" construction of
    the vendored sp1/plonky3-style provers, SURVEY.md §2.2).  Each
    table's net bus contribution (Air.bus_values) is absorbed and bound
    by that table's own constraints; verify_tables checks the global sum
    vanishes.

    The pipeline runs as a handful of jitted stages with host Fiat-Shamir
    absorbs between them (one relay round-trip per transcript point, not
    one per op — eager dispatch through the TPU tunnel costs ~5 ms/op)."""
    channel = Channel()
    channel.absorb_elems([len(tables)])
    ctxs = []
    for air, trace, publics in tables:
        publics = publics or []
        n, width = trace.shape
        log_n = n.bit_length() - 1
        assert 1 << log_n == n and width == air.width
        fixed = air.fixed_columns(n)
        committed_fixed = bool(getattr(air, "commit_fixed", False)) and fixed is not None
        channel.absorb_elems(
            [
                log_n,
                width,
                air.aux_width,
                air.num_bus_values,
                len(publics),
                int(committed_fixed),
            ]
        )
        channel.absorb_elems(publics)
        ctxs.append(
            {
                "air": air,
                "trace": trace,
                "publics": publics,
                "dom": Domain(log_n, BLOWUP_LOG),
                "log_n": log_n,
                "width": width,
                "fixed": fixed,
                "committed_fixed": committed_fixed,
                "dev": _table_device(air, trace),
            }
        )

    # 1. every table's trace LDE + commit, roots absorbed in order; a
    # committed fixed segment's (deterministic) root follows its trace root
    _t = Measurement("stark.trace_commit")
    for c in ctxs:
        with _device_ctx(c["dev"]):
            trace_m = bb.to_mont(jnp.asarray(c["trace"].T.copy()))  # (W, n)
            c["t_coeffs"], c["t_lde"], c["t_levels"] = _commit_cols(
                trace_m, c["dom"].shift
            )
            c["t_root"] = merkle.root(c["t_levels"])
            channel.absorb_digest(c["t_root"])
            c["f_coeffs"] = c["f_lde"] = c["f_levels"] = None
            c["fixed_root_std"] = []
            if c["committed_fixed"]:
                fixed_m = bb.to_mont(
                    jnp.asarray(np.ascontiguousarray(c["fixed"]))
                )
                c["f_coeffs"], c["f_lde"], c["f_levels"] = _commit_cols(
                    fixed_m, c["dom"].shift
                )
                f_root = merkle.root(c["f_levels"])
                channel.absorb_digest(f_root)
                c["fixed_root_std"] = np.asarray(bb.from_mont(f_root)).tolist()
    _t.stop()

    # 2. shared challenges (AFTER all trace roots), then aux commitments
    nchal = max((c["air"].num_aux_challenges for c in ctxs), default=0)
    challenges = [channel.challenge_ef() for _ in range(nchal)]
    for c in ctxs:
        air = c["air"]
        c["a_coeffs"] = c["a_lde"] = c["a_levels"] = None
        c["chal_dev"] = None
        c["aux_root_std"] = []
        if air.aux_width:
            _t = Measurement("stark.aux_commit")
            chal_t = challenges[: air.num_aux_challenges]
            aux = air.aux_trace(c["trace"], chal_t)
            assert aux.shape == (c["trace"].shape[0], air.aux_width)
            with _device_ctx(c["dev"]):
                aux_m = bb.to_mont(jnp.asarray(aux.T.copy()))
                c["a_coeffs"], c["a_lde"], c["a_levels"] = _commit_cols(
                    aux_m, c["dom"].shift
                )
                a_root = merkle.root(c["a_levels"])
                channel.absorb_digest(a_root)
                c["aux_root_std"] = np.asarray(bb.from_mont(a_root)).tolist()
                coords = [x for ch in chal_t for x in ch]
                c["chal_dev"] = jnp.asarray(
                    np.array(
                        [(x % bb.P) * bb.R % bb.P for x in coords],
                        dtype=np.uint32,
                    )
                )
            _t.stop()

    # 3. bus values (challenge-dependent public EF scalars), absorbed
    for c in ctxs:
        air = c["air"]
        c["bus"] = []
        if air.num_bus_values:
            chal_t = challenges[: air.num_aux_challenges]
            c["bus"] = [tuple(v) for v in air.bus_values(c["trace"], chal_t)]
            assert len(c["bus"]) == air.num_bus_values
            for v in c["bus"]:
                channel.absorb_ef(v)

    # 4+. per-table quotient / OOD / DEEP / FRI / queries on the shared
    # channel, in table order (each table pinned to its chosen device)
    out = []
    for c in ctxs:
        with _device_ctx(c["dev"]):
            out.append(_finish_table(c, channel))
    return out


def _finish_table(c: dict, channel: Channel) -> StarkProof:
    air = c["air"]
    dom = c["dom"]
    publics = c["publics"]
    log_n, width = c["log_n"], c["width"]
    m = dom.m
    n = dom.n
    aux_w = air.aux_width
    t_coeffs, t_lde, t_levels, t_root = (
        c["t_coeffs"],
        c["t_lde"],
        c["t_levels"],
        c["t_root"],
    )
    a_coeffs, a_lde, a_levels = c["a_coeffs"], c["a_lde"], c["a_levels"]
    chal_dev = c["chal_dev"]
    aux_root_std = c["aux_root_std"]
    bus = c["bus"]
    bus_dev = None
    if bus:
        coords = [x for v in bus for x in v]
        bus_dev = jnp.asarray(
            np.array([(x % bb.P) * bb.R % bb.P for x in coords], dtype=np.uint32)
        )

    committed_fixed = c["committed_fixed"]
    f_coeffs, f_lde = c["f_coeffs"], c["f_lde"]
    fw = c["fixed"].shape[0] if committed_fixed else 0

    # 2+3. constraint evaluation + quotient + chunk commit (one stage)
    alpha = channel.challenge_ef()
    fixed = c["fixed"]
    fixed_m = (
        bb.to_mont(jnp.asarray(np.ascontiguousarray(fixed)))
        if fixed is not None
        else None
    )
    counts = _constraint_counts(air)
    apows = []
    apow = ef.H_ONE
    for count in counts:
        pows = []
        for _ in range(count):
            pows.append(apow)
            apow = ef.h_mul(apow, alpha)
        apows.append(ef.to_device(pows))
    nq = air.quotient_chunks
    sinvp = jnp.asarray(_sinv_pows(dom.shift, m))
    publics_dev = jnp.asarray(
        np.array([(p % bb.P) * bb.R % bb.P for p in publics], dtype=np.uint32)
    )
    qfn = _quotient_stage_for(air, dom, fixed_m is not None)

    _t = Measurement("stark.quotient")
    chunks, q_lde, q_levels = qfn(
        t_lde, a_lde, chal_dev, bus_dev, fixed_m, apows, sinvp, publics_dev
    )
    q_root = merkle.root(q_levels)
    channel.absorb_digest(q_root)
    _t.stop()

    # 4. out-of-domain openings (one stage)
    zeta = channel.challenge_ef()
    zeta_g = ef.h_mul(zeta, ef.h_from_base(dom.g))
    zp = _ef_powers_device(zeta, dom.n)
    zgp = _ef_powers_device(zeta_g, dom.n)

    _t = Measurement("stark.ood")
    o_coeffs = (
        jnp.concatenate([t_coeffs, a_coeffs], axis=0) if aux_w else t_coeffs
    )
    tz, tzg, qz = _ood_stage(o_coeffs, chunks, zp, zgp)
    opened_at_zeta = ef.from_device(tz)
    opened_at_zeta_g = ef.from_device(tzg)
    quotient_at_zeta = ef.from_device(qz)
    fixed_at_zeta = (
        ef.from_device(_ef_dot(f_coeffs, zp)) if committed_fixed else []
    )
    trace_at_zeta, aux_at_zeta = opened_at_zeta[:width], opened_at_zeta[width:]
    trace_at_zeta_g, aux_at_zeta_g = (
        opened_at_zeta_g[:width],
        opened_at_zeta_g[width:],
    )
    _t.stop()
    for v in opened_at_zeta + opened_at_zeta_g + quotient_at_zeta + fixed_at_zeta:
        channel.absorb_ef(v)

    # 5. DEEP composition (one stage).  The opened segment at zeta =
    # trace ++ aux ++ committed-fixed; at zeta*g = trace ++ aux.
    gamma = channel.challenge_ef()
    nq4 = 4 * nq
    ow = width + aux_w
    n_open = 2 * ow + fw + nq4
    gammas = [ef.H_ONE]
    for _ in range(n_open - 1):
        gammas.append(ef.h_mul(gammas[-1], gamma))
    g1 = (
        [gammas[k] for k in range(ow + fw)]
        + [gammas[2 * ow + fw + j] for j in range(nq4)]
    )
    g2 = [gammas[ow + fw + k] for k in range(ow)]
    c1 = ef.H_ZERO
    for g, v in zip(g1, opened_at_zeta + fixed_at_zeta + quotient_at_zeta):
        c1 = ef.h_add(c1, ef.h_mul(g, v))
    c2 = ef.H_ZERO
    for g, v in zip(g2, opened_at_zeta_g):
        c2 = ef.h_add(c2, ef.h_mul(g, v))
    nb_z, cdev_z = _inv_linear_consts(zeta)
    nb_zg, cdev_zg = _inv_linear_consts(zeta_g)
    xs = jnp.asarray(dom.xs_mont)

    o_lde = jnp.concatenate([t_lde, a_lde], axis=0) if aux_w else t_lde
    extra_lde = (
        jnp.concatenate([f_lde, q_lde], axis=0) if committed_fixed else q_lde
    )
    h = _deep_stage(
        o_lde,
        extra_lde,
        ef.to_device(g1),
        ef.to_device(g2),
        ef.to_device([c1])[0],
        ef.to_device([c2])[0],
        xs,
        nb_z,
        cdev_z,
        nb_zg,
        cdev_zg,
    )

    # 6. FRI
    _t = Measurement("stark.fri")
    layers, roots_dev, final_values = fri.commit(h, log_n + BLOWUP_LOG, dom.shift, channel)
    layer_roots = [
        np.asarray(bb.from_mont(r)).tolist() for r in roots_dev
    ]

    _t.stop()
    # 7. grinding + queries (batched device gathers, one transfer each)
    _t = Measurement("stark.grind_queries")
    pow_nonce = channel.grind(GRIND_BITS)
    indices = channel.challenge_indices(NUM_QUERIES, m)
    idx_dev = jnp.asarray(np.asarray(indices, np.int32))
    t_sel = np.asarray(bb.from_mont(jnp.take(t_lde.T, idx_dev, axis=0)))
    q_sel = np.asarray(bb.from_mont(jnp.take(q_lde.T, idx_dev, axis=0)))
    t_paths = merkle.open_paths(t_levels, indices)
    q_paths = merkle.open_paths(q_levels, indices)
    if aux_w:
        a_sel = np.asarray(bb.from_mont(jnp.take(a_lde.T, idx_dev, axis=0)))
        a_paths = merkle.open_paths(a_levels, indices)
    if committed_fixed:
        f_sel = np.asarray(bb.from_mont(jnp.take(f_lde.T, idx_dev, axis=0)))
        f_paths = merkle.open_paths(c["f_levels"], indices)
    queries = []
    for qi, idx in enumerate(indices):
        q = {
            "trace_row": t_sel[qi].tolist(),
            "trace_path": [p.tolist() for p in t_paths[qi]],
            "quot_row": q_sel[qi].tolist(),
            "quot_path": [p.tolist() for p in q_paths[qi]],
        }
        if aux_w:
            q["aux_row"] = a_sel[qi].tolist()
            q["aux_path"] = [p.tolist() for p in a_paths[qi]]
        if committed_fixed:
            q["fixed_row"] = f_sel[qi].tolist()
            q["fixed_path"] = [p.tolist() for p in f_paths[qi]]
        queries.append(q)
    _t.stop()
    fri_proof = fri.FriProof(
        layer_roots=layer_roots,
        final_values=final_values,
        query_proofs=fri.open_queries(layers, indices),
    )
    return StarkProof(
        log_n=log_n,
        width=width,
        pow_nonce=pow_nonce,
        publics=publics,
        trace_root=np.asarray(bb.from_mont(t_root)).tolist(),
        quotient_root=np.asarray(bb.from_mont(q_root)).tolist(),
        trace_at_zeta=trace_at_zeta,
        trace_at_zeta_g=trace_at_zeta_g,
        quotient_at_zeta=quotient_at_zeta,
        fri_proof=fri_proof,
        queries=queries,
        aux_root=aux_root_std,
        aux_at_zeta=aux_at_zeta,
        aux_at_zeta_g=aux_at_zeta_g,
        bus=bus,
        fixed_root=c["fixed_root_std"],
        fixed_at_zeta=fixed_at_zeta,
    )
