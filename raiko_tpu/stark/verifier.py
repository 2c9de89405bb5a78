"""STARK verifier — host-side, no TPU required.

Replays the Fiat-Shamir transcript, checks the DEEP-ALI identity at the
out-of-domain point, recomputes the DEEP composition value at every query
from Merkle-opened rows, and delegates the low-degree argument to
stark/fri.py.  All arithmetic is exact host math (ints + EF tuples); the
only accelerator use is the tiny Poseidon2 permutation inside Merkle path
checks (compiled once)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import babybear_ext as ef
from ..ops import merkle, poseidon2 as p2
from . import fri
from .air import Air, ConstraintBuilder
from ..utils.measurement import Measurement
from .channel import Channel
from .domain import Domain
from .prover import BLOWUP_LOG, GRIND_BITS, NUM_QUERIES, StarkProof


class _VerifierAlgebra:
    """Scalar EF evaluation of constraints at the OOD point."""

    def __init__(self, at_zeta, at_zeta_g, publics, fixed_at_zeta=None):
        self._z = at_zeta
        self._zg = at_zeta_g
        self._publics = publics
        self._fixed = fixed_at_zeta

    def local(self, c):
        return tuple(self._z[c])

    def next(self, c):
        return tuple(self._zg[c])

    def fixed(self, c):
        return tuple(self._fixed[c])

    def public(self, i):
        return ef.h_from_base(self._publics[i])

    def constant(self, v):
        return ef.h_from_base(v)

    # block access: lists of EF scalars
    def local_block(self, cols):
        return [tuple(self._z[c]) for c in cols]

    def next_block(self, cols):
        return [tuple(self._zg[c]) for c in cols]

    def fixed_block(self, cols):
        return [tuple(self._fixed[c]) for c in cols]

    def public_block(self, idxs):
        return [ef.h_from_base(self._publics[i]) for i in idxs]

    def scale(self, k, a):
        c = ef.h_from_base(k)
        if isinstance(a, list):
            return [ef.h_mul(c, v) for v in a]
        return ef.h_mul(c, a)

    def add(self, a, b):
        if isinstance(a, list) or isinstance(b, list):
            return [ef.h_add(x, y) for x, y in _zip_bc(a, b)]
        return ef.h_add(a, b)

    def sub(self, a, b):
        if isinstance(a, list) or isinstance(b, list):
            return [ef.h_sub(x, y) for x, y in _zip_bc(a, b)]
        return ef.h_sub(a, b)

    def mul(self, a, b):
        if isinstance(a, list) or isinstance(b, list):
            return [ef.h_mul(x, y) for x, y in _zip_bc(a, b)]
        return ef.h_mul(a, b)


def _zip_bc(a, b):
    """Zip with scalar broadcasting for block ops."""
    if isinstance(a, list) and isinstance(b, list):
        assert len(a) == len(b)
        return zip(a, b)
    if isinstance(a, list):
        return ((x, b) for x in a)
    return ((a, y) for y in b)


def _row_to_mont(row: list[int]) -> np.ndarray:
    return ((np.array(row, dtype=np.uint64) * bb.R) % bb.P).astype(np.uint32)


def _hash_rows_batch(rows: list[list[int]]) -> list[list[int]]:
    """Leaf digests (standard form) for many rows: ONE device call for wide
    rows (a 4160-wide row is ~520 host permutations), pure host for narrow
    ones (a device round-trip costs ~150 ms through the sandbox relay)."""
    w = len(rows[0])
    if w <= 64:
        return [p2.host_hash_row(r) for r in rows]
    arr = ((np.array(rows, dtype=np.uint64) * bb.R) % bb.P).astype(np.uint32)
    dig = np.asarray(bb.from_mont(p2.hash_rows(jnp.asarray(arr))))
    return [d.tolist() for d in dig]


def _host_path_ok(leaf_std, index: int, path, root) -> bool:
    """Merkle path walk on standard-form ints (host Poseidon2)."""
    cur = [int(v) % bb.P for v in leaf_std]
    for sib in path:
        sib = [int(v) % bb.P for v in sib]
        cur = p2.host_compress(sib, cur) if index & 1 else p2.host_compress(cur, sib)
        index >>= 1
    return cur == [int(v) % bb.P for v in root]


def _check_merkle(row, index, path, root) -> bool:
    return _host_path_ok(p2.host_hash_row(list(row)), index, path, root)


def verify(air: Air, proof: StarkProof) -> bool:
    publics = proof.publics
    log_n = proof.log_n
    width = proof.width
    if width != air.width:
        return False
    dom = Domain(log_n, BLOWUP_LOG)
    m = dom.m
    channel = Channel()
    channel.absorb_elems([log_n, width, len(publics)])
    channel.absorb_elems(publics)
    channel.absorb_elems(proof.trace_root)
    alpha = channel.challenge_ef()
    channel.absorb_elems(proof.quotient_root)
    zeta = channel.challenge_ef()
    zeta_g = ef.h_mul(zeta, ef.h_from_base(dom.g))
    for v in proof.trace_at_zeta + proof.trace_at_zeta_g + proof.quotient_at_zeta:
        channel.absorb_ef(tuple(v))

    # DEEP-ALI identity at zeta: sum alpha^i c_i(zeta) sel_i(zeta) == Q(zeta)
    _t = Measurement("verify.fixed_eval")
    fixed_at_zeta = None
    fixed = air.fixed_columns(dom.n)
    if fixed is not None:
        fixed_at_zeta = _eval_fixed_at(fixed, zeta)
    _t.stop()
    _t = Measurement("verify.constraints")
    alg = _VerifierAlgebra(
        proof.trace_at_zeta, proof.trace_at_zeta_g, publics, fixed_at_zeta
    )
    builder = ConstraintBuilder(alg)
    air.eval(builder)
    sels = dom.sel_at(zeta)
    acc = ef.H_ZERO
    apow = ef.H_ONE
    for con in builder.constraints:
        exprs = con.expr if isinstance(con.expr, list) else [con.expr]
        assert len(exprs) == con.count
        for e in exprs:
            acc = ef.h_add(acc, ef.h_mul(apow, ef.h_mul(e, sels[con.kind])))
            apow = ef.h_mul(apow, alpha)
    nq = air.quotient_chunks
    if len(proof.quotient_at_zeta) != 4 * nq:
        return False
    zn = ef.h_pow(zeta, dom.n)
    q_at_zeta = ef.H_ZERO
    znj = ef.H_ONE
    for j in range(nq):
        chunk = _chunk_at(proof.quotient_at_zeta[4 * j : 4 * j + 4])
        q_at_zeta = ef.h_add(q_at_zeta, ef.h_mul(znj, chunk))
        znj = ef.h_mul(znj, zn)
    _t.stop()
    if acc != q_at_zeta:
        return False

    # DEEP composition coefficients
    gamma = channel.challenge_ef()
    nq4 = 4 * nq
    n_open = 2 * width + nq4
    gammas = [ef.H_ONE]
    for _ in range(n_open - 1):
        gammas.append(ef.h_mul(gammas[-1], gamma))
    c1 = ef.H_ZERO
    for k in range(width):
        c1 = ef.h_add(c1, ef.h_mul(gammas[k], tuple(proof.trace_at_zeta[k])))
    for j in range(nq4):
        c1 = ef.h_add(
            c1, ef.h_mul(gammas[2 * width + j], tuple(proof.quotient_at_zeta[j]))
        )
    c2 = ef.H_ZERO
    for k in range(width):
        c2 = ef.h_add(
            c2, ef.h_mul(gammas[width + k], tuple(proof.trace_at_zeta_g[k]))
        )

    # FRI transcript replay, then query indices
    betas = fri.replay_commit(proof.fri_proof, log_n + BLOWUP_LOG, dom.shift, channel)
    if betas is None:
        return False
    if not channel.check_grind(proof.pow_nonce, GRIND_BITS):
        return False
    indices = channel.challenge_indices(NUM_QUERIES, m)
    if len(proof.queries) != len(indices) or len(proof.fri_proof.query_proofs) != len(indices):
        return False

    # per-query: Merkle rows + recompute DEEP value.  Leaf hashing for the
    # (possibly very wide) trace/quotient rows is batched into one device
    # call each; path walks run on the host.
    if len(proof.queries) == 0:
        return False
    _t = Measurement("verify.queries")
    t_leaves = _hash_rows_batch([list(q["trace_row"]) for q in proof.queries])
    q_leaves = _hash_rows_batch([list(q["quot_row"]) for q in proof.queries])
    pairs = []
    for qi, (idx, q) in enumerate(zip(indices, proof.queries)):
        if not _host_path_ok(t_leaves[qi], idx, q["trace_path"], proof.trace_root):
            return False
        if not _host_path_ok(q_leaves[qi], idx, q["quot_path"], proof.quotient_root):
            return False
        x = dom.xs_int[idx]
        s1 = ef.H_ZERO
        for k in range(width):
            s1 = ef.h_add(
                s1, ef.h_mul(gammas[k], ef.h_from_base(q["trace_row"][k]))
            )
        if len(q["quot_row"]) != nq4:
            return False
        for j in range(nq4):
            s1 = ef.h_add(
                s1,
                ef.h_mul(gammas[2 * width + j], ef.h_from_base(q["quot_row"][j])),
            )
        s2 = ef.H_ZERO
        for k in range(width):
            s2 = ef.h_add(
                s2, ef.h_mul(gammas[width + k], ef.h_from_base(q["trace_row"][k]))
            )
        inv_z = ef.h_inv(ef.h_sub(ef.h_from_base(x), zeta))
        inv_zg = ef.h_inv(ef.h_sub(ef.h_from_base(x), zeta_g))
        h_val = ef.h_add(
            ef.h_mul(ef.h_sub(s1, c1), inv_z), ef.h_mul(ef.h_sub(s2, c2), inv_zg)
        )
        pairs.append((idx, h_val))
    _t.stop()

    _t = Measurement("verify.fri_queries")
    try:
        return fri.check_queries(
            proof.fri_proof, betas, log_n + BLOWUP_LOG, dom.shift, pairs
        )
    finally:
        _t.stop()


def _eval_fixed_at(fixed: np.ndarray, zeta: tuple) -> list[tuple]:
    """Evaluate public fixed columns at the OOD point: interpolate over the
    trace subgroup, then one vectorized coeff·zeta^i contraction (the same
    _ef_dot the prover uses) — scalar Horner per column is O(F·n) host EF
    ops, prohibitive for wide fixed sets like the keccak sponge AIRs."""
    import jax.numpy as jnp

    from ..ops import ntt
    from .prover import _ef_dot, _ef_powers_device

    coeffs = ntt.interpolate(
        bb.to_mont(jnp.asarray(np.ascontiguousarray(fixed)))
    )  # (F, n) Montgomery
    zpows = _ef_powers_device(zeta, coeffs.shape[1])
    return ef.from_device(_ef_dot(coeffs, zpows))


def _chunk_at(coords) -> tuple:
    """Chunk value from its 4 opened coordinate values: sum_c e_c * v_c
    where e_c is the EF basis element x^c."""
    acc = ef.H_ZERO
    for c, v in enumerate(coords):
        basis = tuple(1 if i == c else 0 for i in range(4))
        acc = ef.h_add(acc, ef.h_mul(basis, tuple(v)))
    return acc
