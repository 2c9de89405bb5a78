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

Degree budget: transition constraints deg <= 3, boundary deg <= 2,
blowup 4 => quotient degree < 2n (two chunks), every committed polynomial
deg < n, DEEP composition deg < n - 1 < m/4 = FRI bound.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb
from ..fields import babybear_ext as ef
from ..ops import merkle, ntt, poseidon2 as p2
from . import fri
from .air import Air, ConstraintBuilder
from .channel import Channel
from .domain import Domain

BLOWUP_LOG = 2
NUM_QUERIES = 40
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


class _ProverAlgebra:
    """Vectorized base-field constraint evaluation over the LDE domain."""

    def __init__(
        self,
        lde: jax.Array,
        next_perm: np.ndarray,
        publics: list[int],
        fixed_lde: jax.Array | None = None,
    ):
        self._lde = lde  # (W, m) Montgomery
        self._next = jnp.asarray(next_perm)
        self._publics = publics
        self._fixed = fixed_lde

    def local(self, c: int):
        return self._lde[c]

    def next(self, c: int):
        return self._lde[c][self._next]

    def fixed(self, c: int):
        return self._fixed[c]

    def public(self, i: int):
        return self.constant(self._publics[i])

    def constant(self, v: int):
        return jnp.uint32((v % bb.P) * bb.R % bb.P)

    # block access (vectorized AIRs): (k, m) arrays
    def local_block(self, cols):
        return self._lde[jnp.asarray(cols)]

    def next_block(self, cols):
        return self._lde[jnp.asarray(cols)][:, self._next]

    def fixed_block(self, cols):
        return self._fixed[jnp.asarray(cols)]

    def public_block(self, idxs):
        vals = np.array(
            [(self._publics[i] % bb.P) * bb.R % bb.P for i in idxs], dtype=np.uint32
        )
        return jnp.asarray(vals)[:, None]  # (k, 1) broadcasts over the domain

    def scale(self, k: int, a):
        """Small-integer scaling via Montgomery constant multiply."""
        return bb.mont_mul(a, self.constant(k))

    def add(self, a, b):
        return bb.add(a, b)

    def sub(self, a, b):
        return bb.sub(a, b)

    def mul(self, a, b):
        return bb.mont_mul(a, b)


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


def prove(air: Air, trace: np.ndarray, publics: list[int] | None = None) -> StarkProof:
    """Prove one AIR execution.  trace: (n, W) uint32 standard-form."""
    publics = publics or []
    n, width = trace.shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n and width == air.width
    dom = Domain(log_n, BLOWUP_LOG)
    m = dom.m
    channel = Channel()
    channel.absorb_elems([log_n, width, len(publics)])
    channel.absorb_elems(publics)

    # 1. trace LDE + commit
    trace_m = bb.to_mont(jnp.asarray(trace.T.copy()))  # (W, n)
    t_coeffs = ntt.interpolate(trace_m)  # (W, n) coefficients
    t_lde = ntt.lde_from_coeffs(t_coeffs, BLOWUP_LOG, dom.shift)  # (W, m) bitrev
    t_rows = t_lde.T  # (m, W)
    t_levels = merkle.commit(p2.hash_rows(t_rows))
    t_root = merkle.root(t_levels)
    channel.absorb_digest(t_root)

    # 2. constraint evaluation + quotient
    alpha = channel.challenge_ef()
    fixed = air.fixed_columns(n)
    fixed_lde = None
    if fixed is not None:
        fixed_m = bb.to_mont(jnp.asarray(np.ascontiguousarray(fixed)))
        fixed_lde = ntt.lde_from_coeffs(
            ntt.interpolate(fixed_m), BLOWUP_LOG, dom.shift
        )
    alg = _ProverAlgebra(t_lde, dom.next_perm, publics, fixed_lde)
    builder = ConstraintBuilder(alg)
    air.eval(builder)
    sels = {
        "transition": jnp.asarray(dom.trans_sel),
        "first_row": jnp.asarray(dom.first_inv),
        "last_row": jnp.asarray(dom.last_inv),
    }
    apow = ef.H_ONE
    q_ef = jnp.zeros((m, 4), dtype=jnp.uint32)
    for con in builder.constraints:
        pows = []
        for _ in range(con.count):
            pows.append(apow)
            apow = ef.h_mul(apow, alpha)
        if con.count == 1:
            base_val = bb.mont_mul(con.expr, sels[con.kind])  # (m,)
            apow_dev = ef.to_device(pows)[0]
            q_ef = ef.ef_add(
                q_ef, bb.mont_mul(apow_dev[None, :], base_val[:, None])
            )
        else:
            blk = bb.mont_mul(con.expr, sels[con.kind][None, :])  # (k, m)
            pd = ef.to_device(pows)  # (k, 4)
            contrib = bb.mont_mul(pd[:, None, :], blk[:, :, None])  # (k, m, 4)
            q_ef = ef.ef_add(q_ef, _tree_sum_axis0(contrib))

    # 3. quotient chunking: coords -> coeffs -> two chunks -> coset LDE
    # intt over the coset gives coefficients of Q(shift*y); unshift by
    # shift^{-k} to obtain true coefficients before chunking/opening.
    q_coeffs_shifted = ntt.intt(q_ef.T)  # (4, m)
    sinv = pow(dom.shift, -1, bb.P)
    sinv_pows = np.empty(m, dtype=np.uint32)
    cur = 1
    for k in range(m):
        sinv_pows[k] = cur
        cur = cur * sinv % bb.P
    q_coeffs = bb.mont_mul(q_coeffs_shifted, jnp.asarray(bb.np_to_mont(sinv_pows)))
    nq = air.quotient_chunks
    chunks = jnp.concatenate(
        [q_coeffs[:, j * dom.n : (j + 1) * dom.n] for j in range(nq)], axis=0
    )  # (4*nq, n): 4 EF coords per chunk
    q_lde = ntt.lde_from_coeffs(chunks, BLOWUP_LOG, dom.shift)  # (8, m)
    q_rows = q_lde.T  # (m, 8)
    q_levels = merkle.commit(p2.hash_rows(q_rows))
    q_root = merkle.root(q_levels)
    channel.absorb_digest(q_root)

    # 4. out-of-domain openings
    zeta = channel.challenge_ef()
    zeta_g = ef.h_mul(zeta, ef.h_from_base(dom.g))
    zp = _ef_powers_device(zeta, dom.n)
    zgp = _ef_powers_device(zeta_g, dom.n)
    tz = _ef_dot(t_coeffs, zp)  # (W, 4)
    tzg = _ef_dot(t_coeffs, zgp)
    qz = _ef_dot(chunks, zp)  # (4*nq, 4)
    trace_at_zeta = ef.from_device(tz)
    trace_at_zeta_g = ef.from_device(tzg)
    quotient_at_zeta = ef.from_device(qz)
    for v in trace_at_zeta + trace_at_zeta_g + quotient_at_zeta:
        channel.absorb_ef(v)

    # 5. DEEP composition (vectorized over all opened columns)
    gamma = channel.challenge_ef()
    nq4 = 4 * nq
    n_open = 2 * width + nq4
    gammas = [ef.H_ONE]
    for _ in range(n_open - 1):
        gammas.append(ef.h_mul(gammas[-1], gamma))
    xs = jnp.asarray(dom.xs_mont)
    # group 1 (divisor x - zeta): trace cols + quotient coords
    g1 = [gammas[k] for k in range(width)] + [
        gammas[2 * width + j] for j in range(nq4)
    ]
    p1 = jnp.concatenate([t_lde, q_lde], axis=0)  # (width + nq4, m)
    s1 = _tree_sum_axis0(
        bb.mont_mul(ef.to_device(g1)[:, None, :], p1[:, :, None])
    )
    c1 = ef.H_ZERO
    for g, v in zip(g1, trace_at_zeta + quotient_at_zeta):
        c1 = ef.h_add(c1, ef.h_mul(g, v))
    # group 2 (divisor x - zeta*g): trace cols
    g2 = [gammas[width + k] for k in range(width)]
    s2 = _tree_sum_axis0(
        bb.mont_mul(ef.to_device(g2)[:, None, :], t_lde[:, :, None])
    )
    c2 = ef.H_ZERO
    for g, v in zip(g2, trace_at_zeta_g):
        c2 = ef.h_add(c2, ef.h_mul(g, v))
    inv_z = _ef_inv_linear(xs, zeta)
    inv_zg = _ef_inv_linear(xs, zeta_g)
    h1 = ef.ef_mul(ef.ef_sub(s1, jnp.broadcast_to(ef.to_device([c1])[0], (m, 4))), inv_z)
    h2 = ef.ef_mul(ef.ef_sub(s2, jnp.broadcast_to(ef.to_device([c2])[0], (m, 4))), inv_zg)
    h = ef.ef_add(h1, h2)

    # 6. FRI
    layers, roots_dev, final_values = fri.commit(h, log_n + BLOWUP_LOG, dom.shift, channel)
    layer_roots = [
        np.asarray(bb.from_mont(r)).tolist() for r in roots_dev
    ]

    # 7. grinding + queries
    pow_nonce = channel.grind(GRIND_BITS)
    indices = channel.challenge_indices(NUM_QUERIES, m)
    t_rows_np = np.asarray(bb.from_mont(t_rows))
    q_rows_np = np.asarray(bb.from_mont(q_rows))
    queries = []
    for idx in indices:
        queries.append(
            {
                "trace_row": t_rows_np[idx].tolist(),
                "trace_path": [p.tolist() for p in merkle.open_path(t_levels, idx)],
                "quot_row": q_rows_np[idx].tolist(),
                "quot_path": [p.tolist() for p in merkle.open_path(q_levels, idx)],
            }
        )
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
    )
