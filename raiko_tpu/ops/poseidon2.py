"""Poseidon2 permutation over BabyBear — the STARK pipeline's native hash.

Role: Merkle commitments inside STARK proving (the role Poseidon2 plays in
the reference's vendored risc0 prover core, SURVEY.md §2.2) — hashing LDE
matrix rows into leaves and compressing digest pairs, all field-native so
the hash itself is cheaply provable in later recursion rounds.

Parameters: width t=16, S-box x^7 (gcd(7, p-1)=1), 8 external + 13 internal
rounds (the standard 128-bit-security setting for a 31-bit field at t=16).

The external linear layer uses the Poseidon2 M4-block structure (cheap
add/double chains, no field multiplications); the internal layer is
``out_i = sum(x) + mu_i * x_i``.

Round constants and the internal diagonal are **derived deterministically**
from SHA-256 in counter mode over a domain tag ("nothing up my sleeve", see
``_derive_constants``).  The reference snapshot does not contain risc0's
vendored constant tables, so bit-compatibility with risc0 receipts is not
claimed; the prover/verifier pair in raiko_tpu.stark is self-consistent by
construction and the choice is pinned by golden tests.

All functions operate on Montgomery-form uint32 arrays, batch axis first.
Linear layers are Montgomery-transparent (addition and small-integer
scaling commute with the Montgomery map).
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import babybear as bb

WIDTH = 16
RATE = 8
OUT = 8
ROUNDS_F = 8  # external (full) rounds, split 4 + 4
ROUNDS_P = 13  # internal (partial) rounds
ALPHA = 7

_DOMAIN = b"raiko-tpu/poseidon2/babybear/v1"


def _prf_field_elements(tag: bytes, n: int) -> np.ndarray:
    """n BabyBear elements from SHA-256(domain || tag || counter), rejection
    sampled to remove modulo bias."""
    out = []
    ctr = 0
    while len(out) < n:
        h = hashlib.sha256(_DOMAIN + b"/" + tag + ctr.to_bytes(4, "big")).digest()
        for off in range(0, 32, 4):
            v = int.from_bytes(h[off : off + 4], "big")
            # rejection sample: accept v < floor(2^32/p)*p
            if v < (2**32 // bb.P) * bb.P:
                out.append(v % bb.P)
                if len(out) == n:
                    break
        ctr += 1
    return np.array(out, dtype=np.uint32)


@functools.lru_cache(maxsize=1)
def _derive_constants():
    ext = _prf_field_elements(b"external-rc", ROUNDS_F * WIDTH).reshape(
        ROUNDS_F, WIDTH
    )
    internal = _prf_field_elements(b"internal-rc", ROUNDS_P)
    # internal diagonal mu (out_i = sum + mu_i * x_i); ensure the implied
    # matrix (all-ones + diag(mu)) is invertible over F_p
    attempt = 0
    while True:
        mu = _prf_field_elements(b"internal-diag" + bytes([attempt]), WIDTH)
        m = [[(1 + (int(mu[i]) if i == j else 0)) % bb.P for j in range(WIDTH)] for i in range(WIDTH)]
        # determinant via fraction-free Gaussian elimination mod p
        det = 1
        mm = [row[:] for row in m]
        singular = False
        for c in range(WIDTH):
            piv = next((r for r in range(c, WIDTH) if mm[r][c] != 0), None)
            if piv is None:
                singular = True
                break
            if piv != c:
                mm[c], mm[piv] = mm[piv], mm[c]
                det = (-det) % bb.P
            det = (det * mm[c][c]) % bb.P
            inv = pow(mm[c][c], bb.P - 2, bb.P)
            for r in range(c + 1, WIDTH):
                f = (mm[r][c] * inv) % bb.P
                for k in range(c, WIDTH):
                    mm[r][k] = (mm[r][k] - f * mm[c][k]) % bb.P
        if not singular and det != 0:
            break
        attempt += 1
    return (
        bb.np_to_mont(ext),
        bb.np_to_mont(internal),
        bb.np_to_mont(mu),
    )


def _sbox(x):
    x2 = bb.mont_mul(x, x)
    x4 = bb.mont_mul(x2, x2)
    x3 = bb.mont_mul(x2, x)
    return bb.mont_mul(x4, x3)


def _m4(a, b, c, d):
    """Apply the Poseidon2 M4 block [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]]
    with the paper's add/double chain (no multiplications).  Operands are
    (B, G) arrays — vectorized over the batch AND the four 4-lane groups."""
    t0 = bb.add(a, b)
    t1 = bb.add(c, d)
    t2 = bb.add(bb.add(b, b), t1)
    t3 = bb.add(bb.add(d, d), t0)
    t4 = bb.add(bb.add(bb.add(t1, t1), bb.add(t1, t1)), t3)
    t5 = bb.add(bb.add(bb.add(t0, t0), bb.add(t0, t0)), t2)
    t6 = bb.add(t3, t5)
    t7 = bb.add(t2, t4)
    return t6, t5, t7, t4


def _external_linear(state: jax.Array) -> jax.Array:
    """M_E = circ(2*M4, M4, M4, M4) on (B, 16), whole-state vector ops."""
    bsz = state.shape[0]
    y = state.reshape(bsz, 4, 4)  # axis1 = group, axis2 = position
    o0, o1, o2, o3 = _m4(y[:, :, 0], y[:, :, 1], y[:, :, 2], y[:, :, 3])
    m = jnp.stack([o0, o1, o2, o3], axis=2)  # (B, group, pos)
    s = bb.add(bb.add(m[:, 0], m[:, 1]), bb.add(m[:, 2], m[:, 3]))  # (B, pos)
    return bb.add(m, s[:, None, :]).reshape(bsz, WIDTH)


def _modsum_cols(state: jax.Array) -> jax.Array:
    """Modular sum over the lane axis of (B, W) via a log-depth add tree."""
    t = state
    while t.shape[1] > 1:
        t = bb.add(t[:, 0::2], t[:, 1::2])
    return t[:, 0]


@jax.jit
def permute(state: jax.Array) -> jax.Array:
    """Poseidon2 permutation. state: (B, 16) u32 Montgomery form.

    Rounds run under ``lax.scan`` (round constants as scanned inputs) so the
    compiled graph is one external + one internal round body — fast to
    compile, and XLA pipelines the scan fine on TPU."""
    ext_rc, int_rc, mu = _derive_constants()
    ext_rc = jnp.asarray(ext_rc)
    int_rc = jnp.asarray(int_rc)
    mu = jnp.asarray(mu)
    half = ROUNDS_F // 2

    def ext_round(st, rc):
        return _external_linear(_sbox(bb.add(st, rc[None, :]))), None

    def int_round(st, rc):
        c0 = _sbox(bb.add(st[:, 0], rc))
        st = st.at[:, 0].set(c0)
        s = _modsum_cols(st)
        return bb.add(s[:, None], bb.mont_mul(st, mu[None, :])), None

    state = _external_linear(state)
    state, _ = jax.lax.scan(ext_round, state, ext_rc[:half])
    state, _ = jax.lax.scan(int_round, state, int_rc)
    state, _ = jax.lax.scan(ext_round, state, ext_rc[half:])
    return state


@jax.jit
def compress(left: jax.Array, right: jax.Array) -> jax.Array:
    """2-to-1 digest compression: truncated permutation.
    left/right: (B, 8) -> (B, 8), all Montgomery form."""
    return permute(jnp.concatenate([left, right], axis=1))[:, :OUT]


# ---------------------------------------------------------------------------
# host (python-int) reference: round-by-round, used by the Poseidon2 AIR's
# trace generator and in tests to pin the device permutation
# ---------------------------------------------------------------------------

M4 = ((5, 7, 1, 3), (4, 6, 1, 1), (1, 3, 5, 7), (1, 1, 4, 6))


def host_constants():
    """(ext_rc (8,16), int_rc (13,), mu (16,)) as standard-form ints."""
    ext, internal, mu = _derive_constants()
    return (
        bb.np_from_mont(ext).tolist(),
        bb.np_from_mont(internal).tolist(),
        bb.np_from_mont(mu).tolist(),
    )


def host_ext_linear(s: list[int]) -> list[int]:
    groups = []
    for g in range(4):
        grp = s[4 * g : 4 * g + 4]
        groups.append(
            [sum(M4[i][j] * grp[j] for j in range(4)) % bb.P for i in range(4)]
        )
    sums = [sum(grp[i] for grp in groups) % bb.P for i in range(4)]
    return [
        (groups[g][i] + sums[i]) % bb.P for g in range(4) for i in range(4)
    ]


def host_int_linear(s: list[int], mu: list[int]) -> list[int]:
    tot = sum(s) % bb.P
    return [(tot + mu[c] * s[c]) % bb.P for c in range(WIDTH)]


def host_sbox(v: int) -> int:
    return pow(v, ALPHA, bb.P)


def host_round_sequence():
    """The 21 rounds as (kind, rc_vector) with kind in {'ext','int'}."""
    ext_rc, int_rc, _ = host_constants()
    seq = []
    for r in range(ROUNDS_F // 2):
        seq.append(("ext", ext_rc[r]))
    for r in range(ROUNDS_P):
        seq.append(("int", [int_rc[r]] + [0] * (WIDTH - 1)))
    for r in range(ROUNDS_F // 2, ROUNDS_F):
        seq.append(("ext", ext_rc[r]))
    return seq


def host_permute(state: list[int]) -> list[int]:
    """Full permutation via the round sequence (must equal device
    ``permute`` exactly; pinned by tests)."""
    _, _, mu = host_constants()
    s = host_ext_linear(state)
    for kind, rc in host_round_sequence():
        if kind == "ext":
            s = host_ext_linear([host_sbox((s[c] + rc[c]) % bb.P) for c in range(WIDTH)])
        else:
            v = [host_sbox((s[0] + rc[0]) % bb.P)] + s[1:]
            s = host_int_linear(v, mu)
    return s


_PNP = np.uint64(bb.P)


def _np_sbox(v: np.ndarray) -> np.ndarray:
    """x^ALPHA mod p vectorized (inputs < p < 2^31: every product of two
    reduced values fits u64)."""
    x2 = v * v % _PNP
    x3 = x2 * v % _PNP
    if ALPHA == 7:
        return x3 * x3 % _PNP * v % _PNP
    if ALPHA == 5:
        return x2 * x2 % _PNP * v % _PNP
    if ALPHA == 3:
        return x3
    out = np.ones_like(v)
    b, e = v, ALPHA
    while e:
        if e & 1:
            out = out * b % _PNP
        b = b * b % _PNP
        e >>= 1
    return out


def _np_ext_linear(s: np.ndarray) -> np.ndarray:
    """(B, 16) batched external linear layer (the M4 circulant form)."""
    g = s.reshape(-1, 4, 4)
    m4 = np.array(M4, dtype=np.uint64)
    grp = (g @ m4.T) % _PNP  # (B, 4, 4)
    sums = grp.sum(axis=1) % _PNP  # (B, 4)
    return ((grp + sums[:, None, :]) % _PNP).reshape(-1, WIDTH)


@functools.lru_cache(maxsize=1)
def _np_round_consts():
    ext_rc, int_rc, mu = host_constants()
    return (
        [np.array(rc, dtype=np.uint64) for rc in ext_rc],
        [np.uint64(rc) for rc in int_rc],
        np.array(mu, dtype=np.uint64),
    )


def host_permute_batch(states: np.ndarray) -> np.ndarray:
    """Batched host permutation: (B, 16) standard-form uint64 -> same.
    Bit-equal to ``host_permute`` per row (pinned by tests) — used by the
    Fiat-Shamir grinding search, which evaluates ~2^bits candidate
    nonces and would otherwise pay ~10 ms of scalar-python permutation
    each (the round-5 ``stark.grind_queries`` profile whale)."""
    ext_rc, int_rc, mu = _np_round_consts()
    s = _np_ext_linear(states.astype(np.uint64) % _PNP)
    ei = 0
    ii = 0
    for kind, _ in host_round_sequence():
        if kind == "ext":
            s = _np_ext_linear(_np_sbox((s + ext_rc[ei]) % _PNP))
            ei += 1
        else:
            s0 = _np_sbox((s[:, 0] + int_rc[ii]) % _PNP)
            ii += 1
            s = s.copy()
            s[:, 0] = s0
            tot = s.sum(axis=1) % _PNP
            s = (tot[:, None] + mu[None, :] * s) % _PNP
    return s


def hash_rows(rows: jax.Array) -> jax.Array:
    """Sponge-hash each row of a (B, W) matrix into a (B, 8) digest.

    Absorbs RATE elements per permutation (zero-padded final chunk with a
    length-bound domain separator in the capacity)."""
    bsz, w = rows.shape
    nchunks = max(1, -(-w // RATE))
    padded = jnp.zeros((bsz, nchunks * RATE), dtype=jnp.uint32)
    padded = padded.at[:, :w].set(rows)
    state = jnp.zeros((bsz, WIDTH), dtype=jnp.uint32)
    # domain-separate by original width in the capacity section
    state = state.at[:, WIDTH - 1].set(jnp.uint32(bb.R * (w % bb.P) % bb.P))

    def absorb(st, blk):
        st = st.at[:, :RATE].set(bb.add(st[:, :RATE], blk))
        return permute(st)

    if nchunks <= 8:
        for c in range(nchunks):
            state = absorb(state, padded[:, c * RATE : (c + 1) * RATE])
    else:
        # wide rows (the 2000-4000-column zkEVM/keccak traces): a scan
        # keeps the graph one permutation deep — the unrolled form makes
        # XLA:CPU compile of the leaf-hash stage take minutes
        blocks = padded.reshape(bsz, nchunks, RATE).transpose(1, 0, 2)
        state, _ = jax.lax.scan(
            lambda st, blk: (absorb(st, blk), None), state, blocks
        )
    return state[:, :OUT]


def host_hash_row(row: list[int]) -> list[int]:
    """Standard-form sponge hash of one row — bit-equal to ``hash_rows``
    (host analog for verifier/channel paths where a device round-trip per
    call would dominate: ~150 ms through the sandbox relay)."""
    w = len(row)
    nchunks = max(1, -(-w // RATE))
    padded = [int(v) % bb.P for v in row] + [0] * (nchunks * RATE - w)
    state = [0] * WIDTH
    state[WIDTH - 1] = w % bb.P
    for c in range(nchunks):
        for i in range(RATE):
            state[i] = (state[i] + padded[c * RATE + i]) % bb.P
        state = host_permute(state)
    return state[:OUT]


def host_compress(left, right) -> list[int]:
    """2-to-1 compression on standard-form ints — bit-equal to ``compress``."""
    return host_permute([int(v) % bb.P for v in left] + [int(v) % bb.P for v in right])[:OUT]
