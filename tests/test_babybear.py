"""BabyBear field + NTT property tests against Python big-int arithmetic."""

import numpy as np
import jax.numpy as jnp
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.ops import ntt as nttmod

RNG = np.random.default_rng(42)


def rand_elems(n):
    return RNG.integers(0, bb.P, size=n, dtype=np.uint32)


def test_constants():
    assert bb.P == 15 * 2**27 + 1
    assert pow(bb.GENERATOR, (bb.P - 1) // 2, bb.P) != 1  # generator is not a QR
    assert (bb.NPRIME * bb.P) % (1 << 32) == (1 << 32) - 1
    assert bb.R == (1 << 32) % bb.P


def test_mont_roundtrip():
    x = rand_elems(1024)
    xm = bb.to_mont(jnp.asarray(x))
    back = np.asarray(bb.from_mont(xm))
    np.testing.assert_array_equal(back, x)


def test_add_sub_mul_vs_python():
    a = rand_elems(4096)
    b = rand_elems(4096)
    am, bm = bb.to_mont(jnp.asarray(a)), bb.to_mont(jnp.asarray(b))
    got_add = np.asarray(bb.from_mont(bb.add(am, bm)))
    got_sub = np.asarray(bb.from_mont(bb.sub(am, bm)))
    got_mul = np.asarray(bb.from_mont(bb.mont_mul(am, bm)))
    a64 = a.astype(np.uint64)
    b64 = b.astype(np.uint64)
    np.testing.assert_array_equal(got_add, ((a64 + b64) % bb.P).astype(np.uint32))
    np.testing.assert_array_equal(
        got_sub, ((a64 + bb.P - b64) % bb.P).astype(np.uint32)
    )
    np.testing.assert_array_equal(got_mul, ((a64 * b64) % bb.P).astype(np.uint32))


def test_edge_values():
    vals = np.array([0, 1, 2, bb.P - 1, bb.P - 2, bb.R, bb.R2], dtype=np.uint32)
    for a in vals:
        for b in vals:
            am = bb.to_mont(jnp.asarray(np.array([a])))
            bm = bb.to_mont(jnp.asarray(np.array([b])))
            got = int(np.asarray(bb.from_mont(bb.mont_mul(am, bm)))[0])
            assert got == (int(a) * int(b)) % bb.P


def test_inv_pow():
    a = rand_elems(64)
    a[0] = 1
    am = bb.to_mont(jnp.asarray(a))
    inv = np.asarray(bb.from_mont(bb.mont_inv(am)))
    for x, ix in zip(a.tolist(), inv.tolist()):
        assert (x * ix) % bb.P == 1 or x == 0


def test_two_adic_generator():
    for bits in (1, 2, 10, 27):
        w = bb.two_adic_generator(bits)
        assert pow(w, 1 << bits, bb.P) == 1
        assert pow(w, 1 << (bits - 1), bb.P) != 1


@pytest.mark.parametrize("log_n", [1, 3, 6, 8])
def test_ntt_vs_naive(log_n):
    n = 1 << log_n
    x = rand_elems(n)
    w = bb.two_adic_generator(log_n)
    # naive O(n^2) DFT with Python ints
    naive = np.array(
        [sum(int(x[j]) * pow(w, i * j, bb.P) for j in range(n)) % bb.P for i in range(n)],
        dtype=np.uint32,
    )
    xm = bb.to_mont(jnp.asarray(x))
    got_bitrev = np.asarray(bb.from_mont(nttmod.ntt(xm)))
    rev = nttmod.bit_reverse_indices(n)
    got = got_bitrev[rev]
    np.testing.assert_array_equal(got, naive)


@pytest.mark.parametrize("log_n", [4, 12])
def test_ntt_roundtrip(log_n):
    n = 1 << log_n
    x = rand_elems(n)
    xm = bb.to_mont(jnp.asarray(x))
    back = np.asarray(bb.from_mont(nttmod.intt(nttmod.ntt(xm))))
    np.testing.assert_array_equal(back, x)


def test_ntt_batch_shapes():
    x = rand_elems(4 * 256).reshape(4, 256)
    xm = bb.to_mont(jnp.asarray(x))
    out = nttmod.ntt(xm)
    assert out.shape == (4, 256)
    back = np.asarray(bb.from_mont(nttmod.intt(out)))
    np.testing.assert_array_equal(back, x)


def test_interpolate_and_lde():
    # degree < n polynomial evaluated on subgroup; LDE must agree with direct
    # evaluation over the shifted larger coset.
    log_n, blowup = 4, 1
    n = 1 << log_n
    coeffs = rand_elems(n)
    w = bb.two_adic_generator(log_n)

    def poly_eval(c, xpt):
        acc = 0
        for ci in reversed(c.tolist()):
            acc = (acc * xpt + int(ci)) % bb.P
        return acc

    evals = np.array(
        [poly_eval(coeffs, pow(w, i, bb.P)) for i in range(n)], dtype=np.uint32
    )
    em = bb.to_mont(jnp.asarray(evals))
    got_c = np.asarray(bb.from_mont(nttmod.interpolate(em)))
    np.testing.assert_array_equal(got_c, coeffs)

    m = n << blowup
    wm = bb.two_adic_generator(log_n + blowup)
    g = bb.GENERATOR
    expect = np.array(
        [poly_eval(coeffs, (g * pow(wm, i, bb.P)) % bb.P) for i in range(m)],
        dtype=np.uint32,
    )
    got_lde = np.asarray(bb.from_mont(nttmod.lde(em, blowup)))
    rev = nttmod.bit_reverse_indices(m)
    np.testing.assert_array_equal(got_lde[rev], expect)


@pytest.mark.parametrize("log_n", [14])
def test_ntt_fourstep_matches_iterative(log_n):
    x = rand_elems(2 << log_n).reshape(2, 1 << log_n)
    xm = bb.to_mont(jnp.asarray(x))
    import jax

    got = np.asarray(jax.jit(nttmod.ntt_fourstep)(xm))
    want = np.asarray(nttmod.ntt(xm))
    np.testing.assert_array_equal(got, want)


def test_ntt_mxu_matches_iterative():
    from raiko_tpu.ops.ntt_mxu import ntt_mxu

    import jax

    x = rand_elems(2 << 14).reshape(2, 1 << 14)
    xm = bb.to_mont(jnp.asarray(x))
    got = np.asarray(jax.jit(ntt_mxu)(xm))
    np.testing.assert_array_equal(got, np.asarray(nttmod.ntt(xm)))


def test_ntt_pallas_fused_roundtrip():
    """Fused Pallas four-step (interpret mode on CPU) is bit-exact with the
    XLA path, forward and inverse."""
    from raiko_tpu.ops import ntt_pallas as ntp

    x = rand_elems(2 << 14).reshape(2, 1 << 14)
    xm = bb.to_mont(jnp.asarray(x))
    got = np.asarray(ntp.ntt_fused(xm))
    np.testing.assert_array_equal(got, np.asarray(nttmod.ntt_fourstep(xm)))
    back = np.asarray(ntp.intt_fused(jnp.asarray(got)))
    np.testing.assert_array_equal(back, np.asarray(xm))
