"""BLS12-381 limb fields, device curve ops, host pairing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raiko_tpu.fields.limbs import FP, FR, int_to_limbs, limbs_to_int
from raiko_tpu.kzg import curve, host_curve as hc

RNG = np.random.default_rng(11)


def _rand_int(F):
    return int.from_bytes(RNG.bytes(48), "big") % F.modulus


@pytest.mark.parametrize("F", [FP, FR], ids=["fp", "fr"])
def test_limb_field_vs_python(F):
    xs = [_rand_int(F) for _ in range(12)] + [0, 1, F.modulus - 1]
    arrs = jnp.asarray(np.stack([F.to_mont_int(v) for v in xs]))
    a, b = arrs[:-1], arrs[1:]
    av, bv = xs[:-1], xs[1:]
    got_mul = [F.from_mont_limbs(x) for x in np.asarray(jax.jit(F.mont_mul)(a, b))]
    got_add = [F.from_mont_limbs(x) for x in np.asarray(jax.jit(F.add)(a, b))]
    got_sub = [F.from_mont_limbs(x) for x in np.asarray(jax.jit(F.sub)(a, b))]
    got_neg = [F.from_mont_limbs(x) for x in np.asarray(jax.jit(F.neg)(a))]
    assert got_mul == [(x * y) % F.modulus for x, y in zip(av, bv)]
    assert got_add == [(x + y) % F.modulus for x, y in zip(av, bv)]
    assert got_sub == [(x - y) % F.modulus for x, y in zip(av, bv)]
    assert got_neg == [(-x) % F.modulus for x in av]


def test_limb_roundtrip():
    v = _rand_int(FP)
    assert limbs_to_int(int_to_limbs(v, 24)) == v


from conftest import subprocess_isolated


@subprocess_isolated
def test_device_curve_vs_host():
    ks = [1, 2, 3, 7, 123456789]
    pts = [hc.g1_mul(hc.G1_GEN, k) for k in ks]
    dev = jnp.asarray(curve.points_from_affine(pts + [None]))
    add_j = jax.jit(curve.add)
    dbl_j = jax.jit(curve.double)
    # generic add
    s = add_j(dev[0:1], dev[1:2])
    assert curve.to_affine(np.asarray(s)[0]) == hc.g1_mul(hc.G1_GEN, 3)
    # doubling via complete add (P == Q branch-free)
    s = add_j(dev[1:2], dev[1:2])
    assert curve.to_affine(np.asarray(s)[0]) == hc.g1_mul(hc.G1_GEN, 4)
    assert curve.to_affine(np.asarray(dbl_j(dev[2:3]))[0]) == hc.g1_mul(hc.G1_GEN, 6)
    # identity handling
    s = add_j(dev[5:6], dev[3:4])
    assert curve.to_affine(np.asarray(s)[0]) == pts[3]
    # inverse: G + (-G) = O
    neg = jnp.asarray(curve.points_from_affine([hc.g1_neg(hc.G1_GEN)]))
    s = add_j(dev[0:1], neg)
    assert curve.to_affine(np.asarray(s)[0]) is None


def test_host_pairing_bilinearity():
    e = hc.pairing(hc.g1_mul(hc.G1_GEN, 6), hc.G2_GEN)
    e2 = hc.pairing(hc.g1_mul(hc.G1_GEN, 2), hc.g2_mul(hc.G2_GEN, 3))
    assert e == e2
    assert hc.pairing_check(
        [(hc.G1_GEN, hc.G2_GEN), (hc.g1_neg(hc.G1_GEN), hc.G2_GEN)]
    )


def test_g1_serialization():
    pt = hc.g1_mul(hc.G1_GEN, 987654321)
    assert hc.g1_decompress(hc.g1_compress(pt)) == pt
    assert hc.g1_decompress(hc.g1_compress(None)) is None
    assert hc.g1_compress(hc.G1_GEN).hex().startswith("97f1d3a7")
    with pytest.raises(AssertionError):
        hc.g1_decompress(bytes([0x80] + [1] * 47))  # not on curve x
