"""One-off: extract the EIP-4844 trusted setup into raiko-tpu's own format.

The Ethereum KZG ceremony output (public protocol data) ships with the
reference as a serialized blob (kzg_settings_raw.bin: an 8-byte header,
4096 bit-reversal-permuted Fr roots of unity for w = 7^((r-1)/4096), 4096
projective Lagrange-form G1 points, 65 projective G2 points; all values
Montgomery-form little-endian u64 limbs — layout determined empirically and
validated below).  This script re-derives affine standard-form integers,
validates every point against the curve equations and the polynomial
identity sum(L_i) == G1 generator (the all-ones blob commits to p(X)=1),
and writes raiko_tpu/kzg/data/trusted_setup.npz.

Run:  python tools/extract_kzg_setup.py /root/reference/kzg_settings_raw.bin
"""

from __future__ import annotations

import sys

import numpy as np

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R_CURVE = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
RINV_FP = pow((1 << 384) % P, -1, P)
RINV_FR = pow((1 << 256) % R_CURVE, -1, R_CURVE)
G1_GEN = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)

FIELD_ELEMENTS_PER_BLOB = 4096


def brp(i: int, bits: int = 12) -> int:
    return int(format(i, f"0{bits}b")[::-1], 2)


def main(path: str) -> None:
    data = open(path, "rb").read()
    assert len(data) == 8 + 4096 * 32 + 4096 * 144 + 65 * 288, len(data)

    def rd(off: int, n: int) -> int:
        return int.from_bytes(data[off : off + n], "little")

    # roots (brp order) -> verify against w = 7^((r-1)/4096)
    w = pow(7, (R_CURVE - 1) // FIELD_ELEMENTS_PER_BLOB, R_CURVE)
    roots_brp = [rd(8 + 32 * i, 32) * RINV_FR % R_CURVE for i in range(4096)]
    for i in range(4096):
        assert roots_brp[i] == pow(w, brp(i), R_CURVE), i
    print("roots ok (brp of 7^((r-1)/4096) powers)")

    def fp(off: int) -> int:
        return rd(off, 48) * RINV_FP % P

    # G1 projective -> affine
    g1off = 8 + 4096 * 32
    g1_aff = []
    for i in range(4096):
        o = g1off + 144 * i
        x, y, z = fp(o), fp(o + 48), fp(o + 96)
        assert (y * y * z - x * x * x - 4 * z * z * z) % P == 0, i
        zinv = pow(z, -1, P)
        g1_aff.append(((x * zinv) % P, (y * zinv) % P))
    print("g1 ok (4096 points on curve)")

    # polynomial identity: all-ones blob is p(X) = 1 -> commitment == G1 gen
    def ec_add(a, b):
        if a is None:
            return b
        if b is None:
            return a
        if a[0] == b[0]:
            if (a[1] + b[1]) % P == 0:
                return None
            lam = (3 * a[0] * a[0]) * pow(2 * a[1], -1, P) % P
        else:
            lam = (b[1] - a[1]) * pow(b[0] - a[0], -1, P) % P
        x3 = (lam * lam - a[0] - b[0]) % P
        return (x3, (lam * (a[0] - x3) - a[1]) % P)

    acc = None
    for pt in g1_aff:
        acc = ec_add(acc, pt)
    assert acc == G1_GEN, "sum of Lagrange points != generator"
    print("sum(L_i) == G1 generator ok")

    # G2 projective -> affine (Fp2 as (c0, c1))
    g2off = g1off + 4096 * 144
    g2_aff = []
    for i in range(65):
        o = g2off + 288 * i
        xs = (fp(o), fp(o + 48))
        ys = (fp(o + 96), fp(o + 144))
        zs = (fp(o + 192), fp(o + 240))
        # Fp2 inverse of z
        n = (zs[0] * zs[0] + zs[1] * zs[1]) % P
        ninv = pow(n, -1, P)
        zi = ((zs[0] * ninv) % P, (-zs[1] * ninv) % P)

        def m(a, b):
            return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)

        g2_aff.append((m(xs, zi), m(ys, zi)))
    print("g2 ok (65 points)")

    # serialize: integers as 48-byte big-endian rows
    def be48(v: int) -> list[int]:
        return list(v.to_bytes(48, "big"))

    g1_bytes = np.array(
        [[be48(x), be48(y)] for x, y in g1_aff], dtype=np.uint8
    )  # (4096, 2, 48)
    g2_bytes = np.array(
        [
            [[be48(x[0]), be48(x[1])], [be48(y[0]), be48(y[1])]]
            for x, y in g2_aff
        ],
        dtype=np.uint8,
    )  # (65, 2, 2, 48)
    roots_nat = np.array(
        [list(pow(w, i, R_CURVE).to_bytes(32, "big")) for i in range(4096)],
        dtype=np.uint8,
    )
    out = "raiko_tpu/kzg/data/trusted_setup.npz"
    import os

    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, g1_lagrange=g1_bytes, g2_monomial=g2_bytes, roots_natural=roots_nat
    )
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/reference/kzg_settings_raw.bin")
