"""Circuit builder + gate/call tables: the wire-bus substrate of the
recursive verifier (stark/circuit.py, stark/airs/circuit_air.py,
stark/airs/poseidon2_calls.py)."""
import pytest

pytestmark = pytest.mark.slow


import numpy as np
import pytest

from raiko_tpu.fields import babybear as bb
from raiko_tpu.fields import babybear_ext as ef
from raiko_tpu.ops import poseidon2 as p2
from raiko_tpu.stark import debug, prover, verifier
from raiko_tpu.stark.circuit import CircuitBuilder, FreeLane
from raiko_tpu.stark.airs.circuit_air import CircuitAir
from raiko_tpu.stark.airs.poseidon2_calls import Poseidon2CallsAir


def _build(with_values: bool):
    b = CircuitBuilder(with_values)
    x = b.input_base(5 if with_values else None)
    y = b.input_base(7 if with_values else None)
    z = b.mul(x, y)  # 35
    w = b.axpy(z, (3, 0, 0, 0), y)  # 35 + 21 = 56
    b.assert_eq(w, (56, 0, 0, 0))
    inv = b.inv(w)
    b.assert_eq(b.mul(w, inv), ef.H_ONE)
    bit = b.bit_input(1 if with_values else None)
    sel = b.select(bit, x, y)  # -> x = 5
    b.assert_eq(sel, (5, 0, 0, 0))
    # a swapped permutation: lanes 0..7 are wires/consts, 8..15 free
    lanes = [x, y, z, w] + [b.const_wire(i) for i in range(4)]
    lanes += [FreeLane((100 + i if with_values else None)) for i in range(8)]
    out = b.perm_call(lanes, swap=bit)
    if with_values:
        expect = p2.host_permute(
            [100 + i for i in range(8)] + [5, 7, 35, 56, 0, 1, 2, 3]
        )
        assert [o.val[0] for o in out] == expect
    # consume a couple of outputs downstream (same structure in both modes)
    s = b.add(out[0], out[1])
    s2 = b.add(out[1], out[0])
    b.assert_eq(s, s2)
    # a fully constant call folds away (no table row)
    folded = b.perm_call([(i, 0, 0, 0) for i in range(16)])
    assert isinstance(folded[0], tuple)
    assert [v[0] for v in folded] == p2.host_permute(list(range(16)))
    # chained compress using outputs directly
    out2 = b.perm_call(out, swap=None)
    b.assert_eq(out2[3], out2[3])
    return b


def test_structure_matches_witness():
    bw = _build(True)
    bs = _build(False)
    bunw = bw.finalize()
    buns = bs.finalize()
    assert np.array_equal(bunw.gate_fixed, buns.gate_fixed)
    assert np.array_equal(bunw.call_fixed, buns.call_fixed)
    assert buns.gate_trace is None and bunw.gate_trace is not None


def test_debug_constraints_hold():
    bun = _build(True).finalize()
    cair = CircuitAir(bun.gate_fixed)
    pair = Poseidon2CallsAir(bun.call_fixed)
    chal = [(3, 1, 4, 1), (5, 9, 2, 6)]
    assert debug.check_constraints(cair, bun.gate_trace, challenges=chal) == []
    assert debug.check_constraints(pair, bun.call_trace, challenges=chal) == []
    # global bus balance: the two tables cancel
    total = ef.H_ZERO
    for air, tr in ((cair, bun.gate_trace), (pair, bun.call_trace)):
        for v in air.bus_values(tr, chal):
            total = ef.h_add(total, v)
    assert total == ef.H_ZERO


def test_prove_verify_circuit_tables():
    bun = _build(True).finalize()
    cair = CircuitAir(bun.gate_fixed)
    pair = Poseidon2CallsAir(bun.call_fixed)
    proofs = prover.prove_tables(
        [(cair, bun.gate_trace, []), (pair, bun.call_trace, [])]
    )
    assert verifier.verify_tables([cair, pair], proofs)
    # a tampered wire value (the MUL output) must break the bus balance
    bad = bun.gate_trace.copy()
    row = np.nonzero(bun.gate_fixed[1])[0][0]  # first MUL gate row
    bad[row, 8] = (int(bad[row, 8]) + 1) % bb.P
    bad_proofs = prover.prove_tables(
        [(cair, bad, []), (pair, bun.call_trace, [])]
    )
    assert not verifier.verify_tables([cair, pair], bad_proofs)
