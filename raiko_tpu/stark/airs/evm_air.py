"""EVM execution-trace AIRs: the zkEVM statement core.

Proves that a frame of EVM bytecode EXECUTES correctly: "program `code`,
started with environment `env`, stack pointer 0 and `gas0` gas, runs to a
STOP halt with final stack pointer `sp_f` and `gas_f` gas left" — the
TPU-native replacement for the execution proof the reference delegates to
its vendored zkVMs (risc0/sp1 guests re-running `calculate_block_header`,
provers/risc0/guest/src/main.rs:15-29; SURVEY.md §2.2), built the
multi-table way those provers' "interactions" work rather than as one
monolithic machine.

Three tables over a shared LogUp bus (prover.prove_tables):

  EvmCpuAir      one row per executed step.  256-bit words live as bit
                 columns; per-opcode semantics (adder gadget, bitwise,
                 comparisons, nonzero gadget, stack-motion, gas metering,
                 pc control flow) are flag-gated block constraints.
  EvmProgramAir  the program ROM: one row per instruction (pc, opcode,
                 push immediate), COMMITTED FIXED columns derived from
                 the public bytecode; a witness multiplicity column
                 counts visits.
  EvmStackAir    the read-write-memory argument for the stack: accesses
                 sorted by (address, sub-clock), read-after-write value
                 consistency, first-access-must-write.

Bus channels (challenge 0 = chi, the tuple-code geometric challenge):

  channel 0 (gamma_F, challenge 1): instruction fetches.  The ROM sends
      code(pc, op, imm) = pc + op*chi + sum_j imm_byte_j * chi^{j+3}
      with multiplicity = visit count; every non-halted CPU row receives
      its (pc, op, f_push*pushed-word) tuple — so opcodes and push
      immediates are exactly the public program's, and pc can never
      point into push data (no ROM row exists there).
  channel 1 (gamma_S, challenge 2): stack accesses.  The CPU sends up to
      four per row (R0/R1 reads, W0/W1 writes) as
      code(addr, clk4, iw, value) = addr + clk4*chi + iw*chi^2
                                    + sum_j value_byte_j * chi^{j+3},
      clk4 = 4*clk + slot (reads order before writes within a step);
      the stack table receives each access once.

Soundness of the covered-opcode restriction: a CPU row's committed flag
one-hot must rebuild the fetched opcode byte from covered bases only
(op = sum flag*base + family flag*n with n range-checked), so a trace
touching any uncovered opcode is unsatisfiable rather than silently
wrong.  Out-of-gas wraps the 32-bit-range-checked gas register mod p and
is likewise unsatisfiable; stack under/overflow produces a slot address
outside the stack table's 11-bit range and breaks the channel balance.

Covered: STOP, ADD, SUB, LT/GT/SLT/SGT, EQ, ISZERO, AND/OR/XOR/NOT,
POP, PUSH0-32, DUP1-16, SWAP1-16, JUMP/JUMPI/PC/GAS/JUMPDEST, and the
constant-push environment opcodes (ADDRESS..BLOBBASEFEE below).  MUL /
memory / storage / KECCAK256 / calls are the documented roadmap; frames
using them are reported uncovered, never mis-proven.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ...fields import babybear as bb
from ...fields import babybear_ext as ef
from ..air import Air, ConstraintBuilder

# --------------------------------------------------------------------------
# opcode tables
# --------------------------------------------------------------------------

# name -> (opbyte, static gas, pops, pushes)
SIMPLE_OPS = {
    "stop": (0x00, 0, 0, 0),
    "add": (0x01, 3, 2, 1),
    "sub": (0x03, 3, 2, 1),
    "lt": (0x10, 3, 2, 1),
    "gt": (0x11, 3, 2, 1),
    "slt": (0x12, 3, 2, 1),
    "sgt": (0x13, 3, 2, 1),
    "eq": (0x14, 3, 2, 1),
    "iszero": (0x15, 3, 1, 1),
    "and": (0x16, 3, 2, 1),
    "or": (0x17, 3, 2, 1),
    "xor": (0x18, 3, 2, 1),
    "not": (0x19, 3, 1, 1),
    "pop": (0x50, 2, 1, 0),
    "jump": (0x56, 8, 1, 0),
    "jumpi": (0x57, 10, 2, 0),
    "pc": (0x58, 2, 0, 1),
    "gas": (0x5A, 2, 0, 1),
    "jumpdest": (0x5B, 1, 0, 0),
    "push0": (0x5F, 2, 0, 1),
}

# constant-push environment opcodes: name -> opbyte (gas 2, 0 pops, 1 push)
ENV_OPS = {
    "address": 0x30,
    "origin": 0x32,
    "caller": 0x33,
    "callvalue": 0x34,
    "calldatasize": 0x36,
    "codesize": 0x38,
    "gasprice": 0x3A,
    "coinbase": 0x41,
    "timestamp": 0x42,
    "number": 0x43,
    "prevrandao": 0x44,
    "gaslimit": 0x45,
    "chainid": 0x46,
    "basefee": 0x48,
    "blobbasefee": 0x4A,
}

# families: op = base + n (n = 1..cap); gas 3 each
FAMILIES = {"push": (0x5F, 32, 3), "dup": (0x7F, 16, 3), "swap": (0x8F, 16, 3)}

FLAG_NAMES = list(SIMPLE_OPS) + list(ENV_OPS) + list(FAMILIES)
NF = len(FLAG_NAMES)
FLAG_IDX = {n: i for i, n in enumerate(FLAG_NAMES)}

COVERED_OPBYTES = frozenset(
    [v[0] for v in SIMPLE_OPS.values()]
    + list(ENV_OPS.values())
    + [base + n for base, cap, _ in FAMILIES.values() for n in range(1, cap + 1)]
)

# sp delta per flag
_ARITH2 = ("add", "sub", "lt", "gt", "slt", "sgt", "eq", "and", "or", "xor")
_CMP = ("lt", "gt", "slt", "sgt")


def _sp_delta(name: str) -> int:
    if name in _ARITH2:
        return -1
    if name in ("iszero", "not", "swap", "jumpdest", "stop"):
        return 0
    if name in ("pop", "jump"):
        return -1
    if name == "jumpi":
        return -2
    return 1  # push/push0/dup/pc/gas/env


def _gas_cost(name: str) -> int:
    if name in SIMPLE_OPS:
        return SIMPLE_OPS[name][1]
    if name in ENV_OPS:
        return 2
    return FAMILIES[name][2]


# --------------------------------------------------------------------------
# CPU column layout
# --------------------------------------------------------------------------

PC = 0
OP = 1
CLK = 2
HALTED = 3
TAKEN = 4
S_INV = 5
FLAG0 = 6
FAMB0 = FLAG0 + NF  # 5 bits: fam_n - 1
SPB0 = FAMB0 + 5  # 10 bits
SP_TOP = SPB0 + 10  # sp == 1024 indicator
GASB0 = SP_TOP + 1  # 32 bits
CARRY0 = GASB0 + 32  # 16 adder carries
NZ0 = CARRY0 + 16  # 16 nonzero-gadget indicators
INV0 = NZ0 + 16  # 16 nonzero-gadget inverses
A0 = INV0 + 16  # word A: 256 bits (little-endian)
B0 = A0 + 256
C0 = B0 + 256
W0 = C0 + 256
CPU_WIDTH = W0 + 256

# aux layout: fetch accumulator + 4 slot accumulators (EF x4 each)
AUX_F = 0
AUX_SLOT0 = 4
CPU_AUX_W = 4 + 4 * 4

CHAL_CHI = 0
CHAL_F = 1
CHAL_S = 2
NUM_CHALLENGES = 3
BUS_FETCH = 0
BUS_STACK = 1

# publics layout
PUB_GAS0 = 0  # lo, hi
PUB_GASF = 2  # lo, hi
PUB_SPF = 4
PUB_ENV0 = 5  # 16 limbs per env op, ENV_OPS order
NUM_PUBLICS = PUB_ENV0 + 16 * len(ENV_OPS)

MAX_STEPS_LOG = 20  # clk4 = 4*clk + slot < 2^22

# limb i of a 256-bit word = sum_b 2^b * bit[16i + b]  (16 x 256 linmap)
_LIMB_MAT = [[0] * 256 for _ in range(16)]
for _i in range(16):
    for _b in range(16):
        _LIMB_MAT[_i][16 * _i + _b] = 1 << _b


def _fetch_code_host(pc: int, op: int, imm_bytes: bytes, chi: tuple) -> tuple:
    """pc + op*chi + sum_j imm_j * chi^{j+3} (32 imm bytes)."""
    acc = ef.h_add(ef.h_from_base(pc), ef.h_mul(ef.h_from_base(op), chi))
    p = ef.h_mul(ef.h_mul(chi, chi), chi)
    for j in range(32):
        byt = imm_bytes[j] if j < len(imm_bytes) else 0
        if byt:
            acc = ef.h_add(acc, ef.h_mul(ef.h_from_base(byt), p))
        p = ef.h_mul(p, chi)
    return acc


def _slot_code_host(addr: int, clk4: int, iw: int, value: int, chi: tuple) -> tuple:
    """addr + clk4*chi + iw*chi^2 + sum_j value_byte_j * chi^{j+3}."""
    acc = ef.h_add(ef.h_from_base(addr), ef.h_mul(ef.h_from_base(clk4), chi))
    chi2 = ef.h_mul(chi, chi)
    if iw:
        acc = ef.h_add(acc, chi2)
    p = ef.h_mul(chi2, chi)
    for j in range(32):
        byt = (value >> (8 * j)) & 0xFF
        if byt:
            acc = ef.h_add(acc, ef.h_mul(ef.h_from_base(byt), p))
        p = ef.h_mul(p, chi)
    return acc


# --------------------------------------------------------------------------
# frame executor (trace generation)
# --------------------------------------------------------------------------


class UncoveredFrame(Exception):
    """Frame uses an opcode / behavior outside the covered statement."""


@dataclass
class FrameEnv:
    """Environment-opcode constants of one frame (ENV_OPS order)."""

    address: int = 0
    origin: int = 0
    caller: int = 0
    callvalue: int = 0
    calldatasize: int = 0
    codesize: int = 0
    gasprice: int = 0
    coinbase: int = 0
    timestamp: int = 0
    number: int = 0
    prevrandao: int = 0
    gaslimit: int = 30_000_000
    chainid: int = 1
    basefee: int = 0
    blobbasefee: int = 1

    def words(self) -> list[int]:
        return [getattr(self, name) for name in ENV_OPS]


@dataclass
class _Step:
    pc: int
    op: int
    name: str
    fam_n: int
    gas_before: int
    sp_before: int
    a: int = 0
    b: int = 0
    c: int = 0
    w: int = 0
    carries: list = field(default_factory=lambda: [0] * 16)
    nz: list = field(default_factory=lambda: [0] * 16)
    inv: list = field(default_factory=lambda: [0] * 16)
    s_inv: int = 0
    taken: int = 0
    accesses: list = field(default_factory=list)  # (slot, addr, iw, value)


@dataclass
class FrameTrace:
    code: bytes
    env: FrameEnv
    gas0: int
    steps: list
    gas_f: int
    sp_f: int
    visit_counts: dict  # pc -> count

    @property
    def accesses(self):
        out = []
        for clk, st in enumerate(self.steps):
            for slot, addr, iw, value in st.accesses:
                out.append((addr, 4 * clk + slot, iw, value))
        return out


_M256 = (1 << 256) - 1
_SGN = 1 << 255


def _flip(v: int) -> int:
    return v ^ _SGN


def _nonzero_witness(limbs: list[int]) -> tuple[list, list, int, int]:
    nz, inv = [], []
    for x in limbs:
        if x % bb.P == 0:
            nz.append(0)
            inv.append(0)
        else:
            nz.append(1)
            inv.append(pow(x % bb.P, bb.P - 2, bb.P))
    s = sum(nz)
    s_inv = pow(s, bb.P - 2, bb.P) if s else 0
    taken = 1 if s else 0
    return nz, inv, s_inv, taken


def _add_carries(x: int, y: int) -> list[int]:
    carries = []
    c = 0
    for i in range(16):
        t = ((x >> (16 * i)) & 0xFFFF) + ((y >> (16 * i)) & 0xFFFF) + c
        c = t >> 16
        carries.append(c)
    return carries


def execute_frame(
    code: bytes, env: FrameEnv, gas: int, max_steps: int = 1 << MAX_STEPS_LOG
) -> FrameTrace:
    """Run the covered-subset stack machine, recording the full witness.

    Semantics mirror evm/interpreter.py exactly for the covered opcodes
    (same gas costs, same stack discipline); anything outside raises
    UncoveredFrame.  Running off the end of code is a virtual STOP
    (interpreter loop exit, interpreter.py:244/706)."""
    assert 0 <= gas < 1 << 32, "frame gas must fit the 32-bit gas register"
    env = env if env.codesize else FrameEnv(**{**env.__dict__, "codesize": len(code)})
    jumpdests = set()
    i = 0
    while i < len(code):
        if code[i] == 0x5B:
            jumpdests.add(i)
        if 0x60 <= code[i] <= 0x7F:
            i += code[i] - 0x5F
        i += 1
    env_by_op = {opb: (name, env.words()[i]) for i, (name, opb) in enumerate(ENV_OPS.items())}

    steps: list[_Step] = []
    stack: list[int] = []
    pc = 0
    gas_left = gas
    visit: dict[int, int] = {}

    def use(n):
        nonlocal gas_left
        gas_left -= n
        if gas_left < 0:
            raise UncoveredFrame("out of gas")

    while True:
        if len(steps) >= max_steps:
            raise UncoveredFrame("step budget exceeded")
        op = code[pc] if pc < len(code) else 0x00  # virtual STOP
        if op not in COVERED_OPBYTES:
            raise UncoveredFrame(f"opcode 0x{op:02x} not covered")
        visit[pc] = visit.get(pc, 0) + 1
        st = _Step(pc=pc, op=op, name="", fam_n=0, gas_before=gas_left,
                   sp_before=len(stack))
        steps.append(st)
        sp = len(stack)

        def pop2():
            if sp < 2:
                raise UncoveredFrame("stack underflow")
            a, b_ = stack.pop(), stack.pop()
            st.accesses.append((0, sp - 1, 0, a))
            st.accesses.append((1, sp - 2, 0, b_))
            return a, b_

        def pop1():
            if sp < 1:
                raise UncoveredFrame("stack underflow")
            a = stack.pop()
            st.accesses.append((0, sp - 1, 0, a))
            return a

        def push(v, at):
            if len(stack) >= 1024:
                raise UncoveredFrame("stack overflow")
            stack.append(v & _M256)
            st.c = v & _M256
            st.accesses.append((2, at, 1, v & _M256))

        if op == 0x00:
            st.name = "stop"
            use(0)
            break
        elif op == 0x01:
            st.name = "add"
            a, b_ = pop2()
            use(3)
            st.a, st.b = a, b_
            st.carries = _add_carries(a, b_)
            push(a + b_, sp - 2)
        elif op == 0x03:
            st.name = "sub"
            a, b_ = pop2()
            use(3)
            st.a, st.b = a, b_
            c = (a - b_) & _M256
            st.carries = _add_carries(b_, c)
            push(c, sp - 2)
        elif op in (0x10, 0x11, 0x12, 0x13):
            st.name = {0x10: "lt", 0x11: "gt", 0x12: "slt", 0x13: "sgt"}[op]
            a, b_ = pop2()
            use(3)
            st.a, st.b = a, b_
            af, bf = (_flip(a), _flip(b_)) if op in (0x12, 0x13) else (a, b_)
            if op in (0x10, 0x12):  # lt: B + W = A + k*2^256
                st.w = (af - bf) & _M256
                st.carries = _add_carries(bf, st.w)
            else:  # gt
                st.w = (bf - af) & _M256
                st.carries = _add_carries(af, st.w)
            push(st.carries[15], sp - 2)
        elif op == 0x14:
            st.name = "eq"
            a, b_ = pop2()
            use(3)
            st.a, st.b = a, b_
            limbs = [
                (((a >> (16 * i)) & 0xFFFF) - ((b_ >> (16 * i)) & 0xFFFF)) % bb.P
                for i in range(16)
            ]
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(limbs)
            push(1 - st.taken, sp - 2)
        elif op == 0x15:
            st.name = "iszero"
            a = pop1()
            use(3)
            st.a = a
            limbs = [(a >> (16 * i)) & 0xFFFF for i in range(16)]
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(limbs)
            push(1 - st.taken, sp - 1)
        elif op in (0x16, 0x17, 0x18):
            st.name = {0x16: "and", 0x17: "or", 0x18: "xor"}[op]
            a, b_ = pop2()
            use(3)
            st.a, st.b = a, b_
            c = a & b_ if op == 0x16 else (a | b_ if op == 0x17 else a ^ b_)
            push(c, sp - 2)
        elif op == 0x19:
            st.name = "not"
            a = pop1()
            use(3)
            st.a = a
            push(_M256 ^ a, sp - 1)
        elif op == 0x50:
            st.name = "pop"
            a = pop1()
            use(2)
            st.a = a
        elif op == 0x56:
            st.name = "jump"
            use(8)
            dest = pop1()
            st.a = dest
            if dest not in jumpdests:
                raise UncoveredFrame("bad jump")
            pc = dest
            continue
        elif op == 0x57:
            st.name = "jumpi"
            use(10)
            dest, cond = pop2()
            st.a, st.b = dest, cond
            limbs = [(cond >> (16 * i)) & 0xFFFF for i in range(16)]
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(limbs)
            if cond:
                if dest not in jumpdests:
                    raise UncoveredFrame("bad jump")
                pc = dest
                continue
        elif op == 0x58:
            st.name = "pc"
            use(2)
            push(pc, sp)
        elif op == 0x5A:
            st.name = "gas"
            use(2)
            push(gas_left, sp)
        elif op == 0x5B:
            st.name = "jumpdest"
            use(1)
        elif op == 0x5F:
            st.name = "push0"
            use(2)
            push(0, sp)
        elif 0x60 <= op <= 0x7F:
            st.name = "push"
            st.fam_n = op - 0x5F
            use(3)
            v = int.from_bytes(code[pc + 1 : pc + 1 + st.fam_n], "big")
            push(v, sp)
            pc += 1 + st.fam_n
            continue
        elif 0x80 <= op <= 0x8F:
            st.name = "dup"
            st.fam_n = op - 0x7F
            if sp < st.fam_n:
                raise UncoveredFrame("stack underflow")
            use(3)
            v = stack[-st.fam_n]
            st.a = v
            st.accesses.append((0, sp - st.fam_n, 0, v))
            push(v, sp)
        elif 0x90 <= op <= 0x9F:
            st.name = "swap"
            st.fam_n = op - 0x8F
            if sp < st.fam_n + 1:
                raise UncoveredFrame("stack underflow")
            use(3)
            a, b_ = stack[-1], stack[-1 - st.fam_n]
            st.a, st.b = a, b_
            stack[-1], stack[-1 - st.fam_n] = b_, a
            st.accesses.append((0, sp - 1, 0, a))
            st.accesses.append((1, sp - 1 - st.fam_n, 0, b_))
            st.accesses.append((2, sp - 1, 1, b_))
            st.accesses.append((3, sp - 1 - st.fam_n, 1, a))
        elif op in env_by_op:
            st.name, v = env_by_op[op]
            use(2)
            push(v, sp)
        else:  # pragma: no cover — COVERED_OPBYTES gate above
            raise UncoveredFrame(f"opcode 0x{op:02x} not covered")
        pc += 1

    return FrameTrace(
        code=code,
        env=env,
        gas0=gas,
        steps=steps,
        gas_f=gas_left,
        sp_f=len(stack),
        visit_counts=visit,
    )


# --------------------------------------------------------------------------
# trace building (numpy)
# --------------------------------------------------------------------------


def _word_bits(v: int) -> np.ndarray:
    out = np.zeros(256, dtype=np.uint32)
    for k in range(256):
        if (v >> k) & 1:
            out[k] = 1
    return out


def _pow2_atleast(k: int, floor: int = 32) -> int:
    n = floor
    while n < k:
        n <<= 1
    return n


def build_cpu_trace(ft: FrameTrace) -> tuple[np.ndarray, list[int]]:
    """(n, CPU_WIDTH) main trace + the publics vector."""
    steps = ft.steps
    n = _pow2_atleast(len(steps) + 1)
    tr = np.zeros((n, CPU_WIDTH), dtype=np.uint32)
    for clk, st in enumerate(steps):
        row = tr[clk]
        row[PC] = st.pc
        row[OP] = st.op
        row[CLK] = clk
        row[TAKEN] = st.taken
        row[S_INV] = st.s_inv
        row[FLAG0 + FLAG_IDX[st.name]] = 1
        if st.fam_n:
            for i in range(5):
                row[FAMB0 + i] = (st.fam_n - 1 >> i) & 1
        sp = st.sp_before
        if sp == 1024:
            row[SP_TOP] = 1
        else:
            for i in range(10):
                row[SPB0 + i] = (sp >> i) & 1
        for i in range(32):
            row[GASB0 + i] = (st.gas_before >> i) & 1
        for i in range(16):
            row[CARRY0 + i] = st.carries[i]
            row[NZ0 + i] = st.nz[i]
            row[INV0 + i] = st.inv[i]
        row[A0 : A0 + 256] = _word_bits(st.a)
        row[B0 : B0 + 256] = _word_bits(st.b)
        row[C0 : C0 + 256] = _word_bits(st.c)
        row[W0 : W0 + 256] = _word_bits(st.w)
    # halted padding: pc/sp/gas hold, flags clear, op = 0
    last_pc = steps[-1].pc if steps else 0
    for r in range(len(steps), n):
        row = tr[r]
        row[PC] = last_pc
        row[CLK] = r
        row[HALTED] = 1
        sp = ft.sp_f
        if sp == 1024:
            row[SP_TOP] = 1
        else:
            for i in range(10):
                row[SPB0 + i] = (sp >> i) & 1
        for i in range(32):
            row[GASB0 + i] = (ft.gas_f >> i) & 1
    publics = [
        ft.gas0 & 0xFFFF,
        ft.gas0 >> 16,
        ft.gas_f & 0xFFFF,
        ft.gas_f >> 16,
        ft.sp_f,
    ]
    for w in ft.env.words():
        publics.extend((w >> (16 * i)) & 0xFFFF for i in range(16))
    return tr, publics


def _bits_to_bytes(bits: np.ndarray) -> np.ndarray:
    """(n, 256) bit columns -> (n, 32) little-endian bytes."""
    w = np.array([1 << b for b in range(8)], dtype=np.uint64)
    return bits.reshape(bits.shape[0], 32, 8).astype(np.uint64) @ w


_PU = np.uint64(bb.P)


def _np_chi_pows(chi: tuple, upto: int) -> list[np.ndarray]:
    """[chi^0 .. chi^upto] as (4,) uint64 arrays."""
    pows = [np.array(ef.H_ONE, dtype=np.uint64)]
    c = np.array([x % bb.P for x in chi], dtype=np.uint64)
    for _ in range(upto):
        pows.append(ef.npef_mul(pows[-1], c))
    return pows


def _np_tuple_code(
    base: np.ndarray, weighted: list[tuple[np.ndarray, int]], pows
) -> np.ndarray:
    """base + sum_k val_k * chi^{e_k} over (n,) uint64 value arrays."""
    acc = ef.npef_from_base(base)
    for vals, e in weighted:
        acc = ef.npef_add(acc, ef.npef_mul(ef.npef_from_base(vals), pows[e]))
    return acc


class EvmCpuAir(Air):
    """One row per EVM step (see module docstring for the statement)."""

    width = CPU_WIDTH
    aux_width = CPU_AUX_W
    num_aux_challenges = NUM_CHALLENGES
    num_bus_values = 2
    quotient_chunks = 2

    # ---------------- host-side channel terms (aux / bus) ----------------
    def _cols(self, trace: np.ndarray):
        t = trace.astype(np.uint64)
        flags = {nm: t[:, FLAG0 + i] for i, nm in enumerate(FLAG_NAMES)}
        fam_n = 1 + sum(t[:, FAMB0 + i] << np.uint64(i) for i in range(5))
        sp = (
            sum(t[:, SPB0 + i] << np.uint64(i) for i in range(10))
            + t[:, SP_TOP] * np.uint64(1024)
        )
        return t, flags, fam_n, sp

    def _channel_terms(self, trace: np.ndarray, challenges):
        chi, gamma_f, gamma_s = challenges[:NUM_CHALLENGES]
        pows = _np_chi_pows(chi, 36)
        t, flags, fam_n, sp = self._cols(trace)
        n = trace.shape[0]
        clk = t[:, CLK]
        halted = t[:, HALTED]
        bytesA = _bits_to_bytes(trace[:, A0 : A0 + 256])
        bytesB = _bits_to_bytes(trace[:, B0 : B0 + 256])
        bytesC = _bits_to_bytes(trace[:, C0 : C0 + 256])
        gf = np.array([x % bb.P for x in gamma_f], dtype=np.uint64)
        gs = np.array([x % bb.P for x in gamma_s], dtype=np.uint64)
        # fetch receives
        imm = bytesC * flags["push"][:, None]
        code_f = _np_tuple_code(
            t[:, PC],
            [(t[:, OP], 1)] + [(imm[:, j], j + 3) for j in range(32)],
            pows,
        )
        inv_f = ef.npef_inv(ef.npef_sub(gf[None, :], code_f))
        num_f = (_PU - np.uint64(1)) * (1 - halted) % _PU  # -(1-halted)
        fetch_terms = ef.npef_mul(ef.npef_from_base(num_f), inv_f)
        # stack sends
        arith2 = sum(flags[nm] for nm in _ARITH2)
        pops_w0 = 2 * arith2 + flags["iszero"] + flags["not"] + flags["swap"]
        env_sum = sum(flags[nm] for nm in ENV_OPS)
        active = [
            arith2
            + flags["iszero"] + flags["not"] + flags["pop"]
            + flags["jump"] + flags["jumpi"] + flags["dup"] + flags["swap"],
            arith2 + flags["jumpi"] + flags["swap"],
            arith2
            + flags["iszero"] + flags["not"] + flags["push0"] + flags["push"]
            + flags["dup"] + flags["swap"] + flags["pc"] + flags["gas"]
            + env_sum,
            flags["swap"],
        ]
        addr = [
            (sp + _PU - 1 - flags["dup"] * (fam_n - 1)) % _PU,
            (sp + 2 * _PU - 2 - flags["swap"] * (fam_n - 1)) % _PU,
            (sp + _PU * 2 - pops_w0) % _PU,
            (sp + _PU - 1 - flags["swap"] * fam_n) % _PU,
        ]
        w0_bytes = np.where(flags["swap"][:, None] == 1, bytesB, bytesC)
        vbytes = [bytesA, bytesB, w0_bytes, bytesA]
        slot_terms = []
        for s in range(4):
            code = _np_tuple_code(
                addr[s],
                [(4 * clk + s, 1), (np.full(n, s >= 2, dtype=np.uint64), 2)]
                + [(vbytes[s][:, j], j + 3) for j in range(32)],
                pows,
            )
            inv = ef.npef_inv(ef.npef_sub(gs[None, :], code))
            slot_terms.append(ef.npef_mul(ef.npef_from_base(active[s] % _PU), inv))
        return fetch_terms, slot_terms

    @staticmethod
    def _excl_prefix(terms: np.ndarray) -> np.ndarray:
        c = np.cumsum(terms, axis=0) % _PU
        return ef.npef_sub(c, terms)  # plain uint64 subtract would wrap

    def aux_trace(self, trace: np.ndarray, challenges) -> np.ndarray:
        fetch_terms, slot_terms = self._channel_terms(trace, challenges)
        aux = np.zeros((trace.shape[0], CPU_AUX_W), dtype=np.uint32)
        aux[:, AUX_F : AUX_F + 4] = self._excl_prefix(fetch_terms)
        for s in range(4):
            aux[:, AUX_SLOT0 + 4 * s : AUX_SLOT0 + 4 * s + 4] = self._excl_prefix(
                slot_terms[s]
            )
        return aux

    def bus_values(self, trace: np.ndarray, challenges) -> list[tuple]:
        fetch_terms, slot_terms = self._channel_terms(trace, challenges)
        # the last row is always halted padding: its own terms vanish
        fetch = tuple(int(v) for v in fetch_terms.sum(axis=0) % _PU)
        stack = ef.H_ZERO
        for st in slot_terms:
            stack = ef.h_add(stack, tuple(int(v) for v in st.sum(axis=0) % _PU))
        return [fetch, stack]

    # ------------------------------- constraints -------------------------
    def eval(self, b: ConstraintBuilder) -> None:  # noqa: C901
        one = b.constant(1)
        chi = b.challenge_ef(CHAL_CHI)
        chi2 = b.ef_mul4(chi, chi)
        g_f = b.challenge_ef(CHAL_F)
        g_s = b.challenge_ef(CHAL_S)

        pc = b.local(PC)
        pc_n = b.next(PC)
        op = b.local(OP)
        op_n = b.next(OP)
        clk = b.local(CLK)
        clk_n = b.next(CLK)
        halted = b.local(HALTED)
        halted_n = b.next(HALTED)
        taken = b.local(TAKEN)
        s_inv = b.local(S_INV)
        f = {nm: b.local(FLAG0 + i) for i, nm in enumerate(FLAG_NAMES)}

        def fsum(names):
            acc = None
            for nm in names:
                acc = f[nm] if acc is None else b.add(acc, f[nm])
            return acc

        fam_n = one
        for i in range(5):
            fam_n = b.add(fam_n, b.scale(1 << i, b.local(FAMB0 + i)))

        def sp_expr(nx: bool):
            g = b.next if nx else b.local
            acc = b.scale(1024, g(SP_TOP))
            for i in range(10):
                acc = b.add(acc, b.scale(1 << i, g(SPB0 + i)))
            return acc

        def gas_expr(nx: bool, bits: range, shift: int):
            g = b.next if nx else b.local
            acc = None
            for i in bits:
                t = b.scale(1 << (i - shift), g(GASB0 + i))
                acc = t if acc is None else b.add(acc, t)
            return acc

        sp = sp_expr(False)
        sp_n = sp_expr(True)
        G = gas_expr(False, range(32), 0)
        G_n = gas_expr(True, range(32), 0)
        Gn_lo = gas_expr(True, range(16), 0)
        Gn_hi = gas_expr(True, range(16, 32), 16)

        carries = [b.local(CARRY0 + i) for i in range(16)]
        nz = [b.local(NZ0 + i) for i in range(16)]
        inv = [b.local(INV0 + i) for i in range(16)]

        Ablk = b.local_block(range(A0, A0 + 256))
        Bblk = b.local_block(range(B0, B0 + 256))
        Cblk = b.local_block(range(C0, C0 + 256))
        Wblk = b.local_block(range(W0, W0 + 256))
        lA = b.linmap(_LIMB_MAT, Ablk)
        lB = b.linmap(_LIMB_MAT, Bblk)
        lC = b.linmap(_LIMB_MAT, Cblk)
        lW = b.linmap(_LIMB_MAT, Wblk)

        # 1. booleanity (bit columns + flags + state bits)
        bit_cols = (
            [HALTED, TAKEN]
            + [FLAG0 + i for i in range(NF)]
            + [FAMB0 + i for i in range(5)]
            + [SPB0 + i for i in range(10)]
            + [SP_TOP]
            + [GASB0 + i for i in range(32)]
            + [CARRY0 + i for i in range(16)]
            + [NZ0 + i for i in range(16)]
            + list(range(A0, A0 + 1024))
        )
        bits = b.local_block(bit_cols)
        b.all_rows_block(b.mul(bits, b.sub(bits, one)), len(bit_cols))

        # 2. exactly one flag on live rows; none when halted
        b.all_rows(b.sub(fsum(FLAG_NAMES), b.sub(one, halted)))

        # 3. opcode byte reconstruction from covered bases only
        op_expr = None
        for nm, (byte, _, _, _) in SIMPLE_OPS.items():
            term = b.scale(byte, f[nm]) if byte else None
            if term is not None:
                op_expr = term if op_expr is None else b.add(op_expr, term)
        for nm, byte in ENV_OPS.items():
            op_expr = b.add(op_expr, b.scale(byte, f[nm]))
        for nm, (base, _, _) in FAMILIES.items():
            op_expr = b.add(op_expr, b.scale(base, f[nm]))
        fam_f = fsum(FAMILIES)
        op_expr = b.add(op_expr, b.mul(fam_f, fam_n))
        b.all_rows(b.sub(op, op_expr))
        # dup/swap n <= 16
        b.all_rows(b.mul(b.add(f["dup"], f["swap"]), b.local(FAMB0 + 4)))

        # 4. halting discipline
        b.first_row(halted)
        b.transition(b.sub(b.sub(halted_n, halted), f["stop"]))
        b.last_row(b.sub(halted, one))

        # 5. clock
        b.first_row(clk)
        b.transition(b.sub(clk_n, b.add(clk, one)))

        # 6. program counter
        b.first_row(pc)
        dest = lA[0]
        seq = b.sub(
            b.sub(b.sub(b.sub(one, halted), f["stop"]), f["jump"]), f["jumpi"]
        )
        adv = b.add(seq, b.mul(f["push"], fam_n))
        jmp = b.mul(f["jump"], b.sub(dest, pc))
        jmpi = b.mul(
            f["jumpi"],
            b.add(b.mul(taken, b.sub(dest, pc)), b.sub(one, taken)),
        )
        b.transition(b.sub(pc_n, b.add(b.add(pc, adv), b.add(jmp, jmpi))))
        # jump targets must fetch a JUMPDEST
        b.transition(b.mul(f["jump"], b.sub(op_n, b.constant(0x5B))))
        b.transition(b.mul(b.mul(f["jumpi"], taken), b.sub(op_n, b.constant(0x5B))))
        # dest < 2^15
        jsel = b.add(f["jump"], b.mul(f["jumpi"], taken))
        desthi = b.local_block(range(A0 + 15, A0 + 256))
        b.all_rows_block(b.mul(jsel, desthi), 241)

        # 7. stack pointer
        b.first_row(sp)
        b.all_rows(b.mul(b.local(SP_TOP), b.sub(sp, b.constant(1024))))
        delta = None
        for nm in FLAG_NAMES:
            d = _sp_delta(nm)
            if d == 0:
                continue
            term = b.scale(d % bb.P, f[nm])
            delta = term if delta is None else b.add(delta, term)
        b.transition(b.sub(sp_n, b.add(sp, delta)))
        b.last_row(b.sub(sp, b.public(PUB_SPF)))

        # 8. gas metering
        g0 = b.add(b.public(PUB_GAS0), b.scale(1 << 16, b.public(PUB_GAS0 + 1)))
        gf_pub = b.add(b.public(PUB_GASF), b.scale(1 << 16, b.public(PUB_GASF + 1)))
        b.first_row(b.sub(G, g0))
        b.last_row(b.sub(G, gf_pub))
        cost = None
        for nm in FLAG_NAMES:
            c = _gas_cost(nm)
            if c == 0:
                continue
            term = b.scale(c, f[nm])
            cost = term if cost is None else b.add(cost, term)
        b.transition(b.sub(G_n, b.sub(G, cost)))

        # 9. the shared 256-bit adder gadget: X + Y = Z + carry-out*2^256
        def flip_limb(l15, msb):
            # top limb with the sign bit inverted: l + 2^15 - 2^16*msb
            return b.sub(b.add(l15, b.constant(1 << 15)), b.scale(1 << 16, msb))

        a_msb = b.local(A0 + 255)
        b_msb = b.local(B0 + 255)
        lAf15 = flip_limb(lA[15], a_msb)
        lBf15 = flip_limb(lB[15], b_msb)
        cmp_f = fsum(_CMP)
        for i in range(16):
            ai, bi, ci, wi = lA[i], lB[i], lC[i], lW[i]
            afi = lAf15 if i == 15 else ai
            bfi = lBf15 if i == 15 else bi
            X = b.add(
                b.add(b.mul(f["add"], ai), b.mul(b.add(f["sub"], f["lt"]), bi)),
                b.add(
                    b.mul(f["gt"], ai),
                    b.add(b.mul(f["slt"], bfi), b.mul(f["sgt"], afi)),
                ),
            )
            Y = b.add(
                b.add(b.mul(f["add"], bi), b.mul(f["sub"], ci)),
                b.mul(cmp_f, wi),
            )
            Z = b.add(
                b.add(b.mul(f["add"], ci), b.mul(b.add(f["sub"], f["lt"]), ai)),
                b.add(
                    b.mul(f["gt"], bi),
                    b.add(b.mul(f["slt"], afi), b.mul(f["sgt"], bfi)),
                ),
            )
            lhs = b.add(X, Y)
            if i > 0:
                lhs = b.add(lhs, carries[i - 1])
            b.all_rows(b.sub(lhs, b.add(Z, b.scale(1 << 16, carries[i]))))

        # 10. nonzero gadget (EQ / ISZERO / JUMPI condition)
        s_acc = None
        for i in range(16):
            inp = b.add(
                b.mul(f["eq"], b.sub(lA[i], lB[i])),
                b.add(b.mul(f["iszero"], lA[i]), b.mul(f["jumpi"], lB[i])),
            )
            b.all_rows(b.sub(nz[i], b.mul(inp, inv[i])))
            b.all_rows(b.mul(inp, b.sub(one, nz[i])))
            s_acc = nz[i] if s_acc is None else b.add(s_acc, nz[i])
        b.all_rows(b.sub(taken, b.mul(s_acc, s_inv)))
        b.all_rows(b.mul(s_acc, b.sub(one, taken)))

        # 11. boolean results (comparisons / EQ / ISZERO)
        eqz = b.add(f["eq"], f["iszero"])
        b.all_rows(b.mul(cmp_f, b.sub(b.local(C0), carries[15])))
        b.all_rows(b.mul(eqz, b.sub(b.local(C0), b.sub(one, taken))))
        chi_bits = b.local_block(range(C0 + 1, C0 + 256))
        b.all_rows_block(b.mul(b.add(cmp_f, eqz), chi_bits), 255)

        # 12. bitwise / copy semantics
        AB = b.mul(Ablk, Bblk)
        b.all_rows_block(b.mul(f["and"], b.sub(Cblk, AB)), 256)
        b.all_rows_block(
            b.mul(f["or"], b.sub(Cblk, b.sub(b.add(Ablk, Bblk), AB))), 256
        )
        b.all_rows_block(
            b.mul(f["xor"], b.sub(Cblk, b.sub(b.add(Ablk, Bblk), b.scale(2, AB)))),
            256,
        )
        b.all_rows_block(
            b.mul(f["not"], b.sub(Cblk, b.sub(one, Ablk))), 256
        )
        b.all_rows_block(b.mul(f["dup"], b.sub(Cblk, Ablk)), 256)
        b.all_rows_block(b.mul(f["push0"], Cblk), 256)

        # 13. environment constants from publics
        for k, nm in enumerate(ENV_OPS):
            pub = b.public_block(range(PUB_ENV0 + 16 * k, PUB_ENV0 + 16 * k + 16))
            diff = b.sub(b.stack_block([lC[i] for i in range(16)]), pub)
            b.all_rows_block(b.mul(f[nm], diff), 16)

        # 14. PC / GAS pushes
        b.all_rows(b.mul(f["pc"], b.sub(lC[0], pc)))
        pchi = b.local_block(range(C0 + 16, C0 + 256))
        b.all_rows_block(b.mul(f["pc"], pchi), 240)
        b.transition(b.mul(f["gas"], b.sub(lC[0], Gn_lo)))
        b.transition(b.mul(f["gas"], b.sub(lC[1], Gn_hi)))
        gashi = b.local_block(range(C0 + 32, C0 + 256))
        b.all_rows_block(b.mul(f["gas"], gashi), 224)

        # 15. fetch channel (receive one instruction tuple per live row)
        imm_bits = b.mul(f["push"], Cblk)
        imm_code = b.bit_block_code(imm_bits, chi, b.constant(0), 32)
        code_f = b.ef_add4(
            b.ef_from_base4(pc),
            b.ef_add4(
                [b.mul(op, chi[c]) for c in range(4)],
                b.ef_mul4(chi2, imm_code),
            ),
        )
        accF = [b.aux(AUX_F + c) for c in range(4)]
        accF_n = [b.aux_next(AUX_F + c) for c in range(4)]
        prod = b.ef_mul4(b.ef_sub4(accF_n, accF), b.ef_sub4(g_f, code_f))
        live = b.ef_from_base4(b.sub(one, halted))
        for c in range(4):
            b.transition(b.add(prod[c], live[c]))
            b.first_row(accF[c])

        # 16. stack channel (up to four access tuples per row)
        arith2 = fsum(_ARITH2)
        env_f = fsum(ENV_OPS)
        pops_w0 = b.add(
            b.scale(2, arith2), b.add(b.add(f["iszero"], f["not"]), f["swap"])
        )
        actives = [
            b.add(
                arith2,
                b.add(
                    b.add(b.add(f["iszero"], f["not"]), b.add(f["pop"], f["jump"])),
                    b.add(b.add(f["jumpi"], f["dup"]), f["swap"]),
                ),
            ),
            b.add(arith2, b.add(f["jumpi"], f["swap"])),
            b.add(
                arith2,
                b.add(
                    b.add(b.add(f["iszero"], f["not"]), b.add(f["push0"], f["push"])),
                    b.add(
                        b.add(f["dup"], f["swap"]),
                        b.add(b.add(f["pc"], f["gas"]), env_f),
                    ),
                ),
            ),
            f["swap"],
        ]
        fam_m1 = b.sub(fam_n, one)
        addrs = [
            b.sub(b.sub(sp, one), b.mul(f["dup"], fam_m1)),
            b.sub(b.sub(sp, b.constant(2)), b.mul(f["swap"], fam_m1)),
            b.sub(sp, pops_w0),
            b.sub(b.sub(sp, one), b.mul(f["swap"], fam_n)),
        ]
        w0_bits = b.add(Cblk, b.mul(f["swap"], b.sub(Bblk, Cblk)))
        vblks = [Ablk, Bblk, w0_bits, Ablk]
        acc_sum = None
        for s in range(4):
            vcode = b.bit_block_code(vblks[s], chi, b.constant(0), 32)
            inner = b.ef_add4(b.ef_from_base4(b.constant(1 if s >= 2 else 0)), vcode)
            clk4 = b.add(b.scale(4, clk), b.constant(s))
            code = b.ef_add4(
                b.ef_from_base4(addrs[s]),
                b.ef_mul4(
                    chi, b.ef_add4(b.ef_from_base4(clk4), b.ef_mul4(chi, inner))
                ),
            )
            acc = [b.aux(AUX_SLOT0 + 4 * s + c) for c in range(4)]
            acc_n = [b.aux_next(AUX_SLOT0 + 4 * s + c) for c in range(4)]
            prod = b.ef_mul4(b.ef_sub4(acc_n, acc), b.ef_sub4(g_s, code))
            act4 = b.ef_from_base4(actives[s])
            for c in range(4):
                b.transition(b.sub(prod[c], act4[c]))
                b.first_row(acc[c])
            acc_sum = acc if acc_sum is None else b.ef_add4(acc_sum, acc)

        # 17. bus bindings (last row is always halted padding)
        for c in range(4):
            b.last_row(b.sub(accF[c], b.bus_coord(4 * BUS_FETCH + c)))
            b.last_row(b.sub(acc_sum[c], b.bus_coord(4 * BUS_STACK + c)))


# --------------------------------------------------------------------------
# EvmProgramAir — the instruction ROM (committed fixed columns)
# --------------------------------------------------------------------------

RM_MULT = 0
ROM_WIDTH = 1
RF_ACTIVE = 0
RF_PC = 1
RF_OP = 2
RF_IMM0 = 3  # 32 little-endian bytes of the pushed value
ROM_NFIXED = RF_IMM0 + 32


def program_instructions(code: bytes) -> list[tuple[int, int, int]]:
    """(pc, opcode, push_value) per instruction start, plus the virtual
    STOP at pc == len(code) (running off the end halts,
    interpreter.py:244/706).  Push data bytes are NOT instruction rows,
    so a jump into push data can never satisfy the fetch channel."""
    out = []
    pc = 0
    while pc < len(code):
        op = code[pc]
        if 0x60 <= op <= 0x7F:
            n = op - 0x5F
            imm = int.from_bytes(code[pc + 1 : pc + 1 + n], "big")
            out.append((pc, op, imm))
            pc += 1 + n
        else:
            out.append((pc, op, 0))
            pc += 1
    out.append((len(code), 0x00, 0))
    return out


class EvmProgramAir(Air):
    """One row per instruction; sends (pc, op, imm) fetch tuples with a
    witness visit-count multiplicity on the fetch channel."""

    width = ROM_WIDTH
    aux_width = 4
    num_aux_challenges = NUM_CHALLENGES
    num_bus_values = 2
    quotient_chunks = 2
    commit_fixed = True

    def __init__(self, code: bytes):
        assert len(code) < (1 << 15), "program counter is 15-bit"
        self.code = bytes(code)
        self.instructions = program_instructions(self.code)
        self.n = _pow2_atleast(len(self.instructions) + 1)

    def structure_key(self) -> tuple:
        return ()  # constraint graph is instance-independent

    def fixed_columns(self, n: int):
        assert n == self.n
        cols = np.zeros((ROM_NFIXED, n), dtype=np.uint32)
        for row, (pc, op, imm) in enumerate(self.instructions):
            cols[RF_ACTIVE, row] = 1
            cols[RF_PC, row] = pc
            cols[RF_OP, row] = op
            for j in range(32):
                cols[RF_IMM0 + j, row] = (imm >> (8 * j)) & 0xFF
        return cols

    def trace(self, visit_counts: dict) -> np.ndarray:
        tr = np.zeros((self.n, ROM_WIDTH), dtype=np.uint32)
        for row, (pc, _, _) in enumerate(self.instructions):
            tr[row, RM_MULT] = visit_counts.get(pc, 0) % bb.P
        return tr

    def _terms(self, trace: np.ndarray, challenges) -> np.ndarray:
        chi, gamma_f = challenges[0], challenges[1]
        pows = _np_chi_pows(chi, 36)
        n = trace.shape[0]
        pc = np.zeros(n, dtype=np.uint64)
        op = np.zeros(n, dtype=np.uint64)
        imm = np.zeros((n, 32), dtype=np.uint64)
        active = np.zeros(n, dtype=np.uint64)
        for row, (p, o, im) in enumerate(self.instructions):
            pc[row], op[row], active[row] = p, o, 1
            for j in range(32):
                imm[row, j] = (im >> (8 * j)) & 0xFF
        code = _np_tuple_code(
            pc, [(op, 1)] + [(imm[:, j], j + 3) for j in range(32)], pows
        )
        gf = np.array([x % bb.P for x in gamma_f], dtype=np.uint64)
        inv = ef.npef_inv(ef.npef_sub(gf[None, :], code))
        mult = trace[:, RM_MULT].astype(np.uint64) * active % _PU
        return ef.npef_mul(ef.npef_from_base(mult), inv)

    def aux_trace(self, trace: np.ndarray, challenges) -> np.ndarray:
        terms = self._terms(trace, challenges)
        aux = np.zeros((trace.shape[0], 4), dtype=np.uint32)
        aux[:] = EvmCpuAir._excl_prefix(terms)
        return aux

    def bus_values(self, trace: np.ndarray, challenges) -> list[tuple]:
        terms = self._terms(trace, challenges)
        return [tuple(int(v) for v in terms.sum(axis=0) % _PU), ef.H_ZERO]

    def eval(self, b: ConstraintBuilder) -> None:
        chi = b.challenge_ef(CHAL_CHI)
        g_f = b.challenge_ef(CHAL_F)
        active = b.fixed(RF_ACTIVE)
        pc = b.fixed(RF_PC)
        op = b.fixed(RF_OP)
        mult = b.local(RM_MULT)

        code = b.ef_add4(
            b.ef_from_base4(pc), [b.mul(op, chi[c]) for c in range(4)]
        )
        pw = b.ef_mul4(b.ef_mul4(chi, chi), chi)  # chi^3
        for j in range(32):
            immj = b.fixed(RF_IMM0 + j)
            code = b.ef_add4(code, [b.mul(immj, pw[c]) for c in range(4)])
            if j < 31:
                pw = b.ef_mul4(pw, chi)

        acc = [b.aux(c) for c in range(4)]
        acc_n = [b.aux_next(c) for c in range(4)]
        prod = b.ef_mul4(b.ef_sub4(acc_n, acc), b.ef_sub4(g_f, code))
        send = b.ef_from_base4(b.mul(active, mult))
        for c in range(4):
            b.transition(b.sub(prod[c], send[c]))
            b.first_row(acc[c])
            b.last_row(b.sub(acc[c], b.bus_coord(4 * BUS_FETCH + c)))
            b.last_row(b.bus_coord(4 * BUS_STACK + c))


# --------------------------------------------------------------------------
# EvmStackAir — read-write-memory argument for the stack
# --------------------------------------------------------------------------

SK_ABITS = 0  # 11 address bits
SK_CBITS = 11  # 22 clk4 bits
SK_IW = 33
SK_SA = 34  # same-address-as-previous-row flag
SK_DBITS = 35  # 22 bits: strictly-increasing diff witness
SK_V0 = 57  # 256 value bits
STACK_WIDTH = SK_V0 + 256
SF_ACTIVE = 0
SF_ACTIVE_N = 1  # ACTIVE shifted up one row (fixed cols have no `next` view)


class EvmStackAir(Air):
    """Stack accesses sorted by (addr, clk4); receives every CPU access.

    Ordering: within an address, clk4 strictly increases (d = clk4 diff
    - 1 range-checked); across addresses, addr strictly increases.  A
    read (iw = 0) must repeat the previous row's value at the same
    address; the first access at each address must be a write."""

    width = STACK_WIDTH
    aux_width = 4
    num_aux_challenges = NUM_CHALLENGES
    num_bus_values = 2
    quotient_chunks = 2
    commit_fixed = True

    def __init__(self, num_accesses: int):
        self.T = int(num_accesses)
        self.n = _pow2_atleast(self.T + 1)

    def fixed_columns(self, n: int):
        assert n == self.n
        cols = np.zeros((2, n), dtype=np.uint32)
        cols[SF_ACTIVE, : self.T] = 1
        if self.T > 1:
            cols[SF_ACTIVE_N, : self.T - 1] = 1
        return cols

    def trace(self, accesses: list[tuple[int, int, int, int]]) -> np.ndarray:
        """accesses: (addr, clk4, is_write, value) in ANY order; sorted
        here."""
        assert len(accesses) == self.T
        acc = sorted(accesses)
        tr = np.zeros((self.n, STACK_WIDTH), dtype=np.uint32)
        prev_addr = None
        prev_clk = None
        for row, (addr, clk4, iw, value) in enumerate(acc):
            assert 0 <= addr < (1 << 11) and 0 <= clk4 < (1 << 22)
            for i in range(11):
                tr[row, SK_ABITS + i] = (addr >> i) & 1
            for i in range(22):
                tr[row, SK_CBITS + i] = (clk4 >> i) & 1
            tr[row, SK_IW] = iw
            if prev_addr is not None and addr == prev_addr:
                tr[row, SK_SA] = 1
                d = clk4 - prev_clk - 1
            elif prev_addr is not None:
                d = addr - prev_addr - 1
            else:
                d = 0
            assert 0 <= d < (1 << 22)
            for i in range(22):
                tr[row, SK_DBITS + i] = (d >> i) & 1
            tr[row, SK_V0 : SK_V0 + 256] = _word_bits(value)
            prev_addr, prev_clk = addr, clk4
        return tr

    def _terms(self, trace: np.ndarray, challenges) -> np.ndarray:
        chi, gamma_s = challenges[0], challenges[2]
        pows = _np_chi_pows(chi, 36)
        t = trace.astype(np.uint64)
        addr = sum(t[:, SK_ABITS + i] << np.uint64(i) for i in range(11))
        clk4 = sum(t[:, SK_CBITS + i] << np.uint64(i) for i in range(22))
        vbytes = _bits_to_bytes(trace[:, SK_V0 : SK_V0 + 256])
        code = _np_tuple_code(
            addr,
            [(clk4, 1), (t[:, SK_IW], 2)]
            + [(vbytes[:, j], j + 3) for j in range(32)],
            pows,
        )
        gs = np.array([x % bb.P for x in gamma_s], dtype=np.uint64)
        inv = ef.npef_inv(ef.npef_sub(gs[None, :], code))
        active = np.zeros(trace.shape[0], dtype=np.uint64)
        active[: self.T] = _PU - np.uint64(1)  # receive: -1
        return ef.npef_mul(ef.npef_from_base(active), inv)

    def aux_trace(self, trace: np.ndarray, challenges) -> np.ndarray:
        aux = np.zeros((trace.shape[0], 4), dtype=np.uint32)
        aux[:] = EvmCpuAir._excl_prefix(self._terms(trace, challenges))
        return aux

    def bus_values(self, trace: np.ndarray, challenges) -> list[tuple]:
        terms = self._terms(trace, challenges)
        return [ef.H_ZERO, tuple(int(v) for v in terms.sum(axis=0) % _PU)]

    def eval(self, b: ConstraintBuilder) -> None:
        one = b.constant(1)
        chi = b.challenge_ef(CHAL_CHI)
        g_s = b.challenge_ef(CHAL_S)
        active = b.fixed(SF_ACTIVE)

        def val(nx: bool, base: int, nbits: int):
            g = b.next if nx else b.local
            acc = None
            for i in range(nbits):
                t = b.scale(1 << i, g(base + i))
                acc = t if acc is None else b.add(acc, t)
            return acc

        addr = val(False, SK_ABITS, 11)
        addr_n = val(True, SK_ABITS, 11)
        clk4 = val(False, SK_CBITS, 22)
        clk4_n = val(True, SK_CBITS, 22)
        d_n = val(True, SK_DBITS, 22)
        iw = b.local(SK_IW)
        iw_n = b.next(SK_IW)
        sa = b.local(SK_SA)
        sa_n = b.next(SK_SA)

        # booleanity
        bit_cols = list(range(SK_ABITS, SK_ABITS + 11)) + list(
            range(SK_CBITS, SK_CBITS + 22)
        ) + [SK_IW, SK_SA] + list(range(SK_DBITS, SK_DBITS + 22)) + list(
            range(SK_V0, SK_V0 + 256)
        )
        bits = b.local_block(bit_cols)
        b.all_rows_block(b.mul(bits, b.sub(bits, one)), len(bit_cols))

        # sa only on active rows; row 0 is never a continuation
        b.all_rows(b.mul(b.sub(one, active), sa))
        b.first_row(sa)
        # same-address rows repeat the address and step the clock
        b.transition(b.mul(sa_n, b.sub(addr_n, addr)))
        # d' = sa' ? clk4' - clk4 - 1 : addr' - addr - 1   (on active rows)
        clk_diff = b.sub(b.sub(clk4_n, clk4), one)
        addr_diff = b.sub(b.sub(addr_n, addr), one)
        sel = b.add(b.mul(sa_n, clk_diff), b.mul(b.sub(one, sa_n), addr_diff))
        # gate by next-active (padding rows are unconstrained)
        nact = b.fixed(SF_ACTIVE_N)
        b.transition(b.mul(nact, b.sub(d_n, sel)))
        # first access at a new address must be a write
        b.transition(b.mul(nact, b.mul(b.sub(one, sa_n), b.sub(one, iw_n))))
        b.first_row(b.mul(active, b.sub(one, iw)))
        # read-after-write consistency
        vblk = b.local_block(range(SK_V0, SK_V0 + 256))
        vblk_n = b.next_block(range(SK_V0, SK_V0 + 256))
        b.transition_block(
            b.mul(b.mul(sa_n, b.sub(one, iw_n)), b.sub(vblk_n, vblk)), 256
        )

        # receive channel
        vcode = b.bit_block_code(vblk, chi, b.constant(0), 32)
        inner = b.ef_add4(b.ef_from_base4(iw), vcode)
        code = b.ef_add4(
            b.ef_from_base4(addr),
            b.ef_mul4(chi, b.ef_add4(b.ef_from_base4(clk4), b.ef_mul4(chi, inner))),
        )
        acc = [b.aux(c) for c in range(4)]
        acc_n = [b.aux_next(c) for c in range(4)]
        prod = b.ef_mul4(b.ef_sub4(acc_n, acc), b.ef_sub4(g_s, code))
        act4 = b.ef_from_base4(active)
        for c in range(4):
            b.transition(b.add(prod[c], act4[c]))
            b.first_row(acc[c])
            b.last_row(b.sub(acc[c], b.bus_coord(4 * BUS_STACK + c)))
            b.last_row(b.bus_coord(4 * BUS_FETCH + c))


# --------------------------------------------------------------------------
# frame payload: prove / verify
# --------------------------------------------------------------------------


def frame_tables(ft: FrameTrace):
    """[(air, trace, publics)] for prover.prove_tables."""
    cpu = EvmCpuAir()
    cpu_trace, publics = build_cpu_trace(ft)
    rom = EvmProgramAir(ft.code)
    stk = EvmStackAir(len(ft.accesses))
    return [
        (cpu, cpu_trace, publics),
        (rom, rom.trace(ft.visit_counts), []),
        (stk, stk.trace(ft.accesses), []),
    ]


def frame_publics(env: FrameEnv, gas0: int, gas_f: int, sp_f: int) -> list[int]:
    publics = [gas0 & 0xFFFF, gas0 >> 16, gas_f & 0xFFFF, gas_f >> 16, sp_f]
    for w in env.words():
        publics.extend((w >> (16 * i)) & 0xFFFF for i in range(16))
    return publics


def prove_frame(code: bytes, env: FrameEnv, gas: int) -> dict:
    """Execute a covered frame and prove it; raises UncoveredFrame when
    the frame leaves the covered statement."""
    return prove_frame_trace(execute_frame(code, env, gas))


def prove_frame_trace(ft: FrameTrace) -> dict:
    from .. import prover as sp
    from ..serde import proof_to_dict

    proofs = sp.prove_tables(frame_tables(ft))
    return {
        "kind": "evm-frame-v1",
        "code": ft.code.hex(),
        "env": {k: hex(v) for k, v in ft.env.__dict__.items()},
        "gas0": ft.gas0,
        "gas_f": ft.gas_f,
        "sp_f": ft.sp_f,
        "accesses": len(ft.accesses),
        "steps": len(ft.steps),
        "starks": [proof_to_dict(p) for p in proofs],
    }


def verify_frame_payload(payload: dict) -> bool:
    """Rebuild the AIR instances from the PUBLIC statement (code, env,
    gas/stack claims, table sizes) and verify the multi-table STARK."""
    from .. import verifier as sv
    from ..serde import proof_from_dict

    if payload.get("kind") != "evm-frame-v1":
        return False
    try:
        code = bytes.fromhex(payload["code"])
        env = FrameEnv(**{k: int(v, 16) for k, v in payload["env"].items()})
        gas0, gas_f, sp_f = (
            int(payload["gas0"]),
            int(payload["gas_f"]),
            int(payload["sp_f"]),
        )
        n_acc = int(payload["accesses"])
        starks = payload["starks"]
        if not (0 <= gas_f <= gas0 < 1 << 32 and 0 <= sp_f <= 1024):
            return False
        if len(starks) != 3:
            return False
        proofs = [proof_from_dict(d) for d in starks]
    except (KeyError, ValueError, TypeError):
        return False
    airs = [EvmCpuAir(), EvmProgramAir(code), EvmStackAir(n_acc)]
    if proofs[0].publics != frame_publics(env, gas0, gas_f, sp_f):
        return False
    if proofs[1].publics or proofs[2].publics:
        return False
    if (1 << proofs[1].log_n) != airs[1].n or (1 << proofs[2].log_n) != airs[2].n:
        return False
    return sv.verify_tables(airs, proofs)
