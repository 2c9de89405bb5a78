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

  channel 2 (gamma_C, challenge 3): calldata loads.  An in-bounds
      CALLDATALOAD (offset < calldatasize, proven through the shared
      adder gadget against the public size) sends
      code(offset, word) = offset + sum_j word_byte_j * chi^{j+1};
      EvmCalldataAir — committed-fixed columns derived from the PUBLIC
      calldata, one row per byte offset holding the zero-padded 32-byte
      big-endian word at that offset — receives each load with a witness
      multiplicity.  Out-of-bounds loads are forced to push zero.
  channel 3 (gamma_M, challenge 4): memory.  Word-aligned MLOAD/MSTORE
      send code(word_addr, 4*clk, iw, word); MemRamAir receives them
      sorted by (word_addr, clk) with read-after-write consistency and
      the EVM's zero-initialized semantics (a FRESH read sees zero).
      The msize register M (words) is a held CPU column; expansion gas
      3*dM + d(floor(M^2/512)) is charged through 9-bit remainder and
      18-bit quotient-delta witnesses (sound because M is capped at
      2^13 words, keeping M^2 < p).
  channels 4-6 (gamma_B / gamma_D / gamma_K, challenges 5-7): the
      KECCAK256 sponge bridge (stark/airs/evm_keccak.py).
  channel 7 (gamma_ST, challenge 8): storage.  SLOAD/SSTORE send
      code(4*clk, iw, cold, g1, g2, slot, value); EvmStorageAir
      (stark/airs/evm_storage.py) receives them against the PUBLIC
      per-slot (slot, original, count, prewarm) groups, enforcing read
      values, cold-access flags, and the EIP-2200 gas-case flags that
      price SSTORE on the CPU row.

Covered: STOP, ADD, MUL, SUB, DIV, SDIV, MOD, SMOD, SIGNEXTEND,
LT/GT/SLT/SGT, EQ, ISZERO, AND/OR/XOR/NOT, BYTE/SHL/SHR/SAR, KECCAK256
(32-byte-aligned offset), CALLDATALOAD, POP, MLOAD/MSTORE at ANY
byte offset (two-word read + one-hot recombination; MSTORE is a full
read-modify-write of up to two words, the spliced write values formed
as in-channel one-hot expressions), MSIZE, MSTORE8 (any byte offset,
single-word RMW), CALLDATACOPY + CODECOPY (aligned dest, ANY size
incl. byte tails — the final partial word is a read-modify-write whose
spliced value is selected by a FIXED slack one-hot — and ANY source
offset incl. past-the-end zero fill; one bridge row per copied word,
stark/airs/evm_copy.py; CODECOPY's source words are FIXED columns from
the public bytecode), RETURNDATACOPY (empty-
returndata form: offset = size = 0 pinned; larger arguments
exceptionally halt under EIP-211 since covered frames make no calls),
PUSH0-32, DUP1-16, SWAP1-16, LOG0-4 (32-byte-aligned range), JUMP/JUMPI/PC/GAS/JUMPDEST, and the
constant-push environment opcodes (ADDRESS..BLOBBASEFEE below).
SDIV/SMOD/EXP are proven in the dedicated arithmetic table
(stark/airs/evm_arith.py) over the BUS_AR channel (channel 8); EXP gas
charges 10 + 50*L with L bound EXACTLY by a 33-wide one-hot: suffix-zero
forbids under-claims, and a nonzero-inverse on byte L-1 forbids
over-claims.
MUL is a schoolbook byte product with 13-bit range-checked carries;
DIV/MOD prove q*b + r = a with a zero high half and r <= b - 1 via a
byte borrow chain (division by zero pushes zero through the nonzero
gadget); the shifts run in two one-hot stages (byte-granular via a
32-wide one-hot, then bit-granular via an 8-wide one-hot), with SAR
sign-filling and shift >= 256 handled by the nonzero gadget;
SIGNEXTEND reuses the byte one-hot with sign fill.  SLOAD/SSTORE run
against the storage journal (EIP-2929 warm/cold + EIP-2200 gas cases +
the 2300-gas sentry).  LOGn meters 375*n + 8*size + expansion and pops
its topics without stack-channel reads (topic values feed only the
receipt log, outside the frame statement; popped cells are always
re-written before any further read).  MSTORE8 reads the old word at
sub-clock 4*clk and writes the spliced word at 4*clk + 1 (the second
memory accumulator AUX_M2); an unaligned MLOAD reads words w and w+1
(second read on AUX_M2) and recombines C = (B << 8k | W >> 8(32-k))
through the same one-hot; MSTORE reads old words w[, w+1] (slots 0, 1)
and writes the spliced words (slots 2, 3 via AUX_M3/AUX_M4), whose
values are one-hot pattern EXPRESSIONS over (old, B, k) — no extra
witness words.  CALLDATACOPY/CODECOPY run through copy bridges
(channel BUS_CP, kind-tagged tuples): the CPU sends (clk, destw,
offset, sw, kind); the calldata bridge reads each source word from the
calldata channel (or constrains it zero past the end), the code bridge
carries its source words as fixed columns, and both write every word
to RAM at destw + j; byte tails read the old word at sub-clock +1 and
write the splice at +2.  Calls (docs/EVM_COMPOSITION.md) are the
remaining roadmap; frames using them are reported uncovered, never
mis-proven.
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
    "mul": (0x02, 5, 2, 1),
    "sub": (0x03, 3, 2, 1),
    "div": (0x04, 5, 2, 1),
    "sdiv": (0x05, 5, 2, 1),
    "mod": (0x06, 5, 2, 1),
    "smod": (0x07, 5, 2, 1),
    "exp": (0x0A, 0, 2, 1),  # gas fully dynamic: 10 + 50*byte_len(exp)
    "signextend": (0x0B, 5, 2, 1),
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
    "byte": (0x1A, 3, 2, 1),
    "keccak": (0x20, 30, 2, 1),
    "shl": (0x1B, 3, 2, 1),
    "shr": (0x1C, 3, 2, 1),
    "sar": (0x1D, 3, 2, 1),
    "calldataload": (0x35, 3, 1, 1),
    "calldatacopy": (0x37, 3, 3, 0),  # + 3/word + expansion (dynamic)
    "codecopy": (0x39, 3, 3, 0),  # + 3/word + expansion (dynamic)
    # covered RETURNDATACOPY: size must be 0 (no calls in a covered
    # frame => returndata is empty; any size > 0 reverts)
    "returndatacopy": (0x3E, 3, 3, 0),
    "pop": (0x50, 2, 1, 0),
    "mload": (0x51, 3, 1, 1),
    "mstore": (0x52, 3, 2, 0),
    "mstore8": (0x53, 3, 2, 0),
    "sload": (0x54, 0, 1, 1),  # gas fully dynamic (EIP-2929)
    "sstore": (0x55, 0, 2, 0),  # gas fully dynamic (EIP-2200/2929)
    "msize": (0x59, 2, 0, 1),
    "return": (0xF3, 0, 2, 0),  # halt; memory-expansion gas only
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
    # no calls happen inside a covered frame, so RETURNDATASIZE is the
    # constant 0 (bound as a public env word that must be zero)
    "returndatasize": 0x3D,
    "coinbase": 0x41,
    "timestamp": 0x42,
    "number": 0x43,
    "prevrandao": 0x44,
    "gaslimit": 0x45,
    "chainid": 0x46,
    "basefee": 0x48,
    "blobbasefee": 0x4A,
}

# families: op = base + n (n = 1..cap); gas = static per op.  LOGn is
# the family op = 0x9F + n (n = 1..5, topics = n - 1): static gas 0 here
# because its 375*n part is metered dynamically (375 + 375*topics =
# 375*n), plus 8*size and memory expansion.
FAMILIES = {
    "push": (0x5F, 32, 3),
    "dup": (0x7F, 16, 3),
    "swap": (0x8F, 16, 3),
    "log": (0x9F, 5, 0),
}

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
# every pop-2-push-1 opcode (stack channel slots R0/R1/W0)
_POP2PUSH1 = _ARITH2 + (
    "mul", "div", "sdiv", "mod", "smod", "exp", "signextend", "byte", "shl",
    "shr", "sar", "keccak",
)
_SHIFTS = ("shl", "shr", "sar")


def _sp_delta(name: str) -> int:
    if name in _POP2PUSH1:
        return -1
    if name in (
        "iszero", "not", "swap", "jumpdest", "stop", "calldataload", "mload",
        "sload",
    ):
        return 0
    if name in ("pop", "jump"):
        return -1
    if name in ("jumpi", "mstore", "mstore8", "sstore", "return"):
        return -2
    if name in ("calldatacopy", "codecopy", "returndatacopy"):
        return -3
    if name == "log":
        return 0  # real delta is -(fam_n + 1); added explicitly in eval
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
W0 = C0 + 256  # adder diff witness (cmp/calldataload) | byte-shifted B' (shifts)
# scratch bits, overlaid by mutually exclusive opcode groups:
#   MUL:    32 x 13-bit schoolbook byte carries
#   shifts: 32-wide byte one-hot + 8-wide bit one-hot (rest unused)
SCRATCH0 = W0 + 256
MULC0 = SCRATCH0
OHQ0 = SCRATCH0
OHR0 = SCRATCH0 + 32
N_SCRATCH = 32 * 13
# memory-op witnesses (own region: `grow` and `dq` feed cross-row
# register transitions, so they can't share bits with the scratch
# overlay): grow flag, 14-bit max-comparison diff, old/new msize-squared
# remainders (9 bits each), 18-bit quotient delta
MW_GROW = SCRATCH0 + N_SCRATCH
MW_D0 = MW_GROW + 1
MW_R0 = MW_D0 + 14
MW_R1 = MW_R0 + 9
MW_DQ0 = MW_R1 + 9
# msize register: word count, held across rows (<= 2^13 words covered)
MEMB0 = MW_DQ0 + 18
# KECCAK256 witnesses: sw = ceil(size/32) (10 bits), slack = 32*sw - size
# (5 bits), and the raw `needed` column for the expansion comparison
# (keeps the max-gadget at degree <= 3 across mload/mstore/keccak)
KSW0 = MEMB0 + 14
KSL0 = KSW0 + 10
KNEED = KSL0 + 5  # raw column (not boolean)
# DIV/MOD remainder bound r <= b-1: byte borrow chain (32 borrows +
# 32 x 8 difference-byte bits)
DMB0 = KNEED + 1  # 32 borrow bits
DMT0 = DMB0 + 32  # 256 t-byte bits
# storage witnesses: cold-access flag + the SSTORE gas-case one-hot
# (g1 = clean nonzero write 2900, g2 = clean zero write 20000); the
# EIP-2200 sentry decomposition overlays scratch bits 0..31
SCOLD = DMT0 + 256
SG1 = SCOLD + 1
SG2 = SG1 + 1
CPU_WIDTH = SG2 + 1

MAX_MEM_WORDS_LOG = 13  # coverage cap: 2^13 32-byte words (256 KiB)
MAX_KECCAK_CALLS = 64  # per-frame cap on proven KECCAK256 calls

# aux layout: fetch + 4 stack-slot + calldata + memory + hash-call accs
AUX_F = 0
AUX_SLOT0 = 4
AUX_CD = AUX_SLOT0 + 16
AUX_M = AUX_CD + 4
AUX_K = AUX_M + 4
AUX_ST = AUX_K + 4
AUX_AR = AUX_ST + 4
AUX_M2 = AUX_AR + 4  # 2nd RAM tuple (m8 write / unaligned 2nd-word read)
AUX_M3 = AUX_M2 + 4  # 3rd RAM tuple (MSTORE word-1 write)
AUX_M4 = AUX_M3 + 4  # 4th RAM tuple (unaligned MSTORE word-2 write)
AUX_CP = AUX_M4 + 4  # calldata-copy call sends
CPU_AUX_W = AUX_CP + 4

CHAL_CHI = 0
CHAL_F = 1
CHAL_S = 2
CHAL_C = 3
CHAL_M = 4
CHAL_B = 5  # keccak rate-block codes (bridge -> sponge)
CHAL_D = 6  # keccak digest codes (sponge -> bridge)
CHAL_K = 7  # hash-call tuples (CPU -> bridge)
CHAL_ST = 8  # storage access tuples (CPU -> storage journal)
CHAL_AR = 9  # signed-arithmetic call tuples (CPU -> arith table)
CHAL_CP = 10  # calldata-copy call tuples (CPU -> copy bridge)
NUM_CHALLENGES = 11
BUS_FETCH = 0
BUS_STACK = 1
BUS_CD = 2
BUS_MEM = 3
BUS_BLOCKS = 4
BUS_DIG = 5
BUS_KCALL = 6
BUS_STOR = 7
BUS_AR = 8  # SDIV/SMOD/EXP calls -> evm_arith.py
BUS_CP = 9  # CALLDATACOPY calls -> evm_copy.py
NUM_BUS = 10
ENV_IDX_CDSIZE = list(ENV_OPS).index("calldatasize")

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

# byte i of a 256-bit word = sum_b 2^b * bit[8i + b]  (32 x 256 linmap)
_BYTE_MAT = [[0] * 256 for _ in range(32)]
for _i in range(32):
    for _b in range(8):
        _BYTE_MAT[_i][8 * _i + _b] = 1 << _b

# mul carry k = sum_t 2^t * scratch[13k + t]  (32 x 416 linmap)
_MULC_MAT = [[0] * N_SCRATCH for _ in range(32)]
for _k in range(32):
    for _t in range(13):
        _MULC_MAT[_k][13 * _k + _t] = 1 << _t


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
    returndatasize: int = 0
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
    mulc: list | None = None  # 32 schoolbook byte carries (MUL/DIV/MOD)
    dmt: list | None = None  # DIV/MOD borrow-chain t bytes
    dmb: list | None = None  # DIV/MOD borrow bits
    qsel: int = -1  # byte-shift one-hot index (shift/BYTE rows, not big)
    expL: int = -1  # EXP: exponent byte length (33-wide one-hot)
    rsel: int = -1  # bit-shift one-hot index (shift rows, not big)
    m_before: int = 0  # msize register (words) before this step
    grow: int = 0  # memory-op witnesses (MLOAD/MSTORE/KECCAK rows)
    d: int = 0
    r0: int = 0
    r1: int = 0
    dq: int = 0
    kneed: int = 0  # expansion target word count for the max gadget
    ksw: int = 0  # KECCAK256: ceil(size/32)
    ksl: int = 0  # KECCAK256: 32*ksw - size
    kreads: list = field(default_factory=list)  # (word_addr, value) reads
    scold: int = 0  # storage: cold access (EIP-2929)
    sg1: int = 0  # SSTORE clean nonzero write (2900)
    sg2: int = 0  # SSTORE clean zero write (20000)
    sentry: int = 0  # SSTORE: gas_before - 2301 (EIP-2200 sentry)
    mem_access: tuple | None = None  # (word_addr, iw, value) at slot 0
    mem_access2: tuple | None = None  # (word_addr, iw, value) at slot 1
    mem_access3: tuple | None = None  # (word_addr, iw, value) at slot 2
    mem_access4: tuple | None = None  # (word_addr, iw, value) at slot 3
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
    calldata: bytes = b""
    cd_loads: dict = field(default_factory=dict)  # offset -> load count
    m_final: int = 0  # msize register (words) at halt
    # KECCAK256 calls: (clk, offw, size, words, digest) — (offw, size)
    # become public bridge structure, words/digest stay witness
    keccak_calls: list = field(default_factory=list)
    # storage journal: accesses (slot, clk4, iw, value, cold, g1, g2) and
    # the PUBLIC per-slot groups [(slot, original, count, prewarm, final)]
    storage_accesses: list = field(default_factory=list)
    storage_groups: list = field(default_factory=list)
    # signed-arithmetic calls: (kind, a, b, result) proven in ArithAir
    # (stark/airs/evm_arith.py) over the BUS_AR channel
    arith_calls: list = field(default_factory=list)
    # CALLDATACOPY calls: (clk, destw, offset, sw, words) — (destw,
    # offset, sw) become public bridge structure (evm_copy.py)
    copy_calls: list = field(default_factory=list)

    @property
    def accesses(self):
        out = []
        for clk, st in enumerate(self.steps):
            for slot, addr, iw, value in st.accesses:
                out.append((addr, 4 * clk + slot, iw, value))
        return out

    @property
    def mem_accesses(self):
        out = []
        for clk, st in enumerate(self.steps):
            if st.mem_access is not None:
                waddr, iw, value = st.mem_access
                out.append((waddr, 4 * clk, iw, value))
            if st.mem_access2 is not None:
                waddr, iw, value = st.mem_access2
                out.append((waddr, 4 * clk + 1, iw, value))
            if st.mem_access3 is not None:
                waddr, iw, value = st.mem_access3
                out.append((waddr, 4 * clk + 2, iw, value))
            if st.mem_access4 is not None:
                waddr, iw, value = st.mem_access4
                out.append((waddr, 4 * clk + 3, iw, value))
            for waddr, value in st.kreads:
                out.append((waddr, 4 * clk + 1, 0, value))
        # copy-bridge accesses: tail-word RMW read at sub-clock +1,
        # writes at +2 (evm_copy.py rows)
        for _kind, clk, destw, off, sw, slack, words, _srcs, tail_old in (
            self.copy_calls
        ):
            if slack:
                out.append((destw + sw - 1, 4 * clk + 1, 0, tail_old))
            for i, wv in enumerate(words):
                out.append((destw + i, 4 * clk + 2, 1, wv))
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


def _divmod_witness(q: int, bv: int, r: int, a: int):
    """Witnesses for q*b + r = a (b != 0; all zero when b == 0):
    the 13-bit schoolbook chain carries and the borrow chain proving
    t = b - 1 - r >= 0 (byte diffs + borrows)."""
    qb = [(q >> (8 * i)) & 0xFF for i in range(32)]
    bb_ = [(bv >> (8 * i)) & 0xFF for i in range(32)]
    rb = [(r >> (8 * i)) & 0xFF for i in range(32)]
    ab = [(a >> (8 * i)) & 0xFF for i in range(32)]
    carries = []
    c = 0
    for k in range(32):
        s = sum(qb[i] * bb_[k - i] for i in range(k + 1)) + rb[k] + c
        assert (s & 0xFF) == (ab[k] if bv else 0)
        c = s >> 8
        assert c < (1 << 13)
        carries.append(c)
    tb, brs = [], []
    br = 0
    for k in range(32):
        d = bb_[k] - rb[k] - (1 if k == 0 else 0) - br
        br = 1 if d < 0 else 0
        tb.append(d + 256 * br)
        brs.append(br)
    assert bv == 0 or brs[31] == 0
    return carries, tb, brs


def _mul_carries(x: int, y: int) -> list[int]:
    """Schoolbook byte-product carries: at output byte position k,
    sum_{i+j=k} x_i*y_j + carry_{k-1} = c_k + 256*carry_k with every
    carry < 2^13 (32 terms of <= 255*255 plus a prior carry)."""
    xb = [(x >> (8 * i)) & 0xFF for i in range(32)]
    yb = [(y >> (8 * j)) & 0xFF for j in range(32)]
    carries = []
    c = 0
    for k in range(32):
        s = sum(xb[i] * yb[k - i] for i in range(k + 1)) + c
        c = s >> 8
        assert c < (1 << 13)
        carries.append(c)
    return carries


def execute_frame(
    code: bytes,
    env: FrameEnv,
    gas: int,
    max_steps: int = 1 << MAX_STEPS_LOG,
    calldata: bytes | None = None,
    storage: dict | None = None,
    warm_slots: set | None = None,
) -> FrameTrace:
    """Run the covered-subset stack machine, recording the full witness.

    Semantics mirror evm/interpreter.py exactly for the covered opcodes
    (same gas costs, same stack discipline); anything outside raises
    UncoveredFrame.  Running off the end of code is a virtual STOP
    (interpreter loop exit, interpreter.py:244/706).  ``calldata``
    defaults to env.calldatasize zero bytes; when given it must match
    env.calldatasize (the public CALLDATASIZE word binds the table)."""
    assert 0 <= gas < 1 << 32, "frame gas must fit the 32-bit gas register"
    env = env if env.codesize else FrameEnv(**{**env.__dict__, "codesize": len(code)})
    if calldata is None:
        calldata = bytes(env.calldatasize)
    if env.calldatasize == 0 and calldata:
        env = FrameEnv(**{**env.__dict__, "calldatasize": len(calldata)})
    if env.calldatasize != len(calldata) or len(calldata) >= (1 << 15):
        raise UncoveredFrame("calldata size out of coverage")
    cd_loads: dict[int, int] = {}
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
    mem_words: dict[int, int] = {}
    m_words = 0
    keccak_calls: list = []
    arith_calls: list = []
    copy_calls: list = []
    # storage journal: originals are the coverage boundary — slots not in
    # the provided pre-image map make the frame uncovered
    storage_orig = dict(storage or {})
    storage_cur = dict(storage_orig)
    warm = set(warm_slots or ())
    prewarm = set(warm)
    storage_accesses: list = []
    slot_counts: dict[int, int] = {}

    def use(n):
        nonlocal gas_left
        gas_left -= n
        if gas_left < 0:
            raise UncoveredFrame("out of gas")

    def mem_expand(st, needed):
        """Grow the msize register to max(m, needed); returns the dynamic
        gas (3 per new word + quadratic term), recording the witnesses."""
        nonlocal m_words
        if needed > (1 << MAX_MEM_WORDS_LOG):
            raise UncoveredFrame("memory beyond covered bound")
        st.kneed = needed
        st.grow = 1 if needed > m_words else 0
        st.d = needed - m_words - 1 if st.grow else m_words - needed
        old = m_words
        new = needed if st.grow else m_words
        st.r0 = (old * old) % 512
        st.r1 = (new * new) % 512
        st.dq = (new * new - old * old - st.r1 + st.r0) // 512
        m_words = new
        return 3 * (new - old) + st.dq

    while True:
        if len(steps) >= max_steps:
            raise UncoveredFrame("step budget exceeded")
        op = code[pc] if pc < len(code) else 0x00  # virtual STOP
        if op not in COVERED_OPBYTES:
            raise UncoveredFrame(f"opcode 0x{op:02x} not covered")
        visit[pc] = visit.get(pc, 0) + 1
        st = _Step(pc=pc, op=op, name="", fam_n=0, gas_before=gas_left,
                   sp_before=len(stack), m_before=m_words)
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
        elif op == 0x02:
            st.name = "mul"
            a, b_ = pop2()
            use(5)
            st.a, st.b = a, b_
            st.mulc = _mul_carries(a, b_)
            push(a * b_, sp - 2)
        elif op == 0x0A:
            st.name = "exp"
            a, b_ = pop2()  # base, exponent
            st.a, st.b = a, b_
            elen = (b_.bit_length() + 7) // 8
            use(10 + 50 * elen)
            st.qsel = -1  # one-hot lives at SCRATCH0 + elen (33-wide)
            st.mulc = None
            st.expL = elen
            if elen:  # minimality: byte elen-1 is nonzero
                v_top = (b_ >> (8 * (elen - 1))) & 0xFF
                st.s_inv = v_top
                st.inv[0] = pow(v_top, bb.P - 2, bb.P)
            c = pow(a, b_, 1 << 256)
            arith_calls.append((3, a, b_, c))
            push(c, sp - 2)
        elif op in (0x05, 0x07):
            st.name = "sdiv" if op == 0x05 else "smod"
            a, b_ = pop2()
            use(5)
            st.a, st.b = a, b_
            sa_ = a - (1 << 256) if a >> 255 else a
            sb_ = b_ - (1 << 256) if b_ >> 255 else b_
            if sb_ == 0:
                res = 0
            elif op == 0x05:
                res = abs(sa_) // abs(sb_)
                if (sa_ < 0) != (sb_ < 0):
                    res = -res
            else:
                res = abs(sa_) % abs(sb_)
                if sa_ < 0:
                    res = -res
            res &= _M256
            arith_calls.append((1 if op == 0x05 else 2, a, b_, res))
            push(res, sp - 2)
        elif op in (0x04, 0x06):
            st.name = "div" if op == 0x04 else "mod"
            a, b_ = pop2()
            use(5)
            st.a, st.b = a, b_
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(b_ >> (16 * i)) & 0xFFFF for i in range(16)]
            )
            q, r = (a // b_, a % b_) if b_ else (0, 0)
            st.mulc, st.dmt, st.dmb = _divmod_witness(q, b_, r, a)
            if op == 0x04:
                st.w = r
                push(q, sp - 2)
            else:
                st.w = q
                push(r, sp - 2)
        elif op == 0x0B:
            st.name = "signextend"
            a, b_ = pop2()  # a = byte index k, b = value
            use(5)
            st.a, st.b = a, b_
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(a >> 5).bit_count()] + [0] * 15
            )
            if st.taken:  # k >= 32: value unchanged
                push(b_, sp - 2)
            else:
                st.qsel = a
                mask = (1 << (8 * a + 8)) - 1
                v = b_ & mask
                if (b_ >> (8 * a + 7)) & 1:
                    v |= _M256 ^ mask
                push(v, sp - 2)
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
        elif op == 0x20:
            st.name = "keccak"
            a, size = pop2()  # a = offset, size = length
            if a % 32 or a >= (1 << 18):
                raise UncoveredFrame("unaligned or far KECCAK256 range")
            if size >= (1 << 13):
                raise UncoveredFrame("KECCAK256 size beyond covered bound")
            if len(keccak_calls) >= MAX_KECCAK_CALLS:
                raise UncoveredFrame("too many KECCAK256 calls")
            st.a, st.b = a, size
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(size & 0x7FFF).bit_count()] + [0] * 15
            )
            sw = (size + 31) // 32
            st.ksw, st.ksl = sw, 32 * sw - size
            waddr = a // 32
            dyn = mem_expand(st, (waddr + sw) if size else 0)
            use(30 + 6 * sw + dyn)
            words = [mem_words.get(waddr + i, 0) for i in range(sw)]
            st.kreads = [(waddr + i, w) for i, w in enumerate(words)]
            data = b"".join(w.to_bytes(32, "big") for w in words)[:size]
            from ...utils.keccak_py import keccak256

            digest = keccak256(data)
            keccak_calls.append((len(steps) - 1, waddr, size, words, digest))
            push(int.from_bytes(digest, "big"), sp - 2)
        elif op == 0x1A:
            st.name = "byte"
            a, b_ = pop2()  # a = byte index, b = value
            use(3)
            st.a, st.b = a, b_
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(a >> 5).bit_count()] + [0] * 15
            )
            if st.taken:  # index >= 32
                push(0, sp - 2)
            else:
                st.qsel = a
                push((b_ >> (8 * (31 - a))) & 0xFF, sp - 2)
        elif op in (0x1B, 0x1C, 0x1D):
            st.name = {0x1B: "shl", 0x1C: "shr", 0x1D: "sar"}[op]
            a, b_ = pop2()  # a = shift amount, b = value
            use(3)
            st.a, st.b = a, b_
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(a >> 8).bit_count()] + [0] * 15
            )
            sign = b_ >> 255
            if st.taken:  # shift >= 256
                push(_M256 * sign if op == 0x1D else 0, sp - 2)
            else:
                s = a & 0xFF
                st.qsel, st.rsel = s >> 3, s & 7
                if op == 0x1B:
                    bp = (b_ << (8 * st.qsel)) & _M256
                    c = (bp << st.rsel) & _M256
                else:
                    sb = b_ - (1 << 256) if (op == 0x1D and sign) else b_
                    bp = (sb >> (8 * st.qsel)) & _M256
                    c = (sb >> (8 * st.qsel + st.rsel)) & _M256
                st.w = bp
                push(c, sp - 2)
        elif op == 0x35:
            st.name = "calldataload"
            a = pop1()
            use(3)
            st.a = a
            size = env.calldatasize
            st.w = (a - size) & _M256
            st.carries = _add_carries(size, st.w)
            if st.carries[15]:  # a < size
                cd_loads[a] = cd_loads.get(a, 0) + 1
                word = calldata[a : a + 32].ljust(32, b"\x00")
                push(int.from_bytes(word, "big"), sp - 1)
            else:
                push(0, sp - 1)
        elif op == 0x37:
            st.name = "calldatacopy"
            if sp < 3:
                raise UncoveredFrame("stack underflow")
            dest, off = pop2()
            size = stack.pop()
            st.accesses.append((2, sp - 3, 0, size))
            if dest % 32 or dest >= (1 << 18):
                raise UncoveredFrame("unaligned or far CALLDATACOPY dest")
            if size >= (1 << 13):
                raise UncoveredFrame("CALLDATACOPY size beyond bound")
            if off >= (1 << 15):
                raise UncoveredFrame("CALLDATACOPY offset beyond bound")
            st.a, st.b, st.w = dest, size, off
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(size & 0x7FFF).bit_count()] + [0] * 15
            )
            sw = (size + 31) // 32
            slack = 32 * sw - size
            st.ksw, st.ksl = sw, slack
            destw = dest // 32
            dyn = mem_expand(st, (destw + sw) if size else 0)
            use(3 + 3 * sw + dyn)
            words = []
            src_words = []
            tail_old = None
            for i in range(sw):
                src = off + 32 * i
                chunk = calldata[src : src + 32]
                srcw = int.from_bytes(chunk.ljust(32, b"\x00"), "big")
                src_words.append(srcw)
                if slack and i == sw - 1:  # tail splice keeps old bytes
                    t_keep = 8 * slack
                    tail_old = mem_words.get(destw + i, 0)
                    wv = (srcw >> t_keep << t_keep) | (
                        tail_old & ((1 << t_keep) - 1)
                    )
                else:
                    wv = srcw
                words.append(wv)
                mem_words[destw + i] = wv
                if src < env.calldatasize:  # bridge's calldata send
                    cd_loads[src] = cd_loads.get(src, 0) + 1
            copy_calls.append(
                (
                    "calldata", len(steps) - 1, destw, off, sw, slack,
                    words, src_words, tail_old,
                )
            )
        elif op == 0x39:
            st.name = "codecopy"
            if sp < 3:
                raise UncoveredFrame("stack underflow")
            dest, off = pop2()
            size = stack.pop()
            st.accesses.append((2, sp - 3, 0, size))
            if dest % 32 or dest >= (1 << 18):
                raise UncoveredFrame("unaligned or far CODECOPY dest")
            if size >= (1 << 13):
                raise UncoveredFrame("CODECOPY size beyond bound")
            if off >= (1 << 15):
                raise UncoveredFrame("CODECOPY offset beyond bound")
            st.a, st.b, st.w = dest, size, off
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(size & 0x7FFF).bit_count()] + [0] * 15
            )
            sw = (size + 31) // 32
            slack = 32 * sw - size
            st.ksw, st.ksl = sw, slack
            destw = dest // 32
            dyn = mem_expand(st, (destw + sw) if size else 0)
            use(3 + 3 * sw + dyn)
            words = []
            tail_old = None
            for i in range(sw):
                chunk = code[off + 32 * i : off + 32 * i + 32]
                srcw = int.from_bytes(chunk.ljust(32, b"\x00"), "big")
                if slack and i == sw - 1:
                    t_keep = 8 * slack
                    tail_old = mem_words.get(destw + i, 0)
                    wv = (srcw >> t_keep << t_keep) | (
                        tail_old & ((1 << t_keep) - 1)
                    )
                else:
                    wv = srcw
                words.append(wv)
                mem_words[destw + i] = wv
            copy_calls.append(
                (
                    "code", len(steps) - 1, destw, off, sw, slack,
                    words, None, tail_old,
                )
            )
        elif op == 0x3E:
            st.name = "returndatacopy"
            if sp < 3:
                raise UncoveredFrame("stack underflow")
            dest, off = pop2()
            size = stack.pop()
            st.accesses.append((2, sp - 3, 0, size))
            if size != 0 or off != 0:
                # returndata is empty in a covered frame; offset + size
                # > 0 exceptionally halts (EIP-211 bounds check)
                raise UncoveredFrame("RETURNDATACOPY with data")
            st.a, st.b, st.w = dest, 0, 0
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness([0] * 16)
            use(3)
        elif op == 0x50:
            st.name = "pop"
            a = pop1()
            use(2)
            st.a = a
        elif op == 0x51:
            st.name = "mload"
            a = pop1()
            if a >= (1 << 18):
                raise UncoveredFrame("far memory access")
            st.a = a
            waddr = a // 32
            k = a % 32
            st.qsel = k
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [k] + [0] * 15
            )
            use(3 + mem_expand(st, waddr + 1 + (1 if k else 0)))
            w1 = mem_words.get(waddr, 0)
            st.b = w1
            st.mem_access = (waddr, 0, w1)
            if k:
                w2 = mem_words.get(waddr + 1, 0)
                st.w = w2
                st.mem_access2 = (waddr + 1, 0, w2)
                v = ((w1 << (8 * k)) | (w2 >> (8 * (32 - k)))) & _M256
            else:
                v = w1
            push(v, sp - 1)
        elif op == 0x52:
            st.name = "mstore"
            a, v = pop2()  # a = offset, v = value
            if a >= (1 << 18):
                raise UncoveredFrame("far memory access")
            st.a, st.b = a, v
            waddr = a // 32
            k = a % 32
            st.qsel = k
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [k] + [0] * 15
            )
            use(3 + mem_expand(st, waddr + 1 + (1 if k else 0)))
            old1 = mem_words.get(waddr, 0)
            st.c = old1
            st.mem_access = (waddr, 0, old1)
            if k == 0:
                new1 = v
                st.mem_access3 = (waddr, 1, new1)
                mem_words[waddr] = new1
            else:
                old2 = mem_words.get(waddr + 1, 0)
                st.w = old2
                keep_hi = 8 * (32 - k)  # bits of word 1 kept (value terms)
                new1 = (old1 >> keep_hi << keep_hi) | (v >> (8 * k))
                new2 = ((v << keep_hi) & _M256) | (
                    old2 & ((1 << keep_hi) - 1)
                )
                st.mem_access2 = (waddr + 1, 0, old2)
                st.mem_access3 = (waddr, 1, new1)
                st.mem_access4 = (waddr + 1, 1, new2)
                mem_words[waddr] = new1
                mem_words[waddr + 1] = new2
        elif op == 0x53:
            st.name = "mstore8"
            a, v = pop2()  # a = offset, v = value
            if a >= (1 << 18):
                raise UncoveredFrame("far memory access")
            st.a, st.b = a, v
            waddr = a // 32
            k = a % 32  # big-endian byte index within the word
            st.qsel = k
            use(3 + mem_expand(st, waddr + 1))
            old = mem_words.get(waddr, 0)
            st.w = old
            shift = 8 * (31 - k)
            new = (old & ~(0xFF << shift)) | ((v & 0xFF) << shift)
            mem_words[waddr] = new
            st.c = new
            st.mem_access = (waddr, 0, old)
            st.mem_access2 = (waddr, 1, new)
        elif op == 0x54:
            st.name = "sload"
            a = pop1()
            if a not in storage_orig:
                raise UncoveredFrame("storage slot outside captured set")
            st.a = a
            st.scold = 0 if a in warm else 1
            warm.add(a)
            use(2100 if st.scold else 100)
            v = storage_cur[a]
            push(v, sp - 1)
            slot_counts[a] = slot_counts.get(a, 0) + 1
            storage_accesses.append(
                (a, 4 * (len(steps) - 1), 0, v, st.scold, 0, 0)
            )
        elif op == 0x55:
            st.name = "sstore"
            if gas_left <= 2300:
                raise UncoveredFrame("SSTORE sentry (EIP-2200)")
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(gas_left >> 12).bit_count()] + [0] * 15
            )
            st.sentry = 0 if st.taken else (gas_left & 0xFFF) - 2301
            a, new = pop2()
            if a not in storage_orig:
                raise UncoveredFrame("storage slot outside captured set")
            st.a, st.b = a, new
            st.scold = 0 if a in warm else 1
            warm.add(a)
            cur = storage_cur[a]
            orig = storage_orig[a]
            if new != cur and cur == orig:
                if orig == 0:
                    st.sg2 = 1
                else:
                    st.sg1 = 1
            cost = 100 + 2800 * st.sg1 + 19900 * st.sg2 + 2100 * st.scold
            use(cost)
            storage_cur[a] = new
            slot_counts[a] = slot_counts.get(a, 0) + 1
            storage_accesses.append(
                (a, 4 * (len(steps) - 1), 1, new, st.scold, st.sg1, st.sg2)
            )
        elif op == 0x59:
            st.name = "msize"
            use(2)
            push(32 * m_words, sp)
        elif op == 0xF3:
            st.name = "return"
            a, size = pop2()  # a = offset, size = length
            if a % 32 or a >= (1 << 18):
                raise UncoveredFrame("unaligned or far RETURN range")
            if size >= (1 << 13):
                raise UncoveredFrame("RETURN size beyond covered bound")
            st.a, st.b = a, size
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(size & 0x7FFF).bit_count()] + [0] * 15
            )
            sw = (size + 31) // 32
            st.ksw, st.ksl = sw, 32 * sw - size
            use(mem_expand(st, (a // 32 + sw) if size else 0))
            break
        elif 0xA0 <= op <= 0xA4:
            st.name = "log"
            st.fam_n = op - 0x9F  # topics = fam_n - 1
            topics = op - 0xA0
            if sp < 2 + topics:
                raise UncoveredFrame("stack underflow")
            a, size = pop2()  # offset, size (stack-channel reads)
            # topic values are popped WITHOUT stack-channel reads: they
            # only feed the receipt log (outside the frame statement) and
            # popped cells are always re-written before any further read
            for _ in range(topics):
                stack.pop()
            if a % 32 or a >= (1 << 18):
                raise UncoveredFrame("unaligned or far LOG range")
            if size >= (1 << 13):
                raise UncoveredFrame("LOG size beyond covered bound")
            st.a, st.b = a, size
            st.nz, st.inv, st.s_inv, st.taken = _nonzero_witness(
                [(size & 0x7FFF).bit_count()] + [0] * 15
            )
            sw = (size + 31) // 32
            st.ksw, st.ksl = sw, 32 * sw - size
            dyn = mem_expand(st, (a // 32 + sw) if size else 0)
            use(375 * (topics + 1) + 8 * size + dyn)
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
        calldata=calldata,
        cd_loads=cd_loads,
        m_final=m_words,
        keccak_calls=keccak_calls,
        arith_calls=arith_calls,
        copy_calls=copy_calls,
        storage_accesses=storage_accesses,
        storage_groups=sorted(
            (
                slot,
                storage_orig[slot],
                cnt,
                1 if slot in prewarm else 0,
                storage_cur[slot],
            )
            for slot, cnt in slot_counts.items()
        ),
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
        if st.mulc is not None:
            for k in range(32):
                for t in range(13):
                    row[MULC0 + 13 * k + t] = (st.mulc[k] >> t) & 1
        if st.dmt is not None:
            for k in range(32):
                row[DMB0 + k] = st.dmb[k]
                for t in range(8):
                    row[DMT0 + 8 * k + t] = (st.dmt[k] >> t) & 1
        if st.qsel >= 0:
            row[OHQ0 + st.qsel] = 1
        if st.rsel >= 0:
            row[OHR0 + st.rsel] = 1
        if st.expL >= 0:
            row[SCRATCH0 + st.expL] = 1
        row[SCOLD] = st.scold
        row[SG1] = st.sg1
        row[SG2] = st.sg2
        if st.name == "sstore":
            for i in range(12):
                row[MULC0 + i] = (st.sentry >> i) & 1
        row[MW_GROW] = st.grow
        for i in range(14):
            row[MW_D0 + i] = (st.d >> i) & 1
        for i in range(9):
            row[MW_R0 + i] = (st.r0 >> i) & 1
            row[MW_R1 + i] = (st.r1 >> i) & 1
        for i in range(18):
            row[MW_DQ0 + i] = (st.dq >> i) & 1
        for i in range(14):
            row[MEMB0 + i] = (st.m_before >> i) & 1
        for i in range(10):
            row[KSW0 + i] = (st.ksw >> i) & 1
        for i in range(5):
            row[KSL0 + i] = (st.ksl >> i) & 1
        row[KNEED] = st.kneed
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
        for i in range(14):
            row[MEMB0 + i] = (ft.m_final >> i) & 1
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
    num_bus_values = NUM_BUS
    quotient_chunks = 2
    eager_quotient = True  # see prover._quotient_stage_for

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
        chi, gamma_f, gamma_s, gamma_c, gamma_m = challenges[:5]
        gamma_k = challenges[CHAL_K]
        pows = _np_chi_pows(chi, 97)
        t, flags, fam_n, sp = self._cols(trace)
        n = trace.shape[0]
        clk = t[:, CLK]
        halted = t[:, HALTED]
        bytesA = _bits_to_bytes(trace[:, A0 : A0 + 256])
        bytesB = _bits_to_bytes(trace[:, B0 : B0 + 256])
        bytesC = _bits_to_bytes(trace[:, C0 : C0 + 256])
        gf = np.array([x % bb.P for x in gamma_f], dtype=np.uint64)
        gs = np.array([x % bb.P for x in gamma_s], dtype=np.uint64)
        gc = np.array([x % bb.P for x in gamma_c], dtype=np.uint64)
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
        # calldata sends (in-bounds loads only: carry15 == 1)
        cdl_act = flags["calldataload"] * t[:, CARRY0 + 15] % _PU
        offset = sum(t[:, A0 + b] << np.uint64(b) for b in range(16))
        code_c = _np_tuple_code(
            offset, [(bytesC[:, j], j + 1) for j in range(32)], pows
        )
        inv_c = ef.npef_inv(ef.npef_sub(gc[None, :], code_c))
        cdl_terms = ef.npef_mul(ef.npef_from_base(cdl_act), inv_c)
        # memory sends (word-granular RAM tuples)
        gm = np.array([x % bb.P for x in gamma_m], dtype=np.uint64)
        m8 = flags["mstore8"]
        mem_act = (flags["mload"] + flags["mstore"] + m8) % _PU
        waddr = sum(t[:, A0 + b] << np.uint64(b - 5) for b in range(5, 18))
        bytesW = _bits_to_bytes(trace[:, W0 : W0 + 256])
        # first tuple value: C (MSTORE's old word / the generic slot),
        # except MLOAD (word B) and MSTORE8's READ of the old word (W)
        vmem = np.where(
            flags["mload"][:, None] == 1,
            bytesB,
            np.where(m8[:, None] == 1, bytesW, bytesC),
        )
        code_m = _np_tuple_code(
            waddr,
            [(4 * clk, 1)]
            + [(vmem[:, j], j + 3) for j in range(32)],
            pows,
        )
        inv_m = ef.npef_inv(ef.npef_sub(gm[None, :], code_m))
        mem_terms = ef.npef_mul(ef.npef_from_base(mem_act), inv_m)
        # second tuple: MSTORE8's spliced-word WRITE at waddr, or an
        # unaligned MLOAD/MSTORE second-word READ at waddr + 1
        mld = flags["mload"]
        mst = flags["mstore"]
        k_low5 = sum(t[:, A0 + bit] << np.uint64(bit) for bit in range(5))
        unal = (k_low5 != 0).astype(np.uint64)
        v2 = np.where((mld + mst)[:, None] == 1, bytesW, bytesC)
        code_m2 = _np_tuple_code(
            (waddr + mld + mst) % _PU,
            [(4 * clk + 1, 1), (m8, 2)]
            + [(v2[:, j], j + 3) for j in range(32)],
            pows,
        )
        inv_m2 = ef.npef_inv(ef.npef_sub(gm[None, :], code_m2))
        mem2_terms = ef.npef_mul(
            ef.npef_from_base((m8 + (mld + mst) * unal) % _PU), inv_m2
        )
        # calldata-copy call sends: clk + destw*chi + off*chi^2 + sw*chi^3
        gcp = np.array(
            [x % bb.P for x in challenges[CHAL_CP]], dtype=np.uint64
        )
        cdc = flags["calldatacopy"]
        ccp = flags["codecopy"]
        offv = sum(t[:, W0 + bit] << np.uint64(bit) for bit in range(15))
        swv = sum(t[:, KSW0 + i] << np.uint64(i) for i in range(10))
        slackv = sum(t[:, KSL0 + i] << np.uint64(i) for i in range(5))
        code_cp = _np_tuple_code(
            clk,
            [(waddr, 1), (offv, 2), (swv, 3), (ccp, 4), (slackv, 5)],
            pows,
        )
        inv_cp = ef.npef_inv(ef.npef_sub(gcp[None, :], code_cp))
        cp_terms = ef.npef_mul(ef.npef_from_base((cdc + ccp) % _PU), inv_cp)
        # third/fourth tuples: MSTORE's spliced word-1 / word-2 WRITES
        # (values derived host-side exactly as the circuit's one-hot
        # pattern sums)
        k_int = k_low5.astype(np.int64)
        n = trace.shape[0]
        v3 = np.zeros_like(bytesC)
        v4 = np.zeros_like(bytesC)
        for r in range(n):
            if mst[r] != 1:
                continue
            k = int(k_int[r])
            old1 = sum(int(bytesC[r, j]) << (8 * j) for j in range(32))
            old2 = sum(int(bytesW[r, j]) << (8 * j) for j in range(32))
            vv = sum(int(bytesB[r, j]) << (8 * j) for j in range(32))
            keep = 8 * (32 - k)
            if k == 0:
                n1, n2 = vv, 0
            else:
                n1 = (old1 >> keep << keep) | (vv >> (8 * k))
                n2 = ((vv << keep) & ((1 << 256) - 1)) | (
                    old2 & ((1 << keep) - 1)
                )
            for j in range(32):
                v3[r, j] = (n1 >> (8 * j)) & 0xFF
                v4[r, j] = (n2 >> (8 * j)) & 0xFF
        code_m3 = _np_tuple_code(
            waddr,
            [(4 * clk + 2, 1), (np.ones_like(clk), 2)]
            + [(v3[:, j], j + 3) for j in range(32)],
            pows,
        )
        inv_m3 = ef.npef_inv(ef.npef_sub(gm[None, :], code_m3))
        mem3_terms = ef.npef_mul(ef.npef_from_base(mst % _PU), inv_m3)
        code_m4 = _np_tuple_code(
            (waddr + 1) % _PU,
            [(4 * clk + 3, 1), (np.ones_like(clk), 2)]
            + [(v4[:, j], j + 3) for j in range(32)],
            pows,
        )
        inv_m4 = ef.npef_inv(ef.npef_sub(gm[None, :], code_m4))
        mem4_terms = ef.npef_mul(
            ef.npef_from_base((mst * unal) % _PU), inv_m4
        )
        # hash-call sends (KECCAK256)
        gk = np.array([x % bb.P for x in gamma_k], dtype=np.uint64)
        size_lo = sum(t[:, B0 + bit] << np.uint64(bit) for bit in range(16))
        code_k = _np_tuple_code(
            clk,
            [(waddr, 1), (size_lo, 2)]
            + [(bytesC[:, j], j + 3) for j in range(32)],
            pows,
        )
        inv_k = ef.npef_inv(ef.npef_sub(gk[None, :], code_k))
        kcall_terms = ef.npef_mul(
            ef.npef_from_base(flags["keccak"]), inv_k
        )
        # storage sends (SLOAD/SSTORE)
        gamma_st = challenges[CHAL_ST]
        gst = np.array([x % bb.P for x in gamma_st], dtype=np.uint64)
        sl, ss = flags["sload"], flags["sstore"]
        v_st = np.where(ss[:, None] == 1, bytesB, bytesC)
        code_st = _np_tuple_code(
            4 * clk,
            [
                (ss, 1),
                (t[:, SCOLD], 2),
                (t[:, SG1], 3),
                (t[:, SG2], 4),
            ]
            + [(bytesA[:, j], j + 5) for j in range(32)]
            + [(v_st[:, j], j + 37) for j in range(32)],
            pows,
        )
        inv_st = ef.npef_inv(ef.npef_sub(gst[None, :], code_st))
        stor_terms = ef.npef_mul(ef.npef_from_base((sl + ss) % _PU), inv_st)
        # signed-arithmetic sends (SDIV/SMOD -> ArithAir):
        #   kind + sum_j a_j chi^{1+j} + b_j chi^{33+j} + c_j chi^{65+j}
        gar = np.array(
            [x % bb.P for x in challenges[CHAL_AR]], dtype=np.uint64
        )
        kind = (flags["sdiv"] + 2 * flags["smod"] + 3 * flags["exp"]) % _PU
        code_ar = _np_tuple_code(
            kind,
            [(bytesA[:, j], 1 + j) for j in range(32)]
            + [(bytesB[:, j], 33 + j) for j in range(32)]
            + [(bytesC[:, j], 65 + j) for j in range(32)],
            pows,
        )
        inv_ar = ef.npef_inv(ef.npef_sub(gar[None, :], code_ar))
        ar_terms = ef.npef_mul(
            ef.npef_from_base(
                (flags["sdiv"] + flags["smod"] + flags["exp"]) % _PU
            ),
            inv_ar,
        )
        # stack sends
        p21 = sum(flags[nm] for nm in _POP2PUSH1)
        cdl = flags["calldataload"]
        mld, mst, msz = flags["mload"], flags["mstore"], flags["msize"]
        cdc_f = (
            flags["calldatacopy"] + flags["codecopy"]
            + flags["returndatacopy"]
        )
        pops_w0 = (
            2 * p21 + flags["iszero"] + flags["not"] + flags["swap"]
            + cdl + mld + sl + 3 * cdc_f
        )
        env_sum = sum(flags[nm] for nm in ENV_OPS)
        ret = flags["return"]
        active = [
            p21
            + flags["iszero"] + flags["not"] + flags["pop"]
            + flags["jump"] + flags["jumpi"] + flags["dup"] + flags["swap"]
            + cdl + mld + mst + sl + ss + ret + flags["log"]
            + flags["mstore8"] + cdc_f,
            p21 + flags["jumpi"] + flags["swap"] + mst + ss + ret
            + flags["log"] + flags["mstore8"] + cdc_f,
            p21
            + flags["iszero"] + flags["not"] + flags["push0"] + flags["push"]
            + flags["dup"] + flags["swap"] + flags["pc"] + flags["gas"]
            + env_sum + cdl + mld + msz + sl + cdc_f,
            flags["swap"],
        ]
        addr = [
            (sp + _PU - 1 - flags["dup"] * (fam_n - 1)) % _PU,
            (sp + 2 * _PU - 2 - flags["swap"] * (fam_n - 1)) % _PU,
            (sp + _PU * 2 - pops_w0) % _PU,
            (sp + _PU - 1 - flags["swap"] * fam_n) % _PU,
        ]
        w0_bytes = np.where(
            (flags["swap"] + cdc_f)[:, None] == 1, bytesB, bytesC
        )
        slot1 = np.where(cdc_f[:, None] == 1, bytesW, bytesB)
        vbytes = [bytesA, slot1, w0_bytes, bytesA]
        slot_terms = []
        for s in range(4):
            iw_s = np.full(n, s >= 2, dtype=np.uint64)
            if s == 2:
                iw_s = iw_s - cdc_f  # CALLDATACOPY's third pop is a READ
            code = _np_tuple_code(
                addr[s],
                [(4 * clk + s, 1), (iw_s % _PU, 2)]
                + [(vbytes[s][:, j], j + 3) for j in range(32)],
                pows,
            )
            inv = ef.npef_inv(ef.npef_sub(gs[None, :], code))
            slot_terms.append(ef.npef_mul(ef.npef_from_base(active[s] % _PU), inv))
        return (
            fetch_terms,
            slot_terms,
            cdl_terms,
            mem_terms,
            kcall_terms,
            stor_terms,
            ar_terms,
            mem2_terms,
            mem3_terms,
            mem4_terms,
            cp_terms,
        )

    @staticmethod
    def _excl_prefix(terms: np.ndarray) -> np.ndarray:
        c = np.cumsum(terms, axis=0) % _PU
        return ef.npef_sub(c, terms)  # plain uint64 subtract would wrap

    def aux_trace(self, trace: np.ndarray, challenges) -> np.ndarray:
        (
            fetch_terms,
            slot_terms,
            cdl_terms,
            mem_terms,
            kcall_terms,
            stor_terms,
            ar_terms,
            mem2_terms,
            mem3_terms,
            mem4_terms,
            cp_terms,
        ) = self._channel_terms(trace, challenges)
        aux = np.zeros((trace.shape[0], CPU_AUX_W), dtype=np.uint32)
        aux[:, AUX_F : AUX_F + 4] = self._excl_prefix(fetch_terms)
        for s in range(4):
            aux[:, AUX_SLOT0 + 4 * s : AUX_SLOT0 + 4 * s + 4] = self._excl_prefix(
                slot_terms[s]
            )
        aux[:, AUX_CD : AUX_CD + 4] = self._excl_prefix(cdl_terms)
        aux[:, AUX_M : AUX_M + 4] = self._excl_prefix(mem_terms)
        aux[:, AUX_K : AUX_K + 4] = self._excl_prefix(kcall_terms)
        aux[:, AUX_ST : AUX_ST + 4] = self._excl_prefix(stor_terms)
        aux[:, AUX_AR : AUX_AR + 4] = self._excl_prefix(ar_terms)
        aux[:, AUX_M2 : AUX_M2 + 4] = self._excl_prefix(mem2_terms)
        aux[:, AUX_M3 : AUX_M3 + 4] = self._excl_prefix(mem3_terms)
        aux[:, AUX_M4 : AUX_M4 + 4] = self._excl_prefix(mem4_terms)
        aux[:, AUX_CP : AUX_CP + 4] = self._excl_prefix(cp_terms)
        return aux

    def bus_values(self, trace: np.ndarray, challenges) -> list[tuple]:
        (
            fetch_terms,
            slot_terms,
            cdl_terms,
            mem_terms,
            kcall_terms,
            stor_terms,
            ar_terms,
            mem2_terms,
            mem3_terms,
            mem4_terms,
            cp_terms,
        ) = self._channel_terms(trace, challenges)
        # the last row is always halted padding: its own terms vanish
        fetch = tuple(int(v) for v in fetch_terms.sum(axis=0) % _PU)
        stack = ef.H_ZERO
        for st in slot_terms:
            stack = ef.h_add(stack, tuple(int(v) for v in st.sum(axis=0) % _PU))
        cdl = tuple(int(v) for v in cdl_terms.sum(axis=0) % _PU)
        mem = tuple(
            int(v)
            for v in (
                mem_terms.sum(axis=0)
                + mem2_terms.sum(axis=0)
                + mem3_terms.sum(axis=0)
                + mem4_terms.sum(axis=0)
            )
            % _PU
        )
        kcall = tuple(int(v) for v in kcall_terms.sum(axis=0) % _PU)
        stor = tuple(int(v) for v in stor_terms.sum(axis=0) % _PU)
        ar = tuple(int(v) for v in ar_terms.sum(axis=0) % _PU)
        cp = tuple(int(v) for v in cp_terms.sum(axis=0) % _PU)
        return [
            fetch, stack, cdl, mem, ef.H_ZERO, ef.H_ZERO, kcall, stor, ar, cp,
        ]

    # ------------------------------- constraints -------------------------
    def eval(self, b: ConstraintBuilder) -> None:  # noqa: C901
        one = b.constant(1)
        chi = b.challenge_ef(CHAL_CHI)
        chi2 = b.ef_mul4(chi, chi)
        g_f = b.challenge_ef(CHAL_F)
        g_s = b.challenge_ef(CHAL_S)
        g_c = b.challenge_ef(CHAL_C)
        g_m = b.challenge_ef(CHAL_M)
        g_k = b.challenge_ef(CHAL_K)
        g_st = b.challenge_ef(CHAL_ST)

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
            + list(range(SCRATCH0, KNEED))  # KNEED itself is a raw column
            + list(range(DMB0, CPU_WIDTH))
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
        # log n <= 5: n-1 in 0..4 — bits 3/4 clear, and bit 2 excludes 5..7
        b.all_rows(
            b.mul(f["log"], b.add(b.local(FAMB0 + 3), b.local(FAMB0 + 4)))
        )
        b.all_rows(
            b.mul(
                b.mul(f["log"], b.local(FAMB0 + 2)),
                b.add(b.local(FAMB0), b.local(FAMB0 + 1)),
            )
        )

        # 4. halting discipline (STOP or RETURN)
        b.first_row(halted)
        b.transition(
            b.sub(b.sub(b.sub(halted_n, halted), f["stop"]), f["return"])
        )
        b.last_row(b.sub(halted, one))

        # 5. clock
        b.first_row(clk)
        b.transition(b.sub(clk_n, b.add(clk, one)))

        # 6. program counter
        b.first_row(pc)
        dest = lA[0]
        seq = b.sub(
            b.sub(
                b.sub(b.sub(b.sub(one, halted), f["stop"]), f["jump"]),
                f["jumpi"],
            ),
            f["return"],
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
        # LOGn pops 2 + topics = fam_n + 1
        delta = b.sub(delta, b.mul(f["log"], b.add(fam_n, one)))
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
        # dynamic memory expansion: 3 per new word + the quadratic-term
        # delta (witnessed as dq, bound in section 14d), plus KECCAK256's
        # 6 gas per hashed word
        f_kec = f["keccak"]
        f_ret = f["return"]
        f_log = f["log"]
        f_m8 = f["mstore8"]
        # keccak/return/log/calldatacopy/codecopy all meter a
        # word-aligned (offset, size) range via the sw/slack machinery
        f_kr = b.add(
            b.add(b.add(f_kec, f_ret), f_log),
            b.add(f["calldatacopy"], f["codecopy"]),
        )
        # expansion/dq group (MSTORE8 expands too, at ANY byte offset)
        f_mx = b.add(b.add(b.add(f["mload"], f["mstore"]), f_kr), f_m8)

        def reg_val(base: int, nbits: int, nx: bool):
            g = b.next if nx else b.local
            acc = None
            for i in range(nbits):
                t = b.scale(1 << i, g(base + i))
                acc = t if acc is None else b.add(acc, t)
            return acc

        M = reg_val(MEMB0, 14, False)
        M_n = reg_val(MEMB0, 14, True)
        dqval = reg_val(MW_DQ0, 18, False)
        swval = reg_val(KSW0, 10, False)
        cost = b.add(cost, b.add(b.scale(3, b.sub(M_n, M)), b.mul(f_mx, dqval)))
        cost = b.add(cost, b.scale(6, b.mul(f_kec, swval)))
        # CALLDATACOPY: 3 per copied word; size must be a word multiple
        # (slack = 0) and the offset (W) must fit 15 bits
        cost = b.add(
            cost,
            b.scale(3, b.mul(b.add(f["calldatacopy"], f["codecopy"]), swval)),
        )
        # LOGn: 375*n (n = topics + 1) + 8*size (size = B low 15 bits,
        # bound by the f_kr group's 32*sw = size + slack constraint)
        cost = b.add(cost, b.mul(f_log, b.scale(375, fam_n)))
        cost = b.add(cost, b.scale(8, b.mul(f_log, lB[0])))
        # EXP: 10 + 50*L where the 33-wide one-hot at SCRATCH0 selects the
        # exponent byte length L; bytes >= L of B must be zero (suffix
        # sums).  L can only be OVER-claimed (never under: the suffix
        # check forbids it), i.e. a dishonest prover can at most charge
        # itself extra gas — same trust class as the frame gas publics.
        f_exp = f["exp"]
        exp_oh = [b.local(SCRATCH0 + i) for i in range(33)]
        oh_sum = exp_oh[0]
        lsum = None
        for i in range(1, 33):
            oh_sum = b.add(oh_sum, exp_oh[i])
            t = b.scale(i, exp_oh[i])
            lsum = t if lsum is None else b.add(lsum, t)
        b.all_rows(b.mul(f_exp, b.sub(oh_sum, one)))
        cost = b.add(
            cost, b.mul(f_exp, b.add(b.constant(10), b.scale(50, lsum)))
        )
        # minimality: the byte at L-1 must be NONZERO (L cannot be over-
        # claimed; the suffix check already forbids under-claims).  The
        # selected byte is materialized in S_INV (raw, unused by the
        # nonzero gadget on exp rows since its inputs are all zero) and
        # inverted through INV0[0].
        # (the selected-byte sum is emitted in 14a next to bbytes)
        # storage gas (EIP-2929/2200): SLOAD 100 + 2000*cold; SSTORE
        # 100 + 2800*g1 + 19900*g2 + 2100*cold
        f_sl, f_ss = f["sload"], f["sstore"]
        scold = b.local(SCOLD)
        sg1 = b.local(SG1)
        sg2 = b.local(SG2)
        cost = b.add(cost, b.scale(100, b.add(f_sl, f_ss)))
        cost = b.add(cost, b.scale(2000, b.mul(f_sl, scold)))
        cost = b.add(cost, b.scale(2100, b.mul(f_ss, scold)))
        cost = b.add(cost, b.add(b.scale(2800, sg1), b.scale(19900, sg2)))
        b.transition(b.sub(G_n, b.sub(G, cost)))
        # EXP byte-length suffix check (bbytes defined in section 14a;
        # emitted there to reuse the byte linmaps)

        # 9. the shared 256-bit adder gadget: X + Y = Z + carry-out*2^256
        def flip_limb(l15, msb):
            # top limb with the sign bit inverted: l + 2^15 - 2^16*msb
            return b.sub(b.add(l15, b.constant(1 << 15)), b.scale(1 << 16, msb))

        a_msb = b.local(A0 + 255)
        b_msb = b.local(B0 + 255)
        lAf15 = flip_limb(lA[15], a_msb)
        lBf15 = flip_limb(lB[15], b_msb)
        cmp_f = fsum(_CMP)
        f_cdl = f["calldataload"]
        # block form: limb blocks with the sign-flipped top limb variants
        lAf = b.concat_rows([lA[:15], b.stack_block([lAf15])])
        lBf = b.concat_rows([lB[:15], b.stack_block([lBf15])])
        sizeblk = b.public_block(
            range(PUB_ENV0 + 16 * ENV_IDX_CDSIZE, PUB_ENV0 + 16 * ENV_IDX_CDSIZE + 16)
        )
        cb = b.local_block(range(CARRY0, CARRY0 + 16))
        cb_prev = b.concat_rows([b.scale(0, cb[:1]), cb[:15]])
        X = b.add(
            b.add(b.mul(f["add"], lA), b.mul(b.add(f["sub"], f["lt"]), lB)),
            b.add(
                b.add(b.mul(f["gt"], lA), b.mul(f_cdl, sizeblk)),
                b.add(b.mul(f["slt"], lBf), b.mul(f["sgt"], lAf)),
            ),
        )
        Y = b.add(
            b.add(b.mul(f["add"], lB), b.mul(f["sub"], lC)),
            b.mul(b.add(cmp_f, f_cdl), lW),
        )
        Z = b.add(
            b.add(b.mul(f["add"], lC), b.mul(b.add(f["sub"], f["lt"]), lA)),
            b.add(
                b.add(b.mul(f["gt"], lB), b.mul(f_cdl, lA)),
                b.add(b.mul(f["slt"], lAf), b.mul(f["sgt"], lBf)),
            ),
        )
        b.all_rows_block(
            b.sub(
                b.add(b.add(X, Y), cb_prev),
                b.add(Z, b.scale(1 << 16, cb)),
            ),
            16,
        )

        # 10. nonzero gadget (EQ / ISZERO / JUMPI condition / shift "big"
        # / DIV-MOD divisor / KECCAK256 size / SIGNEXTEND index)
        f_sh3 = fsum(_SHIFTS)
        f_byte = f["byte"]
        f_se = f["signextend"]
        f_dm = b.add(f["div"], f["mod"])
        # "shift amount >= 256" <=> some A bit >= 8; "index >= 32" <=> >= 5
        a_hi8 = b.linmap([[1] * 248], b.local_block(range(A0 + 8, A0 + 256)))[0]
        a_hi5 = b.linmap([[1] * 251], b.local_block(range(A0 + 5, A0 + 256)))[0]
        b_lo15 = b.linmap([[1] * 15], b.local_block(range(B0, B0 + 15)))[0]
        g_hi20 = b.linmap(
            [[1] * 20], b.local_block(range(GASB0 + 12, GASB0 + 32))
        )[0]
        # block form: all 16 limb inputs at once; the single-limb inputs
        # (shift/BYTE/SIGNEXTEND/KECCAK/RETURN/SSTORE gates) live on row 0
        o_low5 = None
        for bit in range(5):
            t = b.scale(1 << bit, b.local(A0 + bit))
            o_low5 = t if o_low5 is None else b.add(o_low5, t)
        extra0 = b.add(
            b.add(b.mul(f_sh3, a_hi8), b.mul(b.add(f_byte, f_se), a_hi5)),
            b.add(
                b.add(
                    b.mul(
                        b.add(
                            b.add(f_kec, f["return"]),
                            b.add(
                                f["log"],
                                b.add(f["calldatacopy"], f["codecopy"]),
                            ),
                        ),
                        b_lo15,
                    ),
                    b.mul(f["sstore"], g_hi20),
                ),
                b.mul(b.add(f["mload"], f["mstore"]), o_low5),
            ),
        )
        inp_blk = b.add(
            b.add(
                b.mul(f["eq"], b.sub(lA, lB)),
                b.add(b.mul(f["iszero"], lA), b.mul(f["jumpi"], lB)),
            ),
            b.add(
                b.mul(f_dm, lB),
                b.concat_rows([b.stack_block([extra0]), b.scale(0, lA[:15])]),
            ),
        )
        nzb = b.local_block(range(NZ0, NZ0 + 16))
        invb = b.local_block(range(INV0, INV0 + 16))
        b.all_rows_block(b.sub(nzb, b.mul(inp_blk, invb)), 16)
        b.all_rows_block(b.mul(inp_blk, b.sub(one, nzb)), 16)
        s_acc = b.block_rowsum(nzb)
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

        # 14a. MUL: schoolbook byte product with 13-bit carries.  At each
        # output byte k: sum_{i+j=k} a_i*b_j + carry_{k-1} = c_k + 256*carry_k;
        # the high half of the product is discarded (mod 2^256 semantics).
        f_mul = f["mul"]
        abytes = b.linmap(_BYTE_MAT, Ablk)
        bbytes = b.linmap(_BYTE_MAT, Bblk)
        cbytes = b.linmap(_BYTE_MAT, Cblk)
        wbytes = b.linmap(_BYTE_MAT, Wblk)
        scratch_blk = b.local_block(range(SCRATCH0, SCRATCH0 + N_SCRATCH))
        mulc = b.linmap(_MULC_MAT, scratch_blk)
        mulc_prev = b.concat_rows([b.scale(0, mulc[:1]), mulc[:31]])

        def shift32_down(blk, k):
            """Row j -> blk[j - k] over a 32-row block (zeros below)."""
            if k == 0:
                return blk
            return b.concat_rows([b.scale(0, blk[:k]), blk[: 32 - k]])

        def byte_conv(qb):
            """32-row block: conv_k = sum_{i<=k} qb_i * b_{k-i} (block
            form: 32 scalar-row x block products instead of 528 scalar
            graph nodes — XLA compile time scales with node count)."""
            acc = None
            for i in range(32):
                t = b.mul(qb[i], shift32_down(bbytes, i))
                acc = t if acc is None else b.add(acc, t)
            return acc

        # suffix sums of B's bytes: suffix_i = sum_{j >= i} b_j, so the
        # whole discarded high half is sum_i qb_i * suffix_{32-i} (i>=1)
        _SUF_MAT = [[1 if j > 31 - i else 0 for j in range(32)] for i in range(32)]
        bsuffix = b.linmap(_SUF_MAT, bbytes)  # bsuffix[i] = sum_{j>=32-i} b_j

        def high_half(qb):
            acc = None
            for i in range(1, 32):
                t = b.mul(qb[i], bsuffix[i])
                acc = t if acc is None else b.add(acc, t)
            return acc

        # EXP suffix-zero: one-hot position i forbids any B byte >= i
        _ESUF = [
            [1 if j >= i else 0 for j in range(32)] for i in range(33)
        ]
        bsfx = b.linmap(_ESUF, bbytes)  # bsfx[i] = sum_{j>=i} b_j
        for i in range(33):
            b.all_rows(b.mul(b.mul(f_exp, exp_oh[i]), bsfx[i]))
        # EXP minimality: selected byte b_{L-1} (held in S_INV) nonzero
        vsel = None
        for i in range(1, 33):
            t = b.mul(exp_oh[i], bbytes[i - 1])
            vsel = t if vsel is None else b.add(vsel, t)
        b.all_rows(b.mul(f_exp, b.sub(s_inv, vsel)))
        b.all_rows(
            b.mul(
                f_exp,
                b.sub(
                    b.mul(s_inv, b.local(INV0)),
                    b.sub(one, exp_oh[0]),
                ),
            )
        )

        conv_ab = byte_conv(abytes)
        b.all_rows_block(
            b.mul(
                f_mul,
                b.sub(
                    b.add(conv_ab, mulc_prev),
                    b.add(cbytes, b.scale(256, mulc)),
                ),
            ),
            32,
        )

        # 14a'. DIV / MOD: q*b + r = a over the integers (same 13-bit
        # chain carries; DIV: q = C, r = W; MOD: q = W, r = C), the high
        # half of q*b forced to zero, and r <= b - 1 via a byte borrow
        # chain.  b == 0 (taken = 0 through the nonzero gadget on B's
        # limbs) forces q = r = 0 and the chain target becomes 0.
        dmbr = b.local_block(range(DMB0, DMB0 + 32))
        dmbr_prev = b.concat_rows([b.scale(0, dmbr[:1]), dmbr[:31]])
        _DMT_MAT = [[0] * 256 for _ in range(32)]
        for _k in range(32):
            for _t in range(8):
                _DMT_MAT[_k][8 * _k + _t] = 1 << _t
        tbytes = b.linmap(_DMT_MAT, b.local_block(range(DMT0, DMT0 + 256)))
        sub1 = b.const_vec([1] + [0] * 31)  # the "- 1" at byte 0
        for fg, qb, rb in ((f["div"], cbytes, wbytes), (f["mod"], wbytes, cbytes)):
            conv = byte_conv(qb)
            target = b.mul(taken, abytes)
            b.all_rows_block(
                b.mul(
                    fg,
                    b.sub(
                        b.add(b.add(conv, rb), mulc_prev),
                        b.add(target, b.scale(256, mulc)),
                    ),
                ),
                32,
            )
            b.all_rows(b.mul(fg, b.add(high_half(qb), mulc[31])))
            # borrow chain: b_k - r_k - [k==0] - br_{k-1} + 256*br_k = t_k
            chain = b.sub(
                b.add(b.sub(bbytes, rb), b.scale(256, dmbr)),
                b.add(b.add(sub1, dmbr_prev), tbytes),
            )
            b.all_rows_block(b.mul(fg, chain), 32)
        # no final borrow when b != 0; q = r = 0 when b == 0
        b.all_rows(b.mul(b.mul(f_dm, taken), dmbr[31]))
        not_taken_dm = b.mul(f_dm, b.sub(one, taken))
        b.all_rows_block(b.mul(not_taken_dm, Cblk), 256)
        b.all_rows_block(b.mul(not_taken_dm, Wblk), 256)

        # 14b. shifts / BYTE: two one-hot stages.  Stage 1 (byte shift by
        # q, one-hot OHQ) lands in the W region; stage 2 (bit shift by r,
        # one-hot OHR) produces C.  A shift amount >= 256 (taken=1, via
        # the nonzero gadget above) zeroes both one-hots, forcing C = 0
        # (SHL/SHR) or the sign fill (SAR).
        f_shl, f_shr, f_sar = f["shl"], f["shr"], f["sar"]
        ohq = [b.local(OHQ0 + q) for q in range(32)]
        ohr = [b.local(OHR0 + r) for r in range(8)]
        sum_ohq = ohq[0]
        wq1 = None  # sum q * ohq_q
        for q in range(1, 32):
            sum_ohq = b.add(sum_ohq, ohq[q])
            t = b.scale(q, ohq[q])
            wq1 = t if wq1 is None else b.add(wq1, t)
        sum_ohr = ohr[0]
        wr = None  # sum r * ohr_r
        for r in range(1, 8):
            sum_ohr = b.add(sum_ohr, ohr[r])
            t = b.scale(r, ohr[r])
            wr = t if wr is None else b.add(wr, t)
        not_big = b.sub(one, taken)
        f_m8q = f["mstore8"]
        shift_any = b.add(b.add(f_sh3, b.add(f_byte, f_se)), f_m8q)
        b.all_rows(b.mul(shift_any, b.sub(sum_ohq, not_big)))
        b.all_rows(b.mul(f_sh3, b.sub(sum_ohr, not_big)))
        b.all_rows(b.mul(b.add(b.add(f_byte, f_se), f_m8q), sum_ohr))
        s_low = None  # low byte of A (shift amount)
        for bit in range(8):
            t = b.scale(1 << bit, b.local(A0 + bit))
            s_low = t if s_low is None else b.add(s_low, t)
        i_low = None  # low 5 bits of A (BYTE index)
        for bit in range(5):
            t = b.scale(1 << bit, b.local(A0 + bit))
            i_low = t if i_low is None else b.add(i_low, t)
        b.all_rows(
            b.mul(f_sh3, b.sub(b.add(b.scale(8, wq1), wr), b.mul(not_big, s_low)))
        )
        b.all_rows(
            b.mul(
                b.add(b.add(f_byte, f_se), f_m8q),
                b.sub(wq1, b.mul(not_big, i_low)),
            )
        )

        def shift_up(blk, k):
            """Row i -> blk[i + k], zero beyond the end."""
            if k == 0:
                return blk
            return b.concat_rows([blk[k:], b.scale(0, blk[:k])])

        def shift_up_fill(blk, k, fill):
            if k == 0:
                return blk
            pad = b.mul(fill, b.add(b.scale(0, blk[:k]), one))
            return b.concat_rows([blk[k:], pad])

        def shift_down(blk, k):
            """Row i -> blk[i - k], zero below zero."""
            if k == 0:
                return blk
            return b.concat_rows([b.scale(0, blk[:k]), blk[: 256 - k]])

        def onehot_sum(sels, blocks):
            acc = None
            for s_, blk_ in zip(sels, blocks):
                t = b.mul(s_, blk_)
                acc = t if acc is None else b.add(acc, t)
            return acc

        # stage 1: W = B byte-shifted by q (sign-filled for SAR)
        b.all_rows_block(
            b.mul(
                f_shr,
                b.sub(Wblk, onehot_sum(ohq, [shift_up(Bblk, 8 * q) for q in range(32)])),
            ),
            256,
        )
        b.all_rows_block(
            b.mul(
                f_shl,
                b.sub(
                    Wblk, onehot_sum(ohq, [shift_down(Bblk, 8 * q) for q in range(32)])
                ),
            ),
            256,
        )
        b.all_rows_block(
            b.mul(
                f_sar,
                b.sub(
                    Wblk,
                    onehot_sum(
                        ohq, [shift_up_fill(Bblk, 8 * q, b_msb) for q in range(32)]
                    ),
                ),
            ),
            256,
        )
        # stage 2: C = W bit-shifted by r
        b.all_rows_block(
            b.mul(
                f_shr,
                b.sub(Cblk, onehot_sum(ohr, [shift_up(Wblk, r) for r in range(8)])),
            ),
            256,
        )
        b.all_rows_block(
            b.mul(
                f_shl,
                b.sub(Cblk, onehot_sum(ohr, [shift_down(Wblk, r) for r in range(8)])),
            ),
            256,
        )
        b.all_rows_block(
            b.mul(
                f_sar,
                b.sub(
                    Cblk,
                    b.add(
                        onehot_sum(
                            ohr, [shift_up_fill(Wblk, r, b_msb) for r in range(8)]
                        ),
                        b.mul(taken, b_msb),
                    ),
                ),
            ),
            256,
        )
        # MLOAD (any offset): one-hot bound to k = A mod 32 directly
        # (taken = [k != 0] via the nonzero gadget), value recombined
        # from the two read words: C = (B << 8k | W >> 8(32-k))
        f_mldq = b.add(f["mload"], f["mstore"])
        b.all_rows(b.mul(f_mldq, b.sub(sum_ohq, one)))
        b.all_rows(b.mul(f_mldq, b.sub(wq1, i_low)))
        b.all_rows(b.mul(f_mldq, sum_ohr))
        mld_acc = None
        for k in range(32):
            if k == 0:
                pat = Bblk
            else:
                pat = b.concat_rows([Wblk[8 * (32 - k) :], Bblk[: 256 - 8 * k]])
            t = b.mul(ohq[k], pat)
            mld_acc = t if mld_acc is None else b.add(mld_acc, t)
        b.all_rows_block(b.mul(f["mload"], b.sub(Cblk, mld_acc)), 256)

        # MSTORE8: C (the written word) = W (the read word) with the
        # big-endian byte k replaced by B's low byte
        m8_acc = None
        for k in range(32):
            lo = 8 * (31 - k)
            parts = []
            if lo > 0:
                parts.append(Wblk[:lo])
            parts.append(Bblk[:8])
            if lo + 8 < 256:
                parts.append(Wblk[lo + 8 :])
            pat = b.concat_rows(parts)
            t = b.mul(ohq[k], pat)
            m8_acc = t if m8_acc is None else b.add(m8_acc, t)
        b.all_rows_block(b.mul(f_m8q, b.sub(Cblk, m8_acc)), 256)

        # BYTE: C byte 0 = big-endian byte q of B; upper bits zero
        sel = None
        for q in range(32):
            bq = b.local_block(range(B0 + 8 * (31 - q), B0 + 8 * (31 - q) + 8))
            t = b.mul(ohq[q], bq)
            sel = t if sel is None else b.add(sel, t)
        c_low8 = b.local_block(range(C0, C0 + 8))
        b.all_rows_block(b.mul(f_byte, b.sub(c_low8, sel)), 8)
        byte_hi = b.local_block(range(C0 + 8, C0 + 256))
        b.all_rows_block(b.mul(f_byte, byte_hi), 248)
        # SIGNEXTEND: C = B through byte k, sign-filled above; k >= 32
        # (taken) copies B unchanged
        se_acc = None
        for q in range(32):
            keep = 8 * q + 8
            sign_bit = b.local(B0 + 8 * q + 7)
            fillpat = b.mul(
                sign_bit, b.add(b.scale(0, Bblk[: 256 - keep]), one)
            )
            pat = (
                Bblk
                if keep == 256
                else b.concat_rows([Bblk[:keep], fillpat])
            )
            t = b.mul(ohq[q], pat)
            se_acc = t if se_acc is None else b.add(se_acc, t)
        b.all_rows_block(
            b.mul(f_se, b.sub(Cblk, b.add(se_acc, b.mul(taken, Bblk)))), 256
        )

        # 14c. CALLDATALOAD: out-of-bounds (offset >= size, carry15 == 0)
        # pushes zero; in-bounds sends (offset, word) on the calldata
        # channel (adder gadget wiring proves the bound, section 9).
        b.all_rows_block(
            b.mul(b.mul(f_cdl, b.sub(one, carries[15])), Cblk), 256
        )

        # 14d. memory (word-aligned MLOAD/MSTORE + MSIZE).  The msize
        # register M (words) grows to max(M, waddr+1) via the witnessed
        # comparison; the quadratic gas term's delta dq is bound by
        # M'^2 - M^2 = 512*dq + r1 - r0 with 9-bit remainders (values
        # stay < 2^26 < p under the 2^13-word coverage cap).
        f_mld, f_mst, f_msz = f["mload"], f["mstore"], f["msize"]
        grow = b.local(MW_GROW)
        kneed = b.local(KNEED)
        dval = reg_val(MW_D0, 14, False)
        r0val = reg_val(MW_R0, 9, False)
        r1val = reg_val(MW_R1, 9, False)
        slval = reg_val(KSL0, 5, False)
        waddr = None
        for bit in range(5, 18):
            t = b.scale(1 << (bit - 5), b.local(A0 + bit))
            waddr = t if waddr is None else b.add(waddr, t)
        # the expansion target: waddr+1 for MLOAD/MSTORE; for KECCAK256,
        # waddr+sw when size != 0 (taken, via the nonzero gadget), else 0
        b.all_rows(
            b.mul(f["mstore8"], b.sub(kneed, b.add(waddr, one)))
        )
        b.all_rows(
            b.mul(
                b.add(f_mld, f_mst),
                b.sub(kneed, b.add(b.add(waddr, one), taken)),
            )
        )
        b.all_rows(
            b.mul(f_kr, b.sub(kneed, b.mul(taken, b.add(waddr, swval))))
        )
        # KECCAK256/RETURN word count: 32*sw = size + slack (slack < 32),
        # and size must fit 15 bits
        b.all_rows(
            b.mul(f_kr, b.sub(b.scale(32, swval), b.add(lB[0], slval)))
        )
        kec_size_hi = b.local_block(range(B0 + 15, B0 + 256))
        b.all_rows_block(b.mul(f_kr, kec_size_hi), 241)
        b.first_row(M)
        b.transition(b.sub(M_n, b.add(M, b.mul(grow, b.sub(kneed, M)))))
        b.all_rows(b.mul(grow, b.sub(one, f_mx)))
        b.all_rows(b.mul(grow, b.sub(b.sub(kneed, b.add(M, one)), dval)))
        b.all_rows(
            b.mul(b.mul(f_mx, b.sub(one, grow)), b.sub(b.sub(M, kneed), dval))
        )
        # range: offset bits 18..255 zero for every memory-metering op;
        # 32-byte alignment (bits 0..4 zero) for all EXCEPT MSTORE8,
        # which addresses single bytes
        addr_hi_bits = b.local_block(range(A0 + 18, A0 + 256))
        b.all_rows_block(b.mul(f_mx, addr_hi_bits), 238)
        addr_lo_bits = b.local_block(range(A0, A0 + 5))
        b.all_rows_block(
            b.mul(
                b.sub(b.sub(b.sub(f_mx, f["mstore8"]), f_mld), f["mstore"]),
                addr_lo_bits,
            ),
            5,
        )
        # quadratic-term delta
        b.transition(
            b.mul(
                f_mx,
                b.sub(
                    b.sub(b.mul(M_n, M_n), b.mul(M, M)),
                    b.add(b.sub(r1val, r0val), b.scale(512, dqval)),
                ),
            )
        )
        # MSIZE pushes 32*M
        b.all_rows(
            b.mul(
                f_msz,
                b.sub(b.add(lC[0], b.scale(1 << 16, lC[1])), b.scale(32, M)),
            )
        )
        msz_hi = b.local_block(range(C0 + 19, C0 + 256))
        b.all_rows_block(b.mul(f_msz, msz_hi), 237)

        # 14e. memory channel: one RAM tuple per MLOAD/MSTORE, and
        # MSTORE8's read-modify-write pair (read old W at 4clk, write the
        # spliced C at 4clk+1 through the second accumulator)
        vmem = b.add(
            Cblk,
            b.add(
                b.mul(f_mld, b.sub(Bblk, Cblk)),
                b.mul(f["mstore8"], b.sub(Wblk, Cblk)),
            ),
        )
        vcode_m = b.bit_block_code(vmem, chi, b.constant(0), 32)
        inner_m = vcode_m
        clk4m = b.scale(4, clk)
        code_m = b.ef_add4(
            b.ef_from_base4(waddr),
            b.ef_mul4(
                chi, b.ef_add4(b.ef_from_base4(clk4m), b.ef_mul4(chi, inner_m))
            ),
        )
        accM = [b.aux(AUX_M + c) for c in range(4)]
        accM_n = [b.aux_next(AUX_M + c) for c in range(4)]
        prodM = b.ef_mul4(b.ef_sub4(accM_n, accM), b.ef_sub4(g_m, code_m))
        actM = b.ef_from_base4(b.add(b.add(f_mld, f_mst), f["mstore8"]))
        for c in range(4):
            b.transition(b.sub(prodM[c], actM[c]))
            b.first_row(accM[c])
        f_mm = b.add(f_mld, f_mst)
        v2 = b.add(Cblk, b.mul(f_mm, b.sub(Wblk, Cblk)))
        vcode_m2 = b.bit_block_code(v2, chi, b.constant(0), 32)
        inner_m2 = b.ef_add4(b.ef_from_base4(f["mstore8"]), vcode_m2)
        waddr2 = b.add(waddr, f_mm)
        code_m2 = b.ef_add4(
            b.ef_from_base4(waddr2),
            b.ef_mul4(
                chi,
                b.ef_add4(
                    b.ef_from_base4(b.add(clk4m, one)), b.ef_mul4(chi, inner_m2)
                ),
            ),
        )
        accM2 = [b.aux(AUX_M2 + c) for c in range(4)]
        accM2_n = [b.aux_next(AUX_M2 + c) for c in range(4)]
        prodM2 = b.ef_mul4(b.ef_sub4(accM2_n, accM2), b.ef_sub4(g_m, code_m2))
        actM2 = b.ef_from_base4(
            b.add(f["mstore8"], b.mul(f_mm, taken))
        )
        for c in range(4):
            b.transition(b.sub(prodM2[c], actM2[c]))
            b.first_row(accM2[c])
        # third tuple: MSTORE's word-1 WRITE at sub-clock +2 — the value
        # is the one-hot splice expression (keep old1's top k bytes, fill
        # the rest with B >> 8k); k = 0 degenerates to plain B
        new1_acc = None
        for k in range(32):
            if k == 0:
                pat = Bblk
            else:
                pat = b.concat_rows([Bblk[8 * k :], Cblk[8 * (32 - k) :]])
            t = b.mul(ohq[k], pat)
            new1_acc = t if new1_acc is None else b.add(new1_acc, t)
        vcode_m3 = b.bit_block_code(new1_acc, chi, b.constant(0), 32)
        inner_m3 = b.ef_add4(b.ef_from_base4(one), vcode_m3)
        code_m3 = b.ef_add4(
            b.ef_from_base4(waddr),
            b.ef_mul4(
                chi,
                b.ef_add4(
                    b.ef_from_base4(b.add(clk4m, b.constant(2))),
                    b.ef_mul4(chi, inner_m3),
                ),
            ),
        )
        accM3 = [b.aux(AUX_M3 + c) for c in range(4)]
        accM3_n = [b.aux_next(AUX_M3 + c) for c in range(4)]
        prodM3 = b.ef_mul4(b.ef_sub4(accM3_n, accM3), b.ef_sub4(g_m, code_m3))
        actM3 = b.ef_from_base4(f_mst)
        for c in range(4):
            b.transition(b.sub(prodM3[c], actM3[c]))
            b.first_row(accM3[c])
        # fourth tuple: unaligned MSTORE's word-2 WRITE at sub-clock +3
        # (B's low 8k bits land in the top, old2's low bits kept)
        new2_acc = None
        for k in range(32):
            if k == 0:
                pat = b.scale(0, Bblk)
            else:
                pat = b.concat_rows([Wblk[: 8 * (32 - k)], Bblk[: 8 * k]])
            t = b.mul(ohq[k], pat)
            new2_acc = t if new2_acc is None else b.add(new2_acc, t)
        vcode_m4 = b.bit_block_code(new2_acc, chi, b.constant(0), 32)
        inner_m4 = b.ef_add4(b.ef_from_base4(one), vcode_m4)
        code_m4 = b.ef_add4(
            b.ef_from_base4(b.add(waddr, one)),
            b.ef_mul4(
                chi,
                b.ef_add4(
                    b.ef_from_base4(b.add(clk4m, b.constant(3))),
                    b.ef_mul4(chi, inner_m4),
                ),
            ),
        )
        accM4 = [b.aux(AUX_M4 + c) for c in range(4)]
        accM4_n = [b.aux_next(AUX_M4 + c) for c in range(4)]
        prodM4 = b.ef_mul4(b.ef_sub4(accM4_n, accM4), b.ef_sub4(g_m, code_m4))
        actM4 = b.ef_from_base4(b.mul(f_mst, taken))
        for c in range(4):
            b.transition(b.sub(prodM4[c], actM4[c]))
            b.first_row(accM4[c])

        # 14f. hash-call channel (one tuple per KECCAK256):
        #   clk + chi*waddr + chi^2*size + sum_j digest_byte_j * chi^{j+3}
        dcode = b.bit_block_code(Cblk, chi, b.constant(0), 32)
        code_k = b.ef_add4(
            b.ef_from_base4(clk),
            b.ef_mul4(
                chi,
                b.ef_add4(
                    b.ef_from_base4(waddr),
                    b.ef_mul4(chi, b.ef_add4(b.ef_from_base4(lB[0]), dcode)),
                ),
            ),
        )
        accK = [b.aux(AUX_K + c) for c in range(4)]
        accK_n = [b.aux_next(AUX_K + c) for c in range(4)]
        prodK = b.ef_mul4(b.ef_sub4(accK_n, accK), b.ef_sub4(g_k, code_k))
        actK = b.ef_from_base4(f_kec)
        for c in range(4):
            b.transition(b.sub(prodK[c], actK[c]))
            b.first_row(accK[c])

        # 14g. storage (SLOAD/SSTORE): witness gating, the EIP-2200
        # sentry, and the storage-journal channel.  cold/g1/g2 are CPU
        # witnesses whose truth the storage table enforces through the
        # tuple code.
        f_stor = b.add(f_sl, f_ss)
        b.all_rows(b.mul(scold, b.sub(one, f_stor)))
        b.all_rows(b.mul(sg1, b.sub(one, f_ss)))
        b.all_rows(b.mul(sg2, b.sub(one, f_ss)))
        b.all_rows(b.mul(sg1, sg2))
        # EIP-2200 sentry, wrap-safe (G spans up to 2^32 > p): either some
        # G bit >= 12 is set (taken, via the nonzero gadget), or the low
        # 12 bits are >= 2301 (12-bit witness; the difference range then
        # stays within +-2^12 << p, so no modular wrap is possible)
        sent12 = reg_val(MULC0, 12, False)
        g_low12 = gas_expr(False, range(12), 0)
        b.all_rows(
            b.mul(
                b.mul(f_ss, b.sub(one, taken)),
                b.sub(g_low12, b.add(sent12, b.constant(2301))),
            )
        )
        slotcode = b.bit_block_code(Ablk, chi, b.constant(0), 32)
        v_st = b.add(Cblk, b.mul(f_ss, b.sub(Bblk, Cblk)))
        vcode_st = b.bit_block_code(v_st, chi, b.constant(0), 32)
        chi4p = b.ef_mul4(chi2, chi2)
        chi8p = b.ef_mul4(chi4p, chi4p)
        chi16p = b.ef_mul4(chi8p, chi8p)
        chi32p = b.ef_mul4(chi16p, chi16p)
        chi36p = b.ef_mul4(chi32p, chi4p)
        chi3p = b.ef_mul4(chi2, chi)
        clk4st = b.scale(4, clk)
        code_st = b.ef_from_base4(clk4st)
        code_st = b.ef_add4(code_st, [b.mul(f_ss, chi[c]) for c in range(4)])
        code_st = b.ef_add4(code_st, [b.mul(scold, chi2[c]) for c in range(4)])
        code_st = b.ef_add4(code_st, [b.mul(sg1, chi3p[c]) for c in range(4)])
        code_st = b.ef_add4(code_st, [b.mul(sg2, chi4p[c]) for c in range(4)])
        code_st = b.ef_add4(code_st, b.ef_mul4(chi4p, slotcode))
        code_st = b.ef_add4(code_st, b.ef_mul4(chi36p, vcode_st))
        accST = [b.aux(AUX_ST + c) for c in range(4)]
        accST_n = [b.aux_next(AUX_ST + c) for c in range(4)]
        prodST = b.ef_mul4(b.ef_sub4(accST_n, accST), b.ef_sub4(g_st, code_st))
        actST = b.ef_from_base4(f_stor)
        for c in range(4):
            b.transition(b.sub(prodST[c], actST[c]))
            b.first_row(accST[c])

        # 14h. signed-arithmetic channel: SDIV/SMOD send
        #   kind + sum_j a_j chi^{1+j} + b_j chi^{33+j} + c_j chi^{65+j}
        # to ArithAir (evm_arith.py), which proves the signed semantics.
        g_ar = b.challenge_ef(CHAL_AR)
        f_sdv, f_smd = f["sdiv"], f["smod"]
        kind_expr = b.add(
            b.add(f_sdv, b.scale(2, f_smd)), b.scale(3, f_exp)
        )
        chi8c = b.ef_mul4(b.ef_mul4(chi2, chi2), b.ef_mul4(chi2, chi2))
        chi16c = b.ef_mul4(chi8c, chi8c)
        chi32c = b.ef_mul4(chi16c, chi16c)
        chi64c = b.ef_mul4(chi32c, chi32c)
        code_ar = b.bit_block_code(Ablk, chi, kind_expr, 32)
        code_ar = b.ef_add4(
            code_ar,
            b.ef_mul4(chi32c, b.bit_block_code(Bblk, chi, b.constant(0), 32)),
        )
        code_ar = b.ef_add4(
            code_ar,
            b.ef_mul4(chi64c, b.bit_block_code(Cblk, chi, b.constant(0), 32)),
        )
        accAR = [b.aux(AUX_AR + c) for c in range(4)]
        accAR_n = [b.aux_next(AUX_AR + c) for c in range(4)]
        prodAR = b.ef_mul4(b.ef_sub4(accAR_n, accAR), b.ef_sub4(g_ar, code_ar))
        actAR = b.ef_from_base4(b.add(b.add(f_sdv, f_smd), f_exp))
        for c in range(4):
            b.transition(b.sub(prodAR[c], actAR[c]))
            b.first_row(accAR[c])

        # 14i. copies: word-multiple size (slack = 0), 15-bit source
        # offset, the copy-call channel send (kind 0 = calldata, 1 =
        # code), and RETURNDATACOPY's size == 0 pin (covered frames have
        # empty returndata)
        f_cdcc = b.add(f["calldatacopy"], f["codecopy"])
        w_hi15 = b.local_block(range(W0 + 15, W0 + 256))
        b.all_rows_block(b.mul(f_cdcc, w_hi15), 241)
        b.all_rows_block(b.mul(f["returndatacopy"], Bblk), 256)
        b.all_rows_block(b.mul(f["returndatacopy"], Wblk), 256)
        g_cp = b.challenge_ef(CHAL_CP)
        offv = None
        for bit in range(15):
            t = b.scale(1 << bit, b.local(W0 + bit))
            offv = t if offv is None else b.add(offv, t)
        chi3cp = b.ef_mul4(chi2, chi)
        chi4cp = b.ef_mul4(chi2, chi2)
        code_cp = b.ef_add4(
            b.ef_from_base4(clk),
            b.ef_add4(
                b.ef_add4(
                    b.ef_mul4(chi, b.ef_from_base4(waddr)),
                    b.ef_mul4(chi2, b.ef_from_base4(offv)),
                ),
                b.ef_add4(
                    b.ef_add4(
                        b.ef_mul4(chi3cp, b.ef_from_base4(swval)),
                        [b.mul(f["codecopy"], chi4cp[c]) for c in range(4)],
                    ),
                    b.ef_mul4(
                        b.ef_mul4(chi4cp, chi),
                        b.ef_from_base4(slval),
                    ),
                ),
            ),
        )
        accCP = [b.aux(AUX_CP + c) for c in range(4)]
        accCP_n = [b.aux_next(AUX_CP + c) for c in range(4)]
        prodCP = b.ef_mul4(b.ef_sub4(accCP_n, accCP), b.ef_sub4(g_cp, code_cp))
        actCP = b.ef_from_base4(f_cdcc)
        for c in range(4):
            b.transition(b.sub(prodCP[c], actCP[c]))
            b.first_row(accCP[c])

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
        p21 = fsum(_POP2PUSH1)
        env_f = fsum(ENV_OPS)
        f_cdc = b.add(
            f["calldatacopy"], b.add(f["codecopy"], f["returndatacopy"])
        )
        pops_w0 = b.add(
            b.add(
                b.scale(2, p21),
                b.add(
                    b.add(f["iszero"], f["not"]),
                    b.add(f["swap"], b.add(f_cdl, b.add(f_mld, f_sl))),
                ),
            ),
            b.scale(3, f_cdc),
        )
        actives = [
            b.add(
                p21,
                b.add(
                    b.add(b.add(f["iszero"], f["not"]), b.add(f["pop"], f["jump"])),
                    b.add(
                        b.add(b.add(f["jumpi"], f["dup"]), b.add(f["swap"], f_cdl)),
                        b.add(
                            b.add(
                                b.add(f_mld, f_mst),
                                b.add(f["mstore8"], b.add(f_sl, f_ss)),
                            ),
                            b.add(b.add(f_ret, f_log), f_cdc),
                        ),
                    ),
                ),
            ),
            b.add(
                p21,
                b.add(
                    b.add(f["jumpi"], b.add(f["swap"], f["mstore8"])),
                    b.add(
                        b.add(f_mst, f_ss),
                        b.add(b.add(f_ret, f_log), f_cdc),
                    ),
                ),
            ),
            b.add(
                p21,
                b.add(
                    b.add(b.add(f["iszero"], f["not"]), b.add(f["push0"], f["push"])),
                    b.add(
                        b.add(f["dup"], f["swap"]),
                        b.add(
                            b.add(f["pc"], f["gas"]),
                            b.add(
                                b.add(env_f, f_cdc),
                                b.add(f_cdl, b.add(b.add(f_mld, f_msz), f_sl)),
                            ),
                        ),
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
        w0_bits = b.add(
            Cblk,
            b.mul(b.add(f["swap"], f_cdc), b.sub(Bblk, Cblk)),
        )
        slot1_bits = b.add(Bblk, b.mul(f_cdc, b.sub(Wblk, Bblk)))
        vblks = [Ablk, slot1_bits, w0_bits, Ablk]
        acc_sum = None
        for s in range(4):
            vcode = b.bit_block_code(vblks[s], chi, b.constant(0), 32)
            iw_s = b.constant(1 if s >= 2 else 0)
            if s == 2:
                iw_s = b.sub(iw_s, f_cdc)  # third-pop READ
            inner = b.ef_add4(b.ef_from_base4(iw_s), vcode)
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

        # 16a. calldata channel (send in-bounds loads)
        code_cd = b.bit_block_code(Cblk, chi, lA[0], 32)
        accC = [b.aux(AUX_CD + c) for c in range(4)]
        accC_n = [b.aux_next(AUX_CD + c) for c in range(4)]
        prodC = b.ef_mul4(b.ef_sub4(accC_n, accC), b.ef_sub4(g_c, code_cd))
        act_cd = b.ef_from_base4(b.mul(f_cdl, carries[15]))
        for c in range(4):
            b.transition(b.sub(prodC[c], act_cd[c]))
            b.first_row(accC[c])

        # 17. bus bindings (last row is always halted padding)
        for c in range(4):
            b.last_row(b.sub(accF[c], b.bus_coord(4 * BUS_FETCH + c)))
            b.last_row(b.sub(acc_sum[c], b.bus_coord(4 * BUS_STACK + c)))
            b.last_row(b.sub(accC[c], b.bus_coord(4 * BUS_CD + c)))
            b.last_row(
                b.sub(
                    b.add(b.add(accM[c], accM2[c]), b.add(accM3[c], accM4[c])),
                    b.bus_coord(4 * BUS_MEM + c),
                )
            )
            b.last_row(b.bus_coord(4 * BUS_BLOCKS + c))
            b.last_row(b.bus_coord(4 * BUS_DIG + c))
            b.last_row(b.sub(accK[c], b.bus_coord(4 * BUS_KCALL + c)))
            b.last_row(b.sub(accST[c], b.bus_coord(4 * BUS_STOR + c)))
            b.last_row(b.sub(accAR[c], b.bus_coord(4 * BUS_AR + c)))
            b.last_row(b.sub(accCP[c], b.bus_coord(4 * BUS_CP + c)))


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
    eager_quotient = True

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
# MemRamAir — read-write-memory argument for the word-granular RAM
# --------------------------------------------------------------------------

MR_ABITS = 0  # 13 word-address bits
MR_CBITS = 13  # 22 clk4 bits
MR_IW = 35
MR_SA = 36  # same-address-as-previous-row flag
MR_FR = 37  # fresh-read flag: (1 - sa) * (1 - iw)
MR_DBITS = 38  # 22 bits: strictly-increasing diff witness
MR_V0 = 60  # 256 value bits
MEM_WIDTH = MR_V0 + 256
MF_ACTIVE = 0
MF_ACTIVE_N = 1


class MemRamAir(Air):
    """EVM memory as word-granular RAM sorted by (word addr, clk4).

    Same ordering discipline as EvmStackAir, with the EVM's
    zero-initialized semantics: the first access at an address may be a
    read, but then its value must be zero (fresh-read rule), instead of
    the stack's first-access-must-write rule."""

    width = MEM_WIDTH
    aux_width = 4
    num_aux_challenges = NUM_CHALLENGES
    num_bus_values = 4
    quotient_chunks = 2
    commit_fixed = True
    eager_quotient = True

    def __init__(self, num_accesses: int):
        self.T = int(num_accesses)
        self.n = _pow2_atleast(self.T + 1)

    def fixed_columns(self, n: int):
        assert n == self.n
        cols = np.zeros((2, n), dtype=np.uint32)
        cols[MF_ACTIVE, : self.T] = 1
        if self.T > 1:
            cols[MF_ACTIVE_N, : self.T - 1] = 1
        return cols

    def trace(self, accesses: list[tuple[int, int, int, int]]) -> np.ndarray:
        """accesses: (word_addr, clk4, is_write, value) in ANY order."""
        assert len(accesses) == self.T
        acc = sorted(accesses)
        tr = np.zeros((self.n, MEM_WIDTH), dtype=np.uint32)
        prev_addr = None
        prev_clk = None
        for row, (addr, clk4, iw, value) in enumerate(acc):
            assert 0 <= addr < (1 << 13) and 0 <= clk4 < (1 << 22)
            for i in range(13):
                tr[row, MR_ABITS + i] = (addr >> i) & 1
            for i in range(22):
                tr[row, MR_CBITS + i] = (clk4 >> i) & 1
            tr[row, MR_IW] = iw
            if prev_addr is not None and addr == prev_addr:
                tr[row, MR_SA] = 1
                d = clk4 - prev_clk - 1
            elif prev_addr is not None:
                d = addr - prev_addr - 1
            else:
                d = 0
            assert 0 <= d < (1 << 22)
            tr[row, MR_FR] = (1 - tr[row, MR_SA]) * (1 - iw)
            for i in range(22):
                tr[row, MR_DBITS + i] = (d >> i) & 1
            tr[row, MR_V0 : MR_V0 + 256] = _word_bits(value)
            prev_addr, prev_clk = addr, clk4
        # padding rows: sa = iw = 0 -> fr = 1, zero value (zero-init reads)
        tr[self.T :, MR_FR] = 1
        return tr

    def _terms(self, trace: np.ndarray, challenges) -> np.ndarray:
        chi, gamma_m = challenges[CHAL_CHI], challenges[CHAL_M]
        pows = _np_chi_pows(chi, 36)
        t = trace.astype(np.uint64)
        addr = sum(t[:, MR_ABITS + i] << np.uint64(i) for i in range(13))
        clk4 = sum(t[:, MR_CBITS + i] << np.uint64(i) for i in range(22))
        vbytes = _bits_to_bytes(trace[:, MR_V0 : MR_V0 + 256])
        code = _np_tuple_code(
            addr,
            [(clk4, 1), (t[:, MR_IW], 2)]
            + [(vbytes[:, j], j + 3) for j in range(32)],
            pows,
        )
        gm = np.array([x % bb.P for x in gamma_m], dtype=np.uint64)
        inv = ef.npef_inv(ef.npef_sub(gm[None, :], code))
        active = np.zeros(trace.shape[0], dtype=np.uint64)
        active[: self.T] = _PU - np.uint64(1)  # receive: -1
        return ef.npef_mul(ef.npef_from_base(active), inv)

    def aux_trace(self, trace: np.ndarray, challenges) -> np.ndarray:
        aux = np.zeros((trace.shape[0], 4), dtype=np.uint32)
        aux[:] = EvmCpuAir._excl_prefix(self._terms(trace, challenges))
        return aux

    def bus_values(self, trace: np.ndarray, challenges) -> list[tuple]:
        terms = self._terms(trace, challenges)
        return [
            ef.H_ZERO,
            ef.H_ZERO,
            ef.H_ZERO,
            tuple(int(v) for v in terms.sum(axis=0) % _PU),
        ]

    def eval(self, b: ConstraintBuilder) -> None:
        one = b.constant(1)
        chi = b.challenge_ef(CHAL_CHI)
        g_m = b.challenge_ef(CHAL_M)
        active = b.fixed(MF_ACTIVE)

        def val(nx: bool, base: int, nbits: int):
            g = b.next if nx else b.local
            acc = None
            for i in range(nbits):
                t = b.scale(1 << i, g(base + i))
                acc = t if acc is None else b.add(acc, t)
            return acc

        addr = val(False, MR_ABITS, 13)
        addr_n = val(True, MR_ABITS, 13)
        clk4 = val(False, MR_CBITS, 22)
        clk4_n = val(True, MR_CBITS, 22)
        d_n = val(True, MR_DBITS, 22)
        iw = b.local(MR_IW)
        sa = b.local(MR_SA)
        sa_n = b.next(MR_SA)
        fr = b.local(MR_FR)

        # booleanity
        bit_cols = (
            list(range(MR_ABITS, MR_ABITS + 13))
            + list(range(MR_CBITS, MR_CBITS + 22))
            + [MR_IW, MR_SA, MR_FR]
            + list(range(MR_DBITS, MR_DBITS + 22))
            + list(range(MR_V0, MR_V0 + 256))
        )
        bits = b.local_block(bit_cols)
        b.all_rows_block(b.mul(bits, b.sub(bits, one)), len(bit_cols))

        # sa only on active rows; row 0 is never a continuation
        b.all_rows(b.mul(b.sub(one, active), sa))
        b.first_row(sa)
        # same-address rows repeat the address and step the clock
        b.transition(b.mul(sa_n, b.sub(addr_n, addr)))
        clk_diff = b.sub(b.sub(clk4_n, clk4), one)
        addr_diff = b.sub(b.sub(addr_n, addr), one)
        sel = b.add(b.mul(sa_n, clk_diff), b.mul(b.sub(one, sa_n), addr_diff))
        nact = b.fixed(MF_ACTIVE_N)
        b.transition(b.mul(nact, b.sub(d_n, sel)))
        # fresh-read rule: fr = (1-sa)(1-iw); a fresh read sees zero
        b.all_rows(b.sub(fr, b.mul(b.sub(one, sa), b.sub(one, iw))))
        vblk = b.local_block(range(MR_V0, MR_V0 + 256))
        b.all_rows_block(b.mul(fr, vblk), 256)
        # read-after-write consistency
        vblk_n = b.next_block(range(MR_V0, MR_V0 + 256))
        iw_n = b.next(MR_IW)
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
        prod = b.ef_mul4(b.ef_sub4(acc_n, acc), b.ef_sub4(g_m, code))
        act4 = b.ef_from_base4(active)
        for c in range(4):
            b.transition(b.add(prod[c], act4[c]))
            b.first_row(acc[c])
            b.last_row(b.sub(acc[c], b.bus_coord(4 * BUS_MEM + c)))
            b.last_row(b.bus_coord(4 * BUS_FETCH + c))
            b.last_row(b.bus_coord(4 * BUS_STACK + c))
            b.last_row(b.bus_coord(4 * BUS_CD + c))


# --------------------------------------------------------------------------
# EvmCalldataAir — per-offset word table over the public calldata
# --------------------------------------------------------------------------

CD_MULT = 0
CD_WIDTH = 1
CF_ACTIVE = 0
CF_OFF = 1
CF_B0 = 2  # 32 little-endian bytes of the zero-padded big-endian word
CD_NFIXED = CF_B0 + 32


class EvmCalldataAir(Air):
    """One row per calldata byte offset, holding the 32-byte big-endian
    word starting there (zero-padded past the end — EVM CALLDATALOAD
    semantics); committed-fixed columns derived from the PUBLIC calldata,
    a witness multiplicity column counting in-bounds loads."""

    width = CD_WIDTH
    aux_width = 4
    num_aux_challenges = NUM_CHALLENGES
    num_bus_values = 3
    quotient_chunks = 2
    commit_fixed = True
    eager_quotient = True

    def __init__(self, calldata: bytes):
        assert len(calldata) < (1 << 15), "calldata offsets are 15-bit"
        self.calldata = bytes(calldata)
        self.n = _pow2_atleast(len(self.calldata) + 1)

    def structure_key(self) -> tuple:
        return ()  # constraint graph is instance-independent

    def fixed_columns(self, n: int):
        assert n == self.n
        cols = np.zeros((CD_NFIXED, n), dtype=np.uint32)
        cd = self.calldata
        for o in range(len(cd)):
            cols[CF_ACTIVE, o] = 1
            cols[CF_OFF, o] = o
            v = int.from_bytes(cd[o : o + 32].ljust(32, b"\x00"), "big")
            for j in range(32):
                cols[CF_B0 + j, o] = (v >> (8 * j)) & 0xFF
        return cols

    def trace(self, cd_loads: dict) -> np.ndarray:
        tr = np.zeros((self.n, CD_WIDTH), dtype=np.uint32)
        for o, cnt in cd_loads.items():
            tr[o, CD_MULT] = cnt % bb.P
        return tr

    def _terms(self, trace: np.ndarray, challenges) -> np.ndarray:
        chi, gamma_c = challenges[CHAL_CHI], challenges[CHAL_C]
        pows = _np_chi_pows(chi, 36)
        n = trace.shape[0]
        fx = self.fixed_columns(n).astype(np.uint64)
        code = _np_tuple_code(
            fx[CF_OFF], [(fx[CF_B0 + j], j + 1) for j in range(32)], pows
        )
        gc = np.array([x % bb.P for x in gamma_c], dtype=np.uint64)
        inv = ef.npef_inv(ef.npef_sub(gc[None, :], code))
        # receive: -mult on active rows
        mult = (_PU - trace[:, CD_MULT].astype(np.uint64)) * fx[CF_ACTIVE] % _PU
        return ef.npef_mul(ef.npef_from_base(mult), inv)

    def aux_trace(self, trace: np.ndarray, challenges) -> np.ndarray:
        aux = np.zeros((trace.shape[0], 4), dtype=np.uint32)
        aux[:] = EvmCpuAir._excl_prefix(self._terms(trace, challenges))
        return aux

    def bus_values(self, trace: np.ndarray, challenges) -> list[tuple]:
        terms = self._terms(trace, challenges)
        return [ef.H_ZERO, ef.H_ZERO, tuple(int(v) for v in terms.sum(axis=0) % _PU)]

    def eval(self, b: ConstraintBuilder) -> None:
        chi = b.challenge_ef(CHAL_CHI)
        g_c = b.challenge_ef(CHAL_C)
        active = b.fixed(CF_ACTIVE)
        off = b.fixed(CF_OFF)
        mult = b.local(CD_MULT)

        code = b.ef_from_base4(off)
        pw = list(chi)
        for j in range(32):
            byt = b.fixed(CF_B0 + j)
            code = b.ef_add4(code, [b.mul(byt, pw[c]) for c in range(4)])
            if j < 31:
                pw = b.ef_mul4(pw, chi)

        acc = [b.aux(c) for c in range(4)]
        acc_n = [b.aux_next(c) for c in range(4)]
        prod = b.ef_mul4(b.ef_sub4(acc_n, acc), b.ef_sub4(g_c, code))
        recv = b.ef_from_base4(b.mul(active, mult))
        for c in range(4):
            b.transition(b.add(prod[c], recv[c]))
            b.first_row(acc[c])
            b.last_row(b.sub(acc[c], b.bus_coord(4 * BUS_CD + c)))
            b.last_row(b.bus_coord(4 * BUS_FETCH + c))
            b.last_row(b.bus_coord(4 * BUS_STACK + c))


# --------------------------------------------------------------------------
# frame payload: prove / verify
# --------------------------------------------------------------------------


def frame_tables(ft: FrameTrace):
    """[(air, trace, publics)] for prover.prove_tables."""
    cpu = EvmCpuAir()
    cpu_trace, publics = build_cpu_trace(ft)
    rom = EvmProgramAir(ft.code)
    stk = EvmStackAir(len(ft.accesses))
    cdt = EvmCalldataAir(ft.calldata)
    ram = MemRamAir(len(ft.mem_accesses))
    tables = [
        (cpu, cpu_trace, publics),
        (rom, rom.trace(ft.visit_counts), []),
        (stk, stk.trace(ft.accesses), []),
        (cdt, cdt.trace(ft.cd_loads), []),
        (ram, ram.trace(ft.mem_accesses), []),
    ]
    if ft.storage_groups:
        from .evm_storage import EvmStorageAir

        stor = EvmStorageAir(ft.storage_groups)
        tables.append((stor, stor.trace(ft.storage_accesses), []))
    if ft.keccak_calls:
        from .evm_keccak import EvmKeccakCallAir, EvmSpongeAir

        bridge = EvmKeccakCallAir(
            [(offw, size) for _, offw, size, _, _ in ft.keccak_calls]
        )
        witness = [
            (clk, words, digest)
            for clk, _, _, words, digest in ft.keccak_calls
        ]
        messages = [
            b"".join(w.to_bytes(32, "big") for w in words)[:size]
            for _, _, size, words, _ in ft.keccak_calls
        ]
        sponge = EvmSpongeAir.from_messages(messages)
        tables.append((bridge, bridge.trace(witness), []))
        tables.append((sponge, sponge.trace(), []))
    if ft.arith_calls:
        from .evm_arith import ArithAir

        ar = ArithAir([k for k, *_ in ft.arith_calls])
        tables.append((ar, ar.trace(ft.arith_calls), []))
    cd_copies = [c for c in ft.copy_calls if c[0] == "calldata"]
    code_copies = [c for c in ft.copy_calls if c[0] == "code"]
    if cd_copies:
        from .evm_copy import EvmCopyAir

        cp = EvmCopyAir(
            [(d, o, w, sl) for _, _, d, o, w, sl, _, _, _ in cd_copies],
            ft.env.calldatasize,
        )
        tables.append(
            (
                cp,
                cp.trace(
                    [
                        (clk, srcs, told)
                        for _, clk, _, _, _, _, _, srcs, told in cd_copies
                    ]
                ),
                [],
            )
        )
    if code_copies:
        from .evm_copy import CodeCopyAir

        cc = CodeCopyAir(
            [(d, o, w, sl) for _, _, d, o, w, sl, _, _, _ in code_copies],
            ft.code,
        )
        tables.append(
            (
                cc,
                cc.trace(
                    [
                        (clk, told)
                        for _, clk, _, _, _, _, _, _, told in code_copies
                    ]
                ),
                [],
            )
        )
    return tables


def frame_publics(env: FrameEnv, gas0: int, gas_f: int, sp_f: int) -> list[int]:
    publics = [gas0 & 0xFFFF, gas0 >> 16, gas_f & 0xFFFF, gas_f >> 16, sp_f]
    for w in env.words():
        publics.extend((w >> (16 * i)) & 0xFFFF for i in range(16))
    return publics


def prove_frame(
    code: bytes, env: FrameEnv, gas: int, calldata: bytes | None = None
) -> dict:
    """Execute a covered frame and prove it; raises UncoveredFrame when
    the frame leaves the covered statement."""
    return prove_frame_trace(execute_frame(code, env, gas, calldata=calldata))


def prove_frame_trace(ft: FrameTrace) -> dict:
    from .. import prover as sp
    from ..serde import proof_to_dict

    proofs = sp.prove_tables(frame_tables(ft))
    return {
        "kind": "evm-frame-v1",
        "code": ft.code.hex(),
        "calldata": ft.calldata.hex(),
        "env": {k: hex(v) for k, v in ft.env.__dict__.items()},
        "gas0": ft.gas0,
        "gas_f": ft.gas_f,
        "sp_f": ft.sp_f,
        "accesses": len(ft.accesses),
        "mem_accesses": len(ft.mem_accesses),
        "keccak_calls": [
            [offw, size] for _, offw, size, _, _ in ft.keccak_calls
        ],
        "arith_calls": [k for k, *_ in ft.arith_calls],
        "copy_calls": [
            [destw, off, sw, slack]
            for kind, _, destw, off, sw, slack, _, _, _ in ft.copy_calls
            if kind == "calldata"
        ],
        "codecopy_calls": [
            [destw, off, sw, slack]
            for kind, _, destw, off, sw, slack, _, _, _ in ft.copy_calls
            if kind == "code"
        ],
        "storage": [
            [hex(slot), hex(orig), count, prewarm, hex(final)]
            for slot, orig, count, prewarm, final in ft.storage_groups
        ],
        "steps": len(ft.steps),
        "starks": [proof_to_dict(p) for p in proofs],
    }


def verify_frame_payload(payload: dict) -> bool:
    """Rebuild the AIR instances from the PUBLIC statement (code,
    calldata, env, gas/stack claims, table sizes) and verify the
    multi-table STARK."""
    from .. import verifier as sv
    from ..serde import proof_from_dict

    if payload.get("kind") != "evm-frame-v1":
        return False
    try:
        code = bytes.fromhex(payload["code"])
        calldata = bytes.fromhex(payload.get("calldata", ""))
        env = FrameEnv(**{k: int(v, 16) for k, v in payload["env"].items()})
        gas0, gas_f, sp_f = (
            int(payload["gas0"]),
            int(payload["gas_f"]),
            int(payload["sp_f"]),
        )
        n_acc = int(payload["accesses"])
        n_mem = int(payload.get("mem_accesses", 0))
        kcalls = [
            (int(o), int(s)) for o, s in payload.get("keccak_calls", [])
        ]
        sgroups = [
            (int(s, 16), int(o, 16), int(c), int(w), int(f, 16))
            for s, o, c, w, f in payload.get("storage", [])
        ]
        ar_kinds = payload.get("arith_calls", [])
        if isinstance(ar_kinds, int):  # round-3 early form: count only
            ar_kinds = [1] * ar_kinds
        ar_kinds = [int(k) for k in ar_kinds]
        n_ar = len(ar_kinds)
        cp_calls = [
            (int(d), int(o), int(w), int(sl))
            for d, o, w, sl in payload.get("copy_calls", [])
        ]
        cc_calls = [
            (int(d), int(o), int(w), int(sl))
            for d, o, w, sl in payload.get("codecopy_calls", [])
        ]
        starks = payload["starks"]
        if not (0 <= gas_f <= gas0 < 1 << 32 and 0 <= sp_f <= 1024):
            return False
        # the public CALLDATASIZE word must describe the public calldata
        if env.calldatasize != len(calldata) or len(calldata) >= (1 << 15):
            return False
        if len(kcalls) > MAX_KECCAK_CALLS:
            return False
        expect = (
            5
            + (1 if sgroups else 0)
            + (2 if kcalls else 0)
            + (1 if n_ar else 0)
            + (1 if cp_calls else 0)
            + (1 if cc_calls else 0)
        )
        if len(starks) != expect:
            return False
        proofs = [proof_from_dict(d) for d in starks]
    except (KeyError, ValueError, TypeError):
        return False
    try:
        airs = [
            EvmCpuAir(),
            EvmProgramAir(code),
            EvmStackAir(n_acc),
            EvmCalldataAir(calldata),
            MemRamAir(n_mem),
        ]
        if sgroups:
            from .evm_storage import EvmStorageAir

            airs.append(EvmStorageAir(sgroups))
        if kcalls:
            from .evm_keccak import EvmKeccakCallAir, EvmSpongeAir

            bridge = EvmKeccakCallAir(kcalls)
            airs.append(bridge)
            airs.append(EvmSpongeAir(bridge.block_counts()))
        if n_ar:
            from .evm_arith import ArithAir

            airs.append(ArithAir(ar_kinds))
        if cp_calls:
            from .evm_copy import EvmCopyAir

            airs.append(EvmCopyAir(cp_calls, env.calldatasize))
        if cc_calls:
            from .evm_copy import CodeCopyAir

            airs.append(CodeCopyAir(cc_calls, code))
    except AssertionError:
        return False
    if proofs[0].publics != frame_publics(env, gas0, gas_f, sp_f):
        return False
    if any(p.publics for p in proofs[1:]):
        return False
    for i in range(1, len(airs)):
        air = airs[i]
        if hasattr(air, "num_perms"):  # the sponge sizes by permutations
            from .keccak_air import ROWS

            if (1 << proofs[i].log_n) != ROWS * air.num_perms:
                return False
        elif (1 << proofs[i].log_n) != air.n:
            return False
    return sv.verify_tables(airs, proofs)
