"""Pre-state binding for the EVM storage statement.

Round 2's storage journal (stark/airs/evm_storage.py) proved SLOAD/SSTORE
consistency against PUBLIC per-slot (slot, original, ...) groups that the
honest prover filled from the pre-state — a malicious prover could assert
arbitrary originals.  This module closes that gap (VERDICT round 2,
"What's weak" #4):

1. the prover publishes the MPT paths (node RLPs) from the PARENT state
   root to every (address, slot) the covered frames touch, and proves
   every path node's keccak inside the batched sponge STARK
   (keccak-mpt-v1 system) rooted at the parent state root;
2. the parent state root itself is bound: the payload carries the parent
   header RLP, whose keccak must equal the ancestor-chain statement's
   root digest (= the proven block's parent_hash, which the instance
   hash binds via the block header — reference builder.rs:267-379
   verifies exactly this linkage in-guest);
3. the verifier walks the proven paths host-side (pure public data,
   O(path) RLP decoding — the keccak WORK is in the STARK) to extract
   each slot's pre-state value, then checks the frame chain:
   - the FIRST covered frame touching (address, slot) must claim
     original == pre-state value;
   - every later frame's original must equal the previous frame's
     public `final` value (bound in-circuit by EvmStorageAir's SF_LAST
     row constraint).

Soundness scope: the chain covers writes made by covered frames; it is
airtight when every storage-touching execution of the block is a covered
frame (the covered == total regime), and is reported explicitly
otherwise — same truncation discipline as the rest of the statement.

Reference analog: revm's journaled state committed through
calculate_block_header inside the zkVM guests
(/root/reference/lib/src/builder.rs:76-186, mem_db.rs:193-283).
"""

from __future__ import annotations

from ..mpt import EMPTY_ROOT
from ..mpt.trie import MptError, mpt_from_proof, to_nibs
from ..proto import rlp
from ..proto.types import Account
from ..utils import keccak256


class PrestateBindingError(Exception):
    pass


def _header_state_root(header_rlp: bytes) -> bytes:
    """state_root = 4th item of the header RLP (yellow-paper layout)."""
    items = rlp.decode(header_rlp)
    root = items[3]
    if not isinstance(root, bytes) or len(root) != 32:
        raise PrestateBindingError("malformed header RLP")
    return root


def collect_prestate_paths(collect: dict) -> dict | None:
    """Gather MPT paths for every (address, slot) the frame candidates
    touch, plus the deduplicated containment-ordered node list for the
    keccak statement.  Returns None when there is nothing to bind."""
    frames = collect.get("frames") or []
    stt = collect.get("parent_state_trie")
    storage_tries = collect.get("parent_storage") or {}
    header = collect.get("parent_header")
    if stt is None or header is None:
        return None
    per_account: dict[bytes, set[int]] = {}
    for cand in frames:
        slots = cand.get("storage") or {}
        if slots:
            ab = int(cand.get("address", 0)).to_bytes(20, "big")
            per_account.setdefault(ab, set()).update(int(s) for s in slots)
        # callee frames' storage (CALL composition): the candidate's
        # world view carries per-address originals
        for addr_int, info in (cand.get("world") or {}).items():
            wslots = info.get("storage") or {}
            if wslots:
                ab = int(addr_int).to_bytes(20, "big")
                per_account.setdefault(ab, set()).update(
                    int(s) for s in wslots
                )
    if not per_account:
        return None

    msgs: list[bytes] = []
    seen: set[bytes] = set()

    def add_path(path: list[bytes]) -> None:
        for node in path:
            h = keccak256(node)
            if h not in seen:
                seen.add(h)
                msgs.append(node)

    accounts: dict[str, dict] = {}
    for ab in sorted(per_account):
        apath = stt.proof(to_nibs(keccak256(ab)))
        add_path(apath)
        acct_rlp = stt.get(to_nibs(keccak256(ab)))
        storage_root = (
            Account.decode(acct_rlp).storage_root if acct_rlp else EMPTY_ROOT
        )
        slots_payload: dict[str, list[str]] = {}
        st = storage_tries.get(ab)
        for slot in sorted(per_account[ab]):
            spath: list[bytes] = []
            if st is not None and storage_root != EMPTY_ROOT:
                spath = st.proof(
                    to_nibs(keccak256(slot.to_bytes(32, "big")))
                )
                add_path(spath)
            slots_payload[hex(slot)] = [n.hex() for n in spath]
        accounts["0x" + ab.hex()] = {
            "path": [n.hex() for n in apath],
            "slots": slots_payload,
        }
    return {
        "parent_header": header.encode(),
        "accounts": accounts,
        "messages": msgs,
    }


def prove_prestate(collect: dict) -> dict | None:
    """Build the prestate payload slot: paths + the batched keccak STARK
    over every path node, rooted at the parent state root."""
    data = collect_prestate_paths(collect)
    if data is None:
        return None
    from .tpu_stark import prove_keccak_batch_public

    header = collect["parent_header"]
    kec = prove_keccak_batch_public(data["messages"], header.state_root)
    return {
        "kind": "prestate-v1",
        "parent_header": data["parent_header"].hex(),
        "accounts": data["accounts"],
        "keccak": kec,
    }


def _walk_value(path_hex: list[str], root: bytes, key_hash: bytes, proven: set):
    """Extract the value at key_hash from a proven path (or None for a
    proven exclusion).  Every node must be in the STARK-proven set and
    the path must be head-anchored at `root`."""
    path = [bytes.fromhex(x) for x in path_hex]
    if not path:
        raise PrestateBindingError("empty path")
    if keccak256(path[0]) != root:
        raise PrestateBindingError("path not anchored at root")
    for node in path:
        if keccak256(node) not in proven:
            raise PrestateBindingError("path node outside proven set")
    try:
        trie = mpt_from_proof(path)
        return trie.get(to_nibs(key_hash))
    except MptError as e:  # truncated path: neither inclusion nor exclusion
        raise PrestateBindingError(f"unresolvable path: {e}") from None


def verify_prestate_binding(payload: dict) -> bool:
    """Verify the prestate slot against the chain statement and the EVM
    frame storage groups (see module docstring for the statement)."""
    from .tpu_stark import verify_mpt_payload

    ps = payload.get("prestate")
    evm = payload.get("evm") or {}
    # evm["frames"] entries are call-tree GROUPS (evm-call-tree-v1);
    # flatten to frame records in execution order (groups are tx-ordered,
    # and within a group each address appears in at most one frame — the
    # phase-1 coverage restriction of docs/EVM_COMPOSITION.md)
    groups = evm.get("frames") or []
    # group order must FOLLOW tx order when the payload carries the
    # tx alignment (round 5): the cross-frame original==previous-final
    # chain below is only meaningful in execution order, and a prover
    # reordering groups could otherwise pick a self-serving interleaving
    # (ADVICE r4: value-cycle reorderings were not structurally excluded)
    txis = [grp.get("tx_index") for grp in groups]
    if any(t is not None for t in txis):
        if any(t is None for t in txis):
            return False  # no partial opt-out
        known = [int(t) for t in txis]
        if known != sorted(known) or len(set(known)) != len(known):
            return False
    frames = [fr for grp in groups for fr in grp.get("frames", [])]
    has_storage = any(fr.get("storage") for fr in frames)
    if ps is None:
        # nothing claimed: acceptable only when no proven frame touches
        # storage (the originals would otherwise be unbound publics)
        return not has_storage
    chain = payload.get("chain")
    if chain is None:
        return False
    try:
        parent_hash = bytes.fromhex(chain["state_root"])
        header_rlp = bytes.fromhex(ps["parent_header"])
        if keccak256(header_rlp) != parent_hash:
            return False
        state_root = _header_state_root(header_rlp)
        kec = ps.get("keccak") or {}
        if not verify_mpt_payload(kec, state_root):
            return False
        proven = {keccak256(bytes.fromhex(m)) for m in kec["messages"]}
        expected: dict[tuple[bytes, int], int] = {}
        for fr in frames:
            addr = int(fr["env"]["address"], 16).to_bytes(20, "big")
            for slot_h, orig_h, _cnt, _pw, fin_h in fr.get("storage", []):
                slot, orig = int(slot_h, 16), int(orig_h, 16)
                key = (addr, slot)
                if key in expected:
                    # cross-frame chain: original = previous frame's final
                    if orig != expected[key]:
                        return False
                else:
                    acct = ps["accounts"].get("0x" + addr.hex())
                    if acct is None:
                        return False
                    acct_rlp = _walk_value(
                        acct["path"], state_root, keccak256(addr), proven
                    )
                    if acct_rlp is None:
                        pre = 0
                    else:
                        sroot = Account.decode(acct_rlp).storage_root
                        if sroot == EMPTY_ROOT:
                            pre = 0
                        else:
                            spath = acct["slots"].get(hex(slot))
                            if spath is None:
                                return False
                            vrlp = _walk_value(
                                spath,
                                sroot,
                                keccak256(slot.to_bytes(32, "big")),
                                proven,
                            )
                            pre = (
                                rlp.decode_int(rlp.decode(vrlp)) if vrlp else 0
                            )
                    if orig != pre:
                        return False
                expected[key] = int(fin_h, 16)
        return True
    except (PrestateBindingError, KeyError, ValueError, TypeError):
        return False
