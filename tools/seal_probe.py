"""Wide-table recursion probe: seal ONE minimal keccak-mpt-v2
containment group (full 4160-column sponge width, 128-row trace) and
verify the outer proof.

This is the reproducible measurement behind docs/SOUNDNESS.md
"seal-v2" and PARITY.md: the outer circuit pays O(width) gates per
inner FRI query, so the sponge table dominates — the minimal group
traces to a (2^21, 12) gate table + (2^16, 705) Poseidon2-call table.
Measured on a contended 2-core CPU host (round 5): inner prove 250 s,
circuit build 87 s, outer prove 2504 s, verify_recursion True in 101 s.

Usage:  python tools/seal_probe.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("RAIKO_EAGER_QUOTIENT", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np


def main() -> None:
    from raiko_tpu.stark import prover as sp
    from raiko_tpu.stark import recursion
    from raiko_tpu.stark.airs.containment import (
        ByteCodeAir,
        ContainAir,
        pad_keccak,
    )
    from raiko_tpu.stark.airs.keccak_air import KeccakSpongeV2Air
    from raiko_tpu.utils import keccak256

    child = b"hello-child"
    d = keccak256(child)
    root_msg = b"prefix" + d + b"suffix"
    msgs = [root_msg, child]

    padded = [pad_keccak(m) for m in msgs]
    off = msgs[0].find(keccak256(msgs[1]))
    claims = [(keccak256(msgs[1]), 0, off)]
    mults = {(0, off + j): 1 for j in range(32)}

    air = KeccakSpongeV2Air.from_messages(msgs, msg_id_offset=0, bind_root=True)
    bytetab = ByteCodeAir([len(p) for p in padded])
    claimt = ContainAir(len(msgs) - 1)
    tables = [
        (air, air.trace(), air.publics()),
        (bytetab, bytetab.trace(msgs, mults), []),
        (claimt, claimt.trace(claims), []),
    ]
    print(f"sponge trace {tables[0][1].shape} width {air.width}", flush=True)
    t0 = time.time()
    proofs = sp.prove_tables(tables)
    print(f"inner prove: {time.time() - t0:.1f}s", flush=True)

    inner = [
        recursion.InnerTable(
            air=a, log_n=int(np.log2(tr.shape[0])), publics=list(pub)
        )
        for (a, tr, pub) in tables
    ]
    t1 = time.time()
    cair, pair, bundle = recursion.build_recursion([inner], [proofs])
    print(
        f"build circuit: {time.time() - t1:.1f}s gates "
        f"{bundle.gate_trace.shape} calls {bundle.call_trace.shape}",
        flush=True,
    )
    t2 = time.time()
    outer = sp.prove_tables(
        [(cair, bundle.gate_trace, []), (pair, bundle.call_trace, [])]
    )
    print(f"outer prove: {time.time() - t2:.1f}s", flush=True)
    t3 = time.time()
    ok = recursion.verify_recursion([inner], outer)
    print(f"verify_recursion: {ok} ({time.time() - t3:.1f}s)", flush=True)
    assert ok


if __name__ == "__main__":
    main()
