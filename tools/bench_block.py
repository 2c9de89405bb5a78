"""Block-proof wall-clock bench (SURVEY §6 baseline obligation).

Proves one simulated taiko_a7 blob block end to end (preflight ->
get_output -> prove) with the requested backend and prints ONE JSON
line: {"backend": ..., "preflight_s": ..., "prove_s": ..., "total_s":
...}.  Run by bench.py in a subprocess (fresh process => the persistent
XLA cache applies; a timeout there cannot wedge the main bench).

The simulated block carries two storage-contract txs plus a value
transfer — small, but it exercises every statement family (transcript,
state/tx/receipts containment, ancestor chain, EVM frames incl. the
storage journal, prestate binding).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    backend = sys.argv[1] if len(sys.argv) > 1 else "native"
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    sys.path.insert(0, repo)
    from raiko_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from chainsim import ChainSim, TaikoSim
    from raiko_tpu.chain import SupportedChainSpecs
    from raiko_tpu.core.interfaces import ProofRequest, ProofType
    from raiko_tpu.core.orchestrator import Raiko
    from raiko_tpu.core.provider import _SIM_REGISTRY, register_sim
    from raiko_tpu.proto.types import Transaction
    from raiko_tpu.utils import secp256k1

    key = 0xBE7C
    sender = secp256k1.pubkey_to_address(secp256k1.pubkey(key))
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    l1.fund(sender, 10**20)
    l1.produce_block([])
    l2 = TaikoSim(l1, "taiko_a7")
    l2.fund(sender, 10**20)
    contract = b"\x95" * 20
    # slot1 += 1
    l2.fund(contract, 0, code=bytes.fromhex("6001546001016001" + "5500"),
            storage={1: 5})

    def mktx(nonce, to, value=0, gas=200_000):
        tx = Transaction(
            tx_type=2, chain_id=167009, nonce=nonce,
            max_priority_fee_per_gas=1, max_fee_per_gas=100,
            gas_limit=gas, to=to, value=value,
        )
        tx.sign(key)
        return tx

    l2.produce_taiko_block(
        [
            mktx(0, contract),
            mktx(1, contract),
            mktx(2, b"\x66" * 20, value=7, gas=21_000),
        ],
        use_blob=True,
    )
    register_sim("ethereum", l1)
    register_sim("taiko_a7", l2)
    ptype = {
        "native": ProofType.NATIVE,
        "tpu_stark": ProofType.TPU_STARK,
        "tpu_shard": ProofType.TPU_SHARD,
    }[backend]
    req = ProofRequest(
        block_number=1, network="taiko_a7", proof_type=ptype,
        prover_args={"proof_cache": False},
    )
    raiko = Raiko(SupportedChainSpecs(), req)
    t0 = time.time()
    gi = raiko.generate_input()
    output = raiko.get_output(gi)
    t1 = time.time()
    proof = raiko.prove(gi, output)
    t2 = time.time()
    assert proof.input_hash == "0x" + output.hash.hex()
    print(
        json.dumps(
            {
                "backend": backend,
                "preflight_s": round(t1 - t0, 2),
                "prove_s": round(t2 - t1, 2),
                "total_s": round(t2 - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
