"""Block-proof wall-clock bench (SURVEY §6 baseline obligation).

Proves ONE simulated taiko_a7 blob block end to end (preflight ->
get_output -> prove) with the requested backend and prints ONE JSON
line: {"backend", "txs", "preflight_s", "prove_cold_s", "prove_warm_s",
"total_s", "coverage", "breakdown"}.  Run by bench.py in a subprocess
(fresh process => the persistent XLA cache applies; a timeout there
cannot wedge the main bench).

Workload (VERDICT r4 "next" #5: a real-scale block, not a 3-tx toy):
100 txs across 20 storage contracts — 80 contract calls with storage
churn (each contract's slots written repeatedly across txs), 10 plain
value transfers, and 10 calls into a contract that CALLs a second
contract plus the identity precompile (exercising the round-4/5 call
composition).  The zk backends prove twice: ``prove_cold_s`` includes
every one-time XLA compile this process needs; ``prove_warm_s`` is the
steady-state number (proof cache disabled both times).  The reference's
comparable workload is taiko testnet block 101368
(/root/reference/core/src/lib.rs:300-302).

``BENCH_BLOCK_TXS`` overrides the tx count (smaller smoke runs).
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
    from raiko_tpu.utils.measurement import Measurement

    n_txs = int(os.environ.get("BENCH_BLOCK_TXS", "100"))
    n_contracts = max(1, min(20, n_txs // 5))

    keys = [0xBE7C + i for i in range(8)]
    senders = [secp256k1.pubkey_to_address(secp256k1.pubkey(k)) for k in keys]
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    for s in senders:
        l1.fund(s, 10**20)
    l1.produce_block([])
    l2 = TaikoSim(l1, "taiko_a7")
    for s in senders:
        l2.fund(s, 10**20)
    # 20 storage contracts: slotK += 1 for K in {1, 2} (two SLOADs + two
    # SSTOREs per call => real churn), pre-seeded slots
    churn_code = bytes.fromhex(
        "6001546001016001556002546001016002" + "5500"
    )
    contracts = []
    for i in range(n_contracts):
        addr = bytes([0x95, i]) + b"\x00" * 18
        l2.fund(addr, 0, code=churn_code, storage={1: 5 + i, 2: 9 + i})
        contracts.append(addr)
    # a call-composition pair: A CALLs B then the identity precompile
    callee_b = bytes([
        0x60, 0x00, 0x35, 0x60, 0x01, 0x01,
        0x60, 0x00, 0x52, 0x60, 0x20, 0x60, 0x00, 0xF3,
    ])
    addr_b = b"\x97" + b"\x00" * 19
    l2.fund(addr_b, 0, code=callee_b)
    caller_a = bytes(
        [
            0x60, 41, 0x60, 0x00, 0x52,
            0x60, 0x20, 0x60, 0x20, 0x60, 0x20, 0x60, 0x00, 0x60, 0x00,
            0x73, *addr_b, 0x61, 0xFF, 0xFF, 0xF1,
            0x60, 0x20, 0x51, 0x01,
            0x60, 0x20, 0x60, 0x40, 0x60, 0x20, 0x60, 0x00, 0x60, 0x00,
            0x60, 0x04, 0x61, 0xFF, 0xFF, 0xF1,
            0x00,
        ]
    )
    addr_a = b"\x98" + b"\x00" * 19
    l2.fund(addr_a, 0, code=caller_a)

    nonces = [0] * len(keys)

    def mktx(sender_i, to, value=0, gas=200_000):
        tx = Transaction(
            tx_type=2, chain_id=167009, nonce=nonces[sender_i],
            max_priority_fee_per_gas=1, max_fee_per_gas=100,
            gas_limit=gas, to=to, value=value,
        )
        tx.sign(keys[sender_i])
        nonces[sender_i] += 1
        return tx

    txs = []
    for i in range(n_txs):
        si = i % len(keys)
        if i % 10 == 8:  # 10% plain transfers
            txs.append(mktx(si, bytes([0x66, i]) + b"\x00" * 18, value=7,
                            gas=21_000))
        elif i % 10 == 9:  # 10% call-composition txs
            txs.append(mktx(si, addr_a, gas=150_000))
        else:  # 80% storage churn
            txs.append(mktx(si, contracts[i % n_contracts]))
    l2.produce_taiko_block(txs, use_blob=True)
    register_sim("ethereum", l1)
    register_sim("taiko_a7", l2)
    ptype = {
        "native": ProofType.NATIVE,
        "tpu_stark": ProofType.TPU_STARK,
        "tpu_shard": ProofType.TPU_SHARD,
    }[backend]
    prover_args = {"proof_cache": False, "max_evm_frames": n_txs}
    if os.environ.get("BENCH_SHARD_WORKERS"):
        prover_args["shard_workers"] = int(os.environ["BENCH_SHARD_WORKERS"])
    req = ProofRequest(
        block_number=1, network="taiko_a7", proof_type=ptype,
        prover_args=prover_args,
    )
    raiko = Raiko(SupportedChainSpecs(), req)
    t0 = time.time()
    gi = raiko.generate_input()
    output = raiko.get_output(gi)
    t1 = time.time()
    stages: dict[str, float] = {}
    token = Measurement.subscribe(
        lambda name, secs: stages.__setitem__(
            name, stages.get(name, 0.0) + secs
        )
    )
    proof = raiko.prove(gi, output)
    t2 = time.time()
    coverage = None
    if backend in ("tpu_stark", "tpu_shard"):
        try:
            p = json.loads(proof.proof)
            evm = p.get("evm") or {}
            coverage = {"covered": evm.get("covered"), "total": evm.get("total")}
        except Exception:
            pass
        # warm run: identical statement, every XLA shape now compiled
        proof2 = raiko.prove(gi, output)
        assert proof2.input_hash == proof.input_hash
    t3 = time.time()
    Measurement.unsubscribe(token)
    assert proof.input_hash == "0x" + output.hash.hex()
    breakdown = {
        k: round(v, 2)
        for k, v in sorted(stages.items(), key=lambda kv: -kv[1])[:8]
    }
    print(
        json.dumps(
            {
                "backend": backend,
                "txs": n_txs,
                "preflight_s": round(t1 - t0, 2),
                "prove_cold_s": round(t2 - t1, 2),
                "prove_warm_s": (
                    round(t3 - t2, 2)
                    if backend in ("tpu_stark", "tpu_shard")
                    else None
                ),
                "total_s": round(t2 - t0, 2),
                "coverage": coverage,
                "breakdown": breakdown,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
