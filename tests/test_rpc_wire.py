"""RPC wire-format fixture test (VERDICT r2 #9): the full preflight ->
execute -> prove pipeline through RpcBlockDataProvider against a REAL
HTTP JSON-RPC endpoint (a façade over the chain simulator speaking the
Ethereum wire format), so the batching + hex/JSON parsing layer
(core/provider.py _parse_block/_parse_tx/_parse_proof) stops being
untested.  The result must match the in-process Sim-provider run
byte-for-byte (same instance hash)."""

import json
import threading

import pytest

from chainsim import ChainSim
from raiko_tpu.chain import SupportedChainSpecs
from raiko_tpu.core.interfaces import ProofRequest, ProofType
from raiko_tpu.core.orchestrator import Raiko
from raiko_tpu.core.provider import _SIM_REGISTRY, register_sim

from test_host import _free_port
from test_core import SENDER, mktx


def _hx(v: int) -> str:
    return hex(v)


def _hb(b: bytes) -> str:
    return "0x" + b.hex()


def _header_json(h) -> dict:
    out = {
        "parentHash": _hb(h.parent_hash),
        "sha3Uncles": _hb(h.ommers_hash),
        "miner": _hb(h.beneficiary),
        "stateRoot": _hb(h.state_root),
        "transactionsRoot": _hb(h.transactions_root),
        "receiptsRoot": _hb(h.receipts_root),
        "logsBloom": _hb(h.logs_bloom),
        "difficulty": _hx(h.difficulty),
        "number": _hx(h.number),
        "gasLimit": _hx(h.gas_limit),
        "gasUsed": _hx(h.gas_used),
        "timestamp": _hx(h.timestamp),
        "extraData": _hb(h.extra_data) if h.extra_data else "0x",
        "mixHash": _hb(h.mix_hash),
        "nonce": _hb(h.nonce),
    }
    if h.base_fee_per_gas is not None:
        out["baseFeePerGas"] = _hx(h.base_fee_per_gas)
    if h.withdrawals_root is not None:
        out["withdrawalsRoot"] = _hb(h.withdrawals_root)
    if h.blob_gas_used is not None:
        out["blobGasUsed"] = _hx(h.blob_gas_used)
    if h.excess_blob_gas is not None:
        out["excessBlobGas"] = _hx(h.excess_blob_gas)
    if h.parent_beacon_block_root is not None:
        out["parentBeaconBlockRoot"] = _hb(h.parent_beacon_block_root)
    return out


def _tx_json(tx) -> dict:
    out = {
        "type": _hx(tx.tx_type),
        "nonce": _hx(tx.nonce),
        "gas": _hx(tx.gas_limit),
        "value": _hx(tx.value),
        "input": _hb(tx.data) if tx.data else "0x",
        "r": _hx(tx.r),
        "s": _hx(tx.s),
    }
    if tx.to is not None:
        out["to"] = _hb(tx.to)
    if tx.chain_id is not None:
        out["chainId"] = _hx(tx.chain_id)
    if tx.tx_type == 0:
        out["gasPrice"] = _hx(tx.gas_price)
        out["v"] = _hx(tx.v)
    else:
        out["yParity"] = _hx(tx.v)
        if tx.tx_type == 1:
            out["gasPrice"] = _hx(tx.gas_price)
        else:
            out["maxPriorityFeePerGas"] = _hx(tx.max_priority_fee_per_gas)
            out["maxFeePerGas"] = _hx(tx.max_fee_per_gas)
        if tx.tx_type == 3:
            out["maxFeePerBlobGas"] = _hx(tx.max_fee_per_blob_gas)
            out["blobVersionedHashes"] = [
                _hb(h) for h in tx.blob_versioned_hashes
            ]
        out["accessList"] = [
            {
                "address": _hb(a),
                "storageKeys": [_hb(k) for k in keys],
            }
            for a, keys in (tx.access_list or [])
        ]
    return out


class RpcFacade:
    """JSON-RPC HTTP endpoint over a ChainSim (Ethereum wire format)."""

    def __init__(self, sim):
        import http.server

        self.sim = sim
        self.calls: list[str] = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers.get("content-length", 0)))
                reqs = json.loads(body)
                single = isinstance(reqs, dict)
                if single:
                    reqs = [reqs]
                resp = [outer._handle(r) for r in reqs]
                blob = json.dumps(resp[0] if single else resp).encode()
                self.send_response(200)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)

            def log_message(self, *a):
                pass

        self.port = _free_port()
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", self.port), H)
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def stop(self):
        self.httpd.shutdown()

    def _handle(self, req: dict) -> dict:
        method, params = req["method"], req.get("params", [])
        self.calls.append(method)
        try:
            result = self._dispatch(method, params)
        except Exception as e:  # malformed request -> JSON-RPC error
            return {
                "jsonrpc": "2.0",
                "id": req["id"],
                "error": {"code": -32000, "message": str(e)},
            }
        return {"jsonrpc": "2.0", "id": req["id"], "result": result}

    def _dispatch(self, method: str, params: list):
        sim = self.sim
        if method == "eth_getBlockByNumber":
            n = int(params[0], 16)
            header, txs, wds = sim.get_block(n)
            out = _header_json(header)
            out["transactions"] = [_tx_json(t) for t in txs] if params[1] else []
            out["withdrawals"] = [
                {
                    "index": _hx(w.index),
                    "validatorIndex": _hx(w.validator_index),
                    "address": _hb(w.address),
                    "amount": _hx(w.amount_gwei),
                }
                for w in wds
            ]
            return out
        if method == "eth_getTransactionCount":
            info = sim.get_account(int(params[1], 16), bytes.fromhex(params[0][2:]))
            return _hx(info.nonce if info else 0)
        if method == "eth_getBalance":
            info = sim.get_account(int(params[1], 16), bytes.fromhex(params[0][2:]))
            return _hx(info.balance if info else 0)
        if method == "eth_getCode":
            return _hb(
                sim.get_code(int(params[1], 16), bytes.fromhex(params[0][2:]))
            )
        if method == "eth_getStorageAt":
            v = sim.get_storage(
                int(params[2], 16), bytes.fromhex(params[0][2:]), int(params[1], 16)
            )
            return "0x" + v.to_bytes(32, "big").hex()
        if method == "eth_getProof":
            addr = bytes.fromhex(params[0][2:])
            slots = [int(s, 16) for s in params[1]]
            p = sim.get_proof(int(params[2], 16), addr, slots)
            return {
                "accountProof": [_hb(n) for n in p["account_proof"]],
                "storageHash": _hb(p["storage_root"]),
                "nonce": _hx(p["nonce"]),
                "balance": _hx(p["balance"]),
                "codeHash": _hb(p["code_hash"]),
                "storageProof": [
                    {
                        "key": _hb(k),
                        "proof": [_hb(n) for n in nodes],
                    }
                    for k, nodes in p["storage_proofs"].items()
                ],
            }
        if method == "eth_getLogs":
            flt = params[0]
            if "blockHash" in flt:
                return sim.get_logs_by_block_hash(
                    bytes.fromhex(flt["address"][2:]),
                    bytes.fromhex(flt["topics"][0][2:]),
                    bytes.fromhex(flt["blockHash"][2:]),
                )
            return []
        if method == "eth_getTransactionByHash":
            tx = sim.get_transaction_by_hash(bytes.fromhex(params[0][2:]))
            return _tx_json(tx) if tx is not None else None
        if method == "eth_call":
            out = sim.eth_call(
                bytes.fromhex(params[0]["to"][2:]),
                bytes.fromhex(params[0]["data"][2:]),
            )
            return "0x" + out.hex()
        raise ValueError(f"unsupported method {method}")


@pytest.fixture()
def wired_world():
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    l1.fund(SENDER, 10**20)
    l1.produce_block([mktx(0, b"\x77" * 20, value=9)])
    l1.produce_block([mktx(1, b"\x77" * 20, value=9), mktx(2, b"\x66" * 20, value=3)])
    facade = RpcFacade(l1)
    yield l1, facade
    facade.stop()
    _SIM_REGISTRY.clear()


def test_preflight_over_json_rpc_wire(wired_world):
    """Full preflight -> execute -> native prove through the HTTP wire,
    identical to the in-process sim run."""
    l1, facade = wired_world
    req = ProofRequest(
        block_number=2, network="ethereum", proof_type=ProofType.NATIVE
    )
    # wire run: no sim registered; the chain spec points at the façade
    specs = SupportedChainSpecs()
    specs.get("ethereum").rpc = facade.url
    raiko = Raiko(specs, req)
    gi = raiko.generate_input()
    output = raiko.get_output(gi)
    proof = raiko.prove(gi, output)
    assert output.header.hash() == l1.headers[2].hash()
    # the wire layer actually ran: batched methods were exercised
    used = set(facade.calls)
    assert {
        "eth_getBlockByNumber",
        "eth_getTransactionCount",
        "eth_getBalance",
        "eth_getCode",
        "eth_getProof",
    } <= used
    # sim-provider reference run must agree bit-for-bit
    register_sim("ethereum", l1)
    raiko2 = Raiko(SupportedChainSpecs(), req)
    gi2 = raiko2.generate_input()
    output2 = raiko2.get_output(gi2)
    assert output2.hash == output.hash
    # field-level equality (raw serialization may differ in trie-node
    # internal form; all committed content must match)
    assert gi2.block_header.encode() == gi.block_header.encode()
    assert gi2.parent_header.encode() == gi.parent_header.encode()
    assert [t.encode() for t in gi2.transactions] == [
        t.encode() for t in gi.transactions
    ]
    assert gi2.parent_state_trie.hash() == gi.parent_state_trie.hash()
    assert {bytes(a): sorted(s) for a, (_, s) in gi2.parent_storage.items()} == {
        bytes(a): sorted(s) for a, (_, s) in gi.parent_storage.items()
    }
    assert sorted(map(bytes, gi2.contracts)) == sorted(map(bytes, gi.contracts))


def test_rpc_error_taxonomy(wired_world):
    """A failing RPC (unknown block) surfaces as RpcError, the
    NetworkFailure taxonomy class (reference interfaces.rs RPC errors)."""
    from raiko_tpu.core.interfaces import RpcError

    _, facade = wired_world
    specs = SupportedChainSpecs()
    specs.get("ethereum").rpc = facade.url
    req = ProofRequest(
        block_number=99, network="ethereum", proof_type=ProofType.NATIVE
    )
    with pytest.raises(RpcError):
        Raiko(specs, req).generate_input()


# --------------------------------------------------------------------------
# Taiko over the wire: BlockProposed log filter + beacon/blobscan blobs
# (VERDICT r3 #3 — reference core/src/preflight.rs:283-466)
# --------------------------------------------------------------------------


class BeaconFacade:
    """Beacon-API HTTP endpoint over a ChainSim's blob sidecars."""

    def __init__(self, sim, blobscan=False):
        import http.server

        self.sim = sim
        self.requests: list[str] = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                outer.requests.append(self.path)
                blob = json.dumps(outer._handle(self.path)).encode()
                self.send_response(200)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)

            def log_message(self, *a):
                pass

        self.blobscan = blobscan
        self.port = _free_port()
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", self.port), H)
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def _handle(self, path: str):
        if self.blobscan:
            # blobscan: GET /blobs/{versioned_hash}
            assert "/blobs/0x" in path
            want = bytes.fromhex(path.rsplit("0x", 1)[1])
            from raiko_tpu.core.l1_data import calc_blob_versioned_hash

            for sidecars in self.sim.blob_sidecars.values():
                for sc in sidecars:
                    if calc_blob_versioned_hash(sc["blob"]) == want:
                        return {"commitment": sc["kzg_commitment"], "data": sc["blob"]}
            return {"commitment": "0x", "data": "0x"}
        # beacon: GET /eth/v1/beacon/blob_sidecars/{slot}
        slot = int(path.rsplit("/", 1)[1])
        return {"data": self.sim.get_blob_sidecars(slot)}

    @property
    def url(self) -> str:
        host = f"http://127.0.0.1:{self.port}"
        # get_blob_data routes on the URL: blobscan endpoints are
        # recognized by substring, like the reference (preflight.rs:322)
        return host + "/blobscan" if self.blobscan else host

    def stop(self):
        self.httpd.shutdown()


def _mk_taiko_world():
    from chainsim import TaikoSim

    l1 = ChainSim("ethereum")
    l1.fund(SENDER, 10**20)
    l1.produce_block([mktx(0, b"\x77" * 20, value=9)])
    l2 = TaikoSim(l1, "taiko_a7")
    l2.fund(SENDER, 10**20)
    l2.produce_taiko_block(
        [mktx(0, b"\x88" * 20, value=5, chain_id=167009)], use_blob=True
    )
    l2.produce_taiko_block(
        [mktx(1, b"\x88" * 20, value=5, chain_id=167009)], use_blob=False
    )
    return l1, l2


@pytest.fixture()
def taiko_wired_world():
    _SIM_REGISTRY.clear()
    l1, l2 = _mk_taiko_world()
    l1f, l2f = RpcFacade(l1), RpcFacade(l2)
    beacon = BeaconFacade(l1)
    yield l1, l2, l1f, l2f, beacon
    for f in (l1f, l2f, beacon):
        f.stop()
    _SIM_REGISTRY.clear()


def _wire_specs(l1f, l2f, beacon):
    specs = SupportedChainSpecs()
    specs.get("ethereum").rpc = l1f.url
    specs.get("ethereum").beacon_rpc = beacon.url
    specs.get("taiko_a7").rpc = l2f.url
    return specs


def test_taiko_preflight_blob_over_wire(taiko_wired_world):
    """Full taiko preflight with NO registered simulator: the proposal is
    found via eth_getLogs at the inclusion block hash, the propose tx via
    eth_getTransactionByHash, and the blob via the beacon HTTP API with
    slot computation — then the block proves natively."""
    l1, l2, l1f, l2f, beacon = taiko_wired_world
    specs = _wire_specs(l1f, l2f, beacon)
    req = ProofRequest(
        block_number=1, network="taiko_a7", proof_type=ProofType.NATIVE
    )
    raiko = Raiko(specs, req)
    gi = raiko.generate_input()
    output = raiko.get_output(gi)
    raiko.prove(gi, output)
    assert output.header.hash() == l2.headers[1].hash()
    assert gi.taiko.blob_commitment is not None
    # the live-path wire calls actually happened
    assert "eth_getLogs" in l1f.calls
    assert "eth_getTransactionByHash" in l1f.calls
    assert any("/eth/v1/beacon/blob_sidecars/" in p for p in beacon.requests)


def test_taiko_preflight_calldata_over_wire(taiko_wired_world):
    """Calldata-DA block: tx list decoded from proposeBlock calldata of
    the fetched proposal tx (no beacon involved)."""
    l1, l2, l1f, l2f, beacon = taiko_wired_world
    specs = _wire_specs(l1f, l2f, beacon)
    req = ProofRequest(
        block_number=2, network="taiko_a7", proof_type=ProofType.NATIVE
    )
    raiko = Raiko(specs, req)
    gi = raiko.generate_input()
    output = raiko.get_output(gi)
    assert output.header.hash() == l2.headers[2].hash()
    assert not gi.taiko.block_proposed_meta.blob_used
    assert beacon.requests == []


def test_taiko_preflight_blobscan_fallback(taiko_wired_world):
    """With a blobscan-style endpoint configured, the blob is fetched by
    versioned hash from /blobs/{hash} (ref preflight.rs:391-417)."""
    l1, l2, l1f, l2f, _ = taiko_wired_world
    blobscan = BeaconFacade(l1, blobscan=True)
    try:
        specs = _wire_specs(l1f, l2f, blobscan)
        req = ProofRequest(
            block_number=1, network="taiko_a7", proof_type=ProofType.NATIVE
        )
        raiko = Raiko(specs, req)
        gi = raiko.generate_input()
        output = raiko.get_output(gi)
        assert output.header.hash() == l2.headers[1].hash()
        assert any(p.startswith("/blobscan/blobs/0x") for p in blobscan.requests)
    finally:
        blobscan.stop()
