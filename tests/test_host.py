"""Host HTTP service end-to-end: real server, real requests, simulated
chain (reference host/src/server tests would need live RPCs; this runs the
full v1/v2 surface offline)."""

import asyncio
import json
import socket
import threading
import time

import pytest
import requests

from chainsim import ChainSim, TaikoSim
from raiko_tpu.core.provider import register_sim, _SIM_REGISTRY
from raiko_tpu.host.actor import HostConfig, ProofActor
from raiko_tpu.host.app import create_app, make_jwt
from raiko_tpu.host.cli import build
from raiko_tpu.proto.types import Transaction
from raiko_tpu.utils import secp256k1

KEY = 0xCAFE
SENDER = secp256k1.pubkey_to_address(secp256k1.pubkey(KEY))


def _mktx(nonce, chain_id):
    tx = Transaction(
        tx_type=2,
        chain_id=chain_id,
        nonce=nonce,
        max_priority_fee_per_gas=1,
        max_fee_per_gas=100,
        gas_limit=21000,
        to=b"\x88" * 20,
        value=5,
    )
    tx.sign(KEY)
    return tx


class ServerThread:
    def __init__(self, config: HostConfig):
        self.config = config
        self.loop = asyncio.new_event_loop()
        self.started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        actor, app = build(self.config)
        self.actor = actor

        async def boot():
            from aiohttp import web

            actor.start()
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", self.config.port)
            await site.start()
            self.started.set()

        self.loop.create_task(boot())
        self.loop.run_forever()

    def start(self):
        self.thread.start()
        assert self.started.wait(10)

    def stop(self):
        self.loop.call_soon_threadsafe(self.loop.stop)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    l1.fund(SENDER, 10**20)
    l1.produce_block([_mktx(0, 1)])
    l2 = TaikoSim(l1, "taiko_a7")
    l2.fund(SENDER, 10**20)
    l2.produce_taiko_block([_mktx(0, 167009)], use_blob=False)
    register_sim("ethereum", l1)
    register_sim("taiko_a7", l2)
    port = _free_port()
    cfg = HostConfig(
        concurrency_limit=4,
        port=port,
        default_request={"network": "taiko_a7", "proof_type": "native"},
    )
    srv = ServerThread(cfg)
    srv.start()
    yield f"http://127.0.0.1:{port}", srv
    srv.stop()
    _SIM_REGISTRY.clear()


def test_health_and_metrics(server):
    base, _ = server
    assert requests.get(f"{base}/v1/health", timeout=5).status_code == 200
    m = requests.get(f"{base}/v1/metrics", timeout=5)
    assert m.status_code == 200
    assert b"concurrent_requests" in m.content


def test_v2_proof_state_machine(server):
    base, _ = server
    body = {"block_number": 1}
    r = requests.post(f"{base}/v2/proof", json=body, timeout=30).json()
    assert r["status"] == "ok"
    assert r["data"]["status"] in ("registered", "work_in_progress", "success")
    # poll until success
    for _ in range(120):
        r = requests.post(f"{base}/v2/proof", json=body, timeout=30).json()
        if r["data"]["status"] == "success":
            break
        time.sleep(0.5)
    assert r["data"]["status"] == "success"
    proof = r["data"]["proof"]
    assert proof["input"].startswith("0x")
    # idempotent: returns the stored proof again
    r2 = requests.post(f"{base}/v2/proof", json=body, timeout=30).json()
    assert r2["data"]["proof"] == proof


def test_v2_report_and_prune(server):
    base, _ = server
    rep = requests.get(f"{base}/v2/proof/report", timeout=10).json()
    assert isinstance(rep, list) and rep
    assert rep[0][0]["proof_system"] == "native"
    r = requests.post(f"{base}/v2/proof/prune", timeout=10).json()
    assert r["status"] == "ok"
    rep = requests.get(f"{base}/v2/proof/report", timeout=10).json()
    assert rep == []


def test_v1_blocking_proof(server):
    base, _ = server
    r = requests.post(
        f"{base}/v1/proof", json={"block_number": 1}, timeout=120
    ).json()
    assert r["status"] == "ok"
    assert r["data"]["input"].startswith("0x")


def test_invalid_request(server):
    base, _ = server
    r = requests.post(f"{base}/v2/proof", json={"proof_type": None}, timeout=10)
    assert r.status_code == 400
    assert r.json()["status"] == "error"


def test_root_mount_and_openapi(server):
    base, _ = server
    doc = requests.get(f"{base}/v2/docs/openapi.json", timeout=10).json()
    assert "/v2/proof" in doc["paths"]
    # v2 also mounted at root (reference api/mod.rs)
    rep = requests.get(f"{base}/proof/report", timeout=10)
    assert rep.status_code == 200


def test_docs_ui(server):
    """Interactive docs page (reference Swagger/Scalar UI analog,
    api/v2/mod.rs:146-157) served at /v2/docs and the root mount."""
    base, _ = server
    for path in ("/v2/docs", "/docs"):
        r = requests.get(f"{base}{path}", timeout=10)
        assert r.status_code == 200
        assert "text/html" in r.headers["Content-Type"]
        assert "openapi.json" in r.text


def test_cancel_endpoint(server):
    base, _ = server
    r = requests.post(
        f"{base}/v2/proof/cancel", json={"block_number": 1}, timeout=30
    ).json()
    assert r["status"] == "ok"


def test_jwt_auth():
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    register_sim("ethereum", l1)
    port = _free_port()
    cfg = HostConfig(
        port=port,
        jwt_secret="s3cret",
        default_request={"network": "ethereum", "proof_type": "native"},
    )
    srv = ServerThread(cfg)
    srv.start()
    try:
        base = f"http://127.0.0.1:{port}"
        # health passes without auth
        assert requests.get(f"{base}/v1/health", timeout=5).status_code == 200
        # proof requires bearer
        r = requests.post(f"{base}/v2/proof/report", timeout=5)
        assert r.status_code == 401
        tok = make_jwt("s3cret")
        r = requests.get(
            f"{base}/v2/proof/report",
            headers={"Authorization": f"Bearer {tok}"},
            timeout=5,
        )
        assert r.status_code == 200
        bad = make_jwt("wrong")
        r = requests.get(
            f"{base}/v2/proof/report",
            headers={"Authorization": f"Bearer {bad}"},
            timeout=5,
        )
        assert r.status_code == 401
    finally:
        srv.stop()
        _SIM_REGISTRY.clear()
