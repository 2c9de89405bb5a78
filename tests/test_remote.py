"""Remote-proving dispatcher e2e: a gateway host forwards proof requests
to a worker raiko-tpu host over the v2 API (the Bonsai / SP1-network
analog, reference provers/risc0/driver/src/bonsai.rs:195-226), with
session persistence in the IdStore and mid-flight cancel."""

import json
import threading
import time

import pytest
import requests

from chainsim import ChainSim, TaikoSim
from raiko_tpu.core.interfaces import ProofRequest, ProofType
from raiko_tpu.core.provider import _SIM_REGISTRY, register_sim
from raiko_tpu.host.actor import HostConfig
from raiko_tpu.provers import ProverCtx
from raiko_tpu.provers.base import get_prover
from raiko_tpu.tasks import TaskDescriptor, get_task_manager

from test_host import SENDER, ServerThread, _free_port, _mktx


@pytest.fixture(scope="module")
def chains():
    _SIM_REGISTRY.clear()
    l1 = ChainSim("ethereum")
    l1.fund(SENDER, 10**20)
    l1.produce_block([_mktx(0, 1)])
    l2 = TaikoSim(l1, "taiko_a7")
    l2.fund(SENDER, 10**20)
    l2.produce_taiko_block([_mktx(0, 167009)], use_blob=False)
    register_sim("ethereum", l1)
    register_sim("taiko_a7", l2)
    yield
    _SIM_REGISTRY.clear()


@pytest.fixture(scope="module")
def worker(chains):
    port = _free_port()
    cfg = HostConfig(
        port=port,
        default_request={"network": "taiko_a7", "proof_type": "native"},
    )
    srv = ServerThread(cfg)
    srv.start()
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def test_remote_prove_e2e(worker):
    """Gateway host with proof_type=remote forwards to the worker and
    returns the worker's proof, bound to the same instance hash."""
    gport = _free_port()
    gcfg = HostConfig(
        port=gport,
        default_request={
            "network": "taiko_a7",
            "proof_type": "remote",
            "endpoint": worker,
            "remote_proof_type": "native",
            "poll_interval": 0.1,
        },
    )
    gw = ServerThread(gcfg)
    gw.start()
    try:
        base = f"http://127.0.0.1:{gport}"
        body = {"block_number": 1}
        deadline = time.time() + 120
        while time.time() < deadline:
            r = requests.post(f"{base}/v2/proof", json=body, timeout=60).json()
            assert r["status"] == "ok", r
            if "proof" in r["data"]:
                break
            time.sleep(0.2)
        else:
            pytest.fail("remote proof did not complete")
        proof = r["data"]["proof"]
        assert proof["input"].startswith("0x")
        # worker proved it too (native backend ran there): its report has
        # the task with the INNER proof system
        rep = requests.get(f"{worker}/v2/proof/report", timeout=10).json()
        assert any(entry[0]["proof_system"] == "native" for entry in rep)
    finally:
        gw.stop()


class _StallServer:
    """A fake remote host whose /v2/proof always reports registered /
    work_in_progress — forcing the dispatcher to stay in its poll loop —
    and which records /v2/proof/cancel calls."""

    def __init__(self):
        import http.server

        self.cancelled = threading.Event()
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                self.rfile.read(int(self.headers.get("content-length", 0)))
                if self.path.endswith("/cancel"):
                    outer.cancelled.set()
                    payload = {"status": "ok", "data": None}
                else:
                    payload = {"status": "ok", "data": {"status": "work_in_progress"}}
                blob = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("content-type", "application/json")
                self.send_header("content-length", str(len(blob)))
                self.end_headers()
                self.wfile.write(blob)

            def log_message(self, *a):
                pass

        self.port = _free_port()
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", self.port), H)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.httpd.shutdown()


def test_remote_midflight_cancel(chains):
    """Cancel-by-id mid-poll: the driver notices the cancel flag, POSTs
    cancel on the remote host, and raises (ref bonsai.rs session cancel /
    sp1 unclaim)."""
    from raiko_tpu.core.orchestrator import Raiko
    from raiko_tpu.chain import SupportedChainSpecs
    from raiko_tpu.provers.remote import RemoteCancelled

    stall = _StallServer()
    specs = SupportedChainSpecs()
    req = ProofRequest(
        block_number=1,
        network="taiko_a7",
        proof_type=ProofType.REMOTE,
        prover_args={
            "endpoint": f"http://127.0.0.1:{stall.port}",
            "remote_proof_type": "native",
            "poll_interval": 0.05,
        },
    )
    raiko = Raiko(specs, req)
    gi = raiko.generate_input()
    output = raiko.get_output(gi)
    tasks = get_task_manager(None, 1 << 20)
    key = TaskDescriptor(
        chain_id=167009, blockhash=b"\x11" * 32, proof_system="remote", prover="0x" + "00" * 20
    )
    ctx = ProverCtx(key=key, id_store=tasks, cancel_ev=threading.Event(), request=req)
    result: dict = {}

    def prove():
        try:
            raiko.prove(gi, output, ctx=ctx)
            result["outcome"] = "completed"
        except RemoteCancelled:
            result["outcome"] = "cancelled"
        except Exception as e:  # pragma: no cover
            result["outcome"] = f"error: {e}"

    t = threading.Thread(target=prove)
    t.start()
    # session id must be persisted while in flight (IdStore, ref
    # lib/src/prover.rs:41-50)
    deadline = time.time() + 10
    while time.time() < deadline and not tasks.read_id(key):
        time.sleep(0.02)
    sid = tasks.read_id(key)
    assert sid and json.loads(sid)["endpoint"] == f"http://127.0.0.1:{stall.port}"
    # cancel by key: the live poll loop notices and cancels remotely
    get_prover(ProofType.REMOTE).cancel(key, tasks)
    t.join(timeout=30)
    assert not t.is_alive()
    assert result["outcome"] == "cancelled"
    assert stall.cancelled.wait(5), "remote host never saw the cancel POST"
    assert tasks.read_id(key) is None, "session id must be cleared"
    stall.stop()


def test_remote_output_binding_check(chains):
    """A remote proof bound to a different instance hash is rejected
    (the reference's expected-output check on Bonsai receipts)."""
    import http.server

    from raiko_tpu.chain import SupportedChainSpecs
    from raiko_tpu.core.interfaces import GuestError
    from raiko_tpu.core.orchestrator import Raiko

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("content-length", 0)))
            payload = {
                "status": "ok",
                "data": {
                    "status": "success",
                    "proof": {"proof": "00", "input": "0x" + "ab" * 32},
                },
            }
            blob = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def log_message(self, *a):
            pass

    port = _free_port()
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", port), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        specs = SupportedChainSpecs()
        req = ProofRequest(
            block_number=1,
            network="taiko_a7",
            proof_type=ProofType.REMOTE,
            prover_args={
                "endpoint": f"http://127.0.0.1:{port}",
                "poll_interval": 0.05,
            },
        )
        raiko = Raiko(specs, req)
        gi = raiko.generate_input()
        output = raiko.get_output(gi)
        with pytest.raises(GuestError, match="bound to"):
            raiko.prove(gi, output)
    finally:
        httpd.shutdown()
