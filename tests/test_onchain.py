"""On-chain registration + verifier-call analogs (provers/onchain.py):
SGX instance self-registration against the simulated verifier contract
and the constant-shape final-proof verification via eth_call, in-process
and over the JSON-RPC wire."""

import pytest

from chainsim import ChainSim, install_proof_verifier, install_sgx_verifier
from raiko_tpu.core.provider import SimBlockDataProvider
from raiko_tpu.provers import onchain
from raiko_tpu.provers.tee import TeeProver

SGX_VERIFIER = b"\x51" * 20
PROOF_VERIFIER = b"\x52" * 20


@pytest.fixture()
def world():
    sim = ChainSim("ethereum")
    registry = install_sgx_verifier(sim, SGX_VERIFIER)
    install_proof_verifier(sim, PROOF_VERIFIER)
    return sim, registry


def test_sgx_instance_registration(world, tmp_path):
    sim, registry = world
    provider = SimBlockDataProvider(sim)
    prover = TeeProver(key_dir=str(tmp_path))
    info = prover.bootstrap()
    iid = prover.register_instance(provider, SGX_VERIFIER)
    assert iid == 1
    assert (
        "0x" + registry["instances"][1].hex() == info["new_instance"]
    )
    # a second registration gets the next id
    prover2 = TeeProver(key_dir=str(tmp_path / "b"))
    prover2.bootstrap()
    assert prover2.register_instance(provider, SGX_VERIFIER) == 2
    # forged quote (wrong bound address) is rejected by the contract
    quote = bytes.fromhex(info["quote"])
    bad = bytearray(quote)
    bad[20] ^= 1
    with pytest.raises(Exception):
        onchain.register_sgx_instance(
            provider, SGX_VERIFIER, bytes(bad), registry["instances"][1]
        )


def test_verify_proof_onchain_roundtrip(world):
    """The verifier-contract analog of snarks.rs:159-205: a real
    transcript proof wrapped as the constant-shape seal verifies via
    eth_call; tampered journals/seals do not."""
    sim, _ = world
    provider = SimBlockDataProvider(sim)
    from raiko_tpu.provers.tpu_stark import prove_transcript

    ih = bytes(range(32))
    payload = prove_transcript(ih)
    seal = onchain.seal_from_payload(payload)
    assert onchain.verify_proof_onchain(provider, PROOF_VERIFIER, ih, seal)
    # wrong journal
    bad_j = bytes(31) + b"\x01"
    assert not onchain.verify_proof_onchain(provider, PROOF_VERIFIER, bad_j, seal)
    # corrupted seal bytes
    bad_payload = dict(payload, digest=[0] * 8)
    bad_seal = onchain.seal_from_payload(bad_payload)
    assert not onchain.verify_proof_onchain(
        provider, PROOF_VERIFIER, ih, bad_seal
    )
    # codeless address: empty return, treated as failure
    assert not onchain.verify_proof_onchain(provider, b"\x99" * 20, ih, seal)


def test_onchain_calls_over_the_wire(world, tmp_path):
    """The same flows through a real HTTP JSON-RPC endpoint (eth_call
    wire format)."""
    from test_rpc_wire import RpcFacade
    from raiko_tpu.core.provider import RpcBlockDataProvider

    sim, registry = world
    facade = RpcFacade(sim)
    try:
        provider = RpcBlockDataProvider(facade.url)
        prover = TeeProver(key_dir=str(tmp_path))
        prover.bootstrap()
        assert prover.register_instance(provider, SGX_VERIFIER) == 1
        assert "eth_call" in facade.calls
    finally:
        facade.stop()
