"""Prover interface + registry (reference lib/src/prover.rs:53-62)."""

from __future__ import annotations

from ..core.interfaces import GuestError, Proof, ProofType


class Prover:
    proof_type: ProofType

    def run(self, guest_input, output, config: dict) -> Proof:
        raise NotImplementedError

    def cancel(self, key) -> None:
        """Best-effort cancellation of a running/remote session."""


_REGISTRY: dict[ProofType, Prover] = {}


def register(prover: Prover) -> None:
    _REGISTRY[prover.proof_type] = prover


def get_prover(proof_type: ProofType) -> Prover:
    if proof_type not in _REGISTRY:
        _autoload()
    if proof_type not in _REGISTRY:
        raise GuestError(f"no prover registered for {proof_type}")
    return _REGISTRY[proof_type]


def _autoload() -> None:
    from . import native, tee  # noqa: F401

    try:
        from . import tpu_stark  # noqa: F401
    except ImportError:  # pragma: no cover - partial builds
        pass
