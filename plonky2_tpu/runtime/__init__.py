"""Prover runtime: device sessions (reference CudaInvContext role)."""
from .session import ProverSession

__all__ = ["ProverSession"]
