"""Prover runtime: device sessions (reference CudaInvContext role)."""
from .meshctx import active_mesh, mesh_sharding
from .session import ProverSession

__all__ = ["ProverSession", "mesh_sharding", "active_mesh"]
