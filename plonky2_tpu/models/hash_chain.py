"""Scalable benchmark circuit: a Poseidon hash chain of configurable length.

Each link is one PoseidonGate row, so `length` directly sets the circuit
degree — the knob for profiling the prover at fibonacci scale up through
ed25519 scale (2^18+ rows, cf. BASELINE.md canonical shape).
"""
from __future__ import annotations

from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.config import CircuitConfig


def build_hash_chain_circuit(config: CircuitConfig | None = None,
                             length: int = 100):
    """Proves knowledge of x with H^length([x,0,0,0]) = public output.

    Returns (circuit_data, partial_witness_fn) where partial_witness_fn(x)
    produces the witness for input x."""
    config = config or CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config)

    x = builder.add_virtual_target()
    zero = builder.zero()
    state = [x] + [zero] * 11
    for _ in range(length):
        state = builder.permute(state)
    for i in range(4):
        builder.register_public_input(state[i])

    data = builder.build()

    def witness(x_value: int) -> PartialWitness:
        pw = PartialWitness()
        pw.set_target(x, x_value)
        return pw

    return data, witness


def expected_chain_output(x_value: int, length: int):
    import numpy as np

    from ..hash import poseidon as pos
    state = np.zeros(12, dtype=np.uint64)
    state[0] = x_value
    for _ in range(length):
        state = pos.poseidon(state)
    return [int(v) for v in state[:4]]
