"""STARK → SNARK wrapping: verify a STARK proof inside a plonky2 circuit
(reference starky/src/recursive_verifier.rs tests via fibonacci_stark.rs)."""
import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.models.fibonacci_stark import FibonacciStark
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.recursive_verifier import (
    add_virtual_stark_proof_with_pis, set_stark_proof_with_pis_target,
    verify_stark_proof_circuit)
from plonky2_tpu.stark.verifier import verify_stark_proof


@pytest.fixture(scope="module")
def stark_wrap_setup():
    stark = FibonacciStark(64)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = [0, 1, stark.expected_result(0, 1)]
    proof = prove(stark, config, trace, pis)
    verify_stark_proof(stark, proof, config)
    degree_bits = proof.proof.recover_degree_bits(config)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(b, stark, config, degree_bits)
    verify_stark_proof_circuit(b, stark, pt, config, degree_bits)
    b.register_public_inputs(pt.public_inputs)
    outer = b.build()

    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, proof)
    return proof, pt, outer, pw


@pytest.mark.slow
def test_wrap_stark_proof_in_circuit(stark_wrap_setup):
    stark_proof, _, outer, pw = stark_wrap_setup
    wrapped = outer.prove(pw)
    assert wrapped.public_inputs == stark_proof.public_inputs
    outer.verify(wrapped)


@pytest.mark.slow
def test_wrap_rejects_tampered_stark_proof(stark_wrap_setup):
    _, pt, outer, pw = stark_wrap_setup
    bad = PartialWitness()
    bad.target_values = dict(pw.target_values)
    t = pt.proof.openings.local_values[0][0]
    bad.target_values[t] = (bad.target_values[t] + 1) % 0xFFFFFFFF00000001
    with pytest.raises(Exception):
        wrapped = outer.prove(bad)
        outer.verify(wrapped)
