"""Recursive verification end-to-end (reference
recursion/recursive_verifier.rs:201-243 tests): prove an inner circuit, build
an outer circuit that verifies the inner proof in-circuit, prove and verify
the outer proof, and check soundness against tampered witnesses."""
import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


@pytest.fixture(scope="module")
def recursion_setup():
    config = CircuitConfig.standard_recursion_config()
    data, pw, _ = build_fibonacci_circuit(config)
    inner_proof = data.prove(pw)
    data.verify(inner_proof)

    b = CircuitBuilder(config)
    outer_pw = PartialWitness()
    pt = b.add_virtual_proof_with_pis(data.common)
    outer_pw.set_proof_with_pis_target(pt, inner_proof)
    vt = b.add_virtual_verifier_data(config.fri_config.cap_height)
    outer_pw.set_verifier_data_target(vt, data.verifier_only)
    b.verify_proof(pt, vt, data.common)
    # expose the inner public inputs as outer public inputs
    b.register_public_inputs(pt.public_inputs)
    outer = b.build()
    return inner_proof, pt, outer, outer_pw


@pytest.mark.slow
def test_recursive_verifier(recursion_setup):
    inner_proof, _, outer, outer_pw = recursion_setup
    outer_proof = outer.prove(outer_pw)
    assert outer_proof.public_inputs == inner_proof.public_inputs
    outer.verify(outer_proof)


@pytest.mark.slow
def test_recursive_verifier_rejects_tampered_proof(recursion_setup):
    _, pt, outer, outer_pw = recursion_setup
    # tamper with one opened wire value — the in-circuit checks become
    # unsatisfiable, surfacing as a partition conflict during witness
    # generation or a failed verification
    bad = PartialWitness()
    bad.target_values = dict(outer_pw.target_values)
    wire_target = pt.proof.openings.wires[0][0]
    orig = bad.target_values[wire_target]
    bad.target_values[wire_target] = (orig + 1) % 0xFFFFFFFF00000001
    with pytest.raises(Exception):
        proof = outer.prove(bad)
        outer.verify(proof)
