"""End-to-end PLONK: build the fibonacci circuit, prove, verify; tampered
proofs must be rejected (mirrors reference examples/fibonacci.rs:41-48)."""
import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.verifier import ProofVerificationError
from plonky2_tpu.fri.verifier import FriVerificationError


def fast_test_config(**kw):
    """standard recursion config with cheaper FRI for test speed."""
    fri = FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=8,
                    reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
                    num_query_rounds=8)
    return CircuitConfig(fri_config=fri, security_bits=1, **kw)


@pytest.fixture(scope="module")
def fib_proof():
    data, pw, expected_pis = build_fibonacci_circuit(fast_test_config())
    proof = data.prove(pw, ) if False else None
    from plonky2_tpu.plonk.prover import prove
    proof = prove(data.prover_only, data.common, pw, use_device=False)
    return data, proof, expected_pis


def test_prove_and_verify(fib_proof):
    data, proof, expected_pis = fib_proof
    assert proof.public_inputs == expected_pis
    data.verify(proof)  # raises on failure


def test_tampered_public_input_rejected(fib_proof):
    import copy
    data, proof, _ = fib_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises((ProofVerificationError, FriVerificationError)):
        data.verify(bad)


def test_tampered_opening_rejected(fib_proof):
    import copy
    data, proof, _ = fib_proof
    bad = copy.deepcopy(proof)
    bad.proof.openings.wires[0][0] ^= np.uint64(1)
    with pytest.raises((ProofVerificationError, FriVerificationError)):
        data.verify(bad)


def test_proof_serialization_roundtrip(fib_proof):
    from plonky2_tpu.utils.serialization import deserialize_proof, serialize_proof
    data, proof, _ = fib_proof
    raw = serialize_proof(proof)
    assert isinstance(raw, bytes) and len(raw) > 1000
    restored = deserialize_proof(raw, data.common)
    assert restored.public_inputs == proof.public_inputs
    data.verify(restored)  # deserialized proof still verifies
    # byte-determinism
    assert serialize_proof(restored) == raw
