"""STARK stack: FibonacciStark prove + verify with permutation args
(mirrors reference starky/src/fibonacci_stark.rs:155-199)."""
import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.models.fibonacci_stark import FibonacciStark
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import (StarkVerificationError,
                                        verify_stark_proof)
from plonky2_tpu.fri.verifier import FriVerificationError


def make_config():
    return StarkConfig(
        security_bits=1, num_challenges=2,
        fri_config=FriConfig(rate_bits=1, cap_height=2, proof_of_work_bits=8,
                             reduction_strategy=FriReductionStrategy.ConstantArityBits(2, 4),
                             num_query_rounds=12))


@pytest.fixture(scope="module")
def fib_stark_proof():
    stark = FibonacciStark(1 << 6)
    config = make_config()
    trace = stark.generate_trace(0, 1)
    expected = stark.expected_result(0, 1)
    proof = prove(stark, config, trace, [0, 1, expected], use_device=False)
    return stark, config, proof, expected


def test_stark_prove_verify(fib_stark_proof):
    stark, config, proof, expected = fib_stark_proof
    assert proof.proof.permutation_zs_cap is not None  # permutation args used
    verify_stark_proof(stark, proof, config)


def test_stark_rejects_wrong_result(fib_stark_proof):
    import copy
    stark, config, proof, expected = fib_stark_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (expected + 1) % ((1 << 64) - (1 << 32) + 1)
    with pytest.raises((StarkVerificationError, FriVerificationError)):
        verify_stark_proof(stark, bad, config)


def test_stark_rejects_tampered_opening(fib_stark_proof):
    import copy
    stark, config, proof, _ = fib_stark_proof
    bad = copy.deepcopy(proof)
    bad.proof.openings.local_values[0][0] ^= np.uint64(1)
    with pytest.raises((StarkVerificationError, FriVerificationError)):
        verify_stark_proof(stark, bad, config)


def test_stark_invalid_trace_fails_to_prove_valid():
    """A corrupted trace still produces a proof object, but it must not verify."""
    stark = FibonacciStark(1 << 5)
    config = make_config()
    trace = stark.generate_trace(0, 1)
    trace[1, 7] ^= np.uint64(1)  # break the transition at row 7
    expected = stark.expected_result(0, 1)
    proof = prove(stark, config, trace, [0, 1, expected], use_device=False)
    with pytest.raises((StarkVerificationError, FriVerificationError)):
        verify_stark_proof(stark, proof, config)
