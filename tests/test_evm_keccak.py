"""Keccak-f[1600] STARK: trace cross-checked against the native permutation,
then proved and verified (reference evm/src/keccak/keccak_stark.rs tests)."""
import random

import numpy as np
import pytest

from plonky2_tpu.evm.keccak_stark import (NUM_INPUTS, NUM_ROUNDS, KeccakStark,
                                          reg_a, reg_a_prime_prime_prime,
                                          reg_step)
from plonky2_tpu.hash.keccak import keccak_f1600
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof

rng = random.Random(0xCECA)


def rand_state():
    return [rng.randrange(1 << 64) for _ in range(NUM_INPUTS)]


def test_keccak_trace_matches_native_permutation():
    stark = KeccakStark()
    state = rand_state()
    trace = stark.generate_trace([state], min_rows=NUM_ROUNDS)
    expected = keccak_f1600(list(state))
    last = NUM_ROUNDS - 1
    assert trace[reg_step(last), last] == 1
    for x in range(5):
        for y in range(5):
            got = (int(trace[reg_a_prime_prime_prime(x, y), last])
                   | (int(trace[reg_a_prime_prime_prime(x, y) + 1, last]) << 32))
            assert got == expected[y * 5 + x], (x, y)
    # round 1's input is round 0's output
    for x in range(5):
        for y in range(5):
            assert trace[reg_a(x, y), 1] == \
                trace[reg_a_prime_prime_prime(x, y), 0]


@pytest.mark.slow
def test_keccak_stark_prove_verify():
    stark = KeccakStark()
    inputs = [rand_state(), rand_state()]
    trace = stark.generate_trace(inputs, min_rows=2 * NUM_ROUNDS)
    config = StarkConfig.standard_fast_config()
    proof = prove(stark, config, trace, [])
    verify_stark_proof(stark, proof, config)


@pytest.mark.slow
def test_keccak_stark_rejects_tampered_output():
    stark = KeccakStark()
    trace = stark.generate_trace([rand_state()], min_rows=NUM_ROUNDS)
    trace[reg_a_prime_prime_prime(1, 1), 5] ^= np.uint64(1)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove(stark, config, trace, [])
        verify_stark_proof(stark, proof, config)
