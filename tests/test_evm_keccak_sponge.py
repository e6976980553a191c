"""Keccak sponge STARK: trace outputs must equal keccak256, CTL column
shapes line up with the looked tables, and proofs verify
(reference evm/src/keccak_sponge/keccak_sponge_stark.rs:397-466 tests)."""
import random

import numpy as np
import pytest

from plonky2_tpu.evm import keccak_sponge as ks
from plonky2_tpu.evm import memory as mem
from plonky2_tpu.evm.keccak_sponge import (IS_FINAL_BLOCK, KeccakSpongeOp,
                                           KeccakSpongeStark)
from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof

rng = random.Random(0x5095E)


def test_single_block_digest_matches_keccak256():
    stark = KeccakSpongeStark()
    op = KeccakSpongeOp(0, 0, 0, 0, bytes([1, 2, 3]))
    trace = stark.generate_trace([op])
    assert trace[IS_FINAL_BLOCK, 0] == 1
    assert stark.digest(trace, 0) == keccak256(bytes([1, 2, 3]))


@pytest.mark.parametrize("length", [0, 135, 136, 137, 272, 300])
def test_multi_block_digest_matches_keccak256(length):
    stark = KeccakSpongeStark()
    data = bytes(rng.randrange(256) for _ in range(length))
    trace = stark.generate_trace([KeccakSpongeOp(0, 0, 0, 0, data)])
    final_rows = np.nonzero(trace[IS_FINAL_BLOCK])[0]
    assert len(final_rows) == 1
    assert stark.digest(trace, int(final_rows[0])) == keccak256(data)


def test_ctl_column_shapes():
    # memory CTL rows must match the memory table's looked shape
    assert len(ks.ctl_looking_memory(7)) == len(mem.ctl_data())
    # logic CTL rows: 3 flags + 8 in0 + 8 in1 + 8 out
    assert len(ks.ctl_looking_logic(4)) == 27
    assert ks.num_logic_ctls() == 5


def test_sponge_stark_prove_verify():
    stark = KeccakSpongeStark()
    ops = [KeccakSpongeOp(0, 2, 0, 1, bytes(range(200))),
           KeccakSpongeOp(0, 2, 64, 9, b"hello world")]
    trace = stark.generate_trace(ops)
    config = StarkConfig.standard_fast_config()
    proof = prove(stark, config, trace, [])
    verify_stark_proof(stark, proof, config)


def test_sponge_stark_rejects_broken_chaining():
    stark = KeccakSpongeStark()
    trace = stark.generate_trace([KeccakSpongeOp(0, 2, 0, 1,
                                                 bytes(range(200)))])
    # second row of the op must continue from the first's updated state
    trace[ks.ORIGINAL_RATE_U32S[0], 1] ^= np.uint64(1)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove(stark, config, trace, [])
        verify_stark_proof(stark, proof, config)
