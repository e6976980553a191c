"""Memory STARK: ordered access log with read consistency and delta range
checks (reference evm/src/memory/memory_stark.rs)."""
import random

import numpy as np
import pytest

from plonky2_tpu.evm.memory import (FILTER, IS_READ, MemoryOp, MemoryStark,
                                    Segment, value_limb)
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof

rng = random.Random(0x3E3)


def random_ops(n):
    ops = []
    mem = {}
    for t in range(1, n + 1):
        addr = (0, int(Segment.MainMemory), rng.randrange(4))
        if addr in mem and rng.random() < 0.5:
            ops.append(MemoryOp(filter=True, timestamp=t, is_read=True,
                                context=addr[0], segment=addr[1],
                                virt=addr[2], value=mem[addr]))
        else:
            value = rng.randrange(1 << 256)
            mem[addr] = value
            ops.append(MemoryOp(filter=True, timestamp=t, is_read=False,
                                context=addr[0], segment=addr[1],
                                virt=addr[2], value=value))
    return ops


def test_memory_stark_prove_verify():
    stark = MemoryStark()
    trace = stark.generate_trace(random_ops(12))
    config = StarkConfig.standard_fast_config()
    proof = prove(stark, config, trace, [])
    verify_stark_proof(stark, proof, config)


def test_memory_stark_rejects_inconsistent_read():
    stark = MemoryStark()
    ops = random_ops(12)
    trace = stark.generate_trace(ops)
    # find a filtered read row and corrupt its value: a read must return the
    # previously-written value at the same address
    bad = None
    for j in range(1, trace.shape[1]):
        if trace[FILTER, j] == 1 and trace[IS_READ, j] == 1:
            bad = j
            break
    assert bad is not None
    trace[value_limb(0), bad] = (int(trace[value_limb(0), bad]) + 1) % \
        ((1 << 64) - (1 << 32) + 1)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove(stark, config, trace, [])
        verify_stark_proof(stark, proof, config)
