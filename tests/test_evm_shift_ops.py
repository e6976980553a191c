"""SHL/SHR (via the in-memory kernel shift table), ADDMOD/MULMOD (true
3-pop ternaries — the reference's BASIC_TERNARY_OP says 2, stack.rs:31-35)
and BYTE, executed and constraint-checked end to end."""
import numpy as np
import pytest

from plonky2_tpu.evm import cpu as cpu_mod
from plonky2_tpu.evm.generation import generate_kernel_execution
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.stdlib import SHIFT_TABLE_INIT
from plonky2_tpu.evm.memory import MemoryStark, Segment
from plonky2_tpu.stark.testing import trace_constraint_violations

MAIN_OPS = """
    // SHL: 5 << 3 = 40
    PUSH 5
    PUSH 3
    SHL
    // SHR: 40 >> 2 = 10
    PUSH 2
    SHR
    // store for inspection
    PUSH 77
    PUSH 2
    PUSH 0
    MSTORE_GENERAL
    // ADDMOD: (9 + 8) mod 7 = 3   (stack: N, b, a -> push a first)
    PUSH 7
    PUSH 8
    PUSH 9
    ADDMOD
    PUSH 78
    PUSH 2
    PUSH 0
    MSTORE_GENERAL
    // MULMOD: (9 * 8) mod 7 = 2
    PUSH 7
    PUSH 8
    PUSH 9
    MULMOD
    PUSH 79
    PUSH 2
    PUSH 0
    MSTORE_GENERAL
    // BYTE: byte 30 of 0xAB00 is 0xAB
    PUSH 0xAB00
    PUSH 30
    BYTE
    PUSH 80
    PUSH 2
    PUSH 0
    MSTORE_GENERAL
GLOBAL halt_pc0:
    PUSH halt_pc0
GLOBAL halt_pc1:
    JUMP
"""


def make_kernel():
    # main: falls straight into the shift-table init, then the op sequence
    src = ("GLOBAL main:\n"
           + SHIFT_TABLE_INIT.replace("GLOBAL init_shift_table:", "")
           + MAIN_OPS)
    return assemble([parse(src)], evm_constants(), optimize=False)


@pytest.fixture(scope="module")
def executed():
    kernel = make_kernel()
    return kernel, generate_kernel_execution(kernel)


def test_shift_semantics(executed):
    kernel, ex = executed
    mem = ex.final_state.memory
    assert mem[(0, 2, 77)] == 10          # (5 << 3) >> 2
    assert mem[(0, 2, 78)] == 3           # addmod
    assert mem[(0, 2, 79)] == 2           # mulmod
    assert mem[(0, 2, 80)] == 0xAB        # byte
    # shift table got initialized in full
    st = int(Segment.ShiftTable)
    assert mem[(0, st, 0)] == 1
    assert mem[(0, st, 255)] == 1 << 255
    assert (0, st, 256) not in mem


def test_shift_trace_satisfies_cpu_constraints(executed):
    kernel, ex = executed
    assert trace_constraint_violations(cpu_mod.CpuStark(kernel),
                                       ex.cpu_trace) == []


def test_shift_memory_trace_satisfies_constraints(executed):
    _, ex = executed
    stark = MemoryStark()
    trace = stark.generate_trace(ex.memory_ops)
    assert trace_constraint_violations(stark, trace) == []


@pytest.mark.slow
def test_shift_ops_prove_verify():
    from plonky2_tpu.evm.all_stark import (generate_all_traces_with_cpu,
                                           make_all_stark_with_cpu)
    from plonky2_tpu.evm.prover import prove_all
    from plonky2_tpu.evm.verifier import verify_all_proof
    from plonky2_tpu.stark.config import StarkConfig

    kernel = make_kernel()
    traces = generate_all_traces_with_cpu(kernel)
    all_stark = make_all_stark_with_cpu(kernel)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)
