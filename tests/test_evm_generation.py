"""Full kernel-execution witness generation
(reference evm/src/witness/ + generation/mod.rs): an assembled kernel is
executed into CPU cycle rows that satisfy the whole constraint set, with
consistent memory/logic/keccak witnesses across the 5-table AllStark."""
import numpy as np
import pytest

from plonky2_tpu.evm import all_stark as ast_mod
from plonky2_tpu.evm import cpu as cpu_mod
from plonky2_tpu.evm.generation import generate_kernel_execution
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.memory import MemoryStark, Segment
from plonky2_tpu.evm.prover import prove_all
from plonky2_tpu.evm.verifier import verify_all_proof
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.testing import trace_constraint_violations

# Exercises every op class the execution generator supports: push/pop,
# arithmetic, EQ/ISZERO/NOT, AND (logic CTL), taken JUMPI, JUMPDEST, GETPC,
# DUP/SWAP, MSTORE_GENERAL/MLOAD_GENERAL, and the 2-pc halt loop.
KERNEL_SRC = """
GLOBAL main:
    PUSH 3
    PUSH 5
    ADD
    PUSH 8
    EQ
    PUSH skip
    JUMPI
    PUSH 0xdead
GLOBAL skip:
    JUMPDEST
    GETPC
    POP
    PUSH 0x0f
    PUSH 0x09
    AND
    NOT
    ISZERO
    POP
    PUSH 42
    PUSH 1
    SWAP1
    DUP2
    MUL
    SUB
    PUSH 100
    PUSH 2
    PUSH 0
    MSTORE_GENERAL
    PUSH 100
    PUSH 2
    PUSH 0
    MLOAD_GENERAL
    POP
GLOBAL halt_pc0:
    PUSH halt_pc0
GLOBAL halt_pc1:
    JUMP
"""


def make_kernel():
    # optimize=False: the peephole optimizer would constant-fold most of
    # this op-coverage program away
    return assemble([parse(KERNEL_SRC)], {}, optimize=False)


def test_execution_trace_satisfies_cpu_constraints():
    kernel = make_kernel()
    ex = generate_kernel_execution(kernel)
    assert trace_constraint_violations(cpu_mod.CpuStark(kernel),
                                       ex.cpu_trace) == []


def test_execution_semantics():
    kernel = make_kernel()
    ex = generate_kernel_execution(kernel)
    # the program stored 42*1 - 1 = 41 at (0, 2, 100) and loaded it back
    assert ex.final_state.memory[(0, 2, 100)] == 41
    # AND produced one logic-table obligation: 0x09 AND 0x0f
    assert [(o.operator, o.input0, o.input1) for o in ex.logic_ops] \
        == [("and", 0x09, 0x0F)]
    # the one-row arithmetic ops produced arithmetic-table obligations
    assert [(o.op, o.input0, o.input1) for o in ex.arith_ops] \
        == [("add", 5, 3), ("mul", 1, 42), ("sub", 42, 1)]
    # the trace ends inside the halt loop
    labels = kernel.global_labels
    last_pc = int(ex.cpu_trace[cpu_mod.PROGRAM_COUNTER, -1])
    assert last_pc in (labels["halt_pc0"], labels["halt_pc1"])
    # every cycle row reads its code byte; stack ops hit the stack segment
    stack_ops = [op for op in ex.memory_ops
                 if op.segment == int(Segment.Stack)]
    assert stack_ops, "expected stack traffic"
    # each stack read is preceded by a write of the same value
    written = {}
    for op in sorted(ex.memory_ops, key=lambda o: o.timestamp):
        key = (op.context, op.segment, op.virt)
        if op.is_read:
            if op.segment == int(Segment.Stack):
                assert written[key] == op.value, (key, op)
        else:
            written[key] = op.value


def test_execution_memory_trace_satisfies_constraints():
    kernel = make_kernel()
    ex = generate_kernel_execution(kernel)
    stark = MemoryStark()
    trace = stark.generate_trace(ex.memory_ops)
    assert trace_constraint_violations(stark, trace) == []


@pytest.mark.slow
def test_all_stark_execution_prove_verify():
    kernel = make_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)


def _tamper_op_result(op_name):
    """Flip the claimed result (channel 2) of the single `op_name` row and
    return traces; the matching CTL must break."""
    kernel = make_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    cpu_trace = traces[0]
    rows = np.nonzero(cpu_trace[cpu_mod.OP[op_name]])[0]
    assert len(rows) == 1
    ch2 = cpu_mod.MEM_CHANNELS[2]
    cpu_trace[ch2.value[0], rows[0]] ^= np.uint64(1)
    return all_stark, traces


@pytest.mark.slow
@pytest.mark.parametrize("op_name", ["and_", "mul"])
def test_all_stark_execution_rejects_tampered_result(op_name):
    """Flipping the AND result must break the logic CTL; flipping the MUL
    result must break the arithmetic CTL."""
    all_stark, traces = _tamper_op_result(op_name)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove_all(all_stark, config, traces)
        verify_all_proof(all_stark, proof, config)


KECCAK_KERNEL_SRC = """
GLOBAL main:
    PUSH 0x61
    PUSH 0
    PUSH 4
    PUSH 0
    MSTORE_GENERAL
    PUSH 0x62
    PUSH 1
    PUSH 4
    PUSH 0
    MSTORE_GENERAL
    PUSH 0x63
    PUSH 2
    PUSH 4
    PUSH 0
    MSTORE_GENERAL
    PUSH 3
    PUSH 0
    PUSH 4
    PUSH 0
    KECCAK_GENERAL
    POP
GLOBAL halt_pc0:
    PUSH halt_pc0
GLOBAL halt_pc1:
    JUMP
"""


def make_keccak_kernel():
    return assemble([parse(KECCAK_KERNEL_SRC)], {}, optimize=False)


def test_keccak_general_execution():
    """KECCAK_GENERAL hashes stored memory bytes; the pushed digest is the
    sponge's little-endian u32-limb encoding of keccak256."""
    from plonky2_tpu.hash.keccak import keccak256
    kernel = make_keccak_kernel()
    ex = generate_kernel_execution(kernel)
    assert trace_constraint_violations(cpu_mod.CpuStark(kernel),
                                       ex.cpu_trace) == []
    # two sponge ops: the bootstrap code hash and the executed one
    assert len(ex.sponge_ops) == 2
    assert ex.sponge_ops[1].input == b"abc"
    rows = np.nonzero(ex.cpu_trace[cpu_mod.OP["keccak_general"]])[0]
    assert len(rows) == 1
    ch4 = cpu_mod.MEM_CHANNELS[4]
    got = b"".join(
        int(ex.cpu_trace[ch4.value[i], rows[0]]).to_bytes(4, "little")
        for i in range(8))
    assert got == keccak256(b"abc")


@pytest.mark.slow
def test_all_stark_keccak_general_prove_verify():
    kernel = make_keccak_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)


@pytest.mark.slow
def test_all_stark_keccak_general_rejects_wrong_digest():
    kernel = make_keccak_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    cpu_trace = traces[0]
    rows = np.nonzero(cpu_trace[cpu_mod.OP["keccak_general"]])[0]
    ch4 = cpu_mod.MEM_CHANNELS[4]
    cpu_trace[ch4.value[0], rows[0]] ^= np.uint64(1)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove_all(all_stark, config, traces)
        verify_all_proof(all_stark, proof, config)
