"""SYSCALL / EXIT_KERNEL / GAS / CONSUME_GAS execution
(reference witness/operation.rs:486-523 generate_syscall + :553-580
generate_exit_kernel; Operation::Gas/ConsumeGas are todo!() in the
reference, transition.rs:212-216 — implemented here)."""
import numpy as np
import pytest

from plonky2_tpu.evm import all_stark as ast_mod
from plonky2_tpu.evm import cpu as cpu_mod
from plonky2_tpu.evm.generation import generate_kernel_execution
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.stark.testing import trace_constraint_violations

# STOP (0x00) traps through the syscall jumptable into sys_stop, which
# charges 100 gas, reads the remaining gas, and EXIT_KERNELs back to the
# instruction after the trap site.
KERNEL_SRC = """
GLOBAL main:
    PUSH 3
    PUSH 5
    ADD
    POP
    STOP
    PUSH halt_pc0
    JUMP
GLOBAL sys_stop:
    PUSH 100
    CONSUME_GAS
    GAS
    POP
    EXIT_KERNEL
GLOBAL halt_pc0:
    PUSH halt_pc0
GLOBAL halt_pc1:
    JUMP
GLOBAL syscall_jumptable:
    JUMPTABLE sys_stop
"""


def make_syscall_kernel():
    return assemble([parse(KERNEL_SRC)], {}, optimize=False)


def test_syscall_execution_semantics():
    kernel = make_syscall_kernel()
    ex = generate_kernel_execution(kernel)
    st = ex.final_state
    assert st.gas_used == 100
    assert st.is_kernel
    # the trace pads by spinning the halt loop; depending on where it
    # stops, the loop's PUSH may have just executed
    labels = kernel.global_labels
    assert st.stack in ([], [labels["halt_pc0"]])
    # the trap pushed kexit_info = (pc_after_stop) + (1 << 32); EXIT_KERNEL
    # consumed it and resumed in kernel mode
    labels = kernel.global_labels
    assert int(ex.cpu_trace[cpu_mod.PROGRAM_COUNTER, -1]) in (
        labels["halt_pc0"], labels["halt_pc1"])


def test_syscall_trace_satisfies_cpu_constraints():
    kernel = make_syscall_kernel()
    ex = generate_kernel_execution(kernel)
    assert trace_constraint_violations(cpu_mod.CpuStark(kernel),
                                       ex.cpu_trace) == []


def test_syscall_row_shape():
    """The syscall row reads the 3 handler bytes from the jumptable and
    pushes kexit_info; the next row enters the handler in kernel mode."""
    from plonky2_tpu.evm.kernel.assembler import BYTES_PER_OFFSET
    from plonky2_tpu.evm.memory import Segment

    kernel = make_syscall_kernel()
    ex = generate_kernel_execution(kernel)
    tr = ex.cpu_trace
    rows = np.nonzero(tr[cpu_mod.OP["syscall"]])[0]
    assert len(rows) == 1
    j = int(rows[0])
    jt = kernel.global_labels["syscall_jumptable"]
    for i in range(BYTES_PER_OFFSET):
        ch = cpu_mod.MEM_CHANNELS[i]
        assert tr[ch.used, j] == 1 and tr[ch.is_read, j] == 1
        assert tr[ch.addr_segment, j] == int(Segment.Code)
        assert tr[ch.addr_virtual, j] == jt + 0x00 * BYTES_PER_OFFSET + i
    push = cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1]
    kexit = int(tr[push.value[0], j]) + (int(tr[push.value[1], j]) << 32)
    assert kexit == int(tr[cpu_mod.PROGRAM_COUNTER, j]) + 1 + (1 << 32)
    assert tr[cpu_mod.PROGRAM_COUNTER, j + 1] == \
        kernel.global_labels["sys_stop"]
    assert tr[cpu_mod.IS_KERNEL_MODE, j + 1] == 1


@pytest.mark.slow
def test_syscall_all_stark_prove_verify():
    from plonky2_tpu.evm.prover import prove_all
    from plonky2_tpu.evm.verifier import verify_all_proof
    from plonky2_tpu.stark.config import StarkConfig

    kernel = make_syscall_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)


@pytest.mark.slow
def test_tampered_syscall_handler_rejected():
    """Redirecting the syscall to a different pc must violate the
    jumptable-dispatch constraints."""
    kernel = make_syscall_kernel()
    ex = generate_kernel_execution(kernel)
    tr = ex.cpu_trace.copy()
    j = int(np.nonzero(tr[cpu_mod.OP["syscall"]])[0][0])
    # jump somewhere other than the handler the jumptable bytes dictate
    # (changing the bytes too would instead be caught by the memory CTL)
    tr[cpu_mod.PROGRAM_COUNTER, j + 1] = \
        int(tr[cpu_mod.PROGRAM_COUNTER, j + 1]) + 1
    violations = trace_constraint_violations(cpu_mod.CpuStark(kernel), tr)
    assert violations, "tampered syscall dispatch was not caught"
