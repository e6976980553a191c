"""CPU table bootstrap phase + 5-table AllStark with the CPU wired in
(reference evm/src/cpu/bootstrap_kernel.rs, all_stark.rs)."""
import numpy as np
import pytest

from plonky2_tpu.evm import all_stark as ast_mod
from plonky2_tpu.evm import cpu as cpu_mod
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.prover import prove_all
from plonky2_tpu.evm.verifier import verify_all_proof
from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.testing import \
    test_stark_low_degree as check_stark_low_degree

KERNEL_SRC = """
GLOBAL main:
    PUSH 2
    PUSH 3
    ADD
    STOP
"""


def make_kernel():
    return assemble([parse(KERNEL_SRC)], {})


def test_bootstrap_trace_writes_code_and_hash():
    kernel = make_kernel()
    trace, mem_ops, sponge_ops = cpu_mod.generate_bootstrap_kernel(kernel)
    # every code byte is written exactly once, in order
    assert [op.value for op in mem_ops] == list(kernel.code)
    assert [op.virt for op in mem_ops] == list(range(len(kernel.code)))
    assert all(not op.is_read for op in mem_ops)
    # the final bootstrap row carries the code hash
    final = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS)
    got = b"".join(
        int(trace[cpu_mod.MEM_CHANNELS[4].value[i], final]).to_bytes(
            4, "little") for i in range(8))
    assert got == keccak256(kernel.code)
    assert sponge_ops[0].input == kernel.code


def test_cpu_stark_low_degree():
    check_stark_low_degree(cpu_mod.CpuStark(make_kernel()))


@pytest.mark.slow
def test_all_stark_with_cpu_prove_verify():
    kernel = make_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)


@pytest.mark.slow
def test_all_stark_with_cpu_rejects_wrong_code_hash():
    """Tampering with one kernel code byte in the memory writes must break
    either the sponge CTL or the hash constraint."""
    kernel = make_kernel()
    all_stark = ast_mod.make_all_stark_with_cpu(kernel)
    traces = ast_mod.generate_all_traces_with_cpu(kernel)
    cpu_trace = traces[0]
    # flip a code byte in the CPU write channel (and matching memory row,
    # so the memory CTL stays balanced — the sponge hash check must fail)
    ch = cpu_mod.MEM_CHANNELS[0]
    cpu_trace[ch.value[0], 0] ^= np.uint64(1)
    mem_trace = traces[4]
    from plonky2_tpu.evm import memory as memory_mod
    for j in range(mem_trace.shape[1]):
        if (mem_trace[memory_mod.FILTER, j] == 1
                and mem_trace[memory_mod.IS_READ, j] == 0
                and mem_trace[memory_mod.ADDR_VIRTUAL, j] == 0):
            mem_trace[memory_mod.value_limb(0), j] ^= np.uint64(1)
            break
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove_all(all_stark, config, traces)
        verify_all_proof(all_stark, proof, config)


def _row_constraint_violations(stark, trace):
    """Evaluate all constraints row-wise; returns indices of violated ones."""
    from plonky2_tpu.plonk.algebra import NumpyBatch
    from plonky2_tpu.stark.stark import StarkEvaluationVars
    n = trace.shape[1]
    alg = NumpyBatch()

    class Rec:
        def __init__(self):
            self.fails = []
            self.idx = 0

        def _check(self, c, rows):
            arr = np.broadcast_to(np.asarray(c, dtype=np.uint64), (n,))
            if np.any(arr[rows]):
                self.fails.append(self.idx)
            self.idx += 1

        def constraint(self, c):
            self._check(c, slice(None))

        def constraint_transition(self, c):
            self._check(c, slice(0, n - 1))

        def constraint_first_row(self, c):
            self._check(c, slice(0, 1))

        def constraint_last_row(self, c):
            self._check(c, slice(n - 1, n))

    rec = Rec()
    vars = StarkEvaluationVars(
        local_values=[trace[c] for c in range(stark.COLUMNS)],
        next_values=[np.roll(trace[c], -1) for c in range(stark.COLUMNS)],
        public_inputs=[])
    stark.eval(alg, vars, rec)
    return rec.fails


def test_decode_constraints_accept_correct_flags():
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=16)
    # append cycle rows after bootstrap with decoded opcodes
    boot_end = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1
    for j, op in enumerate([0x01, 0x60, 0x02, 0x5A, 0x16, 0x5B]):
        cpu_mod.fill_cycle_row(trace, boot_end + j, op, kernel_mode=True,
                               pc=j)
        cpu_mod.wire_stack_op(trace, boot_end + j, op, [5, 7], push_value=0)
    assert _row_constraint_violations(stark, trace) == []


def test_decode_constraints_reject_wrong_flag():
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=16)
    boot_end = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1
    cpu_mod.fill_cycle_row(trace, boot_end, 0x01, kernel_mode=True)  # ADD
    # claim MUL instead of ADD: decode must reject
    trace[cpu_mod.OP["add"], boot_end] = 0
    trace[cpu_mod.OP["mul"], boot_end] = 1
    assert _row_constraint_violations(stark, trace) != []
    # kernel-only op in user mode must also be rejected
    trace2, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=16)
    cpu_mod.fill_cycle_row(trace2, boot_end, 0xF9, kernel_mode=True)
    trace2[cpu_mod.IS_KERNEL_MODE, boot_end] = 0  # drop privilege
    assert _row_constraint_violations(stark, trace2) != []


def test_invalid_opcodes_bitfield():
    inv = cpu_mod.invalid_opcodes_user()
    assert len(inv) == 32
    # ADD (0x01) valid for users; EXIT_KERNEL (0xF9) kernel-only => invalid
    assert not (inv[0x01 // 8] >> (0x01 % 8)) & 1
    assert (inv[0xF9 // 8] >> (0xF9 % 8)) & 1
    # PUSH block 0x60..0x7F all valid
    assert all(not (inv[op // 8] >> (op % 8)) & 1 for op in range(0x60, 0x80))


def test_simple_logic_and_pc_constraints():
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=32)
    j = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1

    # GETPC: push_value[0] == program_counter
    cpu_mod.fill_cycle_row(trace, j, 0x58, pc=77)
    cpu_mod.wire_stack_op(trace, j, 0x58, [1, 2], push_value=77)

    # NOT: out = ~in per 32-bit limb
    v = 0x1234_5678_9ABC_DEF0_0F0F * 7919
    cpu_mod.fill_cycle_row(trace, j + 1, 0x19, pc=78)
    mask = (1 << 256) - 1
    cpu_mod.wire_stack_op(trace, j + 1, 0x19, [v], push_value=v ^ mask)

    # EQ equal, EQ unequal, ISZERO zero, ISZERO nonzero
    def eq_row(row, op, v0, v1, pc):
        cpu_mod.fill_cycle_row(trace, row, op, pc=pc)
        stack = [v1, v0] if op == 0x14 else [v0]
        cpu_mod.wire_stack_op(trace, row, op, stack)
        cpu_mod.set_eq_iszero_values(trace, row, v0, v1)
    eq_row(j + 2, 0x14, 12345, 12345, 79)
    eq_row(j + 3, 0x14, 12345, 54321 << 200, 80)
    eq_row(j + 4, 0x15, 0, 0, 81)
    eq_row(j + 5, 0x15, 99 << 128, 0, 82)
    assert _row_constraint_violations(stark, trace) == []

    # corrupt the EQ result bit: constraints must break
    bad = trace.copy()
    c0 = cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1].value[0]
    bad[c0, j + 2] = 0
    assert _row_constraint_violations(stark, bad) != []
    # claim unequal values equal without a valid certificate
    bad2 = trace.copy()
    bad2[c0, j + 3] = 1
    assert _row_constraint_violations(stark, bad2) != []
    # wrong NOT output
    bad3 = trace.copy()
    bad3[cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1].value[0],
         j + 1] ^= np.uint64(1)
    assert _row_constraint_violations(stark, bad3) != []
    # wrong PC pushed
    bad4 = trace.copy()
    bad4[cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1].value[0], j] = 78
    assert _row_constraint_violations(stark, bad4) != []


def test_jump_constraints():
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=32)
    j = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1

    # JUMP always jumps; JUMPI with zero cond falls through; JUMPI with
    # nonzero cond (in a high limb!) jumps; user-mode JUMP reads the
    # jumpdest bit
    cpu_mod.fill_jump_row(trace, j, 0x56, pc=10, dst=42)
    cpu_mod.fill_jump_row(trace, j + 2, 0x57, pc=20, dst=7, cond=0)
    cpu_mod.fill_jump_row(trace, j + 4, 0x57, pc=30, dst=9,
                          cond=5 << 200)
    cpu_mod.fill_jump_row(trace, j + 6, 0x56, pc=40, dst=3,
                          kernel_mode=False)
    # EXIT_KERNEL restores pc + mode
    cpu_mod.fill_cycle_row(trace, j + 8, 0xF9, kernel_mode=True, pc=50)
    cpu_mod.wire_stack_op(trace, j + 8, 0xF9, [99 | (0 << 32)])
    trace[cpu_mod.PROGRAM_COUNTER, j + 9] = 99
    trace[cpu_mod.IS_KERNEL_MODE, j + 9] = 0
    assert _row_constraint_violations(stark, trace) == []

    # wrong next-pc after a taken jump must fail
    bad = trace.copy()
    bad[cpu_mod.PROGRAM_COUNTER, j + 1] = 43
    assert _row_constraint_violations(stark, bad) != []
    # forged should_jump on a zero condition must fail
    bad2 = trace.copy()
    bad2[cpu_mod.JUMPS_SHOULD_JUMP, j + 2] = 1
    bad2[cpu_mod.PROGRAM_COUNTER, j + 3] = 7
    assert _row_constraint_violations(stark, bad2) != []
    # user-mode jump must use the jumpdest-bit channel
    bad3 = trace.copy()
    bad3[cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1].used, j + 6] = 0
    assert _row_constraint_violations(stark, bad3) != []


def test_contextops_modfp254_shift_constraints():
    from plonky2_tpu.evm.memory import Segment
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=32)
    j = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1

    # GET_CONTEXT pushes context; SET_CONTEXT pops the next context
    cpu_mod.fill_cycle_row(trace, j, 0xF6, context=5, pc=10)
    cpu_mod.wire_stack_op(trace, j, 0xF6, [], push_value=5, context=5)
    cpu_mod.fill_cycle_row(trace, j + 1, 0xF7, context=5, pc=11)
    cpu_mod.wire_stack_op(trace, j + 1, 0xF7, [9], context=5)
    trace[cpu_mod.CONTEXT, j + 2] = 9

    # MULFP254 pins channel 2 to the bn254 prime
    P254 = 21888242871839275222246405745257275088696311157297823662689037894645226208583
    cpu_mod.fill_cycle_row(trace, j + 3, 0x0D, pc=12)
    cpu_mod.wire_stack_op(trace, j + 3, 0x0D, [3, 4], push_value=12)
    cpu_mod.set_u256_channel(trace, j + 3, 2, P254)

    # SHL with small displacement reads 2^d from the shift table
    cpu_mod.fill_cycle_row(trace, j + 4, 0x1B, pc=13)
    cpu_mod.wire_stack_op(trace, j + 4, 0x1B, [21, 3], push_value=21 << 3)
    cpu_mod.set_u256_channel(trace, j + 4, 0, 3)        # displacement 3
    ch = cpu_mod.MEM_CHANNELS[2]
    trace[ch.used, j + 4] = 1                            # hi limbs zero
    trace[ch.is_read, j + 4] = 1
    trace[ch.addr_segment, j + 4] = int(Segment.ShiftTable)
    trace[ch.addr_virtual, j + 4] = 3
    cpu_mod.set_u256_channel(trace, j + 4, 2, 0)
    trace[ch.addr_segment, j + 4] = int(Segment.ShiftTable)
    # re-set value after helper overwrote address fields? set 2^3:
    for i, c in enumerate(ch.value):
        trace[c, j + 4] = (8 >> (32 * i)) & 0xFFFFFFFF

    # SHR with huge displacement: hi limbs nonzero, table read disabled
    from plonky2_tpu.field import goldilocks as gl
    cpu_mod.fill_cycle_row(trace, j + 5, 0x1C, pc=14)
    cpu_mod.wire_stack_op(trace, j + 5, 0x1C, [99, 1 << 100], push_value=0)
    cpu_mod.set_u256_channel(trace, j + 5, 0, 1 << 100)
    hi_sum = 1 << 4  # limb 3 holds 2^4 from 1<<100
    trace[cpu_mod.GENERAL[0], j + 5] = pow(hi_sum, gl.P - 2, gl.P)
    trace[cpu_mod.MEM_CHANNELS[2].used, j + 5] = 0
    trace[cpu_mod.MEM_CHANNELS[2].is_read, j + 5] = 1
    # the address columns are constrained even when the channel is unused
    trace[cpu_mod.MEM_CHANNELS[2].addr_segment, j + 5] = \
        int(Segment.ShiftTable)
    assert _row_constraint_violations(stark, trace) == []

    # wrong modulus limb must fail
    bad = trace.copy()
    bad[cpu_mod.MEM_CHANNELS[2].value[0], j + 3] ^= np.uint64(1)
    assert _row_constraint_violations(stark, bad) != []
    # claiming a small displacement when the hi limbs are nonzero must fail
    bad2 = trace.copy()
    bad2[cpu_mod.MEM_CHANNELS[2].used, j + 5] = 1
    assert _row_constraint_violations(stark, bad2) != []


def test_dup_swap_constraints():
    from plonky2_tpu.evm.memory import Segment
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=32)
    j = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1
    P = 0xFFFFFFFF00000001

    def stack_channel(row, ch, is_read, depth, value, stack_len):
        trace[ch.used, row] = 1
        trace[ch.is_read, row] = int(is_read)
        trace[ch.addr_segment, row] = int(Segment.Stack)
        trace[ch.addr_virtual, row] = (stack_len - 1 - depth) % P
        for i, c in enumerate(ch.value):
            trace[c, row] = (value >> (32 * i)) & 0xFFFFFFFF

    # DUP3 (0x82): copy stack[2] to a new top
    cpu_mod.fill_cycle_row(trace, j, 0x82, pc=20)
    trace[cpu_mod.STACK_LEN, j] = 10
    v = 0xDEADBEEF << 64
    stack_channel(j, cpu_mod.MEM_CHANNELS[0], True, 2, v, 10)
    stack_channel(j, cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1],
                  False, -1, v, 10)

    # SWAP2 (0x91, n=1): exchange stack[0] and stack[n+1=2]
    cpu_mod.fill_cycle_row(trace, j + 1, 0x91, pc=21)
    trace[cpu_mod.STACK_LEN, j + 1] = 8
    a, b = 111, 222 << 128
    stack_channel(j + 1, cpu_mod.MEM_CHANNELS[0], True, 0, a, 8)
    stack_channel(j + 1, cpu_mod.MEM_CHANNELS[1], True, 2, b, 8)
    stack_channel(j + 1, cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 2],
                  False, 2, a, 8)
    stack_channel(j + 1, cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1],
                  False, 0, b, 8)
    assert _row_constraint_violations(stark, trace) == []

    # copying the wrong stack slot must fail
    bad = trace.copy()
    bad[cpu_mod.MEM_CHANNELS[0].addr_virtual, j] = 10 - 1 - 4
    assert _row_constraint_violations(stark, bad) != []
    # swapped values must actually swap
    bad2 = trace.copy()
    bad2[cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1].value[0],
         j + 1] = 112
    assert _row_constraint_violations(stark, bad2) != []


def test_memio_constraints():
    kernel = make_kernel()
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=32)
    j = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1
    v = 0xABCDEF << 96

    # MLOAD_GENERAL: address triple in ch0-2, loaded value in ch3 == pushed
    cpu_mod.fill_cycle_row(trace, j, 0xFB, pc=30)
    cpu_mod.wire_stack_op(trace, j, 0xFB, [140, 7, 3], push_value=v)
    for i, part in enumerate([3, 7, 140]):
        cpu_mod.set_u256_channel(trace, j, i, part)
    ld = cpu_mod.MEM_CHANNELS[3]
    trace[ld.used, j] = 1
    trace[ld.is_read, j] = 1
    trace[ld.addr_context, j] = 3
    trace[ld.addr_segment, j] = 7
    trace[ld.addr_virtual, j] = 140
    for i, c in enumerate(ld.value):
        trace[c, j] = (v >> (32 * i)) & 0xFFFFFFFF
    for i, c in enumerate(cpu_mod.MEM_CHANNELS[4].value):
        trace[c, j] = (v >> (32 * i)) & 0xFFFFFFFF

    # MSTORE_GENERAL: value in ch3 written through ch4
    cpu_mod.fill_cycle_row(trace, j + 1, 0xFC, pc=31)
    cpu_mod.wire_stack_op(trace, j + 1, 0xFC, [v + 1, 64, 2, 0])
    for i, part in enumerate([0, 2, 64]):
        cpu_mod.set_u256_channel(trace, j + 1, i, part)
    cpu_mod.set_u256_channel(trace, j + 1, 3, v + 1)
    st = cpu_mod.MEM_CHANNELS[4]
    trace[st.used, j + 1] = 1
    trace[st.is_read, j + 1] = 0
    trace[st.addr_context, j + 1] = 0
    trace[st.addr_segment, j + 1] = 2
    trace[st.addr_virtual, j + 1] = 64
    for i, c in enumerate(st.value):
        trace[c, j + 1] = ((v + 1) >> (32 * i)) & 0xFFFFFFFF
    assert _row_constraint_violations(stark, trace) == []

    # load pushing a different value than it read must fail
    bad = trace.copy()
    bad[cpu_mod.MEM_CHANNELS[4].value[0], j] ^= np.uint64(1)
    assert _row_constraint_violations(stark, bad) != []
    # store addressed at the wrong virtual must fail
    bad2 = trace.copy()
    bad2[cpu_mod.MEM_CHANNELS[4].addr_virtual, j + 1] = 65
    assert _row_constraint_violations(stark, bad2) != []


def test_syscall_constraints():
    from plonky2_tpu.evm.memory import Segment
    src = """
GLOBAL main:
    STOP
GLOBAL handler:
    JUMPDEST
    STOP
GLOBAL syscall_jumptable:
    JUMPTABLE handler, handler, handler, handler
"""
    kernel = assemble([parse(src)], {})
    jt = kernel.global_labels["syscall_jumptable"]
    stark = cpu_mod.CpuStark(kernel)
    trace, _, _ = cpu_mod.generate_bootstrap_kernel(kernel, min_rows=32)
    j = -(-len(kernel.code) // cpu_mod.NUM_GP_CHANNELS) + 1

    # a syscall row for opcode 0x02 in user mode, handler address 0x000007
    opcode = 0x02
    cpu_mod.fill_cycle_row(trace, j, opcode, kernel_mode=False)
    for name in cpu_mod.OP:  # syscall rows raise only the syscall flag
        trace[cpu_mod.OP[name], j] = 0
    trace[cpu_mod.OP["syscall"], j] = 1
    trace[cpu_mod.PROGRAM_COUNTER, j] = 123
    handler = kernel.global_labels["handler"]
    hbytes = handler.to_bytes(3, "big")
    for i in range(3):
        ch = cpu_mod.MEM_CHANNELS[i]
        trace[ch.used, j] = 1
        trace[ch.is_read, j] = 1
        trace[ch.addr_segment, j] = int(Segment.Code)
        trace[ch.addr_virtual, j] = jt + 3 * opcode + i
        trace[ch.value[0], j] = hbytes[i]
    out = cpu_mod.MEM_CHANNELS[cpu_mod.NUM_GP_CHANNELS - 1]
    trace[out.used, j] = 1
    trace[out.is_read, j] = 0
    trace[out.addr_segment, j] = int(Segment.Stack)
    trace[cpu_mod.STACK_LEN, j] = 0
    trace[out.addr_virtual, j] = 0
    cpu_mod.set_stack_bounds_aux(trace, j)
    trace[out.value[0], j] = 124     # pc + 1
    trace[out.value[1], j] = 0       # was user mode
    trace[cpu_mod.PROGRAM_COUNTER, j + 1] = handler
    trace[cpu_mod.IS_KERNEL_MODE, j + 1] = 1
    assert _row_constraint_violations(stark, trace) == []

    # jumping to a forged handler must fail
    bad = trace.copy()
    bad[cpu_mod.PROGRAM_COUNTER, j + 1] = handler + 1
    assert _row_constraint_violations(stark, bad) != []
    # reading the jumptable slot of a different opcode must fail
    bad2 = trace.copy()
    bad2[cpu_mod.MEM_CHANNELS[0].addr_virtual, j] = jt + 3 * (opcode + 1)
    assert _row_constraint_violations(stark, bad2) != []
