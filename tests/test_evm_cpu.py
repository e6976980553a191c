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
