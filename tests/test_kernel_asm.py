"""Kernel assembly toolchain: parse -> assemble -> interpret
(reference evm/src/cpu/kernel/{assembler,optimizer,interpreter}.rs tests)."""
import pytest

from plonky2_tpu.evm.kernel import (Kernel, KernelPanic, assemble,
                                    evm_constants, parse, run_with_kernel)
from plonky2_tpu.evm.kernel import asm_ast as ast
from plonky2_tpu.hash.keccak import keccak256


def asm(src, constants=None, optimize=True):
    return assemble([parse(src)], constants or {}, optimize=optimize)


def run(kernel, label, stack):
    return run_with_kernel(kernel, kernel.global_labels[label], stack)


def test_two_files_label_offsets():
    """(reference assembler.rs:396-440 two_files test)."""
    f1 = parse("GLOBAL function_1:\nJUMPDEST\nADD\nMUL\n")
    f2 = parse("GLOBAL function_2:\nJUMPDEST\nDIV\nmylabel:\nJUMPDEST\nMOD\n"
               "PUSH mylabel\nJUMP\n")
    k = assemble([f1, f2], {}, optimize=False)
    assert k.global_labels["function_1"] == 0
    assert k.global_labels["function_2"] == 3
    expected = bytes([0x5B, 0x01, 0x02,            # function_1
                      0x5B, 0x04,                  # function_2: JUMPDEST DIV
                      0x5B, 0x06,                  # mylabel: JUMPDEST MOD
                      0x62, 0, 0, 5,               # PUSH3 mylabel(=5)
                      0x56])                       # JUMP
    assert k.code == expected


def test_code_hash_is_keccak():
    k = asm("ADD\nMUL\n", optimize=False)
    digest = keccak256(k.code)
    got = b"".join(int(x).to_bytes(4, "little") for x in k.code_hash)
    assert got == digest


def test_macro_expansion_and_args():
    src = """
    %macro add_const(c)
        PUSH $c
        ADD
    %endmacro
    GLOBAL entry:
        %add_const(7)
        %add_const(0x10)
        STOP
    """
    k = asm(src)
    st = run(k, "entry", [100])
    assert st.stack == [100 + 7 + 16]


def test_macro_labels_are_unique_per_invocation():
    src = """
    %macro count_down
    %%loop:
        JUMPDEST
        PUSH 1
        SWAP1
        SUB
        DUP1
        PUSH %%loop
        JUMPI
    %endmacro
    GLOBAL entry:
        %count_down
        POP
        PUSH 3
        %count_down
        STOP
    """
    k = asm(src, optimize=False)
    st = run(k, "entry", [5])
    assert st.stack == [0]


def test_repeat_and_constants():
    src = """
    GLOBAL entry:
        PUSH 0
        %rep 4
            PUSH @STEP
            ADD
        %endrep
        STOP
    """
    k = asm(src, constants={"STEP": 11})
    st = run(k, "entry", [])
    assert st.stack == [44]


def test_stack_manipulation():
    src = """
    GLOBAL entry:
        %stack (a, b, c) -> (c, 5, a)
        STOP
    """
    k = asm(src)
    # initial stack bottom-first [3,2,1]: a=1 (top), b=2, c=3
    st = run(k, "entry", [3, 2, 1])
    assert st.stack == [1, 5, 3]  # bottom-first: a, 5, c(top)


def test_stack_manipulation_with_blocks():
    src = """
    GLOBAL entry:
        %stack (pair: 2, x) -> (x, pair)
        STOP
    """
    k = asm(src)
    # bottom-first [x=9, pair1=8, pair0=7]: top is pair0
    st = run(k, "entry", [9, 8, 7])
    # goal top-first: (x, pair0, pair1) -> bottom-first [8, 7, 9]
    assert st.stack == [8, 7, 9]


def test_jumptable_and_bytes():
    src = """
    GLOBAL entry:
        PUSH table
        STOP
    GLOBAL table:
        JUMPTABLE entry, entry
        BYTES 0xde, 0xad
    """
    k = asm(src, optimize=False)
    off = k.global_labels["table"]
    assert k.code[off:off + 3] == (0).to_bytes(3, "big")
    assert k.code[off + 6:off + 8] == b"\xde\xad"


def test_optimizer_constant_folding():
    k_opt = asm("GLOBAL entry:\nPUSH 3\nPUSH 4\nMUL\nSTOP\n")
    k_raw = asm("GLOBAL entry:\nPUSH 3\nPUSH 4\nMUL\nSTOP\n", optimize=False)
    assert len(k_opt.code) < len(k_raw.code)
    st = run(k_opt, "entry", [])
    assert st.stack == [12]


def test_optimizer_push_pop():
    k = asm("GLOBAL entry:\nPUSH 42\nPOP\nSTOP\n")
    assert k.code == bytes([0x00])


def test_interpreter_memory_and_panic():
    src = """
    GLOBAL entry:
        PUSH 0xdeadbeef
        PUSH 0
        MSTORE
        PUSH 0
        MLOAD
        STOP
    """
    st = run(asm(src), "entry", [])
    assert st.stack == [0xDEADBEEF]
    with pytest.raises(KernelPanic):
        run(asm("GLOBAL entry:\nPANIC\n"), "entry", [])


def test_prover_input_offsets():
    k = asm("GLOBAL entry:\nPROVER_INPUT(mpt::read)\nSTOP\n", optimize=False)
    assert k.prover_inputs == {0: ("mpt", "read")}


def test_evm_constants_contains_segments():
    c = evm_constants()
    assert c["SEGMENT_MAINMEMORY"] == 2
    assert c["GAS_TX"] == 21000
