"""Core kernel routines (evm/core_asm.py): jumpdest analysis against the
reference's cpu/kernel/tests/core/jumpdest_analysis.rs vector verbatim,
and contract-address derivation against real yellow-paper / EIP-1014
semantics (the reference's own create_addresses.rs still asserts
placeholder values)."""
import pytest

from plonky2_tpu.evm import rlp
from plonky2_tpu.evm.core_asm import CORE_ASM
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.hash.keccak import keccak256


@pytest.fixture(scope="module")
def kernel():
    return assemble([parse(CORE_ASM + "\nGLOBAL test_halt:\n    STOP\n"),
                     parse(UTIL_ASM)], evm_constants(), optimize=False)


def test_jumpdest_analysis(kernel):
    """The reference test's exact code: ADD, JUMPDEST, PUSH2 with two
    0x5b immediate bytes, JUMPDEST, ADD, JUMPDEST."""
    ctx = 3
    code = bytes([0x01, 0x5B, 0x61, 0x5B, 0x5B, 0x5B, 0x01, 0x5B])
    expected = [False, True, False, False, False, True, False, True]
    segmem = {(ctx, int(Segment.Code), i): b for i, b in enumerate(code)}
    st = run_with_kernel(
        kernel, kernel.global_labels["jumpdest_analysis"],
        [kernel.global_labels["test_halt"], len(code), ctx], segmem=segmem,
        halt_offsets=[kernel.global_labels["test_halt"]])
    assert st.stack == []
    bits = [bool(st.segmem.get((ctx, int(Segment.JumpdestBits), i), 0))
            for i in range(len(code))]
    assert bits == expected


def test_exp(kernel):
    """tests/exp.rs: kernel exp == EVM EXP semantics (random + edges)."""
    import random
    rng = random.Random(3)
    U = (1 << 256) - 1
    cases = [(rng.getrandbits(256), rng.getrandbits(256)) for _ in range(4)]
    cases += [(0, 5), (7, 0), (0, 0), (2, 256), (U, 2)]
    for a, b in cases:
        st = run_with_kernel(
            kernel, kernel.global_labels["exp"],
            [kernel.global_labels["test_halt"], b, a],
            halt_offsets=[kernel.global_labels["test_halt"]],
            max_steps=2_000_000)
        assert st.stack == [pow(a, b, 1 << 256)], (a, b)


def test_mload_packing(kernel):
    """tests/packing.rs vectors: 1 byte, 3 bytes, 32 bytes."""
    seg = int(Segment.RlpRaw)
    data = [0, 0, 0xAB, 0xCD, 0xEF] + list(range(1, 33))
    segmem = {(0, seg, i): b for i, b in enumerate(data)}
    for off, ln, want in [(2, 1, 0xAB), (2, 3, 0xABCDEF),
                          (5, 32, int.from_bytes(bytes(range(1, 33)),
                                                 "big"))]:
        st = run_with_kernel(
            kernel, kernel.global_labels["mload_packing"],
            [kernel.global_labels["test_halt"], ln, off, seg, 0],
            segmem=segmem,
            halt_offsets=[kernel.global_labels["test_halt"]])
        assert st.stack == [want], (off, ln)


def test_get_create_address(kernel):
    sender = 0x6AC7EA33F8831EA9DCC53393AAA88B25A785DBF0
    for nonce in (0, 1, 0x7F, 0x80, 12345):
        want = int.from_bytes(keccak256(rlp.encode(
            [sender.to_bytes(20, "big"), rlp.encode_int(nonce)]))[12:],
            "big")
        st = run_with_kernel(
            kernel, kernel.global_labels["get_create_address"],
            [kernel.global_labels["test_halt"], nonce, sender],
            halt_offsets=[kernel.global_labels["test_halt"]])
        assert st.stack == [want], nonce


def test_get_create2_address(kernel):
    sender = 0x00000000000000000000000000000000DEADBEEF
    salt = 0x00000000000000000000000000000000000000000000000000000000CAFEBABE
    code = bytes([0x60, 0x01, 0x60, 0x02, 0x01, 0x00])
    ctx, seg, off = 7, int(Segment.Code), 11
    segmem = {(ctx, seg, off + i): b for i, b in enumerate(code)}
    want = int.from_bytes(keccak256(
        b"\xff" + sender.to_bytes(20, "big") + salt.to_bytes(32, "big")
        + keccak256(code))[12:], "big")
    st = run_with_kernel(
        kernel, kernel.global_labels["get_create2_address"],
        [kernel.global_labels["test_halt"], len(code), off, seg, ctx,
         salt, sender], segmem=segmem,
        halt_offsets=[kernel.global_labels["test_halt"]])
    assert st.stack == [want]
