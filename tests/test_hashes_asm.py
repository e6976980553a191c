"""Precompile hash kernel routines (evm/hashes_asm.py) vs the standard
python implementations — mirror of cpu/kernel/tests/hash.rs (stack-input
convention: (len, byte0.., retdest), digest returned on the stack)."""
import hashlib
import random

import pytest

from plonky2_tpu.evm.hashes_asm import HASHES_ASM
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel

# the reference's hardcoded custom message (tests/hash.rs make_custom_input)
CUSTOM = bytes([
    86, 124, 206, 245, 74, 57, 250, 43, 60, 30, 254, 43, 143, 144, 242, 215,
    13, 103, 237, 61, 90, 105, 123, 250, 189, 181, 110, 192, 227, 57, 145,
    46, 221, 238, 7, 181, 146, 111, 209, 150, 31, 157, 229, 126, 206, 105,
    37, 17])


@pytest.fixture(scope="module")
def kernel():
    asm = UTIL_ASM + HASHES_ASM + """
GLOBAL test_halt:
    STOP
"""
    return assemble([parse(asm)], evm_constants(), optimize=False)


def _run_hash(kernel, entry: str, message: bytes, max_steps=20_000_000):
    halt = kernel.global_labels["test_halt"]
    # bottom-first: retdest, b_{n-1}, ..., b0, len
    stack = [halt] + list(reversed(message)) + [len(message)]
    st = run_with_kernel(kernel, kernel.global_labels[entry], stack,
                         halt_offsets=[halt], max_steps=max_steps)
    return st.stack


def _messages():
    rng = random.Random(123)
    yield b""
    yield b"a"
    yield b"abc"
    yield bytes(55)
    yield bytes(rng.randrange(256) for _ in range(56))
    yield bytes(rng.randrange(256) for _ in range(64))
    yield bytes(rng.randrange(256) for _ in range(100))
    yield bytes(rng.randrange(256) for _ in range(1000))
    yield CUSTOM


def test_sha2(kernel):
    for msg in _messages():
        want = int.from_bytes(hashlib.sha256(msg).digest(), "big")
        got = _run_hash(kernel, "sha2", msg)
        assert got == [want], (len(msg), hex(got[0]) if got else got,
                               hex(want))


def test_ripemd(kernel):
    if "ripemd" not in kernel.global_labels:
        pytest.skip("ripemd not yet assembled")
    for msg in _messages():
        h = hashlib.new("ripemd160") if "ripemd160" in \
            hashlib.algorithms_available else None
        if h is None:
            from plonky2_tpu.evm._ripemd160 import ripemd160
            want = int.from_bytes(ripemd160(msg), "big")
        else:
            h.update(msg)
            want = int.from_bytes(h.digest(), "big")
        got = _run_hash(kernel, "ripemd", msg)
        assert got == [want], (len(msg), want)


def test_blake2b(kernel):
    if "blake2b" not in kernel.global_labels:
        pytest.skip("blake2b not yet assembled")
    for msg in _messages():
        d = hashlib.blake2b(msg).digest()
        want_hi = int.from_bytes(d[:32], "big")
        want_lo = int.from_bytes(d[32:], "big")
        got = _run_hash(kernel, "blake2b", msg)
        # reference test_hash_512: result as (hi, lo) — stack top = hi
        assert got == [want_lo, want_hi], (len(msg),)
