"""SLOAD / SSTORE through the syscall jumptable (evm/storage_asm.py):
user-visible storage opcodes trap to kernel handlers that read/mutate the
pointered storage trie, and the final in-kernel state-root hash binds the
writes.  The reference decodes these ops as syscalls
(witness/transition.rs:27-140) but ships no handlers at this vintage."""
import pytest

from plonky2_tpu.evm import rlp
from plonky2_tpu.evm.block import TrieInputs
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.stdlib import SHIFT_TABLE_INIT
from plonky2_tpu.evm.generation import generate_kernel_execution
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.mpt import (AccountRlp, Nibbles, PartialTrie,
                                 all_mpt_prover_inputs, trie_insert)
from plonky2_tpu.evm.mpt_asm import MPT_ASM
from plonky2_tpu.evm.storage_asm import STORAGE_ASM
from plonky2_tpu.hash.keccak import keccak256

ADDR = 0xA11CE00000000000000000000000000000000001
SLOT_A, SLOT_B = 7, 9
VAL_A, NEW_A, VAL_B = 0xABC, 0xDEAD, 0x1234567890


def _slot_key(slot: int) -> Nibbles:
    return Nibbles.from_bytes(keccak256(slot.to_bytes(32, "big")))


def _addr_key(addr: int) -> Nibbles:
    return Nibbles.from_bytes(keccak256(addr.to_bytes(20, "big")))


def _fixture():
    storage = trie_insert(PartialTrie.empty(), _slot_key(SLOT_A),
                          rlp.encode(rlp.encode_int(VAL_A)))
    acct = AccountRlp(nonce=3, balance=10**18,
                      storage_root=storage.calc_hash(), code_hash=777)
    state = trie_insert(PartialTrie.empty(), _addr_key(ADDR), acct.encode())
    return state, storage, acct


def _jumptable() -> str:
    entries = ["jt_panic"] * 256
    entries[0x54] = "sys_sload"
    entries[0x55] = "sys_sstore"
    return "GLOBAL syscall_jumptable:\n    JUMPTABLE " + \
        ", ".join(entries) + "\n"


def _kernel(addr_key_packed: int):
    main = f"""
GLOBAL main:
{SHIFT_TABLE_INIT}
    PUSH main_loaded
    PUSH load_all_mpts
    JUMP
main_loaded:
    // current account value ptr -> GlobalMetadata[18]
    PUSH {addr_key_packed}
    PUSH 64
    PUSH 4
    PUSH @SEGMENT_GLOBAL_METADATA
    PUSH 0
    MLOAD_GENERAL
    %stack (root, cnt, key) -> (root, cnt, key, main_acct)
    PUSH mpt_read
    JUMP
main_acct:
    // vptr
    DUP1
    ISZERO
    PUSH jt_panic
    JUMPI
    %stack (vptr) -> (0, @SEGMENT_GLOBAL_METADATA, 18, vptr)
    MSTORE_GENERAL

    // SLOAD existing slot -> GlobalMetadata[20]
    PUSH {SLOT_A}
    SLOAD
    %stack (v) -> (0, @SEGMENT_GLOBAL_METADATA, 20, v)
    MSTORE_GENERAL

    // SLOAD absent slot -> GlobalMetadata[21]
    PUSH {SLOT_B}
    SLOAD
    %stack (v) -> (0, @SEGMENT_GLOBAL_METADATA, 21, v)
    MSTORE_GENERAL

    // SSTORE overwrite + SSTORE fresh slot (pops key then value)
    PUSH {NEW_A}
    PUSH {SLOT_A}
    SSTORE
    PUSH {VAL_B}
    PUSH {SLOT_B}
    SSTORE

    // re-read the overwritten slot -> GlobalMetadata[22]
    PUSH {SLOT_A}
    SLOAD
    %stack (v) -> (0, @SEGMENT_GLOBAL_METADATA, 22, v)
    MSTORE_GENERAL

    // state root after -> GlobalMetadata[11]
    PUSH main_hashed
    PUSH mpt_hash_state_trie
    JUMP
main_hashed:
    %stack (root) -> (0, @SEGMENT_GLOBAL_METADATA, 11, root)
    MSTORE_GENERAL
    PUSH halt_pc0
    JUMP

GLOBAL jt_panic:
    PANIC

GLOBAL halt_pc0:
    PUSH halt_pc0
GLOBAL halt_pc1:
    JUMP
""" + _jumptable()
    return assemble([parse(main), parse(UTIL_ASM), parse(MPT_ASM),
                     parse(STORAGE_ASM)], evm_constants(), optimize=False)


class Provider:
    def __init__(self, data):
        self.data, self.pos = list(data), 0

    def __call__(self, fn, state):
        assert fn[0] == "mpt"
        v = self.data[self.pos]
        self.pos += 1
        return v


def test_sload_sstore_bind_state_root():
    state, storage, acct = _fixture()
    kernel = _kernel(_addr_key(ADDR).packed)
    data = all_mpt_prover_inputs(TrieInputs(
        state_trie=state, storage_tries=[(ADDR, storage)]))
    ex = generate_kernel_execution(
        kernel, prover_input_factory=lambda: Provider(data))
    GM = int(Segment.GlobalMetadata)
    mem = ex.final_state.memory

    def meta(ix):
        return mem.get((0, GM, ix), 0)

    assert meta(20) == VAL_A            # SLOAD of the preexisting slot
    assert meta(21) == 0                # SLOAD of an absent slot
    assert meta(22) == NEW_A            # SLOAD after SSTORE overwrite

    # host-side expected trie after both writes
    storage2 = trie_insert(storage, _slot_key(SLOT_A),
                           rlp.encode(rlp.encode_int(NEW_A)))
    storage2 = trie_insert(storage2, _slot_key(SLOT_B),
                           rlp.encode(rlp.encode_int(VAL_B)))
    acct2 = AccountRlp(nonce=acct.nonce, balance=acct.balance,
                       storage_root=storage2.calc_hash(),
                       code_hash=acct.code_hash)
    state2 = trie_insert(state, _addr_key(ADDR), acct2.encode())
    assert meta(11) == state2.calc_hash()


def test_sload_sstore_cpu_constraints():
    """The executed trace (incl. the SLOAD/SSTORE syscall rows and
    EXIT_KERNEL returns) satisfies the CPU STARK's constraints."""
    from plonky2_tpu.evm import cpu as cpu_mod
    from plonky2_tpu.evm.all_stark import generate_all_traces_with_cpu
    from plonky2_tpu.stark.testing import trace_constraint_violations

    state, storage, acct = _fixture()
    kernel = _kernel(_addr_key(ADDR).packed)
    data = all_mpt_prover_inputs(TrieInputs(
        state_trie=state, storage_tries=[(ADDR, storage)]))
    ex = generate_kernel_execution(
        kernel, prover_input_factory=lambda: Provider(data))
    traces = generate_all_traces_with_cpu(kernel, execution=ex)
    assert trace_constraint_violations(cpu_mod.CpuStark(kernel),
                                       traces[0]) == []
