"""Kernel-asm tests for the in-kernel trie hasher (evm/mpt_asm.py), run in
the offline interpreter exactly like the reference's
cpu/kernel/tests/mpt/hash.rs: load the linearized tries into TrieData,
execute `mpt_hash_state_trie`, and compare the stack result against
`PartialTrie.calc_hash()` (the eth_trie_utils semantics)."""
import pytest

from plonky2_tpu.evm.block import TrieInputs
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.mpt import (AccountRlp, Nibbles, PartialTrie,
                                 all_mpt_prover_inputs)
from plonky2_tpu.evm.mpt_asm import MPT_ASM


@pytest.fixture(scope="module")
def kernel():
    asm = UTIL_ASM + MPT_ASM + """
GLOBAL test_halt:
    STOP
"""
    return assemble([parse(asm)], evm_constants(), optimize=False)


# reference tests/mpt/mod.rs test accounts
ACCOUNT_1 = AccountRlp(nonce=1111, balance=2222, storage_root=3333,
                       code_hash=4444)
ACCOUNT_2 = AccountRlp(nonce=5555, balance=6666, storage_root=7777,
                       code_hash=8888)


def _state_trie_hash(kernel, state_trie, storage_tries=()):
    tries = TrieInputs(state_trie=state_trie,
                       storage_tries=list(storage_tries))
    data = all_mpt_prover_inputs(tries)
    segmem = {(0, int(Segment.TrieData), i): v for i, v in enumerate(data)}
    st = run_with_kernel(
        kernel, kernel.global_labels["mpt_hash_state_trie"],
        [kernel.global_labels["test_halt"]], segmem=segmem,
        halt_offsets=[kernel.global_labels["test_halt"]],
        max_steps=5_000_000)
    assert len(st.stack) == 1, st.stack
    assert st.stack[0] == state_trie.calc_hash()


def test_mpt_hash_empty(kernel):
    _state_trie_hash(kernel, PartialTrie.empty())


def test_mpt_hash_empty_branch(kernel):
    children = [PartialTrie.empty() for _ in range(16)]
    _state_trie_hash(kernel, PartialTrie.branch(children))


def test_mpt_hash_hash(kernel):
    h = 0x55f77e8909b1f1c9531c4a309bb2d40388e9ed4b87830c8f90363c6b36255fb9
    _state_trie_hash(kernel, PartialTrie.hash_node(h))


def test_mpt_hash_leaf(kernel):
    leaf = PartialTrie.leaf(Nibbles(3, 0xABC), ACCOUNT_1.encode())
    _state_trie_hash(kernel, leaf)


def test_mpt_hash_extension_to_leaf(kernel):
    leaf = PartialTrie.leaf(Nibbles(3, 0xDEF), ACCOUNT_1.encode())
    _state_trie_hash(kernel, PartialTrie.extension(Nibbles(3, 0xABC), leaf))


def test_mpt_hash_branch_to_leaf(kernel):
    leaf = PartialTrie.leaf(Nibbles(3, 0xABC), ACCOUNT_2.encode())
    children = [PartialTrie.empty() for _ in range(16)]
    children[3] = leaf
    _state_trie_hash(kernel, PartialTrie.branch(children))


def test_mpt_hash_even_nibbles_and_64key(kernel):
    # even-count nibble strings exercise hp_write's even path; a full
    # 64-nibble key exercises the 33-byte hp split
    leaf = PartialTrie.leaf(Nibbles(64, 0xABCD << 16 | 0x1234),
                            ACCOUNT_1.encode())
    _state_trie_hash(kernel, leaf)
    leaf2 = PartialTrie.leaf(Nibbles(4, 0xABCD), ACCOUNT_2.encode())
    _state_trie_hash(kernel, PartialTrie.extension(Nibbles(2, 0x12), leaf2))


def test_mpt_hash_account_with_storage_trie(kernel):
    """The account's storage_root is RECOMPUTED from the EMBEDDED storage
    trie: the linearizer inlines a storage trie when the state leaf's full
    key equals keccak(addr), so the kernel walks branch/leaf storage nodes
    (storage schema) and must reproduce the announced root."""
    from plonky2_tpu.evm import rlp
    from plonky2_tpu.evm.mpt import trie_insert
    from plonky2_tpu.hash.keccak import keccak256
    storage = PartialTrie.empty()
    storage = trie_insert(storage, Nibbles(2, 0x11),
                          rlp.encode(rlp.encode_int(77)))
    storage = trie_insert(storage, Nibbles(2, 0x54),
                          rlp.encode(rlp.encode_int(123456789)))
    sroot = storage.calc_hash()
    acct = AccountRlp(nonce=9, balance=10**18, storage_root=sroot,
                      code_hash=4444)
    addr = 0xA11CE
    key = Nibbles.from_bytes(keccak256(addr.to_bytes(20, "big")))
    state = PartialTrie.leaf(key, acct.encode())
    _state_trie_hash(kernel, state, storage_tries=[(addr, storage)])


def test_mpt_hash_deep_mixed_trie(kernel):
    """A branch with several account leaves, an extension, and a hash
    child in one trie."""
    children = [PartialTrie.empty() for _ in range(16)]
    children[0] = PartialTrie.leaf(Nibbles(3, 0x123), ACCOUNT_1.encode())
    children[5] = PartialTrie.extension(
        Nibbles(2, 0x77),
        PartialTrie.leaf(Nibbles(1, 0x9), ACCOUNT_2.encode()))
    children[9] = PartialTrie.hash_node(0xDEADBEEF_00000001)
    trie = PartialTrie.branch(children)
    _state_trie_hash(kernel, trie)
