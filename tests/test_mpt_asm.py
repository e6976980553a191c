"""Kernel-asm tests for the in-kernel trie hasher (evm/mpt_asm.py), run in
the offline interpreter exactly like the reference's
cpu/kernel/tests/mpt/hash.rs: load the linearized tries through
`load_all_mpts` (pointered TrieData), execute `mpt_hash_*_trie`, and
compare the stack result against `PartialTrie.calc_hash()` (the
eth_trie_utils semantics)."""
import pytest

from plonky2_tpu.evm.block import TrieInputs
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.mpt import (AccountRlp, Nibbles, PartialTrie,
                                 all_mpt_prover_inputs, trie_insert)
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


class StreamProvider:
    def __init__(self, data):
        self.data = list(data)
        self.pos = 0

    def __call__(self, fn, state):
        assert fn[0] == "mpt" and fn[1] == "load", fn
        v = self.data[self.pos]
        self.pos += 1
        return v


def _load_then(kernel, tries: TrieInputs, entry: str):
    halt = kernel.global_labels["test_halt"]
    data = all_mpt_prover_inputs(tries)
    provider = StreamProvider(data)
    st = run_with_kernel(kernel, kernel.global_labels["load_all_mpts"],
                         [halt], prover_input=provider,
                         halt_offsets=[halt], max_steps=5_000_000)
    assert provider.pos == len(data)
    st2 = run_with_kernel(kernel, kernel.global_labels[entry], [halt],
                          segmem=st.segmem, halt_offsets=[halt],
                          max_steps=10_000_000)
    assert len(st2.stack) == 1, st2.stack
    return st2.stack[0], st2


def _state_trie_hash(kernel, state_trie, storage_tries=()):
    tries = TrieInputs(state_trie=state_trie,
                       storage_tries=list(storage_tries))
    root, _ = _load_then(kernel, tries, "mpt_hash_state_trie")
    assert root == state_trie.calc_hash()


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
    leaf = PartialTrie.leaf(Nibbles(64, 0xABCD << 16 | 0x1234),
                            ACCOUNT_1.encode())
    _state_trie_hash(kernel, leaf)
    leaf2 = PartialTrie.leaf(Nibbles(4, 0xABCD), ACCOUNT_2.encode())
    _state_trie_hash(kernel, PartialTrie.extension(Nibbles(2, 0x12), leaf2))


def test_mpt_hash_account_with_storage_trie(kernel):
    """The account's storage_root is RECOMPUTED from the EMBEDDED storage
    trie (storage schema), so an account leaf cannot announce a root its
    storage data doesn't hash to."""
    from plonky2_tpu.evm import rlp
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
    children = [PartialTrie.empty() for _ in range(16)]
    children[0] = PartialTrie.leaf(Nibbles(3, 0x123), ACCOUNT_1.encode())
    children[5] = PartialTrie.extension(
        Nibbles(2, 0x77),
        PartialTrie.leaf(Nibbles(1, 0x9), ACCOUNT_2.encode()))
    children[9] = PartialTrie.hash_node(0xDEADBEEF_00000001)
    trie = PartialTrie.branch(children)
    _state_trie_hash(kernel, trie)


# --- txn / receipt tries (bytes schema) ------------------------------------

def _bytes_trie(pairs):
    from plonky2_tpu.evm import rlp
    t = PartialTrie.empty()
    for i, v in pairs:
        t = trie_insert(t, Nibbles.from_bytes(rlp.encode_int(i)), v)
    return t


def test_mpt_hash_txn_trie(kernel):
    txns = [(0, b"\x01\x02\x03" * 40), (1, b"hello world"),
            (2, bytes(range(70)))]
    trie = _bytes_trie(txns)
    tries = TrieInputs(transactions_trie=trie)
    root, _ = _load_then(kernel, tries, "mpt_hash_txn_trie")
    assert root == trie.calc_hash()


def test_mpt_hash_receipt_trie(kernel):
    from plonky2_tpu.evm import rlp
    receipts = []
    cum = 0
    for i in range(3):
        cum += 21000
        receipts.append((i, rlp.encode([rlp.encode_int(1),
                                        rlp.encode_int(cum),
                                        bytes(256), []])))
    trie = _bytes_trie(receipts)
    tries = TrieInputs(receipts_trie=trie)
    root, _ = _load_then(kernel, tries, "mpt_hash_receipt_trie")
    assert root == trie.calc_hash()


def test_mpt_hash_all_three_sequential(kernel):
    """State + txn + receipt hashed from one load — the block kernel's
    exact usage; also catches schema-global leakage between walks."""
    state = PartialTrie.leaf(Nibbles(3, 0xABC), ACCOUNT_1.encode())
    txn = _bytes_trie([(0, b"txn-bytes-here")])
    rcpt = _bytes_trie([(0, b"receipt-bytes")])
    tries = TrieInputs(state_trie=state, transactions_trie=txn,
                       receipts_trie=rcpt)
    for entry, want in (("mpt_hash_state_trie", state),
                        ("mpt_hash_txn_trie", txn),
                        ("mpt_hash_receipt_trie", rcpt)):
        root, _ = _load_then(kernel, tries, entry)
        assert root == want.calc_hash(), entry


# --- insert-then-hash (the after-root path) --------------------------------

def test_mpt_insert_then_hash_txn_trie(kernel):
    """Simulates the block kernel's txn-trie build: load an empty trie,
    insert value bytes in-kernel, hash in-kernel, compare to the host."""
    from plonky2_tpu.evm import rlp
    halt = kernel.global_labels["test_halt"]
    tries = TrieInputs()
    data = all_mpt_prover_inputs(tries)
    provider = StreamProvider(data)
    st = run_with_kernel(kernel, kernel.global_labels["load_all_mpts"],
                         [halt], prover_input=provider,
                         halt_offsets=[halt], max_steps=5_000_000)
    TD = int(Segment.TrieData)
    GM = int(Segment.GlobalMetadata)
    mem = dict(st.segmem)
    host = PartialTrie.empty()
    root_ptr = mem.get((0, GM, 5), 0)
    for i, payload in enumerate([b"first txn", b"second txn" * 9]):
        key = Nibbles.from_bytes(rlp.encode_int(i))
        size = mem[(0, GM, 3)]
        vptr = size
        mem[(0, TD, vptr)] = len(payload)
        for j, b in enumerate(payload):
            mem[(0, TD, vptr + 1 + j)] = b
        mem[(0, GM, 3)] = vptr + 1 + len(payload)
        # schema must be 2 for inserts into a bytes trie (mpt_insert itself
        # doesn't read it, but decode/hash do)
        st2 = run_with_kernel(
            kernel, kernel.global_labels["mpt_insert"],
            [halt, vptr, key.packed, key.count, root_ptr],
            segmem=mem, halt_offsets=[halt], max_steps=5_000_000)
        root_ptr = st2.stack[0]
        mem = dict(st2.segmem)
        mem[(0, GM, 5)] = root_ptr
        host = trie_insert(host, key, payload)
    st3 = run_with_kernel(kernel, kernel.global_labels["mpt_hash_txn_trie"],
                          [halt], segmem=mem, halt_offsets=[halt],
                          max_steps=10_000_000)
    assert st3.stack == [host.calc_hash()]
