"""Pointer-based in-kernel MPT routines (evm/mpt_asm.py): load_all_mpts /
mpt_read / mpt_insert / mpt_hash, run in the offline interpreter exactly
like the reference's cpu/kernel/tests/mpt/{load,read,insert,hash}.rs."""
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

TD = int(Segment.TrieData)
GM = int(Segment.GlobalMetadata)


def _run(kernel, entry, stack, segmem=None, prover_input=None,
         max_steps=5_000_000):
    return run_with_kernel(
        kernel, kernel.global_labels[entry],
        stack + [kernel.global_labels["test_halt"]]
        if False else stack,
        segmem=segmem or {}, prover_input=prover_input,
        halt_offsets=[kernel.global_labels["test_halt"]],
        max_steps=max_steps)


def _halt(kernel):
    return kernel.global_labels["test_halt"]


class StreamProvider:
    """Serves PROVER_INPUT(mpt::load) from a fixed list."""

    def __init__(self, data):
        self.data = list(data)
        self.pos = 0

    def __call__(self, fn, state):
        assert fn[0] == "mpt" and fn[1] == "load", fn
        v = self.data[self.pos]
        self.pos += 1
        return v


def _load(kernel, tries: TrieInputs):
    """Run load_all_mpts; returns the final interpreter state."""
    data = all_mpt_prover_inputs(tries)
    provider = StreamProvider(data)
    st = run_with_kernel(
        kernel, kernel.global_labels["load_all_mpts"], [_halt(kernel)],
        prover_input=provider, halt_offsets=[_halt(kernel)],
        max_steps=5_000_000)
    assert provider.pos == len(data), (provider.pos, len(data))
    return st


def _td(st, i):
    return st.segmem.get((0, TD, i), 0)


def _gm(st, i):
    return st.segmem.get((0, GM, i), 0)


# --- python decoder of the pointered layout (the load oracle) -------------

def decode_node(st, ptr, schema):
    t = _td(st, ptr)
    if ptr == 0 or t == 0:
        return PartialTrie.empty()
    if t == 1:
        return PartialTrie.hash_node(_td(st, ptr + 1))
    if t == 2:
        children = [decode_node(st, _td(st, ptr + 1 + i), schema)
                    for i in range(16)]
        vptr = _td(st, ptr + 17)
        value = decode_value(st, vptr, schema) if vptr else b""
        return PartialTrie.branch(children, value)
    if t == 3:
        return PartialTrie.extension(
            Nibbles(_td(st, ptr + 1), _td(st, ptr + 2)),
            decode_node(st, _td(st, ptr + 3), schema))
    if t == 4:
        return PartialTrie.leaf(
            Nibbles(_td(st, ptr + 1), _td(st, ptr + 2)),
            decode_value(st, _td(st, ptr + 3), schema))
    raise AssertionError(f"bad node type {t} at {ptr}")


def decode_value(st, vptr, schema):
    from plonky2_tpu.evm import rlp
    if schema == 2:
        n = _td(st, vptr)
        return bytes(_td(st, vptr + 1 + i) for i in range(n))
    if schema == 1:
        return rlp.encode_int(_td(st, vptr))
    # state account: [nonce, balance, storage_ptr, code_hash]
    storage = decode_node(st, _td(st, vptr + 2), 1)
    return AccountRlp(nonce=_td(st, vptr),
                      balance=_td(st, vptr + 1),
                      storage_root=storage.calc_hash(),
                      code_hash=_td(st, vptr + 3)).encode()


# --- small numeric helpers -------------------------------------------------

def test_pow16(kernel):
    for k in (0, 1, 5, 63):
        st = run_with_kernel(kernel, kernel.global_labels["pow16"],
                             [_halt(kernel), k],
                             halt_offsets=[_halt(kernel)])
        assert st.stack == [16 ** k], (k, st.stack)


def test_nib_split(kernel):
    # 0xABC (3 nibbles) -> nib 0xA, rem 0xBC
    st = run_with_kernel(kernel, kernel.global_labels["nib_split"],
                         [_halt(kernel), 0xABC, 3],
                         halt_offsets=[_halt(kernel)])
    assert st.stack == [0xBC, 0xA], st.stack


def test_common_prefix(kernel):
    cases = [
        ((3, 0xABC), (3, 0xABC), 3),
        ((3, 0xABC), (3, 0xADE), 1),
        ((3, 0xABC), (3, 0x123), 0),
        ((3, 0xABC), (5, 0xABCDE), 3),
        ((0, 0), (3, 0xABC), 0),
    ]
    for (nc, npk), (c, k), want in cases:
        st = run_with_kernel(
            kernel, kernel.global_labels["mpt_common_prefix"],
            [_halt(kernel), k, c, npk, nc],
            halt_offsets=[_halt(kernel)])
        assert st.stack == [want], ((nc, npk), (c, k), st.stack)


# --- load (spec tests/mpt/load.rs) ----------------------------------------

def _roundtrip(tries: TrieInputs, kernel):
    st = _load(kernel, tries)
    state = decode_node(st, _gm(st, 4), 0)
    assert state.calc_hash() == tries.state_trie.calc_hash()
    txn = decode_node(st, _gm(st, 5), 2)
    assert txn.calc_hash() == tries.transactions_trie.calc_hash()
    rcpt = decode_node(st, _gm(st, 6), 2)
    assert rcpt.calc_hash() == tries.receipts_trie.calc_hash()
    return st


def test_load_all_mpts_empty(kernel):
    _roundtrip(TrieInputs(), kernel)


def test_load_all_mpts_leaf(kernel):
    tries = TrieInputs(state_trie=PartialTrie.leaf(
        Nibbles(3, 0xABC), ACCOUNT_1.encode()))
    _roundtrip(tries, kernel)


def test_load_all_mpts_hash(kernel):
    h = 0x55f77e8909b1f1c9531c4a309bb2d40388e9ed4b87830c8f90363c6b36255fb9
    _roundtrip(TrieInputs(state_trie=PartialTrie.hash_node(h)), kernel)


def test_load_all_mpts_ext_to_leaf(kernel):
    leaf = PartialTrie.leaf(Nibbles(3, 0xDEF), ACCOUNT_1.encode())
    tries = TrieInputs(state_trie=PartialTrie.extension(Nibbles(3, 0xABC),
                                                        leaf))
    _roundtrip(tries, kernel)


def test_load_all_mpts_branch_and_storage(kernel):
    from plonky2_tpu.evm import rlp
    storage = PartialTrie.leaf(Nibbles(2, 0x37), rlp.encode_int(99))
    acct = AccountRlp(nonce=1, balance=2,
                      storage_root=storage.calc_hash(), code_hash=5)
    addr = 0xabcdef
    from plonky2_tpu.hash.keccak import keccak256
    key = Nibbles.from_bytes(keccak256(addr.to_bytes(20, "big")))
    state = trie_insert(PartialTrie.empty(), key, acct.encode())
    state = trie_insert(
        state, Nibbles(64, (1 << 255) % (1 << 256) >> 0),
        ACCOUNT_1.encode()) if False else state
    tries = TrieInputs(state_trie=state,
                       storage_tries=[(addr, storage)])
    _roundtrip(tries, kernel)


def test_load_txn_trie_bytes(kernel):
    txn = PartialTrie.leaf(Nibbles(2, 0x80), b"\\x01\\x02\\x03hello")
    tries = TrieInputs(transactions_trie=txn)
    _roundtrip(tries, kernel)


# --- read (spec tests/mpt/read.rs) ----------------------------------------

def test_mpt_read(kernel):
    leaf = PartialTrie.leaf(Nibbles(3, 0xDEF), ACCOUNT_1.encode())
    tries = TrieInputs(state_trie=PartialTrie.extension(Nibbles(3, 0xABC),
                                                        leaf))
    st = _load(kernel, tries)
    st2 = run_with_kernel(
        kernel, kernel.global_labels["mpt_read"],
        [_halt(kernel), 0xABCDEF, 6, _gm(st, 4)],
        segmem=st.segmem, halt_offsets=[_halt(kernel)])
    assert len(st2.stack) == 1
    v = st2.stack[0]
    assert v != 0
    assert _td(st2, v) == ACCOUNT_1.nonce
    assert _td(st2, v + 1) == ACCOUNT_1.balance
    assert _td(st2, v + 3) == ACCOUNT_1.code_hash


def test_mpt_read_absent(kernel):
    leaf = PartialTrie.leaf(Nibbles(3, 0xDEF), ACCOUNT_1.encode())
    tries = TrieInputs(state_trie=PartialTrie.extension(Nibbles(3, 0xABC),
                                                        leaf))
    st = _load(kernel, tries)
    for key, cnt in ((0xABCDEE, 6), (0x123456, 6), (0xABC, 3)):
        st2 = run_with_kernel(
            kernel, kernel.global_labels["mpt_read"],
            [_halt(kernel), key, cnt, _gm(st, 4)],
            segmem=st.segmem, halt_offsets=[_halt(kernel)])
        assert st2.stack == [0], (hex(key), st2.stack)


# --- insert (spec tests/mpt/insert.rs) ------------------------------------

def _nibbles64(k: int) -> Nibbles:
    return Nibbles(64, k)


def _insert_and_check(kernel, state_trie: PartialTrie, key: Nibbles,
                      account: AccountRlp, schema=0):
    """Load state_trie, allocate the account value in TrieData, run
    mpt_insert, decode the result and compare against the python
    trie_insert oracle."""
    tries = TrieInputs(state_trie=state_trie)
    st = _load(kernel, tries)
    # allocate the new account value manually: [nonce, balance, 0, ch]
    size = _gm(st, 3)
    vptr = size
    mem = dict(st.segmem)
    mem[(0, TD, vptr)] = account.nonce
    mem[(0, TD, vptr + 1)] = account.balance
    mem[(0, TD, vptr + 2)] = 0        # empty storage subtree
    mem[(0, TD, vptr + 3)] = account.code_hash
    mem[(0, GM, 3)] = vptr + 4
    st2 = run_with_kernel(
        kernel, kernel.global_labels["mpt_insert"],
        [_halt(kernel), vptr, key.packed, key.count, _gm(st, 4)],
        segmem=mem, halt_offsets=[_halt(kernel)], max_steps=5_000_000)
    assert len(st2.stack) == 1
    new_root = st2.stack[0]
    got = decode_node(st2, new_root, schema)
    acct_enc = AccountRlp(nonce=account.nonce, balance=account.balance,
                          storage_root=PartialTrie.empty().calc_hash(),
                          code_hash=account.code_hash).encode()
    want = trie_insert(state_trie, key, acct_enc)
    assert got.calc_hash() == want.calc_hash(), (got, want)


def test_mpt_insert_empty(kernel):
    _insert_and_check(kernel, PartialTrie.empty(), _nibbles64(0xABC),
                      ACCOUNT_2)


def test_mpt_insert_leaf_identical_keys(kernel):
    key = _nibbles64(0xABC)
    trie = PartialTrie.leaf(key, ACCOUNT_1.encode())
    _insert_and_check(kernel, trie, key, ACCOUNT_2)


def test_mpt_insert_leaf_nonoverlapping_keys(kernel):
    trie = PartialTrie.leaf(_nibbles64(0xABC), ACCOUNT_1.encode())
    _insert_and_check(kernel, trie, _nibbles64(0x123), ACCOUNT_2)


def test_mpt_insert_leaf_overlapping_keys(kernel):
    trie = PartialTrie.leaf(_nibbles64(0xABC), ACCOUNT_1.encode())
    _insert_and_check(kernel, trie, _nibbles64(0xADE), ACCOUNT_2)


def test_mpt_insert_branch_replacing_empty_child(kernel):
    children = [PartialTrie.empty() for _ in range(16)]
    trie = PartialTrie.branch(children)
    _insert_and_check(kernel, trie, _nibbles64(0xABC), ACCOUNT_2)


def test_mpt_insert_extension_keep(kernel):
    # insert whose key shares the extension's full prefix
    leaf = PartialTrie.leaf(Nibbles(61, 0xDEF), ACCOUNT_1.encode())
    children = [PartialTrie.empty() for _ in range(16)]
    children[0xD] = PartialTrie.leaf(Nibbles(60, 0xEF), ACCOUNT_1.encode())
    # build: ext(0xABC) -> branch
    branch = PartialTrie.branch(children)
    trie = PartialTrie.extension(Nibbles(3, 0xABC), branch)
    key = Nibbles(64, (0xABC << (4 * 61)) | 0x777)
    _insert_and_check(kernel, trie, key, ACCOUNT_2)


def test_mpt_insert_extension_diverge(kernel):
    leaf = PartialTrie.leaf(Nibbles(61, 0xDEF), ACCOUNT_1.encode())
    children = [PartialTrie.empty() for _ in range(16)]
    children[0xD] = leaf
    branch = PartialTrie.branch(children)
    trie = PartialTrie.extension(Nibbles(3, 0xABC), branch)
    # diverges inside the extension prefix (0xAB7 vs 0xABC)
    key = Nibbles(64, (0xAB7 << (4 * 61)) | 0x777)
    _insert_and_check(kernel, trie, key, ACCOUNT_2)


def test_mpt_insert_full_entropy_keys_cp0(kernel):
    """Two 64-nibble keys diverging at the FIRST nibble: the remainder
    computation must not route through 16^64 (which wraps to 0 in U256 —
    the round-5 account-creation bug)."""
    k1 = Nibbles(64, (0x2 << 252) | 0xF93D0DFB1562C03C)
    k2 = Nibbles(64, (0xC << 252) | 0xEA3717B23A29F65B)
    trie = PartialTrie.leaf(k1, ACCOUNT_1.encode())
    _insert_and_check(kernel, trie, k2, ACCOUNT_2)
