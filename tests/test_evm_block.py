"""Block-level EVM proving: GenerationInputs -> AllProof + PublicValues,
plus the RLP codec and MPT hashing it rests on
(reference evm/tests/empty_txn_list.rs, generation/{mpt,rlp}.rs)."""
import numpy as np
import pytest

from plonky2_tpu.evm import rlp
from plonky2_tpu.evm.block import (BlockMetadata, GenerationInputs,
                                   TrieInputs, generate_block_traces,
                                   prove_block)
from plonky2_tpu.evm.mpt import (EMPTY_TRIE_ROOT, AccountRlp, Nibbles,
                                 PartialTrie, all_mpt_prover_inputs)


# --- RLP ---------------------------------------------------------------

def test_rlp_known_vectors():
    # canonical vectors from the Ethereum wiki
    assert rlp.encode(b"dog") == b"\x83dog"
    assert rlp.encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp.encode(b"") == b"\x80"
    assert rlp.encode([]) == b"\xc0"
    assert rlp.encode(b"\x0f") == b"\x0f"
    assert rlp.encode(rlp.encode_int(0)) == b"\x80"
    assert rlp.encode(rlp.encode_int(1024)) == b"\x82\x04\x00"
    long = bytes(b"Lorem ipsum dolor sit amet, consectetur adipisicing elit")
    assert rlp.encode(long) == b"\xb8\x38" + long


def test_rlp_roundtrip():
    items = [b"", b"x", b"hello world", [b"a", [b"b", b""], b"ccc"],
             [[], [[]]], bytes(range(256))]
    for item in items:
        assert rlp.decode(rlp.encode(item)) == item


# --- MPT hashing -------------------------------------------------------

def test_empty_trie_root_constant():
    # keccak(rlp(b"")) — the canonical empty MPT root
    assert PartialTrie.empty().calc_hash() == int(
        "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421",
        16) == EMPTY_TRIE_ROOT


def test_single_leaf_trie_root():
    # independently computed: keccak(rlp([hp(nibbles, leaf), value]))
    from plonky2_tpu.hash.keccak import keccak256
    nib = Nibbles.from_bytes(b"\x12\x34")
    leaf = PartialTrie.leaf(nib, b"hello")
    hp = bytes([0x20, 0x12, 0x34])
    expect = int.from_bytes(keccak256(rlp.encode([hp, b"hello"])), "big")
    assert leaf.calc_hash() == expect


def test_branch_with_inline_and_hashed_children():
    small = PartialTrie.leaf(Nibbles(1, 5), b"v")      # encodes < 32 bytes
    big = PartialTrie.leaf(Nibbles(1, 7), b"x" * 40)   # forces hashing
    children = [PartialTrie.empty() for _ in range(16)]
    children[3], children[9] = small, big
    root = PartialTrie.branch(children, b"")
    h = root.calc_hash()
    assert 0 < h < (1 << 256)
    # changing a deep value changes the root
    children2 = list(children)
    children2[9] = PartialTrie.leaf(Nibbles(1, 7), b"y" * 40)
    assert PartialTrie.branch(children2, b"").calc_hash() != h


def test_hex_prefix_encoding():
    assert Nibbles(0, 0).to_hex_prefix(False) == b"\x00"
    assert Nibbles(0, 0).to_hex_prefix(True) == b"\x20"
    assert Nibbles(1, 0xf).to_hex_prefix(False) == b"\x1f"
    assert Nibbles(2, 0xab).to_hex_prefix(True) == b"\x20\xab"
    assert Nibbles(3, 0xabc).to_hex_prefix(True) == b"\x3a\xbc"


def test_mpt_prover_inputs_state_leaf():
    account = AccountRlp(nonce=3, balance=1000)
    key = Nibbles.from_bytes(bytes(32))
    state = PartialTrie.leaf(key, account.encode())
    inputs = all_mpt_prover_inputs(
        TrieInputs(state_trie=state))
    # leaf: [TYPE_LEAF, count, packed, nonce, balance,
    #        storage(TYPE_HASH fallback, digest), code_hash], then the
    #        txn/receipt empties
    assert inputs[0] == 4 and inputs[1] == 64 and inputs[2] == 0
    assert inputs[3] == 3 and inputs[4] == 1000
    assert inputs[5] == 1                        # Hash-node storage fallback
    assert inputs[6] == EMPTY_TRIE_ROOT
    assert inputs[7] == AccountRlp().code_hash
    assert inputs[8:] == [0, 0]                  # empty txn + receipt tries


def test_account_rlp_roundtrip():
    a = AccountRlp(nonce=7, balance=10**18, storage_root=123456789,
                   code_hash=987654321)
    assert AccountRlp.decode(a.encode()) == a


# --- empty-transaction-list block proof --------------------------------

@pytest.mark.slow
def test_empty_txn_list_block_proof():
    """Mirror of reference evm/tests/empty_txn_list.rs:22."""
    from plonky2_tpu.evm.verifier import verify_all_proof

    inputs = GenerationInputs(block_metadata=BlockMetadata(block_number=1))
    proof, all_stark = prove_block(inputs)
    pv = proof.public_values
    assert pv.trie_roots_before.state_root == EMPTY_TRIE_ROOT
    assert pv.trie_roots_after.state_root == EMPTY_TRIE_ROOT
    assert pv.trie_roots_before.transactions_root == EMPTY_TRIE_ROOT
    assert pv.trie_roots_after.transactions_root == EMPTY_TRIE_ROOT
    assert pv.trie_roots_before.receipts_root == EMPTY_TRIE_ROOT
    assert pv.trie_roots_after.receipts_root == EMPTY_TRIE_ROOT
    assert pv.block_metadata.block_number == 1
    from plonky2_tpu.stark.config import StarkConfig
    verify_all_proof(all_stark, proof, StarkConfig.standard_fast_config())


@pytest.mark.slow
def test_block_proof_with_state_trie():
    """A one-account state trie round-trips through the kernel loader and
    the digests land in the proof's public values."""
    account = AccountRlp(nonce=1, balance=42)
    key = Nibbles.from_bytes(bytes(range(32)))
    state = PartialTrie.leaf(key, account.encode())
    inputs = GenerationInputs(tries=TrieInputs(state_trie=state))
    traces, pv, kernel = generate_block_traces(inputs)
    assert pv.trie_roots_before.state_root == state.calc_hash()
    assert pv.trie_roots_after.state_root == state.calc_hash()
    assert pv.trie_roots_before.transactions_root == EMPTY_TRIE_ROOT


def test_trie_insert_fuzz():
    """trie_insert against a dict oracle: lookups return what was
    inserted and the root is insertion-order independent (the reference
    delegates to eth_trie_utils::PartialTrie::insert)."""
    import random
    import secrets

    from plonky2_tpu.evm.mpt import (Nibbles, PartialTrie, trie_get,
                                     trie_insert)

    rng = random.Random(0)
    for _ in range(20):
        items = {}
        t = PartialTrie.empty()
        for _ in range(rng.randint(1, 12)):
            k = Nibbles.from_bytes(secrets.token_bytes(32))
            v = secrets.token_bytes(rng.randint(1, 60))
            items[k] = v
            t = trie_insert(t, k, v)
        for k, v in items.items():
            assert trie_get(t, k) == v
        ks = list(items)
        rng.shuffle(ks)
        t2 = PartialTrie.empty()
        for k in ks:
            t2 = trie_insert(t2, k, items[k])
        assert t.calc_hash() == t2.calc_hash()
