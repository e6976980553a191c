"""Signed-transaction block proofs (reference evm/tests/transfer_to_new_addr.rs
+ cpu/kernel/tests/transaction_parsing/parse_type_0_txn.rs +
tests/core/intrinsic_gas.rs): a real secp256k1-signed type-0 transfer is
RLP-parsed in-kernel, charged intrinsic gas through CONSUME_GAS, and its
balance movement executed against the loaded state-trie data; the block's
PublicValues must show the state root moving to the independently
constructed post-transfer trie."""
import numpy as np
import pytest

from plonky2_tpu.evm.block import (BlockMetadata, GenerationInputs,
                                   TrieInputs, generate_block_traces,
                                   prove_block)
from plonky2_tpu.evm.mpt import (AccountRlp, Nibbles, PartialTrie,
                                 trie_insert)
from plonky2_tpu.evm.transactions import (decode_type0_txn, intrinsic_gas,
                                          recover_sender)
from plonky2_tpu.hash.keccak import keccak256

# the reference test's exact signed txn (transfer_to_new_addr.rs:60):
# nonce 5, gas price 10, gas 22000, to a0..a0, value 100, data 0x4242
TXN = bytes.fromhex(
    "f861050a8255f094a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a0a06482424"
    "21ba02c89eb757d9deeb1f5b3859a9d4d679951ef610ac47ad4608dc142beb1"
    "b7e313a05af7e9fbab825455d36c36c7f4cfcafbeafa9a77bdff936b52afb36"
    "d4fe4bcdd")
SENDER = 0x2c7536e3605d9c16a7a3d7b1898e529396a65c23
TO = 0xA0A0A0A0A0A0A0A0A0A0A0A0A0A0A0A0A0A0A0A0
VALUE = 100


def _inputs():
    sender_account = AccountRlp(nonce=5, balance=100_000 * 10 ** 18)
    sn = Nibbles.from_bytes(keccak256(SENDER.to_bytes(20, "big")))
    state = PartialTrie.leaf(sn, sender_account.encode())
    tries = TrieInputs(state_trie=state,
                       transactions_trie=PartialTrie.empty(),
                       receipts_trie=PartialTrie.empty())
    return GenerationInputs(signed_txns=[TXN], tries=tries,
                            block_metadata=BlockMetadata()), sender_account


def _expected_state_after(sender_account):
    """The reference test's hand-built expected trie
    (transfer_to_new_addr.rs:76-103)."""
    sn = Nibbles.from_bytes(keccak256(SENDER.to_bytes(20, "big")))
    tn = Nibbles.from_bytes(keccak256(TO.to_bytes(20, "big")))
    after_sender = AccountRlp(nonce=sender_account.nonce,
                              balance=sender_account.balance - VALUE)
    after_to = AccountRlp(balance=VALUE)
    t = PartialTrie.leaf(sn, after_sender.encode())
    t = trie_insert(t, tn, after_to.encode())
    return t


def test_txn_decode_and_sender_recovery():
    txn = decode_type0_txn(TXN)
    assert (txn.nonce, txn.gas_price, txn.gas_limit) == (5, 10, 22000)
    assert txn.to == TO and txn.value == VALUE and txn.data == b"\x42\x42"
    assert recover_sender(txn) == SENDER
    assert intrinsic_gas(txn) == 21_000 + 2 * 16


def test_transfer_traces_and_public_values():
    inputs, sender_account = _inputs()
    traces, public_values, kernel = generate_block_traces(inputs)
    expected = _expected_state_after(sender_account)
    assert public_values.trie_roots_after.state_root == expected.calc_hash()
    assert public_values.trie_roots_before.state_root == \
        inputs.tries.state_trie.calc_hash()
    # the in-kernel transfer really moved the balance in TrieData: the
    # sender leaf's balance slot was rewritten by constrained MSTOREs
    from plonky2_tpu.evm import cpu as cpu_mod
    from plonky2_tpu.stark.testing import trace_constraint_violations
    assert trace_constraint_violations(cpu_mod.CpuStark(kernel),
                                       traces[0]) == []


def test_transfer_insufficient_balance_panics():
    inputs, _ = _inputs()
    poor = AccountRlp(nonce=5, balance=VALUE - 1)
    sn = Nibbles.from_bytes(keccak256(SENDER.to_bytes(20, "big")))
    inputs.tries.state_trie = PartialTrie.leaf(sn, poor.encode())
    with pytest.raises(Exception):
        generate_block_traces(inputs)


@pytest.mark.heavy
def test_transfer_block_proof_verifies():
    from plonky2_tpu.evm.verifier import verify_all_proof
    from plonky2_tpu.stark.config import StarkConfig

    inputs, sender_account = _inputs()
    proof, all_stark = prove_block(inputs)
    verify_all_proof(all_stark, proof, StarkConfig.standard_fast_config())
    expected = _expected_state_after(sender_account)
    assert proof.public_values.trie_roots_after.state_root == \
        expected.calc_hash()
