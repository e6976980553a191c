"""Heavy tier: the full six-table block proof with BOTH hardening features
at once — in-kernel secp256k1 sender recovery (secp_asm.py; cpu table
~2^19 rows) and the arithmetic table's 16-bit limb range check at its
production height (2^16 rows, VERDICT r3 ask #7).

Reference anchors: evm/tests/transfer_to_new_addr.rs (block semantics),
cpu/kernel/tests/ecrecover.rs (recovery), system_zero/src/lookup.rs:34
(the permuted-column range-check mechanism the reference never enables).

RUN_HEAVY_TESTS=1; on the TPU box prefer
PLONKY2_TPU_TEST_PLATFORM=ambient so the trace commits run on-device.
"""
import pytest

from plonky2_tpu.ecdsa.curve import generator, scalar_mul
from plonky2_tpu.evm.block import GenerationInputs, TrieInputs, prove_block
from plonky2_tpu.evm.mpt import AccountRlp, Nibbles, PartialTrie, trie_insert
from plonky2_tpu.evm.verifier import verify_all_proof
from plonky2_tpu.hash.keccak import keccak256
from test_evm_binding import SK, _addr, _sign_type0


@pytest.mark.heavy
def test_block_proof_in_kernel_ecrecover_range_check_on():
    sender = _addr(scalar_mul(generator(), SK))
    to = 0xB0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0
    txn = _sign_type0(SK, nonce=0, gas_price=10, gas_limit=30_000,
                      to=to, value=123)
    sn = Nibbles.from_bytes(keccak256(sender.to_bytes(20, "big")))
    tn = Nibbles.from_bytes(keccak256(to.to_bytes(20, "big")))
    state = PartialTrie.leaf(sn, AccountRlp(balance=10 ** 18).encode())
    state = trie_insert(state, tn, AccountRlp(balance=7).encode())
    inputs = GenerationInputs(signed_txns=[txn],
                              tries=TrieInputs(state_trie=state))

    proof, all_stark = prove_block(inputs, in_kernel_ecrecover=True,
                                   range_check=True)
    from plonky2_tpu.stark.config import StarkConfig
    verify_all_proof(all_stark, proof, StarkConfig.standard_fast_config())

    want_after = trie_insert(
        trie_insert(state, sn,
                    AccountRlp(balance=10 ** 18 - 123).encode()),
        tn, AccountRlp(balance=7 + 123).encode())
    assert proof.public_values.trie_roots_after.state_root == \
        want_after.calc_hash()
