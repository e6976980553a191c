"""Kernel-asm unit tests for the transaction routines (run in the offline
interpreter, mirroring how the reference tests its kernel asm:
cpu/kernel/tests/transaction_parsing/parse_type_0_txn.rs,
tests/core/intrinsic_gas.rs)."""
import random
import secrets

import pytest

from plonky2_tpu.evm import mpt as mpt_mod
from plonky2_tpu.evm.block import TrieInputs
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.mpt import (AccountRlp, Nibbles, PartialTrie,
                                 trie_insert)
from plonky2_tpu.evm.txn_asm import TXN_ASM, TXN_FIELDS, txn_field_constants
from plonky2_tpu.hash.keccak import keccak256

# parse_type_0_txn.rs:37 — py-evm-generated signed txn: nonce 5, gas
# price 10, gas 22000, to zero-address, value 100, data 0x4242, v=28
PARSE_TXN = bytes.fromhex(
    "f861050a8255f0940000000000000000000000000000000000000000648242"
    "421ca07c5c61ed975ebd286f6b027b8c504842e50a47d318e1e801719dd744"
    "fe93e6c6a01e7b5119b57dd54e175ff2f055c91f3ab1b53eba0b2c184f347c"
    "dff0e745aca2")


def _kernel(extra: str):
    from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
    from plonky2_tpu.evm.secp_asm import SECP_ASM
    consts = dict(evm_constants())
    consts.update(txn_field_constants())
    from plonky2_tpu.evm.mpt_asm import MPT_ASM
    return assemble([parse(TXN_ASM + extra), parse(UTIL_ASM),
                     parse(SECP_ASM), parse(MPT_ASM)], consts,
                    optimize=False)


@pytest.fixture(scope="module")
def parse_kernel():
    return _kernel("""
GLOBAL test_entry:
    PUSH test_done
    PUSH process_type_0_txn
    JUMP
GLOBAL test_done:
    STOP
""")


def test_parse_type_0_txn(parse_kernel):
    kernel = parse_kernel
    segmem = {(0, int(Segment.RlpRaw), i): b for i, b in enumerate(PARSE_TXN)}
    st = run_with_kernel(
        kernel, kernel.global_labels["test_entry"], [], segmem=segmem,
        halt_offsets=[kernel.global_labels["process_normalized_txn"]])

    def fld(name):
        return st.segmem.get((0, int(Segment.TxnFields), TXN_FIELDS[name]), 0)

    assert fld("TXN_FIELD_CHAIN_ID_PRESENT") == 0
    assert fld("TXN_FIELD_CHAIN_ID") == 0
    assert fld("TXN_FIELD_NONCE") == 5
    assert fld("TXN_FIELD_MAX_PRIORITY_FEE_PER_GAS") == 10
    assert fld("TXN_FIELD_MAX_FEE_PER_GAS") == 10
    assert fld("TXN_FIELD_GAS_LIMIT") == 22000
    assert fld("TXN_FIELD_TO") == 0
    assert fld("TXN_FIELD_VALUE") == 100
    assert fld("TXN_FIELD_DATA_LEN") == 2
    assert st.segmem.get((0, int(Segment.TxnData), 0)) == 0x42
    assert st.segmem.get((0, int(Segment.TxnData), 1)) == 0x42
    assert fld("TXN_FIELD_Y_PARITY") == 1
    assert fld("TXN_FIELD_R") == int.from_bytes(PARSE_TXN[-65:-33], "big")
    assert fld("TXN_FIELD_S") == int.from_bytes(PARSE_TXN[-32:], "big")


def test_intrinsic_gas_charged_through_consume_gas():
    kernel = _kernel("""
GLOBAL test_gas:
    PUSH test_gas_done
    PUSH buy_intrinsic_gas
    JUMP
GLOBAL test_gas_done:
    STOP
""")
    seg = {(0, int(Segment.TxnFields), TXN_FIELDS["TXN_FIELD_DATA_LEN"]): 3,
           (0, int(Segment.TxnData), 0): 0x42,
           (0, int(Segment.TxnData), 1): 0,
           (0, int(Segment.TxnData), 2): 7}
    st = run_with_kernel(kernel, kernel.global_labels["test_gas"], [],
                         segmem=seg)
    assert st.gas_used == 21_000 + 16 + 4 + 16


def test_mpt_read_walks_random_tries():
    kernel = _kernel("""
GLOBAL test_find:
    // stack (bottom-first): key, cnt, ptr
    PUSH test_find_done
    SWAP3
    SWAP2
    SWAP1
    PUSH mpt_read
    JUMP
GLOBAL test_find_done:
    STOP
GLOBAL test_load:
    PUSH test_find_done
    PUSH load_all_mpts
    JUMP
""")

    class _Stream:
        def __init__(self, data):
            self.data, self.pos = list(data), 0

        def __call__(self, fn, state):
            v = self.data[self.pos]
            self.pos += 1
            return v

    rng = random.Random(1)
    for trial in range(8):
        accounts = {}
        t = PartialTrie.empty()
        for _ in range(rng.randint(1, 8)):
            addr = secrets.randbits(160)
            acct = AccountRlp(nonce=rng.randint(0, 9),
                              balance=secrets.randbits(80))
            key = Nibbles.from_bytes(keccak256(addr.to_bytes(20, "big")))
            accounts[key] = acct
            t = trie_insert(t, key, acct.encode())
        tries = TrieInputs(state_trie=t,
                           transactions_trie=PartialTrie.empty(),
                           receipts_trie=PartialTrie.empty())
        data = mpt_mod.all_mpt_prover_inputs(tries)
        st0 = run_with_kernel(kernel, kernel.global_labels["test_load"], [],
                              prover_input=_Stream(data),
                              halt_offsets=[
                                  kernel.global_labels["test_find_done"]])
        GM = int(Segment.GlobalMetadata)
        TD = int(Segment.TrieData)
        root = st0.segmem[(0, GM, 4)]
        for key, acct in accounts.items():
            st = run_with_kernel(kernel, kernel.global_labels["test_find"],
                                 [key.packed, 64, root],
                                 segmem=st0.segmem)
            payload = st.stack[-1]
            assert payload != 0
            assert st.segmem[(0, TD, payload)] == acct.nonce
            assert st.segmem[(0, TD, payload + 1)] == acct.balance
        st = run_with_kernel(kernel, kernel.global_labels["test_find"],
                             [secrets.randbits(256), 64, root],
                             segmem=st0.segmem)
        assert st.stack[-1] == 0
