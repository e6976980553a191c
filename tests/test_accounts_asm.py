"""In-kernel account routines (evm/accounts_asm.py): balance /
extcodesize / extcodecopy / load_code, run in the offline interpreter
exactly like the reference's cpu/kernel/tests/{balance,account_code}.rs —
including its prepare_interpreter flow (load_all_mpts +
mpt_insert_state_trie + mpt_hash_state_trie cross-check)."""
import random

import pytest

from plonky2_tpu.evm.accounts_asm import ACCOUNTS_ASM
from plonky2_tpu.evm.block import TrieInputs
from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.mpt import (AccountRlp, Nibbles, PartialTrie,
                                 all_mpt_prover_inputs, trie_insert)
from plonky2_tpu.evm.mpt_asm import MPT_ASM
from plonky2_tpu.evm.secp_asm import SECP_ASM
from plonky2_tpu.evm.txn_asm import TXN_ASM, txn_field_constants
from plonky2_tpu.hash.keccak import keccak256

GM = int(Segment.GlobalMetadata)
TD = int(Segment.TrieData)
MAIN = int(Segment.MainMemory)


@pytest.fixture(scope="module")
def kernel():
    consts = dict(evm_constants())
    consts.update(txn_field_constants())
    return assemble([parse(UTIL_ASM), parse(MPT_ASM), parse(ACCOUNTS_ASM),
                     parse(TXN_ASM + """
GLOBAL test_halt:
    STOP
"""), parse(SECP_ASM)], consts, optimize=False)


class Provider:
    """mpt::load stream + account_code length/get (reference
    prover_input.rs)."""

    def __init__(self, data, contract_code=None):
        self.data, self.pos = list(data), 0
        self.contract_code = contract_code or {}

    def __call__(self, fn, state):
        if fn[0] == "mpt":
            v = self.data[self.pos]
            self.pos += 1
            return v
        if fn[0] == "account_code":
            if fn[1] == "length":
                return len(self.contract_code[state.stack[-1]])
            if fn[1] == "get":
                return self.contract_code[state.stack[-3]][state.stack[-1]]
        raise AssertionError(f"unexpected prover input {fn}")


def prepare(kernel, address: int, account: AccountRlp, provider=None):
    """reference prepare_interpreter: load empty tries, insert the account
    via mpt_insert_state_trie, cross-check mpt_hash_state_trie."""
    halt = kernel.global_labels["test_halt"]
    provider = provider or Provider(all_mpt_prover_inputs(TrieInputs()))
    st = run_with_kernel(kernel, kernel.global_labels["load_all_mpts"],
                         [halt], prover_input=provider,
                         halt_offsets=[halt], max_steps=5_000_000)
    mem = dict(st.segmem)
    vptr = mem[(0, GM, 3)]
    mem[(0, TD, vptr)] = account.nonce
    mem[(0, TD, vptr + 1)] = account.balance
    mem[(0, TD, vptr + 2)] = 0          # empty storage subtree (ptr 0)
    mem[(0, TD, vptr + 3)] = account.code_hash
    mem[(0, GM, 3)] = vptr + 4
    key = Nibbles.from_bytes(keccak256(address.to_bytes(20, "big")))
    st2 = run_with_kernel(kernel,
                          kernel.global_labels["mpt_insert_state_trie"],
                          [halt, vptr, key.packed], segmem=mem,
                          prover_input=provider, halt_offsets=[halt],
                          max_steps=5_000_000)
    assert st2.stack == []
    st3 = run_with_kernel(kernel,
                          kernel.global_labels["mpt_hash_state_trie"],
                          [halt], segmem=st2.segmem,
                          halt_offsets=[halt], max_steps=10_000_000)
    want = trie_insert(PartialTrie.empty(), key, account.encode())
    assert st3.stack == [want.calc_hash()]
    return st2.segmem, provider


def test_balance(kernel):
    rng = random.Random(5)
    balance = rng.getrandbits(256) % (1 << 250)
    account = AccountRlp(nonce=1111, balance=balance,
                         storage_root=PartialTrie.empty().calc_hash(),
                         code_hash=8888)
    address = rng.getrandbits(160)
    mem, _ = prepare(kernel, address, account)
    halt = kernel.global_labels["test_halt"]
    st = run_with_kernel(kernel, kernel.global_labels["balance"],
                         [halt, address], segmem=mem, halt_offsets=[halt],
                         max_steps=5_000_000)
    assert st.stack == [balance]


def test_balance_absent_account(kernel):
    account = AccountRlp(nonce=1, balance=7,
                         storage_root=PartialTrie.empty().calc_hash(),
                         code_hash=8888)
    mem, _ = prepare(kernel, 0xA11CE, account)
    halt = kernel.global_labels["test_halt"]
    st = run_with_kernel(kernel, kernel.global_labels["balance"],
                         [halt, 0xB0B], segmem=mem, halt_offsets=[halt],
                         max_steps=5_000_000)
    assert st.stack == [0]


def _code_account(code: bytes) -> AccountRlp:
    return AccountRlp(nonce=1111, balance=0,
                      storage_root=PartialTrie.empty().calc_hash(),
                      code_hash=int.from_bytes(keccak256(code), "big"))


def test_extcodesize(kernel):
    rng = random.Random(7)
    code = bytes(rng.randrange(256) for _ in range(rng.randrange(50, 400)))
    account = _code_account(code)
    address = rng.getrandbits(160)
    provider = Provider(all_mpt_prover_inputs(TrieInputs()),
                        {account.code_hash: code})
    mem, provider = prepare(kernel, address, account, provider)
    halt = kernel.global_labels["test_halt"]
    st = run_with_kernel(kernel, kernel.global_labels["extcodesize"],
                         [halt, address], segmem=mem,
                         prover_input=provider, halt_offsets=[halt],
                         max_steps=5_000_000)
    assert st.stack == [len(code)]


def test_extcodesize_rejects_forged_length(kernel):
    """load_code keccaks the served bytes — a provider lying about the
    code cannot reach the return."""
    from plonky2_tpu.evm.kernel.interpreter import KernelPanic
    rng = random.Random(9)
    code = bytes(rng.randrange(256) for _ in range(80))
    account = _code_account(code)
    forged = code[:-1] + bytes([code[-1] ^ 1])
    provider = Provider(all_mpt_prover_inputs(TrieInputs()),
                        {account.code_hash: forged})
    mem, provider = prepare(kernel, 0xCAFE, account, provider)
    halt = kernel.global_labels["test_halt"]
    with pytest.raises(KernelPanic):
        run_with_kernel(kernel, kernel.global_labels["extcodesize"],
                        [halt, 0xCAFE], segmem=mem, prover_input=provider,
                        halt_offsets=[halt], max_steps=5_000_000)


def test_extcodecopy(kernel):
    rng = random.Random(11)
    code = bytes(rng.randrange(256) for _ in range(rng.randrange(100, 300)))
    account = _code_account(code)
    address = rng.getrandbits(160)
    provider = Provider(all_mpt_prover_inputs(TrieInputs()),
                        {account.code_hash: code})
    mem, provider = prepare(kernel, address, account, provider)
    # random preexisting main memory for realism (reference test)
    for i in range(800):
        mem[(0, MAIN, i)] = rng.randrange(256)
    dest_offset = rng.randrange(300)
    offset = rng.randrange(150)
    size = rng.randrange(250)
    halt = kernel.global_labels["test_halt"]
    st = run_with_kernel(
        kernel, kernel.global_labels["extcodecopy"],
        [halt, size, offset, dest_offset, address], segmem=mem,
        prover_input=provider, halt_offsets=[halt], max_steps=5_000_000)
    assert st.stack == []
    for i in range(size):
        want = code[offset + i] if offset + i < len(code) else 0
        got = st.segmem.get((0, MAIN, dest_offset + i), 0)
        assert got == want, (i, got, want)
