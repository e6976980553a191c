"""Block-level proof generation: GenerationInputs -> AllProof + PublicValues
(reference evm/src/generation/mod.rs + proof.rs:36-100).

The reference drives a ~40-file kernel asm library whose sources are absent
from its own tree here; this framework ships its OWN block kernel written in
the same asm DSL (kernel/).  The kernel:

1. reads the three "before" trie-root digests from prover inputs and stores
   them in `Segment::GlobalMetadata` (reference main.asm stores the same
   fields after hashing the loaded tries in-kernel — in-kernel trie hashing
   via KECCAK_GENERAL is future work; the digests are host-computed with
   the same keccak MPT rules, mpt.py:calc_hash);
2. loads the linearized trie data (mpt.py all_mpt_prover_inputs) into
   `Segment::TrieData` word by word with a counted loop, recording
   TrieDataSize (reference mpt/load.asm);
3. with no transactions, copies the before-digests to the after slots and
   halts (reference simulate_cpu halt loop, generation/mod.rs:119-136).

PublicValues (trie roots before/after + BlockMetadata) are read back from
the executed witness memory exactly like the reference
(generation/mod.rs:85-108) — so tampering with the executed memory state
breaks the memory table / CTLs, and the trie roots carried in the proof are
the ones the constrained execution produced.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from . import mpt as mpt_mod
from . import rlp as rlp_mod
from .kernel.assembler import Kernel, assemble
from .kernel.constants import evm_constants
from .kernel.parser import parse
from .mpt import PartialTrie


# --- global metadata slots (reference constants/global_metadata.rs) --------
class GlobalMetadata:
    LARGEST_CONTEXT = 0
    ORIGIN = 1
    MEMORY_SIZE = 2
    TRIE_DATA_SIZE = 3
    STATE_TRIE_ROOT = 4
    TRANSACTION_TRIE_ROOT = 5
    RECEIPT_TRIE_ROOT = 6
    STATE_TRIE_ROOT_DIGEST_BEFORE = 8
    TRANSACTION_TRIE_ROOT_DIGEST_BEFORE = 9
    RECEIPT_TRIE_ROOT_DIGEST_BEFORE = 10
    STATE_TRIE_ROOT_DIGEST_AFTER = 11
    TRANSACTION_TRIE_ROOT_DIGEST_AFTER = 12
    RECEIPT_TRIE_ROOT_DIGEST_AFTER = 13
    TRIE_ENCODED_CHILD_SIZE = 14


@dataclass
class TrieInputs:
    """reference generation/mod.rs:48-66."""
    state_trie: PartialTrie = field(default_factory=PartialTrie.empty)
    transactions_trie: PartialTrie = field(default_factory=PartialTrie.empty)
    receipts_trie: PartialTrie = field(default_factory=PartialTrie.empty)
    storage_tries: List[Tuple[int, PartialTrie]] = field(default_factory=list)


@dataclass
class BlockMetadata:
    """reference proof.rs:68-76."""
    block_beneficiary: int = 0      # 160-bit address
    block_timestamp: int = 0
    block_number: int = 0
    block_difficulty: int = 0
    block_gaslimit: int = 0
    block_chain_id: int = 0
    block_base_fee: int = 0


@dataclass
class GenerationInputs:
    """reference generation/mod.rs:33-46."""
    signed_txns: List[bytes] = field(default_factory=list)
    tries: TrieInputs = field(default_factory=TrieInputs)
    contract_code: Dict[int, bytes] = field(default_factory=dict)
    block_metadata: BlockMetadata = field(default_factory=BlockMetadata)


@dataclass
class TrieRoots:
    state_root: int = 0
    transactions_root: int = 0
    receipts_root: int = 0


@dataclass
class PublicValues:
    """reference proof.rs:36-50.

    SOUNDNESS CAVEAT: the trie-root digests enter the kernel through
    PROVER_INPUT and are not yet bound to the loaded trie data by the STARK
    itself (in-kernel KECCAK_GENERAL trie hashing is future work).  The
    host-side trace generator cross-checks them against independently
    recomputed ``PartialTrie.calc_hash()`` roots and refuses to emit
    mismatching PublicValues, but a verifier of a third-party proof must not
    treat these roots as proof-bound."""
    trie_roots_before: TrieRoots
    trie_roots_after: TrieRoots
    block_metadata: BlockMetadata


# ---------------------------------------------------------------------------
# prover-input dispatch (reference generation/prover_input.rs)
# ---------------------------------------------------------------------------

class BlockProverInputs:
    """Serves PROVER_INPUT(ns::fn) reads during kernel execution."""

    def __init__(self, inputs: GenerationInputs):
        from .transactions import apply_transactions
        self.inputs = inputs
        tries = inputs.tries
        self.roots_before = TrieRoots(
            state_root=tries.state_trie.calc_hash(),
            transactions_root=tries.transactions_trie.calc_hash(),
            receipts_root=tries.receipts_trie.calc_hash())
        (state_after, txn_after, rcpt_after,
         self.txns, self.senders) = apply_transactions(
            tries, inputs.signed_txns)
        self.tries_after = (state_after, txn_after, rcpt_after)
        self.roots_after = TrieRoots(
            state_root=state_after.calc_hash(),
            transactions_root=txn_after.calc_hash(),
            receipts_root=rcpt_after.calc_hash())
        self.mpt_data = mpt_mod.all_mpt_prover_inputs(tries)
        self.rlp_data = rlp_mod.all_rlp_prover_inputs(inputs.signed_txns)
        self._mpt_pos = 0
        self._rlp_pos = 0
        self._next_txn = 0

    def __call__(self, fn: Tuple[str, ...], state) -> int:
        ns = fn[0]
        if ns == "mpt":
            what = fn[1] if len(fn) > 1 else "load"
            if what == "count":
                return len(self.mpt_data)
            if what == "load":
                v = self.mpt_data[self._mpt_pos]
                self._mpt_pos += 1
                return v
            if what == "state_digest":
                return self.roots_before.state_root
            if what == "txn_digest":
                return self.roots_before.transactions_root
            if what == "receipt_digest":
                return self.roots_before.receipts_root
            if what == "state_digest_after":
                return self.roots_after.state_root
            if what == "txn_digest_after":
                return self.roots_after.transactions_root
            if what == "receipt_digest_after":
                return self.roots_after.receipts_root
        if ns == "rlp":
            v = self.rlp_data[self._rlp_pos]
            self._rlp_pos += 1
            return v
        if ns == "end_of_txns":
            if self._next_txn == len(self.inputs.signed_txns):
                return 1
            self._next_txn += 1
            return 0
        if ns == "txn":
            if fn[1] == "sender":
                # host-side secp256k1 recovery (ecdsa/curve.py ecrecover);
                # prover-supplied until the in-kernel curve library lands
                return self.senders[self._next_txn - 1]
        if ns == "ff":
            # finite-field helpers (prover_input.rs:47-52,96-183)
            from ..field import goldilocks as gl  # noqa: F401
            fields = {
                "bn254_base": 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47,
                "secp256k1_base": 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
                "secp256k1_scalar": 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
            }
            n = fields[fn[1]]
            x = state.stack[-1]
            if fn[2] == "inverse":
                return pow(x, n - 2, n)
            if fn[2] == "sqrt":
                assert (n + 1) % 4 == 0
                return pow(x, (n + 1) // 4, n)
        if ns == "account_code":
            code = self.inputs.contract_code
            if fn[1] == "length":
                return len(code[state.stack[-1]])
            if fn[1] == "get":
                return code[state.stack[-3]][state.stack[-1]]
        raise ValueError(f"unrecognized prover input function {fn}")


# ---------------------------------------------------------------------------
# the block kernel
# ---------------------------------------------------------------------------

_BLOCK_KERNEL_ASM = """
%macro mstore_global(ix)
    // stack: value -> (empty); writes GlobalMetadata[$ix] in context 0
    PUSH $ix
    PUSH @SEGMENT_GLOBAL_METADATA
    PUSH 0
    MSTORE_GENERAL
%endmacro

%macro mload_global(ix)
    // stack: (empty) -> value
    PUSH $ix
    PUSH @SEGMENT_GLOBAL_METADATA
    PUSH 0
    MLOAD_GENERAL
%endmacro

GLOBAL main:
    // "before" trie-root digests -> global metadata (slots 8..10)
    PROVER_INPUT(mpt::state_digest)
    %mstore_global(8)
    PROVER_INPUT(mpt::txn_digest)
    %mstore_global(9)
    PROVER_INPUT(mpt::receipt_digest)
    %mstore_global(10)

    // load linearized trie data into Segment::TrieData
    PROVER_INPUT(mpt::count)
    PUSH 0
    // stack: i, n
load_loop:
    DUP2
    DUP2
    EQ
    PUSH load_done
    JUMPI
    PROVER_INPUT(mpt::load)
    // stack: word, i, n
    DUP2
    PUSH @SEGMENT_TRIE_DATA
    PUSH 0
    MSTORE_GENERAL
    // stack: i, n
    PUSH 1
    ADD
    PUSH load_loop
    JUMP
load_done:
    // stack: i(==n), n
    POP
    %mstore_global(3)            // TrieDataSize = n

    // process signed transactions (type 0): parse RLP in-kernel, charge
    // intrinsic gas through CONSUME_GAS, debit/credit balances in the
    // loaded TrieData via the state-trie walk (txn_asm.py)
    PROVER_INPUT(end_of_txns)
    PUSH txns_done
    JUMPI
    // at least one txn: build the SHL/SHR shift table once (spliced here
    // by block_kernel(); no-txn blocks skip its ~2.8k cycles)
// SHIFT_TABLE_INIT_SPLICE
txn_first:
    PROVER_INPUT(rlp)           // txn byte length
    PUSH 0                      // i, len
rlp_copy:
    DUP2
    DUP2
    EQ
    PUSH rlp_copy_done
    JUMPI
    PROVER_INPUT(rlp)           // byte, i, len
    DUP2
    %stack (i, byte) -> (0, @SEGMENT_RLP_RAW, i, byte)
    MSTORE_GENERAL              // i, len
    PUSH 1
    ADD
    PUSH rlp_copy
    JUMP
rlp_copy_done:
    POP
    POP
    PUSH txn_parsed
    PUSH process_type_0_txn
    JUMP
txn_parsed:
    PUSH txn_gas_done
    PUSH buy_intrinsic_gas
    JUMP
txn_gas_done:
    PUSH txn_xfer_done
    PUSH txn_transfer
    JUMP
txn_xfer_done:
txn_loop:
    PROVER_INPUT(end_of_txns)
    PUSH txns_done
    JUMPI
    PUSH txn_first
    JUMP
txns_done:
    // "after" trie-root digests (host-recomputed post-transaction tries,
    // cross-checked against an independent application in
    // generate_block_traces) -> global metadata slots 11..13
    PROVER_INPUT(mpt::state_digest_after)
    %mstore_global(11)
    PROVER_INPUT(mpt::txn_digest_after)
    %mstore_global(12)
    PROVER_INPUT(mpt::receipt_digest_after)
    %mstore_global(13)

    PUSH halt_pc0
    JUMP

GLOBAL halt_pc0:
    PUSH halt_pc0
GLOBAL halt_pc1:
    JUMP
"""


def block_kernel() -> Kernel:
    from .kernel.stdlib import SHIFT_TABLE_INIT
    from .txn_asm import TXN_ASM, txn_field_constants

    consts = evm_constants()
    consts.update(txn_field_constants())
    # the shift table must exist before txn_asm's SHL/SHR run; its init
    # body falls through into the first txn's processing
    main_asm = _BLOCK_KERNEL_ASM.replace(
        "// SHIFT_TABLE_INIT_SPLICE\n", SHIFT_TABLE_INIT + "\n")
    return assemble([parse(main_asm), parse(TXN_ASM)], consts,
                    optimize=False)


# ---------------------------------------------------------------------------
# trace generation + proving (reference generation/mod.rs:68-136)
# ---------------------------------------------------------------------------

def generate_block_traces(inputs: GenerationInputs, min_rows: int = 8,
                          range_check=None):
    """Returns (traces for the 6-table AllStark, PublicValues, kernel).

    ``range_check``: arithmetic-table 16-bit limb range check — None (auto
    at production heights), True, or False; see
    ``all_stark.arithmetic_range_check_policy``."""
    from .all_stark import generate_all_traces_with_cpu
    from .generation import generate_kernel_execution

    kernel = block_kernel()
    provider_factory = lambda: BlockProverInputs(inputs)  # noqa: E731
    ex = generate_kernel_execution(kernel, min_rows=min_rows,
                                   prover_input_factory=provider_factory)
    traces = generate_all_traces_with_cpu(kernel, min_rows=min_rows,
                                          execution=ex,
                                          range_check=range_check)

    from .memory import Segment
    mem = ex.final_state.memory

    def read_meta(ix: int) -> int:
        return mem.get((0, int(Segment.GlobalMetadata), ix), 0)

    # The before-digests enter the kernel via PROVER_INPUT — an
    # unconstrained prover-chosen witness.  Until in-kernel KECCAK_GENERAL
    # trie hashing binds them, refuse to emit PublicValues whose roots
    # disagree with an independent host recomputation of the loaded tries.
    expected = TrieRoots(
        state_root=inputs.tries.state_trie.calc_hash(),
        transactions_root=inputs.tries.transactions_trie.calc_hash(),
        receipts_root=inputs.tries.receipts_trie.calc_hash())
    got = (read_meta(GlobalMetadata.STATE_TRIE_ROOT_DIGEST_BEFORE),
           read_meta(GlobalMetadata.TRANSACTION_TRIE_ROOT_DIGEST_BEFORE),
           read_meta(GlobalMetadata.RECEIPT_TRIE_ROOT_DIGEST_BEFORE))
    if got != (expected.state_root, expected.transactions_root,
               expected.receipts_root):
        raise ValueError(
            "kernel-loaded trie-root digests disagree with independently "
            f"recomputed roots: {got} vs {expected}")
    # after-roots: independently re-apply the transactions and compare
    from .transactions import apply_transactions
    state_after, txn_after, rcpt_after, _, _ = apply_transactions(
        inputs.tries, inputs.signed_txns)
    got_after = (read_meta(GlobalMetadata.STATE_TRIE_ROOT_DIGEST_AFTER),
                 read_meta(GlobalMetadata.TRANSACTION_TRIE_ROOT_DIGEST_AFTER),
                 read_meta(GlobalMetadata.RECEIPT_TRIE_ROOT_DIGEST_AFTER))
    if got_after != (state_after.calc_hash(), txn_after.calc_hash(),
                     rcpt_after.calc_hash()):
        raise ValueError(
            "kernel after-digests disagree with the re-applied "
            f"transactions: {got_after}")

    public_values = PublicValues(
        trie_roots_before=TrieRoots(
            read_meta(GlobalMetadata.STATE_TRIE_ROOT_DIGEST_BEFORE),
            read_meta(GlobalMetadata.TRANSACTION_TRIE_ROOT_DIGEST_BEFORE),
            read_meta(GlobalMetadata.RECEIPT_TRIE_ROOT_DIGEST_BEFORE)),
        trie_roots_after=TrieRoots(
            read_meta(GlobalMetadata.STATE_TRIE_ROOT_DIGEST_AFTER),
            read_meta(GlobalMetadata.TRANSACTION_TRIE_ROOT_DIGEST_AFTER),
            read_meta(GlobalMetadata.RECEIPT_TRIE_ROOT_DIGEST_AFTER)),
        block_metadata=inputs.block_metadata)
    return traces, public_values, kernel


def prove_block(inputs: GenerationInputs, config=None, min_rows: int = 8,
                range_check=None):
    """GenerationInputs -> AllProof with PublicValues (reference
    prover.rs prove + generation/mod.rs generate_traces).

    ``range_check=None`` auto-enables the arithmetic table's 16-bit limb
    range check at production heights (>= 2^16 arithmetic rows)."""
    from ..stark.config import StarkConfig
    from .all_stark import make_all_stark_with_cpu
    from .arithmetic import NUM_ARITH_RC_COLUMNS
    from .prover import prove_all

    config = config if config is not None else \
        StarkConfig.standard_fast_config()
    traces, public_values, kernel = generate_block_traces(
        inputs, min_rows=min_rows, range_check=range_check)
    # resolve the flag from the generated trace layout so the Stark
    # instance can never drift from the witness
    rc = traces[-1].shape[0] == NUM_ARITH_RC_COLUMNS
    all_stark = make_all_stark_with_cpu(kernel, range_check=rc)
    proof = prove_all(all_stark, config, traces)
    proof.public_values = public_values
    return proof, all_stark
