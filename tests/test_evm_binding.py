"""Proof-binding tests for the block kernel's in-kernel cryptography:

- sender recovery (secp_asm.py `ecrecover` + txn_asm.py sighash) binds the
  transfer to the transaction's real signature — a tampered signature or a
  forged claim panics, so no proof exists (reference ecrecover.asm role);
- trie-root digests (mpt_asm.py `mpt_hash_state_trie`) are computed from
  the loaded TrieData through KECCAK_GENERAL — tampering trie bytes
  changes the executed digest and the host cross-check (and any verifier
  of the memory/keccak CTLs) rejects it (reference mpt_hash.asm role).

The kernel-execution tests run the assembled block kernel in the offline
interpreter (fast); full six-table trace generation with in-kernel
ecrecover is covered by the heavy tier (test_evm_heavy_binding.py)."""
import pytest

from plonky2_tpu.ecdsa.curve import generator, scalar_mul, sign_message
from plonky2_tpu.evm import rlp
from plonky2_tpu.evm.block import (BlockProverInputs, GenerationInputs,
                                   GlobalMetadata, TrieInputs, block_kernel,
                                   generate_block_traces)
from plonky2_tpu.evm.kernel.interpreter import KernelPanic, run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.mpt import AccountRlp, Nibbles, PartialTrie, trie_insert
from plonky2_tpu.evm.transactions import recover_sender, decode_type0_txn
from plonky2_tpu.hash.keccak import keccak256

SK = 0x4646464646464646464646464646464646464646464646464646464646464646


def _addr(pk) -> int:
    pub = pk.x.to_bytes(32, "big") + pk.y.to_bytes(32, "big")
    return int.from_bytes(keccak256(pub)[12:], "big")


def _sign_type0(sk: int, nonce: int, gas_price: int, gas_limit: int,
                to: int, value: int, data: bytes = b"", k: int = 987654321
                ) -> bytes:
    fields = [rlp.encode_int(nonce), rlp.encode_int(gas_price),
              rlp.encode_int(gas_limit), to.to_bytes(20, "big"),
              rlp.encode_int(value), data]
    z = int.from_bytes(keccak256(rlp.encode(fields)), "big")
    point = scalar_mul(generator(), k)
    from plonky2_tpu.ecdsa.curve import SECP256K1_N
    assert point.x < SECP256K1_N, "pick another k"
    sig = sign_message(z, sk, k=k)
    v = 27 + (point.y & 1)
    return rlp.encode(fields + [rlp.encode_int(v), rlp.encode_int(sig.r),
                                rlp.encode_int(sig.s)])


@pytest.fixture(scope="module")
def setup():
    sender = _addr(scalar_mul(generator(), SK))
    to = 0xB0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0B0
    txn = _sign_type0(SK, nonce=0, gas_price=10, gas_limit=30_000,
                      to=to, value=123)
    assert recover_sender(decode_type0_txn(txn)) == sender
    sn = Nibbles.from_bytes(keccak256(sender.to_bytes(20, "big")))
    tn = Nibbles.from_bytes(keccak256(to.to_bytes(20, "big")))
    state = PartialTrie.leaf(sn, AccountRlp(balance=10 ** 18).encode())
    # recipient EXISTS: pure balance move, in-kernel after-root applies
    state = trie_insert(state, tn, AccountRlp(balance=7).encode())
    tries = TrieInputs(state_trie=state)
    inputs = GenerationInputs(signed_txns=[txn], tries=tries)
    return inputs, sender, to, txn


def _run_block_kernel(inputs, in_kernel_ecrecover=True, provider=None):
    kernel = block_kernel(in_kernel_ecrecover=in_kernel_ecrecover)
    provider = provider or BlockProverInputs(inputs)
    st = run_with_kernel(kernel, kernel.global_labels["main"], [],
                         prover_input=provider, max_steps=3_000_000,
                         halt_offsets=[kernel.global_labels["halt_pc0"]])
    return kernel, st


def test_in_kernel_recovery_and_roots(setup):
    """The full block kernel with in-kernel ecrecover + in-kernel
    before/after state roots: ORIGIN and every root slot must match the
    independent host computation, with NO sender or state-digest prover
    inputs consumed."""
    inputs, sender, to, txn = setup

    class Strict(BlockProverInputs):
        def __call__(self, fn, state):
            assert fn[0] != "txn", f"sender served by prover input: {fn}"
            assert not (fn[0] == "mpt" and "digest" in fn[1]
                        and "state" in fn[1]), f"state digest served: {fn}"
            return super().__call__(fn, state)

    provider = Strict(inputs)
    kernel, st = _run_block_kernel(inputs, provider=provider)

    def meta(ix):
        return st.segmem.get((0, int(Segment.GlobalMetadata), ix), 0)

    assert meta(GlobalMetadata.ORIGIN) == 0  # ORIGIN lives in TxnFields
    tf = st.segmem.get((0, int(Segment.TxnFields), 12), 0)
    assert tf == sender
    assert meta(GlobalMetadata.STATE_TRIE_ROOT_DIGEST_BEFORE) == \
        inputs.tries.state_trie.calc_hash()
    assert meta(GlobalMetadata.STATE_TRIE_ROOT_DIGEST_AFTER) == \
        provider.roots_after.state_root


def test_tampered_signature_panics(setup):
    """Corrupt one byte of s in the signed txn: in-kernel ecrecover either
    rejects the signature or recovers a garbage sender whose account does
    not exist — both panic, so no trace (hence no proof) exists."""
    inputs, sender, to, txn = setup
    bad = bytearray(txn)
    bad[-1] ^= 0x01
    bad_inputs = GenerationInputs(
        signed_txns=[bytes(bad)], tries=inputs.tries)

    class Lenient(BlockProverInputs):
        """Host-side recovery would reject the txn outright; serve the
        stream anyway so the KERNEL's own check is what trips."""
        def __init__(self, inputs, good_inputs):
            BlockProverInputs.__init__(self, good_inputs)
            from plonky2_tpu.evm import rlp as rlp_mod
            self.rlp_data = rlp_mod.all_rlp_prover_inputs(
                inputs.signed_txns)
            self.inputs = inputs

    try:
        provider = Lenient(bad_inputs, inputs)
    except AssertionError:
        provider = None
    if provider is None:
        # host apply already refuses — construct provider from the good
        # inputs but serve the tampered RLP bytes
        provider = BlockProverInputs(inputs)
        from plonky2_tpu.evm import rlp as rlp_mod
        provider.rlp_data = rlp_mod.all_rlp_prover_inputs([bytes(bad)])
    with pytest.raises((KernelPanic, AssertionError)):
        _run_block_kernel(inputs, provider=provider)


def test_forged_sender_witness_cannot_move_victim_funds(setup):
    """With in-kernel recovery there is no sender witness at all: a prover
    claiming the transfer debits a different (victim) account has no knob
    to turn — the recovered ORIGIN is a pure function of the signed bytes.
    Sanity-check by serving a txn signed by an unfunded key against a
    state trie that only funds the victim: the recovered sender's account
    is missing and the kernel panics."""
    inputs, sender, to, txn = setup
    attacker_txn = _sign_type0(SK + 1, nonce=0, gas_price=10,
                               gas_limit=30_000, to=to, value=123)
    victim_state = inputs.tries.state_trie  # funds SK's address only
    forged = GenerationInputs(signed_txns=[attacker_txn],
                              tries=TrieInputs(state_trie=victim_state))
    provider = BlockProverInputs(inputs)  # good stream shapes
    from plonky2_tpu.evm import rlp as rlp_mod
    provider.rlp_data = rlp_mod.all_rlp_prover_inputs([attacker_txn])
    with pytest.raises((KernelPanic, AssertionError)):
        _run_block_kernel(forged, provider=provider)


def test_trie_byte_tamper_changes_computed_root(setup):
    """The before-root in GlobalMetadata is COMPUTED from the loaded
    TrieData: tampering one trie word changes the executed digest, and
    generate_block_traces' independent recomputation rejects it."""
    inputs, *_ = setup

    provider = BlockProverInputs(inputs)
    provider.mpt_data = list(provider.mpt_data)
    # flip the sender account's balance word in the serialized stream
    for i, w in enumerate(provider.mpt_data):
        if w == 10 ** 18:
            provider.mpt_data[i] = w + 1
            break
    else:
        raise AssertionError("balance word not found")
    kernel, st = _run_block_kernel(inputs, in_kernel_ecrecover=False,
                                   provider=provider)
    got = st.segmem.get(
        (0, int(Segment.GlobalMetadata),
         GlobalMetadata.STATE_TRIE_ROOT_DIGEST_BEFORE), 0)
    assert got != inputs.tries.state_trie.calc_hash()


def test_generate_traces_rejects_trie_tamper(setup, monkeypatch):
    """Full trace generation refuses tampered trie data loudly."""
    inputs, *_ = setup
    import plonky2_tpu.evm.block as block_mod

    class Tampering(BlockProverInputs):
        def __init__(self, gi):
            super().__init__(gi)
            self.mpt_data = list(self.mpt_data)
            for i, w in enumerate(self.mpt_data):
                if w == 10 ** 18:
                    self.mpt_data[i] = w + 1
                    break

    real = block_mod.BlockProverInputs
    monkeypatch.setattr(block_mod, "BlockProverInputs", Tampering)
    with pytest.raises(ValueError, match="disagree"):
        generate_block_traces(inputs)
    monkeypatch.setattr(block_mod, "BlockProverInputs", real)
