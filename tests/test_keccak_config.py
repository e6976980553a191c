"""KeccakGoldilocksConfig: non-algebraic byte-hash config end-to-end
(reference plonk/config.rs:122, hash/keccak.rs)."""
import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.hash import keccak as kc
from plonky2_tpu.hash import merkle as mk
from plonky2_tpu.hash.hashers import KECCAK_CONFIG, POSEIDON_CONFIG
from plonky2_tpu.plonk.config import CircuitConfig


def test_keccak256_known_vectors():
    assert kc.keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert kc.keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # keccak256(rlp("")) — the well-known empty-trie root
    assert kc.keccak256(b"\x80").hex() == (
        "56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421")
    # padding edge cases around the 136-byte rate must all differ
    digests = {kc.keccak256(b"a" * n) for n in (134, 135, 136, 137, 272, 273)}
    assert len(digests) == 6


def test_keccak_digest_element_roundtrip():
    from plonky2_tpu.hash.hashers import (_elems_to_keccak_digest,
                                          _keccak_digest_to_elems)
    d = kc.keccak256(b"roundtrip")[:25]
    elems = _keccak_digest_to_elems(d)
    assert len(elems) == 4
    assert _elems_to_keccak_digest(elems) == d


def test_keccak_merkle_tree_roundtrip():
    rng = np.random.default_rng(7)
    leaves = rng.integers(0, 1 << 63, size=(32, 9), dtype=np.uint64)
    tree = mk.MerkleTree(leaves, cap_height=2, hasher=KECCAK_CONFIG)
    for i in [0, 13, 31]:
        proof = tree.prove(i)
        assert mk.verify_merkle_proof_to_cap(leaves[i], i, tree.cap, proof,
                                             hasher=KECCAK_CONFIG)
        bad = leaves[i].copy()
        bad[0] += 1
        assert not mk.verify_merkle_proof_to_cap(bad, i, tree.cap, proof,
                                                 hasher=KECCAK_CONFIG)


@pytest.mark.slow
def test_keccak_config_fibonacci_e2e():
    # modest PoW so the scalar Keccak grind stays fast
    config = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
        num_query_rounds=28))
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    builder = CircuitBuilder(config)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    builder.register_public_inputs([a, b, cur])
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    data = builder.build(gc=KECCAK_CONFIG)
    assert data.common.hasher_name == "KeccakGoldilocksConfig"
    proof = data.prove(pw)
    data.verify(proof)

    # a Poseidon verifier must NOT accept the proof transcript
    data.common.hasher_name = POSEIDON_CONFIG.name
    with pytest.raises(Exception):
        data.verify(proof)
