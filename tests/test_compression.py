"""Proof compression roundtrip (reference plonk/proof.rs compress/decompress,
hash/path_compression.rs test)."""
import numpy as np

from plonky2_tpu.hash import merkle as mk
from plonky2_tpu.hash.path_compression import (compress_merkle_proofs,
                                               decompress_merkle_proofs)
from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
from plonky2_tpu.plonk.compression import (compress_proof, decompress_proof,
                                           verify_compressed_proof)
from plonky2_tpu.utils.serialization import (deserialize_compressed_proof,
                                             serialize_compressed_proof,
                                             serialize_proof)


def test_merkle_path_compression_roundtrip():
    rng = np.random.default_rng(42)
    h, cap_height = 8, 3
    leaves = rng.integers(0, 1 << 62, size=(1 << h, 5), dtype=np.uint64)
    tree = mk.MerkleTree(leaves, cap_height)
    indices = list(rng.integers(0, 1 << h, size=17))
    indices = [int(i) for i in indices]
    proofs = [tree.prove(i) for i in indices]

    compressed = compress_merkle_proofs(cap_height, indices, proofs)
    n_orig = sum(len(p.siblings) for p in proofs)
    n_comp = sum(len(p.siblings) for p in compressed)
    assert n_comp <= n_orig
    decompressed = decompress_merkle_proofs(
        [leaves[i] for i in indices], indices, compressed, h, cap_height)
    for p, d in zip(proofs, decompressed):
        assert len(p.siblings) == len(d.siblings)
        for a, b in zip(p.siblings, d.siblings):
            assert np.array_equal(a, b)


def test_proof_compression_roundtrip():
    data, pw, _ = build_fibonacci_circuit()
    proof = data.prove(pw)
    data.verify(proof)
    original_bytes = serialize_proof(proof)

    compressed = compress_proof(proof, data.verifier_only.circuit_digest,
                                data.common)
    # dedup must shrink the query data for any repeated/overlapping paths
    verify_compressed_proof(compressed, data.verifier_only, data.common)

    restored = decompress_proof(compressed, data.verifier_only.circuit_digest,
                                data.common)
    assert serialize_proof(restored) == original_bytes
    data.verify(restored)

    # compressed byte roundtrip, and it must actually be smaller
    cbytes = serialize_compressed_proof(compressed)
    assert len(cbytes) < len(original_bytes)
    c2 = deserialize_compressed_proof(cbytes, data.common)
    assert serialize_compressed_proof(c2) == cbytes
    verify_compressed_proof(c2, data.verifier_only, data.common)
