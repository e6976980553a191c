"""Merkle: build + prove + verify roundtrip (mirrors reference
merkle_tree.rs:443-515 tests), device levels == host levels."""
import numpy as np
import pytest

from plonky2_tpu.hash import merkle as mk
from plonky2_tpu.hash import merkle_jax as mkj
from plonky2_tpu.field import goldilocks as gl


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64) % np.uint64(gl.P)


@pytest.mark.parametrize("cap_height", [0, 1, 3])
@pytest.mark.parametrize("leaf_len", [2, 7, 135])
def test_roundtrip(cap_height, leaf_len):
    n = 32
    leaves = rand((n, leaf_len), seed=leaf_len + cap_height)
    t = mk.MerkleTree(leaves, cap_height)
    for i in [0, 1, n // 2, n - 1]:
        proof = t.prove(i)
        assert mk.verify_merkle_proof_to_cap(leaves[i], i, t.cap, proof)
        # tampered leaf must fail
        bad = leaves[i].copy()
        bad[0] = gl.add(bad[0], np.uint64(1))
        assert not mk.verify_merkle_proof_to_cap(bad, i, t.cap, proof)


def test_device_levels_match_host():
    n, L, cap_height = 64, 21, 2
    leaves = rand((n, L), seed=9)
    host = mk.build_digest_levels(leaves, cap_height)
    dev = mkj.merkle_levels_u64(leaves, cap_height)
    assert len(host) == len(dev)
    for a, b in zip(host, dev):
        np.testing.assert_array_equal(a, b)


def test_device_tree_proofs():
    n, L, cap_height = 16, 10, 1
    leaves = rand((n, L), seed=5)
    levels = mkj.merkle_levels_u64(leaves, cap_height)
    t = mk.MerkleTree(leaves, cap_height, levels=levels)
    for i in range(n):
        assert mk.verify_merkle_proof_to_cap(leaves[i], i, t.cap, t.prove(i))


def test_small_leaf_noop():
    # leaves of length <= 4 are their own digest (hash_or_noop)
    leaves = rand((8, 3), seed=1)
    t = mk.MerkleTree(leaves, 0)
    d = t.levels[0]
    np.testing.assert_array_equal(d[:, :3], leaves)
    assert np.all(d[:, 3] == 0)
