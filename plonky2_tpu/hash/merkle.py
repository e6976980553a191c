"""Merkle trees with caps — host (numpy) representation + proofs.

Semantics follow the reference (plonky2/src/hash/merkle_tree.rs,
merkle_proofs.rs): leaves are hashed with ``hash_or_noop`` (vectors of <= 4
field elements pass through), internal nodes use the two-to-one Poseidon
``compress``, and the tree is truncated at ``cap_height`` — the root is
replaced by a MerkleCap of 2^cap_height digests.

The in-memory layout is level-major (digests[level][index]), NOT the
reference's interleaved recursive layout — only cap values and proof paths
must match, and they do.  Device-side construction lives in merkle_jax.py and
produces exactly these levels.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..utils.bits import log2_strict
from . import poseidon as pos
from .hashers import POSEIDON_CONFIG


def hash_leaves_or_noop(leaves: np.ndarray, hasher=POSEIDON_CONFIG) -> np.ndarray:
    """(N, L) -> (N, 4) digests; L <= 4 passes through zero-padded."""
    return hasher.hash_leaves(leaves)


def build_digest_levels(leaves: np.ndarray, cap_height: int,
                        hasher=POSEIDON_CONFIG) -> List[np.ndarray]:
    """levels[0] = leaf digests (N,4); levels[k] halves until 2^cap_height."""
    n = leaves.shape[0]
    bits = log2_strict(n)
    assert cap_height <= bits
    levels = [hasher.hash_leaves(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(hasher.compress_batch(cur[0::2], cur[1::2]))
    return levels


@dataclass
class MerkleProof:
    siblings: List[np.ndarray]  # each (4,) digest, leaf level upward


@dataclass
class MerkleCap:
    digests: np.ndarray  # (2^cap_height, 4)

    def flatten(self) -> np.ndarray:
        return self.digests.reshape(-1)

    @property
    def cap_height(self) -> int:
        return log2_strict(self.digests.shape[0])


class MerkleTree:
    def __init__(self, leaves: np.ndarray, cap_height: int,
                 levels: List[np.ndarray] | None = None,
                 hasher=POSEIDON_CONFIG):
        """leaves: (N, L) uint64.  levels may be supplied (device-computed)."""
        self.leaves = np.asarray(leaves, dtype=np.uint64)
        self.cap_height = cap_height
        self.levels = levels if levels is not None else build_digest_levels(
            self.leaves, cap_height, hasher)
        self.cap = MerkleCap(self.levels[-1])

    def get(self, i: int) -> np.ndarray:
        return self.leaves[i]

    def prove(self, leaf_index: int) -> MerkleProof:
        n = self.leaves.shape[0]
        num_layers = log2_strict(n) - self.cap_height
        siblings = []
        idx = leaf_index
        for layer in range(num_layers):
            siblings.append(self.levels[layer][idx ^ 1].copy())
            idx >>= 1
        return MerkleProof(siblings)


def verify_merkle_proof_to_cap(leaf: np.ndarray, leaf_index: int,
                               cap: MerkleCap, proof: MerkleProof,
                               hasher=POSEIDON_CONFIG) -> bool:
    """reference merkle_proofs.rs verify_merkle_proof_to_cap.

    Scalar path runs on python ints — ~10x faster than per-node numpy for
    the verifier's 28 query rounds."""
    leaf = [int(x) for x in np.asarray(leaf, dtype=np.uint64).reshape(-1)]
    h = hasher.hash_or_noop_ints(leaf)
    idx = leaf_index
    for sib in proof.siblings:
        sib = [int(x) for x in sib]
        if idx & 1:
            h = hasher.compress_ints(sib, h)
        else:
            h = hasher.compress_ints(h, sib)
        idx >>= 1
    return [int(x) for x in cap.digests[idx]] == h
