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


def hash_leaves_or_noop(leaves: np.ndarray) -> np.ndarray:
    """(N, L) -> (N, 4) digests; L <= 4 passes through zero-padded."""
    N, L = leaves.shape
    if L <= 4:
        out = np.zeros((N, 4), dtype=np.uint64)
        out[:, :L] = leaves
        return out
    return pos.hash_batch_no_pad(leaves)


def build_digest_levels(leaves: np.ndarray, cap_height: int) -> List[np.ndarray]:
    """levels[0] = leaf digests (N,4); levels[k] halves until 2^cap_height."""
    n = leaves.shape[0]
    bits = log2_strict(n)
    assert cap_height <= bits
    levels = [hash_leaves_or_noop(leaves)]
    while levels[-1].shape[0] > (1 << cap_height):
        cur = levels[-1]
        levels.append(pos.compress_batch(cur[0::2], cur[1::2]))
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
                 levels: List[np.ndarray] | None = None):
        """leaves: (N, L) uint64.  levels may be supplied (device-computed)."""
        self.leaves = np.asarray(leaves, dtype=np.uint64)
        self.cap_height = cap_height
        self.levels = levels if levels is not None else build_digest_levels(
            self.leaves, cap_height)
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
                               cap: MerkleCap, proof: MerkleProof) -> bool:
    """reference merkle_proofs.rs verify_merkle_proof_to_cap.

    Scalar path runs on python ints (poseidon_ints) — ~10x faster than
    per-node numpy for the verifier's 28 query rounds."""
    leaf = [int(x) for x in np.asarray(leaf, dtype=np.uint64).reshape(-1)]
    if len(leaf) <= 4:
        h = leaf + [0] * (4 - len(leaf))
    else:
        state = [0] * 12
        for start in range(0, len(leaf), 8):
            chunk = leaf[start:start + 8]
            state = chunk + state[len(chunk):]
            state = pos.poseidon_ints(state)
        h = state[:4]
    idx = leaf_index
    for sib in proof.siblings:
        sib = [int(x) for x in sib]
        if idx & 1:
            state = sib + h + [0, 0, 0, 0]
        else:
            state = h + sib + [0, 0, 0, 0]
        h = pos.poseidon_ints(state)[:4]
        idx >>= 1
    return [int(x) for x in cap.digests[idx]] == h
