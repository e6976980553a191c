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

import functools
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


@functools.lru_cache(maxsize=64)
def _merkle_fetch_fn(n_layers: int):
    """One jitted gather for query rows + all sibling layers: a single
    device round-trip instead of ~2 per layer (the axon TPU tunnel costs
    ~90ms latency per dispatch, so per-layer eager gathers dominated the
    FRI query phase).  Leaves/levels are column-major: leaf i = column i."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fetch(leaves, levels, idx):
        rows = (jnp.take(leaves[0], idx, axis=1).T,
                jnp.take(leaves[1], idx, axis=1).T)      # (Q, L)
        sibs = []
        cur = idx
        for layer in range(n_layers):
            sibs.append((jnp.take(levels[layer][0], cur ^ 1, axis=1).T,
                         jnp.take(levels[layer][1], cur ^ 1, axis=1).T))
            cur = cur >> 1
        sib_lo = jnp.stack([s[0] for s in sibs]) if sibs else \
            jnp.zeros((0, idx.shape[0], 4), jnp.uint32)
        sib_hi = jnp.stack([s[1] for s in sibs]) if sibs else \
            jnp.zeros((0, idx.shape[0], 4), jnp.uint32)
        return rows[0], rows[1], sib_lo, sib_hi

    return fetch


class DeviceMerkleTree:
    """Merkle tree whose leaves and digest levels stay resident on the
    device — the reference's defining GPU memory design
    (merkle_tree.rs:59-63, fri/oracle.rs:426-460): only the cap is copied
    back at construction; query rows and sibling paths are fetched on
    demand, batched across all FRI queries by :meth:`prefetch`.

    Exposes the same ``cap`` / ``get`` / ``prove`` surface as the host
    MerkleTree so the FRI query phase is oblivious to residency."""

    def __init__(self, leaves_dev, levels_dev, cap_height: int):
        from ..field import gf_jax as gf
        from ..runtime import meshctx
        self.leaves_dev = leaves_dev        # (L, N) GF pair (column-major)
        self.levels_dev = levels_dev        # list of (4, Nk) GF pairs
        self.cap_height = cap_height
        cap = gf.to_u64(meshctx.host_get((levels_dev[-1][0],
                                          levels_dev[-1][1])))
        self.cap = MerkleCap(cap.T.copy())  # host contract: (2^h, 4)
        self._rows: dict = {}
        self._paths: dict = {}

    @property
    def num_leaves(self) -> int:
        return self.leaves_dev[0].shape[1]

    def num_layers(self) -> int:
        return log2_strict(self.num_leaves) - self.cap_height

    def prefetch(self, indices) -> None:
        """Fetch leaf rows + full sibling paths for many indices in one
        device call + one host transfer."""
        from ..field import gf_jax as gf
        from ..runtime import meshctx
        indices = [int(i) for i in indices]
        todo = [i for i in indices if i not in self._rows]
        if not todo:
            return
        import jax.numpy as jnp
        idx = jnp.asarray(np.array(todo, dtype=np.int32))
        fetch = _merkle_fetch_fn(self.num_layers())
        out = meshctx.host_get(fetch(
            tuple(self.leaves_dev),
            tuple(tuple(l) for l in self.levels_dev), idx))
        rows = gf.to_u64((out[0], out[1]))            # (Q, L)
        sibs = gf.to_u64((out[2], out[3]))            # (layers, Q, 4)
        for k, i in enumerate(todo):
            self._rows[i] = rows[k]
            self._paths[i] = [sibs[j, k] for j in range(sibs.shape[0])]

    def get(self, i: int) -> np.ndarray:
        if i not in self._rows:
            self.prefetch([i])
        return self._rows[i]

    def prove(self, leaf_index: int) -> MerkleProof:
        if leaf_index not in self._paths:
            self.prefetch([leaf_index])
        return MerkleProof([s.copy() for s in self._paths[leaf_index]])


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
