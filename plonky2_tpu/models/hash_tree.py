"""Poseidon hash-tree circuit — the flagship wall-clock benchmark model.

Proves knowledge of 2^k leaf hashes whose Poseidon Merkle root is a public
input.  Each two-to-one compression is one PoseidonGate row, so a
log2_leaves = k circuit has ~2^k rows — at k=18 this matches the reference's
canonical ed25519-scale GPU shape (234 wire polys x 2^18 rows,
cuda/test.cu:105-115) while exercising the hash-heavy gate mix recursion
uses.  The tree topology keeps witness generation wide (one batched
Poseidon wave per level) instead of a serial chain.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..field import goldilocks as gl
from ..hash import poseidon as pos
from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.config import CircuitConfig


def build_hash_tree_circuit(config: CircuitConfig, log2_leaves: int,
                            seed: int = 0):
    """Returns (data, partial_witness, expected_root)."""
    builder = CircuitBuilder(config)
    n = 1 << log2_leaves
    leaf_targets = [builder.add_virtual_targets(4) for _ in range(n)]
    level = leaf_targets
    while len(level) > 1:
        level = [builder.hash_n_to_hash_no_pad(level[2 * i] + level[2 * i + 1])
                 for i in range(len(level) // 2)]
    builder.register_public_inputs(level[0])
    data = builder.build()

    rng = np.random.default_rng(seed)
    leaves = rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64)
    pw = PartialWitness()
    for t4, row in zip(leaf_targets, leaves):
        for t, v in zip(t4, row):
            pw.set_target(t, int(v))

    # expected root via the host hasher (one batched permutation per level)
    cur = leaves
    while cur.shape[0] > 1:
        pairs = cur.reshape(-1, 8)
        state = np.zeros((pairs.shape[0], 12), dtype=np.uint64)
        state[:, :8] = pairs
        cur = pos.poseidon(state)[:, :4]
    root = [int(x) for x in cur[0]]
    return data, pw, root
