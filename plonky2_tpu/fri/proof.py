"""FRI proof containers (reference plonky2/src/fri/proof.rs)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np

from ..hash.merkle import MerkleCap, MerkleProof


@dataclass
class FriInitialTreeProof:
    # per oracle: (leaf values (L,) uint64, merkle proof)
    evals_proofs: List[Tuple[np.ndarray, MerkleProof]]

    def unsalted_eval(self, oracle_index: int, poly_index: int, salted: bool) -> int:
        evals = self.evals_proofs[oracle_index][0]
        n = len(evals) - (4 if salted else 0)  # SALT_SIZE = 4
        return int(evals[:n][poly_index])


@dataclass
class FriQueryStep:
    evals: np.ndarray   # (arity, 2) extension elements
    merkle_proof: MerkleProof


@dataclass
class FriQueryRound:
    initial_trees_proof: FriInitialTreeProof
    steps: List[FriQueryStep]


@dataclass
class FriProof:
    commit_phase_merkle_caps: List[MerkleCap]
    query_round_proofs: List[FriQueryRound]
    final_poly: np.ndarray  # (final_len, 2) extension coefficients
    pow_witness: int


@dataclass
class FriChallenges:
    fri_alpha: Tuple[int, int]
    fri_betas: List[Tuple[int, int]]
    fri_pow_response: int
    fri_query_indices: List[int]
