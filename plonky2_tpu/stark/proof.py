"""STARK proof containers (reference starky/src/proof.rs)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..field import extension as ge
from ..fri.proof import FriChallenges, FriProof
from ..fri.structure import FriOpeningBatch, FriOpenings
from ..hash.merkle import MerkleCap
from ..plonk.proof import eval_polys_ext
from ..utils.bits import log2_strict


@dataclass
class StarkOpeningSet:
    local_values: np.ndarray       # (COLUMNS, 2)
    next_values: np.ndarray
    permutation_zs: Optional[np.ndarray]
    permutation_zs_next: Optional[np.ndarray]
    quotient_polys: np.ndarray

    @staticmethod
    def new(zeta, g: int, trace_commitment, permutation_zs_commitment,
            quotient_commitment) -> "StarkOpeningSet":
        zeta_next = ge.s_mul(zeta, (g, 0))
        return StarkOpeningSet(
            local_values=eval_polys_ext(trace_commitment.polynomials, zeta),
            next_values=eval_polys_ext(trace_commitment.polynomials, zeta_next),
            permutation_zs=(eval_polys_ext(permutation_zs_commitment.polynomials, zeta)
                            if permutation_zs_commitment is not None else None),
            permutation_zs_next=(eval_polys_ext(
                permutation_zs_commitment.polynomials, zeta_next)
                if permutation_zs_commitment is not None else None),
            quotient_polys=eval_polys_ext(quotient_commitment.polynomials, zeta))

    def to_fri_openings(self) -> FriOpenings:
        def tup(arr):
            return [(int(v[0]), int(v[1])) for v in arr]

        zeta_values = tup(self.local_values)
        if self.permutation_zs is not None:
            zeta_values += tup(self.permutation_zs)
        zeta_values += tup(self.quotient_polys)
        zeta_next_values = tup(self.next_values)
        if self.permutation_zs_next is not None:
            zeta_next_values += tup(self.permutation_zs_next)
        return FriOpenings(batches=[FriOpeningBatch(zeta_values),
                                    FriOpeningBatch(zeta_next_values)])


@dataclass
class StarkProof:
    trace_cap: MerkleCap
    permutation_zs_cap: Optional[MerkleCap]
    quotient_polys_cap: MerkleCap
    openings: StarkOpeningSet
    opening_proof: FriProof

    def recover_degree_bits(self, config) -> int:
        initial_merkle_proof = self.opening_proof.query_round_proofs[0] \
            .initial_trees_proof.evals_proofs[0][1]
        lde_bits = config.fri_config.cap_height + len(initial_merkle_proof.siblings)
        return lde_bits - config.fri_config.rate_bits


@dataclass
class StarkProofWithPublicInputs:
    proof: StarkProof
    public_inputs: List[int]


@dataclass
class StarkProofChallenges:
    permutation_challenge_sets: Optional[list]
    stark_alphas: List[int]
    stark_zeta: Tuple[int, int]
    fri_challenges: FriChallenges
