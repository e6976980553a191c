"""Verifier-side Fiat-Shamir challenge recovery (reference
plonky2/src/fri/challenges.rs:14-66)."""
from __future__ import annotations

from ..iop.challenger import Challenger
from .config import FriConfig
from .proof import FriChallenges
from .structure import FriOpenings


def observe_openings(challenger: Challenger, openings: FriOpenings) -> None:
    for batch in openings.batches:
        for v in batch.values:
            challenger.observe_extension_element(v)


def fri_challenges(challenger: Challenger, commit_phase_merkle_caps,
                   final_poly, pow_witness: int, degree_bits: int,
                   config: FriConfig) -> FriChallenges:
    lde_size = 1 << (degree_bits + config.rate_bits)
    fri_alpha = challenger.get_extension_challenge()
    fri_betas = []
    for cap in commit_phase_merkle_caps:
        challenger.observe_cap(cap)
        fri_betas.append(challenger.get_extension_challenge())
    challenger.observe_extension_elements(final_poly)
    challenger.observe_element(pow_witness)
    fri_pow_response = challenger.get_challenge()
    fri_query_indices = [challenger.get_challenge() % lde_size
                         for _ in range(config.num_query_rounds)]
    return FriChallenges(fri_alpha=fri_alpha, fri_betas=fri_betas,
                         fri_pow_response=fri_pow_response,
                         fri_query_indices=fri_query_indices)
