"""FRI prover — commit-phase folding, proof-of-work grind, query rounds.

Host-side protocol mirror of the reference (plonky2/src/fri/prover.rs).  The
extension-field FFTs run componentwise over the base field (the fold domains
have size <= 2^32, so all twiddles are base-field elements); heavy fold
commits can be routed to the device commit pipeline later without changing
this module's contract.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..field import extension as ge
from ..field import fft_numpy as fnp
from ..field import goldilocks as gl
from ..hash import merkle as mk
from ..hash import poseidon as pos
from ..iop.challenger import Challenger
from ..utils.bits import bit_reverse_indices
from .config import FriParams
from .proof import FriInitialTreeProof, FriProof, FriQueryRound, FriQueryStep
from ..hash.hashers import POSEIDON_CONFIG


def coset_fft_ext(coeffs: np.ndarray, shift: int) -> np.ndarray:
    """(n, 2) ext coeffs -> (n, 2) ext values on shift*<g>; componentwise."""
    return np.stack([fnp.coset_fft(coeffs[..., 0], shift),
                     fnp.coset_fft(coeffs[..., 1], shift)], axis=-1)


def _reduce_with_powers_ext(chunks: np.ndarray, beta) -> np.ndarray:
    """chunks (m, arity, 2), beta ext scalar -> (m, 2): sum_i chunk[i]*beta^i."""
    m, arity, _ = chunks.shape
    beta_arr = np.array(beta, dtype=np.uint64)
    acc = np.zeros((m, 2), dtype=np.uint64)
    for i in range(arity - 1, -1, -1):
        acc = ge.add(ge.mul(acc, np.broadcast_to(beta_arr, (m, 2))), chunks[:, i])
    return acc


def fri_committed_trees(coeffs: np.ndarray, values: np.ndarray,
                        challenger: Challenger, fri_params: FriParams,
                        hasher=POSEIDON_CONFIG):
    """Returns (trees, final_coeffs).  coeffs/values: (n, 2) extension arrays."""
    trees: List[mk.MerkleTree] = []
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    cap_height = fri_params.config.cap_height
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        n = values.shape[0]
        # bit-reverse rows, chunk into cosets, flatten ext pairs into leaves
        values = values[bit_reverse_indices(n)]
        leaves = values.reshape(n // arity, arity * 2)
        tree = mk.MerkleTree(leaves, cap_height, hasher=hasher)
        challenger.observe_cap(tree.cap)
        trees.append(tree)

        beta = challenger.get_extension_challenge()
        # fold coefficients: P(x) = sum_i x^i P_i(x^arity) -> sum_i beta^i P_i
        m = coeffs.shape[0] // arity
        coeffs = _reduce_with_powers_ext(coeffs.reshape(m, arity, 2), beta)
        shift = gl.s_exp(shift, arity)
        values = coset_fft_ext(coeffs, shift)

    # zero tail drop (always exact zeros)
    final_len = coeffs.shape[0] >> fri_params.config.rate_bits
    assert np.all(coeffs[final_len:] == 0), "FRI final coeffs tail not zero"
    coeffs = coeffs[:final_len]
    challenger.observe_extension_elements(coeffs)
    return trees, coeffs


def fri_proof_of_work(challenger: Challenger, config,
                      hasher=POSEIDON_CONFIG) -> int:
    """Deterministic grind: smallest witness w such that observing w yields a
    challenge with >= proof_of_work_bits leading zero bits (reference
    prover.rs:123-171; the reference uses find_any — any valid witness
    verifies, we pick the smallest for reproducibility)."""
    min_leading_zeros = config.proof_of_work_bits  # + (64 - 64)
    threshold = np.uint64(1) << np.uint64(64 - min_leading_zeros) if min_leading_zeros else None

    if not hasher.algebraic:
        # scalar grind through the hasher's challenger permutation
        bound = 1 << (64 - min_leading_zeros)
        base_state = [int(x) for x in challenger.sponge_state]
        witness_pos = len(challenger.input_buffer)
        for i, v in enumerate(challenger.input_buffer):
            base_state[i] = v
        witness = 0
        while True:
            state = list(base_state)
            state[witness_pos] = witness
            if hasher.permute(state)[pos.SPONGE_RATE - 1] < bound:
                break
            witness += 1
        challenger.observe_element(witness)
        response = challenger.get_challenge()
        assert response < bound
        return witness

    base_state = challenger.sponge_state.copy()
    witness_pos = len(challenger.input_buffer)
    for i, v in enumerate(challenger.input_buffer):
        base_state[i] = v

    BATCH = 1 << 12
    start = 0
    witness = None
    while witness is None:
        states = np.broadcast_to(base_state, (BATCH, pos.WIDTH)).copy()
        states[:, witness_pos] = np.arange(start, start + BATCH, dtype=np.uint64)
        out = pos.poseidon(states)
        responses = out[:, pos.SPONGE_RATE - 1]
        ok = responses < threshold if threshold is not None else np.ones(BATCH, bool)
        idx = np.flatnonzero(ok)
        if idx.size:
            witness = start + int(idx[0])
        start += BATCH
        assert start < (1 << 40), "PoW search runaway"

    challenger.observe_element(witness)
    response = challenger.get_challenge()
    assert response < (1 << (64 - min_leading_zeros))
    return witness


def fri_prover_query_rounds(initial_merkle_trees, trees, challenger: Challenger,
                            n: int, fri_params: FriParams) -> List[FriQueryRound]:
    challs = challenger.get_n_challenges(fri_params.config.num_query_rounds)
    rounds = []
    for rand in challs:
        x_index = rand % n
        initial_proof = [(t.get(x_index).copy(), t.prove(x_index))
                         for t in initial_merkle_trees]
        steps = []
        xi = x_index
        for i, tree in enumerate(trees):
            arity_bits = fri_params.reduction_arity_bits[i]
            leaf = tree.get(xi >> arity_bits)
            evals = leaf.reshape(-1, 2)  # unflatten ext
            steps.append(FriQueryStep(evals=evals,
                                      merkle_proof=tree.prove(xi >> arity_bits)))
            xi >>= arity_bits
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs=initial_proof),
            steps=steps))
    return rounds


def fri_proof(initial_merkle_trees, lde_polynomial_coeffs: np.ndarray,
              lde_polynomial_values: np.ndarray, challenger: Challenger,
              fri_params: FriParams, hasher=POSEIDON_CONFIG) -> FriProof:
    """Top-level FRI proof (reference prover.rs:24-72).

    lde_polynomial_coeffs/values: (lde_size, 2) extension arrays.
    """
    n = lde_polynomial_values.shape[0]
    assert lde_polynomial_coeffs.shape[0] == n

    trees, final_coeffs = fri_committed_trees(
        lde_polynomial_coeffs, lde_polynomial_values, challenger, fri_params,
        hasher=hasher)
    pow_witness = fri_proof_of_work(challenger, fri_params.config,
                                    hasher=hasher)
    query_round_proofs = fri_prover_query_rounds(
        initial_merkle_trees, trees, challenger, n, fri_params)

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=query_round_proofs,
        final_poly=final_coeffs,
        pow_witness=pow_witness,
    )
