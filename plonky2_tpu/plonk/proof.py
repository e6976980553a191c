"""PLONK proof containers + OpeningSet (reference plonky2/src/plonk/proof.rs)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri.proof import FriChallenges, FriProof
from ..fri.structure import FriOpeningBatch, FriOpenings
from ..hash.merkle import MerkleCap


def eval_polys_ext(polys: np.ndarray, z: Tuple[int, int]) -> np.ndarray:
    """Evaluate a batch of base-coeff polynomials at an ext point: (B, n) ->
    (B, 2).  Vectorized: dot each row with precomputed ext powers of z."""
    B, n = polys.shape
    zpow = ge.powers(np.array(z, dtype=np.uint64), n)  # (n, 2)
    out0 = gl.modsum(gl.mul(polys, zpow[:, 0]), axis=1)
    out1 = gl.modsum(gl.mul(polys, zpow[:, 1]), axis=1)
    return np.stack([out0, out1], axis=-1)


@dataclass
class OpeningSet:
    constants: np.ndarray        # (k, 2) ext values
    plonk_sigmas: np.ndarray
    wires: np.ndarray
    plonk_zs: np.ndarray
    plonk_zs_next: np.ndarray
    partial_products: np.ndarray
    quotient_polys: np.ndarray

    @staticmethod
    def new(zeta, g: int, constants_sigmas_commitment, wires_commitment,
            zs_partial_products_commitment, quotient_polys_commitment,
            common_data) -> "OpeningSet":
        zeta_next = ge.s_mul(zeta, (g, 0))
        if wires_commitment._coeffs_dev is not None:
            # one device dispatch for all oracles x both points; only the
            # (B, 2) opened values come back
            from ..ops.openings import eval_openings_batched
            out = eval_openings_batched(
                [constants_sigmas_commitment, wires_commitment,
                 zs_partial_products_commitment, quotient_polys_commitment],
                [zeta, zeta_next])
            cs_eval = out[0][0]
            wires_eval = out[1][0]
            zspp_eval = out[2][0]
            zspp_next = out[2][1][list(common_data.zs_range())]
            q_eval = out[3][0]
        else:
            cs_eval = eval_polys_ext(constants_sigmas_commitment.polynomials,
                                     zeta)
            zspp_eval = eval_polys_ext(
                zs_partial_products_commitment.polynomials, zeta)
            zspp_next = eval_polys_ext(
                zs_partial_products_commitment.polynomials[
                    list(common_data.zs_range())], zeta_next)
            wires_eval = eval_polys_ext(wires_commitment.polynomials, zeta)
            q_eval = eval_polys_ext(quotient_polys_commitment.polynomials,
                                    zeta)
        return OpeningSet(
            constants=cs_eval[list(common_data.constants_range())],
            plonk_sigmas=cs_eval[list(common_data.sigmas_range())],
            wires=wires_eval,
            plonk_zs=zspp_eval[list(common_data.zs_range())],
            plonk_zs_next=zspp_next,
            partial_products=zspp_eval[list(common_data.partial_products_range())],
            quotient_polys=q_eval)

    def to_fri_openings(self) -> FriOpenings:
        zeta_values = np.concatenate([
            self.constants, self.plonk_sigmas, self.wires, self.plonk_zs,
            self.partial_products, self.quotient_polys], axis=0)
        zeta_batch = FriOpeningBatch(
            values=[(int(v[0]), int(v[1])) for v in zeta_values])
        zeta_next_batch = FriOpeningBatch(
            values=[(int(v[0]), int(v[1])) for v in self.plonk_zs_next])
        return FriOpenings(batches=[zeta_batch, zeta_next_batch])


@dataclass
class Proof:
    wires_cap: MerkleCap
    plonk_zs_partial_products_cap: MerkleCap
    quotient_polys_cap: MerkleCap
    openings: OpeningSet
    opening_proof: FriProof


@dataclass
class ProofWithPublicInputs:
    proof: Proof
    public_inputs: List[int]

    def get_public_inputs_hash(self) -> np.ndarray:
        from ..hash import poseidon as pos
        return pos.hash_no_pad(np.array(self.public_inputs, dtype=np.uint64))


@dataclass
class ProofChallenges:
    plonk_betas: List[int]
    plonk_gammas: List[int]
    plonk_alphas: List[int]
    plonk_zeta: Tuple[int, int]
    fri_challenges: FriChallenges
