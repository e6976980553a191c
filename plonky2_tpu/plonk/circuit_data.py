"""Circuit data containers (reference plonky2/src/plonk/circuit_data.rs)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from ..field import goldilocks as gl
from ..fri.config import FriParams
from ..fri.structure import (FriBatchInfo, FriInstanceInfo, FriOracleInfo,
                             FriPolynomialInfo)
from ..gates.gate import Gate, SelectorsInfo
from .config import CircuitConfig

# Oracle indices + blinding flags (reference plonk_common.rs:17-39)
ORACLE_CONSTANTS_SIGMAS = dict(index=0, blinding=False)
ORACLE_WIRES = dict(index=1, blinding=True)
ORACLE_ZS_PARTIAL_PRODUCTS = dict(index=2, blinding=True)
ORACLE_QUOTIENT = dict(index=3, blinding=True)


@dataclass
class CommonCircuitData:
    config: CircuitConfig
    fri_params: FriParams
    gates: List[Gate]
    selectors_info: SelectorsInfo
    quotient_degree_factor: int
    num_gate_constraints: int
    num_constants: int
    num_public_inputs: int
    k_is: List[int]
    num_partial_products: int
    hasher_name: str = "PoseidonGoldilocksConfig"

    def hasher(self):
        from ..hash.hashers import KECCAK_CONFIG, POSEIDON_CONFIG
        return (KECCAK_CONFIG if self.hasher_name == KECCAK_CONFIG.name
                else POSEIDON_CONFIG)

    def degree_bits(self) -> int:
        return self.fri_params.degree_bits

    def degree(self) -> int:
        return 1 << self.degree_bits()

    def lde_size(self) -> int:
        return self.fri_params.lde_size()

    def quotient_degree(self) -> int:
        return self.quotient_degree_factor * self.degree()

    def constants_range(self) -> range:
        return range(0, self.num_constants)

    def sigmas_range(self) -> range:
        return range(self.num_constants,
                     self.num_constants + self.config.num_routed_wires)

    def zs_range(self) -> range:
        return range(0, self.config.num_challenges)

    def partial_products_range(self) -> range:
        return range(self.config.num_challenges,
                     self.num_zs_partial_products_polys())

    def num_preprocessed_polys(self) -> int:
        return self.sigmas_range().stop

    def num_zs_partial_products_polys(self) -> int:
        return self.config.num_challenges * (1 + self.num_partial_products)

    def num_quotient_polys(self) -> int:
        return self.config.num_challenges * self.quotient_degree_factor

    def fri_oracles(self) -> List[FriOracleInfo]:
        return [
            FriOracleInfo(self.num_preprocessed_polys(),
                          ORACLE_CONSTANTS_SIGMAS["blinding"]),
            FriOracleInfo(self.config.num_wires, ORACLE_WIRES["blinding"]),
            FriOracleInfo(self.num_zs_partial_products_polys(),
                          ORACLE_ZS_PARTIAL_PRODUCTS["blinding"]),
            FriOracleInfo(self.num_quotient_polys(), ORACLE_QUOTIENT["blinding"]),
        ]

    def get_fri_instance(self, zeta) -> FriInstanceInfo:
        """All polys opened at zeta; Z polys also at g*zeta
        (reference circuit_data.rs:351-371)."""
        all_polys = (
            FriPolynomialInfo.from_range(0, range(self.num_preprocessed_polys()))
            + FriPolynomialInfo.from_range(1, range(self.config.num_wires))
            + FriPolynomialInfo.from_range(2, range(self.num_zs_partial_products_polys()))
            + FriPolynomialInfo.from_range(3, range(self.num_quotient_polys())))
        zs_polys = FriPolynomialInfo.from_range(2, self.zs_range())
        g = gl.primitive_root_of_unity(self.degree_bits())
        from ..field import extension as ge
        zeta_next = ge.s_mul(zeta, (g, 0))
        return FriInstanceInfo(
            oracles=self.fri_oracles(),
            batches=[FriBatchInfo(point=zeta, polynomials=all_polys),
                     FriBatchInfo(point=zeta_next, polynomials=zs_polys)])


@dataclass
class ProverOnlyCircuitData:
    generators: list
    generator_indices_by_watches: Dict[int, List[int]]
    constants_sigmas_commitment: object  # PolynomialBatch
    sigmas: np.ndarray          # (degree, num_routed_wires) sigma values
    subgroup: np.ndarray        # (degree,)
    public_inputs: list
    representative_map: List[int]
    circuit_digest: np.ndarray  # (4,)


@dataclass
class VerifierOnlyCircuitData:
    constants_sigmas_cap: object  # MerkleCap
    circuit_digest: np.ndarray


@dataclass
class CircuitData:
    prover_only: ProverOnlyCircuitData
    verifier_only: VerifierOnlyCircuitData
    common: CommonCircuitData

    def prove(self, inputs):
        from .prover import prove
        return prove(self.prover_only, self.common, inputs)

    def verify(self, proof_with_pis) -> None:
        from .verifier import verify
        return verify(proof_with_pis, self.verifier_only, self.common)
