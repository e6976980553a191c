"""Multi-table proof containers (reference evm/src/proof.rs)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..fri.proof import FriProof
from ..fri.structure import FriOpeningBatch, FriOpenings
from ..hash.merkle import MerkleCap


@dataclass
class EvmStarkOpeningSet:
    """(reference proof.rs:174-259)."""
    local_values: np.ndarray            # (COLUMNS, 2) ext
    next_values: np.ndarray
    permutation_ctl_zs: np.ndarray      # (num_perm+num_ctl, 2) ext
    permutation_ctl_zs_next: np.ndarray
    ctl_zs_last: List[int]              # base-field openings at g^-1
    quotient_polys: np.ndarray

    def to_fri_openings(self) -> FriOpenings:
        to_pairs = lambda arr: [(int(v[0]), int(v[1])) for v in arr]  # noqa
        zeta_batch = FriOpeningBatch(
            values=(to_pairs(self.local_values)
                    + to_pairs(self.permutation_ctl_zs)
                    + to_pairs(self.quotient_polys)))
        zeta_next_batch = FriOpeningBatch(
            values=(to_pairs(self.next_values)
                    + to_pairs(self.permutation_ctl_zs_next)))
        ctl_last_batch = FriOpeningBatch(
            values=[(int(v), 0) for v in self.ctl_zs_last])
        return FriOpenings(batches=[zeta_batch, zeta_next_batch,
                                    ctl_last_batch])


@dataclass
class EvmStarkProof:
    trace_cap: MerkleCap
    permutation_ctl_zs_cap: MerkleCap
    quotient_polys_cap: MerkleCap
    openings: EvmStarkOpeningSet
    opening_proof: FriProof


@dataclass
class AllProof:
    stark_proofs: List[EvmStarkProof]
    degree_bits: List[int]
    # block-level public values (trie roots + metadata), present when the
    # proof came from GenerationInputs (reference proof.rs AllProof carries
    # PublicValues the same way)
    public_values: Optional[object] = None
