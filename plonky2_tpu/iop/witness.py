"""Witness containers (reference plonky2/src/iop/witness.rs).

`PartitionWitness` stores one value per copy-constraint equivalence class
(representative), so setting any member of a class sets them all — this is
what makes the generator fixpoint converge in one pass per dependency chain.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .target import Target, target_index


class PartialWitness:
    def __init__(self):
        self.target_values: Dict[Target, int] = {}

    def set_target(self, t: Target, value: int) -> None:
        v = int(value)
        if t in self.target_values:
            assert self.target_values[t] == v, f"conflicting value for {t}"
        self.target_values[t] = v

    def set_wire(self, row: int, column: int, value: int) -> None:
        self.set_target(("w", row, column), value)


class PartitionWitness:
    """One slot per representative in the copy-constraint forest."""

    def __init__(self, num_wires: int, degree: int, representative_map: List[int]):
        self.num_wires = num_wires
        self.degree = degree
        self.rep_map = representative_map
        n = len(representative_map)
        self.values = np.zeros(n, dtype=np.uint64)
        self.is_set = np.zeros(n, dtype=bool)

    def rep(self, t: Target) -> int:
        return self.rep_map[target_index(t, self.num_wires, self.degree)]

    def contains(self, t: Target) -> bool:
        return bool(self.is_set[self.rep(t)])

    def get_target(self, t: Target) -> int:
        r = self.rep(t)
        assert self.is_set[r], f"target {t} not set"
        return int(self.values[r])

    def try_get_target(self, t: Target) -> Optional[int]:
        r = self.rep(t)
        return int(self.values[r]) if self.is_set[r] else None

    def set_target_returning_rep(self, t: Target, value: int) -> Optional[int]:
        """Returns the representative index if newly set, None if already set
        (asserting consistency)."""
        r = self.rep(t)
        v = int(value)
        if self.is_set[r]:
            assert int(self.values[r]) == v, (
                f"Partition containing {t} was set twice with different values: "
                f"{int(self.values[r])} != {v}")
            return None
        self.values[r] = v
        self.is_set[r] = True
        return r

    def get_targets(self, targets) -> List[int]:
        return [self.get_target(t) for t in targets]

    def full_witness(self) -> np.ndarray:
        """(num_wires, degree) wire value matrix (MatrixWitness)."""
        out = np.zeros((self.num_wires, self.degree), dtype=np.uint64)
        # wire targets occupy the first degree*num_wires flat indices, row-major
        reps = np.asarray(self.rep_map[: self.degree * self.num_wires])
        vals = self.values[reps].reshape(self.degree, self.num_wires)
        out[:, :] = vals.T
        return out
