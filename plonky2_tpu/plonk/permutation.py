"""Copy-constraint union-find + sigma polynomial generation
(reference plonky2/src/plonk/permutation_argument.rs)."""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..field import goldilocks as gl
from ..iop.target import Target, target_index


class Forest:
    def __init__(self, num_wires: int, num_routed_wires: int, degree: int):
        self.num_wires = num_wires
        self.num_routed_wires = num_routed_wires
        self.degree = degree
        self.parents: List[int] = []

    def add_wire(self, row: int, col: int) -> None:
        self.parents.append(len(self.parents))

    def add_virtual(self, idx: int) -> None:
        self.parents.append(len(self.parents))

    def _index(self, t: Target) -> int:
        return target_index(t, self.num_wires, self.degree)

    def find(self, x: int) -> int:
        p = self.parents
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != x:
            p[x], x = root, p[x]
        return root

    def merge(self, a: Target, b: Target) -> None:
        ra = self.find(self._index(a))
        rb = self.find(self._index(b))
        if ra != rb:
            self.parents[rb] = ra

    def compress_paths(self) -> None:
        for i in range(len(self.parents)):
            self.find(i)

    def sigma_polys(self, k_is: List[int], subgroup: np.ndarray) -> np.ndarray:
        """(num_routed, degree) sigma values: sigma poly for column c at row r =
        k[neighbor.col] * subgroup[neighbor.row], where neighbor = next wire in
        the partition cycle (reference permutation_argument.rs:106-155)."""
        degree = self.degree
        # group routed wires by representative, in row-major scan order
        partition: Dict[int, List[int]] = {}
        nw = self.num_wires
        for row in range(degree):
            base = row * nw
            for col in range(self.num_routed_wires):
                rep = self.parents[base + col]
                partition.setdefault(rep, []).append(row * self.num_routed_wires + col)

        nr = self.num_routed_wires
        neighbor = np.empty(degree * nr, dtype=np.int64)  # flat row-major id
        for subset in partition.values():
            m = len(subset)
            for n in range(m):
                neighbor[subset[n]] = subset[(n + 1) % m]

        k_arr = np.array(k_is, dtype=np.uint64)
        out = np.empty((nr, degree), dtype=np.uint64)
        nb = neighbor.reshape(degree, nr)  # [row][col] -> flat id
        nb_row = (nb // nr).astype(np.int64)
        nb_col = (nb % nr).astype(np.int64)
        vals = gl.mul(k_arr[nb_col], subgroup[nb_row])  # (degree, nr)
        out[:, :] = vals.T
        return out
