"""Copy-constraint union-find + sigma polynomial generation
(reference plonky2/src/plonk/permutation_argument.rs).

The forest is a numpy parent array: slots are bulk-initialized, path
compression is vectorized pointer-jumping, and the sigma cycles are built
with one stable argsort over representatives — python-per-wire loops would
cost minutes (and gigabytes of boxed ints) at the 2^18 x 234-wire flagship
shape.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..field import goldilocks as gl
from ..iop.target import Target, target_index


class Forest:
    def __init__(self, num_wires: int, num_routed_wires: int, degree: int):
        self.num_wires = num_wires
        self.num_routed_wires = num_routed_wires
        self.degree = degree
        self.parents: np.ndarray = np.empty(0, dtype=np.int64)

    # -- slot allocation ---------------------------------------------------

    def init_slots(self, num_virtual: int) -> None:
        """All wire slots (row-major) followed by the virtual targets."""
        n = self.degree * self.num_wires + num_virtual
        self.parents = np.arange(n, dtype=np.int64)

    # legacy per-slot API (tests); prefer init_slots
    def add_wire(self, row: int, col: int) -> None:
        self.parents = np.append(self.parents, len(self.parents))

    def add_virtual(self, idx: int) -> None:
        self.parents = np.append(self.parents, len(self.parents))

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

    def merge_many(self, constraints) -> None:
        """Union all (a, b) Target pairs; indices resolved in bulk."""
        nw, deg = self.num_wires, self.degree
        p = self.parents
        find = self.find
        for a, b in constraints:
            ra = find(target_index(a, nw, deg))
            rb = find(target_index(b, nw, deg))
            if ra != rb:
                p[rb] = ra

    def compress_paths(self) -> None:
        """Full path compression by vectorized pointer jumping (log depth)."""
        p = self.parents
        while True:
            pp = p[p]
            if np.array_equal(pp, p):
                break
            p = pp
        self.parents = p

    def sigma_polys(self, k_is: List[int], subgroup: np.ndarray) -> np.ndarray:
        """(num_routed, degree) sigma values: sigma poly for column c at row
        r = k[neighbor.col] * subgroup[neighbor.row], where neighbor = next
        wire in the partition cycle (reference
        permutation_argument.rs:106-155).  Cycles follow row-major scan
        order within each partition (stable sort by representative)."""
        degree = self.degree
        nw, nr = self.num_wires, self.num_routed_wires
        rows = np.arange(degree, dtype=np.int64)
        slot = (rows[:, None] * nw + np.arange(nr, dtype=np.int64)[None, :])
        reps = self.parents[slot.ravel()]               # scan order
        n = reps.shape[0]

        order = np.argsort(reps, kind="stable")         # groups, scan-sorted
        sorted_reps = reps[order]
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = sorted_reps[1:] != sorted_reps[:-1]
        starts = np.flatnonzero(change)
        nxt_pos = np.arange(1, n + 1, dtype=np.int64)
        ends = np.concatenate([starts[1:] - 1, [n - 1]])
        nxt_pos[ends] = starts                          # wrap cycle

        neighbor = np.empty(n, dtype=np.int64)          # scan id -> scan id
        neighbor[order] = order[nxt_pos]

        k_arr = np.array(k_is, dtype=np.uint64)
        nb_row = neighbor // nr
        nb_col = neighbor % nr
        vals = gl.mul(k_arr[nb_col], subgroup[nb_row])  # scan order
        return vals.reshape(degree, nr).T.copy()
