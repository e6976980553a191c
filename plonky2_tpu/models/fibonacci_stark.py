"""Fibonacci STARK example (reference starky/src/fibonacci_stark.rs)."""
from __future__ import annotations

import numpy as np

from ..field import goldilocks as gl
from ..stark.stark import PermutationPair, Stark, StarkEvaluationVars


class FibonacciStark(Stark):
    """Columns: x0, x1, i, aux; PIs: x0, x1, result."""

    COLUMNS = 4
    PUBLIC_INPUTS = 3
    PI_INDEX_X0 = 0
    PI_INDEX_X1 = 1
    PI_INDEX_RES = 2

    def __init__(self, num_rows: int):
        self.num_rows = num_rows

    def generate_trace(self, x0: int, x1: int) -> np.ndarray:
        """(COLUMNS, num_rows) trace values."""
        rows = np.zeros((self.num_rows, 4), dtype=np.uint64)
        acc = [x0, x1, 0, 1]
        for r in range(self.num_rows):
            rows[r] = acc
            acc = [acc[1], (acc[0] + acc[1]) % gl.P, acc[2] + 1, acc[3] + 1]
        rows[self.num_rows - 1, 3] = 0  # make cols 2,3 a permutation pair
        return rows.T.copy()

    def expected_result(self, x0: int, x1: int) -> int:
        a, b = x0, x1
        for _ in range(self.num_rows - 1):
            a, b = b, (a + b) % gl.P
        return b

    def eval(self, alg, vars: StarkEvaluationVars, yield_constr) -> None:
        yield_constr.constraint_first_row(
            alg.sub(vars.local_values[0], vars.public_inputs[self.PI_INDEX_X0]))
        yield_constr.constraint_first_row(
            alg.sub(vars.local_values[1], vars.public_inputs[self.PI_INDEX_X1]))
        yield_constr.constraint_last_row(
            alg.sub(vars.local_values[1], vars.public_inputs[self.PI_INDEX_RES]))
        yield_constr.constraint_transition(
            alg.sub(vars.next_values[0], vars.local_values[1]))
        yield_constr.constraint_transition(
            alg.sub(vars.next_values[1],
                    alg.add(vars.local_values[0], vars.local_values[1])))

    def constraint_degree(self) -> int:
        return 2

    def permutation_pairs(self):
        return [PermutationPair.singletons(2, 3)]
