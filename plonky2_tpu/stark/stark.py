"""Stark base class + constraint consumer, algebra-generic
(reference starky/src/stark.rs, constraint_consumer.rs, vars.rs).

A Stark subclass defines its transition/boundary constraints ONCE via
``eval(alg, vars, consumer)``; the same code runs vectorized over the
quotient coset (numpy/JAX base field) and at zeta (scalar extension)."""
from __future__ import annotations

from typing import List, Optional, Tuple

from ..fri.structure import (FriBatchInfo, FriInstanceInfo, FriOracleInfo,
                             FriPolynomialInfo)
from ..field import extension as ge
from ..field import goldilocks as gl


class StarkEvaluationVars:
    def __init__(self, local_values, next_values, public_inputs):
        self.local_values = local_values
        self.next_values = next_values
        self.public_inputs = public_inputs


class PermutationPair:
    def __init__(self, column_pairs: List[Tuple[int, int]]):
        self.column_pairs = column_pairs

    @staticmethod
    def singletons(lhs: int, rhs: int) -> "PermutationPair":
        return PermutationPair([(lhs, rhs)])


class ConstraintConsumer:
    """alpha-accumulating consumer (reference constraint_consumer.rs:12-77)."""

    def __init__(self, alg, alphas, z_last, lagrange_basis_first,
                 lagrange_basis_last):
        self.alg = alg
        self.alphas = alphas
        self.accs = [alg.zero() for _ in alphas]
        self.z_last = z_last
        self.lagrange_basis_first = lagrange_basis_first
        self.lagrange_basis_last = lagrange_basis_last

    def accumulators(self):
        return self.accs

    def constraint(self, c):
        for i, alpha in enumerate(self.alphas):
            self.accs[i] = self.alg.add(self.alg.mul(self.accs[i], alpha), c)

    def constraint_transition(self, c):
        self.constraint(self.alg.mul(c, self.z_last))

    def constraint_first_row(self, c):
        self.constraint(self.alg.mul(c, self.lagrange_basis_first))

    def constraint_last_row(self, c):
        self.constraint(self.alg.mul(c, self.lagrange_basis_last))


class Stark:
    COLUMNS: int = 0
    PUBLIC_INPUTS: int = 0

    def eval(self, alg, vars: StarkEvaluationVars,
             yield_constr: ConstraintConsumer) -> None:
        raise NotImplementedError

    def constraint_degree(self) -> int:
        raise NotImplementedError

    def quotient_degree_factor(self) -> int:
        return max(1, self.constraint_degree() - 1)

    def num_quotient_polys(self, config) -> int:
        return self.quotient_degree_factor() * config.num_challenges

    def permutation_pairs(self) -> List[PermutationPair]:
        return []

    def uses_permutation_args(self) -> bool:
        return bool(self.permutation_pairs())

    def permutation_batch_size(self) -> int:
        return self.quotient_degree_factor()

    def num_permutation_instances(self, config) -> int:
        return len(self.permutation_pairs()) * config.num_challenges

    def num_permutation_batches(self, config) -> int:
        return -(-self.num_permutation_instances(config)
                 // self.permutation_batch_size())

    def fri_instance(self, zeta, g: int, config) -> FriInstanceInfo:
        """(reference stark.rs:88-137)."""
        oracles = []
        trace_info = FriPolynomialInfo.from_range(0, range(self.COLUMNS))
        oracles.append(FriOracleInfo(self.COLUMNS, False))
        if self.uses_permutation_args():
            nz = self.num_permutation_batches(config)
            perm_info = FriPolynomialInfo.from_range(len(oracles), range(nz))
            oracles.append(FriOracleInfo(nz, False))
        else:
            perm_info = []
        nq = self.quotient_degree_factor() * config.num_challenges
        quot_info = FriPolynomialInfo.from_range(len(oracles), range(nq))
        oracles.append(FriOracleInfo(nq, False))

        zeta_next = ge.s_mul(zeta, (g, 0))
        return FriInstanceInfo(
            oracles=oracles,
            batches=[FriBatchInfo(zeta, trace_info + perm_info + quot_info),
                     FriBatchInfo(zeta_next, trace_info + perm_info)])
