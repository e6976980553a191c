"""Cross-table lookups: prove that filtered rows of "looking" tables form a
permutation of (a multiset drawn from) a "looked" table, via grand products
over randomized column combinations (reference evm/src/cross_table_lookup.rs,
evm/src/permutation.rs:54-112).

Unlike the reference, the table set is dynamic (a list index rather than a
hardcoded five-table enum).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..field import goldilocks as gl
from ..iop.challenger import Challenger


@dataclass(frozen=True)
class GrandProductChallenge:
    beta: int
    gamma: int

    def combine_ints(self, terms) -> int:
        acc = 0
        for t in reversed(list(terms)):
            acc = (acc * self.beta + t) % gl.P
        return (acc + self.gamma) % gl.P


@dataclass
class GrandProductChallengeSet:
    challenges: List[GrandProductChallenge]


def get_grand_product_challenge_set(challenger: Challenger,
                                    num_challenges: int) -> GrandProductChallengeSet:
    out = []
    for _ in range(num_challenges):
        beta = challenger.get_challenge()
        gamma = challenger.get_challenge()
        out.append(GrandProductChallenge(beta, gamma))
    return GrandProductChallengeSet(out)


class Column:
    """Linear combination of a table's columns plus a constant
    (reference cross_table_lookup.rs:27-142)."""

    def __init__(self, linear_combination: List[Tuple[int, int]], constant: int = 0):
        self.linear_combination = list(linear_combination)
        self.constant = constant % gl.P

    @staticmethod
    def single(c: int) -> "Column":
        return Column([(c, 1)])

    @staticmethod
    def singles(cs) -> List["Column"]:
        return [Column.single(c) for c in cs]

    @staticmethod
    def constant_col(constant: int) -> "Column":
        return Column([], constant)

    @staticmethod
    def zero() -> "Column":
        return Column.constant_col(0)

    @staticmethod
    def le_bits(cs) -> "Column":
        return Column([(c, 1 << i) for i, c in enumerate(cs)])

    @staticmethod
    def le_bytes(cs) -> "Column":
        return Column([(c, pow(256, i, gl.P)) for i, c in enumerate(cs)])

    @staticmethod
    def sum_cols(cs) -> "Column":
        return Column([(c, 1) for c in cs])

    def eval_alg(self, alg, v):
        acc = alg.const(self.constant)
        for c, f in self.linear_combination:
            acc = alg.add(acc, alg.mul_const(v[c], f))
        return acc

    def eval_table(self, trace: np.ndarray) -> np.ndarray:
        """trace: (COLUMNS, n) -> (n,) values of this combination."""
        n = trace.shape[1]
        acc = np.full(n, self.constant, dtype=np.uint64)
        for c, f in self.linear_combination:
            acc = gl.add(acc, gl.mul(trace[c], np.uint64(f % gl.P)))
        return acc


@dataclass
class TableWithColumns:
    table: int                       # index into the table list
    columns: List[Column]
    filter_column: Optional[Column]


@dataclass
class CrossTableLookup:
    looking_tables: List[TableWithColumns]
    looked_table: TableWithColumns
    default: Optional[List[int]] = None

    def __post_init__(self):
        assert all(len(t.columns) == len(self.looked_table.columns)
                   for t in self.looking_tables)

    @staticmethod
    def num_ctl_zs(ctls, table: int, num_challenges: int) -> int:
        count = 0
        for ctl in ctls:
            for twc in [ctl.looked_table] + list(ctl.looking_tables):
                if twc.table == table:
                    count += 1
        return count * num_challenges


@dataclass
class CtlZData:
    z: np.ndarray                    # (n,) grand-product values
    challenge: GrandProductChallenge
    columns: List[Column]
    filter_column: Optional[Column]


@dataclass
class CtlData:
    zs_columns: List[CtlZData] = field(default_factory=list)

    def z_polys(self) -> List[np.ndarray]:
        return [zc.z for zc in self.zs_columns]


def _partial_products(trace: np.ndarray, columns: List[Column],
                      filter_column: Optional[Column],
                      challenge: GrandProductChallenge) -> np.ndarray:
    """Running product of the randomized row combination over filtered rows
    (reference cross_table_lookup.rs:314-341), vectorized."""
    n = trace.shape[1]
    if filter_column is not None:
        filt = filter_column.eval_table(trace)
        assert np.all((filt == 0) | (filt == 1)), "Non-binary filter?"
    else:
        filt = np.ones(n, dtype=np.uint64)

    acc = np.full(n, challenge.gamma, dtype=np.uint64)
    weight = 1
    for col in columns:
        vals = col.eval_table(trace)
        acc = gl.add(acc, gl.mul(vals, np.uint64(weight)))
        weight = weight * challenge.beta % gl.P
    # rows with filter 0 contribute a factor of 1
    factors = np.where(filt == 1, acc, np.uint64(1))
    return gl.prefix_prod_inclusive(factors)


def cross_table_lookup_data(config, traces: List[np.ndarray],
                            cross_table_lookups: List[CrossTableLookup],
                            challenger: Challenger
                            ) -> Tuple[List[CtlData], GrandProductChallengeSet]:
    """(reference cross_table_lookup.rs:237-312)."""
    challenges = get_grand_product_challenge_set(challenger,
                                                 config.num_challenges)
    ctl_data_per_table = [CtlData() for _ in traces]
    for ctl in cross_table_lookups:
        for challenge in challenges.challenges:
            zs_looking = [
                _partial_products(traces[t.table], t.columns, t.filter_column,
                                  challenge)
                for t in ctl.looking_tables]
            z_looked = _partial_products(traces[ctl.looked_table.table],
                                         ctl.looked_table.columns,
                                         ctl.looked_table.filter_column,
                                         challenge)
            # sanity: products must match (up to padding via `default`)
            prod_looking = 1
            for z in zs_looking:
                prod_looking = prod_looking * int(z[-1]) % gl.P
            expected = int(z_looked[-1])
            if ctl.default is not None:
                extra = (sum(traces[t.table].shape[1]
                             for t in ctl.looking_tables)
                         - traces[ctl.looked_table.table].shape[1])
                expected = expected * pow(
                    challenge.combine_ints(ctl.default), extra, gl.P) % gl.P
            assert prod_looking == expected, "CTL grand products don't match"

            for t, z in zip(ctl.looking_tables, zs_looking):
                ctl_data_per_table[t.table].zs_columns.append(
                    CtlZData(z, challenge, t.columns, t.filter_column))
            lt = ctl.looked_table
            ctl_data_per_table[lt.table].zs_columns.append(
                CtlZData(z_looked, challenge, lt.columns, lt.filter_column))
    return ctl_data_per_table, challenges


@dataclass
class CtlCheckVars:
    local_z: object
    next_z: object
    challenge: GrandProductChallenge
    columns: List[Column]
    filter_column: Optional[Column]


def ctl_check_vars_per_table(proofs, cross_table_lookups,
                             ctl_challenges: GrandProductChallengeSet,
                             nums_permutation_zs: List[int]) -> List[List[CtlCheckVars]]:
    """Collect each table's CTL z openings in prover order
    (reference cross_table_lookup.rs:360-407)."""
    iters = []
    for p, num_perms in zip(proofs, nums_permutation_zs):
        # plain python ints: these feed the scalar extension-field ops
        zs = [(int(x[0]), int(x[1]))
              for x in p.openings.permutation_ctl_zs[num_perms:]]
        zs_next = [(int(x[0]), int(x[1]))
                   for x in p.openings.permutation_ctl_zs_next[num_perms:]]
        iters.append(iter(list(zip(zs, zs_next))))

    out = [[] for _ in proofs]
    for ctl in cross_table_lookups:
        for challenge in ctl_challenges.challenges:
            for t in ctl.looking_tables:
                z, z_next = next(iters[t.table])
                out[t.table].append(CtlCheckVars(z, z_next, challenge,
                                                 t.columns, t.filter_column))
            lt = ctl.looked_table
            z, z_next = next(iters[lt.table])
            out[lt.table].append(CtlCheckVars(z, z_next, challenge,
                                              lt.columns, lt.filter_column))
    return out


def eval_cross_table_lookup_checks(alg, vars, ctl_vars: List[CtlCheckVars],
                                   consumer) -> None:
    """(reference cross_table_lookup.rs:410-451)."""
    one = alg.one()
    for lv in ctl_vars:
        def combine(values):
            evals = [c.eval_alg(alg, values) for c in lv.columns]
            acc = alg.zero()
            for e in reversed(evals):
                acc = alg.add(alg.mul_const(acc, lv.challenge.beta), e)
            return alg.add_const(acc, lv.challenge.gamma)

        def filt(values):
            if lv.filter_column is not None:
                return lv.filter_column.eval_alg(alg, values)
            return one

        def select(f, x):
            return alg.add(alg.mul(f, x), alg.sub(one, f))

        local_filter = filt(vars.local_values)
        next_filter = filt(vars.next_values)
        # z values arrive as algebra values (coset arrays for the prover,
        # extension scalars for the verifier)
        local_z = lv.local_z
        next_z = lv.next_z
        consumer.constraint_first_row(
            alg.sub(local_z, select(local_filter, combine(vars.local_values))))
        consumer.constraint_transition(
            alg.sub(next_z,
                    alg.mul(local_z,
                            select(next_filter, combine(vars.next_values)))))


def verify_cross_table_lookups(cross_table_lookups, ctl_zs_lasts,
                               challenges: GrandProductChallengeSet,
                               config) -> None:
    """Check the grand products agree across tables
    (reference cross_table_lookup.rs:580-628)."""
    iters = [iter(v) for v in ctl_zs_lasts]
    for ctl in cross_table_lookups:
        for challenge in challenges.challenges:
            prod_looking = 1
            for t in ctl.looking_tables:
                prod_looking = prod_looking * next(iters[t.table]) % gl.P
            looked_z = next(iters[ctl.looked_table.table])
            expected = looked_z
            if ctl.default is not None:
                # padding rows of the looking tables contribute default combos
                raise NotImplementedError(
                    "defaults require table degrees; use filter columns")
            assert prod_looking == expected % gl.P, \
                "Cross-table lookup verification failed."
