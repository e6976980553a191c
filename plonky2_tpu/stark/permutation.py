"""STARK permutation argument (reference starky/src/permutation.rs)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..field import goldilocks as gl
from ..iop.challenger import Challenger


@dataclass(frozen=True)
class PermutationChallenge:
    beta: int
    gamma: int


@dataclass
class PermutationChallengeSet:
    challenges: List[PermutationChallenge]


def get_n_permutation_challenge_sets(challenger: Challenger, num_challenges: int,
                                     num_sets: int) -> List[PermutationChallengeSet]:
    out = []
    for _ in range(num_sets):
        chs = []
        for _ in range(num_challenges):
            beta = challenger.get_challenge()
            gamma = challenger.get_challenge()
            chs.append(PermutationChallenge(beta, gamma))
        out.append(PermutationChallengeSet(chs))
    return out


def get_permutation_batches(permutation_pairs, challenge_sets,
                            num_challenges: int, batch_size: int):
    """List of batches of (pair, challenge) instances; instance i within a
    batch uses challenge_sets[i] (reference permutation.rs:207-230)."""
    instances = [(pair, chal) for pair in permutation_pairs
                 for chal in range(num_challenges)]
    batches = []
    for start in range(0, len(instances), batch_size):
        chunk = instances[start:start + batch_size]
        batches.append([
            (pair, challenge_sets[i].challenges[chal])
            for i, (pair, chal) in enumerate(chunk)])
    return batches


def compute_permutation_z_polys(stark, config, trace: np.ndarray,
                                challenge_sets) -> np.ndarray:
    """trace: (COLUMNS, degree). Returns (num_batches, degree) Z polys."""
    batches = get_permutation_batches(stark.permutation_pairs(), challenge_sets,
                                      config.num_challenges,
                                      stark.permutation_batch_size())
    degree = trace.shape[1]
    out = []
    for instances in batches:
        numerator = np.ones(degree, dtype=np.uint64)
        denominator = np.ones(degree, dtype=np.uint64)
        for pair, ch in instances:
            lhs = np.full(degree, ch.gamma, dtype=np.uint64)
            rhs = np.full(degree, ch.gamma, dtype=np.uint64)
            weight = np.uint64(1)
            for (li, ri) in pair.column_pairs:
                lhs = gl.add(lhs, gl.mul(trace[li], weight))
                rhs = gl.add(rhs, gl.mul(trace[ri], weight))
                weight = gl.mul(weight, np.uint64(ch.beta))
            numerator = gl.mul(numerator, lhs)
            denominator = gl.mul(denominator, rhs)
        quot = gl.mul(numerator, gl.inverse(denominator))
        out.append(gl.prefix_prod_exclusive(quot))
    return np.stack(out)


def eval_permutation_checks(alg, stark, config, vars, local_zs, next_zs,
                            challenge_sets, consumer) -> None:
    """(reference permutation.rs:263-320)."""
    one = alg.one()
    for z in local_zs:
        consumer.constraint_first_row(alg.sub(z, one))
    batches = get_permutation_batches(stark.permutation_pairs(), challenge_sets,
                                      config.num_challenges,
                                      stark.permutation_batch_size())
    for i, instances in enumerate(batches):
        lhs_prod = None
        rhs_prod = None
        for pair, ch in instances:
            lhs = alg.const(ch.gamma)
            rhs = alg.const(ch.gamma)
            weight = 1
            for (li, ri) in pair.column_pairs:
                lhs = alg.add(lhs, alg.mul_const(vars.local_values[li], weight))
                rhs = alg.add(rhs, alg.mul_const(vars.local_values[ri], weight))
                weight = (weight * ch.beta) % gl.P
            lhs_prod = lhs if lhs_prod is None else alg.mul(lhs_prod, lhs)
            rhs_prod = rhs if rhs_prod is None else alg.mul(rhs_prod, rhs)
        constraint = alg.sub(alg.mul(next_zs[i], rhs_prod),
                             alg.mul(local_zs[i], lhs_prod))
        consumer.constraint(constraint)
