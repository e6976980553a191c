"""Multi-table STARK prover with cross-table lookups (reference
evm/src/prover.rs).

All tables share one Fiat-Shamir challenger: every trace cap is observed
first, the CTL grand-product challenges are drawn once, then each table runs
its single-table protocol in sequence.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..field import extension as ge
from ..field import fft_numpy as fnp
from ..field import goldilocks as gl
from ..fri.oracle import PolynomialBatch
from ..fri.structure import (FriBatchInfo, FriInstanceInfo, FriOracleInfo,
                             FriPolynomialInfo)
from ..iop.challenger import Challenger
from ..plonk.algebra import NumpyBatch
from ..plonk.proof import eval_polys_ext
from ..stark.permutation import (compute_permutation_z_polys,
                                 eval_permutation_checks,
                                 get_n_permutation_challenge_sets)
from ..stark.stark import ConstraintConsumer, Stark, StarkEvaluationVars
from ..utils.bits import bit_reverse_indices, log2_ceil, log2_strict
from .cross_table_lookup import (CrossTableLookup, CtlCheckVars, CtlData,
                                 cross_table_lookup_data,
                                 eval_cross_table_lookup_checks)
from .proof import AllProof, EvmStarkOpeningSet, EvmStarkProof


@dataclass
class AllStark:
    starks: List[Stark]
    cross_table_lookups: List[CrossTableLookup]

    def num_tables(self) -> int:
        return len(self.starks)


def evm_fri_instance(stark: Stark, zeta, g: int, g_inv: int, num_perm_zs: int,
                     num_ctl_zs: int, config) -> FriInstanceInfo:
    """(reference evm/src/stark.rs:83-143)."""
    num_perm_ctl = num_perm_zs + num_ctl_zs
    oracles = [FriOracleInfo(stark.COLUMNS, False),
               FriOracleInfo(num_perm_ctl, False)]
    trace_info = FriPolynomialInfo.from_range(0, range(stark.COLUMNS))
    perm_ctl_info = FriPolynomialInfo.from_range(1, range(num_perm_ctl))
    ctl_zs_info = FriPolynomialInfo.from_range(
        1, range(num_perm_zs, num_perm_ctl))
    nq = stark.quotient_degree_factor() * config.num_challenges
    quotient_info = FriPolynomialInfo.from_range(2, range(nq))
    oracles.append(FriOracleInfo(nq, False))

    zeta_next = ge.s_mul(zeta, (g, 0))
    return FriInstanceInfo(
        oracles=oracles,
        batches=[
            FriBatchInfo(zeta, trace_info + perm_ctl_info + quotient_info),
            FriBatchInfo(zeta_next, trace_info + perm_ctl_info),
            FriBatchInfo((g_inv, 0), ctl_zs_info),
        ])


def prove_all(all_stark: AllStark, config, traces: List[np.ndarray],
              use_device: bool | None = None) -> AllProof:
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    traces = [np.asarray(t, dtype=np.uint64) for t in traces]

    trace_commitments = [
        PolynomialBatch.from_values(t, rate_bits, False, cap_height,
                                    use_device=use_device) for t in traces]
    challenger = Challenger()
    for c in trace_commitments:
        challenger.observe_cap(c.merkle_tree.cap)

    ctl_data_per_table, _ = cross_table_lookup_data(
        config, traces, all_stark.cross_table_lookups, challenger)

    proofs = []
    degree_bits = []
    for stark, trace, commitment, ctl_data in zip(
            all_stark.starks, traces, trace_commitments, ctl_data_per_table):
        proofs.append(prove_single_table(
            stark, config, trace, commitment, ctl_data, challenger,
            use_device=use_device))
        degree_bits.append(log2_strict(trace.shape[1]))
    return AllProof(stark_proofs=proofs, degree_bits=degree_bits)


def prove_single_table(stark: Stark, config, trace: np.ndarray,
                       trace_commitment: PolynomialBatch, ctl_data: CtlData,
                       challenger: Challenger,
                       use_device: bool | None = None) -> EvmStarkProof:
    """(reference evm/src/prover.rs:245-430)."""
    degree = trace.shape[1]
    degree_bits = log2_strict(degree)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    fri_params = config.fri_params(degree_bits)

    challenger.compact()

    challenge_sets = None
    z_polys_list = []
    if stark.uses_permutation_args():
        challenge_sets = get_n_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        z_polys_list.append(compute_permutation_z_polys(stark, config, trace,
                                                        challenge_sets))
    num_perm_zs = z_polys_list[0].shape[0] if z_polys_list else 0
    ctl_polys = np.stack(ctl_data.z_polys()) if ctl_data.zs_columns else \
        np.zeros((0, degree), dtype=np.uint64)
    num_ctl_zs = ctl_polys.shape[0]
    perm_ctl_polys = np.concatenate(z_polys_list + [ctl_polys], axis=0) \
        if (z_polys_list or num_ctl_zs) else ctl_polys
    assert perm_ctl_polys.shape[0] > 0, \
        "table has neither permutation nor CTL polynomials"

    perm_ctl_commitment = PolynomialBatch.from_values(
        perm_ctl_polys, rate_bits, False, cap_height, use_device=use_device)
    challenger.observe_cap(perm_ctl_commitment.merkle_tree.cap)
    alphas = challenger.get_n_challenges(config.num_challenges)

    quotient_polys = _compute_quotient_polys(
        stark, config, trace_commitment, perm_ctl_commitment, num_perm_zs,
        challenge_sets, ctl_data, alphas, degree_bits)
    qdf = stark.quotient_degree_factor()
    chunks = quotient_polys.reshape(config.num_challenges * qdf, degree)
    quotient_commitment = PolynomialBatch.from_coeffs(
        chunks, rate_bits, False, cap_height, use_device=use_device)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    zeta = challenger.get_extension_challenge()
    assert ge.s_exp(zeta, degree) != (1, 0), "Opening point is in the subgroup."
    g = gl.primitive_root_of_unity(degree_bits)
    g_inv = pow(g, gl.P - 2, gl.P)
    zeta_next = ge.s_mul(zeta, (g, 0))

    ctl_zs_last = [
        int(_eval_poly_base(perm_ctl_commitment.polynomials[j], g_inv))
        for j in range(num_perm_zs, num_perm_zs + num_ctl_zs)]
    openings = EvmStarkOpeningSet(
        local_values=eval_polys_ext(trace_commitment.polynomials, zeta),
        next_values=eval_polys_ext(trace_commitment.polynomials, zeta_next),
        permutation_ctl_zs=eval_polys_ext(perm_ctl_commitment.polynomials,
                                          zeta),
        permutation_ctl_zs_next=eval_polys_ext(perm_ctl_commitment.polynomials,
                                               zeta_next),
        ctl_zs_last=ctl_zs_last,
        quotient_polys=eval_polys_ext(quotient_commitment.polynomials, zeta))

    from ..fri.challenges import observe_openings
    observe_openings(challenger, openings.to_fri_openings())

    instance = evm_fri_instance(stark, zeta, g, g_inv, num_perm_zs,
                                num_ctl_zs, config)
    opening_proof = PolynomialBatch.prove_openings(
        instance, [trace_commitment, perm_ctl_commitment,
                   quotient_commitment], challenger, fri_params)

    return EvmStarkProof(
        trace_cap=trace_commitment.merkle_tree.cap,
        permutation_ctl_zs_cap=perm_ctl_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings, opening_proof=opening_proof)


def _eval_poly_base(coeffs: np.ndarray, x: int) -> int:
    acc = 0
    for c in coeffs[::-1]:
        acc = (acc * x + int(c)) % gl.P
    return acc


def _compute_quotient_polys(stark, config, trace_commitment,
                            perm_ctl_commitment, num_perm_zs, challenge_sets,
                            ctl_data: CtlData, alphas, degree_bits):
    """stark + permutation + CTL constraints over the quotient coset
    (reference evm/src/prover.rs:433-560)."""
    degree = 1 << degree_bits
    rate_bits = config.fri_config.rate_bits
    qdb = log2_ceil(stark.quotient_degree_factor())
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb
    size = degree << qdb

    full_bits = degree_bits + rate_bits
    perm = bit_reverse_indices(1 << full_bits)
    idx = np.arange(size, dtype=np.int64) * step

    def natural_rows(batch):
        return batch.leaves[perm[idx]]

    trace_rows = natural_rows(trace_commitment)
    trace_next = np.roll(trace_rows, -next_step, axis=0)
    zs_rows = natural_rows(perm_ctl_commitment)
    zs_next = np.roll(zs_rows, -next_step, axis=0)

    def selector_on_coset(pos_i):
        onehot = np.zeros(degree, dtype=np.uint64)
        onehot[pos_i] = 1
        return fnp.coset_fft(fnp.lde(fnp.ifft(onehot), qdb))

    lagrange_first = selector_on_coset(0)
    lagrange_last = selector_on_coset(degree - 1)

    g = gl.primitive_root_of_unity(degree_bits)
    last = gl.s_inv(g)
    coset = gl.mul(np.uint64(gl.coset_shift()),
                   gl.two_adic_subgroup(degree_bits + qdb))
    z_last = gl.sub(coset, np.uint64(last))

    g_pow_n = pow(gl.coset_shift(), degree, gl.P)
    v = gl.two_adic_subgroup(qdb)
    zh_inv = gl.inverse(gl.sub(gl.mul(np.uint64(g_pow_n), v), np.uint64(1)))
    zh_inv_tiled = np.tile(zh_inv, size // zh_inv.shape[0])

    alg = NumpyBatch()
    consumer = ConstraintConsumer(alg, [alg.const(a) for a in alphas], z_last,
                                  lagrange_first, lagrange_last)
    vars = StarkEvaluationVars(
        local_values=[trace_rows[:, j] for j in range(stark.COLUMNS)],
        next_values=[trace_next[:, j] for j in range(stark.COLUMNS)],
        public_inputs=[])
    stark.eval(alg, vars, consumer)

    if stark.uses_permutation_args():
        eval_permutation_checks(
            alg, stark, config, vars,
            [zs_rows[:, j] for j in range(num_perm_zs)],
            [zs_next[:, j] for j in range(num_perm_zs)],
            challenge_sets, consumer)

    ctl_vars = [
        CtlCheckVars(local_z=zs_rows[:, num_perm_zs + j],
                     next_z=zs_next[:, num_perm_zs + j],
                     challenge=zc.challenge, columns=zc.columns,
                     filter_column=zc.filter_column)
        for j, zc in enumerate(ctl_data.zs_columns)]
    eval_cross_table_lookup_checks(alg, vars, ctl_vars, consumer)

    out = []
    for acc in consumer.accumulators():
        q_values = gl.mul(np.broadcast_to(np.asarray(acc, dtype=np.uint64),
                                          (size,)), zh_inv_tiled)
        out.append(fnp.coset_ifft(q_values))
    return np.stack(out)
