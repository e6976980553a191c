"""STARK prover (reference starky/src/prover.rs)."""
from __future__ import annotations

import numpy as np

from ..field import extension as ge
from ..field import fft_numpy as fnp
from ..field import goldilocks as gl
from ..fri.oracle import PolynomialBatch
from ..iop.challenger import Challenger
from ..plonk.algebra import NumpyBatch
from ..utils.bits import bit_reverse_indices, log2_ceil, log2_strict
from .permutation import (compute_permutation_z_polys, eval_permutation_checks,
                          get_n_permutation_challenge_sets)
from .proof import (StarkOpeningSet, StarkProof, StarkProofWithPublicInputs)
from .stark import ConstraintConsumer, Stark, StarkEvaluationVars


def prove(stark: Stark, config, trace: np.ndarray, public_inputs,
          use_device: bool | None = None) -> StarkProofWithPublicInputs:
    """trace: (COLUMNS, degree) values; public_inputs: list of ints."""
    trace = np.asarray(trace, dtype=np.uint64)
    assert trace.shape[0] == stark.COLUMNS
    assert len(public_inputs) == stark.PUBLIC_INPUTS
    degree = trace.shape[1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height

    trace_commitment = PolynomialBatch.from_values(
        trace, rate_bits, False, cap_height, use_device=use_device)
    challenger = Challenger()
    challenger.observe_cap(trace_commitment.merkle_tree.cap)

    permutation_zs_commitment = None
    challenge_sets = None
    if stark.uses_permutation_args():
        challenge_sets = get_n_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        z_polys = compute_permutation_z_polys(stark, config, trace,
                                              challenge_sets)
        permutation_zs_commitment = PolynomialBatch.from_values(
            z_polys, rate_bits, False, cap_height, use_device=use_device)
        challenger.observe_cap(permutation_zs_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(config.num_challenges)

    quotient_polys = _compute_quotient_polys(
        stark, config, trace_commitment, permutation_zs_commitment,
        challenge_sets, public_inputs, alphas, degree_bits)
    qdf = stark.quotient_degree_factor()
    chunks = quotient_polys.reshape(config.num_challenges * qdf, degree)
    quotient_commitment = PolynomialBatch.from_coeffs(
        chunks, rate_bits, False, cap_height, use_device=use_device)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    zeta = challenger.get_extension_challenge()
    assert ge.s_exp(zeta, degree) != (1, 0), "Opening point is in the subgroup."
    g = gl.primitive_root_of_unity(degree_bits)
    openings = StarkOpeningSet.new(zeta, g, trace_commitment,
                                   permutation_zs_commitment,
                                   quotient_commitment)
    from ..fri.challenges import observe_openings
    observe_openings(challenger, openings.to_fri_openings())

    oracles = [trace_commitment]
    if permutation_zs_commitment is not None:
        oracles.append(permutation_zs_commitment)
    oracles.append(quotient_commitment)

    opening_proof = PolynomialBatch.prove_openings(
        stark.fri_instance(zeta, g, config), oracles, challenger, fri_params)

    return StarkProofWithPublicInputs(
        proof=StarkProof(
            trace_cap=trace_commitment.merkle_tree.cap,
            permutation_zs_cap=(permutation_zs_commitment.merkle_tree.cap
                                if permutation_zs_commitment else None),
            quotient_polys_cap=quotient_commitment.merkle_tree.cap,
            openings=openings,
            opening_proof=opening_proof),
        public_inputs=list(public_inputs))


def _compute_quotient_polys(stark, config, trace_commitment,
                            permutation_zs_commitment, challenge_sets,
                            public_inputs, alphas, degree_bits) -> np.ndarray:
    """Vectorized over the whole quotient coset (reference prover.rs:200-310)."""
    degree = 1 << degree_bits
    rate_bits = config.fri_config.rate_bits
    qdb = log2_ceil(stark.quotient_degree_factor())
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb
    size = degree << qdb

    # natural-order rows at stride `step`
    full_bits = degree_bits + rate_bits
    perm = bit_reverse_indices(1 << full_bits)
    idx = np.arange(size, dtype=np.int64) * step

    def natural_rows(batch):
        return batch.leaves[perm[idx]]

    trace_rows = natural_rows(trace_commitment)          # (size, COLUMNS)
    trace_next = np.roll(trace_rows, -next_step, axis=0)

    # lagrange selectors on the coset
    def selector_on_coset(pos_i):
        onehot = np.zeros(degree, dtype=np.uint64)
        onehot[pos_i] = 1
        coeffs = fnp.ifft(onehot)
        return fnp.coset_fft(fnp.lde(coeffs, qdb))

    lagrange_first = selector_on_coset(0)
    lagrange_last = selector_on_coset(degree - 1)

    g = gl.primitive_root_of_unity(degree_bits)
    last = gl.s_inv(g)
    coset = gl.mul(np.uint64(gl.coset_shift()),
                   gl.two_adic_subgroup(degree_bits + qdb))
    z_last = gl.sub(coset, np.uint64(last))

    # Z_H on coset
    g_pow_n = pow(gl.coset_shift(), degree, gl.P)
    v = gl.two_adic_subgroup(qdb)
    zh_inv = gl.inverse(gl.sub(gl.mul(np.uint64(g_pow_n), v), np.uint64(1)))
    zh_inv_tiled = np.tile(zh_inv, size // zh_inv.shape[0])

    alg = NumpyBatch()
    consumer = ConstraintConsumer(
        alg, [alg.const(a) for a in alphas], z_last, lagrange_first,
        lagrange_last)
    vars = StarkEvaluationVars(
        local_values=[trace_rows[:, j] for j in range(stark.COLUMNS)],
        next_values=[trace_next[:, j] for j in range(stark.COLUMNS)],
        public_inputs=[alg.const(int(p)) for p in public_inputs])
    stark.eval(alg, vars, consumer)

    if stark.uses_permutation_args():
        zs_rows = natural_rows(permutation_zs_commitment)
        zs_next = np.roll(zs_rows, -next_step, axis=0)
        eval_permutation_checks(
            alg, stark, config, vars,
            [zs_rows[:, j] for j in range(zs_rows.shape[1])],
            [zs_next[:, j] for j in range(zs_next.shape[1])],
            challenge_sets, consumer)

    out = []
    for acc in consumer.accumulators():
        q_values = gl.mul(np.broadcast_to(np.asarray(acc, dtype=np.uint64),
                                          (size,)), zh_inv_tiled)
        out.append(fnp.coset_ifft(q_values))
    return np.stack(out)  # (num_challenges, qdf*degree)
