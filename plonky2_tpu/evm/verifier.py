"""Multi-table verifier: per-table STARK checks with CTL constraints, then
cross-table grand-product consistency (reference evm/src/verifier.rs,
evm/src/get_challenges.rs)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri.challenges import fri_challenges, observe_openings
from ..fri.verifier import verify_fri_proof
from ..iop.challenger import Challenger
from ..plonk.algebra import ScalarExt
from ..stark.permutation import (eval_permutation_checks,
                                 get_n_permutation_challenge_sets)
from ..stark.stark import ConstraintConsumer, StarkEvaluationVars
from .cross_table_lookup import (CrossTableLookup,
                                 ctl_check_vars_per_table,
                                 eval_cross_table_lookup_checks,
                                 get_grand_product_challenge_set,
                                 verify_cross_table_lookups)
from .prover import AllStark, evm_fri_instance
from .proof import AllProof


@dataclass
class SingleTableChallenges:
    permutation_challenge_sets: object
    stark_alphas: List[int]
    stark_zeta: tuple
    fri_challenges: object


def get_all_challenges(all_stark: AllStark, all_proof: AllProof, config):
    ch = Challenger()
    for p in all_proof.stark_proofs:
        ch.observe_cap(p.trace_cap)
    ctl_challenges = get_grand_product_challenge_set(ch, config.num_challenges)

    per_table = []
    for stark, proof, db in zip(all_stark.starks, all_proof.stark_proofs,
                                all_proof.degree_bits):
        ch.compact()
        challenge_sets = None
        if stark.uses_permutation_args():
            challenge_sets = get_n_permutation_challenge_sets(
                ch, config.num_challenges, stark.permutation_batch_size())
        ch.observe_cap(proof.permutation_ctl_zs_cap)
        alphas = ch.get_n_challenges(config.num_challenges)
        ch.observe_cap(proof.quotient_polys_cap)
        zeta = ch.get_extension_challenge()
        observe_openings(ch, proof.openings.to_fri_openings())
        per_table.append(SingleTableChallenges(
            permutation_challenge_sets=challenge_sets,
            stark_alphas=alphas, stark_zeta=zeta,
            fri_challenges=fri_challenges(
                ch, proof.opening_proof.commit_phase_merkle_caps,
                proof.opening_proof.final_poly,
                proof.opening_proof.pow_witness, db, config.fri_config)))
    return ctl_challenges, per_table


class EvmVerificationError(Exception):
    pass


def _ensure(cond, msg):
    if not cond:
        raise EvmVerificationError(msg)


def verify_all_proof(all_stark: AllStark, all_proof: AllProof, config) -> None:
    ctl_challenges, per_table = get_all_challenges(all_stark, all_proof,
                                                   config)

    nums_permutation_zs = [
        (stark.num_permutation_batches(config)
         if stark.uses_permutation_args() else 0)
        for stark in all_stark.starks]
    ctl_vars_per_table = ctl_check_vars_per_table(
        all_proof.stark_proofs, all_stark.cross_table_lookups, ctl_challenges,
        nums_permutation_zs)

    for stark, proof, challenges, ctl_vars, num_perm, db in zip(
            all_stark.starks, all_proof.stark_proofs, per_table,
            ctl_vars_per_table, nums_permutation_zs, all_proof.degree_bits):
        _verify_single_table(stark, proof, challenges, ctl_vars, num_perm,
                             db, config)

    verify_cross_table_lookups(
        all_stark.cross_table_lookups,
        [p.openings.ctl_zs_last for p in all_proof.stark_proofs],
        ctl_challenges, config)


def _verify_single_table(stark, proof, challenges, ctl_vars, num_perm_zs,
                         degree_bits, config) -> None:
    alg = ScalarExt()
    to_ext = lambda arr: [(int(v[0]), int(v[1])) for v in arr]  # noqa: E731
    vars = StarkEvaluationVars(
        local_values=to_ext(proof.openings.local_values),
        next_values=to_ext(proof.openings.next_values),
        public_inputs=[])

    zeta = challenges.stark_zeta
    n = 1 << degree_bits
    g = gl.primitive_root_of_unity(degree_bits)
    z_x = ge.s_sub(ge.s_exp(zeta, n), (1, 0))
    l_0 = ge.s_mul(z_x, ge.s_inv(ge.s_mul((n, 0), ge.s_sub(zeta, (1, 0)))))
    l_last = ge.s_mul(z_x, ge.s_inv(
        ge.s_mul((n, 0), ge.s_sub(ge.s_mul(zeta, (g, 0)), (1, 0)))))
    last = gl.s_inv(g)
    z_last = ge.s_sub(zeta, (last, 0))

    consumer = ConstraintConsumer(
        alg, [alg.const(a) for a in challenges.stark_alphas], z_last, l_0,
        l_last)
    stark.eval(alg, vars, consumer)
    perm_ctl_zs = to_ext(proof.openings.permutation_ctl_zs)
    perm_ctl_zs_next = to_ext(proof.openings.permutation_ctl_zs_next)
    if stark.uses_permutation_args():
        eval_permutation_checks(alg, stark, config, vars,
                                perm_ctl_zs[:num_perm_zs],
                                perm_ctl_zs_next[:num_perm_zs],
                                challenges.permutation_challenge_sets,
                                consumer)
    # CTL openings arrive through ctl_vars in prover order
    from .cross_table_lookup import CtlCheckVars
    scalar_ctl_vars = [
        CtlCheckVars(local_z=v.local_z, next_z=v.next_z,
                     challenge=v.challenge, columns=v.columns,
                     filter_column=v.filter_column) for v in ctl_vars]
    eval_cross_table_lookup_checks(alg, vars, scalar_ctl_vars, consumer)
    vanishing = consumer.accumulators()

    zeta_pow_deg = ge.s_exp(zeta, n)
    z_h_zeta = ge.s_sub(zeta_pow_deg, (1, 0))
    quotient = to_ext(proof.openings.quotient_polys)
    qdf = stark.quotient_degree_factor()
    for i in range(config.num_challenges):
        chunk = quotient[i * qdf:(i + 1) * qdf]
        acc = (0, 0)
        for c in reversed(chunk):
            acc = ge.s_add(ge.s_mul(acc, zeta_pow_deg), c)
        _ensure(vanishing[i] == ge.s_mul(z_h_zeta, acc),
                f"quotient mismatch for challenge {i}")

    num_ctl_zs = len(proof.openings.ctl_zs_last)
    g_inv = pow(g, gl.P - 2, gl.P)
    instance = evm_fri_instance(stark, zeta, g, g_inv, num_perm_zs,
                                num_ctl_zs, config)
    merkle_caps = [proof.trace_cap, proof.permutation_ctl_zs_cap,
                   proof.quotient_polys_cap]
    verify_fri_proof(instance, proof.openings.to_fri_openings(),
                     challenges.fri_challenges, merkle_caps,
                     proof.opening_proof, config.fri_params(degree_bits))
