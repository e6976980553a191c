"""PLONK prover (reference plonky2/src/plonk/prover.rs).

Protocol flow is host-side; the three batched commitments run the fused
device pipeline (ops/commit.py), and the quotient evaluation is fully
vectorized over the entire coset domain via the algebra protocol — numpy now,
JaxBatch drop-in for TPU execution.
"""
from __future__ import annotations

import functools
from typing import List

import numpy as np

from ..field import extension as ge
from ..field import fft_numpy as fnp
from ..field import goldilocks as gl
from ..fri.oracle import PolynomialBatch
from ..hash import poseidon as pos
from ..iop.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..iop.witness import PartialWitness
from ..utils.bits import bit_reverse_indices, log2_ceil
from .algebra import EvaluationVars, NumpyBatch
from .circuit_data import CommonCircuitData, ProverOnlyCircuitData
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import eval_vanishing_poly


def prove(prover_data: ProverOnlyCircuitData, common_data: CommonCircuitData,
          inputs: PartialWitness, use_device: bool | None = None,
          timing=None, session=None) -> ProofWithPublicInputs:
    from ..utils.timing import NoopTimingTree
    timing = timing if timing is not None else NoopTimingTree()
    if use_device is None:
        from ..fri.oracle import _auto_device
        use_device = _auto_device()
    config = common_data.config
    num_challenges = config.num_challenges
    quotient_degree = common_data.quotient_degree()
    degree = common_data.degree()
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    zk = config.zero_knowledge
    gc = common_data.hasher()

    wires_pair = None
    plan = None
    if use_device and gc.algebraic:
        from ..iop.device_witness import get_plan
        plan = get_plan(prover_data, common_data, inputs)
    if plan is not None:
        # the full generator fixpoint runs ON DEVICE as one jitted program
        # (iop/device_witness.py) — only the input values cross the wire
        import jax

        from ..iop.device_witness import _PlanMismatch
        with timing.scope("device witness"):
            try:
                wires_pair, public_inputs = plan.run(inputs)
            except _PlanMismatch:
                from ..iop.device_witness import get_plan as _gp
                plan = _gp(prover_data, common_data, inputs, rebuild=True)
                wires_pair, public_inputs = plan.run(inputs)
            jax.block_until_ready(wires_pair)
        public_inputs_hash = pos.hash_no_pad(
            np.array(public_inputs, dtype=np.uint64))
    elif use_device and gc.algebraic:
        with timing.scope("run generators"):
            partition_witness = generate_partial_witness(inputs, prover_data,
                                                         common_data)
        public_inputs = partition_witness.get_targets(prover_data.public_inputs)
        public_inputs_hash = pos.hash_no_pad(
            np.array(public_inputs, dtype=np.uint64))
        # upload the witness ONCE (in the union-find's row-major order, no
        # host transpose) and transpose on chip; both the wires commitment
        # and the device partial-products program read the result
        import jax

        from ..field import gf_jax as gf
        from ..runtime.meshctx import put_pair
        with timing.scope("materialize witness matrix"):
            witness_rm = partition_witness.full_witness_rowmajor()
        with timing.scope("split witness limbs"):
            limbs = gf.from_u64(witness_rm)
        with timing.scope("upload witness"):
            # the row-major upload is donated to the transpose so its HBM
            # is reusable immediately (keeping it alive cost ~0.5 GB and
            # tipped flagship proofs over the 16 GB chip)
            wires_pair = _transpose_pair(*put_pair(limbs, axis=0))
            del limbs, witness_rm
            jax.block_until_ready(wires_pair)
    else:
        with timing.scope("run generators"):
            partition_witness = generate_partial_witness(inputs, prover_data,
                                                         common_data)
        public_inputs = partition_witness.get_targets(prover_data.public_inputs)
        public_inputs_hash = pos.hash_no_pad(
            np.array(public_inputs, dtype=np.uint64))
        with timing.scope("materialize witness matrix"):
            witness = partition_witness.full_witness()  # (num_wires, degree)

    with timing.scope("compute wires commitment"):
        wires_commitment = PolynomialBatch.from_values(
            wires_pair if wires_pair is not None else witness, rate_bits,
            zk, cap_height, use_device=use_device, hasher=gc)

    challenger = Challenger(permutation=gc.permute)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.merkle_tree.cap)
    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    assert common_data.quotient_degree_factor < config.num_routed_wires

    with timing.scope("compute partial products"):
        if wires_pair is not None:
            from ..ops.partial_products import device_partial_products
            zs_partial_products = device_partial_products(
                wires_pair, betas, gammas, prover_data, common_data)
        else:
            zs_partial_products = _all_wires_partial_products(
                witness, betas, gammas, prover_data, common_data)

    with timing.scope("commit to partial products and Z's"):
        zs_partial_products_commitment = PolynomialBatch.from_values(
            zs_partial_products, rate_bits, zk, cap_height,
            use_device=use_device, hasher=gc)
    # the raw wires matrix is not read past this point (the quotient and
    # openings read the COMMITMENTS' resident leaves/coeffs); dropping it
    # returns ~0.5 GB of HBM at the flagship shape, where the proof runs
    # within a few hundred MB of the 16 GB chip limit
    del zs_partial_products
    wires_pair = None
    challenger.observe_cap(zs_partial_products_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(num_challenges)

    n_chunks = num_challenges * common_data.quotient_degree_factor
    with timing.scope("compute quotient polys"):
        if session is not None and session.quotient_on_device:
            q_pair = session.compute_quotient_polys(
                public_inputs_hash, wires_commitment,
                zs_partial_products_commitment, betas, gammas, alphas)
            import jax as _jax
            _jax.block_until_ready(q_pair)   # keep phase timings honest
            # split each quotient poly (8n coeffs) into degree-n chunks,
            # still on device — no host round-trip
            chunks = (q_pair[0].reshape(n_chunks, degree),
                      q_pair[1].reshape(n_chunks, degree))
        else:
            quotient_polys = _compute_quotient_polys(
                common_data, prover_data, public_inputs_hash,
                wires_commitment, zs_partial_products_commitment, betas,
                gammas, alphas)
            chunks = quotient_polys.reshape(n_chunks, degree)

    with timing.scope("commit to quotient polys"):
        quotient_polys_commitment = PolynomialBatch.from_coeffs(
            chunks, rate_bits, zk, cap_height, use_device=use_device,
            hasher=gc)
    challenger.observe_cap(quotient_polys_commitment.merkle_tree.cap)

    zeta = challenger.get_extension_challenge()
    assert ge.s_exp(zeta, degree) != (1, 0), "Opening point is in the subgroup."

    g = gl.primitive_root_of_unity(common_data.degree_bits())
    with timing.scope("construct the opening set"):
        openings = OpeningSet.new(zeta, g,
                                  prover_data.constants_sigmas_commitment,
                                  wires_commitment,
                                  zs_partial_products_commitment,
                                  quotient_polys_commitment, common_data)
    from ..fri.challenges import observe_openings
    with timing.scope("observe openings"):
        fri_openings = openings.to_fri_openings()
        observe_openings(challenger, fri_openings)

    oracles = [prover_data.constants_sigmas_commitment, wires_commitment,
               zs_partial_products_commitment, quotient_polys_commitment]
    with timing.scope("compute opening proofs"):
        if use_device and gc.algebraic:
            from ..fri.device_prover import device_prove_openings
            opening_proof = device_prove_openings(
                common_data.get_fri_instance(zeta), oracles, fri_openings,
                challenger, common_data.fri_params, hasher=gc)
        else:
            opening_proof = PolynomialBatch.prove_openings(
                common_data.get_fri_instance(zeta), oracles, challenger,
                common_data.fri_params, hasher=gc)

    return ProofWithPublicInputs(
        proof=Proof(
            wires_cap=wires_commitment.merkle_tree.cap,
            plonk_zs_partial_products_cap=zs_partial_products_commitment.merkle_tree.cap,
            quotient_polys_cap=quotient_polys_commitment.merkle_tree.cap,
            openings=openings,
            opening_proof=opening_proof),
        public_inputs=public_inputs)


def _transpose_pair(lo, hi):
    return _transpose_pair_jit()(lo, hi)


@functools.lru_cache(maxsize=1)
def _transpose_pair_jit():
    import jax

    return jax.jit(lambda lo, hi: (lo.T, hi.T), donate_argnums=(0, 1))


def _all_wires_partial_products(witness: np.ndarray, betas, gammas,
                                prover_data, common_data) -> np.ndarray:
    """Z polys + partial products, vectorized over the whole subgroup
    (reference prover.rs:702-787).  Returns (num_challenges*(1+num_prods), degree)."""
    config = common_data.config
    nr = config.num_routed_wires
    qdf = common_data.quotient_degree_factor
    num_prods = common_data.num_partial_products
    degree = common_data.degree()
    subgroup = prover_data.subgroup            # (degree,)
    sigmas = prover_data.sigmas                # (degree, nr)
    k_arr = np.array(common_data.k_is, dtype=np.uint64)
    wires_rt = witness[:nr].T                  # (degree, nr)

    z_polys = []
    pp_polys = []
    for beta, gamma in zip(betas, gammas):
        b = np.uint64(beta)
        gma = np.uint64(gamma)
        s_id = gl.mul(k_arr[None, :], subgroup[:, None])
        numer = gl.add(gl.add(wires_rt, gl.mul(b, s_id)), gma)
        denom = gl.add(gl.add(wires_rt, gl.mul(b, sigmas)), gma)
        quot = gl.mul(numer, gl.inverse(denom))     # (degree, nr)

        # chunk products of size qdf
        nchunks = -(-nr // qdf)
        pad = nchunks * qdf - nr
        if pad:
            quot = np.concatenate(
                [quot, np.ones((degree, pad), dtype=np.uint64)], axis=1)
        quot = quot.reshape(degree, nchunks, qdf)
        chunk_prod = quot[:, :, 0]
        for j in range(1, qdf):
            chunk_prod = gl.mul(chunk_prod, quot[:, :, j])  # (degree, nchunks)

        # cumulative chunk products within each row
        cum = chunk_prod.copy()
        for c in range(1, nchunks):
            cum[:, c] = gl.mul(cum[:, c - 1], chunk_prod[:, c])
        full_row = cum[:, -1]
        z = gl.prefix_prod_exclusive(full_row)      # (degree,) Z values
        pps = gl.mul(cum[:, :num_prods], z[:, None])  # (degree, num_prods)
        z_polys.append(z)
        pp_polys.append(pps.T)                      # (num_prods, degree)

    return np.concatenate([np.stack(z_polys)] + pp_polys, axis=0)


def _compute_quotient_polys(common_data, prover_data, public_inputs_hash,
                            wires_commitment, zs_partial_products_commitment,
                            betas, gammas, alphas) -> np.ndarray:
    """Vectorized over the entire quotient coset domain
    (reference prover.rs:790-1034).  Returns (num_challenges, 8n) coeff rows."""
    config = common_data.config
    qdb = log2_ceil(common_data.quotient_degree_factor)
    rate_bits = config.fri_config.rate_bits
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    degree_bits = common_data.degree_bits()
    points = gl.two_adic_subgroup(degree_bits + qdb)
    lde_size = points.shape[0]

    # Z_H on coset: evals g^n * v^i - 1 repeat with period 2^qdb
    g_pow_n = pow(gl.coset_shift(), 1 << degree_bits, gl.P)
    v = gl.two_adic_subgroup(qdb)
    zh_evals = gl.sub(gl.mul(np.uint64(g_pow_n), v), np.uint64(1))
    zh_inv = gl.inverse(zh_evals)

    # gather LDE rows in natural order, stride `step`
    def natural_rows(batch: PolynomialBatch):
        idx = np.arange(lde_size, dtype=np.int64) * step
        full_bits = degree_bits + rate_bits
        perm = bit_reverse_indices(1 << full_bits)
        rows = batch.leaves[perm[idx]]
        salt = batch.salt_size
        return rows[:, :rows.shape[1] - salt] if salt else rows

    cs_rows = natural_rows(prover_data.constants_sigmas_commitment)
    wire_rows = natural_rows(wires_commitment)
    zspp_rows = natural_rows(zs_partial_products_commitment)
    # Z(g x): quotient-domain index i -> i + next_step (mod lde_size)
    zspp_next = np.roll(zspp_rows, -next_step, axis=0)

    nc = common_data.num_constants
    local_constants = [cs_rows[:, j] for j in range(nc)]
    s_sigmas = [cs_rows[:, j] for j in common_data.sigmas_range()]
    local_wires = [wire_rows[:, j] for j in range(config.num_wires)]
    local_zs = [zspp_rows[:, j] for j in common_data.zs_range()]
    next_zs = [zspp_next[:, j] for j in common_data.zs_range()]
    partial_products = [zspp_rows[:, j]
                        for j in common_data.partial_products_range()]

    alg = NumpyBatch()
    shifted_xs = gl.mul(np.uint64(gl.coset_shift()), points)
    pih = [np.uint64(x) for x in public_inputs_hash]
    vars = EvaluationVars(local_constants, local_wires, pih)

    # L_0(x) = Z_H(x) / (n (x - 1)) vectorized
    n_f = np.uint64(1 << degree_bits)
    zh_tiled = np.tile(zh_evals, lde_size // zh_evals.shape[0])
    l_0 = gl.mul(zh_tiled, gl.inverse(gl.mul(n_f, gl.sub(shifted_xs, np.uint64(1)))))

    vals = eval_vanishing_poly(alg, common_data, shifted_xs, vars, local_zs,
                               next_zs, partial_products, s_sigmas, betas,
                               gammas, alphas, l_0)

    zh_inv_tiled = np.tile(zh_inv, lde_size // zh_inv.shape[0])
    out = []
    for v_alpha in vals:
        q_values = gl.mul(v_alpha, zh_inv_tiled)
        coeffs = fnp.coset_ifft(q_values)  # (8n,)
        out.append(coeffs)
    return np.stack(out)  # (num_challenges, 8n)
