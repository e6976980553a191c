"""End-to-end FRI batch-opening roundtrip: commit -> open at random ext
point -> fri_proof -> verifier replays transcript and checks everything.
This exercises the full L2 stack (oracle commit pipeline, fold, PoW, queries,
barycentric verification) without the PLONK layer."""
import numpy as np
import pytest

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.fri import challenges as fch
from plonky2_tpu.fri import verifier as fv
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.fri.structure import (FriBatchInfo, FriInstanceInfo,
                                       FriOpeningBatch, FriOpenings,
                                       FriOracleInfo, FriPolynomialInfo)
from plonky2_tpu.iop.challenger import Challenger


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64) % np.uint64(gl.P)


def make_config(nq=4):
    return FriConfig(rate_bits=3, cap_height=1, proof_of_work_bits=8,
                     reduction_strategy=FriReductionStrategy.ConstantArityBits(2, 3),
                     num_query_rounds=nq)


@pytest.mark.parametrize("use_device", [False, True])
def test_fri_roundtrip(use_device):
    degree_bits = 6
    degree = 1 << degree_bits
    n_polys = 5
    config = make_config()
    params = config.fri_params(degree_bits, hiding=False)
    assert len(params.reduction_arity_bits) > 0

    values = rand((n_polys, degree), seed=11)
    oracle = PolynomialBatch.from_values(values, config.rate_bits, False,
                                         config.cap_height,
                                         use_device=use_device)

    # instance: open all polys at a random extension point
    zeta = (int(rand((), 3)), int(rand((), 4)))
    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(num_polys=n_polys, blinding=False)],
        batches=[FriBatchInfo(point=zeta,
                              polynomials=FriPolynomialInfo.from_range(0, range(n_polys)))])
    openings = FriOpenings(batches=[FriOpeningBatch(
        values=[oracle.eval_poly_ext(i, zeta) for i in range(n_polys)])])

    # prover transcript
    ch = Challenger()
    ch.observe_cap(oracle.merkle_tree.cap)
    fch.observe_openings(ch, openings)
    proof = PolynomialBatch.prove_openings(instance, [oracle], ch, params)

    # verifier transcript (replay)
    ch2 = Challenger()
    ch2.observe_cap(oracle.merkle_tree.cap)
    fch.observe_openings(ch2, openings)
    challenges = fch.fri_challenges(ch2, proof.commit_phase_merkle_caps,
                                    proof.final_poly, proof.pow_witness,
                                    degree_bits, config)
    fv.verify_fri_proof(instance, openings, challenges,
                        [oracle.merkle_tree.cap], proof, params)


def test_fri_rejects_tampered_proof():
    degree_bits = 5
    config = make_config(nq=3)
    params = config.fri_params(degree_bits, hiding=False)
    values = rand((3, 1 << degree_bits), seed=2)
    oracle = PolynomialBatch.from_values(values, config.rate_bits, False,
                                         config.cap_height, use_device=False)
    zeta = (12345, 6789)
    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(3, False)],
        batches=[FriBatchInfo(point=zeta,
                              polynomials=FriPolynomialInfo.from_range(0, range(3)))])
    openings = FriOpenings(batches=[FriOpeningBatch(
        values=[oracle.eval_poly_ext(i, zeta) for i in range(3)])])
    ch = Challenger()
    ch.observe_cap(oracle.merkle_tree.cap)
    fch.observe_openings(ch, openings)
    proof = PolynomialBatch.prove_openings(instance, [oracle], ch, params)

    # tamper with the final polynomial
    proof.final_poly = proof.final_poly.copy()
    proof.final_poly[0, 0] = gl.add(proof.final_poly[0, 0], np.uint64(1))
    ch2 = Challenger()
    ch2.observe_cap(oracle.merkle_tree.cap)
    fch.observe_openings(ch2, openings)
    challenges = fch.fri_challenges(ch2, proof.commit_phase_merkle_caps,
                                    proof.final_poly, proof.pow_witness,
                                    degree_bits, config)
    with pytest.raises(fv.FriVerificationError):
        fv.verify_fri_proof(instance, openings, challenges,
                            [oracle.merkle_tree.cap], proof, params)


def test_divide_by_linear():
    from plonky2_tpu.fri.oracle import _divide_by_linear_ext
    n = 37  # deliberately not a multiple of the block size
    rng = np.random.default_rng(8)
    coeffs = rng.integers(0, gl.P, size=(n, 2), dtype=np.uint64)
    z = (777, 888)
    q = _divide_by_linear_ext(coeffs, z, block=8)
    assert q.shape == (n - 1, 2)
    # check f(x) - f(z) == q(x) * (x - z) at a few points
    def ev(c, x):
        acc = (0, 0)
        for i in range(c.shape[0] - 1, -1, -1):
            acc = ge.s_add(ge.s_mul(acc, x), (int(c[i, 0]), int(c[i, 1])))
        return acc
    fz = ev(coeffs, z)
    for x in [(3, 0), (123456789, 987654321), (gl.P - 2, 5)]:
        lhs = ge.s_sub(ev(coeffs, x), fz)
        rhs = ge.s_mul(ev(q, x), ge.s_sub(x, z))
        assert lhs == rhs
