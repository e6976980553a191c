"""Constraint-program compiler: the compiled interpreter must reproduce the
NumpyBatch quotient oracle exactly (same math, compiled form), on both the
numpy executor and the jax scan interpreter."""
import numpy as np
import pytest

from plonky2_tpu.field import fft_numpy as fnp
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.plonk.constraint_program import (
    ExprAlgebra, ProgramBuilder)


def test_builder_basics_and_fusion():
    b = ProgramBuilder()
    alg = ExprAlgebra(b)
    x = b.vector_input()
    y = b.vector_input()
    s = b.scalar_input()
    # e = (x*y + x) * (s - y) + 7 ; f = x * 3 + s
    e = alg.mul(alg.add(alg.mul(x, y), x), alg.sub(s, y))
    e = alg.add_const(e, 7)
    f = alg.add(alg.mul_const(x, 3), s)
    b.mark_output(e)
    b.mark_output(f)
    prog = b.compile(wave_width=4)
    assert prog.n_inputs == 2

    rng = np.random.default_rng(0)
    xv = rng.integers(0, gl.P, size=8, dtype=np.uint64)
    yv = rng.integers(0, gl.P, size=8, dtype=np.uint64)
    sv = 123456789
    out = prog.run_numpy(np.stack([xv, yv]), [sv])
    e_ref = gl.add(gl.mul(gl.add(gl.mul(xv, yv), xv),
                          gl.sub(np.uint64(sv), yv)), np.uint64(7))
    f_ref = gl.add(gl.mul(xv, np.uint64(3)), np.uint64(sv))
    np.testing.assert_array_equal(out[0], e_ref)
    np.testing.assert_array_equal(out[1], f_ref)


def test_cse_and_constant_folding():
    b = ProgramBuilder()
    alg = ExprAlgebra(b)
    x = b.vector_input()
    a1 = alg.mul(x, x)
    a2 = alg.mul(x, x)          # CSE: same node
    assert a1.id == a2.id
    k = alg.mul_const(alg.const(3), 5)   # folds to 15
    assert b.snodes[k.id] == ("k", 15)
    z = alg.mul_const(x, 0)     # folds to scalar zero
    assert z.kind == "s"
    one = alg.mul_const(x, 1)   # identity
    assert one.id == x.id and one.kind == "v"
    s = alg.sub(x, x)           # x - x = 0
    assert s.kind == "s"


def test_exp_square_and_multiply():
    b = ProgramBuilder()
    alg = ExprAlgebra(b)
    x = b.vector_input()
    b.mark_output(alg.exp(x, 7))
    prog = b.compile()
    xv = np.array([3, 5, gl.P - 2], dtype=np.uint64)
    out = prog.run_numpy(xv[None], [])
    expect = np.array([pow(int(v), 7, gl.P) for v in xv], dtype=np.uint64)
    np.testing.assert_array_equal(out[0], expect)


@pytest.fixture(scope="module")
def fib_setup():
    from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
    from tests.test_plonk import fast_test_config
    data, pw, _ = build_fibonacci_circuit(fast_test_config())
    return data, pw


def _quotient_fixture(data, pw):
    """Run the host prover far enough to get commitments + challenges."""
    from plonky2_tpu.hash import poseidon as pos
    from plonky2_tpu.iop.challenger import Challenger
    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.fri.oracle import PolynomialBatch
    from plonky2_tpu.plonk.prover import (_all_wires_partial_products,
                                          _compute_quotient_polys)

    common, prover_only = data.common, data.prover_only
    config = common.config
    rng = np.random.default_rng(7)
    pwit = generate_partial_witness(pw, prover_only, common)
    public_inputs = pwit.get_targets(prover_only.public_inputs)
    pih = pos.hash_no_pad(np.array(public_inputs, dtype=np.uint64))
    witness = pwit.full_witness()
    gc = common.hasher()
    wires = PolynomialBatch.from_values(
        witness, config.fri_config.rate_bits, config.zero_knowledge,
        config.fri_config.cap_height, use_device=False, salt_rng=rng,
        hasher=gc)
    challenger = Challenger(permutation=gc.permute)
    challenger.observe_hash(prover_only.circuit_digest)
    challenger.observe_hash(pih)
    challenger.observe_cap(wires.merkle_tree.cap)
    betas = challenger.get_n_challenges(config.num_challenges)
    gammas = challenger.get_n_challenges(config.num_challenges)
    zspp = _all_wires_partial_products(witness, betas, gammas, prover_only,
                                       common)
    zspp_c = PolynomialBatch.from_values(
        zspp, config.fri_config.rate_bits, config.zero_knowledge,
        config.fri_config.cap_height, use_device=False, salt_rng=rng,
        hasher=gc)
    challenger.observe_cap(zspp_c.merkle_tree.cap)
    alphas = challenger.get_n_challenges(config.num_challenges)
    expected = _compute_quotient_polys(common, prover_only, pih, wires,
                                       zspp_c, betas, gammas, alphas)
    return pih, wires, zspp_c, betas, gammas, alphas, expected


def test_quotient_program_matches_numpy_oracle(fib_setup):
    from plonky2_tpu.plonk.quotient_program import (
        build_quotient_program, host_quotient_inputs, quotient_scalar_inputs)
    data, pw = fib_setup
    common, prover_only = data.common, data.prover_only
    pih, wires, zspp_c, betas, gammas, alphas, expected = \
        _quotient_fixture(data, pw)

    prog = build_quotient_program(common)
    inputs = host_quotient_inputs(common, prover_only, wires, zspp_c)
    assert inputs.shape[0] == prog.n_inputs
    scal = quotient_scalar_inputs(pih, betas, gammas, alphas)
    values = prog.run_numpy(inputs, scal)       # (nch, N) quotient values
    coeffs = np.stack([fnp.coset_ifft(v) for v in values])
    np.testing.assert_array_equal(coeffs, expected)


def test_jax_interpreter_matches_numpy_executor(fib_setup):
    import jax.numpy as jnp

    from plonky2_tpu.field import gf_jax as gf
    from plonky2_tpu.plonk.quotient_program import (
        build_quotient_program, host_quotient_inputs, quotient_scalar_inputs)
    data, pw = fib_setup
    common, prover_only = data.common, data.prover_only
    pih, wires, zspp_c, betas, gammas, alphas, _ = _quotient_fixture(data, pw)

    prog = build_quotient_program(common)
    inputs = host_quotient_inputs(common, prover_only, wires, zspp_c)
    scal = quotient_scalar_inputs(pih, betas, gammas, alphas)
    expect_vals = prog.run_numpy(inputs, scal)

    run = prog.jax_chunk_runner()
    C = inputs.shape[-1]
    regs = jnp.zeros((prog.n_regs, 2, C), jnp.uint32)
    in_pair = np.stack(gf.from_u64(inputs), axis=1)   # (n_in, 2, C)
    regs = regs.at[:prog.n_inputs].set(jnp.asarray(in_pair))
    bank = prog.scalar_bank(scal)
    bank_pair = jnp.asarray(np.stack(gf.from_u64(bank), axis=1))
    out = np.asarray(run(regs, bank_pair))            # (n_out, 2, C)
    got = gf.to_u64((out[:, 0], out[:, 1]))
    np.testing.assert_array_equal(got, expect_vals)
