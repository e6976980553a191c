"""Gadget-layer tests: extension arithmetic, bit splits, random access,
reducing, interpolation — each checked inside a real proved+verified circuit
(mirrors the reference's gadget test style, e.g. gadgets/arithmetic_extension.rs
tests)."""
import random

import pytest

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.gadgets.reducing import ReducingFactorTarget
from plonky2_tpu.gates.interpolation import interpolant
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

rng = random.Random(0xC0FFEE)


def rand_ext():
    return (rng.randrange(gl.P), rng.randrange(gl.P))


def prove_and_verify(builder, pw):
    data = builder.build()
    proof = data.prove(pw)
    data.verify(proof)
    return data, proof


def test_extension_arithmetic_division_exp():
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    pw = PartialWitness()

    x, y = rand_ext(), rand_ext()
    xt = b.add_virtual_extension_target()
    yt = b.add_virtual_extension_target()
    pw.set_extension_target(xt, x)
    pw.set_extension_target(yt, y)

    cases = [
        (b.mul_extension(xt, yt), ge.s_mul(x, y)),
        (b.add_extension(xt, yt), ge.s_add(x, y)),
        (b.sub_extension(xt, yt), ge.s_sub(x, y)),
        (b.div_extension(xt, yt), ge.s_mul(x, ge.s_inv(y))),
        (b.inverse_extension(yt), ge.s_inv(y)),
        (b.exp_u64_extension(xt, 31337), ge.s_exp(x, 31337)),
        (b.exp_power_of_2_extension(xt, 5), ge.s_exp(x, 32)),
        (b.mul_add_extension(xt, yt, xt), ge.s_add(ge.s_mul(x, y), x)),
        (b.scalar_mul_ext(b.constant(7), yt), ge.s_mul((7, 0), y)),
    ]
    for target, expect in cases:
        b.connect_extension(target, b.constant_extension(expect))
    prove_and_verify(b, pw)


def test_split_le_sum_select_random_access():
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    pw = PartialWitness()

    v = rng.randrange(1 << 52)
    vt = b.add_virtual_target()
    pw.set_target(vt, v)
    bits = b.split_le(vt, 52)
    back = b.le_sum(bits)
    b.connect(back, vt)
    # spot-check an individual bit
    b.connect(bits[3], b.constant((v >> 3) & 1))

    lo, hi = b.split_low_high(vt, 20, 52)
    b.connect(lo, b.constant(v & ((1 << 20) - 1)))
    b.connect(hi, b.constant(v >> 20))

    vec_vals = [rng.randrange(gl.P) for _ in range(16)]
    vec = [b.constant(c) for c in vec_vals]
    idx = rng.randrange(16)
    got = b.random_access(b.constant(idx), vec)
    b.connect(got, b.constant(vec_vals[idx]))

    ext_vec_vals = [rand_ext() for _ in range(8)]
    ext_vec = [b.constant_extension(e) for e in ext_vec_vals]
    eidx = rng.randrange(8)
    egot = b.random_access_extension(b.constant(eidx), ext_vec)
    b.connect_extension(egot, b.constant_extension(ext_vec_vals[eidx]))

    sel = b.select(b.one(), vec[0], vec[1])
    b.connect(sel, vec[0])
    sel2 = b.select_ext(b.zero(), ext_vec[0], ext_vec[1])
    b.connect_extension(sel2, ext_vec[1])

    eq = b.is_equal(vt, vt)
    b.connect(eq, b.one())
    neq = b.is_equal(vt, b.add(vt, b.one()))
    b.connect(neq, b.zero())
    prove_and_verify(b, pw)


def test_reducing_factor_matches_native():
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    pw = PartialWitness()

    alpha = rand_ext()
    # long enough to exercise the ReducingExtensionGate path (> n_ops+1)
    vals = [rand_ext() for _ in range(40)]
    acc = (0, 0)
    for v in reversed(vals):
        acc = ge.s_add(ge.s_mul(acc, alpha), v)

    rf = ReducingFactorTarget(b.constant_extension(alpha))
    vts = b.add_virtual_extension_targets(len(vals))
    pw.set_extension_targets(vts, vals)
    red = rf.reduce(vts, b)
    b.connect_extension(red, b.constant_extension(acc))

    # base-target variant through ReducingGate
    base_vals = [rng.randrange(gl.P) for _ in range(50)]
    acc2 = (0, 0)
    for v in reversed(base_vals):
        acc2 = ge.s_add(ge.s_mul(acc2, alpha), (v, 0))
    rf2 = ReducingFactorTarget(b.constant_extension(alpha))
    bts = [b.add_virtual_target() for _ in base_vals]
    for t, v in zip(bts, base_vals):
        pw.set_target(t, v)
    red2 = rf2.reduce_base(bts, b)
    b.connect_extension(red2, b.constant_extension(acc2))
    prove_and_verify(b, pw)


@pytest.mark.parametrize("subgroup_bits,high_degree",
                         [(2, False), (4, False), (2, True)])
def test_interpolation_gate_matches_lagrange(subgroup_bits, high_degree):
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    pw = PartialWitness()

    n = 1 << subgroup_bits
    shift = rng.randrange(1, gl.P)
    g = gl.primitive_root_of_unity(subgroup_bits)
    x = shift
    points, values = [], []
    for _ in range(n):
        y = rand_ext()
        points.append(((x, 0), y))
        values.append(y)
        x = x * g % gl.P
    coeffs = interpolant(points)
    zeta = rand_ext()
    expect = (0, 0)
    for c in reversed(coeffs):
        expect = ge.s_add(ge.s_mul(expect, zeta), c)
    # sanity: interpolant passes through the points
    for (xi, yi) in points:
        got = (0, 0)
        for c in reversed(coeffs):
            got = ge.s_add(ge.s_mul(got, xi), c)
        assert got == yi

    out = b.interpolate_coset(subgroup_bits, b.constant(shift),
                              [b.constant_extension(v) for v in values],
                              b.constant_extension(zeta),
                              high_degree=high_degree)
    b.connect_extension(out, b.constant_extension(expect))
    prove_and_verify(b, pw)
