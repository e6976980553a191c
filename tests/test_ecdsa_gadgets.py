"""secp256k1 curve + GLV gadget tests (reference ecdsa/src/gadgets tests).

Scalar-multiplication tests use short (1-limb) scalars to keep the circuits
CI-sized; the full 256-bit path is exercised by the native layer tests and
the (slow) ECDSA verification test.
"""
import random

import pytest

from plonky2_tpu.ecdsa import curve as cv
from plonky2_tpu.gadgets.nonnative import NonNativeTarget, set_nonnative_target
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

rng = random.Random(0x5EC9)


def prove_and_verify(builder, pw):
    data = builder.build()
    proof = data.prove(pw)
    data.verify(proof)


def rand_point():
    return cv.scalar_mul(cv.generator(), rng.randrange(1, cv.SECP256K1_N))


def test_curve_add_double_valid():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    p = rand_point()
    q = rand_point()
    pt = b.constant_affine_point(p)
    qt = b.constant_affine_point(q)
    b.curve_assert_valid(pt)
    b.curve_assert_valid(qt)

    s = b.curve_add(pt, qt)
    b.connect_affine_point(s, b.constant_affine_point(p.add(q)))

    d = b.curve_double(pt)
    b.connect_affine_point(d, b.constant_affine_point(p.double()))

    n = b.curve_neg(pt)
    b.connect_affine_point(n, b.constant_affine_point(p.neg()))
    prove_and_verify(b, pw)


def test_curve_conditional_ops():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    p = rand_point()
    q = rand_point()
    pt = b.constant_affine_point(p)
    qt = b.constant_affine_point(q)
    one = b.one()
    zero = b.zero()

    added = b.curve_conditional_add(pt, qt, one)
    b.connect_affine_point(added, b.constant_affine_point(p.add(q)))
    not_added = b.curve_conditional_add(pt, qt, zero)
    b.connect_affine_point(not_added, pt)

    negd = b.curve_conditional_neg(pt, one)
    b.connect_affine_point(negd, b.constant_affine_point(p.neg()))
    prove_and_verify(b, pw)


def test_random_access_curve_points():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    points = [rand_point() for _ in range(8)]
    pts = [b.constant_affine_point(p) for p in points]
    i = rng.randrange(8)
    got = b.random_access_curve_points(b.constant(i), pts)
    b.connect_affine_point(got, pts[i])
    prove_and_verify(b, pw)


@pytest.mark.heavy
def test_curve_scalar_mul_short_scalar():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    p = rand_point()
    k = rng.randrange(1, 1 << 32)
    pt = b.constant_affine_point(p)
    # 1-limb scalar => 32-bit double-and-add loop
    kt = b.constant_nonnative(k, cv.SECP256K1_N)
    out = b.curve_scalar_mul(pt, kt)
    b.connect_affine_point(out, b.constant_affine_point(cv.scalar_mul(p, k)))
    prove_and_verify(b, pw)


@pytest.mark.heavy
def test_curve_windowed_mul_short_scalar():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    p = rand_point()
    k = rng.randrange(1, 1 << 32)
    pt = b.constant_affine_point(p)
    kt = NonNativeTarget(b.add_virtual_biguint_target(1), cv.SECP256K1_N)
    set_nonnative_target(pw, kt, k)
    out = b.curve_scalar_mul_windowed(pt, kt)
    b.connect_affine_point(out, b.constant_affine_point(cv.scalar_mul(p, k)))
    prove_and_verify(b, pw)


@pytest.mark.heavy
def test_curve_msm_short_scalars():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    p = rand_point()
    q = rand_point()
    n = rng.randrange(1, 1 << 32)
    m = rng.randrange(1, 1 << 32)
    pt = b.constant_affine_point(p)
    qt = b.constant_affine_point(q)
    nt = NonNativeTarget(b.add_virtual_biguint_target(1), cv.SECP256K1_N)
    mt = NonNativeTarget(b.add_virtual_biguint_target(1), cv.SECP256K1_N)
    set_nonnative_target(pw, nt, n)
    set_nonnative_target(pw, mt, m)
    out = b.curve_msm(pt, qt, nt, mt)
    expected = (p.to_projective().mul(n) + q.to_projective().mul(m)).to_affine()
    b.connect_affine_point(out, b.constant_affine_point(expected))
    prove_and_verify(b, pw)
