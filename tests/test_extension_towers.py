"""Quadratic/quartic/quintic extension towers vs field axioms and the
reference's constants (reference field/src/extension tests,
goldilocks_extensions.rs)."""
import random

import pytest

import plonky2_tpu.field.extension_towers as et
from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import goldilocks as gl

rng = random.Random(0xE47)


def rand_elem(params):
    return tuple(rng.randrange(gl.P) for _ in range(params.d))


@pytest.mark.parametrize("d", [2, 4, 5])
def test_extension_constants(d):
    params = et.TOWERS[d]
    # irreducibility witness: DTH_ROOT = W^((p-1)/D) is a primitive D-th root
    assert params.dth_root == pow(params.w, (gl.P - 1) // d, gl.P)
    assert pow(params.dth_root, d, gl.P) == 1
    assert pow(params.dth_root, 1, gl.P) != 1
    # ext generator has full order: g^((p^d-1)/q) != 1 for small prime q
    g = params.ext_multiplicative_group_generator
    order = gl.P ** d - 1
    for q in [2, 3, 5, 7, 11, 13, 17, 257, 65537]:
        if order % q == 0:
            assert et.exp(params, g, order // q) != et.one(params), q
    # power-of-two generator has order 2^TWO_ADICITY of the extension:
    # 33 for D=2 (p+1 contributes a factor of 2), 34 for D=4, 32 for D=5
    adicity = {2: 33, 4: 34, 5: 32}[d]
    t = params.ext_power_of_two_generator
    assert et.exp(params, t, 1 << adicity) == et.one(params)
    assert et.exp(params, t, 1 << (adicity - 1)) != et.one(params)


@pytest.mark.parametrize("d", [2, 4, 5])
def test_extension_field_axioms(d):
    params = et.TOWERS[d]
    for _ in range(10):
        a, b, c = rand_elem(params), rand_elem(params), rand_elem(params)
        assert et.mul(params, a, b) == et.mul(params, b, a)
        assert et.mul(params, et.mul(params, a, b), c) == \
            et.mul(params, a, et.mul(params, b, c))
        assert et.mul(params, a, et.add(params, b, c)) == \
            et.add(params, et.mul(params, a, b), et.mul(params, a, c))
        if a != et.zero(params):
            assert et.mul(params, a, et.inverse(params, a)) == et.one(params)
        # frobenius is the p-power map
        assert et.frobenius(params, a) == et.exp(params, a, gl.P)


def test_quadratic_tower_matches_vectorized_ext():
    params = et.QUADRATIC
    for _ in range(20):
        a = rand_elem(params)
        b = rand_elem(params)
        assert et.mul(params, a, b) == ge.s_mul(a, b)
        if a != (0, 0):
            assert et.inverse(params, a) == ge.s_inv(a)
