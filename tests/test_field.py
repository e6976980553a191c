"""Field arithmetic: numpy oracle vs python-int ground truth, and the JAX
u32-pair implementation vs the numpy oracle.  Boundary inputs mirror the
reference test strategy (field/src/prime_field_testing.rs:7-70: values
clustered near 0, p, and multiples of 2^32)."""
import numpy as np
import pytest

from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.field import gf_jax as gf

P = gl.P


def boundary_values():
    vals = []
    for base in [0, 1 << 32, 1 << 63, P - (1 << 32), P]:
        for d in range(-3, 4):
            v = (base + d) % P
            vals.append(v)
    rng = np.random.default_rng(0)
    vals += [int(x) % P for x in rng.integers(0, 1 << 63, size=40, dtype=np.int64) * 2 + 1]
    return np.array(sorted(set(vals)), dtype=np.uint64)


VALS = boundary_values()
A, B = np.meshgrid(VALS, VALS, indexing="ij")
A, B = A.ravel(), B.ravel()


def truth(op):
    return np.array([op(int(a), int(b)) % P for a, b in zip(A.tolist(), B.tolist())],
                    dtype=np.uint64)


def test_numpy_add_sub_mul():
    np.testing.assert_array_equal(gl.add(A, B), truth(lambda a, b: a + b))
    np.testing.assert_array_equal(gl.sub(A, B), truth(lambda a, b: a - b))
    np.testing.assert_array_equal(gl.mul(A, B), truth(lambda a, b: a * b))
    np.testing.assert_array_equal(gl.neg(A), truth(lambda a, b: -a))


def test_numpy_inverse():
    nz = VALS[VALS != 0]
    inv = gl.inverse(nz)
    np.testing.assert_array_equal(gl.mul(nz, inv), np.ones_like(nz))


def test_batch_inverse():
    nz = VALS[VALS != 0]
    inv = gl.batch_multiplicative_inverse(nz)
    np.testing.assert_array_equal(inv, gl.inverse(nz))


def test_powers():
    p = gl.powers(gl.MULTIPLICATIVE_GROUP_GENERATOR, 20)
    assert int(p[0]) == 1
    for i in range(1, 20):
        assert int(p[i]) == pow(7, i, P)


def test_primitive_root():
    for k in [0, 1, 2, 5, 16, 32]:
        g = gl.primitive_root_of_unity(k)
        assert pow(g, 1 << k, P) == 1
        if k > 0:
            assert pow(g, 1 << (k - 1), P) != 1


def test_jax_roundtrip():
    pair = gf.from_u64(VALS)
    np.testing.assert_array_equal(gf.to_u64(pair), VALS)


def test_jax_add_sub_mul_neg():
    a, b = gf.from_u64(A), gf.from_u64(B)
    np.testing.assert_array_equal(gf.to_u64(gf.add(a, b)), gl.add(A, B))
    np.testing.assert_array_equal(gf.to_u64(gf.sub(a, b)), gl.sub(A, B))
    np.testing.assert_array_equal(gf.to_u64(gf.mul(a, b)), gl.mul(A, B))
    np.testing.assert_array_equal(gf.to_u64(gf.neg(a)), gl.neg(A))


def test_jax_inverse():
    nz = VALS[VALS != 0]
    a = gf.from_u64(nz)
    np.testing.assert_array_equal(gf.to_u64(gf.inverse(a)), gl.inverse(nz))


def test_jax_exp():
    a = gf.from_u64(VALS)
    np.testing.assert_array_equal(gf.to_u64(gf.exp_u64(a, 12345)),
                                  gl.exp_u64(VALS, 12345))
