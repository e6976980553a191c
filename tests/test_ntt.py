"""NTT: numpy oracle vs naive O(n^2) evaluation (mirrors reference
field/src/fft.rs:242-276 test), JAX NTT vs numpy oracle, coset/LDE paths."""
import numpy as np

from plonky2_tpu.field import fft_numpy as fnp
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.ops import ntt as jntt


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 1 << 63, size=shape, dtype=np.int64).astype(np.uint64) * np.uint64(2)
            + rng.integers(0, 2, size=shape).astype(np.uint64)) % np.uint64(gl.P)


def test_fft_vs_naive():
    for n in [1, 2, 8, 64, 256]:
        c = rand((3, n), seed=n)
        np.testing.assert_array_equal(fnp.fft(c), fnp.fft_naive(c))


def test_ifft_roundtrip():
    c = rand((4, 512))
    np.testing.assert_array_equal(fnp.ifft(fnp.fft(c)), c)


def test_coset_fft():
    n = 128
    c = rand((n,), seed=7)
    vals = fnp.coset_fft(c)
    g = gl.primitive_root_of_unity(7)
    # check a couple of points directly
    for i in [0, 1, 5, 127]:
        x = (7 * pow(g, i, gl.P)) % gl.P
        expect = 0
        for j in range(n - 1, -1, -1):
            expect = (expect * x + int(c[j])) % gl.P
        assert int(vals[i]) == expect
    np.testing.assert_array_equal(fnp.coset_ifft(vals), c)


def test_jax_ntt_matches_numpy():
    for n in [2, 16, 1024]:
        c = rand((5, n), seed=n + 1)
        out = jntt.ntt(gf.from_u64(c))
        np.testing.assert_array_equal(gf.to_u64(out), fnp.fft(c))
        inv = jntt.ntt(gf.from_u64(fnp.fft(c)), inverse=True)
        np.testing.assert_array_equal(gf.to_u64(inv), c)


def test_jax_lde_coset():
    n, rate = 64, 3
    c = rand((2, n), seed=3)
    out = jntt.lde_coset_ntt(gf.from_u64(c), rate)
    expect = fnp.coset_fft(fnp.lde(c, rate))
    np.testing.assert_array_equal(gf.to_u64(out), expect)
    back = jntt.coset_intt(out)
    np.testing.assert_array_equal(gf.to_u64(back), fnp.lde(c, rate))
