"""Pallas column-NTT kernels (ops/ntt_pallas.py) must match the XLA/numpy
NTT bit-for-bit.  Kernel checks run in interpret mode at small shapes (a
few hundred ops per kernel — unlike the sponge, cheap on CPU); the real
commit-scale shapes are exercised on TPU by bench.py / the proof path."""
import numpy as np
import pytest

import jax.numpy as jnp

from plonky2_tpu.field import fft_numpy as fnp
from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import ntt_pallas as ntp
from plonky2_tpu.parallel import sharded_ntt as fs


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _rand(rng, shape):
    v = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
    return v


def _pair(v):
    lo, hi = gf.from_u64(v)
    return jnp.asarray(lo), jnp.asarray(hi)


def _u64(p):
    return np.asarray(gf.to_u64((np.asarray(p[0]), np.asarray(p[1]))))


@pytest.mark.parametrize("n1,n2", [(16, 128), (8, 256), (64, 128)])
def test_ntt_cols_matches_oracle(rng, n1, n2):
    v = _rand(rng, (n1, n2))
    got = ntp.ntt_cols_pallas(_pair(v), tile=128, interpret=True)
    want = np.stack([fnp.fft(v[:, j]) for j in range(n2)], axis=1)
    np.testing.assert_array_equal(_u64(got), want)


def test_ntt_cols_inverse(rng):
    v = _rand(rng, (16, 128))
    got = ntp.ntt_cols_pallas(_pair(v), inverse=True, tile=128,
                              interpret=True)
    # the kernel omits the n^-1 scale (the four-step applies it globally):
    # result = n * ifft mod p (object dtype — u64 would overflow)
    want = np.stack([fnp.ifft(v[:, j]) for j in range(128)], axis=1)
    want = ((want.astype(object) * 16) % gl.P).astype(np.uint64)
    np.testing.assert_array_equal(_u64(got), want)


def test_ntt_cols_batched(rng):
    v = _rand(rng, (3, 16, 128))
    got = ntp.ntt_cols_pallas(_pair(v), tile=128, interpret=True)
    want = np.stack([
        np.stack([fnp.fft(v[b, :, j]) for j in range(128)], axis=1)
        for b in range(3)])
    np.testing.assert_array_equal(_u64(got), want)


def test_ntt_cols_zero_tail(rng):
    r = 2
    v = _rand(rng, (4, 128))           # q rows, padded n1 = 16
    got = ntp.ntt_cols_zero_tail_pallas(_pair(v), r, tile=128,
                                        interpret=True)
    padded = np.zeros((16, 128), dtype=np.uint64)
    padded[:4] = v
    want = np.stack([fnp.fft(padded[:, j]) for j in range(128)], axis=1)
    np.testing.assert_array_equal(_u64(got), want)


def test_four_step_pallas_matches_xla(rng, monkeypatch):
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_NTT", "interpret")
    n = 1 << 11                        # n1 = 32? -> bits//2: n1 = 2^5
    v = _rand(rng, (n,))
    want = fnp.fft(v)
    got = fs._four_step_pallas(_pair(v), False, 1 << 5)
    np.testing.assert_array_equal(_u64(got), want)
    # inverse with the global scale
    wanti = fnp.ifft(v)
    goti = fs._four_step_pallas(_pair(v), True, 1 << 5)
    np.testing.assert_array_equal(_u64(goti), wanti)


def test_four_step_zero_tail_pallas_matches(rng, monkeypatch):
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_NTT", "interpret")
    q, r = 1 << 8, 3
    v = _rand(rng, (2, q))
    m = q << r
    n1 = max(1 << (11 // 2), 1 << r)   # bits=11 -> n1=32
    got = fs._four_step_zero_tail_pallas(_pair(v), r, n1)
    padded = np.zeros((2, m), dtype=np.uint64)
    padded[:, :q] = v
    want = np.stack([fnp.fft(padded[b]) for b in range(2)])
    np.testing.assert_array_equal(_u64(got), want)


def test_ntt_cols_dif_matches_bitrev_oracle(rng):
    from plonky2_tpu.utils.bits import bit_reverse_indices
    v = _rand(rng, (16, 128))
    got = ntp.ntt_cols_dif_pallas(_pair(v), tile=128, interpret=True)
    perm = bit_reverse_indices(16)
    want = np.stack([fnp.fft(v[:, j])[perm] for j in range(128)], axis=1)
    np.testing.assert_array_equal(_u64(got), want)


def test_ntt_cols_dif_zero_tail(rng):
    from plonky2_tpu.utils.bits import bit_reverse_indices
    v = _rand(rng, (4, 128))           # q rows, implied n1 = 16
    got = ntp.ntt_cols_dif_pallas(_pair(v), tile=128, interpret=True,
                                  zero_tail_rows=12)
    padded = np.zeros((16, 128), dtype=np.uint64)
    padded[:4] = v
    perm = bit_reverse_indices(16)
    want = np.stack([fnp.fft(padded[:, j])[perm] for j in range(128)],
                    axis=1)
    np.testing.assert_array_equal(_u64(got), want)


def test_four_step_zero_tail_bitrev_matches(rng, monkeypatch):
    from plonky2_tpu.utils.bits import bit_reverse_indices
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_NTT", "interpret")
    q, r = 1 << 8, 3
    v = _rand(rng, (2, q))
    m = q << r
    n1 = max(1 << (11 // 2), 1 << r)   # bits=11 -> n1=32
    got = fs._four_step_zero_tail_bitrev_pallas(_pair(v), r, n1)
    padded = np.zeros((2, m), dtype=np.uint64)
    padded[:, :q] = v
    perm = bit_reverse_indices(m)
    want = np.stack([fnp.fft(padded[b])[perm] for b in range(2)])
    np.testing.assert_array_equal(_u64(got), want)


def test_lde_coset_ntt_bitrev_equivalence(rng, monkeypatch):
    """lde_coset_ntt_bitrev == lde_coset_ntt + bitrev gather, on BOTH the
    Pallas (interpret) path and the XLA fallback."""
    from plonky2_tpu.ops import ntt as jntt
    from plonky2_tpu.utils.bits import bit_reverse_indices
    q, r = 1 << 9, 3
    v = _rand(rng, (3, q))
    perm = bit_reverse_indices(q << r)
    base = jntt.lde_coset_ntt(_pair(v), r)
    want = _u64(base)[:, perm]
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_NTT", "interpret")
    np.testing.assert_array_equal(
        _u64(jntt.lde_coset_ntt_bitrev(_pair(v), r)), want)
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_NTT", "0")
    np.testing.assert_array_equal(
        _u64(jntt.lde_coset_ntt_bitrev(_pair(v), r)), want)
