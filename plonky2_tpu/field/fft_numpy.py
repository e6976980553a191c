"""Batched radix-2 NTT over Goldilocks — numpy CPU oracle.

Semantics match the reference (`field/src/fft.rs`): ``fft(coeffs)[i] ==
poly(g^i)`` for the canonical two-adic generator g of the domain, natural
output order; ``ifft`` is its exact inverse; coset variants scale by shift
powers.  The internal algorithm is a standard DIT butterfly network — only the
input/output contract must match the reference, the schedule is free.

Arrays: uint64, last axis = polynomial axis, leading axes = batch.
"""
from __future__ import annotations

import numpy as np

from ..utils.bits import bit_reverse_indices, log2_strict
from . import goldilocks as gl


def _stage_twiddles(n: int):
    """twiddles[s] = powers of the 2^(s+1)-domain generator, length 2^s."""
    bits = log2_strict(n)
    out = []
    for s in range(bits):
        g = gl.primitive_root_of_unity(s + 1)
        out.append(gl.powers(g, 1 << s))
    return out


_TWIDDLE_CACHE: dict = {}


def stage_twiddles(n: int):
    if n not in _TWIDDLE_CACHE:
        _TWIDDLE_CACHE[n] = _stage_twiddles(n)
    return _TWIDDLE_CACHE[n]


def _inv_stage_twiddles(n: int):
    key = ("inv", n)
    if key not in _TWIDDLE_CACHE:
        _TWIDDLE_CACHE[key] = [gl.inverse(t) for t in stage_twiddles(n)]
    return _TWIDDLE_CACHE[key]


def _fft_with_twiddles(a: np.ndarray, twiddles) -> np.ndarray:
    n = a.shape[-1]
    bits = log2_strict(n)
    a = a[..., bit_reverse_indices(n)]
    batch = a.shape[:-1]
    for s in range(bits):
        half = 1 << s
        length = half * 2
        x = a.reshape(*batch, n // length, length)
        u = x[..., :half]
        v = gl.mul(x[..., half:], twiddles[s])
        a = np.concatenate([gl.add(u, v), gl.sub(u, v)], axis=-1).reshape(*batch, n)
    return a


def fft(coeffs: np.ndarray) -> np.ndarray:
    """values[i] = poly(g^i), natural order."""
    return _fft_with_twiddles(coeffs, stage_twiddles(coeffs.shape[-1]))


def ifft(values: np.ndarray) -> np.ndarray:
    n = values.shape[-1]
    coeffs = _fft_with_twiddles(values, _inv_stage_twiddles(n))
    n_inv = gl.s_inv(n)
    return gl.mul(coeffs, np.uint64(n_inv))


def coset_fft(coeffs: np.ndarray, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> np.ndarray:
    """values[i] = poly(shift * g^i)."""
    n = coeffs.shape[-1]
    return fft(gl.mul(coeffs, gl.powers(shift, n)))


def coset_ifft(values: np.ndarray, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR) -> np.ndarray:
    n = values.shape[-1]
    coeffs = ifft(values)
    return gl.mul(coeffs, gl.powers(gl.s_inv(shift), n))


def lde(coeffs: np.ndarray, rate_bits: int) -> np.ndarray:
    """Pad coeffs with zeros to n * 2^rate_bits (reference PolynomialCoeffs::lde)."""
    n = coeffs.shape[-1]
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n * ((1 << rate_bits) - 1))]
    return np.pad(coeffs, pad)


def fft_naive(coeffs: np.ndarray) -> np.ndarray:
    """O(n^2) evaluation for testing."""
    n = coeffs.shape[-1]
    g = gl.primitive_root_of_unity(log2_strict(n))
    xs = gl.powers(g, n)
    out = np.zeros(coeffs.shape, dtype=np.uint64)
    acc = np.broadcast_to(np.uint64(1), xs.shape).copy()
    for j in range(n):
        out = gl.add(out, gl.mul(coeffs[..., j : j + 1], acc))
        acc = gl.mul(acc, xs)
    return out
