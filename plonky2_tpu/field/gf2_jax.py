"""Quadratic extension F_{p^2} = F_p[X]/(X^2 - 7) on device (JAX).

An extension element batch is a pair of GF pairs: ((lo0, hi0), (lo1, hi1)),
component layout matching field/extension.py (host numpy) and the reference
field/src/extension/quadratic.rs.  Used by the device FRI pipeline
(composition evaluation, fold layers) so extension math never leaves the
chip.
"""
from __future__ import annotations

from . import gf_jax as gf
from . import goldilocks as gl

W = 7  # field/extension.py:17


def from_u64_pair(a0, a1):
    return gf.from_u64(a0), gf.from_u64(a1)


def add2(a, b):
    return gf.add(a[0], b[0]), gf.add(a[1], b[1])


def sub2(a, b):
    return gf.sub(a[0], b[0]), gf.sub(a[1], b[1])


def mul2(a, b):
    """(a0 + a1 x)(b0 + b1 x) = a0b0 + 7 a1b1 + (a0b1 + a1b0) x."""
    a0b0 = gf.mul(a[0], b[0])
    a1b1 = gf.mul(a[1], b[1])
    c0 = gf.add(a0b0, gf.mul_const(a1b1, W))
    c1 = gf.add(gf.mul(a[0], b[1]), gf.mul(a[1], b[0]))
    return c0, c1


def mul2_base(a, s):
    """ext * base (s a GF pair)."""
    return gf.mul(a[0], s), gf.mul(a[1], s)


def scale2(a, c: tuple):
    """ext * host ext scalar (c0, c1)."""
    import jax.numpy as jnp
    c0 = gf.full((), int(c[0]))
    c1 = gf.full((), int(c[1]))
    return mul2(a, (c0, c1))


def inverse2(a):
    """1 / (a0 + a1 x) = (a0 - a1 x) / (a0^2 - 7 a1^2)."""
    norm = gf.sub(gf.mul(a[0], a[0]), gf.mul_const(gf.mul(a[1], a[1]), W))
    inv = gf.inverse(norm)
    return gf.mul(a[0], inv), gf.mul(gf.neg(a[1]), inv)


def sum2(a, axis: int = -1):
    """Modular sum along an axis (power-of-two length) via halving tree."""
    return gf_sum(a[0], axis), gf_sum(a[1], axis)


def gf_sum(pair, axis: int = -1):
    """Tree-reduce gf.add along `axis`; length must be a power of two."""
    import jax.numpy as jnp

    lo, hi = pair
    axis = axis % lo.ndim
    n = lo.shape[axis]
    assert n & (n - 1) == 0, "gf_sum needs a power-of-two axis"
    while n > 1:
        h = n // 2

        def half(x, s):
            idx = [slice(None)] * x.ndim
            idx[axis] = s
            return x[tuple(idx)]

        a = (half(lo, slice(0, h)), half(hi, slice(0, h)))
        b = (half(lo, slice(h, n)), half(hi, slice(h, n)))
        lo, hi = gf.add(a, b)
        n = h
    idx = [slice(None)] * lo.ndim
    idx[axis] = 0
    return lo[tuple(idx)], hi[tuple(idx)]
