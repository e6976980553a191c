"""Goldilocks field arithmetic for TPU — JAX, 2x uint32 limb representation.

TPU has no native 64-bit integer datapath, so a field element is carried as a
pair of uint32 arrays ``(lo, hi)`` with value ``lo + hi * 2^32`` kept canonical
(< p).  All ops are pure jnp (VPU-friendly, fuse under jit) and are usable both
at trace level and inside Pallas kernel bodies.

Semantics mirror the numpy oracle in ``goldilocks.py`` (which mirrors the Rust
reference ``field/src/goldilocks_field.rs`` / ``cuda/def.cuh:169-558``):
epsilon-reduction with EPSILON = 2^32 - 1, reduce128 for 128-bit products.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import goldilocks as gl

import numpy as _np

U32 = jnp.uint32
# NUMPY scalars: they promote against uint32 arrays identically, and
# (unlike module-level jnp scalars) are embedded as literals at trace time
# rather than captured device constants — Pallas kernels reject the latter
_M16 = _np.uint32(0xFFFF)
_EPS = _np.uint32(0xFFFFFFFF)  # EPSILON = 2^32 - 1 (also p_hi)
_P_LO = _np.uint32(1)
_P_HI = _np.uint32(0xFFFFFFFF)
_ZERO = _np.uint32(0)
_ONE = _np.uint32(1)

# A field element batch is the tuple (lo, hi): two equal-shaped uint32 arrays.
GF = tuple


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def from_u64(x) -> GF:
    """numpy uint64 array (host) -> (lo, hi) uint32 pair.

    Returns NUMPY arrays (jnp ops consume them as constants); materializing
    jnp arrays here would capture tracers when called under jit from an
    lru_cache (constants caches are shared across traces)."""
    import numpy as np

    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def to_u64(a: GF):
    """(lo, hi) device pair -> numpy uint64 array (host)."""
    import numpy as np

    lo = np.asarray(a[0]).astype(np.uint64)
    hi = np.asarray(a[1]).astype(np.uint64)
    return lo | (hi << np.uint64(32))


def full(shape, value: int) -> GF:
    value %= gl.P
    return (jnp.full(shape, value & 0xFFFFFFFF, U32),
            jnp.full(shape, value >> 32, U32))


def zeros(shape) -> GF:
    return jnp.zeros(shape, U32), jnp.zeros(shape, U32)


def ones(shape) -> GF:
    return jnp.ones(shape, U32), jnp.zeros(shape, U32)


# ---------------------------------------------------------------------------
# 32/64-bit building blocks
# ---------------------------------------------------------------------------

def _carry(s, x):
    """carry-out of wrapping add s = x + y, as uint32 0/1."""
    return (s < x).astype(U32)


def mul32(a, b):
    """32x32 -> 64-bit product as (lo32, hi32), via 16-bit partial products."""
    a0 = a & _M16
    a1 = a >> 16
    b0 = b & _M16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid1 = p01 + (p00 >> 16)          # < 2^32, no overflow
    mid2 = p10 + (mid1 & _M16)        # < 2^32, no overflow
    lo = (mid2 << 16) | (p00 & _M16)
    hi = p11 + (mid1 >> 16) + (mid2 >> 16)
    return lo, hi


def add64(a: GF, b: GF):
    """64-bit add with carry-out: returns (lo, hi, carry)."""
    lo = a[0] + b[0]
    c0 = _carry(lo, a[0])
    s1 = a[1] + b[1]
    c1 = _carry(s1, a[1])
    hi = s1 + c0
    c2 = _carry(hi, s1)
    return lo, hi, c1 | c2


def sub64(a: GF, b: GF):
    """64-bit sub with borrow-out: returns (lo, hi, borrow)."""
    lo = a[0] - b[0]
    b0 = (a[0] < b[0]).astype(U32)
    d1 = a[1] - b[1]
    bb1 = (a[1] < b[1]).astype(U32)
    hi = d1 - b0
    bb2 = (d1 < b0).astype(U32)
    return lo, hi, bb1 | bb2


def _ge_p(lo, hi):
    return (hi == _P_HI) & (lo >= _P_LO)


def _canon(lo, hi):
    """one conditional subtract of p (input < 2^64, < 2p)."""
    ge = _ge_p(lo, hi)
    # x - p = x - 2^64 + eps = (wrapping) x + eps  when hi == 0xFFFFFFFF
    clo = lo + _EPS
    chi = hi + _carry(clo, lo)  # hi wraps 0xFFFFFFFF -> 0 (+carry)
    return jnp.where(ge, clo, lo), jnp.where(ge, chi, hi)


# ---------------------------------------------------------------------------
# field ops
# ---------------------------------------------------------------------------

def add(a: GF, b: GF) -> GF:
    lo, hi, over = add64(a, b)
    # on 2^64 overflow, add EPSILON (== 2^64 mod p); no second overflow
    lo2 = lo + (over * _EPS)
    hi2 = hi + _carry(lo2, lo)
    return _canon(lo2, hi2)


def sub(a: GF, b: GF) -> GF:
    lo, hi, borrow = sub64(a, b)
    # on borrow, subtract EPSILON; result canonical
    lo2 = lo - (borrow * _EPS)
    hi2 = hi - (lo < lo2).astype(U32)
    return lo2, hi2


def neg(a: GF) -> GF:
    is_zero = (a[0] == 0) & (a[1] == 0)
    lo = _P_LO - a[0]
    hi = _P_HI - a[1] - (_P_LO < a[0]).astype(U32)
    return jnp.where(is_zero, _ZERO, lo), jnp.where(is_zero, _ZERO, hi)


def mul_wide(a: GF, b: GF):
    """64x64 -> 128-bit product as 4 uint32 limbs (r0..r3, little-endian)."""
    ll_lo, ll_hi = mul32(a[0], b[0])
    lh_lo, lh_hi = mul32(a[0], b[1])
    hl_lo, hl_hi = mul32(a[1], b[0])
    hh_lo, hh_hi = mul32(a[1], b[1])
    r0 = ll_lo
    # r1 = ll_hi + lh_lo + hl_lo
    s = ll_hi + lh_lo
    c = _carry(s, ll_hi)
    r1 = s + hl_lo
    c += _carry(r1, s)
    # r2 = lh_hi + hl_hi + hh_lo + c
    s = lh_hi + hl_hi
    c2 = _carry(s, lh_hi)
    s2 = s + hh_lo
    c2 += _carry(s2, s)
    r2 = s2 + c
    c2 += _carry(r2, s2)
    r3 = hh_hi + c2
    return r0, r1, r2, r3


def reduce128(r0, r1, r2, r3) -> GF:
    """(r0 + r1*2^32 + r2*2^64 + r3*2^96) mod p, canonical.

    value == lo64 - r3 + r2*EPSILON (mod p); mirrors cuda/def.cuh:466-507.
    """
    # t0 = lo64 - r3 (64-bit), on borrow subtract EPSILON more
    t0_lo, t0_hi, borrow = sub64((r0, r1), (r3, _ZERO * r3))
    t0_lo2 = t0_lo - (borrow * _EPS)
    t0_hi2 = t0_hi - (t0_lo < t0_lo2).astype(U32)
    # t1 = r2 * EPSILON = (r2 << 32) - r2
    t1_lo = _ZERO - r2
    t1_hi = r2 - (r2 != 0).astype(U32)
    # t2 = t0 + t1, on carry add EPSILON
    lo, hi, carry = add64((t0_lo2, t0_hi2), (t1_lo, t1_hi))
    lo2 = lo + (carry * _EPS)
    hi2 = hi + _carry(lo2, lo)
    return _canon(lo2, hi2)


def reduce128_nc(r0, r1, r2, r3) -> GF:
    """reduce128 WITHOUT the final canonicalizing subtract: result < 2^64
    and ≡ value (mod p), but may exceed p.  Safe wherever the consumer
    accepts any 64-bit representative (mul_wide/square_wide/add_nc/the
    byte-plane MDS decomposition); do NOT feed comparisons or outputs that
    must be canonical."""
    t0_lo, t0_hi, borrow = sub64((r0, r1), (r3, _ZERO * r3))
    t0_lo2 = t0_lo - (borrow * _EPS)
    t0_hi2 = t0_hi - (t0_lo < t0_lo2).astype(U32)
    t1_lo = _ZERO - r2
    t1_hi = r2 - (r2 != 0).astype(U32)
    lo, hi, carry = add64((t0_lo2, t0_hi2), (t1_lo, t1_hi))
    lo2 = lo + (carry * _EPS)
    hi2 = hi + _carry(lo2, lo)
    return lo2, hi2


def mul(a: GF, b: GF) -> GF:
    return reduce128(*mul_wide(a, b))


def mul_nc(a: GF, b: GF) -> GF:
    """Multiply, result a (possibly non-canonical) 64-bit representative."""
    return reduce128_nc(*mul_wide(a, b))


def add_nc(a: GF, b: GF) -> GF:
    """Add WITHOUT the final canonicalizing subtract: result < 2^64 but may
    exceed p.  Safe wherever the consumer reduces (mul/square/reduce128
    accept any 64-bit representative); do NOT feed comparisons or outputs
    that must be canonical."""
    lo, hi, over = add64(a, b)
    lo2 = lo + (over * _EPS)
    hi2 = hi + _carry(lo2, lo)
    return lo2, hi2


def square_wide(a: GF):
    """64-bit squaring: 3 mul32s instead of mul_wide's 4 (the symmetric
    cross term is shared and doubled)."""
    ll_lo, ll_hi = mul32(a[0], a[0])
    lh_lo, lh_hi = mul32(a[0], a[1])
    hh_lo, hh_hi = mul32(a[1], a[1])
    # double the cross term (lh) as a 65-bit quantity
    x_lo = lh_lo << 1
    x_hi = (lh_hi << 1) | (lh_lo >> 31)
    x_ov = lh_hi >> 31                      # bit 64 of 2*cross
    r0 = ll_lo
    s = ll_hi + x_lo
    c = _carry(s, ll_hi)
    r1 = s
    s2 = x_hi + hh_lo
    c2 = _carry(s2, x_hi)
    r2 = s2 + c
    c2 += _carry(r2, s2)
    r3 = hh_hi + c2 + x_ov
    return r0, r1, r2, r3


def square(a: GF) -> GF:
    return reduce128(*square_wide(a))


def square_nc(a: GF) -> GF:
    return reduce128_nc(*square_wide(a))


def mul_const(a: GF, c: int) -> GF:
    """multiply by a host-known constant."""
    cc = full((), c)
    return mul(a, (jnp.broadcast_to(cc[0], a[0].shape), jnp.broadcast_to(cc[1], a[1].shape)))


def exp_u64(a: GF, e: int) -> GF:
    result = ones(a[0].shape)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def inverse(a: GF) -> GF:
    """Fermat inverse a^(p-2), square-and-multiply under lax.fori_loop.

    The loop keeps the traced graph O(1) (2 muls) instead of unrolling the
    ~128-mul chain — unrolled inverses were the main XLA-compile-time cost
    of the device FRI composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    e = gl.P - 2
    nbits = e.bit_length()
    bits = jnp.asarray(np.array([(e >> (nbits - 1 - i)) & 1
                                 for i in range(nbits)], dtype=np.uint32))

    def body(i, acc):
        acc = mul(acc, acc)
        with_mul = mul(acc, a)
        take = bits[i] == 1
        return select(take, with_mul, acc)

    return jax.lax.fori_loop(1, nbits, body, a)


def select(pred, a: GF, b: GF) -> GF:
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def is_zero(a: GF):
    return (a[0] == 0) & (a[1] == 0)


def eq(a: GF, b: GF):
    return (a[0] == b[0]) & (a[1] == b[1])
