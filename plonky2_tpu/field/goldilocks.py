"""Goldilocks field (p = 2^64 - 2^32 + 1) — vectorized numpy implementation.

This is the CPU semantic oracle for the whole framework: every TPU kernel is
tested against these routines, which in turn mirror the algebra of the Rust
reference (`field/src/goldilocks_field.rs`): epsilon-reduction arithmetic with
EPSILON = 2^32 - 1, reduce128 for products, two-adicity 32.

All array functions operate elementwise on uint64 numpy arrays holding
canonical values in [0, p).
"""
from __future__ import annotations

import numpy as np

# Field constants (see reference field/src/goldilocks_field.rs:26-90).
P = 0xFFFFFFFF_00000001  # 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF  # 2^32 - 1 == 2^64 mod p
TWO_ADICITY = 32
MULTIPLICATIVE_GROUP_GENERATOR = 7
# g_2^32 = 7^((p-1) / 2^32) mod p — the canonical 2^32-nd primitive root.
POWER_OF_TWO_GENERATOR = pow(7, (P - 1) >> TWO_ADICITY, P)

_U64 = np.uint64
_M32 = _U64(0xFFFFFFFF)
_P = _U64(P)
_EPS = _U64(EPSILON)


def to_arr(x) -> np.ndarray:
    """Coerce ints / lists / arrays to canonical uint64 field elements."""
    a = np.asarray(x, dtype=np.object_) if isinstance(x, (list, tuple)) and any(
        isinstance(v, int) and v >= 1 << 63 for v in x
    ) else x
    a = np.asarray(a)
    if a.dtype == np.object_:
        a = np.array([int(v) % P for v in a.ravel()], dtype=_U64).reshape(a.shape)
    else:
        a = a.astype(_U64)
    return a


def add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # wrapping is intentional
        s = a + b
        over = s < a
        s = np.where(over, s + _EPS, s)
        return np.where(s >= _P, s - _P, s)


def sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):  # wrapping is intentional
        d = a - b
        borrow = a < b
        return np.where(borrow, d - _EPS, d)


def neg(a: np.ndarray) -> np.ndarray:
    return np.where(a == 0, a, _P - a)


def _mul_wide(a: np.ndarray, b: np.ndarray):
    """64x64 -> 128-bit product as (lo64, hi64) uint64 pairs."""
    with np.errstate(over="ignore"):  # wrapping u64 arithmetic is intentional
        a_lo = a & _M32
        a_hi = a >> _U64(32)
        b_lo = b & _M32
        b_hi = b >> _U64(32)
        ll = a_lo * b_lo
        lh = a_lo * b_hi
        hl = a_hi * b_lo
        hh = a_hi * b_hi
        mid = lh + hl  # wrapping
        mid_carry = (mid < lh).astype(_U64)
        lo = ll + (mid << _U64(32))
        carry2 = (lo < ll).astype(_U64)
        hi = hh + (mid >> _U64(32)) + (mid_carry << _U64(32)) + carry2
        return lo, hi


def reduce128(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Reduce a 128-bit value (lo + hi*2^64) mod p, canonical output.

    Mirrors reference reduce128 (cuda/def.cuh:466-507): with hi = n3*2^32+n2,
    value == lo - n3 + n2*EPSILON (mod p).
    """
    with np.errstate(over="ignore"):  # wrapping u64 arithmetic is intentional
        hi_hi = hi >> _U64(32)
        hi_lo = hi & _M32
        t0 = lo - hi_hi
        t0 = np.where(lo < hi_hi, t0 - _EPS, t0)
        t1 = hi_lo * _EPS
        t2 = t0 + t1
        t2 = np.where(t2 < t1, t2 + _EPS, t2)
        return np.where(t2 >= _P, t2 - _P, t2)


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lo, hi = _mul_wide(a, b)
    return reduce128(lo, hi)


def square(a: np.ndarray) -> np.ndarray:
    return mul(a, a)


def exp_u64(a: np.ndarray, e: int) -> np.ndarray:
    """a ** e (e a python int) via square-and-multiply, vectorized."""
    a = np.asarray(a, dtype=_U64)
    result = np.full(a.shape, 1, dtype=_U64)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def inverse(a: np.ndarray) -> np.ndarray:
    """Elementwise inverse; inverse(0) == 0 by convention (never hit on
    honest traces).

    Small inputs use the Fermat chain (~96 vector muls).  Large arrays use
    a vectorized Montgomery batch inversion (prefix products over blocks of
    64 lanes + ONE Fermat inverse on the 64x-smaller block-product column
    + backward unwinding): ~3 muls per element instead of ~96 — the
    difference between milliseconds and minutes for the prover's
    (degree x num_routed_wires) denominator inversions at 2^18 scale."""
    arr = np.asarray(a, dtype=_U64)
    if arr.size <= 4096:
        return exp_u64(arr, P - 2)
    block = 64
    flat = arr.reshape(-1)
    n = flat.shape[0]
    m = -(-n // block)
    pad = m * block - n
    if pad:
        flat = np.concatenate([flat, np.ones(pad, dtype=_U64)])
    zeros = flat == 0
    if zeros.any():
        flat = np.where(zeros, _U64(1), flat)
    cols = flat.reshape(m, block)
    prefix = np.empty_like(cols)            # prefix[:, j] = prod cols[:, :j]
    acc = np.ones(m, dtype=_U64)
    for j in range(block):
        prefix[:, j] = acc
        acc = mul(acc, cols[:, j])
    inv_acc = exp_u64(acc, P - 2)           # (m,) Fermat on the block products
    out = np.empty_like(cols)
    for j in range(block - 1, -1, -1):
        out[:, j] = mul(inv_acc, prefix[:, j])
        inv_acc = mul(inv_acc, cols[:, j])
    res = out.reshape(-1)
    if zeros.any():
        res = np.where(zeros, _U64(0), res)
    return res[:n].reshape(arr.shape)


def batch_multiplicative_inverse(a: np.ndarray) -> np.ndarray:
    """Montgomery batch inversion over the last axis (matches reference
    field/src/types.rs batch_multiplicative_inverse semantics for nonzero
    inputs)."""
    flat = a.reshape(-1)
    n = flat.shape[0]
    if n == 0:
        return a
    prefix = np.empty_like(flat)
    acc = _U64(1)
    # sequential but cheap vs. field sizes used on host
    for i in range(n):
        prefix[i] = acc
        acc = mul(acc, flat[i])
    inv_acc = inverse(acc)
    out = np.empty_like(flat)
    for i in range(n - 1, -1, -1):
        out[i] = mul(inv_acc, prefix[i])
        inv_acc = mul(inv_acc, flat[i])
    return out.reshape(a.shape)


def powers(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] via log-doubling (vectorized)."""
    out = np.empty(n, dtype=_U64)
    if n == 0:
        return out
    out[0] = 1
    length = 1
    b = _U64(base % P)
    step = b
    while length < n:
        take = min(length, n - length)
        out[length:length + take] = mul(out[:take], np.full(take, step, dtype=_U64))
        length += take
        step = mul(step, step) if length < n else step
    return out


def modsum(a: np.ndarray, axis=-1) -> np.ndarray:
    """Exact modular sum along an axis (splits 32-bit halves so partial sums
    never overflow uint64; valid for up to 2^26 canonical summands)."""
    a = np.asarray(a, dtype=_U64)
    assert a.shape[axis] <= (1 << 26)
    lo = (a & _M32).sum(axis=axis)
    hi = (a >> _U64(32)).sum(axis=axis)
    low = lo + ((hi & _M32) << _U64(32))
    carry = (low < lo).astype(_U64)
    high = (hi >> _U64(32)) + carry
    return reduce128(low, high)


def prefix_prod_inclusive(a: np.ndarray) -> np.ndarray:
    """out[i] = prod_{j<=i} a[j], via log-doubling vectorized muls."""
    x = np.asarray(a, dtype=_U64).copy()
    n = x.shape[0]
    shift = 1
    while shift < n:
        y = x.copy()
        y[shift:] = mul(x[shift:], x[:-shift])
        x = y
        shift <<= 1
    return x


def prefix_prod_exclusive(a: np.ndarray) -> np.ndarray:
    """out[i] = prod_{j<i} a[j] (out[0]=1), via log-doubling vectorized muls."""
    a = np.asarray(a, dtype=_U64)
    n = a.shape[0]
    x = np.ones(n, dtype=_U64)
    x[1:] = a[:-1]
    shift = 1
    while shift < n:
        y = x.copy()
        y[shift:] = mul(x[shift:], x[:-shift])
        x = y
        shift <<= 1
    return x


# ---------------------------------------------------------------------------
# scalar (python-int) helpers for host protocol logic
# ---------------------------------------------------------------------------

def s_add(a: int, b: int) -> int:
    return (a + b) % P


def s_sub(a: int, b: int) -> int:
    return (a - b) % P


def s_mul(a: int, b: int) -> int:
    return (a * b) % P


def s_inv(a: int) -> int:
    return pow(a, P - 2, P)


def s_exp(a: int, e: int) -> int:
    return pow(a, e, P)


def primitive_root_of_unity(n_log: int) -> int:
    """Canonical 2^n_log-th root: g_{2^32}^(2^(32-n_log)) — matches reference
    Field::primitive_root_of_unity (field/src/types.rs)."""
    assert 0 <= n_log <= TWO_ADICITY
    return pow(POWER_OF_TWO_GENERATOR, 1 << (TWO_ADICITY - n_log), P)


def two_adic_subgroup(n_log: int) -> np.ndarray:
    g = primitive_root_of_unity(n_log)
    return powers(g, 1 << n_log)


def coset_shift() -> int:
    """The LDE coset shift = multiplicative group generator (= 7),
    reference cuda/def.cuh:204 / field/src/goldilocks_field.rs."""
    return MULTIPLICATIVE_GROUP_GENERATOR
