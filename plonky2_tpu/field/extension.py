"""Quadratic extension field F_{p^2} = F_p[X]/(X^2 - 7) — numpy host ops.

Mirrors the reference quadratic extension (field/src/extension/quadratic.rs,
goldilocks_extensions.rs:14-28): W = 7, two-adicity 33 with
EXT_POWER_OF_TWO_GENERATOR = (0, 15659105665374529263).

Elements are uint64 arrays with a trailing axis of size 2: (..., 2).
Scalar helpers use python-int tuples (a0, a1).
"""
from __future__ import annotations

import numpy as np

from . import goldilocks as gl

D = 2
W = 7
EXT_TWO_ADICITY = 33
# reference goldilocks_extensions.rs:27
EXT_POWER_OF_TWO_GENERATOR = (0, 15659105665374529263)
DTH_ROOT = 18446744069414584320  # W^((p-1)/2) == p - 1


def from_base(a: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.uint64)
    out = np.zeros((*a.shape, 2), dtype=np.uint64)
    out[..., 0] = a
    return out


def add(a, b):
    return gl.add(a, b)


def sub(a, b):
    return gl.sub(a, b)


def neg(a):
    return gl.neg(a)


def mul(a, b):
    """(a0 + a1 X)(b0 + b1 X) = a0 b0 + W a1 b1 + (a0 b1 + a1 b0) X."""
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    c0 = gl.add(gl.mul(a0, b0), gl.mul(np.uint64(W), gl.mul(a1, b1)))
    c1 = gl.add(gl.mul(a0, b1), gl.mul(a1, b0))
    return np.stack([c0, c1], axis=-1)


def scalar_mul(a, s):
    """multiply by base-field s (array or int)."""
    return gl.mul(a, np.uint64(s) if np.isscalar(s) or isinstance(s, int) else s[..., None])


def square(a):
    return mul(a, a)


def inverse(a):
    """(a0 - a1 X) / (a0^2 - W a1^2)."""
    a0, a1 = a[..., 0], a[..., 1]
    denom = gl.sub(gl.mul(a0, a0), gl.mul(np.uint64(W), gl.mul(a1, a1)))
    dinv = gl.inverse(denom)
    return np.stack([gl.mul(a0, dinv), gl.mul(gl.neg(a1), dinv)], axis=-1)


def exp_u64(a, e: int):
    result = from_base(np.ones(a.shape[:-1], dtype=np.uint64))
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def powers(base, n: int) -> np.ndarray:
    """(n, 2) array of base^0..base^(n-1); base: shape (2,)."""
    out = np.zeros((n, 2), dtype=np.uint64)
    if n == 0:
        return out
    out[0, 0] = 1
    for i in range(1, n):
        out[i] = mul(out[i - 1], base)
    return out


def primitive_root_of_unity(n_log: int) -> np.ndarray:
    """Canonical 2^n_log-th root in the extension (matches reference
    Field::primitive_root_of_unity over QuadraticExtension)."""
    assert 0 <= n_log <= EXT_TWO_ADICITY
    g = np.array(EXT_POWER_OF_TWO_GENERATOR, dtype=np.uint64)
    return exp_u64(g, 1 << (EXT_TWO_ADICITY - n_log))


def frobenius(a):
    """a^p: (a0, a1) -> (a0, DTH_ROOT * a1)."""
    a0, a1 = a[..., 0], a[..., 1]
    return np.stack([a0, gl.mul(np.uint64(DTH_ROOT), a1)], axis=-1)


# ---------------------------------------------------------------------------
# scalar (python tuple) helpers
# ---------------------------------------------------------------------------

# int() coercion guards against numpy scalars sneaking in: uint64 products
# would silently wrap instead of doing arbitrary-precision arithmetic.

def s_mul(a, b):
    a0, a1 = int(a[0]), int(a[1])
    b0, b1 = int(b[0]), int(b[1])
    return ((a0 * b0 + W * a1 * b1) % gl.P, (a0 * b1 + a1 * b0) % gl.P)


def s_add(a, b):
    return ((int(a[0]) + int(b[0])) % gl.P, (int(a[1]) + int(b[1])) % gl.P)


def s_sub(a, b):
    return ((int(a[0]) - int(b[0])) % gl.P, (int(a[1]) - int(b[1])) % gl.P)


def s_inv(a):
    a0, a1 = int(a[0]), int(a[1])
    denom = (a0 * a0 - W * a1 * a1) % gl.P
    dinv = pow(denom, gl.P - 2, gl.P)
    return ((a0 * dinv) % gl.P, (-a1 * dinv) % gl.P)


def s_exp(a, e: int):
    result = (1, 0)
    base = a
    while e > 0:
        if e & 1:
            result = s_mul(result, base)
        e >>= 1
        if e:
            base = s_mul(base, base)
    return result
