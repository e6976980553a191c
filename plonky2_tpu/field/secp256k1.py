"""secp256k1 base and scalar fields (reference field/src/secp256k1_base.rs,
secp256k1_scalar.rs).

Non-native fields are plain python ints mod their order in this framework
(the in-circuit representation lives in gadgets/nonnative.py); this module
carries the field constants and scalar helpers for parity with the
reference's field crate.
"""
from __future__ import annotations

SECP256K1_BASE_ORDER = \
    0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
SECP256K1_SCALAR_ORDER = \
    0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

# reference secp256k1_base.rs / secp256k1_scalar.rs multiplicative generators
BASE_MULTIPLICATIVE_GROUP_GENERATOR = 3
SCALAR_MULTIPLICATIVE_GROUP_GENERATOR = 7

# two-adicity of p-1 / n-1
BASE_TWO_ADICITY = 1
SCALAR_TWO_ADICITY = 6


def base_add(a: int, b: int) -> int:
    return (a + b) % SECP256K1_BASE_ORDER


def base_mul(a: int, b: int) -> int:
    return a * b % SECP256K1_BASE_ORDER


def base_inverse(a: int) -> int:
    return pow(a, -1, SECP256K1_BASE_ORDER)


def scalar_add(a: int, b: int) -> int:
    return (a + b) % SECP256K1_SCALAR_ORDER


def scalar_mul(a: int, b: int) -> int:
    return a * b % SECP256K1_SCALAR_ORDER


def scalar_inverse(a: int) -> int:
    return pow(a, -1, SECP256K1_SCALAR_ORDER)


def base_to_scalar(x: int) -> int:
    """reference curve_types.rs:280 (noncanonical biguint reinterpretation)."""
    return x % SECP256K1_SCALAR_ORDER


def scalar_to_base(x: int) -> int:
    return x % SECP256K1_BASE_ORDER
