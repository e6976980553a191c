"""Fused device commit pipeline — the TPU equivalent of the reference's
`merkle_tree_from_coeffs` kernel sequence (cuda/plonky2_gpu.cu:435-606):

    ifft -> zero-pad LDE -> coset-shift mul -> fft -> bit-reverse rows ->
    Poseidon leaf hash -> Merkle level reduction

All stages trace into one jit so XLA fuses the elementwise work between NTT
passes; leaves and digest levels come back together.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..field import gf_jax as gf
from ..hash import merkle_jax as mkj
from ..utils.bits import bit_reverse_indices
from . import ntt as jntt


def _commit_coeffs_core(coeffs, rate_bits: int, cap_height: int):
    """coeffs: (B, n) pair -> (leaves (lde, B) pair, levels list of pairs)."""
    lde = jntt.lde_coset_ntt(coeffs, rate_bits)          # (B, lde_size)
    lde_size = lde[0].shape[-1]
    # transpose to leaf-major and bit-reverse rows (leaf i = natural row rev(i))
    perm = jntt.bitrev_perm(lde_size)
    leaves = (lde[0].T[perm], lde[1].T[perm])            # (lde_size, B)
    levels = mkj.build_digest_levels(leaves, cap_height)
    return leaves, levels


@functools.partial(jax.jit, static_argnums=(1, 2))
def commit_from_coeffs(coeffs, rate_bits: int, cap_height: int):
    return _commit_coeffs_core(coeffs, rate_bits, cap_height)


@functools.partial(jax.jit, static_argnums=(1, 2))
def commit_from_values(values, rate_bits: int, cap_height: int):
    """values: (B, n) pair -> (coeffs pair, leaves pair, levels)."""
    coeffs = jntt.ntt(values, inverse=True)
    leaves, levels = _commit_coeffs_core(coeffs, rate_bits, cap_height)
    return coeffs, leaves, levels
