"""Device-side Merkle construction — JAX, batched Poseidon over leaf rows.

Mirrors the reference GPU pipeline (hash_leaves_kernel + reduce_digests_kernel,
cuda/plonky2_gpu_impl.cuh:350-462) as pure JAX: one vectorized sponge over all
N leaves, then log2(N) - cap_height vectorized compression rounds.  Returns
the same level-major digest list the host MerkleTree uses.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..field import gf_jax as gf
from ..utils.bits import log2_strict
from . import poseidon_jax as pj


def hash_leaves_or_noop(leaves):
    """leaves: (N, L) pair -> (N, 4) digest pair."""
    lo, hi = leaves
    N, L = lo.shape
    if L <= 4:
        pad = 4 - L
        return (jnp.pad(lo, ((0, 0), (0, pad))), jnp.pad(hi, ((0, 0), (0, pad))))
    return pj.hash_leaves(leaves)


def build_digest_levels(leaves, cap_height: int):
    """Returns list of (N/2^k, 4) digest pairs, ending at the cap level."""
    lo, _ = leaves
    n = lo.shape[0]
    bits = log2_strict(n)
    assert cap_height <= bits
    levels = [hash_leaves_or_noop(leaves)]
    for _ in range(bits - cap_height):
        cur_lo, cur_hi = levels[-1]
        left = (cur_lo[0::2], cur_hi[0::2])
        right = (cur_lo[1::2], cur_hi[1::2])
        levels.append(pj.compress_pairs(left, right))
    return levels


def merkle_levels_u64(leaves_u64, cap_height: int):
    """Convenience: numpy u64 leaves in, numpy u64 digest levels out."""
    levels = build_digest_levels(gf.from_u64(leaves_u64), cap_height)
    return [gf.to_u64(lv) for lv in levels]
