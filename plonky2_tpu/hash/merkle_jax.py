"""Device-side Merkle construction — batched Poseidon over leaf columns.

Mirrors the reference GPU pipeline (hash_leaves_kernel + reduce_digests_kernel,
cuda/plonky2_gpu_impl.cuh:350-462) in COLUMN-MAJOR layout: leaves are (L, N)
(leaf i = column i) and digest levels are (4, N_k).  TPU tiling pads the
minor axis to 128 lanes, so the row-major (N, small) layouts of round 1
wasted 8-32x HBM; column-major keeps the huge axis minor.

On real TPU the leaf sponge and the wide compress levels run as Pallas
kernels (hash/poseidon_pallas.py — VMEM-resident state, MXU MDS); narrow
tails and CPU runs use the XLA sponge (hash/poseidon_jax.py).  Both are
bit-identical to the numpy oracle.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..field import gf_jax as gf
from ..utils.bits import log2_strict
from . import poseidon_jax as pj

# narrowest batch worth a Pallas dispatch; below it the XLA sponge wins.
# v2 naive-schedule kernel (round 5): tile 2048 measured fastest
# (27.9 M perms/s vs 26.3 at 512; the v1 fast-schedule kernel preferred
# 512).  Leaf block at 2048 lanes = (234, 2048) x 8 B = 3.8 MB — well
# inside VMEM.
_MIN_PALLAS_N = 1 << 11
_PALLAS_TILE = 1 << 11


def _sponge_tile(L: int, N: int) -> int:
    """Lane-tile for the Pallas sponge, scaled down for tall leaf columns.

    Mosaic double-buffers each (L, tile) lo/hi leaf block, so VMEM cost is
    ~L*tile*4B*2(buffers)*2(lo,hi).  The default tile 2048 fits the
    flagship's L=238 (7.8 MB) but a wide STARK trace commit (EVM CPU
    table: L=2481, observed) hits 77.75 MB against the 16 MB scoped
    limit.  Halve the tile until the block fits a 14 MB budget (under the
    16 MB default, with headroom for the kernel's state/tables); the
    flagship shape keeps tile 2048 (same kernel, same cache key)."""
    t = _PALLAS_TILE
    while t > 256 and L * t * 16 > 14 * 1024 * 1024:
        t //= 2
    if L * t * 16 > 14 * 1024 * 1024:
        return 0   # even the smallest tile can't fit: use the XLA sponge
    return t


def _pallas_mode():
    from . import poseidon_pallas as pp
    if not pp.sponge_enabled():
        return None
    return pp.sponge_interpret()


def hash_leaves_or_noop_cols(leaves):
    """leaves: (L, N) pair -> (4, N) digest pair."""
    lo, hi = leaves
    L, N = lo.shape
    if L <= 4:
        pad = 4 - L
        return (jnp.pad(lo, ((0, pad), (0, 0))),
                jnp.pad(hi, ((0, pad), (0, 0))))
    interp = _pallas_mode()
    tile = _sponge_tile(L, N)
    if interp is not None and tile and N >= _MIN_PALLAS_N and N % tile == 0:
        from . import poseidon_pallas as pp
        return pp.hash_leaves_cols_pallas(leaves, tile=tile,
                                          interpret=interp)
    return pj.hash_leaves_cols(leaves)


def _compress_level(cur_lo, cur_hi):
    left = (cur_lo[:, 0::2], cur_hi[:, 0::2])
    right = (cur_lo[:, 1::2], cur_hi[:, 1::2])
    m = left[0].shape[1]
    interp = _pallas_mode()
    if interp is not None and m >= _MIN_PALLAS_N and m % _PALLAS_TILE == 0:
        from . import poseidon_pallas as pp
        return pp.compress_pairs_cols_pallas(left, right,
                                             tile=_PALLAS_TILE,
                                             interpret=interp)
    return pj.compress_pairs_cols(left, right)


def build_digest_levels(leaves, cap_height: int):
    """leaves (L, N) pair -> list of (4, N/2^k) digest pairs, ending at the
    cap level."""
    lo, _ = leaves
    n = lo.shape[1]
    bits = log2_strict(n)
    assert cap_height <= bits
    levels = [hash_leaves_or_noop_cols(leaves)]
    for _ in range(bits - cap_height):
        cur_lo, cur_hi = levels[-1]
        levels.append(_compress_level(cur_lo, cur_hi))
    return levels


def merkle_levels_u64(leaves_u64, cap_height: int):
    """Convenience: numpy u64 leaves (N, L) in, numpy u64 digest levels
    (N_k, 4) out (batch-major host contract)."""
    lo, hi = gf.from_u64(leaves_u64)
    levels = build_digest_levels((lo.T, hi.T), cap_height)
    import numpy as np
    return [gf.to_u64((np.asarray(lv[0]).T, np.asarray(lv[1]).T))
            for lv in levels]
