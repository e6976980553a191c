"""Fused device commit pipeline — the TPU equivalent of the reference's
`merkle_tree_from_coeffs` kernel sequence (cuda/plonky2_gpu.cu:435-606):

    ifft -> zero-pad LDE -> coset-shift mul -> fft -> bit-reverse rows ->
    [append salt columns] -> Poseidon leaf hash -> Merkle level reduction

All stages trace into one jit so XLA fuses the elementwise work between NTT
passes.  Unlike round 1, results STAY on device (fri/oracle.py keeps the
leaf matrix and digest levels resident; only the cap is copied back) —
mirroring the reference's resident device arena (fri/oracle.rs:403-460).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..field import gf_jax as gf
from ..hash import merkle_jax as mkj
from ..utils.bits import bit_reverse_indices
from . import ntt as jntt


def _commit_coeffs_core(coeffs, rate_bits: int, cap_height: int, salt=None):
    """coeffs: (B, n) pair -> (leaves (B[+4], lde) pair, levels list of
    (4, N_k) pairs).

    Leaves live in COLUMN-MAJOR layout (leaf i = column i, already in
    bit-reversed order): no transpose is materialized and — decisively —
    the minor axis is the huge one, so TPU (8,128) tiling pads ~nothing.
    The round-1 (lde, B) layout padded B -> 128 lanes: up to 8x HBM blowup
    that OOM'd 2^18-row commits.

    `salt` is an optional (4, lde) pair of blinding rows appended before
    hashing (reference oracle.rs:41 SALT_SIZE=4)."""
    leaves = jntt.lde_coset_ntt_bitrev(coeffs, rate_bits)  # (B, lde_size)
    if salt is not None:
        leaves = (jnp.concatenate([leaves[0], salt[0]], axis=0),
                  jnp.concatenate([leaves[1], salt[1]], axis=0))
    levels = mkj.build_digest_levels(leaves, cap_height)
    return leaves, levels


@functools.partial(jax.jit, static_argnums=(1, 2))
def _commit_from_coeffs_fused(coeffs, rate_bits: int, cap_height: int,
                              salt=None):
    return _commit_coeffs_core(coeffs, rate_bits, cap_height, salt)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _commit_from_values_fused(values, rate_bits: int, cap_height: int,
                              salt=None):
    """values: (B, n) pair -> (coeffs pair, leaves pair, levels)."""
    coeffs = jntt.ntt(values, inverse=True)
    leaves, levels = _commit_coeffs_core(coeffs, rate_bits, cap_height, salt)
    return coeffs, leaves, levels


# -- chunked big-shape pipeline ---------------------------------------------
#
# At the flagship shape (234 polys x 2^21 LDE) the fused jit holds the NTT
# working set, the bit-reversal gather copy AND the leaf buffer live at
# once (~23 GB) — over a v5e's 16 GB.  The reference streams one poly at a
# time through its arena for the same reason (plonky2_gpu.cu:435-606).
# Here: phase A runs poly BLOCKS through IFFT/LDE/NTT/bit-rev and writes
# into a donated leaf buffer (peak = leaves + one block's working set);
# phase B hashes leaves in DOMAIN chunks under lax.map (bounds the sponge
# temps) and reduces the digest levels.

import os

_POLY_BLOCK = 32
# Env overrides let small-shape harnesses (dryrun_multichip, multiproc
# dryrun, tests) force the chunked path so the flagship-scale code compiles
# and executes sharded without flagship-scale memory.
_CHUNK_BYTES_THRESHOLD = int(os.environ.get("PLONKY2_TPU_CHUNK_BYTES",
                                            1 << 28))
_DOMAIN_CHUNK = int(os.environ.get("PLONKY2_TPU_DOMAIN_CHUNK", 1 << 18))


@functools.partial(jax.jit, static_argnums=(4, 5),
                   donate_argnums=(0, 1, 2, 3))
def _ntt_block_write(leaves_lo, leaves_hi, coeffs_lo, coeffs_hi, rate_bits,
                     from_values, block, b0):
    """Run one poly block through (IFFT ->) LDE -> coset NTT -> bit-rev and
    write its rows at [b0, b0+blk) of the donated leaves/coeffs buffers."""
    if from_values:
        cblock = jntt.ntt(block, inverse=True)
    else:
        cblock = block
    rows = jntt.lde_coset_ntt_bitrev(cblock, rate_bits)
    leaves_lo = jax.lax.dynamic_update_slice(leaves_lo, rows[0], (b0, 0))
    leaves_hi = jax.lax.dynamic_update_slice(leaves_hi, rows[1], (b0, 0))
    coeffs_lo = jax.lax.dynamic_update_slice(coeffs_lo, cblock[0], (b0, 0))
    coeffs_hi = jax.lax.dynamic_update_slice(coeffs_hi, cblock[1], (b0, 0))
    return leaves_lo, leaves_hi, coeffs_lo, coeffs_hi


@functools.partial(jax.jit, static_argnums=(1, 2))
def _hash_and_reduce(leaves, cap_height: int, domain_chunk: int):
    """leaves (L, N) pair -> digest levels; the leaf sponge runs per domain
    chunk under lax.map so its (12, chunk) state temps stay bounded."""
    lo, hi = leaves
    L, N = lo.shape
    if N <= domain_chunk:
        return mkj.build_digest_levels(leaves, cap_height)
    nchunk = N // domain_chunk
    resh_lo = lo.reshape(L, nchunk, domain_chunk)
    resh_hi = hi.reshape(L, nchunk, domain_chunk)

    def body(i):
        return mkj.hash_leaves_or_noop_cols((resh_lo[:, i], resh_hi[:, i]))

    d = jax.lax.map(body, jnp.arange(nchunk))   # (nchunk, 4, chunk) pair
    digests = (d[0].transpose(1, 0, 2).reshape(4, N),
               d[1].transpose(1, 0, 2).reshape(4, N))
    levels = [digests]
    from ..utils.bits import log2_strict
    for _ in range(log2_strict(N) - cap_height):
        cur_lo, cur_hi = levels[-1]
        from ..hash import poseidon_jax as pj
        levels.append(pj.compress_pairs_cols(
            (cur_lo[:, 0::2], cur_hi[:, 0::2]),
            (cur_lo[:, 1::2], cur_hi[:, 1::2])))
    return levels


def _zeros_sharded(shape, axis: int):
    """jnp.zeros placed with the active mesh's "d" axis on `axis` (so the
    chunked pipeline's resident buffers stay sharded under mesh_sharding —
    plain jnp.zeros would pin them to one device and undo the sharding the
    prover placed on its inputs)."""
    from ..runtime import meshctx
    mesh = meshctx.active_mesh()
    if mesh is None or shape[axis] % mesh.devices.size != 0:
        return jnp.zeros(shape, jnp.uint32)
    from jax.sharding import NamedSharding, PartitionSpec
    spec = [None] * len(shape)
    spec[axis] = "d"
    return jnp.zeros(shape, jnp.uint32,
                     device=NamedSharding(mesh, PartitionSpec(*spec)))


def _commit_chunked(pair, rate_bits: int, cap_height: int, salt,
                    from_values: bool):
    B, n = pair[0].shape
    lde_size = n << rate_bits
    salt_rows = salt[0].shape[0] if salt is not None else 0
    leaves_lo = _zeros_sharded((B + salt_rows, lde_size), 1)
    leaves_hi = _zeros_sharded((B + salt_rows, lde_size), 1)
    coeffs_lo = _zeros_sharded((B, n), 1)
    coeffs_hi = _zeros_sharded((B, n), 1)
    for b0 in range(0, B, _POLY_BLOCK):
        blk = min(_POLY_BLOCK, B - b0)
        block = (jnp.asarray(pair[0][b0:b0 + blk]),
                 jnp.asarray(pair[1][b0:b0 + blk]))
        leaves_lo, leaves_hi, coeffs_lo, coeffs_hi = _ntt_block_write(
            leaves_lo, leaves_hi, coeffs_lo, coeffs_hi, rate_bits,
            from_values, block, b0)
    if salt is not None:
        leaves_lo = leaves_lo.at[B:].set(salt[0])
        leaves_hi = leaves_hi.at[B:].set(salt[1])
    leaves = (leaves_lo, leaves_hi)
    levels = _hash_and_reduce(leaves, cap_height, _DOMAIN_CHUNK)
    return (coeffs_lo, coeffs_hi), leaves, levels


def commit_from_values(values, rate_bits: int, cap_height: int, salt=None):
    B, n = values[0].shape
    if B * (n << rate_bits) * 8 > _CHUNK_BYTES_THRESHOLD:
        return _commit_chunked(values, rate_bits, cap_height, salt, True)
    return _commit_from_values_fused(values, rate_bits, cap_height, salt)


def commit_from_coeffs(polys, rate_bits: int, cap_height: int, salt=None):
    B, n = polys[0].shape
    if B * (n << rate_bits) * 8 > _CHUNK_BYTES_THRESHOLD:
        _, leaves, levels = _commit_chunked(polys, rate_bits, cap_height,
                                            salt, False)
        return leaves, levels
    return _commit_from_coeffs_fused(polys, rate_bits, cap_height, salt)


def device_salt(lde_size: int, seed: int | None = None,
                salt_rng=None):
    """(4, lde_size) blinding rows as a device GF pair.

    With `salt_rng` (tests / host-parity) the salt is drawn host-side from
    the given numpy Generator, byte-identical to the host path; otherwise
    it is generated on device with the JAX PRNG (values reduced mod p — the
    2^-32 bias is irrelevant for blinding)."""
    from ..field import goldilocks as gl
    if salt_rng is not None:
        # host path draws row-major (lde, 4) — keep the identical draw
        # order for byte-parity, then transpose
        salt = salt_rng.integers(0, gl.P, size=(lde_size, 4),
                                 dtype=np.uint64).T.copy()
        lo, hi = gf.from_u64(salt)
        return jnp.asarray(lo), jnp.asarray(hi)
    if seed is None:
        import secrets
        seed = secrets.randbits(63)
    key = jax.random.PRNGKey(seed)
    bits = jax.random.bits(key, (2, 4, lde_size), dtype=jnp.uint32)
    lo, hi = bits[0], bits[1]
    # one conditional subtract brings (lo, hi) < 2^64 into [0, p)
    return gf._canon(lo, hi)
