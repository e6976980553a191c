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
    lde = jntt.lde_coset_ntt(coeffs, rate_bits)          # (B, lde_size)
    lde_size = lde[0].shape[-1]
    perm = jntt.bitrev_perm_auto(lde_size)
    leaves = (lde[0][:, perm], lde[1][:, perm])          # (B, lde_size)
    if salt is not None:
        leaves = (jnp.concatenate([leaves[0], salt[0]], axis=0),
                  jnp.concatenate([leaves[1], salt[1]], axis=0))
    levels = mkj.build_digest_levels(leaves, cap_height)
    return leaves, levels


@functools.partial(jax.jit, static_argnums=(1, 2))
def commit_from_coeffs(coeffs, rate_bits: int, cap_height: int, salt=None):
    return _commit_coeffs_core(coeffs, rate_bits, cap_height, salt)


@functools.partial(jax.jit, static_argnums=(1, 2))
def commit_from_values(values, rate_bits: int, cap_height: int, salt=None):
    """values: (B, n) pair -> (coeffs pair, leaves pair, levels)."""
    coeffs = jntt.ntt(values, inverse=True)
    leaves, levels = _commit_coeffs_core(coeffs, rate_bits, cap_height, salt)
    return coeffs, leaves, levels


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
