"""Poseidon-12 permutation on TPU — JAX over (lo, hi) uint32-pair field reps.

Vectorized across an arbitrary leaf batch: state is a pair of uint32 arrays of
shape (..., 12).  The MDS layer decomposes the 64-bit state into four 16-bit
limb planes and runs four (..., 12) x (12, 12) int32 matmuls (the matrix
entries are < 64, so partial sums stay < 2^26 — exact in int32 and eligible
for the MXU), then recombines limbs and epsilon-reduces.

Matches the numpy oracle ``hash.poseidon`` exactly (same 30-round naive
schedule; reference KAT-verified).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..field import gf_jax as gf
from . import poseidon as pos

WIDTH = pos.WIDTH
SPONGE_RATE = pos.SPONGE_RATE

_MDS_I32 = jnp.asarray(pos.MDS_MATRIX.astype(np.int32))  # (12, 12), entries < 64


@functools.lru_cache(maxsize=None)
def _round_constant_pairs():
    """(lo, hi) uint32 arrays of shape (30, 12)."""
    rc = pos.ALL_ROUND_CONSTANTS.reshape(pos.N_ROUNDS, WIDTH)
    return gf.from_u64(rc)


def _sbox(x):
    x2 = gf.mul(x, x)
    x3 = gf.mul(x2, x)
    x4 = gf.mul(x2, x2)
    return gf.mul(x3, x4)


def _mds(state):
    lo, hi = state
    m = _MDS_I32.T  # act on last axis: out[..., r] = sum_c v[..., c] * M[r, c]
    planes = [
        (lo & 0xFFFF).astype(jnp.int32),
        (lo >> 16).astype(jnp.int32),
        (hi & 0xFFFF).astype(jnp.int32),
        (hi >> 16).astype(jnp.int32),
    ]
    # t[k] = plane_k @ M^T, exact in int32 (< 2^26)
    t = [jnp.matmul(p, m, preferred_element_type=jnp.int32).astype(jnp.uint32)
         for p in planes]
    # acc = t0 + t1*2^16 + t2*2^32 + t3*2^48, each t < 2^26:
    # normalize into 16-bit limbs c0..c5 (all fit u32 comfortably)
    c0 = t[0] & 0xFFFF
    r = t[0] >> 16
    s = t[1] + r
    c1 = s & 0xFFFF
    r = s >> 16
    s = t[2] + r
    c2 = s & 0xFFFF
    r = s >> 16
    s = t[3] + r
    c3 = s & 0xFFFF
    r = s >> 16
    c4 = r & 0xFFFF
    c5 = r >> 16
    s0 = c0 | (c1 << 16)
    s1 = c2 | (c3 << 16)
    s2 = c4 | (c5 << 16)
    zero = jnp.zeros_like(s2)
    return gf.reduce128(s0, s1, s2, zero)


def _full_round(carry, rc):
    s = gf.add(carry, rc)
    s = _sbox(s)
    return _mds(s), None


def _partial_round(carry, rc):
    s = gf.add(carry, rc)
    s0 = _sbox((s[0][..., :1], s[1][..., :1]))
    s = (jnp.concatenate([s0[0], s[0][..., 1:]], axis=-1),
         jnp.concatenate([s0[1], s[1][..., 1:]], axis=-1))
    return _mds(s), None


def poseidon(state):
    """Permutation: state = (lo, hi) uint32 pair, shape (..., 12).

    Rounds run under lax.scan (4 full / 22 partial / 4 full) so the traced
    graph holds one round body each instead of 30 — keeps XLA compile time of
    the fused commit pipeline sane."""
    import jax

    rc_lo, rc_hi = _round_constant_pairs()
    h = pos.HALF_N_FULL_ROUNDS
    p = pos.N_PARTIAL_ROUNDS
    state = (jnp.asarray(state[0]), jnp.asarray(state[1]))
    state, _ = jax.lax.scan(_full_round, state, (rc_lo[:h], rc_hi[:h]))
    state, _ = jax.lax.scan(_partial_round, state,
                            (rc_lo[h:h + p], rc_hi[h:h + p]))
    state, _ = jax.lax.scan(_full_round, state, (rc_lo[h + p:], rc_hi[h + p:]))
    return state


def hash_leaves(leaves):
    """Vectorized overwrite-mode sponge: leaves (B, L) pair -> digests (B, 4) pair.

    Mirrors the reference leaf hashing (cuda/plonky2_gpu_impl.cuh:350-409 /
    hashing.rs:81): absorb rate-8 chunks of each leaf row, output 4 elements.
    """
    lo, hi = leaves
    B, L = lo.shape
    state = gf.zeros((B, WIDTH))
    for start in range(0, L, SPONGE_RATE):
        w = min(SPONGE_RATE, L - start)
        chunk_lo = lo[:, start:start + w]
        chunk_hi = hi[:, start:start + w]
        state = (jnp.concatenate([chunk_lo, state[0][:, w:]], axis=-1),
                 jnp.concatenate([chunk_hi, state[1][:, w:]], axis=-1))
        state = poseidon(state)
    return state[0][:, :4], state[1][:, :4]


def compress_pairs(x, y):
    """Vectorized two-to-one compression: (B, 4) pairs -> (B, 4) pair."""
    B = x[0].shape[0]
    cap = gf.zeros((B, 4))
    state = (jnp.concatenate([x[0], y[0], cap[0]], axis=-1),
             jnp.concatenate([x[1], y[1], cap[1]], axis=-1))
    out = poseidon(state)
    return out[0][:, :4], out[1][:, :4]
