"""Poseidon-12 permutation on TPU — JAX over (lo, hi) uint32-pair field reps.

Vectorized across the leaf batch in TRANSPOSED layout: state is a pair of
uint32 arrays of shape (12, B) — batch on the minor (lane) axis.  TPU
arrays tile as (8, 128) u32; a (B, 12) layout pads the minor dim 12 -> 128
(10.7x HBM blowup, which OOM'd the 2^21-leaf commit), while (12, B) pads
only the sublane dim 12 -> 16.

The MDS layer decomposes the 64-bit state into four 16-bit limb planes and
runs four (12, 12) x (12, B) int32 matmuls (matrix entries < 64, partial
sums < 2^26 — exact in int32 and MXU-eligible), then recombines limbs and
epsilon-reduces.

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

# kept as NUMPY: a module-level jnp.asarray would create a traced constant
# if this module is first imported inside a jit trace (device witness plans
# import it lazily) and leak that tracer into later traces
_MDS_I32 = pos.MDS_MATRIX.astype(np.int32)  # (12, 12), entries < 64


@functools.lru_cache(maxsize=None)
def _round_constant_pairs():
    """(lo, hi) uint32 arrays of shape (30, 12, 1) — broadcast over lanes."""
    rc = pos.ALL_ROUND_CONSTANTS.reshape(pos.N_ROUNDS, WIDTH, 1)
    return gf.from_u64(rc)


def _sbox(x):
    x2 = gf.mul(x, x)
    x3 = gf.mul(x2, x)
    x4 = gf.mul(x2, x2)
    return gf.mul(x3, x4)


def _mds(state):
    lo, hi = state                      # (12, B)
    m = _MDS_I32                        # out[r, b] = sum_c M[r, c] v[c, b]
    planes = [
        (lo & 0xFFFF).astype(jnp.int32),
        (lo >> 16).astype(jnp.int32),
        (hi & 0xFFFF).astype(jnp.int32),
        (hi >> 16).astype(jnp.int32),
    ]
    t = [jnp.matmul(m, p, preferred_element_type=jnp.int32).astype(jnp.uint32)
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
    s0 = _sbox((s[0][:1], s[1][:1]))
    s = (jnp.concatenate([s0[0], s[0][1:]], axis=0),
         jnp.concatenate([s0[1], s[1][1:]], axis=0))
    return _mds(s), None


def poseidon_t(state):
    """Permutation on transposed state: (lo, hi) pair of shape (12, B).

    Round 5: uses the SCAN-over-rounds naive schedule.  The unrolled
    fast-partial-round graph (~8.7k ops per permutation) dominated every
    cold compile — the flagship TPU proof's XLA sponge modules took
    36-235 s each to compile and the 8-device CPU dryrun minutes per
    module — while at runtime the XLA sponge only covers narrow Merkle
    tails, the challenger, and CPU test runs (the hot leaf/compress paths
    ride the Pallas kernel, hash/poseidon_pallas.py).  The scan body is
    one round (~300 ops), ~30x smaller to compile, bit-identical output.
    Set PLONKY2_TPU_SPONGE_UNROLL=1 to restore the unrolled schedule."""
    import os
    state = (jnp.asarray(state[0]), jnp.asarray(state[1]))
    if os.environ.get("PLONKY2_TPU_SPONGE_UNROLL") == "1":
        from .poseidon_wires_jax import poseidon_fast_t
        return poseidon_fast_t(state)
    return poseidon_t_naive(state)


def poseidon_t_naive(state):
    """The naive 30-round schedule (oracle for poseidon_t; also the shape
    the reference's non-fast path computes, poseidon.rs:586-618)."""
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


def poseidon(state):
    """Batch-major compatibility wrapper: state pair of shape (..., 12)."""
    lo, hi = (jnp.asarray(state[0]), jnp.asarray(state[1]))
    shape = lo.shape
    lo2 = jnp.moveaxis(lo.reshape(-1, WIDTH), -1, 0)
    hi2 = jnp.moveaxis(hi.reshape(-1, WIDTH), -1, 0)
    out = poseidon_t((lo2, hi2))
    return (jnp.moveaxis(out[0], 0, -1).reshape(shape),
            jnp.moveaxis(out[1], 0, -1).reshape(shape))


def hash_leaves_cols(leaves):
    """Column-major sponge: leaves (L, B) pair -> digests (4, B) pair.

    Overwrite-mode absorb of rate-8 row chunks (reference
    cuda/plonky2_gpu_impl.cuh:350-409 / hashing.rs:81).  The full-rate
    chunks absorb under ONE lax.scan (a 234-column leaf is 30 absorb
    blocks — unrolled, the commit executables were ~50 MB and took
    minutes to cold-compile through the tunnel)."""
    import jax

    lo, hi = leaves
    L, B = lo.shape
    state = gf.zeros((WIDTH, B))
    full = L // SPONGE_RATE
    if full:
        r = full * SPONGE_RATE
        chunks = (lo[:r].reshape(full, SPONGE_RATE, B),
                  hi[:r].reshape(full, SPONGE_RATE, B))

        def absorb(st, chunk):
            st = (jnp.concatenate([chunk[0], st[0][SPONGE_RATE:]], axis=0),
                  jnp.concatenate([chunk[1], st[1][SPONGE_RATE:]], axis=0))
            return poseidon_t(st), None

        state, _ = jax.lax.scan(absorb, state, chunks)
    w = L - full * SPONGE_RATE
    if w:
        state = (jnp.concatenate([lo[L - w:], state[0][w:]], axis=0),
                 jnp.concatenate([hi[L - w:], state[1][w:]], axis=0))
        state = poseidon_t(state)
    return state[0][:4], state[1][:4]


def hash_leaves(leaves):
    """Batch-major wrapper: leaves (B, L) pair -> digests (B, 4) pair."""
    lo, hi = leaves
    out = hash_leaves_cols((lo.T, hi.T))
    return out[0].T, out[1].T


def compress_pairs_cols(x, y):
    """Column-major two-to-one compression: (4, B) pairs -> (4, B) pair."""
    B = x[0].shape[1]
    cap = gf.zeros((4, B))
    state = (jnp.concatenate([x[0], y[0], cap[0]], axis=0),
             jnp.concatenate([x[1], y[1], cap[1]], axis=0))
    out = poseidon_t(state)
    return out[0][:4], out[1][:4]


def compress_pairs(x, y):
    """Batch-major wrapper: (B, 4) pairs -> (B, 4) pair."""
    out = compress_pairs_cols((x[0].T, x[1].T), (y[0].T, y[1].T))
    return out[0].T, out[1].T
