"""Batched Goldilocks NTT on TPU — pure-XLA (jnp) implementation.

Stage-per-pass radix-2 butterfly network over the (lo, hi) uint32-pair field
representation from ``field.gf_jax``.  Fully static shapes; the log2(n) stage
loop unrolls at trace time so XLA fuses butterflies with the twiddle
multiplies.  A Pallas fused multi-stage kernel can later replace this without
changing the interface.

Matches the numpy oracle ``field.fft_numpy`` (and therefore the reference
``field/src/fft.rs`` contract): natural-order evaluations of the canonical
two-adic domain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gf_jax as gf
from ..field import goldilocks as gl
from ..field import fft_numpy as fnp
from ..utils.bits import bit_reverse_indices, log2_strict


@functools.lru_cache(maxsize=None)
def twiddle_tables(n: int, inverse: bool):
    """Per-stage twiddles as device (lo, hi) pairs; host-cached."""
    tw = fnp._inv_stage_twiddles(n) if inverse else fnp.stage_twiddles(n)
    return tuple(gf.from_u64(t) for t in tw)


@functools.lru_cache(maxsize=None)
def bitrev_perm(n: int):
    # numpy (not jnp): cached across jit traces, must stay a constant
    return bit_reverse_indices(n)


def bitrev_perm_dev(n: int):
    """Bit-reversal permutation computed IN-TRACE (~15 shift/mask ops).

    Inlining the numpy table as an HLO literal costs 8 bytes/element in the
    module — at lde 2^21 the commit program ballooned to a 160 MB MLIR blob
    that the TPU compile service rejects."""
    bits = log2_strict(n)
    v = jax.lax.iota(jnp.uint32, n)
    v = ((v & jnp.uint32(0x55555555)) << 1) | ((v >> 1) & jnp.uint32(0x55555555))
    v = ((v & jnp.uint32(0x33333333)) << 2) | ((v >> 2) & jnp.uint32(0x33333333))
    v = ((v & jnp.uint32(0x0F0F0F0F)) << 4) | ((v >> 4) & jnp.uint32(0x0F0F0F0F))
    v = ((v & jnp.uint32(0x00FF00FF)) << 8) | ((v >> 8) & jnp.uint32(0x00FF00FF))
    v = (v << 16) | (v >> 16)
    return (v >> (32 - bits)).astype(jnp.int32)


def bitrev_perm_auto(n: int):
    """Device builder for large n (keeps HLO modules small), numpy constant
    for small n (cheaper than the in-trace ops)."""
    return bitrev_perm_dev(n) if n >= (1 << 12) else bitrev_perm(n)


def powers_dev(base: int, n: int):
    """[1, base, ..., base^(n-1)] as a GF pair, built IN-TRACE (no
    n-element constant in the module): inclusive associative_scan over
    [1, base, base, ...].  Modular mul is associative so the scan tree is
    bit-identical to sequential powers; the scan also compiles ~10x
    faster than the log-doubling concat chain it replaced (XLA chokes on
    deep concat-of-slice chains)."""
    b = base % gl.P
    xs = (jnp.full((n,), b & 0xFFFFFFFF, jnp.uint32).at[0].set(1),
          jnp.full((n,), b >> 32, jnp.uint32).at[0].set(0))
    return jax.lax.associative_scan(lambda a, c: gf.mul(a, c), xs)


def _ntt_stages(a_lo, a_hi, twiddles, n: int, start_stage: int):
    """Butterfly stages start_stage..log2(n)-1 on bit-rev-permuted data."""
    bits = log2_strict(n)
    batch = a_lo.shape[:-1]
    for s in range(start_stage, bits):
        half = 1 << s
        length = half * 2
        shape = (*batch, n // length, length)
        x_lo = a_lo.reshape(shape)
        x_hi = a_hi.reshape(shape)
        u = (x_lo[..., :half], x_hi[..., :half])
        w = twiddles[s]
        v = gf.mul((x_lo[..., half:], x_hi[..., half:]), w)
        s_ = gf.add(u, v)
        d_ = gf.sub(u, v)
        a_lo = jnp.concatenate([s_[0], d_[0]], axis=-1).reshape(*batch, n)
        a_hi = jnp.concatenate([s_[1], d_[1]], axis=-1).reshape(*batch, n)
    return a_lo, a_hi


def _ntt_core(a_lo, a_hi, twiddles):
    n = a_lo.shape[-1]
    perm = bitrev_perm(n)
    a_lo = jnp.take(a_lo, perm, axis=-1)
    a_hi = jnp.take(a_hi, perm, axis=-1)
    return _ntt_stages(a_lo, a_hi, twiddles, n, 0)


def _ntt_core_zero_tail(a_lo, a_hi, twiddles, rate_bits: int):
    """Size-(q*2^r) NTT of [a, zeros] given only the q nonzero leading
    coefficients (last axis).  Mirrors fft_classic's r-skip
    (reference field/src/fft.rs:188-219): bit-rev permute the prefix,
    broadcast each value 2^r times (the first r butterfly stages pair each
    value with a known zero, so u+w*0 / u-w*0 just copy u), then run
    stages r..log2(n).  Saves the zero materialization AND r of the
    log2(n) stages."""
    q = a_lo.shape[-1]
    r = rate_bits
    if r == 0:
        return _ntt_core(a_lo, a_hi, twiddles)
    n = q << r
    perm = bitrev_perm_auto(q)
    a_lo = jnp.take(a_lo, perm, axis=-1)
    a_hi = jnp.take(a_hi, perm, axis=-1)
    batch = a_lo.shape[:-1]
    shape = (*batch, q, 1)
    bshape = (*batch, q, 1 << r)
    a_lo = jnp.broadcast_to(a_lo.reshape(shape), bshape).reshape(*batch, n)
    a_hi = jnp.broadcast_to(a_hi.reshape(shape), bshape).reshape(*batch, n)
    return _ntt_stages(a_lo, a_hi, twiddles, n, r)


def ntt(a, inverse: bool = False):
    """a: (lo, hi) pair, last axis = poly axis (power of two).

    Large transforms dispatch to the four-step schedule (parallel/
    sharded_ntt.py) — ~1.6x faster on TPU (contiguous 128-lane sub-NTT
    tiles) and the same bit-exact results."""
    n = a[0].shape[-1]
    if n >= (1 << 12):
        from ..parallel.sharded_ntt import batched_four_step_ntt, four_step_ntt
        if a[0].ndim == 1:
            return four_step_ntt(a, inverse=inverse)
        if a[0].ndim == 2:
            return batched_four_step_ntt(a, inverse=inverse)
    out = _ntt_core(a[0], a[1], twiddle_tables(n, inverse))
    if inverse:
        out = gf.mul_const(out, gl.s_inv(n))
    return out


def coset_ntt(coeffs, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR):
    n = coeffs[0].shape[-1]
    sp = powers_dev(shift, n) if n >= (1 << 12) else \
        gf.from_u64(gl.powers(shift, n))
    return ntt(gf.mul(coeffs, sp))


def coset_intt(values, shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR):
    n = values[0].shape[-1]
    coeffs = ntt(values, inverse=True)
    inv_s = gl.s_inv(shift)
    sp = powers_dev(inv_s, n) if n >= (1 << 12) else \
        gf.from_u64(gl.powers(inv_s, n))
    return gf.mul(coeffs, sp)


def lde_coset_ntt(coeffs, rate_bits: int,
                  shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR):
    """Coset LDE: multiply the n coeffs by shift powers, then evaluate on
    the size-n*2^rate_bits domain WITHOUT materializing the zero tail.

    The reference pipeline is lde->mul_shift->fft with an explicit padded
    copy (cuda/plonky2_gpu_impl.cuh:261-313) whose fft skips the first
    rate_bits butterfly stages (fft.rs:188-219); here the skip falls out
    of _ntt_core_zero_tail / the four-step column transforms directly on
    the unpadded prefix."""
    n = coeffs[0].shape[-1]
    m = n << rate_bits
    sp = powers_dev(shift, n) if n >= (1 << 12) else \
        gf.from_u64(gl.powers(shift, n))
    scaled = gf.mul(coeffs, sp)
    if m >= (1 << 12):
        from ..parallel.sharded_ntt import (batched_four_step_zero_tail_ntt,
                                            four_step_zero_tail_ntt)
        if scaled[0].ndim == 1:
            return four_step_zero_tail_ntt(scaled, rate_bits)
        if scaled[0].ndim == 2:
            return batched_four_step_zero_tail_ntt(scaled, rate_bits)
    return _ntt_core_zero_tail(scaled[0], scaled[1],
                               twiddle_tables(m, False), rate_bits)


def lde_coset_ntt_bitrev(coeffs, rate_bits: int,
                         shift: int = gl.MULTIPLICATIVE_GROUP_GENERATOR):
    """Coset LDE directly in BIT-REVERSED (Merkle-leaf) order:
    == lde_coset_ntt(coeffs, rate_bits)[..., bitrev_perm(m)] bit-for-bit.

    On the Pallas path the DIF column kernels emit bitrev order natively,
    removing the flat m-element gather (0.44 G elems/s ≈ 1.2 s of the
    flagship wires commit, MICROBENCH_r05.json)."""
    n = coeffs[0].shape[-1]
    m = n << rate_bits
    if rate_bits and m >= (1 << 12) and coeffs[0].ndim in (1, 2):
        sp = powers_dev(shift, n)
        scaled = gf.mul(coeffs, sp)
        from ..parallel.sharded_ntt import batched_four_step_zero_tail_bitrev
        squeeze = scaled[0].ndim == 1
        pair = (scaled[0][None], scaled[1][None]) if squeeze else scaled
        out = batched_four_step_zero_tail_bitrev(pair, rate_bits)
        if out is not None:
            return (out[0][0], out[1][0]) if squeeze else out
        lde = lde_coset_ntt_scaled_fallback(pair, rate_bits)
        perm = bitrev_perm_auto(m)
        out = (lde[0][..., perm], lde[1][..., perm])
        return (out[0][0], out[1][0]) if squeeze else out
    lde = lde_coset_ntt(coeffs, rate_bits, shift)
    perm = bitrev_perm_auto(m)
    return lde[0][..., perm], lde[1][..., perm]


def lde_coset_ntt_scaled_fallback(scaled, rate_bits: int):
    """Zero-tail NTT of already-shift-scaled coeffs (natural order out)."""
    m = scaled[0].shape[-1] << rate_bits
    if m >= (1 << 12):
        from ..parallel.sharded_ntt import (batched_four_step_zero_tail_ntt,
                                            four_step_zero_tail_ntt)
        if scaled[0].ndim == 1:
            return four_step_zero_tail_ntt(scaled, rate_bits)
        if scaled[0].ndim == 2:
            return batched_four_step_zero_tail_ntt(scaled, rate_bits)
    return _ntt_core_zero_tail(scaled[0], scaled[1],
                               twiddle_tables(m, False), rate_bits)


@functools.partial(jax.jit, static_argnums=(1,))
def ntt_jit(a, inverse: bool = False):
    return ntt(a, inverse)
