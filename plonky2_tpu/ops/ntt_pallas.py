"""Pallas TPU column-NTT kernel — all log2(n1) butterfly stages fused in
VMEM (one HBM round trip instead of one per stage).

Replaces the XLA per-stage reshape/concat schedule for the four-step NTT's
column transforms (parallel/sharded_ntt.py): a (n1, n2) batch is tiled
over lanes, each grid step loads an (n1, tile) block (transform axis on
sublanes, so no swapaxes transposes), runs the whole butterfly network on
the VMEM-resident block and writes the result once.

Butterfly formulation (full-width; no mid-kernel reshapes, no strided
sublane slices — both hostile to Mosaic):

    stage s:  m  = W_s * x                (W_s[i] = w_s[i mod 2^s], a
                                           (2^s)-periodic column so
                                           W_s * roll(x) == roll(W_s * x))
              y+ = x + roll(m, -2^s)      (valid where bit s of i is 0)
              y- = roll(x, +2^s) - m      (valid where bit s of i is 1)
              x  = select(bit_s(i), y-, y+)

Over the exact Goldilocks arithmetic every correct NTT schedule produces
bit-identical OUTPUTS, so this matches ops/ntt.py `_ntt_stages` (and the
numpy oracle / reference field/src/fft.rs contract) exactly; the kernel's
internal value order differs, its results do not.  Bit-reversal and the
n^-1 scaling stay outside (XLA gather / the four-step caller).

Reference correspondence: cuda/plonky2_gpu_impl.cuh:88-212 (one thread
block per polynomial, __syncthreads() per stage — here one VMEM block per
lane tile, stages fused by unrolling).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..field import fft_numpy as fnp
from ..field import gf_jax as gf
from ..utils.bits import log2_strict


def _compiler_params(interpret: bool):
    """Raise Mosaic's scoped-VMEM ceiling (default 16 MB) for the fused
    butterfly network: with all log2(n1) stages unrolled over an
    (n1, tile) u32 block, ~20 live block-sized temporaries exist at peak,
    and at the flagship shapes (n1 or n2 = 2048 rows for a 2^21 LDE with
    the minimum 128-lane tile) that peak cannot fit 16 MB at ANY legal
    tile.  v5e has 128 MB of VMEM; 100 MB leaves double-buffer headroom."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.lru_cache(maxsize=None)
def _full_twiddle_table(n1: int, inverse: bool):
    """(n1, bits) u32 pair: column s is the stage-s twiddle broadcast to
    full width, W_s[i] = w_s[i mod 2^s]."""
    bits = log2_strict(n1)
    tw = fnp._inv_stage_twiddles(n1) if inverse else fnp.stage_twiddles(n1)
    t = np.empty((n1, bits), dtype=np.uint64)
    for s in range(bits):
        t[:, s] = np.tile(np.asarray(tw[s], dtype=np.uint64),
                          n1 // (1 << s))
    return (t & 0xFFFFFFFF).astype(np.uint32), (t >> 32).astype(np.uint32)


def _roll_rows(x, k: int):
    """roll along axis 0 (sublanes) by k (positive = downward)."""
    if k == 0:
        return x
    k = k % x.shape[0]
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def _stages_vmem(lo, hi, tlo, thi, bits: int):
    n1 = lo.shape[0]
    row = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, 0)
    for s in range(bits):
        half = 1 << s
        w = (tlo[:, s:s + 1], thi[:, s:s + 1])
        m = gf.mul(w, (lo, hi))
        up = gf.add((lo, hi), (_roll_rows(m[0], -half),
                               _roll_rows(m[1], -half)))
        dn = gf.sub((_roll_rows(lo, half), _roll_rows(hi, half)), m)
        bit = (row >> np.uint32(s)) & np.uint32(1)
        is_v = bit.astype(jnp.bool_)
        lo = jnp.where(is_v, dn[0], up[0])
        hi = jnp.where(is_v, dn[1], up[1])
    return lo, hi


def ntt_cols_pallas(a, inverse: bool = False, tile: int = 256,
                    interpret: bool = False):
    """a: (n1, n2) or (B, n1, n2) GF pair -> size-n1 NTT down the
    second-to-last axis (columns), natural order in and out.  n2 must be a
    multiple of `tile` (or equal a smaller power-of-two tile)."""
    from jax.experimental import pallas as pl

    from . import ntt as base_ntt

    lo, hi = a
    squeeze = lo.ndim == 2
    if squeeze:
        lo, hi = lo[None], hi[None]
    nb, n1, n2 = lo.shape
    bits = log2_strict(n1)
    t = min(tile, n2)
    assert n2 % t == 0, (n2, t)
    perm = base_ntt.bitrev_perm_auto(n1)
    lo = jnp.take(lo, perm, axis=1)
    hi = jnp.take(hi, perm, axis=1)
    tlo_np, thi_np = _full_twiddle_table(n1, inverse)

    def kernel(tlo_ref, thi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        olo, ohi = _stages_vmem(lo_ref[0], hi_ref[0],
                                tlo_ref[...], thi_ref[...], bits)
        out_lo_ref[0] = olo
        out_hi_ref[0] = ohi

    out_shape = (jax.ShapeDtypeStruct((nb, n1, n2), jnp.uint32),
                 jax.ShapeDtypeStruct((nb, n1, n2), jnp.uint32))
    blk = pl.BlockSpec((1, n1, t), lambda b, i: (b, 0, i))
    twb = pl.BlockSpec((n1, bits), lambda b, i: (0, 0))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(nb, n2 // t),
        in_specs=[twb, twb, blk, blk],
        out_specs=(blk, blk),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray(tlo_np), jnp.asarray(thi_np), lo, hi)
    if squeeze:
        return out_lo[0], out_hi[0]
    return out_lo, out_hi


def ntt_cols_zero_tail_pallas(prefix, rate_bits: int, tile: int = 256,
                              interpret: bool = False):
    """Size-n1 column NTTs of [prefix-rows, zero-rows]: prefix is
    (n1/2^r, n2); the first r stages pair every value with a known zero
    and reduce to a consecutive 2^r-fold row repeat (fft.rs:188-219),
    done in VMEM; stages r..bits run as usual."""
    from jax.experimental import pallas as pl

    from . import ntt as base_ntt

    r = rate_bits
    lo, hi = prefix
    if r == 0:
        return ntt_cols_pallas(prefix, tile=tile, interpret=interpret)
    squeeze = lo.ndim == 2
    if squeeze:
        lo, hi = lo[None], hi[None]
    nb, q, n2 = lo.shape
    n1 = q << r
    bits = log2_strict(n1)
    t = min(tile, n2)
    assert n2 % t == 0, (n2, t)
    perm = base_ntt.bitrev_perm_auto(q)
    lo = jnp.take(lo, perm, axis=1)
    hi = jnp.take(hi, perm, axis=1)
    tlo_np, thi_np = _full_twiddle_table(n1, False)

    def kernel(tlo_ref, thi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        blo = jnp.repeat(lo_ref[0], 1 << r, axis=0)
        bhi = jnp.repeat(hi_ref[0], 1 << r, axis=0)
        tlo = tlo_ref[...]
        thi = thi_ref[...]
        # stages r..bits only (the first r stages are the row repeat)
        row = jax.lax.broadcasted_iota(jnp.uint32, blo.shape, 0)
        for s in range(r, bits):
            half = 1 << s
            w = (tlo[:, s:s + 1], thi[:, s:s + 1])
            m = gf.mul(w, (blo, bhi))
            up = gf.add((blo, bhi), (_roll_rows(m[0], -half),
                                     _roll_rows(m[1], -half)))
            dn = gf.sub((_roll_rows(blo, half), _roll_rows(bhi, half)), m)
            bit = (row >> np.uint32(s)) & np.uint32(1)
            is_v = bit.astype(jnp.bool_)
            blo = jnp.where(is_v, dn[0], up[0])
            bhi = jnp.where(is_v, dn[1], up[1])
        out_lo_ref[0] = blo
        out_hi_ref[0] = bhi

    out_shape = (jax.ShapeDtypeStruct((nb, n1, n2), jnp.uint32),
                 jax.ShapeDtypeStruct((nb, n1, n2), jnp.uint32))
    inblk = pl.BlockSpec((1, q, t), lambda b, i: (b, 0, i))
    outblk = pl.BlockSpec((1, n1, t), lambda b, i: (b, 0, i))
    twb = pl.BlockSpec((n1, bits), lambda b, i: (0, 0))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(nb, n2 // t),
        in_specs=[twb, twb, inblk, inblk],
        out_specs=(outblk, outblk),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray(tlo_np), jnp.asarray(thi_np), lo, hi)
    if squeeze:
        return out_lo[0], out_hi[0]
    return out_lo, out_hi


# ---------------------------------------------------------------------------
# DIF (decimation-in-frequency) column kernels: NATURAL order in,
# BIT-REVERSED order out — no input permutation, no output gather.
#
# Motivation (MICROBENCH_r05.json): the flat 2^21 bit-reversal gather that
# converts the four-step NTT's natural-order LDE into Merkle-leaf order
# runs at 0.44 G elems/s — ~1.2 s of the 6 s flagship wires commit.  The
# commit only ever consumes the LDE in bit-reversed order, so producing it
# directly is free: rev_n(j) for j = a*n2 + b splits as
# leaves[a, b] = B2[rev_n1(a), rev_n2(b)], and a DIF network emits exactly
# the rev-ordered rows (transposed flow graph of the DIT stages — the NTT
# matrix is symmetric, so reversed-order transposed stages with the SAME
# twiddle table compute bitrev(NTT(x))).
#
# DIF stage s (run s = bits-1 .. 0), pairs (i, i+2^s) with bit s of i = 0:
#     u' = u + v;   v' = W_s[i mod 2^s] * (u - v)
# in the same roll/select full-width formulation as the DIT kernel.
# ---------------------------------------------------------------------------


def _stages_vmem_dif(lo, hi, tlo, thi, bits: int):
    row = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, 0)
    for s in range(bits - 1, -1, -1):
        half = 1 << s
        w = (tlo[:, s:s + 1], thi[:, s:s + 1])
        up = gf.add((lo, hi), (_roll_rows(lo, -half), _roll_rows(hi, -half)))
        dn = gf.mul(w, gf.sub((_roll_rows(lo, half), _roll_rows(hi, half)),
                              (lo, hi)))
        bit = (row >> np.uint32(s)) & np.uint32(1)
        is_v = bit.astype(jnp.bool_)
        lo = jnp.where(is_v, dn[0], up[0])
        hi = jnp.where(is_v, dn[1], up[1])
    return lo, hi


def ntt_cols_dif_pallas(a, inverse: bool = False, tile: int = 256,
                        interpret: bool = False, zero_tail_rows: int = 0):
    """a: (B, q, n2) GF pair -> (B, n1, n2), size-n1 NTT down the columns,
    NATURAL order in, BIT-REVERSED order out (n1 = q + zero_tail_rows; the
    missing rows are an implied zero tail, materialized in VMEM)."""
    from jax.experimental import pallas as pl

    lo, hi = a
    squeeze = lo.ndim == 2
    if squeeze:
        lo, hi = lo[None], hi[None]
    nb, q, n2 = lo.shape
    n1 = q + zero_tail_rows
    bits = log2_strict(n1)
    t = min(tile, n2)
    assert n2 % t == 0, (n2, t)
    tlo_np, thi_np = _full_twiddle_table(n1, inverse)

    def kernel(tlo_ref, thi_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        blo, bhi = lo_ref[0], hi_ref[0]
        if zero_tail_rows:
            z = jnp.zeros((zero_tail_rows, blo.shape[1]), jnp.uint32)
            blo = jnp.concatenate([blo, z], axis=0)
            bhi = jnp.concatenate([bhi, z], axis=0)
        olo, ohi = _stages_vmem_dif(blo, bhi, tlo_ref[...], thi_ref[...],
                                    bits)
        out_lo_ref[0] = olo
        out_hi_ref[0] = ohi

    out_shape = (jax.ShapeDtypeStruct((nb, n1, n2), jnp.uint32),
                 jax.ShapeDtypeStruct((nb, n1, n2), jnp.uint32))
    inblk = pl.BlockSpec((1, q, t), lambda b, i: (b, 0, i))
    outblk = pl.BlockSpec((1, n1, t), lambda b, i: (b, 0, i))
    twb = pl.BlockSpec((n1, bits), lambda b, i: (0, 0))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(nb, n2 // t),
        in_specs=[twb, twb, inblk, inblk],
        out_specs=(outblk, outblk),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(jnp.asarray(tlo_np), jnp.asarray(thi_np), lo, hi)
    if squeeze:
        return out_lo[0], out_hi[0]
    return out_lo, out_hi


def enabled() -> bool:
    """Pallas column NTTs run on real TPU unless disabled;
    PLONKY2_TPU_PALLAS_NTT=0 turns them off, =interpret forces
    interpret-mode on CPU (tests)."""
    import os
    mode = os.environ.get("PLONKY2_TPU_PALLAS_NTT", "auto")
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    import os
    return os.environ.get("PLONKY2_TPU_PALLAS_NTT") == "interpret"
