"""Four-step (Bailey/transpose) NTT — the scaling-axis decomposition.

An n = n1*n2 NTT becomes: column NTTs (size n1) -> twiddle w_n^(k1*i2) ->
row NTTs (size n2) -> transpose.  This is BOTH the intra-NTT sharding recipe
(SURVEY.md §7 step 9: shard the i2 axis, the only cross-device exchange is the
final transpose = one all-to-all over ICI) and a better single-chip schedule
(sub-NTT butterflies act on contiguous 128-lane-wide tiles).

Matches ops/ntt.py and field/fft_numpy.py bit-for-bit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gf_jax as gf
from ..field import goldilocks as gl
from ..field import fft_numpy as fnp
from ..ops import ntt as base_ntt
from ..utils.bits import log2_strict


@functools.lru_cache(maxsize=None)
def _step2_twiddles(n1: int, n2: int, inverse: bool):
    """(n1, n2) table W[k1, i2] = w_n^(±k1*i2), as numpy (lo, hi) pair."""
    n = n1 * n2
    g = gl.primitive_root_of_unity(log2_strict(n))
    if inverse:
        g = gl.s_inv(g)
    rows = gl.powers(g, n1)  # g^k1
    table = np.empty((n1, n2), dtype=np.uint64)
    for k1 in range(n1):
        table[k1] = gl.powers(int(rows[k1]), n2)
    return gf.from_u64(table)


def _step2_twiddles_built(n1: int, n2: int, inverse: bool, row_perm=None):
    """Same table, built IN-TRACE from an (n1,)-sized host constant (the
    materialized numpy table is n elements — inlined into the HLO it made
    2^21-point commit modules ~160 MB and broke the TPU compile service):
    row k1 is an inclusive associative_scan over [1, r, r, ...] with
    r = g^k1.  Modular mul is associative, so bit-identical to sequential
    powers — and the scan compiles ~10x faster than the column-doubling
    concat chain it replaced.

    ``row_perm`` (numpy index array) reorders the row-base constant — the
    bitrev-output (DIF) pipeline needs row rr to carry g^{rev(rr)}."""
    n = n1 * n2
    g = gl.primitive_root_of_unity(log2_strict(n))
    if inverse:
        g = gl.s_inv(g)
    rows_u64 = gl.powers(g, n1)
    if row_perm is not None:
        rows_u64 = rows_u64[row_perm]
    rows = gf.from_u64(rows_u64)                    # (n1,) small constant
    xs = (jnp.broadcast_to(jnp.asarray(rows[0])[:, None], (n1, n2)),
          jnp.broadcast_to(jnp.asarray(rows[1])[:, None], (n1, n2)))
    xs = (xs[0].at[:, 0].set(1), xs[1].at[:, 0].set(0))
    return jax.lax.associative_scan(lambda a, c: gf.mul(a, c), xs, axis=1)


def _ntt_along_axis0(a, n1: int, inverse: bool):
    """Size-n1 NTT along axis 0 of (n1, n2) arrays (vectorized over axis 1)."""
    lo = jnp.swapaxes(a[0], 0, 1)
    hi = jnp.swapaxes(a[1], 0, 1)
    out = base_ntt._ntt_core(lo, hi, base_ntt.twiddle_tables(n1, inverse))
    return jnp.swapaxes(out[0], 0, 1), jnp.swapaxes(out[1], 0, 1)


def _pallas_tile(n1: int) -> int:
    """Lane-tile width keeping ~10 live (n1, tile) u32 arrays in VMEM."""
    return min(512, max(128, (1 << 18) // n1))


def _pallas_cols_ok(n1: int, n2: int) -> bool:
    """Route the column transforms through the fused Pallas kernel: real
    TPU, unsharded (a pallas_call is opaque to the SPMD partitioner), and
    lane counts that tile cleanly."""
    from ..ops import ntt_pallas as ntp
    from ..runtime import meshctx
    return (ntp.enabled() and meshctx.active_mesh() is None
            and 8 <= n1 <= 4096 and n2 % 128 == 0)


def _four_step_pallas(coeffs, inverse: bool, n1: int):
    """Four-step schedule with BOTH column-NTT steps as fused VMEM Pallas
    kernels (ops/ntt_pallas.py) — bit-identical outputs, one HBM round
    trip per step instead of one per butterfly stage.  Handles a leading
    batch axis natively (the kernel grids over it; no vmap-of-pallas)."""
    from ..ops import ntt_pallas as ntp

    lead = coeffs[0].shape[:-1]
    n = coeffs[0].shape[-1]
    n2 = n // n1
    interp = ntp.interpret_mode()
    x = (coeffs[0].reshape(*lead, n1, n2), coeffs[1].reshape(*lead, n1, n2))
    a = ntp.ntt_cols_pallas(x, inverse, tile=_pallas_tile(n1),
                            interpret=interp)
    tw = _step2_twiddles_built(n1, n2, inverse) if n >= (1 << 12) else \
        _step2_twiddles(n1, n2, inverse)
    a = gf.mul(a, tw)
    at = (jnp.swapaxes(a[0], -1, -2), jnp.swapaxes(a[1], -1, -2))
    b = ntp.ntt_cols_pallas(at, inverse, tile=_pallas_tile(n2),
                            interpret=interp)
    out = (b[0].reshape(*lead, n), b[1].reshape(*lead, n))
    if inverse:
        out = gf.mul_const(out, gl.s_inv(n))
    return out


def _four_step_zero_tail_pallas(prefix, rate_bits: int, n1: int):
    from ..ops import ntt_pallas as ntp

    lead = prefix[0].shape[:-1]
    q = prefix[0].shape[-1]
    m = q << rate_bits
    n2 = m // n1
    interp = ntp.interpret_mode()
    x = (prefix[0].reshape(*lead, n1 >> rate_bits, n2),
         prefix[1].reshape(*lead, n1 >> rate_bits, n2))
    a = ntp.ntt_cols_zero_tail_pallas(x, rate_bits, tile=_pallas_tile(n1),
                                      interpret=interp)
    tw = _step2_twiddles_built(n1, n2, False) if m >= (1 << 12) else \
        _step2_twiddles(n1, n2, False)
    a = gf.mul(a, tw)
    at = (jnp.swapaxes(a[0], -1, -2), jnp.swapaxes(a[1], -1, -2))
    b = ntp.ntt_cols_pallas(at, False, tile=_pallas_tile(n2),
                            interpret=interp)
    return b[0].reshape(*lead, m), b[1].reshape(*lead, m)


def _four_step_zero_tail_bitrev_pallas(prefix, rate_bits: int, n1: int):
    """Four-step zero-tail NTT emitting the result in BIT-REVERSED order
    (Merkle-leaf order) with no gather: both column passes run as DIF
    kernels (natural-in, bitrev-out), the step-2 twiddle rows are
    pre-permuted to match, and the final rev_m(j) = (rev_n2(b), rev_n1(a))
    split reduces to one transpose.  Bit-identical to
    four_step_zero_tail_ntt(...)[..., bitrev_perm(m)]."""
    from ..ops import ntt_pallas as ntp

    lead = prefix[0].shape[:-1]
    q = prefix[0].shape[-1]
    r = rate_bits
    m = q << r
    n2 = m // n1
    q_rows = n1 >> r
    interp = ntp.interpret_mode()
    x = (prefix[0].reshape(*lead, q_rows, n2),
         prefix[1].reshape(*lead, q_rows, n2))
    a = ntp.ntt_cols_dif_pallas(x, tile=_pallas_tile(n1), interpret=interp,
                                zero_tail_rows=n1 - q_rows)
    perm1 = np.asarray(base_ntt.bitrev_perm(n1))
    tw = _step2_twiddles_built(n1, n2, False, row_perm=perm1) \
        if m >= (1 << 12) else \
        tuple(jnp.asarray(t)[perm1] for t in _step2_twiddles(n1, n2, False))
    a = gf.mul(a, tw)
    at = (jnp.swapaxes(a[0], -1, -2), jnp.swapaxes(a[1], -1, -2))
    b = ntp.ntt_cols_dif_pallas(at, tile=_pallas_tile(n2), interpret=interp)
    return (jnp.swapaxes(b[0], -1, -2).reshape(*lead, m),
            jnp.swapaxes(b[1], -1, -2).reshape(*lead, m))


def batched_four_step_zero_tail_bitrev(prefix, rate_bits: int):
    """(B, q) pair -> (B, m) pair in bitrev (leaf) order via the DIF
    pipeline, or None if the Pallas path can't run here (caller falls back
    to natural order + gather)."""
    q = prefix[0].shape[-1]
    if rate_bits == 0:
        return None
    m = q << rate_bits
    n1 = max(1 << (log2_strict(m) // 2), 1 << rate_bits)
    n2 = m // n1
    if not (_pallas_cols_ok(n1, n2) and _pallas_cols_ok(n2, n1)):
        return None
    return _four_step_zero_tail_bitrev_pallas(prefix, rate_bits, n1)


def four_step_ntt(coeffs, inverse: bool = False, n1: int | None = None,
                  shard_axis: str | None = None):
    """coeffs: (n,) pair -> (n,) pair of evaluations in natural order.

    If `shard_axis` is given, intermediate arrays are sharding-constrained so
    that under jit+mesh the column NTTs stay device-local and XLA inserts a
    single all-to-all at the transpose.
    """
    n = coeffs[0].shape[-1]
    bits = log2_strict(n)
    if n1 is None:
        n1 = 1 << (bits // 2)
    n2 = n // n1
    if shard_axis is None and _pallas_cols_ok(n1, n2) \
            and _pallas_cols_ok(n2, n1):
        return _four_step_pallas(coeffs, inverse, n1)

    x = (coeffs[0].reshape(n1, n2), coeffs[1].reshape(n1, n2))

    def constrain(v, spec):
        if shard_axis is None:
            return v
        from jax.sharding import PartitionSpec as P
        s = P(*spec)
        return (jax.lax.with_sharding_constraint(v[0], s),
                jax.lax.with_sharding_constraint(v[1], s))

    # columns sharded: each device owns a slice of i2
    x = constrain(x, (None, shard_axis))
    # step 1: size-n1 NTTs down the columns (local)
    a = _ntt_along_axis0(x, n1, inverse)
    # step 2: twiddle W[k1, i2] (local)
    tw = _step2_twiddles_built(n1, n2, inverse) if n >= (1 << 12) else \
        _step2_twiddles(n1, n2, inverse)
    a = gf.mul(a, tw)
    a = constrain(a, (None, shard_axis))
    # step 3: size-n2 NTTs along the rows — needs full rows: reshard to
    # row-sharded (the all-to-all happens here)
    a = constrain(a, (shard_axis, None))
    b = base_ntt._ntt_core(a[0], a[1], base_ntt.twiddle_tables(n2, inverse))
    # step 4: output X[k2*n1 + k1] = B[k1, k2] — transpose and flatten
    out = (b[0].T.reshape(n), b[1].T.reshape(n))
    out = constrain(out, (shard_axis,))
    if inverse:
        out = gf.mul_const(out, gl.s_inv(n))
    return out


def batched_four_step_ntt(coeffs, inverse: bool = False,
                          shard_axis: str | None = None):
    """(B, n) pair -> (B, n) pair via vmap over the batch (XLA path) or a
    batch grid dimension (Pallas path)."""
    n = coeffs[0].shape[-1]
    n1 = 1 << (log2_strict(n) // 2)
    n2 = n // n1
    if shard_axis is None and _pallas_cols_ok(n1, n2) \
            and _pallas_cols_ok(n2, n1):
        return _four_step_pallas(coeffs, inverse, n1)
    fn = functools.partial(four_step_ntt, inverse=inverse,
                           shard_axis=shard_axis)
    return jax.vmap(lambda lo, hi: fn((lo, hi)))(coeffs[0], coeffs[1])


def four_step_zero_tail_ntt(prefix, rate_bits: int):
    """Size-(q*2^rate_bits) NTT of [prefix, zeros]: the four-step schedule
    where the column transforms get only the q nonzero coefficients and
    apply the fft_classic r-skip (ops/ntt.py _ntt_core_zero_tail; the
    conceptual padded array's zero tail is exactly the bottom rows of the
    (n1, n2) matrix, so each column is itself a zero-tail transform)."""
    q = prefix[0].shape[-1]
    r = rate_bits
    if r == 0:
        return four_step_ntt(prefix)
    m = q << r
    bits = log2_strict(m)
    n1 = 1 << (bits // 2)
    if n1 < (1 << r):
        n1 = 1 << r
    n2 = m // n1
    if _pallas_cols_ok(n1, n2) and _pallas_cols_ok(n2, n1):
        return _four_step_zero_tail_pallas(prefix, r, n1)
    # padded[j1*n2 + j2]: rows j1 >= n1/2^r are zero
    x = (prefix[0].reshape(n1 >> r, n2), prefix[1].reshape(n1 >> r, n2))
    # step 1: zero-tail size-n1 NTTs down the columns
    lo = jnp.swapaxes(x[0], 0, 1)
    hi = jnp.swapaxes(x[1], 0, 1)
    out = base_ntt._ntt_core_zero_tail(lo, hi,
                                       base_ntt.twiddle_tables(n1, False), r)
    a = (jnp.swapaxes(out[0], 0, 1), jnp.swapaxes(out[1], 0, 1))
    # step 2: twiddle, step 3: row NTTs, step 4: transpose (as four_step_ntt)
    tw = _step2_twiddles_built(n1, n2, False) if m >= (1 << 12) else \
        _step2_twiddles(n1, n2, False)
    a = gf.mul(a, tw)
    b = base_ntt._ntt_core(a[0], a[1], base_ntt.twiddle_tables(n2, False))
    return b[0].T.reshape(m), b[1].T.reshape(m)


def batched_four_step_zero_tail_ntt(prefix, rate_bits: int):
    """(B, q) pair -> (B, q*2^rate_bits) pair via vmap over the batch
    (XLA) or a batch grid dimension (Pallas)."""
    if rate_bits:
        m = prefix[0].shape[-1] << rate_bits
        n1 = max(1 << (log2_strict(m) // 2), 1 << rate_bits)
        n2 = m // n1
        if _pallas_cols_ok(n1, n2) and _pallas_cols_ok(n2, n1):
            return _four_step_zero_tail_pallas(prefix, rate_bits, n1)
    fn = functools.partial(four_step_zero_tail_ntt, rate_bits=rate_bits)
    return jax.vmap(lambda lo, hi: fn((lo, hi)))(prefix[0], prefix[1])
