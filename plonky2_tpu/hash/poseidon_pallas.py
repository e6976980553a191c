"""Poseidon leaf sponge as a Pallas TPU kernel — states resident in VMEM,
MDS on the MXU.

The XLA sponge (poseidon_jax.hash_leaves_cols) runs at ~15.6M perms/s on a
v5e — near the VPU instruction ceiling for the (12, B) elementwise
formulation, because every round's MDS costs ~1.3k VPU madds.  This kernel
keeps the whole absorb loop's state in VMEM and offloads the MDS to the
MXU: the 64-bit state splits into eight 8-bit planes and each plane is one
native int8 (12,12)x(12,B) matmul (MDS entries < 64; plane sums < 2^18 —
exact in int32 accumulation; int8 operands are offset by -128 and
corrected with 128*rowsum(M), since int8 is signed).  Mirrors the
reference's hash_leaves_kernel (cuda/plonky2_gpu_impl.cuh:350-409: one
thread per leaf, rate-8 overwrite absorb) with the batch axis on the VPU
lanes.

The permutation uses the SAME fast-partial-round schedule as
poseidon_wires_jax.poseidon_fast_t — bit-identical output — but
reformulated so every op is (12, B)-wide:

  full round      sbox(st + rc) then MXU MDS
  init matrix     out[c] = sum_r st[r]*M[r,c]: 12 wide muls by M^T columns
  partial round   x0 = sbox(st[0]) + prc_i;  T = [x0, st[1:]]
                  d  = sum_rows(T * Wcol_i)      (Wcol_i = [c0+d0, w_hats_i])
                  st = [d, (T + x0*VScol_i)[1:]] (VScol_i = [0, vs_i])

Round constants / W / VS / M^T columns ride in one packed (12, TW) u32
table pair passed as kernel inputs (Pallas forbids captured array
constants), sliced STATICALLY per unrolled round so Mosaic sees
straight-line code (~3k wide ops per permutation — compiles in seconds,
vs the row-sliced v1 whose 45k scalar-row ops took 125-455 s).
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..field import gf_jax as gf
from . import poseidon as pos
from . import poseidon_schedule as ps

WIDTH = pos.WIDTH
RATE = pos.SPONGE_RATE
HALF = ps.HALF_N_FULL_ROUNDS
NPR = ps.N_PARTIAL_ROUNDS

_M16 = np.uint32(0xFFFF)

# packed table column layout
_COL_FULL0 = 0                       # 4 cols: first-half full-round RCs
_COL_FULL1 = 4                       # 4 cols: second-half full-round RCs
_COL_FIRST = 8                       # 1 col: fast-partial first RC
_COL_W = 9                           # 22 cols: [c0+d0, w_hats[i]]
_COL_VS = 31                         # 22 cols: [0, vs[i]]
_COL_MT = 53                         # 12 cols: init matrix M^T
_COL_PRC = 65                        # 22 cols: row 0 = prc[i], rest 0
_COL_OFFS = 87                       # 1 col: 128 * rowsum(MDS) (int8 offset)
_TW = 88


@functools.lru_cache(maxsize=1)
def _np_tables():
    """Fast-schedule constants as plain numpy (trace-time use)."""
    rc = pos.ALL_ROUND_CONSTANTS.reshape(pos.N_ROUNDS, WIDTH)
    full0 = rc[:HALF]                                     # (4, 12) u64
    full1 = rc[HALF + NPR:]                               # (4, 12) u64
    first = ps.FAST_PARTIAL_FIRST_ROUND_CONSTANT          # (12,) u64
    prc = np.zeros(NPR, dtype=np.uint64)
    prc[: NPR - 1] = ps.FAST_PARTIAL_ROUND_CONSTANTS[: NPR - 1]
    w_hats = ps.FAST_PARTIAL_ROUND_W_HATS                 # (22, 11) u64
    vs = ps.FAST_PARTIAL_ROUND_VS                         # (22, 11) u64
    M = np.zeros((WIDTH, WIDTH), dtype=np.uint64)
    M[0, 0] = 1
    M[1:, 1:] = ps.FAST_PARTIAL_ROUND_INITIAL_MATRIX
    c0d0 = int(ps._CIRC[0] + ps._DIAG[0])
    mds = pos.MDS_MATRIX.astype(np.uint32)                # entries < 64
    return full0, full1, first, prc, w_hats, vs, M, c0d0, mds


@functools.lru_cache(maxsize=1)
def _packed_tables():
    """(tlo, thi) (12, _TW) u32, mds_i8 (12, 12) int8 — kernel inputs."""
    full0, full1, first, prc, w_hats, vs, M, c0d0, mds = _np_tables()
    t = np.zeros((WIDTH, _TW), dtype=np.uint64)
    t[:, _COL_FULL0:_COL_FULL0 + HALF] = full0.T
    t[:, _COL_FULL1:_COL_FULL1 + HALF] = full1.T
    t[:, _COL_FIRST] = first
    w = np.zeros((WIDTH, NPR), dtype=np.uint64)
    w[0, :] = c0d0
    w[1:, :] = w_hats.T
    t[:, _COL_W:_COL_W + NPR] = w
    v = np.zeros((WIDTH, NPR), dtype=np.uint64)
    v[1:, :] = vs.T
    t[:, _COL_VS:_COL_VS + NPR] = v
    t[:, _COL_MT:_COL_MT + WIDTH] = M.T          # col _COL_MT+r = M[r, :]
    t[0, _COL_PRC:_COL_PRC + NPR] = prc
    rowsum = mds.astype(np.int64).sum(axis=1)
    t[:, _COL_OFFS] = (128 * rowsum).astype(np.uint64)
    tlo = (t & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    thi = (t >> np.uint64(32)).astype(np.uint32)
    return tlo, thi, mds.astype(np.int8)


def _sbox(x):
    x2 = gf.square(x)
    x3 = gf.mul(x2, x)
    return gf.mul(x3, gf.square(x2))


def _recombine16(t0, t1, t2, t3):
    """Four u32 16-bit-limb partial sums -> canonical GF pair."""
    c0 = t0 & _M16
    r = t0 >> 16
    s = t1 + r
    c1 = s & _M16
    r = s >> 16
    s = t2 + r
    c2 = s & _M16
    r = s >> 16
    s = t3 + r
    c3 = s & _M16
    r = s >> 16
    c4 = r & _M16
    c5 = r >> 16
    s0 = c0 | (c1 << 16)
    s1 = c2 | (c3 << 16)
    s2 = c4 | (c5 << 16)
    return gf.reduce128(s0, s1, s2, jnp.zeros_like(s2))


def _mds_mxu(state, m8, offs):
    """MDS via eight int8 (12,12)x(12,B) MXU matmuls over 8-bit planes.

    plane values p in [0,255] ride as (p-128) int8; the matmul result is
    corrected with offs = 128*rowsum(M).  Plane sums < 64*255*12 < 2^18."""
    lo, hi = state

    def planes(x):
        return [(((x >> s) & np.uint32(0xFF)).astype(jnp.int32) - 128)
                .astype(jnp.int8) for s in (0, 8, 16, 24)]

    pl_ = planes(lo) + planes(hi)
    t = [(jnp.matmul(m8, p, preferred_element_type=jnp.int32) + offs)
         .astype(jnp.uint32) for p in pl_]
    # 8-bit plane sums pair into 16-bit limb sums (each < 2^26)
    return _recombine16(t[0] + (t[1] << 8), t[2] + (t[3] << 8),
                        t[4] + (t[5] << 8), t[6] + (t[7] << 8))


def _mds_vpu(state):
    """MDS via four 16-bit planes, unrolled VPU madds (interpret-mode /
    non-MXU fallback; same math as poseidon_jax._mds)."""
    lo, hi = state
    mds = _np_tables()[8]
    planes = [lo & _M16, lo >> 16, hi & _M16, hi >> 16]
    t = []
    for p in planes:
        rows = []
        for r in range(WIDTH):
            acc = mds[r, 0] * p[0]
            for c in range(1, WIDTH):
                acc = acc + mds[r, c] * p[c]
            rows.append(acc)
        t.append(jnp.stack(rows))
    return _recombine16(t[0], t[1], t[2], t[3])


def _sum_rows(p):
    """Modular sum over the sublane axis of a (12, B) GF pair -> (1, B).

    Contiguous-halves fold (first half + second half) — Mosaic has no
    strided sublane slice, and modular addition is associative so any
    fold shape is bit-identical."""
    lo, hi = p
    while lo.shape[0] > 1:
        k = lo.shape[0]
        h = k // 2
        s = gf.add((lo[:h], hi[:h]), (lo[h:2 * h], hi[h:2 * h]))
        if k % 2:
            s = (jnp.concatenate([s[0], lo[2 * h:]], axis=0),
                 jnp.concatenate([s[1], hi[2 * h:]], axis=0))
        lo, hi = s
    return lo, hi


def _perm_tables(state, tlo, thi, m8, use_mxu: bool):
    """Fast-schedule permutation on a (12, B) GF pair, constants read from
    the packed table VALUES (static column slices — unrolled rounds)."""
    def col(c0, n=1):
        return tlo[:, c0:c0 + n], thi[:, c0:c0 + n]

    offs = tlo[:, _COL_OFFS:_COL_OFFS + 1].astype(jnp.int32)
    mds = (lambda s: _mds_mxu(s, m8, offs)) if use_mxu else _mds_vpu

    for r in range(HALF):
        state = mds(_sbox(gf.add_nc(state, col(_COL_FULL0 + r))))
    state = gf.add_nc(state, col(_COL_FIRST))

    # init matrix: acc[c] = sum_r state[r] * M[r, c]
    acc = None
    for r in range(WIDTH):
        mt = col(_COL_MT + r)                 # (12, 1): M[r, :]
        term = gf.mul((state[0][r:r + 1], state[1][r:r + 1]), mt)
        acc = term if acc is None else gf.add(acc, term)
    state = acc

    # split (head, rest) carried through the 22 partial rounds, ONE concat
    # at the end — a per-round concat of the fresh head hangs the XLA CPU
    # compiler (multi-output fusion + concat pathology; see
    # poseidon_wires_jax._partial_block), and Mosaic also schedules the
    # split form better
    s0 = (state[0][0:1], state[1][0:1])
    rest = (state[0][1:], state[1][1:])
    for i in range(NPR):
        x0 = _sbox(s0)
        x0 = gf.add(x0, (tlo[0:1, _COL_PRC + i:_COL_PRC + i + 1],
                         thi[0:1, _COL_PRC + i:_COL_PRC + i + 1]))
        w0 = (tlo[0:1, _COL_W + i:_COL_W + i + 1],
              thi[0:1, _COL_W + i:_COL_W + i + 1])
        wr = (tlo[1:, _COL_W + i:_COL_W + i + 1],
              thi[1:, _COL_W + i:_COL_W + i + 1])
        d = gf.add(gf.mul(x0, w0), _sum_rows(gf.mul(rest, wr)))
        vsr = (tlo[1:, _COL_VS + i:_COL_VS + i + 1],
               thi[1:, _COL_VS + i:_COL_VS + i + 1])
        xb = (jnp.broadcast_to(x0[0], rest[0].shape),
              jnp.broadcast_to(x0[1], rest[1].shape))
        rest = gf.add(rest, gf.mul(xb, vsr))
        s0 = d
    state = (jnp.concatenate([s0[0], rest[0]], axis=0),
             jnp.concatenate([s0[1], rest[1]], axis=0))

    for r in range(HALF):
        state = mds(_sbox(gf.add_nc(state, col(_COL_FULL1 + r))))
    return state


def poseidon_fast_t_unrolled(state, use_mxu: bool = False):
    """Trace-level entry (parity tests): bit-identical to
    poseidon_wires_jax.poseidon_fast_t."""
    tlo, thi, m8 = _packed_tables()
    return _perm_tables(state, jnp.asarray(tlo), jnp.asarray(thi),
                        jnp.asarray(m8), use_mxu)


def hash_leaves_cols_pallas(leaves, tile: int = 1024,
                            interpret: bool = False):
    """leaves (L, N) pair -> (4, N) digest pair, one Pallas kernel.

    Grid walks lane tiles of the leaf batch; each step stages an (L, tile)
    leaf block into VMEM, absorbs the L//8 full rate blocks plus remainder
    with the state held on-chip, and writes the (4, tile) digests."""
    from jax.experimental import pallas as pl

    lo, hi = leaves
    L, N = lo.shape
    assert N % tile == 0, (N, tile)
    full, rem = divmod(L, RATE)
    # int8 matmul is exact integer math on every backend (MXU on TPU,
    # plain matmul under interpret) — and the matmul form keeps the
    # interpret-mode XLA graph small
    use_mxu = True

    def kernel(tlo_ref, thi_ref, m8_ref, lo_ref, hi_ref,
               out_lo_ref, out_hi_ref):
        tlo = tlo_ref[...]
        thi = thi_ref[...]
        m8 = m8_ref[...]
        state = gf.zeros((WIDTH, tile))

        def absorb(k, st):
            block = (lo_ref[pl.ds(k * RATE, RATE), :],
                     hi_ref[pl.ds(k * RATE, RATE), :])
            st = (jnp.concatenate([block[0], st[0][RATE:]], axis=0),
                  jnp.concatenate([block[1], st[1][RATE:]], axis=0))
            return _perm_tables(st, tlo, thi, m8, use_mxu)

        if full:
            state = jax.lax.fori_loop(0, full, absorb, state)
        if rem:
            state = (jnp.concatenate([lo_ref[L - rem:L, :],
                                      state[0][rem:]], axis=0),
                     jnp.concatenate([hi_ref[L - rem:L, :],
                                      state[1][rem:]], axis=0))
            state = _perm_tables(state, tlo, thi, m8, use_mxu)
        out_lo_ref[...] = state[0][:4]
        out_hi_ref[...] = state[1][:4]

    tlo_np, thi_np, m8_np = _packed_tables()
    out_shape = (jax.ShapeDtypeStruct((4, N), jnp.uint32),
                 jax.ShapeDtypeStruct((4, N), jnp.uint32))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((WIDTH, _TW), lambda i: (0, 0)),
                  pl.BlockSpec((WIDTH, _TW), lambda i: (0, 0)),
                  pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0)),
                  pl.BlockSpec((L, tile), lambda i: (0, i)),
                  pl.BlockSpec((L, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((4, tile), lambda i: (0, i)),
                   pl.BlockSpec((4, tile), lambda i: (0, i))),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(tlo_np), jnp.asarray(thi_np), jnp.asarray(m8_np), lo, hi)
    return out_lo, out_hi


def compress_pairs_cols_pallas(left, right, tile: int = 1024,
                               interpret: bool = False):
    """One Merkle level: left/right child digests ((4, m) pairs, already
    de-interleaved by the caller — Mosaic has no strided lane slice) ->
    (4, m) parent pair, one permutation per node."""
    from jax.experimental import pallas as pl

    m = left[0].shape[1]
    t = min(tile, m)
    use_mxu = True

    def kernel(tlo_ref, thi_ref, m8_ref, llo_ref, lhi_ref, rlo_ref, rhi_ref,
               out_lo_ref, out_hi_ref):
        tlo = tlo_ref[...]
        thi = thi_ref[...]
        m8 = m8_ref[...]
        llo = llo_ref[...]
        state = (jnp.concatenate(
                    [llo, rlo_ref[...], jnp.zeros_like(llo)], axis=0),
                 jnp.concatenate(
                    [lhi_ref[...], rhi_ref[...],
                     jnp.zeros_like(llo)], axis=0))
        state = _perm_tables(state, tlo, thi, m8, use_mxu)
        out_lo_ref[...] = state[0][:4]
        out_hi_ref[...] = state[1][:4]

    tlo_np, thi_np, m8_np = _packed_tables()
    out_shape = (jax.ShapeDtypeStruct((4, m), jnp.uint32),
                 jax.ShapeDtypeStruct((4, m), jnp.uint32))
    half = pl.BlockSpec((4, t), lambda i: (0, i))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(m // t,),
        in_specs=[pl.BlockSpec((WIDTH, _TW), lambda i: (0, 0)),
                  pl.BlockSpec((WIDTH, _TW), lambda i: (0, 0)),
                  pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0)),
                  half, half, half, half],
        out_specs=(pl.BlockSpec((4, t), lambda i: (0, i)),
                   pl.BlockSpec((4, t), lambda i: (0, i))),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(tlo_np), jnp.asarray(thi_np), jnp.asarray(m8_np),
      left[0], left[1], right[0], right[1])
    return out_lo, out_hi


def sponge_enabled() -> bool:
    """Use the Pallas sponge on real TPU unless disabled; CPU test runs can
    opt in with PLONKY2_TPU_PALLAS_SPONGE=interpret."""
    mode = os.environ.get("PLONKY2_TPU_PALLAS_SPONGE", "auto")
    if mode == "0":
        return False
    if mode == "interpret":
        return True
    return jax.default_backend() == "tpu"


def sponge_interpret() -> bool:
    return os.environ.get("PLONKY2_TPU_PALLAS_SPONGE") == "interpret"
