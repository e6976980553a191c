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


# ---------------------------------------------------------------------------
# v2 permutation: NAIVE round schedule + one block-diagonal (96,96) int8
# MXU matmul per MDS layer.
#
# Round-5 microbench (MICROBENCH_r05.json, real v5e): the v1 kernel's eight
# (12,12)x(12,T) int8 matmuls run at 342 M MDS/s — each tiny matmul pays a
# full padded MXU pass — while ONE (96,96)x(96,T) block-diagonal matmul
# (the 8 byte-planes stacked on sublanes) hits 5 521 M MDS/s, 16x.  With
# the MDS that cheap, the fast partial-round schedule (22 rounds of
# VPU-heavy w_hat/vs dot products + an init matrix with arbitrary-u64
# entries that can't ride the MXU) loses to the NAIVE schedule: rc add +
# one-row sbox + full MXU MDS per partial round.  Intermediate values stay
# NON-canonical 64-bit representatives (gf.*_nc) — the byte-plane
# decomposition and mul/add consumers accept any representative, so the
# canonicalizing subtract happens once, on the digest rows.
#
# Outputs are bit-identical to the fast schedule (exact modular arithmetic
# has one answer; the numpy oracle poseidon.poseidon IS the naive
# schedule), mirroring cuda/def.cuh:701-780's permute_poseidon contract.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _naive_tables():
    """rc (12, 30) u32 pair; blockdiag (96, 96) int8 MDS; offs (96, 1) i32.

    Plane values p in [0,255] ride as (p-128) int8; offs = 128*rowsum(M)
    corrects the offset after the matmul (plane sums then < 2^16)."""
    rc = pos.ALL_ROUND_CONSTANTS.reshape(pos.N_ROUNDS, WIDTH).T
    rlo = (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    rhi = (rc >> np.uint64(32)).astype(np.uint32)
    mds = pos.MDS_MATRIX.astype(np.int64)
    m96 = np.kron(np.eye(8, dtype=np.int64), mds)
    offs = (128 * m96.sum(axis=1)).astype(np.int32)[:, None]
    return rlo, rhi, m96.astype(np.int8), offs


def _sbox_nc(x):
    x2 = gf.square_nc(x)
    x3 = gf.mul_nc(x2, x)
    return gf.mul_nc(x3, gf.square_nc(x2))


def _mds96(state, m96, offs):
    """MDS via ONE (96,96)x(96,B) int8 MXU matmul over 8-bit planes.

    Accepts any 64-bit representative; returns a non-canonical one."""
    lo, hi = state

    def planes(x):
        out = []
        for s in (0, 8, 16, 24):
            v = (x >> np.uint32(s)) if s else x
            v = (v & np.uint32(0xFF)).astype(jnp.int32) - 128
            out.append(v.astype(jnp.int8))
        return out

    big = jnp.concatenate(planes(lo) + planes(hi), axis=0)   # (96, B) int8
    t = (jnp.matmul(m96, big, preferred_element_type=jnp.int32)
         + offs).astype(jnp.uint32)                          # (96, B) < 2^16
    W = WIDTH
    ts = [t[k * W:(k + 1) * W] for k in range(8)]
    return _recombine16_nc(ts[0] + (ts[1] << 8), ts[2] + (ts[3] << 8),
                           ts[4] + (ts[5] << 8), ts[6] + (ts[7] << 8))


def _recombine16_nc(t0, t1, t2, t3):
    """Four u32 16-bit-limb partial sums -> non-canonical GF pair."""
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
    return gf.reduce128_nc(s0, s1, s2, jnp.zeros_like(s2))


def _perm_naive(state, rlo, rhi, m96, offs):
    """Naive-schedule permutation on a (12, B) GF pair of 64-bit
    representatives; returns a NON-canonical pair (canonicalize digests
    with gf._canon)."""
    def rc_col(r):
        return rlo[:, r:r + 1], rhi[:, r:r + 1]

    r = 0
    for _ in range(HALF):
        state = _mds96(_sbox_nc(gf.add_nc(state, rc_col(r))), m96, offs)
        r += 1
    for _ in range(NPR):
        state = gf.add_nc(state, rc_col(r))
        r += 1
        s0 = _sbox_nc((state[0][0:1], state[1][0:1]))
        state = (jnp.concatenate([s0[0], state[0][1:]], axis=0),
                 jnp.concatenate([s0[1], state[1][1:]], axis=0))
        state = _mds96(state, m96, offs)
    for _ in range(HALF):
        state = _mds96(_sbox_nc(gf.add_nc(state, rc_col(r))), m96, offs)
        r += 1
    return state


def _perm_naive_multi(states, rlo, rhi, m96, offs):
    """Naive-schedule permutation on SEVERAL independent (12, B) state
    pairs, rounds interleaved in program order so Mosaic can overlap one
    chain's MXU matmul with another's VPU s-box (each chain alone is a
    strict sbox->MDS dependency chain that leaves one unit idle)."""
    def rc_col(r):
        return rlo[:, r:r + 1], rhi[:, r:r + 1]

    states = list(states)
    r = 0
    for _ in range(HALF):
        c = rc_col(r)
        states = [_mds96(_sbox_nc(gf.add_nc(s, c)), m96, offs)
                  for s in states]
        r += 1
    for _ in range(NPR):
        c = rc_col(r)
        r += 1
        nxt = []
        for s in states:
            s = gf.add_nc(s, c)
            s0 = _sbox_nc((s[0][0:1], s[1][0:1]))
            nxt.append((jnp.concatenate([s0[0], s[0][1:]], axis=0),
                        jnp.concatenate([s0[1], s[1][1:]], axis=0)))
        states = [_mds96(s, m96, offs) for s in nxt]
    for _ in range(HALF):
        c = rc_col(r)
        states = [_mds96(_sbox_nc(gf.add_nc(s, c)), m96, offs)
                  for s in states]
        r += 1
    return states


def poseidon_naive_t(state):
    """Trace-level v2 entry (parity tests): canonical in/out, bit-identical
    to poseidon_jax.poseidon_t / the numpy oracle."""
    rlo, rhi, m96, offs = _naive_tables()
    out = _perm_naive(state, jnp.asarray(rlo), jnp.asarray(rhi),
                      jnp.asarray(m96), jnp.asarray(offs))
    return gf._canon(*out)


def hash_leaves_cols_pallas(leaves, tile: int = 1024,
                            interpret: bool = False, chains: int = 2):
    """leaves (L, N) pair -> (4, N) digest pair, one Pallas kernel.

    Grid walks lane tiles of the leaf batch; each step stages an (L, tile)
    leaf block into VMEM, absorbs the L//8 full rate blocks plus remainder
    with the state held on-chip (v2 naive-schedule permutation, one
    blockdiag-96 int8 MXU matmul per MDS), and writes the (4, tile)
    digests.  ``chains`` independent lane sub-tiles run with their rounds
    interleaved so the MXU (MDS) and VPU (s-box) overlap."""
    from jax.experimental import pallas as pl

    lo, hi = leaves
    L, N = lo.shape
    assert N % tile == 0, (N, tile)
    assert tile % chains == 0, (tile, chains)
    sub = tile // chains
    full, rem = divmod(L, RATE)

    def kernel(rlo_ref, rhi_ref, m96_ref, offs_ref, lo_ref, hi_ref,
               out_lo_ref, out_hi_ref):
        rlo = rlo_ref[...]
        rhi = rhi_ref[...]
        m96 = m96_ref[...]
        offs = offs_ref[...]

        def lanes(ref, r0, nr, c):
            return ref[pl.ds(r0, nr), pl.ds(c * sub, sub)]

        def absorb(k, sts):
            sts = [(jnp.concatenate([lanes(lo_ref, k * RATE, RATE, c),
                                     sts[c][0][RATE:]], axis=0),
                    jnp.concatenate([lanes(hi_ref, k * RATE, RATE, c),
                                     sts[c][1][RATE:]], axis=0))
                   for c in range(chains)]
            return tuple(_perm_naive_multi(sts, rlo, rhi, m96, offs))

        states = tuple(gf.zeros((WIDTH, sub)) for _ in range(chains))
        if full:
            states = jax.lax.fori_loop(0, full, absorb, states)
        if rem:
            states = [(jnp.concatenate([lanes(lo_ref, L - rem, rem, c),
                                        states[c][0][rem:]], axis=0),
                       jnp.concatenate([lanes(hi_ref, L - rem, rem, c),
                                        states[c][1][rem:]], axis=0))
                      for c in range(chains)]
            states = _perm_naive_multi(states, rlo, rhi, m96, offs)
        dig = [gf._canon(s[0][:4], s[1][:4]) for s in states]
        out_lo_ref[...] = jnp.concatenate([d[0] for d in dig], axis=1)
        out_hi_ref[...] = jnp.concatenate([d[1] for d in dig], axis=1)

    rlo_np, rhi_np, m96_np, offs_np = _naive_tables()
    out_shape = (jax.ShapeDtypeStruct((4, N), jnp.uint32),
                 jax.ShapeDtypeStruct((4, N), jnp.uint32))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((WIDTH, pos.N_ROUNDS), lambda i: (0, 0)),
                  pl.BlockSpec((WIDTH, pos.N_ROUNDS), lambda i: (0, 0)),
                  pl.BlockSpec((96, 96), lambda i: (0, 0)),
                  pl.BlockSpec((96, 1), lambda i: (0, 0)),
                  pl.BlockSpec((L, tile), lambda i: (0, i)),
                  pl.BlockSpec((L, tile), lambda i: (0, i))],
        out_specs=(pl.BlockSpec((4, tile), lambda i: (0, i)),
                   pl.BlockSpec((4, tile), lambda i: (0, i))),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(rlo_np), jnp.asarray(rhi_np), jnp.asarray(m96_np),
      jnp.asarray(offs_np), lo, hi)
    return out_lo, out_hi


def compress_pairs_cols_pallas(left, right, tile: int = 1024,
                               interpret: bool = False, chains: int = 2):
    """One Merkle level: left/right child digests ((4, m) pairs, already
    de-interleaved by the caller — Mosaic has no strided lane slice) ->
    (4, m) parent pair, one v2 permutation per node; ``chains`` lane
    sub-tiles interleaved for MXU/VPU overlap."""
    from jax.experimental import pallas as pl

    m = left[0].shape[1]
    t = min(tile, m)
    ch = chains if t % chains == 0 else 1
    sub = t // ch

    def kernel(rlo_ref, rhi_ref, m96_ref, offs_ref,
               llo_ref, lhi_ref, rglo_ref, rghi_ref,
               out_lo_ref, out_hi_ref):
        rlo = rlo_ref[...]
        rhi = rhi_ref[...]
        m96 = m96_ref[...]
        offs = offs_ref[...]
        states = []
        for c in range(ch):
            s = pl.ds(c * sub, sub)
            llo = llo_ref[:, s]
            states.append((jnp.concatenate(
                               [llo, rglo_ref[:, s], jnp.zeros_like(llo)],
                               axis=0),
                           jnp.concatenate(
                               [lhi_ref[:, s], rghi_ref[:, s],
                                jnp.zeros_like(llo)], axis=0)))
        states = _perm_naive_multi(states, rlo, rhi, m96, offs)
        dig = [gf._canon(s[0][:4], s[1][:4]) for s in states]
        out_lo_ref[...] = jnp.concatenate([d[0] for d in dig], axis=1)
        out_hi_ref[...] = jnp.concatenate([d[1] for d in dig], axis=1)

    rlo_np, rhi_np, m96_np, offs_np = _naive_tables()
    out_shape = (jax.ShapeDtypeStruct((4, m), jnp.uint32),
                 jax.ShapeDtypeStruct((4, m), jnp.uint32))
    half = pl.BlockSpec((4, t), lambda i: (0, i))
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(m // t,),
        in_specs=[pl.BlockSpec((WIDTH, pos.N_ROUNDS), lambda i: (0, 0)),
                  pl.BlockSpec((WIDTH, pos.N_ROUNDS), lambda i: (0, 0)),
                  pl.BlockSpec((96, 96), lambda i: (0, 0)),
                  pl.BlockSpec((96, 1), lambda i: (0, 0)),
                  half, half, half, half],
        out_specs=(pl.BlockSpec((4, t), lambda i: (0, i)),
                   pl.BlockSpec((4, t), lambda i: (0, i))),
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(rlo_np), jnp.asarray(rhi_np), jnp.asarray(m96_np),
      jnp.asarray(offs_np), left[0], left[1], right[0], right[1])
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
