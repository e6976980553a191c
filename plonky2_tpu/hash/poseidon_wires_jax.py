"""Device Poseidon witness waves — the FAST partial-round schedule with all
gate-wire intermediates, as compact lax.scan programs.

`PoseidonGenerator.run_batch` (gates/poseidon_gate.py) replays the fast
schedule (reference plonky2/src/hash/poseidon.rs:174-470) in numpy to fill
the 122 non-input wires of every ready PoseidonGate row.  This module is the
TPU equivalent: one (12, G)-state program over (lo, hi) uint32 pairs whose
traced graph is O(1) in the round count (three scans + one init-matrix scan),
so a witness plan containing one wave per hash-tree level stays cheap to
compile.

Output layout is TRANSPOSED — (122, G) — column order matching
``PoseidonGenerator.output_targets``:
    4 deltas | 36 full_sbox_0 (r=1..3) | 22 partial_sbox | 48 full_sbox_1
    | 12 outputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gf_jax as gf
from . import poseidon as pos
from . import poseidon_jax as pj
from . import poseidon_schedule as ps

WIDTH = ps.WIDTH
HALF = ps.HALF_N_FULL_ROUNDS
NPR = ps.N_PARTIAL_ROUNDS
NUM_OUTPUT_WIRES = 4 + WIDTH * (HALF - 1) + NPR + WIDTH * HALF + WIDTH  # 122


@functools.lru_cache(maxsize=1)
def _tables():
    """All round-constant tables as numpy (lo, hi) pairs, scan-ready."""
    rc = pos.ALL_ROUND_CONSTANTS.reshape(pos.N_ROUNDS, WIDTH)
    full0 = gf.from_u64(rc[:HALF][:, :, None])              # (4, 12, 1)
    full1 = gf.from_u64(rc[HALF + NPR:][:, :, None])        # (4, 12, 1)
    first = gf.from_u64(
        ps.FAST_PARTIAL_FIRST_ROUND_CONSTANT[:, None])      # (12, 1)
    # partial-round constant r is added AFTER the sbox of round r for
    # r < NPR-1; the last round adds none (poseidon_gate.py:208-215)
    prc = np.zeros(NPR, dtype=np.uint64)
    prc[: NPR - 1] = ps.FAST_PARTIAL_ROUND_CONSTANTS[: NPR - 1]
    prc_pair = gf.from_u64(prc)                              # (22,)
    w_hats = gf.from_u64(
        ps.FAST_PARTIAL_ROUND_W_HATS[:, :, None])            # (22, 11, 1)
    vs = gf.from_u64(ps.FAST_PARTIAL_ROUND_VS[:, :, None])   # (22, 11, 1)
    # init matrix rows, padded so row 0 = e_0 (state[0] passes through) and
    # column 0 of rows >= 1 is zero (mds_partial_layer_init semantics)
    M = np.zeros((WIDTH, WIDTH), dtype=np.uint64)
    M[0, 0] = 1
    M[1:, 1:] = ps.FAST_PARTIAL_ROUND_INITIAL_MATRIX
    init_rows = gf.from_u64(M[:, :, None])                   # (12, 12, 1)
    c0d0 = int(ps._CIRC[0] + ps._DIAG[0])
    return full0, full1, first, prc_pair, w_hats, vs, init_rows, c0d0


def _sbox(x):
    x2 = gf.square(x)
    x3 = gf.mul(x2, x)
    return gf.mul(x3, gf.square(x2))


def sum_axis0(p):
    """Modular sum of a (K, ...) GF pair along axis 0 (pairwise fold)."""
    lo, hi = p
    while lo.shape[0] > 1:
        k = lo.shape[0]
        if k % 2:
            lo = jnp.concatenate([lo, jnp.zeros_like(lo[:1])], axis=0)
            hi = jnp.concatenate([hi, jnp.zeros_like(hi[:1])], axis=0)
        lo, hi = gf.add((lo[0::2], hi[0::2]), (lo[1::2], hi[1::2]))
    return lo[0], hi[0]


def _full_block(state, rcs):
    """Scan full rounds; ys = post-constant-layer states (R, 12, G)."""

    def body(st, rc):
        st1 = gf.add(st, rc)
        return pj._mds(_sbox(st1)), st1

    return jax.lax.scan(body, state, rcs)


def _init_matrix(state, init_rows):
    """result[c] = sum_r state[r] * M[r, c] — scan over rows (O(1) trace)."""
    G = state[0].shape[1]
    acc = gf.zeros((WIDTH, G))

    def body(a, x):
        st_lo, st_hi, row = x              # (G,), (G,), (12, 1) pair
        term = gf.mul((st_lo[None, :], st_hi[None, :]), row)
        return gf.add(a, term), None

    acc, _ = jax.lax.scan(body, acc, (state[0], state[1], init_rows))
    return acc


def _partial_block(state, prc, w_hats, vs, c0d0):
    """Scan NPR partial rounds; ys = pre-sbox state[0] wires (NPR, G).

    The carry is the SPLIT state (head, rest) rather than the packed
    (12, G) array: a scan body that concatenates the freshly computed head
    and rest back together hangs the XLA CPU compiler (>10 min on a
    4-lane input — multi-output fusion + concat pathology); splitting the
    carry and concatenating once after the scan compiles in ~1 s."""
    s0 = (state[0][0], state[1][0])                     # (G,)
    rest = (state[0][1:], state[1][1:])                 # (11, G)

    def body(carry, x):
        s0, rest = carry
        rc_lo, rc_hi, w_hat, v = x
        x0 = gf.add(_sbox(s0), (rc_lo, rc_hi))
        d = gf.add(gf.mul_const(x0, c0d0),
                   sum_axis0(gf.mul(rest, w_hat)))
        new_rest = gf.add(rest, gf.mul((x0[0][None, :], x0[1][None, :]), v))
        return (d, new_rest), s0

    (d, rest), ys = jax.lax.scan(body, (s0, rest),
                                 (prc[0], prc[1], w_hats, vs))
    out = (jnp.concatenate([d[0][None, :], rest[0]], axis=0),
           jnp.concatenate([d[1][None, :], rest[1]], axis=0))
    return out, ys


def poseidon_fast_t(state):
    """Final-state-only fast-schedule permutation on a transposed (12, B)
    GF pair — the sponge-path replacement for the naive 30-round
    `poseidon_jax.poseidon_t` (~25% fewer VPU ops: fast partial rounds,
    squaring sboxes, non-canonical round-constant adds).  Bit-identical
    output (every representative feeds a reducing mul; the final MDS
    emits canonical values)."""
    full0_rc, full1_rc, first, prc, w_hats, vs, init_rows, c0d0 = [
        (jnp.asarray(t[0]), jnp.asarray(t[1])) if isinstance(t, tuple) else t
        for t in _tables()]

    def body_full(st, rc):
        return pj._mds(_sbox(gf.add_nc(st, rc))), None

    state, _ = jax.lax.scan(body_full, state, full0_rc)
    state = gf.add_nc(state, first)
    state = _init_matrix(state, init_rows)
    state, _ = _partial_block(state, prc, w_hats, vs, c0d0)
    state, _ = jax.lax.scan(body_full, state, full1_rc)
    return state


def poseidon_wire_batch(dep_pair):
    """dep_pair: (G, 13) GF pair — 12 inputs + swap — to (122, G) GF pair of
    output-wire values in `PoseidonGenerator.output_targets` order."""
    full0_rc, full1_rc, first, prc, w_hats, vs, init_rows, c0d0 = [
        (jnp.asarray(t[0]), jnp.asarray(t[1])) if isinstance(t, tuple) else t
        for t in _tables()]

    dep_lo, dep_hi = dep_pair
    ins = (dep_lo[:, :WIDTH].T, dep_hi[:, :WIDTH].T)    # (12, G)
    swap = (dep_lo[:, WIDTH], dep_hi[:, WIDTH])         # (G,)

    # deltas: swap * (in[i+4] - in[i]) for i in 0..4
    a = (ins[0][:4], ins[1][:4])
    b = (ins[0][4:8], ins[1][4:8])
    sw_b = (swap[0][None, :], swap[1][None, :])
    deltas = gf.mul(sw_b, gf.sub(b, a))                 # (4, G)

    do_swap = (swap[0] == 1) & (swap[1] == 0)
    sa = gf.select(do_swap[None, :], b, a)
    sb = gf.select(do_swap[None, :], a, b)
    state = (jnp.concatenate([sa[0], sb[0], ins[0][8:]], axis=0),
             jnp.concatenate([sa[1], sb[1], ins[1][8:]], axis=0))

    state, ys0 = _full_block(state, full0_rc)           # ys0 (4, 12, G)
    state = gf.add(state, first)
    state = _init_matrix(state, init_rows)
    state, ysp = _partial_block(state, prc, w_hats, vs, c0d0)  # (22, G)
    state, ys1 = _full_block(state, full1_rc)           # (4, 12, G)

    G = dep_lo.shape[0]
    out_lo = jnp.concatenate([
        deltas[0], ys0[0][1:].reshape(WIDTH * (HALF - 1), G), ysp[0],
        ys1[0].reshape(WIDTH * HALF, G), state[0]], axis=0)
    out_hi = jnp.concatenate([
        deltas[1], ys0[1][1:].reshape(WIDTH * (HALF - 1), G), ysp[1],
        ys1[1].reshape(WIDTH * HALF, G), state[1]], axis=0)
    return out_lo, out_hi
