"""Poseidon permutation over Goldilocks, width 12 — numpy CPU oracle.

Parameters are the standard plonky2 Poseidon-Goldilocks instantiation
(reference plonky2/src/hash/poseidon.rs:27-53, poseidon_goldilocks.rs:21-22):
8 full + 22 partial rounds, x^7 S-box, circulant+diagonal MDS
[17,15,41,16,2,28,13,13,39,18,34,20] + diag(8,0,...,0).  Round constants are
loaded from ``poseidon_round_constants.npy`` (public standardized values).

We implement the *naive* round schedule (constant layer -> S-box -> MDS each
round, partial rounds S-box only lane 0), which is mathematically identical to
the reference's fast partial-round evaluation — exact modular arithmetic has a
unique answer — and is the form that vectorizes cleanly.

State arrays: uint64, shape (..., 12); batched over leading axes.
"""
from __future__ import annotations

import os

import numpy as np

from ..field import goldilocks as gl

WIDTH = 12
SPONGE_RATE = 8
SPONGE_CAPACITY = 4
HALF_N_FULL_ROUNDS = 4
N_PARTIAL_ROUNDS = 22
N_ROUNDS = 2 * HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS  # 30

MDS_CIRC = np.array([17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20], dtype=np.uint64)
MDS_DIAG = np.array([8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], dtype=np.uint64)

_HERE = os.path.dirname(os.path.abspath(__file__))
ALL_ROUND_CONSTANTS = np.load(os.path.join(_HERE, "poseidon_round_constants.npy"))
assert ALL_ROUND_CONSTANTS.shape == (WIDTH * N_ROUNDS,)

# MDS matrix M[r, c] = CIRC[(c - r) mod 12] + (r == c) * DIAG[r]
_idx = (np.arange(WIDTH)[None, :] - np.arange(WIDTH)[:, None]) % WIDTH
MDS_MATRIX = MDS_CIRC[_idx] + np.diag(MDS_DIAG)


def _sbox(x: np.ndarray) -> np.ndarray:
    x2 = gl.mul(x, x)
    x3 = gl.mul(x2, x)
    x4 = gl.mul(x2, x2)
    return gl.mul(x3, x4)


def _mds(state: np.ndarray) -> np.ndarray:
    """MDS layer: 64-bit state x small-int matrix, exact via 32-bit split.

    acc = sum_c M[r,c] * v[c]; coefficients < 64 so lo/hi 32-bit partial sums
    stay under 2^41 in uint64, recombined and reduced 128->64.
    """
    lo = state & np.uint64(0xFFFFFFFF)
    hi = state >> np.uint64(32)
    # (..., 12) @ (12, 12)^T : acc[r] = sum_c v[c] * M[r, c]
    acc_lo = lo @ MDS_MATRIX.T  # < 12 * 41 * 2^32 + 8*2^32 < 2^41
    acc_hi = hi @ MDS_MATRIX.T
    low64 = acc_lo + ((acc_hi & np.uint64(0xFFFFFFFF)) << np.uint64(32))
    carry = (low64 < acc_lo).astype(np.uint64)
    high64 = (acc_hi >> np.uint64(32)) + carry
    return gl.reduce128(low64, high64)


def poseidon(state: np.ndarray) -> np.ndarray:
    """Full 30-round permutation; state shape (..., 12) uint64 canonical."""
    state = np.asarray(state, dtype=np.uint64)
    assert state.shape[-1] == WIDTH
    rc = ALL_ROUND_CONSTANTS
    round_ctr = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        state = gl.add(state, rc[round_ctr * WIDTH:(round_ctr + 1) * WIDTH])
        state = _sbox(state)
        state = _mds(state)
        round_ctr += 1
    for _ in range(N_PARTIAL_ROUNDS):
        state = gl.add(state, rc[round_ctr * WIDTH:(round_ctr + 1) * WIDTH])
        s0 = _sbox(state[..., :1])
        state = np.concatenate([s0, state[..., 1:]], axis=-1)
        state = _mds(state)
        round_ctr += 1
    for _ in range(HALF_N_FULL_ROUNDS):
        state = gl.add(state, rc[round_ctr * WIDTH:(round_ctr + 1) * WIDTH])
        state = _sbox(state)
        state = _mds(state)
        round_ctr += 1
    return state


_RC_INT = [int(x) for x in ALL_ROUND_CONSTANTS]
_MDS_INT = [[int(x) for x in row] for row in MDS_MATRIX]
_P = gl.P


_FAST_CACHE = {}


def _fast_consts():
    """Fast partial-round tables as python ints (lazy, avoids import cycle)."""
    if not _FAST_CACHE:
        from . import poseidon_schedule as ps
        _FAST_CACHE["fprc"] = [int(x) for x in ps.FAST_PARTIAL_ROUND_CONSTANTS]
        _FAST_CACHE["first"] = [int(x) for x in ps.FAST_PARTIAL_FIRST_ROUND_CONSTANT]
        _FAST_CACHE["vs"] = [[int(x) for x in row] for row in ps.FAST_PARTIAL_ROUND_VS]
        _FAST_CACHE["whats"] = [[int(x) for x in row] for row in ps.FAST_PARTIAL_ROUND_W_HATS]
        _FAST_CACHE["init"] = [[int(x) for x in row] for row in ps.FAST_PARTIAL_ROUND_INITIAL_MATRIX]
        _FAST_CACHE["ms0"] = int(MDS_CIRC[0]) + int(MDS_DIAG[0])
    return _FAST_CACHE


def poseidon_ints(state):
    """Permutation on a single state of 12 python ints — fast scalar path for
    host work (Merkle path verify, challenger duplexing).  Uses the fast
    partial-round schedule; output identical to `poseidon`."""
    fc = _fast_consts()
    s = [x % _P for x in state]
    rc = _RC_INT
    mds = _MDS_INT
    ctr = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        base = ctr * WIDTH
        s = [(s[i] + rc[base + i]) for i in range(WIDTH)]
        for i in range(WIDTH):
            x = s[i] % _P
            x2 = x * x % _P
            s[i] = x2 * x2 % _P * (x2 * x % _P) % _P
        s = [sum(m_i[c] * s[c] for c in range(WIDTH)) % _P for m_i in mds]
        ctr += 1
    # fast partial rounds
    first = fc["first"]
    s = [(s[i] + first[i]) % _P for i in range(WIDTH)]
    init = fc["init"]
    new = [s[0]]
    for c in range(1, WIDTH):
        new.append(sum(init[r - 1][c - 1] * s[r] for r in range(1, WIDTH)) % _P)
    s = new
    fprc = fc["fprc"]
    vs = fc["vs"]
    whats = fc["whats"]
    ms0 = fc["ms0"]
    for r in range(N_PARTIAL_ROUNDS):
        x = s[0]
        x2 = x * x % _P
        s0 = x2 * x2 % _P * (x2 * x % _P) % _P
        if r < N_PARTIAL_ROUNDS - 1:
            s0 = (s0 + fprc[r]) % _P
        w = whats[r]
        d = (ms0 * s0 + sum(w[i - 1] * s[i] for i in range(1, WIDTH))) % _P
        v = vs[r]
        s = [d] + [(s[i] + s0 * v[i - 1]) % _P for i in range(1, WIDTH)]
    ctr += N_PARTIAL_ROUNDS
    for _ in range(HALF_N_FULL_ROUNDS):
        base = ctr * WIDTH
        s = [(s[i] + rc[base + i]) for i in range(WIDTH)]
        for i in range(WIDTH):
            x = s[i] % _P
            x2 = x * x % _P
            s[i] = x2 * x2 % _P * (x2 * x % _P) % _P
        s = [sum(m_i[c] * s[c] for c in range(WIDTH)) % _P for m_i in mds]
        ctr += 1
    return s


def hash_n_to_m_no_pad(inputs: np.ndarray, num_outputs: int) -> np.ndarray:
    """Overwrite-mode sponge (reference hashing.rs:81-104). inputs: 1-D."""
    inputs = np.asarray(inputs, dtype=np.uint64)
    state = np.zeros(WIDTH, dtype=np.uint64)
    n = len(inputs)
    for start in range(0, max(n, 1) if n else 0, SPONGE_RATE):
        chunk = inputs[start:start + SPONGE_RATE]
        state[:len(chunk)] = chunk
        state = poseidon(state)
    outputs = []
    while True:
        for i in range(SPONGE_RATE):
            outputs.append(state[i])
            if len(outputs) == num_outputs:
                return np.array(outputs, dtype=np.uint64)
        state = poseidon(state)


def hash_no_pad(inputs: np.ndarray) -> np.ndarray:
    """HashOut (4 elements)."""
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs: np.ndarray) -> np.ndarray:
    """<=4 inputs pass through zero-padded (reference hash_or_noop)."""
    inputs = np.asarray(inputs, dtype=np.uint64)
    if len(inputs) <= 4:
        out = np.zeros(4, dtype=np.uint64)
        out[:len(inputs)] = inputs
        return out
    return hash_no_pad(inputs)


def compress(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Two-to-one compression (reference hashing.rs:65-73)."""
    state = np.zeros(WIDTH, dtype=np.uint64)
    state[:4] = x
    state[4:8] = y
    return poseidon(state)[:4]


def hash_batch_no_pad(leaves: np.ndarray) -> np.ndarray:
    """Vectorized sponge over a batch: leaves (B, L) -> digests (B, 4).

    All leaves share length L, so the chunk loop is uniform across the batch.
    """
    leaves = np.asarray(leaves, dtype=np.uint64)
    B, L = leaves.shape
    state = np.zeros((B, WIDTH), dtype=np.uint64)
    for start in range(0, L, SPONGE_RATE):
        chunk = leaves[:, start:start + SPONGE_RATE]
        state[:, :chunk.shape[1]] = chunk
        state = poseidon(state)
    return state[:, :4]


def compress_batch(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized two-to-one: (B, 4), (B, 4) -> (B, 4)."""
    B = x.shape[0]
    state = np.zeros((B, WIDTH), dtype=np.uint64)
    state[:, :4] = x
    state[:, 4:8] = y
    return poseidon(state)[:, :4]
