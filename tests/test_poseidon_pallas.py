"""Pallas sponge (hash/poseidon_pallas.py): the table-driven unrolled
fast-schedule permutation must match the XLA sponge bit-for-bit.

The permutation tests below run everywhere (pure jnp trace, no
pallas_call) and cover the whole math, including the int8-plane MXU MDS
formulation.  The pallas_call kernels themselves are validated on real
TPU hardware (tpu-gated tests at the bottom; also exercised end-to-end by
every TPU proof through hash/merkle_jax.py) — interpret-mode runs of the
unrolled 30-round kernel take >10 min on one CPU core, so they are not
part of the default tier."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.hash import poseidon_jax as pj
from plonky2_tpu.hash import poseidon_pallas as pp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _rand_pair(rng, shape):
    v = rng.integers(0, gl.P, size=shape, dtype=np.uint64)
    lo, hi = gf.from_u64(v)
    return jnp.asarray(lo), jnp.asarray(hi)


def _eq(a, b):
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_unrolled_permutation_matches_oracle(rng):
    st = _rand_pair(rng, (12, 64))
    want = pj.poseidon_t(st)
    _eq(want, pp.poseidon_fast_t_unrolled(st, use_mxu=False))
    _eq(want, pp.poseidon_fast_t_unrolled(st, use_mxu=True))


def test_unrolled_permutation_boundary_values():
    # values near 0, p, and 2^32 multiples (field_testing.rs-style corners)
    vals = np.array([0, 1, gl.P - 1, gl.P - 2, (1 << 32) - 1, 1 << 32,
                     (1 << 32) + 1, gl.P - (1 << 32), 7, 1 << 63,
                     (1 << 63) + (1 << 32), gl.P - 1], dtype=np.uint64)
    st = gf.from_u64(np.tile(vals[:, None], (1, 8)))
    st = (jnp.asarray(st[0]), jnp.asarray(st[1]))
    want = pj.poseidon_t(st)
    _eq(want, pp.poseidon_fast_t_unrolled(st, use_mxu=True))


def test_naive_permutation_matches_oracle(rng):
    """v2 trace-level parity: naive schedule + blockdiag-96 int8 MDS +
    non-canonical intermediates == the fast-schedule XLA permutation."""
    st = _rand_pair(rng, (12, 64))
    want = pj.poseidon_t(st)
    _eq(want, pp.poseidon_naive_t(st))


def test_naive_permutation_boundary_values():
    vals = np.array([0, 1, gl.P - 1, gl.P - 2, (1 << 32) - 1, 1 << 32,
                     (1 << 32) + 1, gl.P - (1 << 32), 7, 1 << 63,
                     (1 << 63) + (1 << 32), gl.P - 1], dtype=np.uint64)
    st = gf.from_u64(np.tile(vals[:, None], (1, 8)))
    st = (jnp.asarray(st[0]), jnp.asarray(st[1]))
    want = pj.poseidon_t(st)
    _eq(want, pp.poseidon_naive_t(st))


def test_naive_permutation_noncanonical_inputs(rng):
    """_perm_naive accepts any 64-bit representative: feeding x and x+p
    must give identical canonical outputs."""
    v = rng.integers(0, 1 << 32, size=(12, 8), dtype=np.uint64)  # < p-ish
    lo, hi = gf.from_u64(v)
    want = pp.poseidon_naive_t((jnp.asarray(lo), jnp.asarray(hi)))
    vp = v + np.uint64(gl.P)  # non-canonical representative (v < 2^32)
    lo2, hi2 = gf.from_u64(vp)
    rlo, rhi, m96, offs = pp._naive_tables()
    out = pp._perm_naive((jnp.asarray(lo2), jnp.asarray(hi2)),
                         jnp.asarray(rlo), jnp.asarray(rhi),
                         jnp.asarray(m96), jnp.asarray(offs))
    got = gf._canon(*out)
    _eq(want, got)


def test_sponge_switch_gating(monkeypatch):
    """The env gate: '0' disables, 'interpret' force-enables on CPU."""
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_SPONGE", "0")
    assert not pp.sponge_enabled()
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_SPONGE", "interpret")
    assert pp.sponge_enabled() and pp.sponge_interpret()
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_SPONGE", "auto")
    assert pp.sponge_enabled() == (jax.default_backend() == "tpu")


_on_tpu = jax.default_backend() == "tpu"


@pytest.mark.skipif(not _on_tpu, reason="pallas_call kernels need real TPU")
def test_leaf_kernel_tpu_matches_xla(rng):
    leaves = _rand_pair(rng, (20, 2048))
    want = pj.hash_leaves_cols(leaves)
    got = pp.hash_leaves_cols_pallas(leaves, tile=512)
    _eq(want, got)


@pytest.mark.skipif(not _on_tpu, reason="pallas_call kernels need real TPU")
def test_compress_kernel_tpu_matches_xla(rng):
    d = _rand_pair(rng, (4, 4096))
    left = (d[0][:, 0::2], d[1][:, 0::2])
    right = (d[0][:, 1::2], d[1][:, 1::2])
    want = pj.compress_pairs_cols(left, right)
    got = pp.compress_pairs_cols_pallas(left, right, tile=512)
    _eq(want, got)
