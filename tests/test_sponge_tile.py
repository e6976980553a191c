"""Pallas sponge lane-tile must scale with leaf-column height.

Regression for a recorded TPU failure: the EVM CPU-table trace commit
(L=2481 polys x 8192 rows) went through ``hash_leaves_cols_pallas`` at the
fixed flagship tile of 2048, whose double-buffered lo/hi leaf blocks need
77.75 MB of scoped VMEM against Mosaic's 16 MB default limit
(``RESOURCE_EXHAUSTED`` inside ``_commit_from_values_fused``).  The tile
now halves until the block fits a 14 MB budget, and falls back to the XLA
sponge when even the smallest tile cannot fit — while the flagship shape
(L=238) keeps tile 2048 so its compiled program's cache key is unchanged.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from plonky2_tpu.hash import merkle_jax as mkj


def test_tile_selection():
    # flagship commit shape: untouched
    assert mkj._sponge_tile(238, 1 << 19) == 2048
    # observed EVM CPU-table shape: 2481*256*16B = 9.7MB fits
    assert mkj._sponge_tile(2481, 8192) == 256
    assert mkj._sponge_tile(2481, 8192) * 2481 * 16 <= 14 * 1024 * 1024
    # absurdly tall: no tile fits, route to the XLA sponge
    assert mkj._sponge_tile(60000, 8192) == 0


def test_halved_tile_digest_parity(monkeypatch):
    """Interpret-mode Pallas digests at a halved tile == XLA sponge."""
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_SPONGE", "interpret")
    import jax.numpy as jnp
    L, N = 800, 2048          # 800*2048*16B = 26 MB -> tile halves to 1024
    assert mkj._sponge_tile(L, N) == 1024
    rng = np.random.default_rng(3)
    leaves = (jnp.asarray(rng.integers(0, 2**32, (L, N), np.uint32)),
              jnp.asarray(rng.integers(0, 2**31, (L, N), np.uint32)))
    d_pallas = mkj.hash_leaves_or_noop_cols(leaves)
    monkeypatch.setenv("PLONKY2_TPU_PALLAS_SPONGE", "0")
    d_xla = mkj.hash_leaves_or_noop_cols(leaves)
    for a, b in zip(d_pallas, d_xla):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
