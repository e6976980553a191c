"""Multi-device sharding: four-step NTT correctness (single device) and
sharded execution over an 8-device CPU mesh with intra-NTT distribution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plonky2_tpu.field import fft_numpy as fnp
from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.parallel.sharded_ntt import batched_four_step_ntt, four_step_ntt


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64)


def test_four_step_matches_reference():
    for n, n1 in [(64, 8), (256, 16), (1024, 32), (4096, None)]:
        c = rand((n,), seed=n)
        out = four_step_ntt(gf.from_u64(c), n1=n1)
        np.testing.assert_array_equal(gf.to_u64(out), fnp.fft(c))
        inv = four_step_ntt(gf.from_u64(fnp.fft(c)), inverse=True, n1=n1)
        np.testing.assert_array_equal(gf.to_u64(inv), c)


def test_batched_four_step():
    c = rand((5, 512), seed=2)
    out = batched_four_step_ntt(gf.from_u64(c))
    np.testing.assert_array_equal(gf.to_u64(out), fnp.fft(c))


def test_sharded_intra_ntt():
    """One NTT distributed over 8 devices: column phase local, one all-to-all
    at the transpose, result identical to the single-device oracle."""
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must force 8 CPU devices"
    mesh = Mesh(devices, axis_names=("x",))
    n = 1 << 12
    c = rand((n,), seed=3)
    lo, hi = gf.from_u64(c)

    in_sharding = NamedSharding(mesh, P(None))

    @jax.jit
    def run(lo, hi):
        return four_step_ntt((lo, hi), shard_axis="x")

    with mesh:
        out = run(jax.device_put(jnp.asarray(lo), in_sharding),
                  jax.device_put(jnp.asarray(hi), in_sharding))
    np.testing.assert_array_equal(gf.to_u64(out), fnp.fft(c))


def test_sharded_poly_batch():
    """DP-style batch sharding of the commit pipeline over the mesh."""
    from plonky2_tpu.ops.commit import commit_from_coeffs

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, axis_names=("poly",))
    batch, n = 16, 128
    c = rand((batch, n), seed=4)
    lo, hi = gf.from_u64(c)
    sh = NamedSharding(mesh, P("poly", None))
    lo = jax.device_put(jnp.asarray(lo), sh)
    hi = jax.device_put(jnp.asarray(hi), sh)
    with mesh:
        leaves, levels = commit_from_coeffs((lo, hi), 3, 2)
    # compare against the host oracle (device leaves are column-major:
    # leaf i = column i)
    expect_lde = fnp.coset_fft(fnp.lde(c, 3))
    from plonky2_tpu.utils.bits import bit_reverse_indices
    expect_leaves = expect_lde.T[bit_reverse_indices(n << 3)]
    np.testing.assert_array_equal(gf.to_u64(leaves).T, expect_leaves)
