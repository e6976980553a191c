"""Device polynomial-opening evaluation.

Evaluates every polynomial of a committed batch at extension points (zeta,
g*zeta) directly from the device-resident coefficient arrays — a modular
dot-product against host-precomputed point powers, reduced with a halving
tree.  Replaces the per-poly host Horner loop (round 1) which forced a
multi-GB coefficient download per proof; now only the (B, 2) opened values
come back.  Reference counterpart: plonky2 evaluates openings on CPU from
host coeffs (plonk/prover.rs construct-opening-set phase); the CUDA fork
leaves this on host too — this is a strict improvement.
"""
from __future__ import annotations

import functools

import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl


def ext_powers_host(z, n: int) -> np.ndarray:
    """(n, 2) uint64: [1, z, z^2, ...] via vectorized doubling (log steps)."""
    out = np.zeros((n, 2), dtype=np.uint64)
    out[0] = (1, 0)
    k = 1
    zk = (int(z[0]), int(z[1]))          # z^k for the current block size
    while k < n:
        m = min(k, n - k)
        out[k:k + m] = ge.mul(out[:m],    # block [k, 2k) = [0, k) * z^k
                              np.broadcast_to(np.array(zk, dtype=np.uint64),
                                              (m, 2)))
        zk = ge.s_mul(zk, zk)
        k *= 2
    return out


@functools.lru_cache(maxsize=16)
def _multi_eval_fn(batch_sizes: tuple, degree: int, n_points: int):
    """One jitted program evaluating EVERY oracle's polys at EVERY point —
    a single dispatch + a single host transfer per proof (the axon tunnel
    charges ~90ms latency per call)."""
    import jax
    import jax.numpy as jnp

    from ..field import gf2_jax as gf2
    from ..field import gf_jax as gf

    @jax.jit
    def fn(coeffs, zp_lo, zp_hi):
        # coeffs: tuple of (B_i, n) pairs; zp_*: (n_points, n, 2)
        outs = []
        for c in coeffs:
            per_oracle = []
            for p in range(n_points):
                t0 = gf.mul(c, (zp_lo[p, :, 0], zp_hi[p, :, 0]))
                t1 = gf.mul(c, (zp_lo[p, :, 1], zp_hi[p, :, 1]))
                s0 = gf2.gf_sum(t0, axis=-1)
                s1 = gf2.gf_sum(t1, axis=-1)
                per_oracle.append(jnp.stack(
                    [jnp.stack(s0, 0), jnp.stack(s1, 0)], 0))
            outs.append(jnp.stack(per_oracle))   # (n_points, 2, 2, B)
        return tuple(outs)

    return fn


def eval_openings_batched(batches: list, points: list) -> list:
    """Evaluate all polynomials of several committed batches at several
    extension points.  Returns ``out[oracle][point]`` as (B, 2) uint64."""
    import jax
    import jax.numpy as jnp

    from ..field import gf_jax as gf
    coeffs = tuple(b.device_coeffs() for b in batches)
    degree = coeffs[0][0].shape[-1]
    zpows = np.stack([ext_powers_host(p, degree) for p in points])
    zp_lo, zp_hi = gf.from_u64(zpows)
    fn = _multi_eval_fn(tuple(c[0].shape[0] for c in coeffs), degree,
                        len(points))
    from ..runtime import meshctx
    outs = meshctx.host_get(fn(coeffs, jnp.asarray(zp_lo),
                               jnp.asarray(zp_hi)))
    result = []
    for arr in outs:                    # (n_points, 2, 2, B)
        per_point = []
        for p in range(arr.shape[0]):
            v0 = gf.to_u64((arr[p, 0, 0], arr[p, 0, 1]))
            v1 = gf.to_u64((arr[p, 1, 0], arr[p, 1, 1]))
            per_point.append(np.stack([v0, v1], axis=-1))
        result.append(per_point)
    return result


@functools.lru_cache(maxsize=8)
def _eval_fn(n_polys: int, degree: int):
    import jax
    import jax.numpy as jnp

    from ..field import gf2_jax as gf2
    from ..field import gf_jax as gf

    @jax.jit
    def fn(c_lo, c_hi, zp_lo, zp_hi):
        # coeffs (B, n) base; zpow (n, 2) ext components as GF pairs
        c = (c_lo, c_hi)
        t0 = gf.mul(c, (zp_lo[:, 0], zp_hi[:, 0]))   # (B, n)
        t1 = gf.mul(c, (zp_lo[:, 1], zp_hi[:, 1]))
        s0 = gf2.gf_sum(t0, axis=-1)                 # (B,)
        s1 = gf2.gf_sum(t1, axis=-1)
        return jnp.stack([jnp.stack(s0, 0), jnp.stack(s1, 0)], 0)

    return fn


def eval_device_polys_ext(batch, zpow: np.ndarray) -> np.ndarray:
    """batch: PolynomialBatch with device coeffs; zpow: (n, 2) point powers.
    Returns (B, 2) uint64 opened values (host)."""
    import jax.numpy as jnp

    from ..field import gf_jax as gf
    c_lo, c_hi = batch.device_coeffs()
    B, n = c_lo.shape
    zp_lo, zp_hi = gf.from_u64(zpow)
    fn = _eval_fn(B, n)
    from ..runtime import meshctx
    out = np.asarray(meshctx.host_get(
        fn(c_lo, c_hi, jnp.asarray(zp_lo), jnp.asarray(zp_hi))))
    # out: (2 components, 2 limbs, B)
    v0 = gf.to_u64((out[0, 0], out[0, 1]))
    v1 = gf.to_u64((out[1, 0], out[1, 1]))
    return np.stack([v0, v1], axis=-1)
