"""Device computation of the permutation-argument Z polynomials + partial
products (reference plonky2/src/plonk/prover.rs:702-787).

Round-1/2 computed this phase in host numpy; at the 2^18 x 80-routed-wire
flagship shape that is ~100 full-width modular multiplies on host (~40 s)
— and the result then had to be uploaded anyway.  Here the whole phase is
one jitted device program fed by the already-uploaded witness: elementwise
numerator/denominator products, a fori-loop Fermat inverse, chunked
products, and a log-depth `lax.associative_scan` for the running Z product
over the subgroup.  Output stays on device and feeds the zs/pp commitment
directly.  Exact field arithmetic — byte-identical to the host oracle.
"""
from __future__ import annotations

import functools

import numpy as np

from ..field import goldilocks as gl


@functools.lru_cache(maxsize=8)
def _zs_pp_fn(nr: int, degree: int, qdf: int, num_prods: int, nch: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..field import gf_jax as gf

    nchunks = -(-nr // qdf)
    pad = nchunks * qdf - nr

    def one_challenge(wires, sigmas, k_sub, b, g):
        numer = gf.add(gf.add(wires, gf.mul(k_sub, b)), g)
        denom = gf.add(gf.add(wires, gf.mul(sigmas, b)), g)
        quot = gf.mul(numer, gf.inverse(denom))          # (nr, degree)
        if pad:
            onep = gf.ones((pad, degree))
            quot = (jnp.concatenate([quot[0], onep[0]], axis=0),
                    jnp.concatenate([quot[1], onep[1]], axis=0))
        # per-chunk products: scan over the qdf axis (keeps the XLA graph
        # small — fully unrolled gf.mul chains blow up XLA-CPU compile)
        q = (quot[0].reshape(nchunks, qdf, degree).transpose(1, 0, 2),
             quot[1].reshape(nchunks, qdf, degree).transpose(1, 0, 2))

        def mul_step(acc, x):
            acc = gf.mul(acc, x)
            return acc, acc

        def mul_fold(acc, x):
            return gf.mul(acc, x), None

        ones_nc = gf.ones((nchunks, degree))
        chunk, _ = lax.scan(mul_fold, ones_nc, q)        # (nchunks, degree)
        # inclusive cumulative products across chunks
        ones_d = gf.ones((degree,))
        _, cum = lax.scan(mul_step, ones_d, chunk)       # (nchunks, degree)
        full_row = (cum[0][-1], cum[1][-1])
        # exclusive running product over the subgroup: inclusive
        # associative_scan shifted right by one.  Modular mul is fully
        # associative so the tree association is bit-identical to the
        # sequential oracle — and the scan compiles ~10x faster than a
        # hand-rolled log-doubling concat chain (XLA CPU chokes on those).
        inc = lax.associative_scan(lambda a, b: gf.mul(a, b), full_row)
        z = (jnp.concatenate([jnp.ones(1, jnp.uint32), inc[0][:-1]]),
             jnp.concatenate([jnp.zeros(1, jnp.uint32), inc[1][:-1]]))
        pps = gf.mul((cum[0][:num_prods], cum[1][:num_prods]),
                     (z[0][None], z[1][None]))           # (num_prods, degree)
        return z, pps

    @jax.jit
    def fn(wires, sigmas, k_sub, betas, gammas):
        """wires/sigmas: (nr, degree) pairs; k_sub: (nr, degree) pair of
        k_i * x precomputed; betas/gammas: (nch, 2) u32 host values."""
        outs_z = []
        outs_pp = []
        for i in range(nch):
            z, pps = one_challenge(wires, sigmas, k_sub,
                                   (betas[i, 0], betas[i, 1]),
                                   (gammas[i, 0], gammas[i, 1]))
            outs_z.append(z)
            outs_pp.append(pps)
        lo = jnp.concatenate([z[0][None] for z in outs_z]
                             + [p[0] for p in outs_pp], axis=0)
        hi = jnp.concatenate([z[1][None] for z in outs_z]
                             + [p[1] for p in outs_pp], axis=0)
        return lo, hi

    return fn


def device_partial_products(wires_pair, betas, gammas, prover_data,
                            common_data):
    """wires_pair: full witness (num_wires, degree) device pair.  Returns
    the (nch*(1+num_prods), degree) zs/partial-products pair on device."""
    import jax.numpy as jnp

    from ..field import gf_jax as gf
    from ..runtime.meshctx import put_pair

    config = common_data.config
    nr = config.num_routed_wires
    qdf = common_data.quotient_degree_factor
    num_prods = common_data.num_partial_products
    degree = common_data.degree()
    nch = config.num_challenges

    cache = getattr(prover_data, "_pp_dev_cache", None)
    if cache is None:
        sigmas = prover_data.sigmas.T.copy()             # -> (nr, degree)
        assert sigmas.shape == (nr, degree)
        k_arr = np.array(common_data.k_is, dtype=np.uint64)
        k_sub = gl.mul(k_arr[:, None], prover_data.subgroup[None, :])
        cache = {
            "sigmas": put_pair(gf.from_u64(sigmas), axis=1),
            "k_sub": put_pair(gf.from_u64(k_sub), axis=1),
        }
        prover_data._pp_dev_cache = cache

    def pairify(ints):
        arr = np.array(ints, dtype=np.uint64)
        return np.stack(gf.from_u64(arr), axis=1)        # (nch, 2) u32

    wires_routed = (wires_pair[0][:nr], wires_pair[1][:nr])
    fn = _zs_pp_fn(nr, degree, qdf, num_prods, nch)
    return fn(wires_routed, cache["sigmas"], cache["k_sub"],
              pairify(betas), pairify(gammas))
