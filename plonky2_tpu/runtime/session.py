"""ProverSession — the device-state bundle for repeated proving.

TPU-native equivalent of the reference's ``CudaInvContext``
(fri/oracle.rs:75-109): where the CUDA fork pre-allocates a device arena,
uploads twiddle tables and keeps the constants/sigmas commitment resident,
this session keeps the circuit-fixed quotient inputs (preprocessed
constant/sigma rows in natural order, the coset points, L_0 and 1/Z_H
evaluations) on the device, and caches the jit-compiled quotient program so
subsequent proofs skip gathering, upload and compilation.  Twiddle tables
are device constants inside the jitted NTTs, so they persist for free.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..field import goldilocks as gl
from ..utils.bits import bit_reverse_indices, log2_ceil


def _natural_rows(batch, lde_size: int, step: int, full_bits: int):
    idx = np.arange(lde_size, dtype=np.int64) * step
    perm = bit_reverse_indices(1 << full_bits)
    rows = batch.leaves[perm[idx]]
    salt = batch.salt_size
    return rows[:, :rows.shape[1] - salt] if salt else rows


class ProverSession:
    """Create once per circuit; call :meth:`prove` per witness."""

    def __init__(self, data, use_device: Optional[bool] = None,
                 quotient_on_device: bool = False):
        from ..fri.oracle import _auto_device
        self.data = data
        self.use_device = _auto_device() if use_device is None else use_device
        # Known limitation (experimental): the quotient program embeds every
        # gate's constraint formula as flat jax primitives; tracing plus XLA
        # compilation of that graph (the Poseidon gate alone is ~2000 field
        # muls) takes tens of minutes per circuit shape. Until gate evals
        # are restructured as lax loops / pallas kernels, the device
        # quotient is opt-in and only suited to long-lived serving sessions
        # with a persistent compilation cache.
        self.quotient_on_device = quotient_on_device and self.use_device
        self._dev = None   # lazily-built device context

    def prove(self, inputs):
        from ..plonk.prover import prove
        return prove(self.data.prover_only, self.data.common, inputs,
                     use_device=self.use_device, session=self)

    def verify(self, proof) -> None:
        self.data.verify(proof)

    # --- device quotient context ------------------------------------------

    def _device_context(self):
        if self._dev is not None:
            return self._dev
        import jax
        import jax.numpy as jnp

        from ..field import gf_jax as gf
        from ..ops import ntt as jntt
        from ..plonk.algebra import EvaluationVars, JaxBatch
        from ..plonk.vanishing import eval_vanishing_poly

        common = self.data.common
        config = common.config
        qdb = log2_ceil(common.quotient_degree_factor)
        rate_bits = config.fri_config.rate_bits
        degree_bits = common.degree_bits()
        lde_size = 1 << (degree_bits + qdb)
        step = 1 << (rate_bits - qdb)
        full_bits = degree_bits + rate_bits

        # circuit-fixed preprocessed rows, gathered once and kept resident
        cs_rows = _natural_rows(self.data.prover_only
                                .constants_sigmas_commitment,
                                lde_size, step, full_bits)
        cs_dev = jax.device_put(jnp.asarray(np.stack(gf.from_u64(cs_rows))))

        # circuit-fixed domain tables
        points = gl.two_adic_subgroup(degree_bits + qdb)
        shifted_xs = gl.mul(np.uint64(gl.coset_shift()), points)
        g_pow_n = pow(gl.coset_shift(), 1 << degree_bits, gl.P)
        v = gl.two_adic_subgroup(qdb)
        zh_evals = gl.sub(gl.mul(np.uint64(g_pow_n), v), np.uint64(1))
        zh_inv = np.tile(gl.inverse(zh_evals), lde_size // zh_evals.shape[0])
        zh_tiled = np.tile(zh_evals, lde_size // zh_evals.shape[0])
        n_f = np.uint64(1 << degree_bits)
        l_0 = gl.mul(zh_tiled, gl.inverse(
            gl.mul(n_f, gl.sub(shifted_xs, np.uint64(1)))))

        def pair(a):
            return jax.device_put(jnp.asarray(np.stack(gf.from_u64(a))))

        xs_dev, l0_dev, zhinv_dev = pair(shifted_xs), pair(l_0), pair(zh_inv)

        nc = common.num_constants
        num_challenges = config.num_challenges
        sig_range = list(common.sigmas_range())
        zs_range = list(common.zs_range())
        pp_range = list(common.partial_products_range())
        num_wires = config.num_wires

        def quotient_fn(cs, wires, zspp, zspp_next, betas, gammas, alphas,
                        pih):
            alg = JaxBatch()

            def cols(mat, idxs):
                return [(mat[0, :, j], mat[1, :, j]) for j in idxs]

            local_constants = cols(cs, range(nc))
            s_sigmas = cols(cs, sig_range)
            local_wires = cols(wires, range(num_wires))
            local_zs = cols(zspp, zs_range)
            next_zs = cols(zspp_next, zs_range)
            partial_products = cols(zspp, pp_range)

            def scalars(arr):
                return [(arr[0, i], arr[1, i]) for i in range(num_challenges)]

            vars = EvaluationVars(local_constants, local_wires,
                                  [(pih[0, i], pih[1, i]) for i in range(4)])
            vals = eval_vanishing_poly(
                alg, common, (xs_dev[0], xs_dev[1]), vars, local_zs, next_zs,
                partial_products, s_sigmas, scalars(betas), scalars(gammas),
                scalars(alphas), (l0_dev[0], l0_dev[1]))
            out = []
            for val in vals:
                q = gf.mul(val, (zhinv_dev[0], zhinv_dev[1]))
                out.append(jnp.stack(jntt.coset_intt(q)))
            return jnp.stack(out)   # (num_challenges, 2, lde_size)

        self._dev = {
            "fn": jax.jit(quotient_fn),
            "cs_dev": cs_dev,
            "lde_size": lde_size,
            "step": step,
            "full_bits": full_bits,
        }
        return self._dev

    def compute_quotient_polys(self, public_inputs_hash, wires_commitment,
                               zspp_commitment, betas, gammas, alphas
                               ) -> np.ndarray:
        """Device quotient evaluation — the TPU analog of the reference's
        compute_quotient_values kernel (cuda/plonky2_gpu.cu:719-770)."""
        import jax
        import jax.numpy as jnp

        from ..field import gf_jax as gf
        from ..ops import ntt as jntt  # noqa: F401  (warms module)

        ctx = self._device_context()
        lde_size, step, full_bits = (ctx["lde_size"], ctx["step"],
                                     ctx["full_bits"])

        def upload(batch, roll=0):
            rows = _natural_rows(batch, lde_size, step, full_bits)
            if roll:
                rows = np.roll(rows, -roll, axis=0)
            return jnp.asarray(np.stack(gf.from_u64(rows)))

        next_step = lde_size // (1 << self.data.common.degree_bits())
        wires = upload(wires_commitment)
        zspp = upload(zspp_commitment)
        zspp_next = upload(zspp_commitment, roll=next_step)

        def pair_of(ints):
            arr = np.array(ints, dtype=np.uint64)
            return jnp.asarray(np.stack(gf.from_u64(arr)))

        out = ctx["fn"](ctx["cs_dev"], wires, zspp, zspp_next,
                        pair_of(betas), pair_of(gammas), pair_of(alphas),
                        pair_of(list(public_inputs_hash)))
        out = jax.device_get(out)   # (num_challenges, 2, lde_size)
        return np.stack([gf.to_u64((out[i, 0], out[i, 1]))
                         for i in range(out.shape[0])])
