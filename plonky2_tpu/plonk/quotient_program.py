"""Quotient evaluation as a compiled constraint program.

Traces `eval_vanishing_poly` (all gates, copy-constraint terms, alpha
reduction, and the final 1/Z_H multiply) once per circuit into a
ConstraintProgram, then evaluates it over the quotient coset on device with
the O(1)-compile interpreter.  This is the TPU replacement for the
reference's per-circuit hand-written CUDA kernel
(cuda/plonky2_gpu_impl.cuh:486-878) and for round-1's flat-traced jnp graph
whose XLA compile took tens of minutes.

Input-column order (vector registers 0..n_inputs):
    [constants | sigmas] (cs oracle), wires, [zs | partial_products]
    (zspp oracle), next_zs (zspp oracle, shifted rows), x, L_0(x), 1/Z_H(x).
Scalar inputs: public_inputs_hash[4], betas, gammas, alphas.
Outputs: num_challenges quotient-value rows over the coset.
"""
from __future__ import annotations

from typing import List

import numpy as np

from ..field import goldilocks as gl
from ..utils.bits import bit_reverse_indices, log2_ceil
from .algebra import EvaluationVars
from .constraint_program import ConstraintProgram, ExprAlgebra, ProgramBuilder
from .vanishing import eval_vanishing_poly


def build_quotient_program(common_data, wave_width: int = 16
                           ) -> ConstraintProgram:
    config = common_data.config
    nch = config.num_challenges
    b = ProgramBuilder()
    alg = ExprAlgebra(b)

    n_pre = common_data.num_preprocessed_polys()
    cs = [b.vector_input() for _ in range(n_pre)]
    wires = [b.vector_input() for _ in range(config.num_wires)]
    n_zspp = common_data.partial_products_range().stop
    zspp = [b.vector_input() for _ in range(n_zspp)]
    next_zs = [b.vector_input() for _ in range(nch)]
    x = b.vector_input()
    l0 = b.vector_input()
    zh_inv = b.vector_input()

    pih = [b.scalar_input() for _ in range(4)]
    betas = [b.scalar_input() for _ in range(nch)]
    gammas = [b.scalar_input() for _ in range(nch)]
    alphas = [b.scalar_input() for _ in range(nch)]

    nc = common_data.num_constants
    vars = EvaluationVars(cs[:nc], wires, pih)
    s_sigmas = [cs[j] for j in common_data.sigmas_range()]
    local_zs = [zspp[j] for j in common_data.zs_range()]
    partial_products = [zspp[j] for j in common_data.partial_products_range()]

    vals = eval_vanishing_poly(alg, common_data, x, vars, local_zs, next_zs,
                               partial_products, s_sigmas, betas, gammas,
                               alphas, l0)
    for v in vals:
        b.mark_output(alg.mul(v, zh_inv))
    return b.compile(wave_width=wave_width)


def quotient_scalar_inputs(public_inputs_hash, betas, gammas,
                           alphas) -> List[int]:
    return ([int(x) for x in public_inputs_hash] + [int(x) for x in betas]
            + [int(x) for x in gammas] + [int(x) for x in alphas])


def host_quotient_inputs(common_data, prover_only, wires_commitment,
                         zspp_commitment) -> np.ndarray:
    """Assemble the (n_inputs, lde_size) uint64 input matrix on the host, in
    the program's column order (testing / numpy-oracle execution)."""
    config = common_data.config
    qdb = log2_ceil(common_data.quotient_degree_factor)
    rate_bits = config.fri_config.rate_bits
    degree_bits = common_data.degree_bits()
    N = 1 << (degree_bits + qdb)
    step = 1 << (rate_bits - qdb)
    full_bits = degree_bits + rate_bits
    perm = bit_reverse_indices(1 << full_bits)

    def natural_rows(batch, roll=0):
        idx = np.arange(N, dtype=np.int64) * step
        rows = batch.leaves[perm[idx]]
        salt = batch.salt_size
        rows = rows[:, :rows.shape[1] - salt] if salt else rows
        return np.roll(rows, -roll, axis=0) if roll else rows

    cs = natural_rows(prover_only.constants_sigmas_commitment)
    wires = natural_rows(wires_commitment)
    zspp = natural_rows(zspp_commitment)
    next_rows = N // (1 << degree_bits)
    nz = natural_rows(zspp_commitment, roll=next_rows)[:, :config.num_challenges]

    points = gl.two_adic_subgroup(degree_bits + qdb)
    shifted_xs = gl.mul(np.uint64(gl.coset_shift()), points)
    g_pow_n = pow(gl.coset_shift(), 1 << degree_bits, gl.P)
    v = gl.two_adic_subgroup(qdb)
    zh_evals = gl.sub(gl.mul(np.uint64(g_pow_n), v), np.uint64(1))
    reps = N // zh_evals.shape[0]
    zh_inv = np.tile(gl.inverse(zh_evals), reps)
    zh_tiled = np.tile(zh_evals, reps)
    n_f = np.uint64(1 << degree_bits)
    l_0 = gl.mul(zh_tiled, gl.inverse(
        gl.mul(n_f, gl.sub(shifted_xs, np.uint64(1)))))

    zs_cols = zspp[:, :common_data.partial_products_range().stop]
    return np.concatenate(
        [cs.T, wires.T, zs_cols.T, nz.T,
         shifted_xs[None], l_0[None], zh_inv[None]], axis=0)


class DeviceQuotient:
    """Per-circuit device quotient context: compiled program + resident
    circuit-fixed columns (preprocessed rows, domain tables) + the jitted
    gather->interpret->INTT pipeline.

    The reference keeps the same state in its CudaInvContext device arena
    (fri/oracle.rs:75-109); here the resident state is jax arrays and the
    "kernel" is the constraint-program interpreter, so one compiled XLA
    program serves every circuit shape of the same dimensions."""

    def __init__(self, common_data, prover_only, chunk: int | None = None,
                 wave_width: int = 16):
        import jax
        import jax.numpy as jnp

        from ..field import gf_jax as gf

        self.common = common_data
        config = common_data.config
        qdb = log2_ceil(common_data.quotient_degree_factor)
        rate_bits = config.fri_config.rate_bits
        degree_bits = common_data.degree_bits()
        self.lde_size = 1 << (degree_bits + qdb)
        self.step = 1 << (rate_bits - qdb)
        full_bits = degree_bits + rate_bits
        N = self.lde_size

        self.program = build_quotient_program(common_data, wave_width)
        if chunk is None:
            # 2^15 lanes: ~1.8x faster than 2^13 (per-wave fixed costs
            # amortize over more lanes); above 2^15 XLA stops updating the
            # (R, 2, C) register file in place inside the wave scan and
            # each step copies it — a 12x cliff (measured on v5e)
            chunk = min(N, 1 << 15)
        assert N % chunk == 0
        self.chunk = chunk
        self.n_chunks = N // chunk

        # natural-order gather indices into bit-reversed leaf rows
        perm = bit_reverse_indices(1 << full_bits)
        idx_nat = perm[np.arange(N, dtype=np.int64) * self.step]
        next_step_rows = N // (1 << degree_bits) * self.step
        idx_next = perm[(np.arange(N, dtype=np.int64) * self.step
                         + next_step_rows) % (1 << full_bits)]
        self.idx_nat = jnp.asarray(idx_nat.reshape(self.n_chunks, chunk)
                                   .astype(np.int32))
        self.idx_next = jnp.asarray(idx_next.reshape(self.n_chunks, chunk)
                                    .astype(np.int32))

        # circuit-fixed preprocessed leaves resident on device
        cs_leaves = prover_only.constants_sigmas_commitment.device_leaves()
        self.cs_leaves = cs_leaves

        # domain columns x, L_0, 1/Z_H in natural order (chunk layout)
        points = gl.two_adic_subgroup(degree_bits + qdb)
        shifted_xs = gl.mul(np.uint64(gl.coset_shift()), points)
        g_pow_n = pow(gl.coset_shift(), 1 << degree_bits, gl.P)
        v = gl.two_adic_subgroup(qdb)
        zh_evals = gl.sub(gl.mul(np.uint64(g_pow_n), v), np.uint64(1))
        reps = N // zh_evals.shape[0]
        zh_tiled = np.tile(zh_evals, reps)
        zh_inv = np.tile(gl.inverse(zh_evals), reps)
        n_f = np.uint64(1 << degree_bits)
        l_0 = gl.mul(zh_tiled, gl.inverse(
            gl.mul(n_f, gl.sub(shifted_xs, np.uint64(1)))))
        dom = np.stack([shifted_xs, l_0, zh_inv])       # (3, N)
        dom = dom.reshape(3, self.n_chunks, chunk)
        from ..runtime.meshctx import put_array
        self.dom = put_array(
            np.stack(gf.from_u64(dom)).transpose(2, 0, 1, 3), axis=0)
        # (n_chunks, 2, 3, chunk), chunk axis sharded under an active mesh

        self._fn = None

    # -- jitted pipeline ---------------------------------------------------

    def _pipeline(self):
        if self._fn is not None:
            return self._fn
        import jax
        import jax.numpy as jnp
        from jax import lax

        from ..field import gf_jax as gf
        from ..ops import ntt as jntt

        common = self.common
        nch = common.config.num_challenges
        n_pre = common.num_preprocessed_polys()
        n_wires = common.config.num_wires
        n_zspp = common.partial_products_range().stop
        prog = self.program
        R, C = prog.n_regs, self.chunk
        n_in = prog.n_inputs
        assert n_in == n_pre + n_wires + n_zspp + nch + 3

        # VMEM-resident register file (~2x the XLA scan interpreter,
        # measured 1.5 s vs 3.0 s full-coset at the flagship shape);
        # tiles need full 128-lane rows, so tiny shapes keep the XLA path
        use_pallas = jax.default_backend() == "tpu" and self.chunk >= 128
        if use_pallas:
            run_pallas = prog.pallas_chunk_runner(
                tile=min(512, self.chunk))
        else:
            run_chunk = prog.jax_chunk_runner()

        def quotient_fn(cs_lo, cs_hi, w_lo, w_hi, z_lo, z_hi, dom, bank,
                        idx_nat, idx_next):
            def body(carry, xs):
                inat, inext, dchunk = xs

                def take(src_lo, src_hi, idx, ncols):
                    # sources are column-major (B, lde): gather columns
                    lo = jnp.take(src_lo[:ncols], idx, axis=1)
                    hi = jnp.take(src_hi[:ncols], idx, axis=1)
                    return lo, hi          # (ncols, C)

                cs = take(cs_lo, cs_hi, inat, n_pre)
                wr = take(w_lo, w_hi, inat, n_wires)
                zp = take(z_lo, z_hi, inat, n_zspp)
                nz = take(z_lo, z_hi, inext, nch)
                in_lo = jnp.concatenate([cs[0], wr[0], zp[0], nz[0],
                                         dchunk[0]], axis=0)
                in_hi = jnp.concatenate([cs[1], wr[1], zp[1], nz[1],
                                         dchunk[1]], axis=0)
                if use_pallas:
                    inp = jnp.stack([in_lo, in_hi])       # (2, n_in, C)
                    bank_i32 = jax.lax.bitcast_convert_type(bank, jnp.int32)
                    pout = run_pallas(inp, bank_i32)      # (2, nch, C)
                    out = pout.transpose(1, 0, 2)         # (nch, 2, C)
                else:
                    regs = jnp.zeros((R, 2, C), jnp.uint32)
                    regs = regs.at[:n_in].set(
                        jnp.stack([in_lo, in_hi], axis=1))
                    out = run_chunk(regs, bank)           # (nch, 2, C)
                return carry, out

            _, outs = lax.scan(body, 0,
                               (idx_nat, idx_next,
                                self.dom))        # (n_chunks, nch, 2, C)
            vals = outs.transpose(1, 2, 0, 3).reshape(nch, 2, -1)
            # coset INTT -> quotient coefficients (still on device)
            coeffs = jntt.coset_intt((vals[:, 0], vals[:, 1]))
            return coeffs

        self._fn = jax.jit(quotient_fn)
        return self._fn

    def compute(self, wires_batch, zspp_batch, public_inputs_hash, betas,
                gammas, alphas):
        """Returns quotient coefficient rows as a device GF pair
        (num_challenges, lde_size)."""
        import jax.numpy as jnp

        bank = self.program.scalar_bank(quotient_scalar_inputs(
            public_inputs_hash, betas, gammas, alphas))
        from ..field import gf_jax as gf
        bank_pair = np.stack(gf.from_u64(bank), axis=1)   # (S, 2) numpy

        cs_lo, cs_hi = self.cs_leaves
        w_lo, w_hi = wires_batch.device_leaves()
        z_lo, z_hi = zspp_batch.device_leaves()
        fn = self._pipeline()
        return fn(cs_lo, cs_hi, w_lo, w_hi, z_lo, z_hi, self.dom, bank_pair,
                  self.idx_nat, self.idx_next)
