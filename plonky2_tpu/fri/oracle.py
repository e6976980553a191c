"""PolynomialBatch — batched polynomial commitment (the prover's oracle).

TPU-native redesign of the reference `PolynomialBatch` + `CudaInvContext`
(fri/oracle.rs:75-1113): instead of a hand-managed device arena and three
near-identical from_values copies, one typed oracle object whose commit path
runs the fused jit pipeline in ops/commit.py (device) or the numpy oracle
(host fallback), selected by `use_device`.

Leaf layout matches the reference contract: leaves are LDE rows in
bit-reversed order, columns = polynomials (+ salt columns when blinding), so
`get_lde_values(i)` fetches natural LDE index i via reverse_bits.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..field import extension as ge
from ..field import fft_numpy as fnp
from ..field import goldilocks as gl
from ..hash import merkle as mk
from ..iop.challenger import Challenger
from ..utils.bits import bit_reverse_indices, log2_strict, reverse_bits
from .config import FriParams
from .proof import FriProof
from .prover import coset_fft_ext, fri_proof
from .structure import FriInstanceInfo
from ..hash.hashers import POSEIDON_CONFIG

SALT_SIZE = 4  # reference fri/oracle.rs:41


def _auto_device() -> bool:
    """Use the JAX device pipeline only on a real accelerator; on CPU the
    numpy oracle outruns XLA compilation for one-shot commits."""
    import os
    force = os.environ.get("PLONKY2_TPU_FORCE_DEVICE")
    if force is not None:
        return force not in ("0", "false", "")
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return False


class PolynomialBatch:
    """Batched polynomial commitment.  On the device path everything —
    coefficients, LDE leaf matrix, digest levels — stays resident as jax
    arrays (reference fri/oracle.rs:403-460 keeps the same state in its GPU
    arena); host views (`polynomials`, `leaves`) materialize lazily and only
    if some host-side consumer asks."""

    def __init__(self, polynomials: Optional[np.ndarray],
                 leaves: Optional[np.ndarray], merkle_tree, degree_log: int,
                 rate_bits: int, blinding: bool, coeffs_dev=None,
                 leaves_dev=None):
        self._polynomials = polynomials     # (B, degree) coefficient rows
        self._leaves_host = leaves          # (lde_size, B+salt), bit-reversed
        self.merkle_tree = merkle_tree      # host MerkleTree or DeviceMerkleTree
        self.degree_log = degree_log
        self.rate_bits = rate_bits
        self.blinding = blinding
        self._coeffs_dev = coeffs_dev       # (B, degree) GF pair
        self._leaves_dev = leaves_dev       # (lde_size, B+salt) GF pair

    # -- residency views ---------------------------------------------------

    @property
    def polynomials(self) -> np.ndarray:
        if self._polynomials is None:
            from ..field import gf_jax as gf
            from ..runtime import meshctx
            self._polynomials = gf.to_u64(meshctx.host_get(
                (self._coeffs_dev[0], self._coeffs_dev[1])))
        return self._polynomials

    @property
    def leaves(self) -> np.ndarray:
        if self._leaves_host is None:
            from ..field import gf_jax as gf
            from ..runtime import meshctx
            # device layout is column-major (B, lde); host contract is
            # row-major (lde, B)
            self._leaves_host = gf.to_u64(meshctx.host_get(
                (self._leaves_dev[0], self._leaves_dev[1]))).T.copy()
        return self._leaves_host

    def device_leaves(self):
        """Leaf matrix as a resident column-major (B, lde) (lo, hi) uint32
        device pair (reference merkle_tree.rs:59-63); uploaded once and
        cached when the batch was built on host."""
        if self._leaves_dev is None:
            from ..field import gf_jax as gf
            from ..runtime.meshctx import put_pair
            self._leaves_dev = put_pair(
                gf.from_u64(self.leaves.T.copy()), axis=1)
        return self._leaves_dev

    def device_coeffs(self):
        if self._coeffs_dev is None:
            import jax
            import jax.numpy as jnp

            from ..field import gf_jax as gf
            lo, hi = gf.from_u64(self.polynomials)
            self._coeffs_dev = (jax.device_put(jnp.asarray(lo)),
                                jax.device_put(jnp.asarray(hi)))
        return self._coeffs_dev

    @property
    def degree(self) -> int:
        return 1 << self.degree_log

    @property
    def num_polys(self) -> int:
        if self._coeffs_dev is not None:
            return self._coeffs_dev[0].shape[0]
        return self.polynomials.shape[0]

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_values(values, rate_bits: int, blinding: bool,
                    cap_height: int, use_device: bool | None = None,
                    salt_rng: Optional[np.random.Generator] = None,
                    hasher=POSEIDON_CONFIG) -> "PolynomialBatch":
        if use_device is None:
            use_device = _auto_device()
        if not hasher.algebraic:
            use_device = False  # byte hashes (Keccak) run host-side
        if use_device:
            from ..field import gf_jax as gf
            from ..ops.commit import commit_from_values, device_salt
            from ..runtime.meshctx import put_pair
            if isinstance(values, tuple):
                pair, degree = values, values[0].shape[-1]
            else:
                values = np.asarray(values, dtype=np.uint64)
                pair, degree = gf.from_u64(values), values.shape[-1]
                pair = put_pair(pair, axis=1)   # intra-poly mesh axis
            salt = device_salt(degree << rate_bits,
                               salt_rng=salt_rng) if blinding else None
            c, l, lv = commit_from_values(pair, rate_bits, cap_height, salt)
            return PolynomialBatch._assemble_device(
                c, l, lv, degree, rate_bits, blinding, cap_height)
        values = np.asarray(values, dtype=np.uint64)
        coeffs = fnp.ifft(values)
        return PolynomialBatch.from_coeffs(coeffs, rate_bits, blinding,
                                           cap_height, use_device=False,
                                           salt_rng=salt_rng, hasher=hasher)

    @staticmethod
    def from_coeffs(polynomials, rate_bits: int, blinding: bool,
                    cap_height: int, use_device: bool | None = None,
                    salt_rng: Optional[np.random.Generator] = None,
                    hasher=POSEIDON_CONFIG) -> "PolynomialBatch":
        if use_device is None:
            use_device = _auto_device()
        if not hasher.algebraic:
            use_device = False
        if use_device:
            from ..field import gf_jax as gf
            from ..ops.commit import commit_from_coeffs, device_salt
            from ..runtime.meshctx import put_pair
            if isinstance(polynomials, tuple):
                pair, degree = polynomials, polynomials[0].shape[-1]
            else:
                polynomials = np.asarray(polynomials, dtype=np.uint64)
                pair = put_pair(gf.from_u64(polynomials), axis=1)
                degree = polynomials.shape[-1]
            salt = device_salt(degree << rate_bits,
                               salt_rng=salt_rng) if blinding else None
            l, lv = commit_from_coeffs(pair, rate_bits, cap_height, salt)
            import jax.numpy as jnp
            pair = (jnp.asarray(pair[0]), jnp.asarray(pair[1]))
            return PolynomialBatch._assemble_device(
                pair, l, lv, degree, rate_bits, blinding, cap_height)
        polynomials = np.asarray(polynomials, dtype=np.uint64)
        lde = fnp.coset_fft(fnp.lde(polynomials, rate_bits))  # (B, lde_size)
        lde_size = lde.shape[-1]
        leaves = lde.T[bit_reverse_indices(lde_size)].copy()
        return PolynomialBatch._assemble(polynomials, leaves, None, rate_bits,
                                         blinding, cap_height, salt_rng,
                                         hasher)

    @staticmethod
    def _assemble_device(coeffs_dev, leaves_dev, levels_dev, degree,
                         rate_bits, blinding, cap_height):
        tree = mk.DeviceMerkleTree(leaves_dev, levels_dev, cap_height)
        return PolynomialBatch(None, None, tree, log2_strict(degree),
                               rate_bits, blinding, coeffs_dev=coeffs_dev,
                               leaves_dev=leaves_dev)

    @staticmethod
    def _assemble(polynomials, leaves, levels, rate_bits, blinding, cap_height,
                  salt_rng, hasher=POSEIDON_CONFIG):
        degree = polynomials.shape[-1]
        if blinding:
            rng = salt_rng if salt_rng is not None else np.random.default_rng()
            salt = rng.integers(0, gl.P, size=(leaves.shape[0], SALT_SIZE),
                                dtype=np.uint64)
            leaves = np.concatenate([leaves, salt], axis=1)
            levels = None  # salt invalidates device-computed digests
        tree = mk.MerkleTree(leaves, cap_height, levels=levels, hasher=hasher)
        return PolynomialBatch(polynomials, leaves, tree,
                               log2_strict(degree), rate_bits, blinding)

    # -- queries -----------------------------------------------------------

    @property
    def salt_size(self) -> int:
        return SALT_SIZE if self.blinding else 0

    def get_lde_values(self, index: int, step: int = 1) -> np.ndarray:
        """natural-order LDE row (salt stripped); reference oracle.rs:1007."""
        index = reverse_bits(index * step, self.degree_log + self.rate_bits)
        row = self.leaves[index]
        return row[:row.shape[0] - self.salt_size]

    def eval_poly_ext(self, poly_index: int, point) -> tuple:
        """Evaluate polynomial at an extension point (host Horner)."""
        c = self.polynomials[poly_index]
        acc = (0, 0)
        for i in range(c.shape[0] - 1, -1, -1):
            acc = ge.s_mul(acc, point)
            acc = ge.s_add(acc, (int(c[i]), 0))
        return acc

    # -- openings ----------------------------------------------------------

    @staticmethod
    def prove_openings(instance: FriInstanceInfo, oracles: List["PolynomialBatch"],
                       challenger: Challenger, fri_params: FriParams,
                       hasher=POSEIDON_CONFIG) -> FriProof:
        """reference fri/oracle.rs:1047-1113."""
        alpha = challenger.get_extension_challenge()
        degree = oracles[0].polynomials.shape[-1]
        final_poly = np.zeros((degree - 1, 2), dtype=np.uint64)

        for batch in instance.batches:
            polys = np.stack([
                oracles[info.oracle_index].polynomials[info.polynomial_index]
                for info in batch.polynomials])             # (k, degree)
            composition = _reduce_polys_base(polys, alpha)   # (degree, 2)
            k = polys.shape[0]
            quotient = _divide_by_linear_ext(composition, batch.point)
            # final_poly <- final_poly * alpha^k + quotient.  The reference's
            # ReducingFactor (reducing.rs) counts k consumed powers during
            # reduce_polys_base and shift_poly() then multiplies by
            # alpha^count and resets the counter — so the accumulated shift
            # per batch is exactly alpha^k, written here directly.
            shift = np.array(ge.s_exp(alpha, k), dtype=np.uint64)
            final_poly = ge.add(ge.mul(final_poly,
                                       np.broadcast_to(shift, final_poly.shape)),
                                quotient)
        # multiply by X (max-degree trick, reference oracle.rs:1084)
        final_poly = np.concatenate(
            [np.zeros((1, 2), dtype=np.uint64), final_poly], axis=0)  # (degree, 2)

        rate_bits = fri_params.config.rate_bits
        lde_size = degree << rate_bits
        lde_final_poly = np.zeros((lde_size, 2), dtype=np.uint64)
        lde_final_poly[:degree] = final_poly
        lde_final_values = coset_fft_ext(lde_final_poly, gl.coset_shift())

        return fri_proof([o.merkle_tree for o in oracles], lde_final_poly,
                         lde_final_values, challenger, fri_params,
                         hasher=hasher)


def _reduce_polys_base(polys: np.ndarray, alpha) -> np.ndarray:
    """sum_j alpha^j * polys[j]: (k, n) base -> (n, 2) ext
    (reference reducing.rs reduce_polys_base)."""
    k, n = polys.shape
    apow = ge.powers(np.array(alpha, dtype=np.uint64), k)  # (k, 2)
    out0 = np.zeros(n, dtype=np.uint64)
    out1 = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        out0 = gl.add(out0, gl.mul(polys[j], apow[j, 0]))
        out1 = gl.add(out1, gl.mul(polys[j], apow[j, 1]))
    return np.stack([out0, out1], axis=-1)


def _divide_by_linear_ext(coeffs: np.ndarray, z, block: int = 512) -> np.ndarray:
    """(f(X) - f(z)) / (X - z) for ext coeffs (n, 2); returns (n-1, 2).

    Synthetic division is a scan acc_j = acc_{j-1} * z + d_j over the reversed
    coefficients; evaluated blockwise so numpy vector ops dominate
    (reference field/src/polynomial/division.rs:75-88).
    """
    n = coeffs.shape[0]
    d = coeffs[::-1].copy()  # process from highest coefficient
    z_arr = np.array(z, dtype=np.uint64)
    m = -(-n // block)
    pad = m * block - n
    if pad:
        d = np.concatenate([d, np.zeros((pad, 2), dtype=np.uint64)], axis=0)
    d = d.reshape(m, block, 2)

    # within-block scan, vectorized across blocks
    local = np.zeros_like(d)
    acc = np.zeros((m, 2), dtype=np.uint64)
    zb = np.broadcast_to(z_arr, (m, 2))
    for j in range(block):
        acc = ge.add(ge.mul(acc, zb), d[:, j])
        local[:, j] = acc

    # carry across blocks: acc_full[c, j] = A_c * z^(j+1) + local[c, j]
    zpows = ge.powers(z_arr, block + 1)  # z^0..z^block
    A = np.zeros((m, 2), dtype=np.uint64)
    for c in range(m - 1):
        A[c + 1] = ge.add(ge.mul(A[c], zpows[block]), local[c, block - 1])
    full = ge.add(ge.mul(A[:, None, :], zpows[None, 1:block + 1]), local)
    bs = full.reshape(m * block, 2)[:n]
    # bs holds acc_0..acc_{n-1}; drop the last (the remainder f(z)), reverse
    return bs[:n - 1][::-1].copy()
