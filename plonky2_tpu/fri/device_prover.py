"""Device FRI prover — composition polynomial, fold layers, query prefetch.

TPU redesign of the opening/FRI phase (reference fri/oracle.rs:1047-1113 +
fri/prover.rs:24-208).  Three structural changes vs the host path (which is
kept, byte-identical, in fri/prover.py + oracle.prove_openings):

1. The composition polynomial is evaluated POINTWISE on the LDE domain from
   the device-resident leaf arrays:  for each opening batch b,
       q_b(x) = (R_b(x) - R_b(z_b)) / (x - z_b),
   with R_b = sum_j alpha^j p_j read straight off the committed leaves.
   This replaces the reference's host-side synthetic division
   (field/src/polynomial/division.rs:75-88) — same polynomial, same values,
   same transcript, but the multi-GB coefficient download disappears.
2. Fold layers (bit-reverse, Merkle commit, beta-fold, re-evaluate) run as
   per-layer jitted device programs; only caps and the final polynomial
   come back to host.
3. Query rows and sibling paths for ALL query rounds are prefetched in one
   batched gather per tree (hash/merkle.py DeviceMerkleTree.prefetch).

Everything is exact field arithmetic, so proofs remain byte-identical to
the host prover.
"""
from __future__ import annotations

import functools
from typing import List

import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..hash import merkle as mk
from ..iop.challenger import Challenger
from ..utils.bits import bit_reverse_indices
from .config import FriParams
from .proof import FriProof
from .prover import fri_proof_of_work, fri_prover_query_rounds
from ..hash.hashers import POSEIDON_CONFIG


@functools.lru_cache(maxsize=8)
def _xs_br_dev(lde_bits: int):
    """Bit-reversed-order coset points (shift * w^rev(j)) as a device pair."""
    import jax
    import jax.numpy as jnp

    from ..field import gf_jax as gf
    n = 1 << lde_bits
    xs = gl.mul(np.uint64(gl.coset_shift()), gl.two_adic_subgroup(lde_bits))
    xs = xs[bit_reverse_indices(n)]
    lo, hi = gf.from_u64(xs)
    return jax.device_put(jnp.asarray(lo)), jax.device_put(jnp.asarray(hi))


@functools.lru_cache(maxsize=32)
def _composition_fn(n_batches_cols: tuple, lde_bits: int, salt_sizes: tuple):
    """Jitted: leaves of all oracles -> composition values (bit-rev order)
    + coefficients.  Cache key: column counts per (batch, oracle) plan."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..field import gf2_jax as gf2
    from ..field import gf_jax as gf
    from ..ops import ntt as jntt

    @jax.jit
    def fn(oracle_leaves, weights, rbz, zs, shifts, xs):
        """oracle_leaves: list of (lo, hi) (N, B_i); weights: per batch list
        of per-oracle (B_i, 2, 2) ext weights as GF pairs (zeros for unused
        cols); rbz: (n_batches, 2, 2) reduced openings; zs: (n_batches, 2, 2)
        points; shifts: (n_batches, 2, 2) alpha^{k_b}; xs: (N,) pair."""
        N = xs[0].shape[0]
        comp = (gf.zeros((N,)), gf.zeros((N,)))          # ext accumulator

        for b in range(len(weights)):
            # R_b(x) = sum over oracles/cols w_{j} * leaf_col_j
            acc = (gf.zeros((N,)), gf.zeros((N,)))
            for o, w in enumerate(weights[b]):
                if w is None:
                    continue
                llo, lhi = oracle_leaves[o]

                def col_step(carry, xw):
                    clo, chi, w0_lo, w0_hi, w1_lo, w1_hi = xw
                    col = (clo, chi)
                    t0 = gf.mul(col, (w0_lo, w0_hi))
                    t1 = gf.mul(col, (w1_lo, w1_hi))
                    return ((gf.add(carry[0], t0), gf.add(carry[1], t1)),
                            None)

                (acc, _) = lax.scan(
                    col_step, acc,
                    (llo, lhi, w[0][:, 0], w[1][:, 0], w[0][:, 1],
                     w[1][:, 1]))
            # q_b = (R_b - R_b(z)) * (x - z)^-1
            rb = ((rbz[0][b, 0], rbz[1][b, 0]), (rbz[0][b, 1], rbz[1][b, 1]))
            z = ((zs[0][b, 0], zs[1][b, 0]), (zs[0][b, 1], zs[1][b, 1]))
            num = gf2.sub2(acc, (
                (jnp.broadcast_to(rb[0][0], (N,)),
                 jnp.broadcast_to(rb[0][1], (N,))),
                (jnp.broadcast_to(rb[1][0], (N,)),
                 jnp.broadcast_to(rb[1][1], (N,)))))
            xz = gf2.sub2((xs, (jnp.zeros_like(xs[0]),
                                jnp.zeros_like(xs[1]))),
                          ((jnp.broadcast_to(z[0][0], (N,)),
                            jnp.broadcast_to(z[0][1], (N,))),
                           (jnp.broadcast_to(z[1][0], (N,)),
                            jnp.broadcast_to(z[1][1], (N,)))))
            q = gf2.mul2(num, gf2.inverse2(xz))
            sh = ((shifts[0][b, 0], shifts[1][b, 0]),
                  (shifts[0][b, 1], shifts[1][b, 1]))
            comp = gf2.add2(gf2.mul2(comp, (
                (jnp.broadcast_to(sh[0][0], (N,)),
                 jnp.broadcast_to(sh[0][1], (N,))),
                (jnp.broadcast_to(sh[1][0], (N,)),
                 jnp.broadcast_to(sh[1][1], (N,))))), q)

        # times-X trick (reference oracle.rs:1084): F'(x) = x * F(x)
        comp = gf2.mul2_base(comp, xs)

        # coefficients: natural-order values -> coset iNTT, componentwise
        perm = jntt.bitrev_perm_auto(N)
        nat = ((comp[0][0][perm], comp[0][1][perm]),
               (comp[1][0][perm], comp[1][1][perm]))
        stacked = (jnp.stack([nat[0][0], nat[1][0]]),
                   jnp.stack([nat[0][1], nat[1][1]]))    # (2, N)
        coeffs = jntt.coset_intt(stacked)
        return comp, coeffs

    return fn


def device_composition(instance, oracles, alpha, openings_batches,
                       lde_bits: int):
    """Returns (values_br ext pair, coeffs (2, N) pair) on device.

    `openings_batches`: FriOpenings.batches — the claimed opened values, used
    to form R_b(z_b) host-side (tiny)."""
    import jax.numpy as jnp

    from ..field import gf_jax as gf

    n_batches = len(instance.batches)
    weights: List[list] = []
    rbz = np.zeros((n_batches, 2, 2), dtype=np.uint64)
    zs = np.zeros((n_batches, 2, 2), dtype=np.uint64)
    shifts = np.zeros((n_batches, 2, 2), dtype=np.uint64)

    key_cols = []
    prev_shift = (1, 0)
    for b, batch in enumerate(instance.batches):
        k = len(batch.polynomials)
        apow = [ge.s_exp(alpha, j) for j in range(k)]
        # reduced claimed opening sum_j alpha^j y_j
        acc = (0, 0)
        for j, y in enumerate(openings_batches[b].values):
            acc = ge.s_add(acc, ge.s_mul(apow[j], y))
        rbz[b, 0] = acc
        zs[b, 0] = batch.point
        shifts[b, 0] = ge.s_exp(alpha, k)
        # per-oracle weight matrices
        wb = [None] * len(oracles)
        for j, info in enumerate(batch.polynomials):
            oi = info.oracle_index
            if wb[oi] is None:
                ncols = oracles[oi].device_leaves()[0].shape[0]
                wb[oi] = np.zeros((ncols, 2), dtype=np.uint64)
            wb[oi][info.polynomial_index] = apow[j]
        weights.append(wb)
        key_cols.append(tuple(w.shape[0] if w is not None else -1
                              for w in wb))

    # rbz/zs/shifts stored at [..., 0, :]; reshape into (n_batches, 2) ext
    def pair3(arr):          # (n_batches, 2, 2) -> GF pair of (n_batches, 2)
        # numpy pair: shipped with the jit call (no eager transfer latency)
        return gf.from_u64(arr[:, 0, :])

    w_dev = []
    for wb in weights:
        row = []
        for w in wb:
            if w is None:
                row.append(None)
            else:
                row.append(gf.from_u64(w))
        w_dev.append(row)

    fn = _composition_fn(tuple(key_cols), lde_bits,
                         tuple(o.salt_size for o in oracles))
    leaves = [o.device_leaves() for o in oracles]
    xs = _xs_br_dev(lde_bits)
    return fn(leaves, w_dev, pair3(rbz), pair3(zs), pair3(shifts), xs)


@functools.lru_cache(maxsize=32)
def _fold_fn(n: int, arity_bits: int, cap_height: int, shift: int):
    """Jitted per-layer: (values_br ext, coeffs) -> (levels, folded coeffs
    fn, next values fn).  Split so the beta challenge can be drawn between
    the commit and the fold."""
    import jax
    import jax.numpy as jnp

    from ..field import gf2_jax as gf2
    from ..field import gf_jax as gf
    from ..hash import merkle_jax as mkj
    from ..ops import ntt as jntt

    arity = 1 << arity_bits

    @jax.jit
    def commit(v_br):
        """values_br: ext pair of (n,) -> column-major leaves
        (2*arity, n/arity) + digest levels.

        Leaf j (column j) holds [v[j*arity+i][comp] for i, comp] in the
        host row order: build (m, arity, 2) then transpose."""
        c0, c1 = v_br
        m = n // arity

        def cols(lo0, lo1):
            x = jnp.stack([lo0.reshape(m, arity), lo1.reshape(m, arity)],
                          axis=-1)                     # (m, arity, 2)
            return x.reshape(m, 2 * arity).T           # (2*arity, m)

        leaves = (cols(c0[0], c1[0]), cols(c0[1], c1[1]))
        return leaves, mkj.build_digest_levels(leaves, cap_height)

    @jax.jit
    def fold(coeffs, beta):
        """coeffs: (2, n) pair; beta: (2,2) u32 scalar pair -> next
        (values_br, coeffs) at size n/arity."""
        m = n // arity
        b_ext = ((beta[0, 0], beta[1, 0]), (beta[0, 1], beta[1, 1]))
        ch = (coeffs[0].reshape(2, m, arity), coeffs[1].reshape(2, m, arity))
        acc = ((ch[0][0, :, arity - 1], ch[1][0, :, arity - 1]),
               (ch[0][1, :, arity - 1], ch[1][1, :, arity - 1]))
        for i in range(arity - 2, -1, -1):
            term = ((ch[0][0, :, i], ch[1][0, :, i]),
                    (ch[0][1, :, i], ch[1][1, :, i]))
            acc = gf2.add2(gf2.mul2(acc, (
                (jnp.broadcast_to(b_ext[0][0], (m,)),
                 jnp.broadcast_to(b_ext[0][1], (m,))),
                (jnp.broadcast_to(b_ext[1][0], (m,)),
                 jnp.broadcast_to(b_ext[1][1], (m,))))), term)
        new_coeffs = (jnp.stack([acc[0][0], acc[1][0]]),
                      jnp.stack([acc[0][1], acc[1][1]]))   # (2, m)
        vals = jntt.coset_ntt(new_coeffs, shift)
        perm = jntt.bitrev_perm_auto(m)
        v_br = ((vals[0][0][perm], vals[1][0][perm]),
                (vals[0][1][perm], vals[1][1][perm]))
        return v_br, new_coeffs

    return commit, fold


def device_fri_committed_trees(coeffs, values_br, challenger: Challenger,
                               fri_params: FriParams):
    import jax.numpy as jnp

    from ..field import gf_jax as gf

    trees: List[mk.DeviceMerkleTree] = []
    shift = gl.MULTIPLICATIVE_GROUP_GENERATOR
    cap_height = fri_params.config.cap_height
    n = values_br[0][0].shape[0]
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        next_shift = gl.s_exp(shift, arity)
        commit, fold = _fold_fn(n, arity_bits, cap_height, next_shift)
        leaves, levels = commit(values_br)
        tree = mk.DeviceMerkleTree(leaves, levels, cap_height)
        challenger.observe_cap(tree.cap)
        trees.append(tree)

        beta = challenger.get_extension_challenge()
        blo, bhi = gf.from_u64(np.array(beta, dtype=np.uint64))
        beta_pair = np.stack([blo, bhi])                  # (2, 2)
        values_br, coeffs = fold(coeffs, beta_pair)
        shift = next_shift
        n //= arity

    coeffs_host = gf.to_u64((np.asarray(coeffs[0]), np.asarray(coeffs[1])))
    final_len = n >> fri_params.config.rate_bits
    final_coeffs = coeffs_host.T[:final_len]              # (final_len, 2)
    assert np.all(coeffs_host[:, final_len:] == 0), \
        "FRI final coeffs tail not zero"
    challenger.observe_extension_elements(final_coeffs)
    return trees, final_coeffs


def device_fri_proof(initial_trees, coeffs, values_br,
                     challenger: Challenger, fri_params: FriParams,
                     hasher=POSEIDON_CONFIG) -> FriProof:
    n = values_br[0][0].shape[0]
    trees, final_coeffs = device_fri_committed_trees(
        coeffs, values_br, challenger, fri_params)
    pow_witness = fri_proof_of_work(challenger, fri_params.config,
                                    hasher=hasher)

    # prefetch every query row + path in one gather per tree
    challs = challenger.get_n_challenges(fri_params.config.num_query_rounds)
    indices = [int(r) % n for r in challs]
    for t in initial_trees:
        if hasattr(t, "prefetch"):
            t.prefetch(indices)
    xi = list(indices)
    for i, tree in enumerate(trees):
        ab = fri_params.reduction_arity_bits[i]
        xi = [x >> ab for x in xi]
        tree.prefetch(xi)

    # replay the same challenges through the standard query-round builder
    class _Replay:
        def __init__(self, vals):
            self.vals = list(vals)

        def get_n_challenges(self, k):
            return self.vals[:k]

    rounds = fri_prover_query_rounds(initial_trees, trees, _Replay(challs),
                                     n, fri_params)
    return FriProof(commit_phase_merkle_caps=[t.cap for t in trees],
                    query_round_proofs=rounds, final_poly=final_coeffs,
                    pow_witness=pow_witness)


def device_prove_openings(instance, oracles, fri_openings,
                          challenger: Challenger, fri_params: FriParams,
                          hasher=POSEIDON_CONFIG) -> FriProof:
    """Device counterpart of PolynomialBatch.prove_openings — same transcript.

    `fri_openings` is the FriOpenings the prover already computed (and
    observed); its per-batch values feed R_b(z_b) for the pointwise
    composition quotient."""
    alpha = challenger.get_extension_challenge()
    lde_bits = oracles[0].degree_log + fri_params.config.rate_bits

    values_br, coeffs = device_composition(instance, oracles, alpha,
                                           fri_openings.batches, lde_bits)
    return device_fri_proof([o.merkle_tree for o in oracles], coeffs,
                            values_br, challenger, fri_params, hasher=hasher)
