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

# Fold arities at or above this ride a lax.scan Horner loop instead of an
# unrolled one (compile-time guard; results are bit-identical).  The
# flagship arity-16 folds stay unrolled, so their cached XLA programs—
# including the fused single-dispatch FRI—keep their cache keys.
_SCAN_ARITY = 64
from ..hash import poseidon as pos
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


def _commit_body(v_br, n: int, arity: int, cap_height: int):
    """values_br: ext pair of (n,) -> column-major leaves
    (2*arity, n/arity) + digest levels.

    Leaf j (column j) holds [v[j*arity+i][comp] for i, comp] in the
    host row order: build (m, arity, 2) then transpose."""
    import jax.numpy as jnp

    from ..hash import merkle_jax as mkj

    c0, c1 = v_br
    m = n // arity

    def cols(lo0, lo1):
        x = jnp.stack([lo0.reshape(m, arity), lo1.reshape(m, arity)],
                      axis=-1)                     # (m, arity, 2)
        return x.reshape(m, 2 * arity).T           # (2*arity, m)

    leaves = (cols(c0[0], c1[0]), cols(c0[1], c1[1]))
    return leaves, mkj.build_digest_levels(leaves, cap_height)


def _fold_body(coeffs, b_ext, n: int, arity: int, shift: int):
    """coeffs: (2, n) pair; b_ext: ext scalar ((lo,hi),(lo,hi)) -> next
    (values_br, coeffs) at size n/arity."""
    import jax
    import jax.numpy as jnp

    from ..field import gf2_jax as gf2
    from ..ops import ntt as jntt

    m = n // arity
    ch = (coeffs[0].reshape(2, m, arity), coeffs[1].reshape(2, m, arity))
    acc = ((ch[0][0, :, arity - 1], ch[1][0, :, arity - 1]),
           (ch[0][1, :, arity - 1], ch[1][1, :, arity - 1]))
    if arity >= _SCAN_ARITY:
        # High-arity Horner as lax.scan: the unrolled loop below emits
        # ~50 HLO ops per step, and at arity 256 the 255-step graph took
        # XLA:CPU's SPMD partitioner >25 min to compile (observed in the
        # 8-device dryrun).  Same op order -> bit-identical results.
        b_bc = ((jnp.broadcast_to(b_ext[0][0], (m,)),
                 jnp.broadcast_to(b_ext[0][1], (m,))),
                (jnp.broadcast_to(b_ext[1][0], (m,)),
                 jnp.broadcast_to(b_ext[1][1], (m,))))
        xs = ((ch[0][0, :, arity - 2::-1].T, ch[1][0, :, arity - 2::-1].T),
              (ch[0][1, :, arity - 2::-1].T, ch[1][1, :, arity - 2::-1].T))

        def step(a, term):
            return gf2.add2(gf2.mul2(a, b_bc), term), None

        acc, _ = jax.lax.scan(step, acc, xs)
    else:
        # NOTE: keep this branch's trace byte-identical to the pre-scan
        # version (broadcasts re-created per iteration): the flagship's
        # fused FRI program inlines it, and changing the jaxpr would
        # churn the persistent-cache key of an already-warm TPU program.
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


@functools.lru_cache(maxsize=32)
def _fold_fn(n: int, arity_bits: int, cap_height: int, shift: int):
    """Jitted per-layer commit/fold (the LAYERED path; the fused
    single-dispatch path inlines the bodies instead).  Split so the beta
    challenge can be drawn between the commit and the fold."""
    import jax

    arity = 1 << arity_bits

    @jax.jit
    def commit(v_br):
        return _commit_body(v_br, n, arity, cap_height)

    @jax.jit
    def fold(coeffs, beta):
        b_ext = ((beta[0, 0], beta[1, 0]), (beta[0, 1], beta[1, 1]))
        return _fold_body(coeffs, b_ext, n, arity, shift)

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

    from ..runtime import meshctx
    coeffs_host = gf.to_u64(meshctx.host_get((coeffs[0], coeffs[1])))
    final_len = n >> fri_params.config.rate_bits
    final_coeffs = coeffs_host.T[:final_len]              # (final_len, 2)
    assert np.all(coeffs_host[:, final_len:] == 0), \
        "FRI final coeffs tail not zero"
    challenger.observe_extension_elements(final_coeffs)
    return trees, final_coeffs


def device_fri_proof(initial_trees, coeffs, values_br,
                     challenger: Challenger, fri_params: FriParams,
                     hasher=POSEIDON_CONFIG) -> FriProof:
    """Dispatches to the fused single-device-program path for the Poseidon
    config; the keccak config's challenger permutation is host-only, so it
    keeps the layered path."""
    if hasher.algebraic and all(
            hasattr(t, "leaves_dev") for t in initial_trees):
        return _device_fri_proof_fused(initial_trees, coeffs, values_br,
                                       challenger, fri_params)
    return _device_fri_proof_layered(initial_trees, coeffs, values_br,
                                     challenger, fri_params, hasher=hasher)


def _device_fri_proof_layered(initial_trees, coeffs, values_br,
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


# ---------------------------------------------------------------------------
# fused single-program FRI: Fiat-Shamir ON DEVICE
# ---------------------------------------------------------------------------
#
# The layered path above pays a host round-trip per fold layer (cap D2H ->
# host sponge -> beta H2D) plus one per query-prefetch — ~25 dispatches at
# ~90 ms each through a tunnel-attached chip.  Here the whole post-
# composition FRI (commits, beta draws, final-poly observe, PoW grind,
# query-index draws, row/path gathers) runs as ONE jitted program with the
# duplex sponge traced on device (iop/challenger_jax.py); the host then
# replays the same observes through its challenger and asserts the query
# indices agree, which keeps the host transcript in sync AND cross-checks
# the device Fiat-Shamir byte-for-byte.

@functools.lru_cache(maxsize=8)
def _fused_fri_fn(n: int, arities: tuple, cap_height: int, pow_bits: int,
                  num_queries: int, n_inbuf: int, n_outbuf: int,
                  init_meta: tuple, final_len: int):
    import jax
    import jax.numpy as jnp

    from ..field import gf_jax as gf
    from ..iop.challenger_jax import DeviceChallenger

    shift0 = gl.MULTIPLICATIVE_GROUP_GENERATOR
    POW_BATCH = 1 << 17

    @jax.jit
    def fn(state12, inbuf, outbuf, coeffs, values_br, init_leaves,
           init_levels):
        dch = DeviceChallenger()
        dch.state = [(state12[0][i], state12[1][i]) for i in range(12)]
        dch.input_buffer = [(inbuf[0][i], inbuf[1][i])
                            for i in range(n_inbuf)]
        dch.output_buffer = [(outbuf[0][i], outbuf[1][i])
                             for i in range(n_outbuf)]

        # fold layers
        layer_trees = []       # (leaves, levels) per layer
        caps = []
        m = n
        shift = shift0
        v_br = values_br
        for ab in arities:
            arity = 1 << ab
            leaves, levels = _commit_body(v_br, m, arity, cap_height)
            layer_trees.append((leaves, levels))
            cap = levels[-1]                       # (4, 2^ch) pair
            caps.append(cap)
            dch.observe_cap_array(cap, 1 << cap_height)
            beta = dch.get_extension_challenge()
            next_shift = gl.s_exp(shift, arity)
            v_br, coeffs = _fold_body(coeffs, beta, m, arity, next_shift)
            shift = next_shift
            m //= arity

        # observe the final polynomial's coefficients: (final_len, 2) ext
        # elements flattened component-minor, as ONE scanned bulk absorb
        # (the unrolled per-element form was ~128 separately-traced
        # duplexes — the bulk of this program's cold compile)
        seq_lo = coeffs[0][:, :final_len].T.reshape(-1)
        seq_hi = coeffs[1][:, :final_len].T.reshape(-1)
        dch.observe_elements_array(seq_lo, seq_hi)

        # PoW grind (reference prover.rs:123-171; smallest witness, same
        # as the host grind, so proofs stay byte-identical)
        base = list(dch.state)
        wpos = len(dch.input_buffer)
        for i, v in enumerate(dch.input_buffer):
            base[i] = v
        thr_hi = np.uint32((1 << (64 - pow_bits)) >> 32) if pow_bits else \
            np.uint32(0xFFFFFFFF)
        base_lo = jnp.stack([b[0] for b in base])   # (12,)
        base_hi = jnp.stack([b[1] for b in base])

        from ..hash.poseidon_wires_jax import poseidon_fast_t

        def try_batch(start):
            lo = jnp.broadcast_to(base_lo[:, None], (12, POW_BATCH))
            hi = jnp.broadcast_to(base_hi[:, None], (12, POW_BATCH))
            wit = start + jax.lax.iota(jnp.uint32, POW_BATCH)
            lo = lo.at[wpos].set(wit)
            hi = hi.at[wpos].set(jnp.zeros_like(wit))
            out = poseidon_fast_t((lo, hi))
            resp_hi = out[1][pos.SPONGE_RATE - 1]
            # response < 2^(64-pow_bits)  <=>  hi < 2^(32-pow_bits)
            # (pow_bits <= 32 in every preset)
            ok = resp_hi < thr_hi
            has = jnp.any(ok)
            first = jnp.argmax(ok).astype(jnp.uint32)
            return has, start + first

        def cond(carry):
            found, _, start = carry
            return ~found

        def body(carry):
            _, _, start = carry
            has, wit = try_batch(start)
            return has, wit, start + np.uint32(POW_BATCH)

        has0, wit0 = try_batch(jnp.uint32(0))
        found, witness, _ = jax.lax.while_loop(
            cond, body, (has0, wit0, jnp.uint32(POW_BATCH)))
        dch.observe_element((witness, jnp.zeros_like(witness)))
        dch.get_challenge()                       # pow response (checked
        #                                           host-side on replay)

        # query indices
        challs = dch.get_n_challenges(num_queries)
        x_idx = jnp.stack([c[0] for c in challs]).astype(jnp.int32) \
            & jnp.int32(n - 1)

        # gathers: initial oracle rows + paths
        def tree_fetch(leaves, levels, idx, n_layers):
            rows = (jnp.take(leaves[0], idx, axis=1),
                    jnp.take(leaves[1], idx, axis=1))   # (B, Q)
            sibs = []
            cur = idx
            for k in range(n_layers):
                sibs.append((jnp.take(levels[k][0], cur ^ 1, axis=1),
                             jnp.take(levels[k][1], cur ^ 1, axis=1)))
                cur = cur >> 1
            return rows, sibs

        init_out = []
        for o, (ncols, n_layers) in enumerate(init_meta):
            init_out.append(tree_fetch(init_leaves[o], init_levels[o],
                                       x_idx, n_layers))

        layer_out = []
        xi = x_idx
        mm = n
        for li, ab in enumerate(arities):
            xi = xi >> ab
            mm //= (1 << ab)
            leaves, levels = layer_trees[li]
            n_layers = len(levels) - 1
            # levels[0] is the leaf-digest row; sibling layers mirror
            # DeviceMerkleTree.prove (levels[k][:, idx^1], idx >>= 1)
            layer_out.append(tree_fetch(leaves, levels, xi, n_layers))

        final = (coeffs[0][:, :final_len], coeffs[1][:, :final_len])
        return caps, final, witness, x_idx, init_out, layer_out

    return fn


def _device_fri_proof_fused(initial_trees, coeffs, values_br,
                            challenger: Challenger,
                            fri_params: FriParams) -> FriProof:
    import jax
    import jax.numpy as jnp

    from ..field import gf_jax as gf
    from .proof import FriInitialTreeProof, FriQueryRound, FriQueryStep

    n = values_br[0][0].shape[0]
    arities = tuple(fri_params.reduction_arity_bits)
    cap_height = fri_params.config.cap_height
    pow_bits = fri_params.config.proof_of_work_bits
    assert pow_bits <= 32, "device PoW compare uses the hi limb only"
    nq = fri_params.config.num_query_rounds
    red = 1
    for ab in arities:
        red <<= ab
    final_len = (n // red) >> fri_params.config.rate_bits

    def pairify_list(vals):
        lo, hi = gf.from_u64(np.array(vals, dtype=np.uint64))
        return (jnp.asarray(lo), jnp.asarray(hi))

    state12 = pairify_list([int(x) for x in challenger.sponge_state])
    inbuf = pairify_list(list(challenger.input_buffer) or [0])
    outbuf = pairify_list(list(challenger.output_buffer) or [0])
    n_inbuf = len(challenger.input_buffer)
    n_outbuf = len(challenger.output_buffer)

    init_leaves = tuple(tuple(t.leaves_dev) for t in initial_trees)
    init_levels = tuple(tuple(tuple(l) for l in t.levels_dev)
                        for t in initial_trees)
    init_meta = tuple((t.leaves_dev[0].shape[0], t.num_layers())
                      for t in initial_trees)

    fn = _fused_fri_fn(n, arities, cap_height, pow_bits, nq, n_inbuf,
                       n_outbuf, init_meta, final_len)
    caps_d, final_d, wit_d, xidx_d, init_d, layer_d = fn(
        state12, inbuf, outbuf, coeffs, values_br, init_leaves, init_levels)
    from ..runtime import meshctx
    out = meshctx.host_get((caps_d, final_d, wit_d, xidx_d, init_d, layer_d))
    caps_h, final_h, wit_h, xidx_h, init_h, layer_h = out

    caps = [mk.MerkleCap(gf.to_u64((np.asarray(c[0]),
                                    np.asarray(c[1]))).T.copy())
            for c in caps_h]
    final_coeffs = np.stack(
        [gf.to_u64((final_h[0][0], final_h[1][0])),
         gf.to_u64((final_h[0][1], final_h[1][1]))], axis=1)  # (len, 2)
    pow_witness = int(wit_h)
    indices = [int(i) for i in xidx_h]

    # replay the transcript on the host challenger: keeps it in sync and
    # cross-checks the device Fiat-Shamir end-to-end
    for cap in caps:
        challenger.observe_cap(cap)
        challenger.get_extension_challenge()
    challenger.observe_extension_elements(final_coeffs)
    challenger.observe_element(pow_witness)
    response = challenger.get_challenge()
    assert response < (1 << (64 - pow_bits)), \
        "device PoW witness fails the host grind check"
    host_idx = [int(r) % n for r in challenger.get_n_challenges(nq)]
    assert host_idx == indices, "device/host Fiat-Shamir divergence"

    def u64_pair(pair):
        return gf.to_u64((np.asarray(pair[0]), np.asarray(pair[1])))

    rounds = []
    for q in range(nq):
        evals_proofs = []
        for o in range(len(initial_trees)):
            rows, sibs = init_h[o]
            row = u64_pair(rows)[:, q]
            path = mk.MerkleProof([u64_pair(s)[:, q] for s in sibs])
            evals_proofs.append((row, path))
        steps = []
        for li in range(len(arities)):
            rows, sibs = layer_h[li]
            leafcol = u64_pair(rows)[:, q]          # (2*arity,)
            evals = leafcol.reshape(-1, 2)
            path = mk.MerkleProof([u64_pair(s)[:, q] for s in sibs])
            steps.append(FriQueryStep(evals=evals, merkle_proof=path))
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(
                evals_proofs=evals_proofs),
            steps=steps))

    return FriProof(commit_phase_merkle_caps=caps,
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
