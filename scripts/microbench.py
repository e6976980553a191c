"""Microbenchmarks of the device primitives on the real chip.

Emits one JSON line per primitive (compile time, steady-state seconds,
derived throughput) AND appends each record incrementally to
MICROBENCH_r05.json so a wall-clock cutoff still leaves a recorded
artifact (VERDICT r4 weak #3: the roofline table was two rounds stale
because these numbers were never captured).

Sections (env-selectable, default all):
  MICROBENCH_ONLY=commit   phase-split of the flagship wires commit
  MICROBENCH_ONLY=sponge   Pallas sponge tile sweep + XLA sponge
  MICROBENCH_ONLY=ntt      Pallas column-NTT / four-step / bitrev
  MICROBENCH_ONLY=mds      MDS formulation shoot-out (int8 plane variants)
  MICROBENCH_ONLY=misc     H2D, gather/scatter, transpose
"""
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "MICROBENCH_r05.json")
_RECORDS = []


def emit(rec):
    print(json.dumps(rec), flush=True)
    _RECORDS.append(rec)
    try:
        import jax
        meta = {"round": 5, "backend": jax.default_backend(),
                "records": _RECORDS}
    except Exception:
        meta = {"round": 5, "records": _RECORDS}
    with open(OUT, "w") as f:
        json.dump(meta, f, indent=1)


def _sync(out):
    """Force completion: block_until_ready is a NO-OP through the axon
    tunnel (measured: 63M-perm sponge 'completed' in 0.1 ms), so reduce the
    first output leaf to a scalar on device and fetch those 4 bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(jnp.sum(leaf))


def timed(name, fn, *args, reps=3, unit_elems=None, unit_name="gelems_per_s",
          scale=1e9):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _sync(out)
    sync_s = time.perf_counter() - t0   # dispatch+D2H round trip baseline
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    steady = max(time.perf_counter() - t0 - sync_s, 1e-9) / reps
    rec = {"name": name, "compile_s": round(compile_s, 3),
           "steady_s": round(steady, 4), "sync_s": round(sync_s, 4)}
    if unit_elems:
        rec[unit_name] = round(unit_elems / steady / scale, 3)
    emit(rec)
    return out


def _rand_pair(rng, shape):
    import jax.numpy as jnp
    import numpy as np
    return (jnp.asarray(rng.integers(0, 2**32, shape, dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 2**31, shape, dtype=np.uint32)))


def bench_commit():
    """Phase-split of the flagship wires commit (234 x 2^18 -> 2^21 LDE):
    is the 6 s commit NTT-bound or sponge-bound?  (VERDICT r4 missing #1)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from plonky2_tpu.ops import commit as cm
    from plonky2_tpu.hash import merkle_jax as mkj

    rng = np.random.default_rng(0)
    B, n = 234, 1 << 18
    rate_bits, cap_height = 3, 4
    lde = n << rate_bits
    vals = _rand_pair(rng, (B, n))

    # phase A: poly-block IFFT+LDE+NTT+bitrev writes into the leaf buffer
    def phase_a(pair):
        leaves_lo = jnp.zeros((B, lde), jnp.uint32)
        leaves_hi = jnp.zeros((B, lde), jnp.uint32)
        coeffs_lo = jnp.zeros((B, n), jnp.uint32)
        coeffs_hi = jnp.zeros((B, n), jnp.uint32)
        for b0 in range(0, B, cm._POLY_BLOCK):
            blk = min(cm._POLY_BLOCK, B - b0)
            block = (pair[0][b0:b0 + blk], pair[1][b0:b0 + blk])
            leaves_lo, leaves_hi, coeffs_lo, coeffs_hi = cm._ntt_block_write(
                leaves_lo, leaves_hi, coeffs_lo, coeffs_hi, rate_bits,
                True, block, b0)
        return leaves_lo, leaves_hi
    leaves = timed(f"commit_phaseA_nttwrites_{B}x2^18", phase_a, vals,
                   unit_elems=B * lde, reps=2)

    # phase B: domain-chunked leaf sponge + merkle levels
    def phase_b(lv):
        return cm._hash_and_reduce(lv, cap_height, cm._DOMAIN_CHUNK)
    timed(f"commit_phaseB_hashreduce_{B}x2^21", phase_b, leaves,
          unit_elems=(B // 8 + 1 + 1) * lde, unit_name="gperms_per_s_x1e9",
          reps=2)

    # end-to-end chunked commit (what the prover calls)
    def full(pair):
        return cm.commit_from_values(pair, rate_bits, cap_height)
    timed(f"commit_full_{B}x2^18", full, vals, reps=2)


def bench_sponge():
    import jax
    import numpy as np
    from plonky2_tpu.hash import poseidon_jax as pj
    from plonky2_tpu.hash import poseidon_pallas as pp

    rng = np.random.default_rng(0)
    L, C = 234, 1 << 18
    nperm = (L // 8 + (1 if L % 8 else 0)) * C
    leaves = _rand_pair(rng, (L, C))

    sponge_j = jax.jit(pj.hash_leaves_cols)
    timed(f"sponge_xla_{L}x2^18", sponge_j, leaves, unit_elems=nperm,
          unit_name="mperms_per_s", scale=1e6)

    if pp.sponge_enabled():
        for tile in (256, 512, 1024):
            sponge_p = jax.jit(functools.partial(
                pp.hash_leaves_cols_pallas, tile=tile,
                interpret=pp.sponge_interpret()))
            timed(f"sponge_pallas_t{tile}_{L}x2^18", sponge_p, leaves,
                  unit_elems=nperm, unit_name="mperms_per_s", scale=1e6)
        # merkle compress level via Pallas
        D = 1 << 20
        dig = _rand_pair(rng, (4, D))
        comp_p = jax.jit(lambda d: pp.compress_pairs_cols_pallas(
            (d[0][:, 0::2], d[1][:, 0::2]), (d[0][:, 1::2], d[1][:, 1::2]),
            tile=512, interpret=pp.sponge_interpret()))
        timed("compress_pallas_2^20pairs", comp_p, dig, unit_elems=D // 2,
              unit_name="mperms_per_s", scale=1e6)

    D = 1 << 20
    dig = _rand_pair(rng, (4, D))
    comp_j = jax.jit(lambda d: pj.compress_pairs_cols(
        (d[0][:, 0::2], d[1][:, 0::2]), (d[0][:, 1::2], d[1][:, 1::2])))
    timed("compress_xla_2^20pairs", comp_j, dig, unit_elems=D // 2,
          unit_name="mperms_per_s", scale=1e6)


def bench_ntt():
    import jax
    import numpy as np
    from plonky2_tpu.ops import ntt as jntt
    from plonky2_tpu.ops import ntt_pallas as ntp

    rng = np.random.default_rng(0)
    n = 1 << 18
    B = 32
    vals = _rand_pair(rng, (B, n))

    ifft_j = jax.jit(functools.partial(jntt.ntt, inverse=True))
    timed(f"intt_{B}x2^18", ifft_j, vals, unit_elems=B * n)

    lde_j = jax.jit(functools.partial(jntt.lde_coset_ntt, rate_bits=3))
    timed(f"lde_ntt_{B}x2^18to2^21", lde_j, vals, unit_elems=B * (n << 3))

    if ntp.enabled():
        # the two column-transform shapes inside the 2^21 zero-tail
        # four-step (n1=1024 zero-tail cols, then n2=2048 cols)
        x1 = _rand_pair(rng, (B, 128, 2048))
        zt = jax.jit(functools.partial(ntp.ntt_cols_zero_tail_pallas,
                                       rate_bits=3, tile=256,
                                       interpret=ntp.interpret_mode()))
        timed(f"pallas_zt_cols_{B}x1024x2048", zt, x1,
              unit_elems=B * 1024 * 2048)
        x2 = _rand_pair(rng, (B, 2048, 1024))
        nc = jax.jit(functools.partial(ntp.ntt_cols_pallas, tile=128,
                                       interpret=ntp.interpret_mode()))
        timed(f"pallas_cols_{B}x2048x1024", nc, x2,
              unit_elems=B * 2048 * 1024)

    # bit-reversal gather at LDE scale (part of every commit block)
    lde = _rand_pair(rng, (B, n << 3))
    perm = jntt.bitrev_perm_auto(n << 3)

    def bitrev(pair):
        import jax.numpy as jnp
        p = jntt.bitrev_perm_auto(pair[0].shape[-1])
        return pair[0][:, p], pair[1][:, p]
    timed(f"bitrev_gather_{B}x2^21", jax.jit(bitrev), lde,
          unit_elems=B * (n << 3))


def bench_misc():
    import jax
    import numpy as np
    rng = np.random.default_rng(0)

    for mb in (4, 64, 256):
        buf = rng.integers(0, 2**32, size=(mb << 18,), dtype=np.uint32)
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        emit({"name": f"h2d_{mb}MB", "steady_s": round(dt, 3),
              "MBps": round(mb / dt, 1)})
        del d, buf

    NV = 62_000_000
    NI = (1 << 18) * 234
    values = _rand_pair(rng, (NV,))
    import jax.numpy as jnp
    idx = jnp.asarray(rng.integers(0, NV, (NI,), dtype=np.int32))
    gather_j = jax.jit(lambda v, i: (v[0][i], v[1][i]))
    timed("gather_61M", gather_j, values, idx, unit_elems=NI)

    NS = 15_500_000
    sidx = jnp.asarray(rng.integers(0, NV, (NS,), dtype=np.int32))
    svals = _rand_pair(rng, (NS,))

    def scatter(v, i, x):
        return (v[0].at[i].set(x[0]), v[1].at[i].set(x[1]))
    scatter_j = jax.jit(scatter, donate_argnums=(0,))
    timed("scatter_15M", scatter_j, values, sidx, svals,
          unit_elems=NS, reps=1)

    n = 1 << 18
    wm = _rand_pair(rng, (n, 234))
    tr_j = jax.jit(lambda v: (v[0].T, v[1].T))
    timed("transpose_2^18x234", tr_j, wm, unit_elems=n * 234)


def bench_mds():
    """MDS formulation shoot-out at sponge batch width, measured inside a
    minimal Pallas kernel (8 chained MDS applications so the matmul work
    dominates the block load/store)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from plonky2_tpu.field import gf_jax as gf
    from plonky2_tpu.hash import poseidon_pallas as pp

    rng = np.random.default_rng(0)
    B = 1 << 17
    tile = 512
    st = _rand_pair(rng, (12, B))
    tlo_np, thi_np, m8_np = pp._packed_tables()
    interpret = jax.default_backend() != "tpu"

    def run_kernel(name, mds_fn, extra_inputs=()):
        def kernel(*refs):
            lo_ref, hi_ref, out_lo_ref, out_hi_ref = refs[-4:]
            consts = [r[...] for r in refs[:-4]]
            state = (lo_ref[...], hi_ref[...])
            for _ in range(8):
                state = mds_fn(state, *consts)
            out_lo_ref[...] = state[0]
            out_hi_ref[...] = state[1]

        cspecs = [pl.BlockSpec(x.shape, lambda i: (0, 0))
                  for x in extra_inputs]
        blk = pl.BlockSpec((12, tile), lambda i: (0, i))
        f = pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=cspecs + [blk, blk],
            out_specs=(blk, blk),
            out_shape=(jax.ShapeDtypeStruct((12, B), jnp.uint32),
                       jax.ShapeDtypeStruct((12, B), jnp.uint32)),
            interpret=interpret,
        )
        out = timed(name, jax.jit(lambda a, b: f(*extra_inputs, a, b)),
                    st[0], st[1], unit_elems=8 * B,
                    unit_name="m_mds_per_s", scale=1e6)
        return out

    m8 = jnp.asarray(m8_np)
    offs = jnp.asarray(tlo_np[:, pp._COL_OFFS:pp._COL_OFFS + 1]
                       .astype(np.int32))

    # current: eight separate (12,12)x(12,T) int8 matmuls
    o1 = run_kernel("mds_int8_8x12", lambda s, m, o: pp._mds_mxu(s, m, o),
                    (m8, offs))

    # variant: planes concatenated -> ONE (12,12)x(12,8T) matmul
    def mds_concat(state, m, o):
        lo, hi = state
        T = lo.shape[1]

        def planes(x):
            return [(((x >> s) & np.uint32(0xFF)).astype(jnp.int32) - 128)
                    .astype(jnp.int8) for s in (0, 8, 16, 24)]
        pl_ = planes(lo) + planes(hi)
        big = jnp.concatenate(pl_, axis=1)            # (12, 8T)
        t = (jnp.matmul(m, big, preferred_element_type=jnp.int32)
             + o).astype(jnp.uint32)
        ts = [t[:, k * T:(k + 1) * T] for k in range(8)]
        return pp._recombine16(ts[0] + (ts[1] << 8), ts[2] + (ts[3] << 8),
                               ts[4] + (ts[5] << 8), ts[6] + (ts[7] << 8))
    o2 = run_kernel("mds_int8_concat8", mds_concat, (m8, offs))

    # variant: block-diagonal (96,96) matrix, planes stacked on sublanes
    mbig_np = np.kron(np.eye(8, dtype=np.int8), m8_np)
    mbig = jnp.asarray(mbig_np)
    offs96 = jnp.asarray(np.tile(np.asarray(offs), (8, 1)))

    def mds_blockdiag(state, m, o):
        lo, hi = state

        def planes(x):
            return [(((x >> s) & np.uint32(0xFF)).astype(jnp.int32) - 128)
                    .astype(jnp.int8) for s in (0, 8, 16, 24)]
        big = jnp.concatenate(planes(lo) + planes(hi), axis=0)  # (96, T)
        t = (jnp.matmul(m, big, preferred_element_type=jnp.int32)
             + o).astype(jnp.uint32)
        ts = [t[k * 12:(k + 1) * 12] for k in range(8)]
        return pp._recombine16(ts[0] + (ts[1] << 8), ts[2] + (ts[3] << 8),
                               ts[4] + (ts[5] << 8), ts[6] + (ts[7] << 8))
    o3 = run_kernel("mds_int8_blockdiag96", mds_blockdiag, (mbig, offs96))

    # VPU 16-bit plane fallback
    o4 = run_kernel("mds_vpu16", lambda s: pp._mds_vpu(s), ())

    ok = all(bool(jnp.array_equal(o1[k], o[k])) for o in (o2, o3, o4)
             for k in (0, 1))
    emit({"name": "mds_variants_match", "ok": ok})


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    only = os.environ.get("MICROBENCH_ONLY")
    sections = {"sponge": bench_sponge, "mds": bench_mds, "ntt": bench_ntt,
                "commit": bench_commit, "misc": bench_misc}
    if only:
        sections[only]()
        return
    for name, fn in sections.items():
        try:
            fn()
        except Exception as e:  # pragma: no cover - capture, keep going
            emit({"name": f"section_{name}", "error": repr(e)[:300]})


if __name__ == "__main__":
    main()
