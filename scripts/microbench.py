"""Microbenchmarks of the device primitives on the real chip.

Prints one JSON line per primitive: compile time, steady-state seconds,
derived throughput.  Used to steer round-3 optimization; not part of the
test suite.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, reps=3, unit_elems=None):
    import jax
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    steady = (time.perf_counter() - t0) / reps
    rec = {"name": name, "compile_s": round(compile_s, 3),
           "steady_s": round(steady, 4)}
    if unit_elems:
        rec["gelems_per_s"] = round(unit_elems / steady / 1e9, 3)
    print(json.dumps(rec), flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plonky2_tpu.field import gf_jax as gf
    from plonky2_tpu.ops import ntt as jntt
    from plonky2_tpu.hash import poseidon_jax as pj

    rng = np.random.default_rng(0)

    # --- H2D upload ---------------------------------------------------
    for mb in (4, 64, 256):
        buf = rng.integers(0, 2**32, size=(mb << 18,), dtype=np.uint32)
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        print(json.dumps({"name": f"h2d_{mb}MB", "steady_s": round(dt, 3),
                          "MBps": round(mb / dt, 1)}), flush=True)
        del d, buf

    # --- batched IFFT (234, 2^18) --------------------------------------
    n = 1 << 18
    B = 32
    vals = (jnp.asarray(rng.integers(0, 2**32, (B, n), dtype=np.uint32)),
            jnp.asarray(rng.integers(0, 2**31, (B, n), dtype=np.uint32)))
    import functools
    ifft_j = jax.jit(functools.partial(jntt.ntt, inverse=True))
    timed(f"intt_{B}x2^18", ifft_j, vals, unit_elems=B * n)

    # --- LDE coset NTT (32, 2^18 -> 2^21) -------------------------------
    lde_j = jax.jit(functools.partial(jntt.lde_coset_ntt, rate_bits=3))
    timed(f"lde_ntt_{B}x2^18to2^21", lde_j, vals, unit_elems=B * (n << 3))

    # --- leaf sponge (234 cols, 2^18 chunk of the domain) ----------------
    L, C = 234, 1 << 18
    leaves = (jnp.asarray(rng.integers(0, 2**32, (L, C), dtype=np.uint32)),
              jnp.asarray(rng.integers(0, 2**31, (L, C), dtype=np.uint32)))
    sponge_j = jax.jit(pj.hash_leaves_cols)
    timed(f"sponge_{L}x2^18", sponge_j, leaves, unit_elems=C)

    # --- leaf sponge, Pallas kernel (same shape) --------------------------
    try:
        from plonky2_tpu.hash import poseidon_pallas as pp
        if pp.sponge_enabled():
            sponge_p = jax.jit(functools.partial(
                pp.hash_leaves_cols_pallas, tile=512))
            timed(f"sponge_pallas_{L}x2^18", sponge_p, leaves, unit_elems=C)
    except Exception as e:  # pragma: no cover - informational only
        print(json.dumps({"name": "sponge_pallas", "error": str(e)}),
              flush=True)

    # --- merkle compress one level (4, 2^20) -> (4, 2^19) ----------------
    D = 1 << 20
    dig = (jnp.asarray(rng.integers(0, 2**32, (4, D), dtype=np.uint32)),
           jnp.asarray(rng.integers(0, 2**31, (4, D), dtype=np.uint32)))
    comp_j = jax.jit(lambda d: pj.compress_pairs_cols(
        (d[0][:, 0::2], d[1][:, 0::2]), (d[0][:, 1::2], d[1][:, 1::2])))
    timed("compress_2^20pairs", comp_j, dig, unit_elems=D // 2)

    # --- poseidon permutation batch (12, 2^16) ---------------------------
    P = 1 << 16
    st = (jnp.asarray(rng.integers(0, 2**32, (12, P), dtype=np.uint32)),
          jnp.asarray(rng.integers(0, 2**31, (12, P), dtype=np.uint32)))
    perm_j = jax.jit(pj.poseidon_t)
    timed("poseidon_2^16", perm_j, st, unit_elems=P)

    # --- big gather: wires matrix materialization ------------------------
    NV = 62_000_000
    NI = (1 << 18) * 234
    values = (jnp.asarray(rng.integers(0, 2**32, (NV,), dtype=np.uint32)),
              jnp.asarray(rng.integers(0, 2**31, (NV,), dtype=np.uint32)))
    idx = jnp.asarray(rng.integers(0, NV, (NI,), dtype=np.int32))
    gather_j = jax.jit(lambda v, i: (v[0][i], v[1][i]))
    timed("gather_61M", gather_j, values, idx, unit_elems=NI)

    # --- scatter: witness wave write --------------------------------------
    NS = 15_500_000
    sidx = jnp.asarray(rng.integers(0, NV, (NS,), dtype=np.int32))
    svals = (jnp.asarray(rng.integers(0, 2**32, (NS,), dtype=np.uint32)),
             jnp.asarray(rng.integers(0, 2**31, (NS,), dtype=np.uint32)))

    def scatter(v, i, x):
        return (v[0].at[i].set(x[0]), v[1].at[i].set(x[1]))
    scatter_j = jax.jit(scatter, donate_argnums=(0,))
    values = timed("scatter_15M", scatter_j, values, sidx, svals,
                   unit_elems=NS, reps=1)

    # --- transpose (2^18, 234) -> (234, 2^18) -----------------------------
    wm = (jnp.asarray(rng.integers(0, 2**32, (n, 234), dtype=np.uint32)),
          jnp.asarray(rng.integers(0, 2**31, (n, 234), dtype=np.uint32)))
    tr_j = jax.jit(lambda v: (v[0].T, v[1].T))
    timed("transpose_2^18x234", tr_j, wm, unit_elems=n * 234)


def mds_variants():
    """Compare the int32 16-bit-plane MDS against an int8 byte-plane MXU
    candidate at sponge batch sizes."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plonky2_tpu.field import gf_jax as gf
    from plonky2_tpu.hash import poseidon as pos
    from plonky2_tpu.hash import poseidon_jax as pj

    rng = np.random.default_rng(0)
    B = 1 << 18
    st = (jnp.asarray(rng.integers(0, 2**32, (12, B), dtype=np.uint32)),
          jnp.asarray(rng.integers(0, 2**31, (12, B), dtype=np.uint32)))

    m_i8 = pos.MDS_MATRIX.astype(np.uint8)

    def mds_int8(state):
        lo, hi = state
        planes = jnp.stack([
            (lo & 0xFF), ((lo >> 8) & 0xFF), ((lo >> 16) & 0xFF), (lo >> 24),
            (hi & 0xFF), ((hi >> 8) & 0xFF), ((hi >> 16) & 0xFF), (hi >> 24),
        ]).astype(jnp.uint8)                      # (8, 12, B)
        t = jnp.matmul(m_i8[None], planes,
                       preferred_element_type=jnp.int32).astype(jnp.uint32)
        # recombine 8 byte-weighted partial sums (each < 2^17) into
        # (s0, s1, s2) 32-bit limbs then epsilon-reduce
        c = []
        r = jnp.zeros_like(t[0])
        for p in range(8):
            s = t[p] + r
            c.append(s & 0xFF)
            r = s >> 8
        s0 = c[0] | (c[1] << 8) | (c[2] << 16) | (c[3] << 24)
        s1 = c[4] | (c[5] << 8) | (c[6] << 16) | (c[7] << 24)
        s2 = r
        zero = jnp.zeros_like(s2)
        return gf.reduce128(s0, s1, s2, zero)

    f32 = jax.jit(pj._mds)
    f8 = jax.jit(mds_int8)
    a = timed("mds_int32_2^18", f32, st, unit_elems=B)
    b = timed("mds_int8_2^18", f8, st, unit_elems=B)
    ok = bool(jnp.array_equal(a[0], b[0]) & jnp.array_equal(a[1], b[1]))
    print(json.dumps({"name": "mds_int8_matches", "ok": ok}), flush=True)


if __name__ == "__main__":
    if os.environ.get("MDS_ONLY"):
        mds_variants()
    else:
        main()
