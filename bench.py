"""Headline benchmark: end-to-end plonky2 proof wall-clock on one chip.

Flagship metric: seconds to prove an ed25519-scale circuit (2^18 Poseidon
gate rows, wide-ecc config: 234 wire polys, rate_bits=3, cap_height=4,
28 FRI queries, PoW 16 — the reference's canonical GPU shape,
cuda/test.cu:105-115) with a warm ProverSession.  Baseline: the reference's
published 5 s GPU proof at this scale (BASELINE.md, README.md:14).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} on
STDOUT at the end.  Incremental progress JSON lines go to STDERR as each
phase completes (build / cold / warm), so a driver timeout still leaves
evidence of how far the run got and what each phase cost.
"""
import json
import os
import sys
import time


def _progress(**kw):
    print(json.dumps({"bench_progress": kw}), file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plonky2_tpu.models.hash_tree import build_hash_tree_circuit
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.runtime import ProverSession
    from plonky2_tpu.utils.timing import TimingTree

    backend = jax.default_backend()
    on_accel = backend != "cpu"
    # 2^17 leaves -> 2^17-1 internal hash gates + overhead pads to exactly
    # 2^18 rows, the reference's canonical shape (cuda/test.cu:105-115)
    log2_leaves = int(os.environ.get(
        "BENCH_LOG2_ROWS", "17" if on_accel else "6"))

    config = CircuitConfig.wide_ecc_config()
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              f".bench_cache/hash_tree_k{log2_leaves}.pkl")
    # pin the digest of the git-tracked flagship blob before pickle.load
    # (arbitrary-code-execution vector if tampered); other cache shapes are
    # local-only scratch and load unpinned
    PINNED = {"hash_tree_k17.pkl":
              "ec7e94f7288e5c0b2b2a021ae34aabfd7dfced0f1e1c38782e5e057fe3381f58"}
    t0 = time.perf_counter()
    from plonky2_tpu.utils.circuit_cache import load_circuit, save_circuit
    cached = load_circuit(cache_path, use_device=on_accel,
                          expect_sha256=PINNED.get(
                              os.path.basename(cache_path)))
    if cached is not None:
        data, (pw, root) = cached
    else:
        data, pw, root = build_hash_tree_circuit(config, log2_leaves)
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        save_circuit(cache_path, data, extra=(pw, root))
    build_s = time.perf_counter() - t0
    _progress(phase="build", seconds=round(build_s, 3),
              cached=cached is not None)

    sess = ProverSession(data, use_device=on_accel)
    t0 = time.perf_counter()
    proof = sess.prove(pw)
    cold_s = time.perf_counter() - t0
    _progress(phase="cold_prove", seconds=round(cold_s, 3))
    assert proof.public_inputs == root
    sess.verify(proof)
    _progress(phase="cold_verify", ok=True)

    timing = TimingTree("prove")
    t0 = time.perf_counter()
    proof = sess.prove(pw, timing=timing)
    warm_s = time.perf_counter() - t0
    _progress(phase="warm_prove", seconds=round(warm_s, 3))
    sess.verify(proof)

    pallas_parity = None
    if on_accel:
        # flagship-scale Pallas <-> XLA parity, recorded on every bench run
        # (VERDICT r4 weak #7): same leaf matrix hashed with the Pallas
        # kernels and with them disabled must give identical digest levels.
        import numpy as np
        import jax.numpy as jnp
        from plonky2_tpu.hash import merkle_jax as mkj
        rng = np.random.default_rng(42)
        L, N = 238, 1 << 19
        leaves = (jnp.asarray(rng.integers(0, 2**32, (L, N), dtype=np.uint32)),
                  jnp.asarray(rng.integers(0, 2**31, (L, N), dtype=np.uint32)))
        lv_pallas = mkj.build_digest_levels(leaves, 4)
        os.environ["PLONKY2_TPU_PALLAS_SPONGE"] = "0"
        try:
            lv_xla = mkj.build_digest_levels(leaves, 4)
        finally:
            del os.environ["PLONKY2_TPU_PALLAS_SPONGE"]
        pallas_parity = all(
            bool(jnp.array_equal(a[k], b[k]))
            for a, b in ((lv_pallas[0], lv_xla[0]), (lv_pallas[-1], lv_xla[-1]))
            for k in (0, 1))
        _progress(phase="pallas_parity", ok=pallas_parity, leaf_shape=[L, N])
        assert pallas_parity, "Pallas/XLA digest mismatch at flagship shape"

    phases = {c.name: round(c.duration, 3)
              for c in timing.root.children if c.duration}
    baseline_s = 5.0  # reference GPU headline at 2^18 x 234 (README.md:14)
    print(json.dumps({
        "metric": f"proof_seconds_2^{data.common.degree_bits()}rows_"
                  f"{config.num_wires}wires_{backend}",
        "value": round(warm_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / warm_s, 3),
        "cold_seconds": round(cold_s, 3),
        "build_seconds": round(build_s, 3),
        "pallas_parity": pallas_parity,
        "phases": phases,
    }), flush=True)


if __name__ == "__main__":
    main()
