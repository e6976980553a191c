"""Headline benchmark: batched Goldilocks NTT throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md north-star of 2^24 NTT elements/s/chip.
"""
import json
import time

import numpy as np


def main():
    import jax

    from plonky2_tpu.field import gf_jax as gf
    from plonky2_tpu.ops import ntt as jntt

    backend = jax.default_backend()
    # shape: 16 polys x 2^18 (reference bench ballpark, cuda/test.cu:105-115)
    batch, n = (16, 1 << 18) if backend != "cpu" else (4, 1 << 14)
    rng = np.random.default_rng(0)
    P = (1 << 64) - (1 << 32) + 1
    polys = rng.integers(0, P, size=(batch, n), dtype=np.uint64)
    lo, hi = gf.from_u64(polys)
    # device-resident operands: the prover keeps polynomial state on-chip
    # (mirrors the reference's resident device arena, fri/oracle.rs:94)
    import jax.numpy as jnp
    lo = jax.device_put(jnp.asarray(lo))
    hi = jax.device_put(jnp.asarray(hi))

    step = jax.jit(lambda lo, hi: jntt.ntt((lo, hi)))
    out = step(lo, hi)
    jax.block_until_ready(out)  # compile + warmup

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(lo, hi)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    elems_per_s = batch * n / dt
    baseline = float(1 << 24)  # BASELINE.md: 2^24 NTT elems/s/chip target
    print(json.dumps({
        "metric": f"goldilocks_ntt_throughput_b{batch}_n{n}_{backend}",
        "value": round(elems_per_s, 1),
        "unit": "elems/s",
        "vs_baseline": round(elems_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
