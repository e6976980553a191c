"""Multi-process mesh dryrun — the DCN/multi-host story, hardware-free.

Launches N python processes that `jax.distributed.initialize` against a
local coordinator, each backed by K virtual CPU devices
(xla_force_host_platform_device_count), forms ONE global 2D-free mesh of
N*K devices, and runs the COMPLETE sharded plonky2 proof (device witness
plan, sharded commits with the four-step NTT's all-to-alls, compiled
quotient program, fused device-Fiat-Shamir FRI) through the unmodified
prover under `mesh_sharding`.  Every process executes the same SPMD
program; process 0 verifies the proof and writes MULTIPROC_r05.json.

BASELINE.md target addressed: ">= 75% scaling at N >= 2 hosts" cannot be
*measured* without real multi-host ICI/DCN, but the sharded program
provably COMPILES AND EXECUTES across process boundaries (collectives run
over the distributed CPU backend), which is the compile/correctness half
of that axis.

Usage:  python scripts/multiproc_dryrun.py [log2_leaves]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 4
PORT = 19765


def worker(pid: int, log2_leaves: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{DEV_PER_PROC}").strip()
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=N_PROC, process_id=pid)
    # Dedicated persistent compile cache (separate from the TPU/test
    # caches): on a 1-core box a fresh-cache attempt can fail when one
    # worker cache-hits an entry the other just wrote and races ahead of
    # gloo's ~30 s collective-rendezvous window — but every attempt
    # extends the cache monotonically, and a fully-cached attempt replays
    # both workers in lockstep.  Without any cache, each retry recompiles
    # the whole prover twice per process and a 2-process run needs >50
    # minutes of compile before its first chance to succeed.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache_mp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from jax.sharding import Mesh

    from plonky2_tpu.models.hash_tree import build_hash_tree_circuit
    from plonky2_tpu.runtime import ProverSession, mesh_sharding
    from __graft_entry__ import _fast_config

    assert len(jax.devices()) == N_PROC * DEV_PER_PROC, jax.devices()
    data, pw, root = build_hash_tree_circuit(_fast_config(), log2_leaves)
    mesh = Mesh(jax.devices(), ("d",))
    sess = ProverSession(data, use_device=True)
    t0 = time.perf_counter()
    with mesh_sharding(mesh):
        proof = sess.prove(pw)
    dt = time.perf_counter() - t0
    assert proof.public_inputs == root
    sess.verify(proof)
    if pid == 0:
        out = {
            "multiproc_dryrun": {
                "processes": N_PROC, "devices_per_process": DEV_PER_PROC,
                "global_devices": N_PROC * DEV_PER_PROC,
                "degree_bits": data.common.degree_bits(),
                "verified": True,
                "prove_seconds_including_compile": round(dt, 1),
            }}
        with open(os.path.join(REPO, "MULTIPROC_r05.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out), flush=True)


def _attempt(log2_leaves: int) -> list:
    procs = []
    logs = []
    for pid in range(N_PROC):
        env = dict(os.environ, MP_DRYRUN_WORKER=str(pid))
        log = open(f"/tmp/mp_dryrun_worker{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             str(log2_leaves)], env=env, stdout=log, stderr=log))
    rc = [p.wait() for p in procs]
    for log in logs:
        log.close()
    return rc


def main() -> None:
    log2_leaves = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    if os.environ.get("MP_DRYRUN_WORKER") is not None:
        worker(int(os.environ["MP_DRYRUN_WORKER"]), log2_leaves)
        return
    # The gloo cross-process collectives carry a fixed ~30 s rendezvous
    # timeout; on a single shared core the two workers skew by whole
    # compile times whenever one loads a persistent-cache entry the other
    # just wrote.  Every attempt extends the shared compile cache, so the
    # skew shrinks monotonically — retry until the workers stay inside the
    # rendezvous window.
    for attempt in range(5):
        rc = _attempt(log2_leaves)
        if rc == [0] * N_PROC:
            print("multiproc dryrun OK", flush=True)
            return
        print(f"attempt {attempt}: worker exit codes {rc} "
              "(gloo rendezvous skew; compile cache extended, retrying)",
              flush=True)
    for pid in range(N_PROC):
        print(f"--- worker {pid} log tail ---")
        with open(f"/tmp/mp_dryrun_worker{pid}.log") as f:
            print("".join(f.readlines()[-30:]))
    raise SystemExit(f"multiproc dryrun failed after retries: {rc}")


if __name__ == "__main__":
    main()
