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
DEV_PER_PROC = int(os.environ.get("MP_DEV_PER_PROC", "4"))
PORT = int(os.environ.get("MP_DRYRUN_PORT", "19765"))


def worker(pid: int, log2_leaves: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("PLONKY2_TPU_PHASE_TRACE", "1")
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{DEV_PER_PROC}").strip()
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=N_PROC, process_id=pid)
    # One compile per program FLEET-WIDE: for each module an elected
    # process compiles, every other process blocks (with a generous
    # timeout) until the serialized binary arrives via the coordinator KV
    # store.  Without this, both workers compile every program
    # concurrently on the one shared core; whoever finishes first
    # dispatches and then dies in gloo's FIXED 30 s context rendezvous
    # while the other is still compiling.
    #
    # Deliberately NO persistent disk cache here: compile_or_get_cached
    # consults the disk cache BEFORE the sharing protocol, so a stale
    # cache lets one worker disk-hit a module and dispatch while the
    # OTHER worker is the elected compiler-and-sharer for it — observed
    # (via MP_DRYRUN_STACKS=1 stack dumps) as worker0 dying at
    # cpu:gloo/... 30 s rendezvous with worker1 parked in
    # _compile_and_share_module.  share_binary alone keeps both workers
    # in lockstep on every module.
    # MP_SHARE_BINARY=0 opts out: on a single shared core the election can
    # interleave compile and dispatch ACROSS modules (observed: worker0
    # dispatching jax's implicit process_allgather while worker1 was still
    # the elected compiler of a bigger module), recreating the skew it is
    # meant to fix; with identical per-worker compiles and sync dispatch
    # the workers stay naturally aligned instead.
    if os.environ.get("MP_SHARE_BINARY", "1") == "1":
        jax.config.update("jax_share_binary_between_hosts", True)
        jax.config.update("jax_share_binary_between_hosts_timeout_ms",
                          30 * 60 * 1000)
    # Synchronous dispatch: with async dispatch the collective thunks run
    # on background executor threads that contend (2 procs x 4 virtual
    # devices x thread pools) for ONE physical core, so a runnable
    # collective can starve past gloo's fixed 30 s context rendezvous no
    # matter how aligned the python threads are.  Synchronous dispatch
    # ties execution to the barrier-aligned main threads.
    jax.config.update("jax_cpu_enable_async_dispatch", False)
    from jax.sharding import Mesh

    from plonky2_tpu.models.hash_tree import build_hash_tree_circuit
    from plonky2_tpu.runtime import ProverSession, mesh_sharding
    from __graft_entry__ import _fast_config

    assert len(jax.devices()) == N_PROC * DEV_PER_PROC, jax.devices()
    data, pw, root = build_hash_tree_circuit(_fast_config(), log2_leaves)
    mesh = Mesh(jax.devices(), ("d",))
    sess = ProverSession(data, use_device=True)
    # Re-sync before the first collective: the pure-python circuit build
    # above takes minutes per worker on a shared core, so workers reach
    # the first sharded dispatch arbitrarily far apart — and gloo's
    # context rendezvous has a FIXED 30 s deadline (observed: every
    # attempt died at the same cpu:gloo key with zero cache growth).
    # The coordinator's KV barrier takes an explicit timeout, so use it
    # to absorb the build skew instead.
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        "plonky2_tpu_prebuilt", timeout_in_ms=30 * 60 * 1000)
    if os.environ.get("MP_DRYRUN_STACKS") == "1":
        # skew diagnosis: dump the main thread's stack every 10 s
        import threading
        import traceback
        main_id = threading.get_ident()

        def dump():
            while True:
                time.sleep(10)
                frm = sys._current_frames().get(main_id)
                if frm is not None:
                    stk = traceback.extract_stack(frm)[-3:]
                    print(f"[stack pid{pid} t={time.perf_counter():.0f}] "
                          + " <- ".join(f"{s.name}:{s.lineno}"
                                        for s in reversed(stk)),
                          flush=True)

        threading.Thread(target=dump, daemon=True).start()
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
