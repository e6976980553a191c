"""Device witness generation — the whole generator fixpoint as ONE jitted
TPU program.

Round 2 ran the witness waves in numpy on the host and shipped the 0.5 GB
wire matrix through the tunnel every proof (~82 s of the 100 s flagship
proof).  The wave STRUCTURE, however, is static per circuit: which
generators fire in which order depends only on the circuit topology and the
set of input targets, not on their values.  So we simulate the fixpoint once
(booleans only, no values), record the wave schedule, upload the index
arrays once, and compile a single device program:

    values <- zeros; scatter inputs
    for each wave: gather deps -> run_batch_device -> scatter outputs
    wires  <- values[rep matrix]  (already transposed to (num_wires, degree))

Per proof the host uploads only the input VALUES (a few MB) and dispatches
one program — the reference's my_full_witness materialization + H2D copy
(iop/witness.rs:351-361, plonk/prover.rs:257-266) collapse to zero host work.

A generator class opts in by defining ``run_batch_device(meta, dep_pair)``
(and optionally ``device_meta(gens)``); circuits containing any scalar-only
generator fall back to the host engine.

Conflict safety: the host engine (generator.py) is first-write-wins and
raises when a later write disagrees; the device scatter is last-write-wins.
The two can only diverge observably when some slot is structurally written
MORE THAN ONCE (single-writer slots are trivially identical under either
policy, and equal-value rewrites are unobservable).  ``_simulate_waves``
therefore counts structural rewrites during the boolean replay — any slot
rewritten across waves, duplicated inside one wave's write set, or written
over an input — and ``build_plan`` refuses to build a device plan for such
circuits (``None`` -> the prover falls back to the host engine, which
raises loudly iff the duplicate values genuinely conflict).  Plans that do
build are conflict-free by construction; tests/test_device_witness.py pins
host/device equality and the loud-failure path.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import numpy as np

from .generator import _get_cache
from .target import target_index


class DeviceWitnessPlan:
    def __init__(self, waves, n_slots, input_keys, input_idx_np, fix_pos_np,
                 fix_src_np, pi_idx_np, degree, num_wires, prefix_gens=()):
        import jax
        import jax.numpy as jnp

        self.n_slots = n_slots
        self.input_keys = input_keys            # list of Target, fixed order
        self.degree = degree
        self.num_wires = num_wires
        # dep-free scalar generators (RandomValueGenerator filler wires) run
        # on host each proof — fresh randomness, ~hundreds of scalar calls
        self._prefix_gens = list(prefix_gens)
        self._vals_cache_id: Optional[int] = None

        self._input_idx = jnp.asarray(input_idx_np)
        # copy-class fixups (see _gather_wires): ~3% of wires at hash-tree
        # scale, vs a full 61M-element scalar gather (~1.8 s on a v5e —
        # TPU gathers run ~1 elem/30 cycles)
        self._fix_pos = jnp.asarray(fix_pos_np)
        self._fix_src = jnp.asarray(fix_src_np)
        self._pi_idx = jnp.asarray(pi_idx_np)
        self._classes = [w[0] for w in waves]
        self._waves = []
        for cls, dep_np, out_np, meta_np in waves:
            from ..field import gf_jax as gf
            w = {"dep": jnp.asarray(dep_np), "out": jnp.asarray(out_np)}
            if meta_np is not None:
                mlo, mhi = gf.from_u64(meta_np)
                w["meta"] = (jnp.asarray(mlo), jnp.asarray(mhi))
            self._waves.append(w)

        classes = self._classes
        n = n_slots

        @jax.jit
        def _run(input_vals, input_idx, pi_idx, waves):
            vlo = jnp.zeros(n, jnp.uint32).at[input_idx].set(input_vals[0])
            vhi = jnp.zeros(n, jnp.uint32).at[input_idx].set(input_vals[1])
            for cls, w in zip(classes, waves):
                dep = (vlo[w["dep"]], vhi[w["dep"]])
                out = cls.run_batch_device(w.get("meta"), dep)
                vlo = vlo.at[w["out"]].set(out[0].reshape(-1))
                vhi = vhi.at[w["out"]].set(out[1].reshape(-1))
            return (vlo, vhi), (vlo[pi_idx], vhi[pi_idx])

        W = degree * num_wires

        @functools.partial(jax.jit, donate_argnums=(0,))
        def _gather_wires(vpair, fix_pos, fix_src):
            # The union-find parent array is the identity on class roots and
            # singletons, and slot order IS wire order (row-major
            # row*num_wires + col, then virtual targets): the wires matrix
            # is a free prefix slice of the slot values, corrected only at
            # the non-root members of copy classes.  vpair (2 x n_slots u32,
            # ~0.4 GB at flagship scale) is donated.
            out = []
            for v in vpair:
                w = v[:W].at[fix_pos].set(v[fix_src])
                out.append(w.reshape(degree, num_wires).T)
            return tuple(out)

        self._run_jit = _run
        self._gather_wires_jit = _gather_wires

    # -- per-proof ----------------------------------------------------------

    def _input_values(self, inputs) -> np.ndarray:
        d = inputs.target_values
        if self._vals_cache_id != id(d) or len(d) != len(self.input_keys):
            if list(d.keys()) != self.input_keys:
                raise _PlanMismatch()
            self._vals_cache_id = id(d)
        return np.fromiter(d.values(), dtype=np.uint64, count=len(d))

    def run(self, inputs) -> Tuple[tuple, List[int]]:
        """inputs: PartialWitness -> (wires (num_wires, degree) GF pair,
        public_input ints).  The intermediate slot-value buffer is donated
        to the wires gather (HBM freed before the commit starts)."""
        import jax.numpy as jnp

        from ..field import gf_jax as gf
        vals = self._input_values(inputs)
        if self._prefix_gens:
            buf: list = []
            for g in self._prefix_gens:
                g.run_once(None, buf)
            vals = np.concatenate(
                [vals, np.array([v for _, v in buf], dtype=np.uint64)])
        lo, hi = gf.from_u64(vals)
        vpair, pi_pair = self._run_jit(
            (jnp.asarray(lo), jnp.asarray(hi)), self._input_idx,
            self._pi_idx, self._waves)
        wires = self._gather_wires_jit(vpair, self._fix_pos, self._fix_src)
        del vpair
        from ..runtime import meshctx
        pis = [int(x) for x in gf.to_u64(
            meshctx.host_get((pi_pair[0], pi_pair[1])))]
        return wires, pis


class _PlanMismatch(Exception):
    """The proof's input target set differs from the plan's."""


def _simulate_waves(cache, generators, is_set, expired):
    """Boolean replay of generate_partial_witness's wave loop; returns
    (ordered [(gid, slots)] schedule, rewrites?) or None if the fixpoint
    stalls.  `rewrites` is True when any slot is structurally written more
    than once (over an input, across waves, or duplicated inside one
    wave's write set) — the only situation where the device program's
    last-write-wins scatter could observably diverge from the host
    engine's first-write-wins-or-raise semantics.
    `expired` marks host-prefix generators already accounted for."""
    n = len(generators)
    remaining = n - int(expired.sum())
    pending = np.arange(n, dtype=np.int64)
    waves = []
    rewrites = False
    while pending.size:
        pending = np.unique(pending)
        pending = pending[~expired[pending]]
        if not pending.size:
            break
        newly = []
        gids = cache.gid[pending]
        for gid in np.unique(gids):
            group = cache.groups[gid]
            slots = cache.slot[pending[gids == gid]]
            dep_rows = group.dep_reps[slots]
            ready = (is_set[dep_rows].all(axis=1) if dep_rows.shape[1]
                     else np.ones(len(slots), dtype=bool))
            slots_r = np.sort(slots[ready])
            if not slots_r.size:
                continue
            flat = group.out_reps[slots_r].ravel()
            fresh = ~is_set[flat]
            if not fresh.all() or np.unique(flat).size != flat.size:
                rewrites = True
            is_set[flat] = True
            if fresh.any():
                newly.append(np.unique(flat[fresh]))
            expired[group.gen_idx[slots_r]] = True
            remaining -= int(slots_r.size)
            waves.append((gid, slots_r))
        if not newly:
            break
        new_reps = np.unique(np.concatenate(newly))
        starts = cache.w_indptr[new_reps]
        ends = cache.w_indptr[new_reps + 1]
        lens = ends - starts
        nz = lens > 0
        if nz.any():
            from .generator import _ragged_arange
            offs = np.repeat(starts[nz], lens[nz]) + _ragged_arange(lens[nz])
            pending = cache.w_data[offs]
        else:
            pending = np.empty(0, dtype=np.int64)
    if remaining:
        return None
    return waves, rewrites


def build_plan(prover_data, common_data, inputs) -> Optional[DeviceWitnessPlan]:
    """Build a device plan for this circuit + input target set, or None if
    some generator type has no device implementation."""
    generators = prover_data.generators
    cache = _get_cache(prover_data, common_data)
    num_wires = common_data.config.num_wires
    degree = common_data.degree()
    rep_arr = np.asarray(prover_data.representative_map, dtype=np.int64)
    # cover every rep index AND the full wire prefix (the wires matrix is
    # sliced from slot values [:degree*num_wires] in _gather_wires)
    n_slots = int(rep_arr.max()) + 1 if rep_arr.size else 1
    n_slots = max(n_slots, degree * num_wires)
    # rep indices must fit the device int32 gather/scatter indices
    if n_slots >= (1 << 31):
        return None
    for g in cache.groups:
        if not hasattr(g.cls, "run_batch_device"):
            return None

    # scalar generators: only dep-free ones (RandomValueGenerator filler
    # wires) are supported — they run host-side as a per-proof prefix whose
    # values join the input upload.  Scalar generators WITH dependencies
    # would need host<->device ping-pong: fall back to the host engine.
    prefix_gens = []
    prefix_targets = []
    for gi in cache.scalar_idx:
        g = generators[gi]
        try:
            if g.dependencies():
                return None
            tgt = getattr(g, "target", None)
            if tgt is not None:
                # RandomValueGenerator shape: one output, no stream draw at
                # plan-build time (keeps the host/plan randomness streams
                # aligned for byte-parity tests)
                prefix_targets.append(tgt)
            else:
                buf: list = []
                g.run_once(None, buf)
                prefix_targets.extend(t for t, _ in buf)
        except Exception:
            return None
        prefix_gens.append(g)

    input_keys = list(inputs.target_values.keys())
    input_idx_np = np.fromiter(
        (rep_arr[target_index(t, num_wires, degree)]
         for t in list(input_keys) + prefix_targets),
        dtype=np.int32, count=len(input_keys) + len(prefix_targets))

    is_set = np.zeros(n_slots, dtype=bool)
    is_set[input_idx_np] = True
    expired = np.zeros(len(generators), dtype=bool)
    expired[cache.scalar_idx] = True
    sim = _simulate_waves(cache, generators, is_set, expired)
    if sim is None:
        return None
    schedule, rewrites = sim
    if rewrites:
        # Some slot has multiple structural writers: the device scatter's
        # last-write-wins could silently diverge from the host engine's
        # conflict check.  Refuse the plan — the prover falls back to the
        # host engine, which raises iff the duplicate values actually
        # conflict (and proves correctly when they agree).
        return None

    waves = []
    for gid, slots in schedule:
        group = cache.groups[gid]
        dep_np = group.dep_reps[slots].astype(np.int32)
        out_np = group.out_reps[slots].T.ravel().astype(np.int32)
        meta_fn = getattr(group.cls, "device_meta", None)
        meta_np = None
        if meta_fn is not None:
            gens = [generators[i] for i in group.gen_idx[slots]]
            meta_np = meta_fn(gens)
        waves.append((group.cls, dep_np, out_np, meta_np))

    # non-root wire slots: the only positions where the wires matrix
    # differs from the slot-value prefix (copy classes)
    W = degree * num_wires
    wire_reps = rep_arr[:W]
    fix_pos_np = np.nonzero(wire_reps != np.arange(W))[0].astype(np.int32)
    fix_src_np = wire_reps[fix_pos_np].astype(np.int32)
    pi_idx_np = np.fromiter(
        (rep_arr[target_index(t, num_wires, degree)]
         for t in prover_data.public_inputs),
        dtype=np.int32, count=len(prover_data.public_inputs))

    return DeviceWitnessPlan(waves, n_slots, input_keys, input_idx_np,
                             fix_pos_np, fix_src_np, pi_idx_np, degree,
                             num_wires, prefix_gens=prefix_gens)


def get_plan(prover_data, common_data, inputs,
             rebuild: bool = False) -> Optional[DeviceWitnessPlan]:
    """Cached per circuit.  Returns None (and caches the None) when the
    circuit has generators without device implementations.  The cached plan
    validates the input target set lazily inside run() (_PlanMismatch);
    callers pass rebuild=True to force a rebuild for a new target set."""
    import os
    if os.environ.get("PLONKY2_TPU_DEVICE_WITNESS") == "0":
        return None
    plan = getattr(prover_data, "_device_witness_plan", "unset")
    if plan == "unset" or rebuild:
        plan = build_plan(prover_data, common_data, inputs)
        prover_data._device_witness_plan = plan
    return plan
