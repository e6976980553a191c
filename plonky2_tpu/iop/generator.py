"""Witness generation engine.

Two executions of the same watch-list fixpoint (reference
plonky2/src/iop/generator.rs:18-96):

- the scalar queue (`_generate_scalar`) — one generator at a time, the
  reference's exact shape; kept as the oracle and the fallback for
  generator types without a batch implementation;
- the batched engine (default) — each dependency wave runs ALL ready
  instances of a generator type as one vectorized numpy evaluation
  (SURVEY §6 hard part (g)).  Readiness checks, value writes, conflict
  detection and watch-list propagation are all array ops; python-level work
  per wave is O(#generator types), not O(#generators).

Batchable generator classes set ``batch_group`` and implement
``output_targets`` + classmethod ``run_batch(gens, dep_vals)``.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .target import Target, target_index
from .witness import PartialWitness, PartitionWitness


class SimpleGenerator:
    """Runs once when all dependencies are present."""

    batch_group: Optional[str] = None     # set on batchable subclasses

    def dependencies(self) -> List[Target]:
        raise NotImplementedError

    def run_once(self, witness: PartitionWitness, out: List[Tuple[Target, int]]) -> None:
        raise NotImplementedError

    # batch protocol ------------------------------------------------------
    def output_targets(self) -> List[Target]:
        raise NotImplementedError

    @classmethod
    def run_batch(cls, gens: List["SimpleGenerator"],
                  dep_vals: np.ndarray) -> np.ndarray:
        """dep_vals: (G, n_deps) uint64 -> (G, n_outputs) uint64."""
        raise NotImplementedError

    # WitnessGenerator interface (adapter included)
    def watch_list(self) -> List[Target]:
        return self.dependencies()

    def run(self, witness: PartitionWitness, out: List[Tuple[Target, int]]) -> bool:
        if all(witness.contains(t) for t in self.dependencies()):
            self.run_once(witness, out)
            return True
        return False


class ConstantGenerator(SimpleGenerator):
    batch_group = "constant"

    def __init__(self, row: int, constant_index: int, wire_index: int, constant: int):
        self.row = row
        self.constant_index = constant_index
        self.wire_index = wire_index
        self.constant = constant

    def dependencies(self):
        return []

    def output_targets(self):
        return [("w", self.row, self.wire_index)]

    @classmethod
    def run_batch(cls, gens, dep_vals):
        return np.array([g.constant for g in gens], dtype=np.uint64)[:, None]

    @classmethod
    def device_meta(cls, gens):
        return np.array([g.constant for g in gens], dtype=np.uint64)

    @classmethod
    def run_batch_device(cls, meta, dep):
        return meta[0][None, :], meta[1][None, :]

    def run_once(self, witness, out):
        out.append((("w", self.row, self.wire_index), self.constant))


class CopyGenerator(SimpleGenerator):
    batch_group = "copy"

    def __init__(self, src: Target, dst: Target):
        self.src = src
        self.dst = dst

    def dependencies(self):
        return [self.src]

    def output_targets(self):
        return [self.dst]

    @classmethod
    def run_batch(cls, gens, dep_vals):
        return dep_vals

    @classmethod
    def run_batch_device(cls, meta, dep):
        return dep[0].T, dep[1].T

    def run_once(self, witness, out):
        out.append((self.dst, witness.get_target(self.src)))


class RandomValueGenerator(SimpleGenerator):
    # intentionally NOT batched: tests pin determinism by patching run_once
    def __init__(self, target: Target):
        self.target = target

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        import secrets

        from ..field import goldilocks as gl
        out.append((self.target, secrets.randbelow(gl.P)))


# ---------------------------------------------------------------------------
# batched engine
# ---------------------------------------------------------------------------

class _Group:
    __slots__ = ("cls", "gen_idx", "dep_reps", "out_reps")

    def __init__(self, cls, gen_idx, dep_reps, out_reps):
        self.cls = cls
        self.gen_idx = gen_idx      # (G,) indices into generators
        self.dep_reps = dep_reps    # (G, n_deps) int64 rep indices
        self.out_reps = out_reps    # (G, n_outs) int64 rep indices


class _GenCache:
    """Per-circuit precomputed index structures (built once, reused across
    proofs — ProverSession keeps prover_data alive)."""

    def __init__(self, generators, by_watches, rep_map, num_wires, degree):
        rep_arr = np.asarray(rep_map, dtype=np.int64)
        n = len(generators)

        def t_rep(t):
            return rep_arr[target_index(t, num_wires, degree)]

        grouped: Dict[tuple, list] = {}
        self.gid = np.full(n, -1, dtype=np.int32)   # generator -> group id
        self.slot = np.zeros(n, dtype=np.int64)     # index within its group
        scalars = []
        for i, g in enumerate(generators):
            # duck-typed: SwitchGenerator et al. are raw WitnessGenerators
            bg = getattr(type(g), "batch_group", None)
            if bg is None:
                scalars.append(i)
                continue
            deps = g.dependencies()
            outs = g.output_targets()
            key = (bg, len(deps), len(outs))
            grouped.setdefault(key, []).append(
                (i, [t_rep(t) for t in deps], [t_rep(t) for t in outs]))
        self.groups: List[_Group] = []
        for key, members in grouped.items():
            gidx = np.array([m[0] for m in members], dtype=np.int64)
            dep_reps = np.array([m[1] for m in members],
                                dtype=np.int64).reshape(len(members), key[1])
            out_reps = np.array([m[2] for m in members],
                                dtype=np.int64).reshape(len(members), key[2])
            gid = len(self.groups)
            self.gid[gidx] = gid
            self.slot[gidx] = np.arange(len(members))
            self.groups.append(_Group(type(generators[members[0][0]]), gidx,
                                      dep_reps, out_reps))
        self.scalar_idx = np.array(scalars, dtype=np.int64)

        # watcher CSR over representative slots
        n_slots = len(rep_map)
        counts = np.zeros(n_slots + 1, dtype=np.int64)
        for r, lst in by_watches.items():
            counts[r + 1] = len(lst)
        self.w_indptr = np.cumsum(counts)
        self.w_data = np.zeros(self.w_indptr[-1], dtype=np.int64)
        for r, lst in by_watches.items():
            s = self.w_indptr[r]
            self.w_data[s:s + len(lst)] = lst


def _get_cache(prover_data, common_data) -> _GenCache:
    cache = getattr(prover_data, "_gen_cache", None)
    if cache is None:
        cache = _GenCache(prover_data.generators,
                          prover_data.generator_indices_by_watches,
                          prover_data.representative_map,
                          common_data.config.num_wires, common_data.degree())
        prover_data._gen_cache = cache
    return cache


def generate_partial_witness(inputs: PartialWitness, prover_data,
                             common_data) -> PartitionWitness:
    if os.environ.get("PLONKY2_TPU_SCALAR_WITNESS") == "1":
        return _generate_scalar(inputs, prover_data, common_data)

    generators = prover_data.generators
    cache = _get_cache(prover_data, common_data)
    witness = PartitionWitness(common_data.config.num_wires,
                               common_data.degree(),
                               prover_data.representative_map)
    for t, v in inputs.target_values.items():
        witness.set_target_returning_rep(t, v)

    values, is_set = witness.values, witness.is_set
    n = len(generators)
    expired = np.zeros(n, dtype=bool)
    remaining = n
    pending = np.arange(n, dtype=np.int64)
    buffer: List[Tuple[Target, int]] = []

    while pending.size:
        pending = np.unique(pending)
        pending = pending[~expired[pending]]
        if not pending.size:
            break
        newly: List[np.ndarray] = []
        gids = cache.gid[pending]

        # batched groups
        for gid in np.unique(gids[gids >= 0]):
            group = cache.groups[gid]
            slots = cache.slot[pending[gids == gid]]
            dep_rows = group.dep_reps[slots]
            ready = (is_set[dep_rows].all(axis=1) if dep_rows.shape[1]
                     else np.ones(len(slots), dtype=bool))
            slots_all = slots[ready]
            if not slots_all.size:
                continue
            # chunk big batches so the vectorized temporaries stay
            # cache-resident (memory bandwidth on shared hosts is the
            # bottleneck, not op count)
            chunk = getattr(group.cls, "batch_chunk", 0) or slots_all.size
            for c0 in range(0, slots_all.size, chunk):
                slots_r = slots_all[c0:c0 + chunk]
                dep_vals = values[group.dep_reps[slots_r]]
                gens_sub = [generators[i] for i in group.gen_idx[slots_r]]
                out_vals = np.asarray(
                    group.cls.run_batch(gens_sub, dep_vals), dtype=np.uint64)
                out_rows = group.out_reps[slots_r]
                flat_r = out_rows.ravel()
                flat_v = out_vals.ravel()
                already = is_set[flat_r]
                if already.any() and not np.array_equal(
                        values[flat_r[already]], flat_v[already]):
                    raise ValueError(
                        f"{group.cls.__name__}: batch write conflicts with "
                        "already-set partition values")
                fresh = ~already
                values[flat_r[fresh]] = flat_v[fresh]
                is_set[flat_r[fresh]] = True
                # duplicate writes inside one batch must agree (copy classes)
                if not np.array_equal(values[flat_r], flat_v):
                    raise ValueError(
                        f"{group.cls.__name__}: conflicting duplicate writes "
                        "in batch")
                if fresh.any():
                    newly.append(np.unique(flat_r[fresh]))
                expired[group.gen_idx[slots_r]] = True
            remaining -= int(slots_all.size)

        # scalar generators (reference-style one-at-a-time path)
        for gi in pending[gids < 0]:
            finished = generators[gi].run(witness, buffer)
            if finished:
                expired[gi] = True
                remaining -= 1
            news = []
            for t, v in buffer:
                rep = witness.set_target_returning_rep(t, v)
                if rep is not None:
                    news.append(rep)
            buffer.clear()
            if news:
                newly.append(np.array(news, dtype=np.int64))

        if not newly:
            break
        new_reps = np.unique(np.concatenate(newly))
        starts = cache.w_indptr[new_reps]
        ends = cache.w_indptr[new_reps + 1]
        lens = ends - starts
        nz = lens > 0
        if nz.any():
            # gather all watcher lists without a python loop
            offs = np.repeat(starts[nz], lens[nz]) + _ragged_arange(lens[nz])
            pending = cache.w_data[offs]
        else:
            pending = np.empty(0, dtype=np.int64)

    assert remaining == 0, f"{remaining} generators weren't run"
    return witness


def _ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]), [0..lens[1]), ... concatenated."""
    ends = np.cumsum(lens)
    out = np.arange(ends[-1], dtype=np.int64)
    out -= np.repeat(ends - lens, lens)
    return out


def _generate_scalar(inputs: PartialWitness, prover_data,
                     common_data) -> PartitionWitness:
    """Reference-shaped scalar queue (generator.rs:18-96)."""
    config = common_data.config
    generators = prover_data.generators
    by_watches: Dict[int, List[int]] = prover_data.generator_indices_by_watches

    witness = PartitionWitness(config.num_wires, common_data.degree(),
                               prover_data.representative_map)
    for t, v in inputs.target_values.items():
        witness.set_target_returning_rep(t, v)

    pending = list(range(len(generators)))
    expired = [False] * len(generators)
    remaining = len(generators)
    buffer: List[Tuple[Target, int]] = []

    while pending:
        next_pending: List[int] = []
        for gi in pending:
            if expired[gi]:
                continue
            finished = generators[gi].run(witness, buffer)
            if finished:
                expired[gi] = True
                remaining -= 1
            for t, v in buffer:
                rep = witness.set_target_returning_rep(t, v)
                if rep is not None and rep in by_watches:
                    for wg in by_watches[rep]:
                        if not expired[wg]:
                            next_pending.append(wg)
            buffer.clear()
        pending = next_pending

    assert remaining == 0, f"{remaining} generators weren't run"
    return witness
