"""Witness generation engine — watch-list fixpoint queue
(reference plonky2/src/iop/generator.rs:18-96)."""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

from .target import Target
from .witness import PartialWitness, PartitionWitness


class SimpleGenerator:
    """Runs once when all dependencies are present."""

    def dependencies(self) -> List[Target]:
        raise NotImplementedError

    def run_once(self, witness: PartitionWitness, out: List[Tuple[Target, int]]) -> None:
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
    def __init__(self, row: int, constant_index: int, wire_index: int, constant: int):
        self.row = row
        self.constant_index = constant_index
        self.wire_index = wire_index
        self.constant = constant

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        out.append((("w", self.row, self.wire_index), self.constant))


class CopyGenerator(SimpleGenerator):
    def __init__(self, src: Target, dst: Target):
        self.src = src
        self.dst = dst

    def dependencies(self):
        return [self.src]

    def run_once(self, witness, out):
        out.append((self.dst, witness.get_target(self.src)))


class RandomValueGenerator(SimpleGenerator):
    def __init__(self, target: Target):
        self.target = target

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        import secrets

        from ..field import goldilocks as gl
        out.append((self.target, secrets.randbelow(gl.P)))


def generate_partial_witness(inputs: PartialWitness, prover_data,
                             common_data) -> PartitionWitness:
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
