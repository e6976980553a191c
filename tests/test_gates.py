"""Per-gate property tests (mirrors reference per-gate test modules using
gate_testing.rs): low-degree check + cross-backend eval consistency, plus
generator sanity inside small circuits."""
import numpy as np
import pytest

from plonky2_tpu.gates.advanced import (ArithmeticExtensionGate, BaseSumGate,
                                        ExponentiationGate, MulExtensionGate,
                                        PoseidonMdsGate, RandomAccessGate,
                                        ReducingExtensionGate, ReducingGate)
from plonky2_tpu.gates.basic import (ArithmeticGate, ConstantGate, NoopGate,
                                     PublicInputGate)
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.gates.testing import check_gate
from plonky2_tpu.plonk.config import CircuitConfig

CFG = CircuitConfig.standard_recursion_config()

GATES = [
    ArithmeticGate.new_from_config(CFG),
    ConstantGate(CFG.num_constants),
    PublicInputGate(),
    NoopGate(),
    BaseSumGate(16, 2),
    BaseSumGate(8, 4),
    ExponentiationGate(17),
    RandomAccessGate.new_from_config(CFG, 2),
    RandomAccessGate.new_from_config(CFG, 4),
    ReducingGate(21),
    ReducingExtensionGate(12),
    ArithmeticExtensionGate.new_from_config(CFG),
    MulExtensionGate.new_from_config(CFG),
    PoseidonMdsGate(),
    PoseidonGate(),
]


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:40])
def test_gate_properties(gate):
    check_gate(gate)


def test_poseidon_gate_generator_consistency():
    """PoseidonGate constraints vanish on a generator-produced witness and the
    outputs equal the reference permutation."""
    from plonky2_tpu.gates import poseidon_gate as pg
    from plonky2_tpu.hash import poseidon as pos
    from plonky2_tpu.plonk.algebra import EvaluationVars, NumpyBatch

    rng = np.random.default_rng(3)
    P = (1 << 64) - (1 << 32) + 1
    inputs = rng.integers(0, P, size=12, dtype=np.uint64)

    # emulate the generator via a fake witness
    class FakeWitness:
        def __init__(self):
            self.vals = {}

        def get_target(self, t):
            return self.vals[t]

    w = FakeWitness()
    for i in range(12):
        w.vals[("w", 0, pg.wire_input(i))] = int(inputs[i])
    w.vals[("w", 0, pg.WIRE_SWAP)] = 0
    out = []
    pg.PoseidonGenerator(0).run_once(w, out)
    wires = np.zeros(pg.wires_end(), dtype=np.uint64)
    wires[:12] = inputs
    for (_, _, col), v in out:
        wires[col] = v

    expect = pos.poseidon(inputs)
    np.testing.assert_array_equal(wires[12:24], expect)

    alg = NumpyBatch()
    vars = EvaluationVars([], [wires[i] for i in range(len(wires))],
                          [np.uint64(0)] * 4)
    for k, c in enumerate(pg.PoseidonGate().eval_unfiltered(alg, vars)):
        assert int(np.asarray(c)) == 0, f"constraint {k} nonzero on valid witness"


def test_swap_witness():
    """WIRE_SWAP=1 swaps the two input halves before permuting."""
    from plonky2_tpu.gates import poseidon_gate as pg
    from plonky2_tpu.hash import poseidon as pos
    from plonky2_tpu.plonk.algebra import EvaluationVars, NumpyBatch

    rng = np.random.default_rng(4)
    P = (1 << 64) - (1 << 32) + 1
    inputs = rng.integers(0, P, size=12, dtype=np.uint64)

    class FakeWitness:
        vals = {}

        def get_target(self, t):
            return self.vals[t]

    w = FakeWitness()
    for i in range(12):
        w.vals[("w", 0, pg.wire_input(i))] = int(inputs[i])
    w.vals[("w", 0, pg.WIRE_SWAP)] = 1
    out = []
    pg.PoseidonGenerator(0).run_once(w, out)
    wires = np.zeros(pg.wires_end(), dtype=np.uint64)
    wires[:12] = inputs
    wires[pg.WIRE_SWAP] = 1
    for (_, _, col), v in out:
        wires[col] = v

    swapped = inputs.copy()
    swapped[:4], swapped[4:8] = inputs[4:8].copy(), inputs[:4].copy()
    np.testing.assert_array_equal(wires[12:24], pos.poseidon(swapped))

    alg = NumpyBatch()
    vars = EvaluationVars([], [wires[i] for i in range(len(wires))],
                          [np.uint64(0)] * 4)
    for k, c in enumerate(pg.PoseidonGate().eval_unfiltered(alg, vars)):
        assert int(np.asarray(c)) == 0, f"constraint {k} nonzero (swap=1)"


def test_u32_gates_properties():
    from plonky2_tpu.gates.u32_gates import (ComparisonGate, U32AddManyGate,
                                             U32ArithmeticGate,
                                             U32RangeCheckGate,
                                             U32SubtractionGate)
    for gate in [U32ArithmeticGate.new_from_config(CFG),
                 U32AddManyGate.new_from_config(CFG, 11),
                 U32SubtractionGate.new_from_config(CFG),
                 U32RangeCheckGate(4),
                 ComparisonGate(32, 16)]:
        check_gate(gate)


def test_u32_arithmetic_in_circuit():
    """x*y+z with u32 decomposition proves and verifies end-to-end."""
    from plonky2_tpu.gates.u32_gates import U32ArithmeticGate
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.prover import prove
    from tests.test_plonk import fast_test_config

    cfg = fast_test_config()
    b = CircuitBuilder(cfg)
    gate = U32ArithmeticGate.new_from_config(cfg)
    row = b.add_gate(gate, [])
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    z = b.add_virtual_target()
    b.connect(x, ("w", row, gate.wire_ith_multiplicand_0(0)))
    b.connect(y, ("w", row, gate.wire_ith_multiplicand_1(0)))
    b.connect(z, ("w", row, gate.wire_ith_addend(0)))
    # fill remaining ops with zeros
    zero = b.zero()
    for i in range(1, gate.n_ops):
        b.connect(zero, ("w", row, gate.wire_ith_multiplicand_0(i)))
        b.connect(zero, ("w", row, gate.wire_ith_multiplicand_1(i)))
        b.connect(zero, ("w", row, gate.wire_ith_addend(i)))
    lo = ("w", row, gate.wire_ith_output_low_half(0))
    hi = ("w", row, gate.wire_ith_output_high_half(0))
    b.register_public_input(lo)
    b.register_public_input(hi)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 0xDEADBEEF)
    pw.set_target(y, 0xCAFEBABE)
    pw.set_target(z, 0x12345678)
    proof = prove(data.prover_only, data.common, pw, use_device=False)
    full = 0xDEADBEEF * 0xCAFEBABE + 0x12345678
    assert proof.public_inputs == [full & 0xFFFFFFFF, full >> 32]
    data.verify(proof)
