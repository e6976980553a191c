"""Device witness plan (iop/device_witness.py): the full generator fixpoint
compiled as one jitted program must reproduce the host engine's witness
bit-for-bit, and the resulting proof must be byte-identical to the host
proof for plan-eligible circuits."""
import numpy as np
import pytest

from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.iop.device_witness import build_plan, get_plan
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.models.hash_tree import build_hash_tree_circuit
from plonky2_tpu.plonk.config import CircuitConfig


@pytest.fixture(scope="module")
def tree():
    config = CircuitConfig.wide_ecc_config()
    data, pw, root = build_hash_tree_circuit(config, 3)
    return data, pw, root


@pytest.fixture()
def pinned_random(monkeypatch):
    """Pin RandomValueGenerator to a per-target deterministic value so host
    and device paths agree regardless of draw order."""
    import plonky2_tpu.iop.generator as gen_mod
    from plonky2_tpu.field import goldilocks as gl

    def run_once(self, witness, out):
        out.append((self.target, hash(self.target) % gl.P))

    monkeypatch.setattr(gen_mod.RandomValueGenerator, "run_once", run_once)


def test_plan_witness_matches_host_engine(tree, pinned_random):
    data, pw, _ = tree
    plan = build_plan(data.prover_only, data.common, pw)
    assert plan is not None, "hash-tree circuit should be plan-eligible"

    wires_pair, pis = plan.run(pw)
    dev_wires = gf.to_u64((np.asarray(wires_pair[0]),
                           np.asarray(wires_pair[1])))

    host = generate_partial_witness(pw, data.prover_only, data.common)
    host_wires = host.full_witness()
    np.testing.assert_array_equal(dev_wires, host_wires)
    assert pis == host.get_targets(data.prover_only.public_inputs)


def test_plan_proof_verifies_and_matches_host(tree, pinned_random):
    data, pw, root = tree
    from plonky2_tpu.plonk.prover import prove
    from plonky2_tpu.utils.serialization import serialize_proof

    host_proof = prove(data.prover_only, data.common, pw, use_device=False)
    data.verify(host_proof)

    dev_proof = prove(data.prover_only, data.common, pw, use_device=True)
    data.verify(dev_proof)
    assert dev_proof.public_inputs == root
    assert serialize_proof(dev_proof) == serialize_proof(host_proof)
    # the device path must actually have used the plan
    assert getattr(data.prover_only, "_device_witness_plan", None) is not None


def test_plan_rejects_changed_target_set(tree):
    data, pw, _ = tree
    from plonky2_tpu.iop.device_witness import _PlanMismatch
    from plonky2_tpu.iop.witness import PartialWitness

    plan = get_plan(data.prover_only, data.common, pw)
    assert plan is not None
    other = PartialWitness()
    items = list(pw.target_values.items())
    for t, v in items[:-1]:   # drop one target -> different key set
        other.set_target(t, v)
    with pytest.raises(_PlanMismatch):
        plan.run(other)


def _small_zk_circuit():
    from dataclasses import replace

    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy

    # few FRI queries: zk blinding adds ~num_queries*(folding points +
    # final coeffs) RandomValueGenerator rows (circuit_builder.py:312-325);
    # at the standard 28 queries even a k=2 tree pads to 2^14 rows — far
    # too heavy for a CPU unit test
    small_fri = FriConfig(
        rate_bits=3, cap_height=2, proof_of_work_bits=4,
        reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
        num_query_rounds=4)
    config = replace(CircuitConfig.wide_ecc_config(), zero_knowledge=True,
                     fri_config=small_fri)
    return build_hash_tree_circuit(config, 2)


def test_zk_circuit_plan_matches_host_engine(pinned_random):
    """zk circuits add dep-free RandomValueGenerators (blinding rows) —
    still plan-eligible; the per-proof host-drawn randomness joins the
    input upload and the device fixpoint reproduces the host witness."""
    data, pw, root = _small_zk_circuit()
    plan = build_plan(data.prover_only, data.common, pw)
    assert plan is not None
    assert plan._prefix_gens, "zk circuit should have RandomValueGenerators"
    wires_pair, pis = plan.run(pw)
    dev_wires = gf.to_u64((np.asarray(wires_pair[0]),
                           np.asarray(wires_pair[1])))
    host = generate_partial_witness(pw, data.prover_only, data.common)
    np.testing.assert_array_equal(dev_wires, host.full_witness())
    assert pis == host.get_targets(data.prover_only.public_inputs)


@pytest.mark.heavy
def test_zk_circuit_plan_proof_verifies():
    """Full zk proof through the device path (plan witness + salted
    commits); heavy: compiles the whole prover pipeline at a fresh
    zk shape."""
    data, pw, root = _small_zk_circuit()
    from plonky2_tpu.plonk.prover import prove
    proof = prove(data.prover_only, data.common, pw, use_device=True)
    data.verify(proof)
    assert proof.public_inputs == root


def _conflicting_circuit(a_val, b_val):
    """Two mul generators whose outputs are `connect`ed into one copy class:
    both write the same representative slot — equal values are a legal
    duplicate, unequal values are a genuine generator conflict."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder

    from test_plonk import fast_test_config

    builder = CircuitBuilder(fast_test_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    c1 = builder.mul(a, a)
    c2 = builder.mul(b, b)
    builder.connect(c1, c2)
    builder.register_public_input(c1)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, a_val)
    pw.set_target(b, b_val)
    return data, pw


def test_multi_writer_circuit_refuses_device_plan():
    """Structural multi-writer slots make last-write-wins unsafe: the plan
    must refuse (conflict-free-by-construction guarantee)."""
    data, pw = _conflicting_circuit(2, 2)
    assert build_plan(data.prover_only, data.common, pw) is None


def test_conflicting_writes_fail_loudly_on_both_engines():
    data, pw = _conflicting_circuit(2, 3)   # 4 != 9: genuine conflict
    with pytest.raises((ValueError, AssertionError)):
        generate_partial_witness(pw, data.prover_only, data.common)
    # device path: plan refused -> host engine fallback -> same loud error
    from plonky2_tpu.plonk.prover import prove
    with pytest.raises((ValueError, AssertionError)):
        prove(data.prover_only, data.common, pw, use_device=True)


def test_equal_duplicate_writes_still_prove_via_host_fallback():
    data, pw = _conflicting_circuit(2, 2)   # 4 == 4: legal duplicate
    host = generate_partial_witness(pw, data.prover_only, data.common)
    assert host.get_targets(data.prover_only.public_inputs) == [4]
