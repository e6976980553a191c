"""Cyclic (IVC) recursion: a circuit that verifies proofs of itself builds a
hash chain (reference recursion/cyclic_recursion.rs:238-349 test).  Uses a
reduced FRI query count to keep the recursion circuit small for CI."""
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.hash import poseidon as pos
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.recursion import (check_cyclic_proof_verifier_data,
                                         common_data_for_recursion,
                                         cyclic_base_proof)

import numpy as np


def fast_recursion_config() -> CircuitConfig:
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=16,
        reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
        num_query_rounds=8))


def iterate_poseidon(initial, n):
    cur = list(initial)
    for _ in range(n):
        cur = list(pos.hash_no_pad(np.array(cur, dtype=np.uint64)))
    return [int(x) for x in cur]


@pytest.mark.heavy
def test_cyclic_recursion_hash_chain():
    config = fast_recursion_config()
    b = CircuitBuilder(config)
    one = b.one()

    # Circuit computing a repeated hash; public inputs:
    # initial hash (4) | chain tip (4) | chain length (1) | cyclic VK
    initial_hash = b.add_virtual_hash()
    b.register_public_inputs(initial_hash)
    current_hash_in = b.add_virtual_hash()
    current_hash_out = b.hash_n_to_hash_no_pad(list(current_hash_in))
    b.register_public_inputs(current_hash_out)
    counter = b.add_virtual_public_input()

    # tight headroom keeps the test at degree 2^12 instead of 2^13
    common_data = common_data_for_recursion(config, headroom_num=9,
                                            headroom_den=8)
    verifier_data_target = b.add_verifier_data_public_inputs()
    common_data.num_public_inputs = b.num_public_inputs()

    condition = b.add_virtual_bool_target_safe()

    inner_cyclic_pwp = b.add_virtual_proof_with_pis(common_data)
    inner_pis = inner_cyclic_pwp.public_inputs
    inner_initial_hash = tuple(inner_pis[0:4])
    inner_latest_hash = tuple(inner_pis[4:8])
    inner_counter = inner_pis[8]

    b.connect_hashes(initial_hash, inner_initial_hash)
    actual_hash_in = b.select_hash(condition, inner_latest_hash, initial_hash)
    b.connect_hashes(current_hash_in, actual_hash_in)
    new_counter = b.mul_add(condition, inner_counter, one)
    b.connect(counter, new_counter)

    b.conditionally_verify_cyclic_proof_or_dummy(condition, inner_cyclic_pwp,
                                                 common_data)
    cyclic_data = b.build()

    # base case
    pw = PartialWitness()
    initial = [0, 1, 2, 3]
    pw.set_target(condition, 0)
    pw.set_proof_with_pis_target(
        inner_cyclic_pwp,
        cyclic_base_proof(common_data, cyclic_data.verifier_only,
                          dict(enumerate(initial))))
    pw.set_verifier_data_target(verifier_data_target,
                                cyclic_data.verifier_only)
    proof = cyclic_data.prove(pw)
    check_cyclic_proof_verifier_data(proof, cyclic_data.verifier_only,
                                     cyclic_data.common)
    cyclic_data.verify(proof)

    # one recursive layer
    pw = PartialWitness()
    pw.set_target(condition, 1)
    pw.set_proof_with_pis_target(inner_cyclic_pwp, proof)
    pw.set_verifier_data_target(verifier_data_target,
                                cyclic_data.verifier_only)
    proof = cyclic_data.prove(pw)
    check_cyclic_proof_verifier_data(proof, cyclic_data.verifier_only,
                                     cyclic_data.common)
    cyclic_data.verify(proof)

    # the chain state must equal the iterated hash
    assert [int(x) for x in proof.public_inputs[0:4]] == initial
    counter_val = int(proof.public_inputs[8])
    assert counter_val == 2
    assert [int(x) for x in proof.public_inputs[4:8]] == \
        iterate_poseidon(initial, counter_val)
