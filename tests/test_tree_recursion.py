"""Tree recursion: leaf proofs aggregated by a binary node (reference
recursion/tree_recursion.rs)."""
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.recursion import common_data_for_recursion
from plonky2_tpu.plonk.tree_recursion import (check_tree_proof_verifier_data,
                                              set_tree_recursion_leaf_data,
                                              set_tree_recursion_node_data)


def fast_config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=16,
        reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
        num_query_rounds=8))


@pytest.mark.heavy
def test_tree_recursion():
    config = fast_config()
    # inner application proof
    inner_data, inner_pw, _ = build_fibonacci_circuit(config)
    inner_proof = inner_data.prove(inner_pw)

    # shared shape for all tree nodes: needs room for TWO verifiers
    common_data = common_data_for_recursion(config, headroom_num=5,
                                            headroom_den=2)

    # leaf circuit
    b = CircuitBuilder(config)
    leaf_t = b.tree_recursion_leaf(inner_data.common, common_data)
    leaf_data = b.build()

    def leaf_proof():
        pw = PartialWitness()
        set_tree_recursion_leaf_data(pw, leaf_t, inner_proof,
                                     inner_data.verifier_only,
                                     leaf_data.verifier_only)
        proof = leaf_data.prove(pw)
        check_tree_proof_verifier_data(proof, leaf_data.verifier_only,
                                       common_data)
        leaf_data.verify(proof)
        return proof

    p0 = leaf_proof()
    p1 = leaf_proof()

    # node circuit aggregating the two leaves
    b = CircuitBuilder(config)
    node_t = b.tree_recursion_node(common_data)
    node_data = b.build()
    pw = PartialWitness()
    set_tree_recursion_node_data(pw, node_t, p0, p1, node_data.verifier_only)
    root = node_data.prove(pw)
    check_tree_proof_verifier_data(root, node_data.verifier_only, common_data)
    node_data.verify(root)
