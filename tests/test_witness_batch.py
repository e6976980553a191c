"""Batched witness generation must reproduce the scalar queue exactly."""
import os

import numpy as np
import pytest

from plonky2_tpu.iop.generator import (_generate_scalar,
                                       generate_partial_witness)
from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
from plonky2_tpu.models.hash_tree import build_hash_tree_circuit
from tests.test_plonk import fast_test_config


@pytest.mark.parametrize("case", ["fibonacci", "hash_tree"])
def test_batched_matches_scalar(case, monkeypatch):
    # pin unconstrained-wire randomness to a per-target value so both
    # engines see identical "random" draws
    from plonky2_tpu.iop import generator as gen_mod

    def fake_run_once(self, witness, out):
        out.append((self.target, (1234567 + 31 * abs(hash(self.target)))
                    % ((1 << 64) - (1 << 32) + 1)))

    monkeypatch.setattr(gen_mod.RandomValueGenerator, "run_once",
                        fake_run_once)
    if case == "fibonacci":
        data, pw, _ = build_fibonacci_circuit(fast_test_config())
    else:
        data, pw, _ = build_hash_tree_circuit(fast_test_config(), 3)
    scalar = _generate_scalar(pw, data.prover_only, data.common)
    batched = generate_partial_witness(pw, data.prover_only, data.common)
    np.testing.assert_array_equal(scalar.is_set, batched.is_set)
    np.testing.assert_array_equal(scalar.values[scalar.is_set],
                                  batched.values[batched.is_set])


def test_hash_tree_proof_end_to_end():
    data, pw, root = build_hash_tree_circuit(fast_test_config(), 3)
    proof = data.prove(pw)
    assert proof.public_inputs == root
    data.verify(proof)
