"""System Zero unit consistency + end-to-end prove/verify (reference
system_zero/src tests, e.g. alu/division.rs:170-230, system_zero.rs:185-215)."""
import random

import numpy as np
import pytest

import plonky2_tpu.system_zero.registers as R
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.plonk.algebra import ScalarBase
from plonky2_tpu.stark.stark import ConstraintConsumer, StarkEvaluationVars
from plonky2_tpu.system_zero import alu
from plonky2_tpu.system_zero.lookup import permuted_cols
from plonky2_tpu.system_zero.permutation_unit import (eval_permutation_unit,
                                                      generate_permutation_unit)
from plonky2_tpu.system_zero.system_zero import SystemZero

rng = random.Random(0x5150)


def scalar_consumer():
    alg = ScalarBase()
    return alg, ConstraintConsumer(alg, [2, 3, 5], 1, 1, 1)


def rand_row():
    return [rng.randrange(gl.P) for _ in range(R.NUM_COLUMNS)]


def assert_alu_satisfied(row):
    alg, consumer = scalar_consumer()
    alu.eval_alu(alg, row, consumer)
    assert all(acc == 0 for acc in consumer.accumulators())


def clear_flags(row):
    for col in R.ALL_OPERATIONS:
        row[col] = 0


@pytest.mark.parametrize("op,inputs", [
    (R.IS_ADD, [(R.COL_ADD_INPUT_0, 1 << 32), (R.COL_ADD_INPUT_1, 1 << 32),
                (R.COL_ADD_INPUT_2, 1 << 32)]),
    (R.IS_SUB, [(R.COL_SUB_INPUT_0, 1 << 32), (R.COL_SUB_INPUT_1, 1 << 32)]),
    (R.IS_MUL_ADD, [(R.COL_MUL_ADD_FACTOR_0, 1 << 32),
                    (R.COL_MUL_ADD_FACTOR_1, 1 << 32),
                    (R.COL_MUL_ADD_ADDEND, 1 << 32)]),
    (R.IS_DIV, [(R.COL_DIV_INPUT_DIVIDEND, 1 << 32),
                (R.COL_DIV_INPUT_DIVISOR, 1 << 32)]),
])
def test_alu_arith_gen_eval_consistency(op, inputs):
    for trial in range(4):
        row = [0] * R.NUM_COLUMNS
        clear_flags(row)
        row[op] = 1
        for col, bound in inputs:
            row[col] = rng.randrange(bound)
        if op == R.IS_DIV and trial == 0:
            row[R.COL_DIV_INPUT_DIVISOR] = 0  # division-by-zero path
        alu.generate_alu(row)
        assert_alu_satisfied(row)


def test_alu_division_flag_off_garbage_ok():
    # if IS_DIV == 0 the division constraints hold for any garbage values
    alg, consumer = scalar_consumer()
    row = rand_row()
    row[R.IS_DIV] = 0
    alu.eval_division(alg, row, consumer)
    assert all(acc == 0 for acc in consumer.accumulators())


@pytest.mark.parametrize("op", [R.IS_AND, R.IS_IOR, R.IS_XOR, R.IS_ANDNOT])
def test_alu_bitop_gen_eval_consistency(op):
    row = [0] * R.NUM_COLUMNS
    clear_flags(row)
    row[op] = 1
    for regs in [R.COL_BIT_DECOMP_INPUT_A_LO_BIN_REGS,
                 R.COL_BIT_DECOMP_INPUT_A_HI_BIN_REGS,
                 R.COL_BIT_DECOMP_INPUT_B_LO_BIN_REGS,
                 R.COL_BIT_DECOMP_INPUT_B_HI_BIN_REGS]:
        for r in regs:
            row[r] = rng.randrange(2)
    alu.generate_alu(row)
    assert_alu_satisfied(row)


@pytest.mark.parametrize("op", [R.IS_ROTATE_LEFT, R.IS_ROTATE_RIGHT,
                                R.IS_SHIFT_LEFT, R.IS_SHIFT_RIGHT])
def test_alu_rotate_shift_gen_eval_consistency(op):
    for _ in range(4):
        row = [0] * R.NUM_COLUMNS
        clear_flags(row)
        row[op] = 1
        row[R.COL_ROTATE_SHIFT_INPUT_LO] = rng.randrange(1 << 32)
        row[R.COL_ROTATE_SHIFT_INPUT_HI] = rng.randrange(1 << 32)
        for r in R.COL_ROTATE_SHIFT_EXP_BITS:
            row[r] = rng.randrange(2)
        row[R.COL_ROTATE_SHIFT_DELTA_DIV32] = rng.randrange(2)
        alu.generate_rotate_shift(row, op)
        assert_alu_satisfied(row)


def test_rotate_semantics_vs_python():
    # cross-check the rotate witness against python bit twiddling
    row = [0] * R.NUM_COLUMNS
    clear_flags(row)
    row[R.IS_ROTATE_LEFT] = 1
    x = rng.randrange(1 << 64)
    row[R.COL_ROTATE_SHIFT_INPUT_LO] = x & 0xFFFFFFFF
    row[R.COL_ROTATE_SHIFT_INPUT_HI] = x >> 32
    # delta = 13: exp bits = 13, delta_div32 = 0
    for i, r in enumerate(R.COL_ROTATE_SHIFT_EXP_BITS):
        row[r] = (13 >> i) & 1
    alu.generate_rotate_shift(row, R.IS_ROTATE_LEFT)
    expected = ((x << 13) | (x >> 51)) & ((1 << 64) - 1)
    got = (row[R.COL_ROTATE_SHIFT_OUTPUT_1] << 32) | \
        row[R.COL_ROTATE_SHIFT_OUTPUT_0]
    assert got == expected


def test_permutation_unit_matches_poseidon():
    from plonky2_tpu.hash import poseidon as pos
    row = [0] * R.NUM_COLUMNS
    inputs = [rng.randrange(gl.P) for _ in range(12)]
    for i in range(12):
        row[R.col_perm_input(i)] = inputs[i]
    generate_permutation_unit(row)
    expected = pos.poseidon_ints(inputs)
    got = [row[R.col_perm_output(i)] for i in range(12)]
    assert got == expected

    alg, consumer = scalar_consumer()
    vars = StarkEvaluationVars(local_values=row, next_values=row,
                               public_inputs=[0, 0])
    eval_permutation_unit(alg, vars, consumer)
    assert all(acc == 0 for acc in consumer.accumulators())


def test_permuted_cols_lookup_property():
    n = 256
    table = np.array([rng.randrange(1 << 16) for _ in range(n)],
                     dtype=np.uint64)
    inputs = np.array([int(table[rng.randrange(n)]) for _ in range(n)],
                      dtype=np.uint64)
    pi, pt = permuted_cols(inputs, table)
    assert sorted(pi) == sorted(inputs)
    assert sorted(pt) == sorted(table)
    # Halo2 invariant: each permuted input equals the matching permuted table
    # entry or the previous permuted input
    assert pi[0] == pt[0]
    for k in range(1, n):
        assert pi[k] == pt[k] or pi[k] == pi[k - 1]


@pytest.mark.heavy
def test_system_zero_prove_verify():
    from plonky2_tpu.stark.config import StarkConfig
    from plonky2_tpu.stark.prover import prove
    from plonky2_tpu.stark.verifier import verify_stark_proof

    system = SystemZero()
    trace = system.generate_trace()
    config = StarkConfig.standard_fast_config()
    proof = prove(system, config, trace, [0, 0])
    verify_stark_proof(system, proof, config)
