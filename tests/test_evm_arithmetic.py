"""Arithmetic STARK: 256-bit add/sub/mul/cmp/modular ops cross-checked
against python-int ground truth, then proved and verified
(reference evm/src/arithmetic/*.rs tests)."""
import random

import numpy as np
import pytest

from plonky2_tpu.evm.arithmetic import (CMP_OUTPUT, DIV_OUTPUT,
                                        GENERAL_INPUT_2, MODULAR_OUTPUT,
                                        ArithmeticStark, Operation,
                                        eval_limbs)
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof

rng = random.Random(0xA217)
U256 = 1 << 256


def r256():
    return rng.randrange(U256)


def output_of(trace, row, op):
    if op.op in ("lt", "gt"):
        return int(trace[CMP_OUTPUT, row])
    if op.op == "div":
        return eval_limbs(trace[list(DIV_OUTPUT), row])
    if op.op in ("addmod", "submod", "mulmod", "mod"):
        return eval_limbs(trace[list(MODULAR_OUTPUT), row])
    return eval_limbs(trace[list(GENERAL_INPUT_2), row])


def mixed_ops():
    m = rng.randrange(1, U256)
    return [
        Operation("add", r256(), r256()),
        Operation("sub", r256(), r256()),
        Operation("mul", r256(), r256()),
        Operation("lt", r256(), r256()),
        Operation("gt", r256(), r256()),
        Operation("addmod", r256(), r256(), m),
        Operation("submod", r256(), r256(), m),
        Operation("mulmod", r256(), r256(), m),
        Operation("mod", r256(), 0, m),
        Operation("div", r256(), 0, m),
        # EVM zero-modulus / zero-denominator semantics: result is 0
        Operation("mod", r256(), 0, 0),
        Operation("div", r256(), 0, 0),
        Operation("mulmod", r256(), r256(), 0),
        # equal inputs: lt and gt both 0
        Operation("lt", 123, 123),
    ]


def test_trace_outputs_match_python_ints():
    stark = ArithmeticStark()
    ops = mixed_ops()
    trace = stark.generate_trace(ops)
    row = 0
    for op in ops:
        assert output_of(trace, row, op) == op.result, op
        row += op.num_rows()


def test_arithmetic_stark_prove_verify():
    stark = ArithmeticStark()
    trace = stark.generate_trace(mixed_ops())
    config = StarkConfig.standard_fast_config()
    proof = prove(stark, config, trace, [])
    verify_stark_proof(stark, proof, config)


@pytest.mark.parametrize("opname,row_off,cols", [
    ("mul", 0, GENERAL_INPUT_2),       # wrong product
    ("mulmod", 0, MODULAR_OUTPUT),     # wrong residue
])
def test_arithmetic_stark_rejects_tampered_output(opname, row_off, cols):
    stark = ArithmeticStark()
    m = rng.randrange(1, U256)
    ops = [Operation(opname, r256(), r256(), m)]
    trace = stark.generate_trace(ops)
    trace[cols.start, row_off] ^= np.uint64(1)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove(stark, config, trace, [])
        verify_stark_proof(stark, proof, config)


def test_rejects_unreduced_modular_output():
    """output >= modulus must be rejected even when congruent."""
    stark = ArithmeticStark()
    m = rng.randrange(1, 1 << 128)
    a, b = r256(), r256()
    trace = stark.generate_trace([Operation("addmod", a, b, m)])
    # shift output by +m (still congruent) and patch quotient down by 1
    from plonky2_tpu.evm import arithmetic as ar
    good = (a + b) % m
    bad = good + m
    assert bad < U256
    for c, v in zip(ar.MODULAR_OUTPUT, ar.to_limbs(bad)):
        trace[c, 0] = v
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove(stark, config, trace, [])
        verify_stark_proof(stark, proof, config)
