"""Multi-table STARK prover with cross-table lookups: a requester table's
filtered rows must appear in the logic table (reference evm/src architecture;
the requester stands in for the CPU table's logic channel)."""
import random

import numpy as np
import pytest

from plonky2_tpu.evm.cross_table_lookup import (Column, CrossTableLookup,
                                                TableWithColumns)
from plonky2_tpu.evm.logic import LogicStark, Operation
from plonky2_tpu.evm import logic
from plonky2_tpu.evm.prover import AllStark, prove_all
from plonky2_tpu.evm.verifier import EvmVerificationError, verify_all_proof
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.stark import Stark

rng = random.Random(0xE7A)

# requester table layout: filter + op flags + packed operands/results
REQ_FILTER = 0
REQ_IS_AND = 1
REQ_IS_OR = 2
REQ_IS_XOR = 3
REQ_IN0 = range(4, 12)
REQ_IN1 = range(12, 20)
REQ_RESULT = range(20, 28)
REQ_COLUMNS = 28


class RequesterStark(Stark):
    """Toy stand-in for the CPU table's logic-request channel."""

    COLUMNS = REQ_COLUMNS
    PUBLIC_INPUTS = 0

    def eval(self, alg, vars, yield_constr) -> None:
        lv = vars.local_values
        for col in (REQ_FILTER, REQ_IS_AND, REQ_IS_OR, REQ_IS_XOR):
            b = lv[col]
            yield_constr.constraint(alg.sub(alg.mul(b, b), b))

    def constraint_degree(self) -> int:
        # CTL check constraints are degree 3 (Z * filter-select * combine),
        # so every table participating in CTLs reports at least 3
        return 3


def requester_trace(ops, n_rows: int) -> np.ndarray:
    trace = np.zeros((REQ_COLUMNS, n_rows), dtype=np.uint64)
    for j, op in enumerate(ops):
        trace[REQ_FILTER, j] = 1
        trace[{"and": REQ_IS_AND, "or": REQ_IS_OR,
               "xor": REQ_IS_XOR}[op.operator], j] = 1
        for i in range(8):
            trace[REQ_IN0.start + i, j] = (op.input0 >> (32 * i)) & 0xFFFFFFFF
            trace[REQ_IN1.start + i, j] = (op.input1 >> (32 * i)) & 0xFFFFFFFF
            trace[REQ_RESULT.start + i, j] = \
                (op.result >> (32 * i)) & 0xFFFFFFFF
    return trace


def ctl_logic() -> CrossTableLookup:
    requester_cols = (Column.singles([REQ_IS_AND, REQ_IS_OR, REQ_IS_XOR])
                      + Column.singles(REQ_IN0) + Column.singles(REQ_IN1)
                      + Column.singles(REQ_RESULT))
    looking = TableWithColumns(table=0, columns=requester_cols,
                               filter_column=Column.single(REQ_FILTER))
    looked = TableWithColumns(table=1, columns=logic.ctl_data(),
                              filter_column=logic.ctl_filter())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def build_system(ops):
    all_stark = AllStark(starks=[RequesterStark(), LogicStark()],
                         cross_table_lookups=[ctl_logic()])
    req_trace = requester_trace(ops, 8)
    logic_trace = LogicStark().generate_trace(ops, min_rows=8)
    return all_stark, [req_trace, logic_trace]


def rand_ops(n):
    return [Operation(operator=rng.choice(["and", "or", "xor"]),
                      input0=rng.randrange(1 << 256),
                      input1=rng.randrange(1 << 256)) for _ in range(n)]


def test_evm_ctl_prove_verify():
    ops = rand_ops(5)
    all_stark, traces = build_system(ops)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)


def test_evm_ctl_rejects_mismatched_tables():
    ops = rand_ops(4)
    all_stark, traces = build_system(ops)
    # corrupt one requested result limb: the looking multiset no longer
    # matches the looked table, so the grand products must disagree
    traces[0][REQ_RESULT.start, 0] = \
        (int(traces[0][REQ_RESULT.start, 0]) + 1) % ((1 << 64) - (1 << 32) + 1)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove_all(all_stark, config, traces)
        verify_all_proof(all_stark, proof, config)
