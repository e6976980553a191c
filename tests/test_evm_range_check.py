"""16-bit range-check lookups on the arithmetic table's CTL-bound limbs
(closes the reference's no-op range_check_error!, utils.rs:10-31)."""
import numpy as np
import pytest

from plonky2_tpu.evm.arithmetic import (GENERAL_INPUT_0, MASK,
                                        NUM_RC_CHECKED, RANGE_COUNTER,
                                        RC_MIN_ROWS, ArithmeticStark,
                                        Operation, rc_masked_col,
                                        rc_perm_input_col,
                                        rc_perm_table_col)
from plonky2_tpu.stark.testing import trace_constraint_violations


def _ops():
    rng = np.random.default_rng(3)
    U256 = (1 << 256) - 1
    ops = []
    for _ in range(20):
        a = int(rng.integers(0, 1 << 63)) | (int(rng.integers(0, 1 << 63)) << 150)
        b = 1 + (int(rng.integers(0, 1 << 63))
                 | (int(rng.integers(0, 1 << 63)) << 63)
                 | (int(rng.integers(0, 1 << 62)) << 126))
        ops.append(Operation("add", a, b))
        ops.append(Operation("mul", a, b))
        ops.append(Operation("lt", a, b))
    return ops


@pytest.fixture(scope="module")
def rc_trace():
    stark = ArithmeticStark(range_check=True)
    trace = stark.generate_trace(_ops(), min_rows=RC_MIN_ROWS)
    return stark, trace


@pytest.mark.slow
def test_range_checked_trace_satisfies_constraints(rc_trace):
    stark, trace = rc_trace
    assert trace.shape == (stark.COLUMNS, RC_MIN_ROWS)
    assert trace[RANGE_COUNTER, -1] == MASK
    assert len(stark.permutation_pairs()) == 2 * NUM_RC_CHECKED
    assert trace_constraint_violations(stark, trace) == []
    # permuted columns really are permutations of their sources
    np.testing.assert_array_equal(
        np.sort(trace[rc_masked_col(0)]),
        np.sort(trace[rc_perm_input_col(0)]))
    np.testing.assert_array_equal(
        np.sort(trace[RANGE_COUNTER]),
        np.sort(trace[rc_perm_table_col(0)]))


@pytest.mark.slow
def test_out_of_range_limb_rejected(rc_trace):
    """A 17-bit limb smuggled into a CTL-bound column must violate the
    lookup even when the cheating prover recomputes its permuted columns."""
    from plonky2_tpu.system_zero.lookup import permuted_cols
    stark, trace = rc_trace
    bad = trace.copy()
    col = GENERAL_INPUT_0.start
    row = 0                       # an add row
    assert bad[col, row] <= MASK
    bad[col, row] = MASK + 1      # 2^16: out of range, CTL value changes
    i = 0                         # checked-col index of GENERAL_INPUT_0[0]
    filt = bad[[0, 1, 2, 8, 9]].sum(axis=0)
    bad[rc_masked_col(i)] = np.where(filt != 0, bad[col], 0)
    pi, pt = permuted_cols(bad[rc_masked_col(i)], bad[RANGE_COUNTER])
    bad[rc_perm_input_col(i)] = pi
    bad[rc_perm_table_col(i)] = pt
    violations = trace_constraint_violations(stark, bad)
    assert violations, "out-of-range limb was not caught"
