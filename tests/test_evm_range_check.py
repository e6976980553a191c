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


# --- full 6-table proof with the range check active ------------------------

def _rc_forged_traces(range_check: bool):
    """6-table execution traces where input0 of the first ADD row is
    rewritten to a NON-CANONICAL limb representation of the same 256-bit
    value: limb0 += 2^16, limb1 -= 1.  The weighted value is unchanged, the
    internal carry-propagating add constraint still holds (t=2^16 is a legal
    carry, add.rs:31-70), and the CTL combined column l0 + 2^16*l1 is
    unchanged — exactly the forgery the reference's no-op
    range_check_error! (utils.rs:10-31) never catches.  The cheating
    prover recomputes its masked + permuted lookup columns."""
    from test_evm_generation import make_kernel

    from plonky2_tpu.evm import all_stark as ast_mod
    from plonky2_tpu.evm.arithmetic import IS_ADD
    from plonky2_tpu.field import goldilocks as gl
    from plonky2_tpu.system_zero.lookup import permuted_cols

    kernel = make_kernel()
    traces = ast_mod.generate_all_traces_with_cpu(kernel,
                                                  range_check=range_check)
    arith = traces[-1]
    row = int(np.nonzero(arith[IS_ADD])[0][0])
    c0, c1 = GENERAL_INPUT_0.start, GENERAL_INPUT_0.start + 1
    arith[c0, row] = (int(arith[c0, row]) + (MASK + 1)) % gl.P
    arith[c1, row] = (int(arith[c1, row]) - 1) % gl.P
    if range_check:
        from plonky2_tpu.evm.arithmetic import CTL_OPS, RC_CHECKED_COLS
        filt = arith[CTL_OPS].sum(axis=0)
        for i, col in enumerate(RC_CHECKED_COLS):
            masked = np.where(filt != 0, arith[col], 0).astype(np.uint64)
            arith[rc_masked_col(i)] = masked
            pi, pt = permuted_cols(masked, arith[RANGE_COUNTER])
            arith[rc_perm_input_col(i)] = pi
            arith[rc_perm_table_col(i)] = pt
    all_stark = ast_mod.make_all_stark_with_cpu(kernel,
                                                range_check=range_check)
    return all_stark, traces


@pytest.mark.heavy
def test_noncanonical_limb_forgery_passes_without_range_check():
    """Documents the hole: without the range check the forged proof
    VERIFIES (matching the reference's behavior at every height)."""
    from plonky2_tpu.evm.prover import prove_all
    from plonky2_tpu.evm.verifier import verify_all_proof
    from plonky2_tpu.stark.config import StarkConfig

    all_stark, traces = _rc_forged_traces(range_check=False)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)


@pytest.mark.heavy
def test_noncanonical_limb_forgery_rejected_with_range_check():
    """The full 6-table proof with range_check=True must reject the
    forgery (the out-of-range masked limb breaks the permuted-column
    lookup even though the cheater recomputed the permutation)."""
    from plonky2_tpu.evm.prover import prove_all
    from plonky2_tpu.evm.verifier import verify_all_proof
    from plonky2_tpu.stark.config import StarkConfig

    all_stark, traces = _rc_forged_traces(range_check=True)
    config = StarkConfig.standard_fast_config()
    with pytest.raises(Exception):
        proof = prove_all(all_stark, config, traces)
        verify_all_proof(all_stark, proof, config)


@pytest.mark.heavy
def test_range_check_full_proof_roundtrip():
    """Untampered 6-table proof with range_check=True proves + verifies."""
    from test_evm_generation import make_kernel

    from plonky2_tpu.evm import all_stark as ast_mod
    from plonky2_tpu.evm.prover import prove_all
    from plonky2_tpu.evm.verifier import verify_all_proof
    from plonky2_tpu.stark.config import StarkConfig

    kernel = make_kernel()
    traces = ast_mod.generate_all_traces_with_cpu(kernel, range_check=True)
    all_stark = ast_mod.make_all_stark_with_cpu(kernel, range_check=True)
    config = StarkConfig.standard_fast_config()
    proof = prove_all(all_stark, config, traces)
    verify_all_proof(all_stark, proof, config)
