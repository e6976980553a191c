"""Property-based gate test harness (reference gates/gate_testing.rs).

- ``test_low_degree``: evaluate the gate's constraints on LDEs of random
  degree-31 witness polynomials and check the interpolated constraint degree
  is at most 31 * gate.degree().
- ``test_eval_fns``: consistency of the vectorized base-batch evaluation
  (NumpyBatch) against the scalar extension evaluation (ScalarExt) on
  base-field-lifted inputs — the cross-backend analog of the reference's
  eval_unfiltered vs eval_unfiltered_base_batch check.
"""
from __future__ import annotations

import numpy as np

from ..field import fft_numpy as fnp
from ..field import goldilocks as gl
from ..plonk.algebra import EvaluationVars, NumpyBatch, ScalarExt
from ..utils.bits import log2_ceil
from .gate import Gate

WITNESS_SIZE = 1 << 5


def _rand(shape, rng):
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64)


def test_low_degree(gate: Gate, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    rate_bits = log2_ceil(gate.degree() + 1)
    n = WITNESS_SIZE << rate_bits

    def ldes(count):
        if count == 0:
            return np.zeros((0, n), dtype=np.uint64)
        coeffs = _rand((count, WITNESS_SIZE), rng)
        return fnp.fft(fnp.lde(coeffs, rate_bits))

    wires = ldes(gate.num_wires())
    consts = ldes(gate.num_constants())
    pih = _rand((4,), rng)

    alg = NumpyBatch()
    vars = EvaluationVars([consts[i] for i in range(consts.shape[0])],
                          [wires[i] for i in range(wires.shape[0])],
                          [np.uint64(x) for x in pih])
    constraints = gate.eval_unfiltered(alg, vars)
    assert len(constraints) == gate.num_constraints(), (
        f"eval returned {len(constraints)} constraints, "
        f"num_constraints() says {gate.num_constraints()}")

    max_degree = (WITNESS_SIZE - 1) * gate.degree()
    for k, c in enumerate(constraints):
        c = np.broadcast_to(np.asarray(c, dtype=np.uint64), (n,))
        coeffs = fnp.ifft(c.copy())
        # degree = index of last nonzero coefficient
        nz = np.flatnonzero(coeffs)
        deg = int(nz[-1]) if nz.size else 0
        assert deg <= max_degree, (
            f"constraint {k} has degree {deg} > {max_degree} "
            f"(gate degree {gate.degree()})")


def test_eval_fns(gate: Gate, seed: int = 1) -> None:
    rng = np.random.default_rng(seed)
    wires = _rand((max(gate.num_wires(), 1),), rng)
    consts = _rand((max(gate.num_constants(), 1),), rng)
    pih = _rand((4,), rng)

    alg_b = NumpyBatch()
    vars_b = EvaluationVars([consts[i] for i in range(gate.num_constants())],
                            [wires[i] for i in range(gate.num_wires())],
                            [np.uint64(x) for x in pih])
    base_out = [int(np.asarray(c)) for c in gate.eval_unfiltered(alg_b, vars_b)]

    alg_e = ScalarExt()
    vars_e = EvaluationVars([(int(consts[i]), 0) for i in range(gate.num_constants())],
                            [(int(wires[i]), 0) for i in range(gate.num_wires())],
                            [(int(x), 0) for x in pih])
    ext_out = gate.eval_unfiltered(alg_e, vars_e)

    assert len(base_out) == len(ext_out) == gate.num_constraints()
    for k, (b, e) in enumerate(zip(base_out, ext_out)):
        assert e[1] == 0, f"constraint {k} left the base field"
        assert b == e[0], f"constraint {k}: base {b} != ext {e[0]}"


def check_gate(gate: Gate) -> None:
    test_low_degree(gate)
    test_eval_fns(gate)
