"""PoseidonGate — a full width-12 permutation in one row
(reference plonky2/src/gates/poseidon.rs).

Wire layout: 12 inputs | 12 outputs | swap | 4 deltas | 36 full-round-0 sbox
inputs | 22 partial sbox inputs | 48 full-round-1 sbox inputs = 135 wires.
The S-box inputs follow the FAST partial-round schedule (see
hash/poseidon_schedule.py) so wires match the reference bit-for-bit.
"""
from __future__ import annotations

from ..field import goldilocks as gl
from ..hash import poseidon_schedule as ps
from ..iop.generator import SimpleGenerator
from ..plonk.algebra import ScalarBase
from .gate import Gate

WIDTH = ps.WIDTH
HALF = ps.HALF_N_FULL_ROUNDS
NPR = ps.N_PARTIAL_ROUNDS


def wire_input(i):
    return i


def wire_output(i):
    return WIDTH + i


WIRE_SWAP = 2 * WIDTH
START_DELTA = 2 * WIDTH + 1


def wire_delta(i):
    assert i < 4
    return START_DELTA + i


START_FULL_0 = START_DELTA + 4


def wire_full_sbox_0(round, i):
    assert 0 < round < HALF
    return START_FULL_0 + WIDTH * (round - 1) + i


START_PARTIAL = START_FULL_0 + WIDTH * (HALF - 1)


def wire_partial_sbox(round):
    assert round < NPR
    return START_PARTIAL + round


START_FULL_1 = START_PARTIAL + NPR


def wire_full_sbox_1(round, i):
    assert round < HALF
    return START_FULL_1 + WIDTH * round + i


def wires_end():
    return START_FULL_1 + WIDTH * HALF


class PoseidonGate(Gate):
    def id(self):
        return f"PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH={WIDTH}>"

    def eval_unfiltered(self, alg, vars):
        constraints = []
        w = vars.local_wires

        swap = w[WIRE_SWAP]
        constraints.append(alg.mul(swap, alg.add_const(swap, gl.P - 1)))

        for i in range(4):
            delta_i = w[wire_delta(i)]
            diff = alg.sub(w[wire_input(i + 4)], w[wire_input(i)])
            constraints.append(alg.sub(alg.mul(swap, diff), delta_i))

        state = [None] * WIDTH
        for i in range(4):
            delta_i = w[wire_delta(i)]
            state[i] = alg.add(w[wire_input(i)], delta_i)
            state[i + 4] = alg.sub(w[wire_input(i + 4)], delta_i)
        for i in range(8, WIDTH):
            state[i] = w[wire_input(i)]

        round_ctr = 0
        for r in range(HALF):
            state = ps.constant_layer(alg, state, round_ctr)
            if r != 0:
                for i in range(WIDTH):
                    sbox_in = w[wire_full_sbox_0(r, i)]
                    constraints.append(alg.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = ps.sbox_layer(alg, state)
            state = ps.mds_layer(alg, state)
            round_ctr += 1

        state = ps.partial_first_constant_layer(alg, state)
        state = ps.mds_partial_layer_init(alg, state)
        for r in range(NPR - 1):
            sbox_in = w[wire_partial_sbox(r)]
            constraints.append(alg.sub(state[0], sbox_in))
            s0 = ps.sbox_monomial(alg, sbox_in)
            s0 = alg.add_const(s0, int(ps.FAST_PARTIAL_ROUND_CONSTANTS[r]))
            state = ps.mds_partial_layer_fast(alg, [s0] + state[1:], r)
        sbox_in = w[wire_partial_sbox(NPR - 1)]
        constraints.append(alg.sub(state[0], sbox_in))
        s0 = ps.sbox_monomial(alg, sbox_in)
        state = ps.mds_partial_layer_fast(alg, [s0] + state[1:], NPR - 1)
        round_ctr += NPR

        for r in range(HALF):
            state = ps.constant_layer(alg, state, round_ctr)
            for i in range(WIDTH):
                sbox_in = w[wire_full_sbox_1(r, i)]
                constraints.append(alg.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = ps.sbox_layer(alg, state)
            state = ps.mds_layer(alg, state)
            round_ctr += 1

        for i in range(WIDTH):
            constraints.append(alg.sub(state[i], w[wire_output(i)]))

        return constraints

    def generators(self, row, local_constants):
        return [PoseidonGenerator(row)]

    def num_wires(self):
        return wires_end()

    def num_constants(self):
        return 0

    def degree(self):
        return 7

    def num_constraints(self):
        return 1 + 4 + WIDTH * (HALF - 1) + NPR + WIDTH * HALF + WIDTH


class PoseidonGenerator(SimpleGenerator):
    batch_group = "poseidon"

    def __init__(self, row):
        self.row = row

    def dependencies(self):
        deps = [("w", self.row, wire_input(i)) for i in range(WIDTH)]
        deps.append(("w", self.row, WIRE_SWAP))
        return deps

    def output_targets(self):
        row = self.row
        outs = [("w", row, wire_delta(i)) for i in range(4)]
        for r in range(1, HALF):
            outs += [("w", row, wire_full_sbox_0(r, i)) for i in range(WIDTH)]
        outs += [("w", row, wire_partial_sbox(r)) for r in range(NPR)]
        for r in range(HALF):
            outs += [("w", row, wire_full_sbox_1(r, i)) for i in range(WIDTH)]
        outs += [("w", row, wire_output(i)) for i in range(WIDTH)]
        return outs

    # Keep batches cache-resident: the algebra-generic vectorized rounds
    # below are memory-bound, and per-(G,) temporaries must stay in L2 to
    # run at speed (engine splits larger ready-sets into chunks of this).
    batch_chunk = 1 << 12

    @classmethod
    def run_batch_device(cls, meta, dep):
        """(G, 13) GF dep pair -> (122, G) GF wire pair (device witness
        plan wave; see hash/poseidon_wires_jax.py)."""
        from ..hash.poseidon_wires_jax import poseidon_wire_batch
        return poseidon_wire_batch(dep)

    @classmethod
    def run_batch(cls, gens, dep_vals):
        """All ready Poseidon rows as ONE vectorized numpy permutation —
        the same algebra-generic round functions as run_once, with (G,)
        arrays instead of python ints (SURVEY §6 hard part (g))."""
        import numpy as np

        from ..plonk.algebra import NumpyBatch
        alg = NumpyBatch()
        inputs = [dep_vals[:, i].copy() for i in range(WIDTH)]
        swap = dep_vals[:, WIDTH]
        assert np.all((swap == 0) | (swap == 1))
        cols = []
        for i in range(4):
            cols.append(gl.mul(swap, gl.sub(inputs[i + 4], inputs[i])))
        do_swap = swap == 1
        for i in range(4):
            a, b = inputs[i], inputs[i + 4]
            inputs[i] = np.where(do_swap, b, a)
            inputs[i + 4] = np.where(do_swap, a, b)

        state = list(inputs)
        round_ctr = 0
        for r in range(HALF):
            state = ps.constant_layer(alg, state, round_ctr)
            if r != 0:
                cols.extend(np.broadcast_to(s, swap.shape) for s in state)
            state = ps.sbox_layer(alg, state)
            state = ps.mds_layer(alg, state)
            round_ctr += 1

        state = ps.partial_first_constant_layer(alg, state)
        state = ps.mds_partial_layer_init(alg, state)
        for r in range(NPR - 1):
            cols.append(np.broadcast_to(state[0], swap.shape))
            s0 = ps.sbox_monomial(alg, state[0])
            s0 = alg.add_const(s0, int(ps.FAST_PARTIAL_ROUND_CONSTANTS[r]))
            state = ps.mds_partial_layer_fast(alg, [s0] + state[1:], r)
        cols.append(np.broadcast_to(state[0], swap.shape))
        s0 = ps.sbox_monomial(alg, state[0])
        state = ps.mds_partial_layer_fast(alg, [s0] + state[1:], NPR - 1)
        round_ctr += NPR

        for r in range(HALF):
            state = ps.constant_layer(alg, state, round_ctr)
            cols.extend(np.broadcast_to(s, swap.shape) for s in state)
            state = ps.sbox_layer(alg, state)
            state = ps.mds_layer(alg, state)
            round_ctr += 1

        cols.extend(np.broadcast_to(s, swap.shape) for s in state)
        return np.stack(cols, axis=1)

    def run_once(self, witness, out):
        alg = ScalarBase()
        row = self.row
        w = lambda col: witness.get_target(("w", row, col))  # noqa: E731

        inputs = [w(wire_input(i)) for i in range(WIDTH)]
        swap = w(WIRE_SWAP)
        assert swap in (0, 1)

        for i in range(4):
            delta = swap * (inputs[i + 4] - inputs[i]) % gl.P
            out.append((("w", row, wire_delta(i)), delta))

        if swap == 1:
            for i in range(4):
                inputs[i], inputs[i + 4] = inputs[i + 4], inputs[i]

        state = list(inputs)
        round_ctr = 0
        for r in range(HALF):
            state = ps.constant_layer(alg, state, round_ctr)
            if r != 0:
                for i in range(WIDTH):
                    out.append((("w", row, wire_full_sbox_0(r, i)), state[i]))
            state = ps.sbox_layer(alg, state)
            state = ps.mds_layer(alg, state)
            round_ctr += 1

        state = ps.partial_first_constant_layer(alg, state)
        state = ps.mds_partial_layer_init(alg, state)
        for r in range(NPR - 1):
            out.append((("w", row, wire_partial_sbox(r)), state[0]))
            s0 = ps.sbox_monomial(alg, state[0])
            s0 = alg.add_const(s0, int(ps.FAST_PARTIAL_ROUND_CONSTANTS[r]))
            state = ps.mds_partial_layer_fast(alg, [s0] + state[1:], r)
        out.append((("w", row, wire_partial_sbox(NPR - 1)), state[0]))
        s0 = ps.sbox_monomial(alg, state[0])
        state = ps.mds_partial_layer_fast(alg, [s0] + state[1:], NPR - 1)
        round_ctr += NPR

        for r in range(HALF):
            state = ps.constant_layer(alg, state, round_ctr)
            for i in range(WIDTH):
                out.append((("w", row, wire_full_sbox_1(r, i)), state[i]))
            state = ps.sbox_layer(alg, state)
            state = ps.mds_layer(alg, state)
            round_ctr += 1

        for i in range(WIDTH):
            out.append((("w", row, wire_output(i)), state[i]))
