"""Constraint-program compiler — the TPU answer to the reference's hand-written
CUDA quotient kernel (cuda/plonky2_gpu_impl.cuh:486-878).

The reference bakes one circuit's gate constraints into a 400-line CUDA kernel.
Round-1 of this framework traced every gate's algebra straight into jnp
primitives, which XLA-compiled for tens of minutes per circuit shape (a single
Goldilocks mul is ~60 u32 primitives; a Poseidon gate is thousands of muls).

This module fixes that structurally: gate constraints are traced ONCE into a
small static *constraint program* — a register machine over Goldilocks vectors
— and the device executes a compact `lax.scan` interpreter whose XLA graph is
O(1) in circuit size (one scan body with 8 opcode branches).  Compile time is
seconds regardless of the circuit; the op stream is data, not code.

Pipeline:
  trace (ExprAlgebra)  ->  CSE + constant folding  ->  dead-code elim
  ->  mul-add fusion   ->  wave scheduling (W-wide same-opcode waves)
  ->  linear-scan register allocation  ->  (numpy | jax) execution

Scalar values (challenges beta/gamma/alpha, public-inputs hash, gate
constants) never enter the device program: any subexpression involving only
scalars is evaluated host-side per proof and shipped as a tiny scalar bank.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..field import goldilocks as gl

# vector-op ISA: every op writes one full-width register
ADD = 0       # r[d] = r[a] + r[b]
SUB = 1       # r[d] = r[a] - r[b]
MUL = 2       # r[d] = r[a] * r[b]
ADDS = 3      # r[d] = r[a] + s[b]
SUBS = 4      # r[d] = s[b] - r[a]
MULS = 5      # r[d] = r[a] * s[b]
MULADD = 6    # r[d] = r[a] * r[b] + r[c]
MULADDS = 7   # r[d] = r[a] * s[b] + r[c]

N_OPCODES = 8
OP_NAMES = ["add", "sub", "mul", "adds", "subs", "muls", "muladd", "muladds"]


class EV:
    """Expression value handle: ('v', id) vector or ('s', id) scalar."""
    __slots__ = ("kind", "id")

    def __init__(self, kind: str, id_: int):
        self.kind = kind
        self.id = id_


class ProgramBuilder:
    """Hash-consed expression graph over vector inputs + host scalars."""

    def __init__(self):
        # scalar nodes: ('k', value) | ('in', slot) | (op, a_sid, b_sid)
        self.snodes: List[tuple] = []
        self._scse: Dict[tuple, int] = {}
        self.n_scalar_inputs = 0
        # vector nodes: inputs ('in', idx) or ops (opcode, x, y) where
        # x is a vector id and y is a vector id (ADD/SUB/MUL) or scalar id
        # (ADDS/SUBS/MULS)
        self.vnodes: List[tuple] = []
        self._vcse: Dict[tuple, int] = {}
        self.n_vector_inputs = 0
        self.outputs: List[EV] = []

    # -- scalar graph ------------------------------------------------------

    def _snode(self, rec: tuple) -> int:
        sid = self._scse.get(rec)
        if sid is None:
            sid = len(self.snodes)
            self.snodes.append(rec)
            self._scse[rec] = sid
        return sid

    def sc_known(self, value: int) -> EV:
        return EV("s", self._snode(("k", value % gl.P)))

    def scalar_input(self) -> EV:
        slot = self.n_scalar_inputs
        self.n_scalar_inputs += 1
        return EV("s", self._snode(("in", slot)))

    def _sval(self, sid: int) -> Optional[int]:
        rec = self.snodes[sid]
        return rec[1] if rec[0] == "k" else None

    def _sop(self, op: str, a: int, b: int) -> int:
        va, vb = self._sval(a), self._sval(b)
        if va is not None and vb is not None:
            if op == "add":
                return self._snode(("k", (va + vb) % gl.P))
            if op == "sub":
                return self._snode(("k", (va - vb) % gl.P))
            if op == "mul":
                return self._snode(("k", (va * vb) % gl.P))
        if op in ("add", "mul") and a > b:
            a, b = b, a
        return self._snode((op, a, b))

    def _sneg(self, sid: int) -> int:
        return self._sop("sub", self._snode(("k", 0)), sid)

    # -- vector graph ------------------------------------------------------

    def vector_input(self) -> EV:
        vid = len(self.vnodes)
        self.vnodes.append(("in", self.n_vector_inputs, None))
        self.n_vector_inputs += 1
        return EV("v", vid)

    def _vnode(self, op: int, x: int, y: int) -> EV:
        if op in (ADD, MUL) and x > y:
            x, y = y, x
        key = (op, x, y)
        vid = self._vcse.get(key)
        if vid is None:
            vid = len(self.vnodes)
            self.vnodes.append(key)
            self._vcse[key] = vid
        return EV("v", vid)

    # -- public algebra ----------------------------------------------------

    def add(self, a: EV, b: EV) -> EV:
        if a.kind == "s" and b.kind == "s":
            return EV("s", self._sop("add", a.id, b.id))
        if a.kind == "s":
            a, b = b, a
        if b.kind == "s":
            if self._sval(b.id) == 0:
                return a
            return self._vnode(ADDS, a.id, b.id)
        return self._vnode(ADD, a.id, b.id)

    def sub(self, a: EV, b: EV) -> EV:
        if a.kind == "s" and b.kind == "s":
            return EV("s", self._sop("sub", a.id, b.id))
        if b.kind == "s":
            if self._sval(b.id) == 0:
                return a
            return self._vnode(ADDS, a.id, self._sneg(b.id))
        if a.kind == "s":
            return self._vnode(SUBS, b.id, a.id)
        if a.id == b.id:
            return self.sc_known(0)
        return self._vnode(SUB, a.id, b.id)

    def mul(self, a: EV, b: EV) -> EV:
        if a.kind == "s" and b.kind == "s":
            return EV("s", self._sop("mul", a.id, b.id))
        if a.kind == "s":
            a, b = b, a
        if b.kind == "s":
            v = self._sval(b.id)
            if v == 0:
                return self.sc_known(0)
            if v == 1:
                return a
            return self._vnode(MULS, a.id, b.id)
        return self._vnode(MUL, a.id, b.id)

    def mark_output(self, ev: EV) -> None:
        self.outputs.append(ev)

    # -- compilation -------------------------------------------------------

    def compile(self, wave_width: int = 16) -> "ConstraintProgram":
        for ev in self.outputs:
            if ev.kind == "s":
                raise ValueError("scalar outputs unsupported; vectorize first")
        out_ids = [ev.id for ev in self.outputs]

        # dead-code elimination: mark live vector nodes from the outputs
        live = np.zeros(len(self.vnodes), dtype=bool)
        stack = list(out_ids)
        while stack:
            vid = stack.pop()
            if live[vid]:
                continue
            live[vid] = True
            op, x, y = self.vnodes[vid]
            if op == "in":
                continue
            stack.append(x)
            if op in (ADD, SUB, MUL):
                stack.append(y)

        # vector-operand use counts among live nodes
        uses = np.zeros(len(self.vnodes), dtype=np.int64)
        for vid in range(len(self.vnodes)):
            if not live[vid]:
                continue
            op, x, y = self.vnodes[vid]
            if op == "in":
                continue
            uses[x] += 1
            if op in (ADD, SUB, MUL):
                uses[y] += 1
        for vid in out_ids:
            uses[vid] += 1

        # mul-add fusion: ADD(m, c) with m a single-use MUL/MULS
        out_set = set(out_ids)
        fused_into: Dict[int, tuple] = {}   # add-node vid -> fused op record
        consumed = np.zeros(len(self.vnodes), dtype=bool)
        for vid in range(len(self.vnodes)):
            if not live[vid]:
                continue
            op, x, y = self.vnodes[vid]
            if op != ADD:
                continue
            for m, other in ((x, y), (y, x)):
                mop, mx, my = self.vnodes[m]
                if (mop in (MUL, MULS) and uses[m] == 1 and m not in out_set
                        and not consumed[m]):
                    code = MULADD if mop == MUL else MULADDS
                    fused_into[vid] = (code, mx, my, other)
                    consumed[m] = True
                    break

        # emit linear op list in topo (creation) order
        ops: List[tuple] = []            # (opcode, dst_vid, a, b, c)
        for vid in range(len(self.vnodes)):
            if not live[vid] or consumed[vid]:
                continue
            op, x, y = self.vnodes[vid]
            if op == "in":
                continue
            if vid in fused_into:
                ops.append((fused_into[vid][0], vid) + fused_into[vid][1:])
            elif op in (ADD, SUB, MUL, MULS):
                ops.append((op, vid, x, y, 0))
            elif op in (ADDS, SUBS):
                ops.append((op, vid, x, y, 0))
            else:  # pragma: no cover
                raise AssertionError(op)

        waves = _schedule_waves(self, ops, wave_width)
        return _allocate(self, ops, waves, out_ids, wave_width)


def _operand_vids(builder: ProgramBuilder, op: tuple) -> List[int]:
    code, _dst, a, b, c = op
    if code in (MULADD,):
        return [a, b, c]
    if code in (MULADDS,):
        return [a, c]
    if code in (ADD, SUB, MUL):
        return [a, b]
    return [a]          # ADDS, SUBS, MULS


def _schedule_waves(builder: ProgramBuilder, ops: List[tuple],
                    W: int) -> List[List[int]]:
    """Greedy list scheduling into same-opcode waves of width <= W.

    An op may run in a wave only if all its operands were defined by inputs
    or by strictly earlier waves (the executor reads all operands before any
    write of the wave)."""
    n = len(ops)
    defop: Dict[int, int] = {op[1]: i for i, op in enumerate(ops)}
    indeg = np.zeros(n, dtype=np.int64)
    dependents: List[List[int]] = [[] for _ in range(n)]
    for i, op in enumerate(ops):
        for v in _operand_vids(builder, op):
            j = defop.get(v)
            if j is not None:
                indeg[i] += 1
                dependents[j].append(i)

    ready: List[List[int]] = [[] for _ in range(N_OPCODES)]
    n_ready = 0
    for i in range(n):
        if indeg[i] == 0:
            ready[ops[i][0]].append(i)
            n_ready += 1

    waves: List[List[int]] = []
    done = 0
    while done < n:
        assert n_ready > 0, "cycle in constraint program"
        code = max(range(N_OPCODES), key=lambda c: len(ready[c]))
        take = ready[code][:W]
        ready[code] = ready[code][W:]
        n_ready -= len(take)
        waves.append(take)
        done += len(take)
        for i in take:            # release dependents after the wave
            for j in dependents[i]:
                indeg[j] -= 1
                if indeg[j] == 0:
                    ready[ops[j][0]].append(j)
                    n_ready += 1
    return waves


@dataclass
class ConstraintProgram:
    """Compiled register-machine program (see module docstring)."""
    n_inputs: int                   # vector inputs occupy regs [0, n_inputs)
    n_regs: int                     # register file height (incl. dump reg)
    wave_width: int
    wave_opcodes: np.ndarray        # (n_waves,)   int32
    wave_dst: np.ndarray            # (n_waves, W) int32
    wave_a: np.ndarray              # (n_waves, W) int32
    wave_b: np.ndarray              # (n_waves, W) int32  (reg or scalar-bank)
    wave_c: np.ndarray              # (n_waves, W) int32
    out_regs: np.ndarray            # (n_outputs,) int32
    snodes: List[tuple]             # host scalar tape
    bank_sids: List[int]            # scalar-bank slot -> scalar node id
    n_scalar_inputs: int
    n_ops: int

    # -- host scalar bank --------------------------------------------------

    def scalar_bank(self, scalar_inputs: List[int]) -> np.ndarray:
        """Evaluate the scalar tape; returns (bank_size,) uint64."""
        assert len(scalar_inputs) == self.n_scalar_inputs
        vals: List[int] = []
        for rec in self.snodes:
            op = rec[0]
            if op == "k":
                vals.append(rec[1])
            elif op == "in":
                vals.append(scalar_inputs[rec[1]] % gl.P)
            elif op == "add":
                vals.append((vals[rec[1]] + vals[rec[2]]) % gl.P)
            elif op == "sub":
                vals.append((vals[rec[1]] - vals[rec[2]]) % gl.P)
            elif op == "mul":
                vals.append((vals[rec[1]] * vals[rec[2]]) % gl.P)
            else:  # pragma: no cover
                raise AssertionError(op)
        bank = [vals[sid] for sid in self.bank_sids]
        if not bank:
            bank = [0]
        return np.array(bank, dtype=np.uint64)

    # -- numpy oracle executor (tests / debugging) -------------------------

    def run_numpy(self, inputs: np.ndarray,
                  scalar_inputs: List[int]) -> np.ndarray:
        """inputs: (n_inputs, C) uint64 -> (n_outputs, C) uint64."""
        C = inputs.shape[-1]
        bank = self.scalar_bank(scalar_inputs)
        regs = np.zeros((self.n_regs, C), dtype=np.uint64)
        regs[:self.n_inputs] = inputs
        for w in range(self.wave_opcodes.shape[0]):
            code = int(self.wave_opcodes[w])
            d = self.wave_dst[w]
            a, b, c = self.wave_a[w], self.wave_b[w], self.wave_c[w]
            ra = regs[a]
            if code == ADD:
                out = gl.add(ra, regs[b])
            elif code == SUB:
                out = gl.sub(ra, regs[b])
            elif code == MUL:
                out = gl.mul(ra, regs[b])
            elif code == ADDS:
                out = gl.add(ra, bank[b][:, None])
            elif code == SUBS:
                out = gl.sub(bank[b][:, None], ra)
            elif code == MULS:
                out = gl.mul(ra, bank[b][:, None])
            elif code == MULADD:
                out = gl.add(gl.mul(ra, regs[b]), regs[c])
            elif code == MULADDS:
                out = gl.add(gl.mul(ra, bank[b][:, None]), regs[c])
            else:  # pragma: no cover
                raise AssertionError(code)
            regs[d] = out                      # dup dump-reg writes: last wins
        return regs[self.out_regs]

    # -- jax executor ------------------------------------------------------

    def jax_chunk_runner(self):
        """Returns fn(regs_init (R,2,C) u32, bank (S,2) u32) -> (n_out,2,C).

        A lax.scan over the wave stream with a BRANCHLESS universal step —
        the XLA graph is constant-size no matter how large the circuit is.
        Measured on a v5e at the flagship program (396 waves x 16 ops,
        2^13 lanes): 16 ms/chunk branchless vs 20 ms with an 8-way
        lax.switch (TPU predicates the branches), both far above the pure
        compute bound — the step computes T=A*B and A±B unconditionally
        and selects, so the extra lanes ride the same VPU issue slots."""
        import jax
        import jax.numpy as jnp
        from jax import lax

        from ..field import gf_jax as gf

        waves = (jnp.asarray(self.wave_opcodes),
                 jnp.asarray(self.wave_dst), jnp.asarray(self.wave_a),
                 jnp.asarray(self.wave_b), jnp.asarray(self.wave_c))
        out_regs = jnp.asarray(self.out_regs)

        def g(regs, i):                     # (W,) reg gather -> GF pair
            v = regs[i]                     # (W, 2, C)
            return v[:, 0], v[:, 1]

        def gs(bank, i):                    # (W,) scalar gather -> GF pair
            s = bank[i]                     # (W, 2)
            return s[:, 0, None], s[:, 1, None]

        def pack(pair):
            return jnp.stack(pair, axis=1)  # (W, 2, C)

        def run(regs_init, bank):
            def step(regs, wave):
                # opcodes: 0 add, 1 sub, 2 mul, 3 add-scalar,
                # 4 scalar-minus-reg, 5 mul-scalar, 6 muladd,
                # 7 muladd-scalar (all waves are opcode-homogeneous)
                code, d, a, b, c = wave
                A = g(regs, a)
                Bv = g(regs, b)
                Bs = gs(bank, b)
                scalar_b = (code == 3) | (code == 4) | (code == 5) \
                    | (code == 7)
                B = (jnp.where(scalar_b,
                               jnp.broadcast_to(Bs[0], Bv[0].shape), Bv[0]),
                     jnp.where(scalar_b,
                               jnp.broadcast_to(Bs[1], Bv[1].shape), Bv[1]))
                Cv = g(regs, c)
                is_mul = (code == 2) | (code == 5) | (code == 6) \
                    | (code == 7)
                is_sub = code == 1
                is_rsub = code == 4
                has_c = (code == 6) | (code == 7)
                T = gf.mul(A, B)
                s_add = gf.add(A, B)
                s_sub = gf.sub(A, B)
                s_rsub = gf.sub(B, A)
                lin = (jnp.where(is_sub, s_sub[0],
                                 jnp.where(is_rsub, s_rsub[0], s_add[0])),
                       jnp.where(is_sub, s_sub[1],
                                 jnp.where(is_rsub, s_rsub[1], s_add[1])))
                base = (jnp.where(is_mul, T[0], lin[0]),
                        jnp.where(is_mul, T[1], lin[1]))
                withc = gf.add(base, Cv)
                vals = (jnp.where(has_c, withc[0], base[0]),
                        jnp.where(has_c, withc[1], base[1]))
                return regs.at[d].set(pack(vals), unique_indices=False), None

            regs, _ = lax.scan(step, regs_init, waves)
            return regs[out_regs]           # (n_out, 2, C)

        return run


    # -- pallas executor ---------------------------------------------------

    def pallas_chunk_runner(self, tile: int = 512, interpret: bool = False):
        """Returns fn(inputs (2, n_in, C) u32, bank (S, 2) i32) ->
        (2, n_out, C) u32 — the interpreter as a Pallas TPU kernel.

        The register file lives in VMEM scratch (layout (2, R, tile): the
        pair axis leads so the trailing (R, tile) face tiles (8, 128)
        without padding), the wave stream is scalar-prefetched into SMEM,
        and the grid walks lane tiles of the chunk.  Removes the XLA
        runner's HBM register-file traffic (ROOFLINE.md §3)."""
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from ..field import gf_jax as gf

        W = self.wave_width
        nw = int(self.wave_opcodes.shape[0])
        n_in, R = self.n_inputs, self.n_regs
        out_regs = [int(r) for r in self.out_regs]
        n_out = len(out_regs)
        T = tile

        # 1D flat streams: SMEM pads each row of a 2D scalar-prefetch
        # array to 128 lanes (a (396, 16) stream ballooned to 200 KB and
        # blew the 1 MB SMEM budget); flat (nw*W,) arrays pad once
        codes_np = self.wave_opcodes.astype(np.int32)
        dst_np = self.wave_dst.astype(np.int32).reshape(-1)
        a_np = self.wave_a.astype(np.int32).reshape(-1)
        b_np = self.wave_b.astype(np.int32).reshape(-1)
        c_np = self.wave_c.astype(np.int32).reshape(-1)

        def kernel(codes, dst, aa, bb, cc, bank, inp_ref, out_ref, regs_ref):
            regs_ref[:, 0:n_in, :] = inp_ref[...]

            def wave(w, carry):
                code = codes[w]
                n_bank = bank.shape[0]          # = 2*S (flat lo/hi pairs)
                rows_a, rows_b, rows_c = [], [], []
                slo, shi = [], []
                for k in range(W):
                    rows_a.append(regs_ref[:, pl.ds(aa[w * W + k], 1), :])
                    rows_b.append(regs_ref[:, pl.ds(bb[w * W + k], 1), :])
                    rows_c.append(regs_ref[:, pl.ds(cc[w * W + k], 1), :])
                    bi = jnp.minimum(bb[w * W + k], n_bank // 2 - 1)
                    # bank is a FLAT (2S,) stream [lo0, hi0, lo1, hi1, ...]
                    # (2D scalar-prefetch arrays pad every row to 128 SMEM
                    # lanes; the flagship's ~860-entry bank was 432 KB of
                    # the 1 MB SMEM budget as (S, 2)).  uint32 bit patterns
                    # carried in int32; int->uint conversion wraps mod
                    # 2^32, i.e. reinterprets the bits.
                    slo.append(bank[2 * bi].astype(jnp.uint32))
                    shi.append(bank[2 * bi + 1].astype(jnp.uint32))
                Araw = jnp.concatenate(rows_a, axis=1)      # (2, W, T)
                Braw = jnp.concatenate(rows_b, axis=1)
                Craw = jnp.concatenate(rows_c, axis=1)
                A = (Araw[0], Araw[1])
                Cv = (Craw[0], Craw[1])
                bs_lo = jnp.stack(slo)[:, None]             # (W, 1)
                bs_hi = jnp.stack(shi)[:, None]
                Bv = (Braw[0], Braw[1])
                Bs = (jnp.broadcast_to(bs_lo, Braw[0].shape),
                      jnp.broadcast_to(bs_hi, Braw[1].shape))
                # waves are opcode-homogeneous, so a REAL scalar branch
                # (Mosaic lowers lax.switch on an SMEM scalar to control
                # flow) runs only the selected op's VPU work — ~25% fewer
                # ops than the branchless select form
                vals = jax.lax.switch(code, [
                    lambda: jnp.stack(gf.add(A, Bv)),
                    lambda: jnp.stack(gf.sub(A, Bv)),
                    lambda: jnp.stack(gf.mul(A, Bv)),
                    lambda: jnp.stack(gf.add(A, Bs)),
                    lambda: jnp.stack(gf.sub(Bs, A)),
                    lambda: jnp.stack(gf.mul(A, Bs)),
                    lambda: jnp.stack(gf.add(gf.mul(A, Bv), Cv)),
                    lambda: jnp.stack(gf.add(gf.mul(A, Bs), Cv)),
                ])                                          # (2, W, T)
                for k in range(W):
                    regs_ref[:, pl.ds(dst[w * W + k], 1), :] = \
                        vals[:, k:k + 1]
                return carry

            jax.lax.fori_loop(0, nw, wave, 0)
            out_ref[...] = jnp.concatenate(
                [regs_ref[:, r:r + 1, :] for r in out_regs], axis=1)

        def run(inputs, bank_i32):
            C = inputs.shape[-1]
            assert C % T == 0, (C, T)
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(C // T,),
                in_specs=[pl.BlockSpec((2, n_in, T),
                                       lambda i, *_: (0, 0, i))],
                out_specs=pl.BlockSpec((2, n_out, T),
                                       lambda i, *_: (0, 0, i)),
                scratch_shapes=[pltpu.VMEM((2, R, T), jnp.uint32)],
            )
            bank_flat = bank_i32.reshape(-1)    # (2S,) [lo0, hi0, ...]
            return pl.pallas_call(
                kernel,
                grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((2, n_out, C), jnp.uint32),
                interpret=interpret,
            )(jnp.asarray(codes_np), jnp.asarray(dst_np), jnp.asarray(a_np),
              jnp.asarray(b_np), jnp.asarray(c_np), bank_flat, inputs)

        return run


def _allocate(builder: ProgramBuilder, ops: List[tuple],
              waves: List[List[int]], out_ids: List[int],
              W: int) -> ConstraintProgram:
    """Linear-scan register allocation over the wave schedule."""
    n_in = builder.n_vector_inputs
    # reg of each vector node; inputs preloaded at [0, n_in)
    reg_of: Dict[int, int] = {}
    for vid, (op, x, _y) in enumerate(builder.vnodes):
        if op == "in":
            reg_of[vid] = x
    # last wave index in which each vid is read
    last_use: Dict[int, int] = {}
    for w, wave in enumerate(waves):
        for i in wave:
            for v in _operand_vids(builder, ops[i]):
                last_use[v] = w
    out_set = set(out_ids)

    free: List[int] = []
    next_reg = n_in
    # inputs never read at all can be freed immediately (still preloaded)
    wave_dst = np.zeros((len(waves), W), dtype=np.int32)
    wave_a = np.zeros((len(waves), W), dtype=np.int32)
    wave_b = np.zeros((len(waves), W), dtype=np.int32)
    wave_c = np.zeros((len(waves), W), dtype=np.int32)
    wave_opcodes = np.zeros(len(waves), dtype=np.int32)

    # scalar bank assignment
    bank_of: Dict[int, int] = {}
    bank_sids: List[int] = []

    def bank_slot(sid: int) -> int:
        slot = bank_of.get(sid)
        if slot is None:
            slot = len(bank_sids)
            bank_of[sid] = slot
            bank_sids.append(sid)
        return slot

    expiring: Dict[int, List[int]] = {}
    for v, w in last_use.items():
        expiring.setdefault(w, []).append(v)

    peak = n_in
    for w, wave in enumerate(waves):
        code = ops[wave[0]][0]
        wave_opcodes[w] = code
        # operand encoding
        rows = []
        for i in wave:
            opc, dst, a, b, c = ops[i]
            ra = reg_of[a]
            if opc in (ADD, SUB, MUL):
                rb, rc = reg_of[b], 0
            elif opc == MULADD:
                rb, rc = reg_of[b], reg_of[c]
            elif opc == MULADDS:
                rb, rc = bank_slot(b), reg_of[c]
            else:                       # ADDS / SUBS / MULS: b is scalar
                rb, rc = bank_slot(b), 0
            rows.append((dst, ra, rb, rc))
        # free registers whose value dies at this wave (reads precede writes)
        for v in expiring.get(w, ()):
            if v not in out_set and v in reg_of:
                free.append(reg_of[v])
        # assign destinations
        for k, (dst, ra, rb, rc) in enumerate(rows):
            if free:
                rd = free.pop()
            else:
                rd = next_reg
                next_reg += 1
            reg_of[dst] = rd
            wave_dst[w, k] = rd
            wave_a[w, k] = ra
            wave_b[w, k] = rb
            wave_c[w, k] = rc
        peak = max(peak, next_reg)
        # pad the wave with writes to the dump register (allocated last)
        if len(rows) < W:
            for k in range(len(rows), W):
                wave_dst[w, k] = -1     # patched to dump reg below
                wave_a[w, k] = 0
                wave_b[w, k] = 0
                wave_c[w, k] = 0

    dump = next_reg
    wave_dst[wave_dst < 0] = dump
    n_regs = dump + 1

    out_regs = np.array([reg_of[v] for v in out_ids], dtype=np.int32)
    return ConstraintProgram(
        n_inputs=n_in, n_regs=n_regs, wave_width=W,
        wave_opcodes=wave_opcodes, wave_dst=wave_dst, wave_a=wave_a,
        wave_b=wave_b, wave_c=wave_c, out_regs=out_regs,
        snodes=builder.snodes, bank_sids=bank_sids,
        n_scalar_inputs=builder.n_scalar_inputs, n_ops=len(ops))


class ExprAlgebra:
    """Algebra backend (plonk/algebra.py protocol) that records a program."""

    def __init__(self, builder: ProgramBuilder):
        self.b = builder

    def const(self, c: int) -> EV:
        return self.b.sc_known(c)

    def zero(self) -> EV:
        return self.b.sc_known(0)

    def one(self) -> EV:
        return self.b.sc_known(1)

    def add(self, a: EV, b: EV) -> EV:
        return self.b.add(a, b)

    def sub(self, a: EV, b: EV) -> EV:
        return self.b.sub(a, b)

    def mul(self, a: EV, b: EV) -> EV:
        return self.b.mul(a, b)

    def neg(self, a: EV) -> EV:
        return self.b.sub(self.b.sc_known(0), a)

    def add_const(self, a: EV, c: int) -> EV:
        return self.b.add(a, self.b.sc_known(c))

    def mul_const(self, a: EV, c: int) -> EV:
        return self.b.mul(a, self.b.sc_known(c))

    def exp(self, a: EV, e: int) -> EV:
        result = self.b.sc_known(1)
        base = a
        while e > 0:
            if e & 1:
                result = self.b.mul(result, base)
            e >>= 1
            if e:
                base = self.b.mul(base, base)
        return result
