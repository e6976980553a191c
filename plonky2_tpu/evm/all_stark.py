"""AllStark: the four real tables {keccak-f, keccak-sponge, logic, memory}
wired together with cross-table lookups, plus consistent multi-table witness
generation from a list of sponge operations
(reference evm/src/all_stark.rs:24-160 — note the reference ships with its
CTLs disabled, all_stark.rs:92-106; here they are live and verified).

CTL wiring (all_stark.rs:108-160):
- ctl_keccak:  sponge rows look up (preimage, output) in the keccak-f table
- ctl_logic:   each sponge row performs 5 32-byte XOR lookups in the logic
  table (the reference passes ``ctl_looking_memory_filter(i)`` here, which
  is a filter for byte *i*, not chunk *i*; we use the op-row filter so all
  five chunks are looked up on every absorb row, and generate logic rows to
  match)
- ctl_memory:  one lookup per input byte read from memory
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from . import keccak_sponge as sponge_mod
from . import keccak_stark as keccak_mod
from . import logic as logic_mod
from . import memory as memory_mod
from .cross_table_lookup import CrossTableLookup, TableWithColumns
from .keccak_sponge import (KECCAK_RATE_BYTES, KECCAK_RATE_U32S,
                            KeccakSpongeOp, KeccakSpongeStark)
from .keccak_stark import KeccakStark
from .logic import LogicStark, Operation as LogicOp
from .memory import MemoryOp, MemoryStark
from .prover import AllStark

KECCAK = 0
KECCAK_SPONGE = 1
LOGIC = 2
MEMORY = 3

# 6-table layout with the CPU: the first five match the reference Table
# enum order (reference all_stark.rs:33-47); the arithmetic table is
# appended — upstream ships it unconnected, here its results are bound to
# the CPU via a live CTL
CPU_TABLES = {"cpu": 0, "keccak": 1, "keccak_sponge": 2, "logic": 3,
              "memory": 4, "arithmetic": 5}
_DEFAULT_TABLES = {"keccak": KECCAK, "keccak_sponge": KECCAK_SPONGE,
                   "logic": LOGIC, "memory": MEMORY}


def ctl_keccak(t=_DEFAULT_TABLES) -> CrossTableLookup:
    """(reference all_stark.rs:108-120)."""
    looking = TableWithColumns(
        table=t["keccak_sponge"], columns=sponge_mod.ctl_looking_keccak(),
        filter_column=sponge_mod.ctl_looking_keccak_filter())
    looked = TableWithColumns(
        table=t["keccak"], columns=keccak_mod.ctl_data(),
        filter_column=keccak_mod.ctl_filter())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def ctl_logic(t=_DEFAULT_TABLES) -> CrossTableLookup:
    """(reference all_stark.rs:136-154; filter deviation in module doc)."""
    lookers = []
    if "cpu" in t:
        from . import cpu as cpu_mod
        lookers.append(TableWithColumns(
            table=t["cpu"], columns=cpu_mod.ctl_data_logic(),
            filter_column=cpu_mod.ctl_filter_logic()))
    lookers += [
        TableWithColumns(table=t["keccak_sponge"],
                         columns=sponge_mod.ctl_looking_logic(i),
                         filter_column=sponge_mod.ctl_looking_logic_filter())
        for i in range(sponge_mod.num_logic_ctls())]
    looked = TableWithColumns(table=t["logic"], columns=logic_mod.ctl_data(),
                              filter_column=logic_mod.ctl_filter())
    return CrossTableLookup(looking_tables=lookers, looked_table=looked)


def ctl_memory(t=_DEFAULT_TABLES) -> CrossTableLookup:
    """(reference all_stark.rs:156-177)."""
    lookers = []
    if "cpu" in t:
        from . import cpu as cpu_mod
        lookers.append(TableWithColumns(
            table=t["cpu"], columns=cpu_mod.ctl_data_code_memory(),
            filter_column=cpu_mod.ctl_filter_code_memory()))
        for ch in range(cpu_mod.NUM_GP_CHANNELS):
            lookers.append(TableWithColumns(
                table=t["cpu"], columns=cpu_mod.ctl_data_gp_memory(ch),
                filter_column=cpu_mod.ctl_filter_gp_memory(ch)))
    lookers += [
        TableWithColumns(table=t["keccak_sponge"],
                         columns=sponge_mod.ctl_looking_memory(i),
                         filter_column=sponge_mod.ctl_looking_memory_filter(i))
        for i in range(KECCAK_RATE_BYTES)]
    looked = TableWithColumns(table=t["memory"],
                              columns=memory_mod.ctl_data(),
                              filter_column=memory_mod.ctl_filter())
    return CrossTableLookup(looking_tables=lookers, looked_table=looked)


def ctl_keccak_sponge(t) -> CrossTableLookup:
    """CPU looks up its sponge results (reference all_stark.rs:122-134)."""
    from . import cpu as cpu_mod
    looking = TableWithColumns(
        table=t["cpu"], columns=cpu_mod.ctl_data_keccak_sponge(),
        filter_column=cpu_mod.ctl_filter_keccak_sponge())
    looked = TableWithColumns(
        table=t["keccak_sponge"], columns=sponge_mod.ctl_looked_data(),
        filter_column=sponge_mod.ctl_looked_filter())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def ctl_arithmetic(t) -> CrossTableLookup:
    """CPU ADD/MUL/SUB/LT/GT results are looked up in the arithmetic table
    (no upstream analogue — the reference never connects this table)."""
    from . import arithmetic as arith_mod
    from . import cpu as cpu_mod
    looking = TableWithColumns(
        table=t["cpu"], columns=cpu_mod.ctl_data_arithmetic(),
        filter_column=cpu_mod.ctl_filter_arithmetic())
    looked = TableWithColumns(
        table=t["arithmetic"], columns=arith_mod.ctl_data(),
        filter_column=arith_mod.ctl_filter())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def all_cross_table_lookups() -> List[CrossTableLookup]:
    return [ctl_keccak(), ctl_logic(), ctl_memory()]


def ctl_arithmetic_ternary(t) -> CrossTableLookup:
    """CPU ADDMOD/MULMOD (a, b, m, out) quadruples are looked up in the
    arithmetic table's modular rows — the soundness backbone of the
    in-kernel secp256k1 routines (no upstream analogue; the reference's
    table is unconnected)."""
    from . import arithmetic as arith_mod
    from . import cpu as cpu_mod
    looking = TableWithColumns(
        table=t["cpu"], columns=cpu_mod.ctl_data_arithmetic_ternary(),
        filter_column=cpu_mod.ctl_filter_arithmetic_ternary())
    looked = TableWithColumns(
        table=t["arithmetic"], columns=arith_mod.ctl_data_ternary(),
        filter_column=arith_mod.ctl_filter_ternary())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def ctl_arithmetic_div(t) -> CrossTableLookup:
    from . import arithmetic as arith_mod
    from . import cpu as cpu_mod
    looking = TableWithColumns(
        table=t["cpu"], columns=cpu_mod.ctl_data_arithmetic_div(),
        filter_column=cpu_mod.ctl_filter_arithmetic_div())
    looked = TableWithColumns(
        table=t["arithmetic"], columns=arith_mod.ctl_data_div(),
        filter_column=arith_mod.ctl_filter_div())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def ctl_arithmetic_mod(t) -> CrossTableLookup:
    from . import arithmetic as arith_mod
    from . import cpu as cpu_mod
    looking = TableWithColumns(
        table=t["cpu"], columns=cpu_mod.ctl_data_arithmetic_mod(),
        filter_column=cpu_mod.ctl_filter_arithmetic_mod())
    looked = TableWithColumns(
        table=t["arithmetic"], columns=arith_mod.ctl_data_mod(),
        filter_column=arith_mod.ctl_filter_mod())
    return CrossTableLookup(looking_tables=[looking], looked_table=looked)


def all_cross_table_lookups_with_cpu() -> List[CrossTableLookup]:
    t = CPU_TABLES
    return [ctl_keccak(t), ctl_keccak_sponge(t), ctl_logic(t),
            ctl_memory(t), ctl_arithmetic(t), ctl_arithmetic_ternary(t),
            ctl_arithmetic_div(t), ctl_arithmetic_mod(t)]


def make_all_stark() -> AllStark:
    return AllStark(
        starks=[KeccakStark(), KeccakSpongeStark(), LogicStark(),
                MemoryStark()],
        cross_table_lookups=all_cross_table_lookups())


def _sponge_derived_witness(sponge_trace: np.ndarray):
    """keccak-f inputs, logic XOR ops and memory reads implied by the sponge
    trace (the role of reference generation/ for these tables)."""
    keccak_inputs: List[List[int]] = []
    logic_ops: List[LogicOp] = []
    memory_ops: List[MemoryOp] = []
    n = sponge_trace.shape[1]
    for j in range(n):
        is_full = int(sponge_trace[sponge_mod.IS_FULL_INPUT_BLOCK, j])
        is_final = int(sponge_trace[sponge_mod.IS_FINAL_BLOCK, j])
        if not (is_full or is_final):
            continue
        xored = [int(sponge_trace[c, j]) for c in sponge_mod.XORED_RATE_U32S]
        capacity = [int(sponge_trace[c, j])
                    for c in sponge_mod.ORIGINAL_CAPACITY_U32S]
        state_u32s = xored + capacity
        keccak_inputs.append([state_u32s[2 * i] | (state_u32s[2 * i + 1] << 32)
                              for i in range(25)])

        orig_rate = [int(sponge_trace[c, j])
                     for c in sponge_mod.ORIGINAL_RATE_U32S]
        block = bytes(int(sponge_trace[c, j]) for c in sponge_mod.BLOCK_BYTES)
        for i in range(sponge_mod.num_logic_ctls()):
            rate_chunk = orig_rate[8 * i:8 * i + 8]
            in0 = sum(v << (32 * k) for k, v in enumerate(rate_chunk))
            in1 = int.from_bytes(block[32 * i:32 * i + 32], "little")
            logic_ops.append(LogicOp("xor", in0, in1))

        ctx = int(sponge_trace[sponge_mod.CONTEXT, j])
        seg = int(sponge_trace[sponge_mod.SEGMENT, j])
        virt = int(sponge_trace[sponge_mod.VIRT, j])
        ts = int(sponge_trace[sponge_mod.TIMESTAMP, j])
        absorbed = int(sponge_trace[sponge_mod.ALREADY_ABSORBED_BYTES, j])
        if is_full:
            n_bytes = KECCAK_RATE_BYTES
        else:
            n_bytes = int(sponge_trace[sponge_mod.LEN, j]) - absorbed
        for i in range(n_bytes):
            memory_ops.append(MemoryOp(
                filter=True, timestamp=ts, is_read=True, context=ctx,
                segment=seg, virt=virt + absorbed + i,
                value=block[i]))
    return keccak_inputs, logic_ops, memory_ops


def generate_all_traces(ops: List[KeccakSpongeOp],
                        min_rows: int = 8) -> List[np.ndarray]:
    """Consistent witness generation across the four tables from sponge
    operations."""
    sponge_trace = KeccakSpongeStark().generate_trace(ops, min_rows=min_rows)
    keccak_inputs, logic_ops, memory_ops = \
        _sponge_derived_witness(sponge_trace)
    keccak_trace = KeccakStark().generate_trace(keccak_inputs,
                                                min_rows=min_rows)
    logic_trace = LogicStark().generate_trace(logic_ops, min_rows=min_rows)
    memory_trace = MemoryStark().generate_trace(memory_ops)
    return [keccak_trace, sponge_trace, logic_trace, memory_trace]


def arithmetic_range_check_policy(range_check, arith_ops) -> bool:
    """Resolve the 16-bit limb range-check flag for the arithmetic table.

    ``None`` (the default) auto-enables it whenever the arithmetic trace
    reaches production height (>= RC_MIN_ROWS = 2^16, the height at which
    the 0..2^16-1 counter column fits without padding the table).  Below
    that height the check is OFF by default — small-trace proofs pay no
    2^16-row padding, but their CTL-bound limb columns are NOT constrained
    to 16 bits (still strictly stronger than the reference, whose
    range_check_error! is a no-op at every height, utils.rs:10-31); pass
    ``range_check=True`` to force it."""
    if range_check is not None:
        return bool(range_check)
    from .arithmetic import RC_MIN_ROWS
    rows_needed = sum(op.num_rows() for op in arith_ops)
    return rows_needed >= RC_MIN_ROWS


def make_all_stark_with_cpu(kernel, range_check: bool = False) -> AllStark:
    """``range_check`` must match the flag the traces were generated with
    (it changes the arithmetic table's column count)."""
    from .arithmetic import ArithmeticStark
    from .cpu import CpuStark
    return AllStark(
        starks=[CpuStark(kernel), KeccakStark(), KeccakSpongeStark(),
                LogicStark(), MemoryStark(),
                ArithmeticStark(range_check=range_check)],
        cross_table_lookups=all_cross_table_lookups_with_cpu())


def generate_all_traces_with_cpu(kernel, min_rows: int = 8,
                                 execution=None,
                                 range_check=None) -> List[np.ndarray]:
    """Witness generation for the 5-table system: the CPU bootstraps the
    kernel into memory, the sponge hashes it, and the CPU looks up the
    resulting code digest (reference generation/ + bootstrap_kernel.rs).
    Kernels that define main/halt_pc0/halt_pc1 labels are additionally
    EXECUTED: the cycle rows, their per-channel memory ops and their
    AND/OR/XOR logic lookups all enter the witness
    (reference witness/ + generation/mod.rs)."""
    from .arithmetic import ArithmeticStark
    from .cpu import generate_bootstrap_kernel
    labels = kernel.global_labels
    if execution is not None or all(
            k in labels for k in ("main", "halt_pc0", "halt_pc1")):
        from .generation import generate_kernel_execution
        ex = execution if execution is not None else \
            generate_kernel_execution(kernel, min_rows=min_rows)
        cpu_trace, cpu_memory_ops = ex.cpu_trace, ex.memory_ops
        sponge_ops, cpu_logic_ops = ex.sponge_ops, ex.logic_ops
        cpu_arith_ops = ex.arith_ops
    else:
        cpu_trace, cpu_memory_ops, sponge_ops = \
            generate_bootstrap_kernel(kernel, min_rows=min_rows)
        cpu_logic_ops, cpu_arith_ops = [], []
    sponge_trace = KeccakSpongeStark().generate_trace(sponge_ops,
                                                      min_rows=min_rows)
    keccak_inputs, logic_ops, sponge_memory_ops = \
        _sponge_derived_witness(sponge_trace)
    keccak_trace = KeccakStark().generate_trace(keccak_inputs,
                                                min_rows=min_rows)
    logic_trace = LogicStark().generate_trace(cpu_logic_ops + logic_ops,
                                              min_rows=min_rows)
    memory_trace = MemoryStark().generate_trace(cpu_memory_ops
                                                + sponge_memory_ops)
    rc = arithmetic_range_check_policy(range_check, cpu_arith_ops)
    arith_trace = ArithmeticStark(range_check=rc).generate_trace(
        cpu_arith_ops, min_rows=min_rows)
    return [cpu_trace, keccak_trace, sponge_trace, logic_trace, memory_trace,
            arith_trace]
