"""Targets and wires (reference plonky2/src/iop/target.rs, wire.rs).

A Target is either a concrete wire (row, column) in the witness grid or a
virtual target used only during witness generation.  Encoded as plain tuples
for speed: ("w", row, column) | ("v", index).
"""
from __future__ import annotations

from typing import Tuple

Target = Tuple  # ("w", row, col) or ("v", index)


def wire(row: int, column: int) -> Target:
    return ("w", row, column)


def virtual(index: int) -> Target:
    return ("v", index)


def is_routable(t: Target, num_routed_wires: int) -> bool:
    if t[0] == "v":
        return True
    return t[2] < num_routed_wires


def target_index(t: Target, num_wires: int, degree: int) -> int:
    """Flat index used by the union-find forest (reference target.rs:36-41)."""
    if t[0] == "w":
        return t[1] * num_wires + t[2]
    return degree * num_wires + t[1]
