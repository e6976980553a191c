"""In-circuit gadget library (reference plonky2/src/gadgets/).

These are mixin classes combined into plonk.circuit_builder.CircuitBuilder:
- extension.ExtensionGadgets  — quadratic-extension target arithmetic
- split.SplitGadgets          — bit decomposition, range checks, exp, select,
                                random access
- merkle.MerkleGadgets        — in-circuit Merkle proof verification
- interpolation (gates/interpolation.py) — coset interpolation
"""
