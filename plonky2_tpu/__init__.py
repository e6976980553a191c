"""plonky2_tpu — a TPU-native Plonky2-class proving framework.

Recursive PLONK+FRI SNARKs over the 64-bit Goldilocks field, built ground-up
for TPU: JAX/XLA/Pallas compute path (uint32 limb-pair field arithmetic on the
VPU, batched NTT / Poseidon-Merkle / quotient kernels), host Python protocol
layer (circuit builder, Fiat-Shamir, FRI logic), and jax.sharding/pjit
multi-chip scaling.

Feature target: parity with the reference CUDA fork of plonky2
(see SURVEY.md) — same proofs, same transcripts, TPU-first architecture.
"""

__version__ = "0.1.0"
