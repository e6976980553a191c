"""ProverSession — the device-state bundle for repeated proving.

TPU-native equivalent of the reference's ``CudaInvContext``
(fri/oracle.rs:75-109): where the CUDA fork pre-allocates a device arena,
uploads twiddle tables and keeps the constants/sigmas commitment resident,
this session keeps the circuit-fixed quotient state (the compiled constraint
program, preprocessed leaf arrays, domain tables) on the device.  The
quotient runs through the constraint-program interpreter
(plonk/constraint_program.py) whose XLA graph is O(1) in circuit size, so
session startup is seconds, not the tens-of-minutes flat-trace compile of
round 1.  Twiddle tables are device constants inside the jitted NTTs, so
they persist for free.
"""
from __future__ import annotations

from typing import Optional


class ProverSession:
    """Create once per circuit; call :meth:`prove` per witness."""

    def __init__(self, data, use_device: Optional[bool] = None,
                 quotient_on_device: Optional[bool] = None,
                 chunk: Optional[int] = None):
        from ..fri.oracle import _auto_device
        self.data = data
        self.use_device = _auto_device() if use_device is None else use_device
        if quotient_on_device is None:
            quotient_on_device = True
        self.quotient_on_device = quotient_on_device and self.use_device
        self._chunk = chunk
        self._dev = None   # lazily-built DeviceQuotient

    def prove(self, inputs, timing=None):
        from ..plonk.prover import prove
        return prove(self.data.prover_only, self.data.common, inputs,
                     use_device=self.use_device, session=self, timing=timing)

    def verify(self, proof) -> None:
        self.data.verify(proof)

    def device_quotient(self):
        if self._dev is None:
            from ..plonk.quotient_program import DeviceQuotient
            self._dev = DeviceQuotient(self.data.common,
                                       self.data.prover_only,
                                       chunk=self._chunk)
        return self._dev

    def compute_quotient_polys(self, public_inputs_hash, wires_commitment,
                               zspp_commitment, betas, gammas, alphas):
        """Device quotient evaluation — the TPU analog of the reference's
        compute_quotient_values kernel (cuda/plonky2_gpu.cu:719-770).

        Returns quotient coefficient rows as a device GF pair
        (num_challenges, lde_size); use field.gf_jax.to_u64 for host values.
        """
        dev = self.device_quotient()
        return dev.compute(wires_commitment, zspp_commitment,
                           public_inputs_hash, betas, gammas, alphas)
