"""Witness containers (reference plonky2/src/iop/witness.rs).

`PartitionWitness` stores one value per copy-constraint equivalence class
(representative), so setting any member of a class sets them all — this is
what makes the generator fixpoint converge in one pass per dependency chain.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .target import Target, target_index


class PartialWitness:
    def __init__(self):
        self.target_values: Dict[Target, int] = {}

    def set_target(self, t: Target, value: int) -> None:
        v = int(value)
        if t in self.target_values:
            assert self.target_values[t] == v, f"conflicting value for {t}"
        self.target_values[t] = v

    def set_wire(self, row: int, column: int, value: int) -> None:
        self.set_target(("w", row, column), value)

    # -- structured setters for recursion (reference iop/witness.rs) -------

    def set_extension_target(self, et, value) -> None:
        v = _as_pair(value)
        self.set_target(et[0], v[0])
        self.set_target(et[1], v[1])

    def set_extension_targets(self, ets, values) -> None:
        for et, v in zip(ets, values):
            self.set_extension_target(et, v)

    def set_hash_target(self, ht, hash4) -> None:
        arr = np.asarray(hash4, dtype=np.uint64).reshape(4)
        for t, v in zip(ht, arr):
            self.set_target(t, int(v))

    def set_cap_target(self, cap_target, cap) -> None:
        digests = cap.digests if hasattr(cap, "digests") else np.asarray(cap)
        for ht, d in zip(cap_target, digests.reshape(-1, 4)):
            self.set_hash_target(ht, d)

    def set_merkle_proof_target(self, proof_target, proof) -> None:
        for ht, sib in zip(proof_target.siblings, proof.siblings):
            self.set_hash_target(ht, sib)

    def set_fri_proof_target(self, fri_target, fri_proof) -> None:
        self.set_target(fri_target.pow_witness, int(fri_proof.pow_witness))
        for et, v in zip(fri_target.final_poly.coeffs, fri_proof.final_poly):
            self.set_extension_target(et, v)
        for cap_t, cap in zip(fri_target.commit_phase_merkle_caps,
                              fri_proof.commit_phase_merkle_caps):
            self.set_cap_target(cap_t, cap)
        for qt, q in zip(fri_target.query_round_proofs,
                         fri_proof.query_round_proofs):
            for (leaves_t, mp_t), (leaves, mp) in zip(
                    qt.initial_trees_proof.evals_proofs,
                    q.initial_trees_proof.evals_proofs):
                for t, v in zip(leaves_t,
                                np.asarray(leaves, dtype=np.uint64).reshape(-1)):
                    self.set_target(t, int(v))
                self.set_merkle_proof_target(mp_t, mp)
            for st, s in zip(qt.steps, q.steps):
                self.set_extension_targets(st.evals, s.evals)
                self.set_merkle_proof_target(st.merkle_proof, s.merkle_proof)

    def set_proof_with_pis_target(self, pt, proof_with_pis) -> None:
        proof = proof_with_pis.proof
        for t, v in zip(pt.public_inputs, proof_with_pis.public_inputs):
            self.set_target(t, int(v))
        self.set_cap_target(pt.proof.wires_cap, proof.wires_cap)
        self.set_cap_target(pt.proof.plonk_zs_partial_products_cap,
                            proof.plonk_zs_partial_products_cap)
        self.set_cap_target(pt.proof.quotient_polys_cap,
                            proof.quotient_polys_cap)
        ot, o = pt.proof.openings, proof.openings
        self.set_extension_targets(ot.constants, o.constants)
        self.set_extension_targets(ot.plonk_sigmas, o.plonk_sigmas)
        self.set_extension_targets(ot.wires, o.wires)
        self.set_extension_targets(ot.plonk_zs, o.plonk_zs)
        self.set_extension_targets(ot.plonk_zs_next, o.plonk_zs_next)
        self.set_extension_targets(ot.partial_products, o.partial_products)
        self.set_extension_targets(ot.quotient_polys, o.quotient_polys)
        self.set_fri_proof_target(pt.proof.opening_proof, proof.opening_proof)

    def set_verifier_data_target(self, vt, verifier_data) -> None:
        self.set_cap_target(vt.constants_sigmas_cap,
                            verifier_data.constants_sigmas_cap)
        self.set_hash_target(vt.circuit_digest, verifier_data.circuit_digest)


def _as_pair(value):
    if isinstance(value, tuple):
        return (int(value[0]), int(value[1]))
    a = np.asarray(value, dtype=np.uint64).reshape(2)
    return (int(a[0]), int(a[1]))


class PartitionWitness:
    """One slot per representative in the copy-constraint forest."""

    def __init__(self, num_wires: int, degree: int, representative_map: List[int]):
        self.num_wires = num_wires
        self.degree = degree
        self.rep_map = representative_map
        n = len(representative_map)
        self.values = np.zeros(n, dtype=np.uint64)
        self.is_set = np.zeros(n, dtype=bool)

    def rep(self, t: Target) -> int:
        return self.rep_map[target_index(t, self.num_wires, self.degree)]

    def contains(self, t: Target) -> bool:
        return bool(self.is_set[self.rep(t)])

    def get_target(self, t: Target) -> int:
        r = self.rep(t)
        assert self.is_set[r], f"target {t} not set"
        return int(self.values[r])

    def try_get_target(self, t: Target) -> Optional[int]:
        r = self.rep(t)
        return int(self.values[r]) if self.is_set[r] else None

    def set_target_returning_rep(self, t: Target, value: int) -> Optional[int]:
        """Returns the representative index if newly set, None if already set
        (asserting consistency)."""
        r = self.rep(t)
        v = int(value)
        if self.is_set[r]:
            assert int(self.values[r]) == v, (
                f"Partition containing {t} was set twice with different values: "
                f"{int(self.values[r])} != {v}")
            return None
        self.values[r] = v
        self.is_set[r] = True
        return r

    def get_targets(self, targets) -> List[int]:
        return [self.get_target(t) for t in targets]

    def full_witness(self) -> np.ndarray:
        """(num_wires, degree) wire value matrix (MatrixWitness)."""
        return self.full_witness_rowmajor().T.copy()

    def full_witness_rowmajor(self) -> np.ndarray:
        """(degree, num_wires) wire values — the union-find's native order,
        materialized with ONE gather and no transpose (the 0.5 GB host
        transpose costs seconds-to-minutes on shared hosts; the device
        path transposes on chip instead)."""
        reps = np.asarray(self.rep_map[: self.degree * self.num_wires])
        return self.values[reps].reshape(self.degree, self.num_wires)
