"""Disk cache for built circuits.

Building a 2^18-row circuit in the python builder takes minutes; serving
workloads build once and reuse (the reference amortizes the same way: its
CircuitData is built once per process and the CUDA context reuses it).
This cache pickles everything EXCEPT the constants/sigmas commitment's
leaf/digest arrays — only the coefficient rows are stored, and the
commitment is recomputed on the (fast) device commit pipeline at load.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional


def save_circuit(path: str, data, extra=None) -> None:
    from ..fri.oracle import PolynomialBatch
    po = data.prover_only
    cs = po.constants_sigmas_commitment
    payload = {
        "common": data.common,
        "verifier_only": data.verifier_only,
        "prover_only": {
            "generators": po.generators,
            "generator_indices_by_watches": po.generator_indices_by_watches,
            "cs_polynomials": cs.polynomials,
            "cs_rate_bits": cs.rate_bits,
            "cs_cap_height": cs.merkle_tree.cap_height,
            "sigmas": po.sigmas,
            "subgroup": po.subgroup,
            "public_inputs": po.public_inputs,
            "representative_map": po.representative_map,
            "circuit_digest": po.circuit_digest,
        },
        "extra": extra,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=5)
    os.replace(tmp, path)


def load_circuit(path: str, use_device: Optional[bool] = None,
                 expect_sha256: Optional[str] = None):
    """Returns (CircuitData, extra) or None if absent/unreadable.

    ``expect_sha256`` pins the file digest BEFORE unpickling — pickle.load
    executes arbitrary code, so callers loading a blob that travelled
    through version control (bench.py's flagship circuit) must refuse a
    tampered file rather than deserialize it."""
    if not os.path.exists(path):
        return None
    if expect_sha256 is not None:
        import hashlib
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 24), b""):
                h.update(chunk)
        if h.hexdigest() != expect_sha256:
            import sys
            print(f"circuit_cache: sha256 mismatch for {path}; refusing "
                  f"to unpickle (got {h.hexdigest()[:16]}...)",
                  file=sys.stderr)
            return None
    from ..fri.oracle import PolynomialBatch
    from ..plonk.circuit_data import (CircuitData, ProverOnlyCircuitData)
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    except Exception:
        return None
    p = payload["prover_only"]
    common = payload["common"]
    cs = PolynomialBatch.from_coeffs(
        p["cs_polynomials"], p["cs_rate_bits"], False, p["cs_cap_height"],
        use_device=use_device, hasher=common.hasher())
    prover_only = ProverOnlyCircuitData(
        generators=p["generators"],
        generator_indices_by_watches=p["generator_indices_by_watches"],
        constants_sigmas_commitment=cs,
        sigmas=p["sigmas"], subgroup=p["subgroup"],
        public_inputs=p["public_inputs"],
        representative_map=p["representative_map"],
        circuit_digest=p["circuit_digest"])
    data = CircuitData(prover_only=prover_only,
                       verifier_only=payload["verifier_only"],
                       common=common)
    return data, payload.get("extra")
