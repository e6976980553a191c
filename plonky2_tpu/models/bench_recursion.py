"""Recursive-shrink benchmark: dummy proof -> single recursion -> double
recursion, with serialization/compression size reporting
(reference plonky2/examples/bench_recursion.rs:93-215).

Run directly: ``python -m plonky2_tpu.models.bench_recursion [log2_inner]``.
"""
from __future__ import annotations

import time

from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.compression import compress_proof, decompress_proof
from ..plonk.config import CircuitConfig
from ..utils.serialization import (serialize_compressed_proof,
                                   serialize_proof)
from ..utils.timing import TimingTree


def dummy_proof_tuple(config: CircuitConfig, log2_size: int):
    """A proof of a no-op circuit padded to 2^log2_size gates
    (reference bench_recursion.rs:70-91)."""
    builder = CircuitBuilder(config)
    num_dummy_gates = (1 << (log2_size - 1)) + 1 if log2_size > 1 else 0
    from ..gates.basic import NoopGate
    for _ in range(num_dummy_gates):
        builder.add_gate(NoopGate(), [])
    data = builder.build()
    proof = data.prove(PartialWitness())
    data.verify(proof)
    return proof, data.verifier_only, data.common


def recursive_proof(inner, config: CircuitConfig, min_degree_bits=None):
    """(reference bench_recursion.rs:93-142)."""
    inner_proof, inner_vd, inner_cd = inner
    builder = CircuitBuilder(config)
    pt = builder.add_virtual_proof_with_pis(inner_cd)
    vt = builder.add_virtual_verifier_data(
        inner_cd.config.fri_config.cap_height)
    builder.verify_proof(pt, vt, inner_cd)
    if min_degree_bits is not None:
        from ..gates.basic import NoopGate
        min_gates = (1 << (min_degree_bits - 1)) + 1
        while builder.num_gates() < min_gates:
            builder.add_gate(NoopGate(), [])
    data = builder.build()

    pw = PartialWitness()
    pw.set_proof_with_pis_target(pt, inner_proof)
    pw.set_verifier_data_target(vt, inner_vd)
    timing = TimingTree("prove")
    from ..plonk.prover import prove
    proof = prove(data.prover_only, data.common, pw, timing=timing)
    timing.print()
    data.verify(proof)
    return proof, data.verifier_only, data.common


def report_serialization(proof, vd, cd) -> dict:
    """(reference bench_recursion.rs:146-174)."""
    proof_bytes = serialize_proof(proof)
    t0 = time.perf_counter()
    compressed = compress_proof(proof, vd.circuit_digest, cd)
    compress_s = time.perf_counter() - t0
    restored = decompress_proof(compressed, vd.circuit_digest, cd)
    assert serialize_proof(restored) == proof_bytes
    cbytes = serialize_compressed_proof(compressed)
    return {"proof_bytes": len(proof_bytes),
            "compressed_bytes": len(cbytes),
            "compress_seconds": compress_s}


def benchmark(config: CircuitConfig | None = None,
              log2_inner_size: int = 8) -> dict:
    """(reference bench_recursion.rs:177-215)."""
    config = config or CircuitConfig.standard_recursion_config()
    inner = dummy_proof_tuple(config, log2_inner_size)
    print(f"Initial proof degree 2^{inner[2].degree_bits()}")
    middle = recursive_proof(inner, config)
    print(f"Single recursion proof degree 2^{middle[2].degree_bits()}")
    outer = recursive_proof(middle, config)
    print(f"Double recursion proof degree 2^{outer[2].degree_bits()}")
    sizes = report_serialization(*outer)
    print(sizes)
    return sizes


if __name__ == "__main__":
    import sys
    log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    benchmark(log2_inner_size=log2)
