"""Insertion gate/gadget and AS-Waksman permutation/sorting tests (reference
insertion/src and waksman/src tests)."""
import random

from plonky2_tpu.gadgets.permutation import MemoryOpTarget
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

import plonky2_tpu.field.goldilocks as gl

rng = random.Random(0x1A5)


def prove_and_verify(builder, pw):
    data = builder.build()
    proof = data.prove(pw)
    data.verify(proof)


def rand_ext():
    return (rng.randrange(gl.P), rng.randrange(gl.P))


def test_insert_gadget():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pw = PartialWitness()

    vec_size = 5
    vec = [rand_ext() for _ in range(vec_size)]
    element = rand_ext()
    index = rng.randrange(vec_size + 1)

    vec_t = [b.constant_extension(v) for v in vec]
    elem_t = b.constant_extension(element)
    idx_t = b.constant(index)
    out = b.insert(idx_t, elem_t, vec_t)

    expected = vec[:index] + [element] + vec[index:]
    for o, e in zip(out, expected):
        b.connect_extension(o, b.constant_extension(e))
    prove_and_verify(b, pw)


def test_assert_permutation():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pw = PartialWitness()

    n, chunk = 6, 2
    a_vals = [tuple(rng.randrange(gl.P) for _ in range(chunk))
              for _ in range(n)]
    perm = list(range(n))
    rng.shuffle(perm)
    b_vals = [a_vals[p] for p in perm]

    a_t = [[b.add_virtual_target() for _ in range(chunk)] for _ in range(n)]
    b_t = [[b.add_virtual_target() for _ in range(chunk)] for _ in range(n)]
    for chunk_t, chunk_v in zip(a_t + b_t, a_vals + b_vals):
        for t, v in zip(chunk_t, chunk_v):
            pw.set_target(t, v)
    b.assert_permutation(a_t, b_t)
    prove_and_verify(b, pw)


def test_assert_permutation_rejects_non_permutation():
    import pytest
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pw = PartialWitness()
    n, chunk = 4, 1
    a_vals = [(rng.randrange(gl.P),) for _ in range(n)]
    b_vals = list(a_vals)
    b_vals[0] = ((b_vals[0][0] + 1) % gl.P,)

    a_t = [[b.add_virtual_target()] for _ in range(n)]
    b_t = [[b.add_virtual_target()] for _ in range(n)]
    for chunk_t, chunk_v in zip(a_t + b_t, a_vals + b_vals):
        for t, v in zip(chunk_t, chunk_v):
            pw.set_target(t, v)
    b.assert_permutation(a_t, b_t)
    data = b.build()
    with pytest.raises(Exception):
        proof = data.prove(pw)
        data.verify(proof)


def test_sort_memory_ops():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pw = PartialWitness()

    n = 5
    address_bits, timestamp_bits = 10, 10
    ops_vals = []
    seen = set()
    while len(ops_vals) < n:
        addr = rng.randrange(1 << address_bits)
        ts = rng.randrange(1 << timestamp_bits)
        if (addr, ts) in seen:
            continue
        seen.add((addr, ts))
        ops_vals.append((addr, ts, rng.randrange(2), rng.randrange(gl.P)))

    ops_t = []
    for addr, ts, w, v in ops_vals:
        op = MemoryOpTarget(is_write=b.add_virtual_target(),
                            address=b.add_virtual_target(),
                            timestamp=b.add_virtual_target(),
                            value=b.add_virtual_target())
        pw.set_target(op.address, addr)
        pw.set_target(op.timestamp, ts)
        pw.set_target(op.is_write, w)
        pw.set_target(op.value, v)
        ops_t.append(op)

    out = b.sort_memory_ops(ops_t, address_bits, timestamp_bits)
    expected = sorted(ops_vals, key=lambda o: (o[0], o[1]))
    for op_t, (addr, ts, w, v) in zip(out, expected):
        b.connect(op_t.address, b.constant(addr))
        b.connect(op_t.timestamp, b.constant(ts))
        b.connect(op_t.is_write, b.constant(w))
        b.connect(op_t.value, b.constant(v))
    prove_and_verify(b, pw)
