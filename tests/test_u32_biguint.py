"""u32, biguint, and nonnative gadget tests (reference u32/src/gadgets tests,
ecdsa/src/gadgets/{biguint,nonnative}.rs tests)."""
import random

from plonky2_tpu.ecdsa.curve import SECP256K1_P
from plonky2_tpu.gadgets.biguint import set_biguint_target
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

rng = random.Random(0xBEEF)


def prove_and_verify(builder, pw):
    data = builder.build()
    proof = data.prove(pw)
    data.verify(proof)


def test_u32_arithmetic():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    x, y, z = (rng.randrange(1 << 32) for _ in range(3))
    yt, zt = b.constant_u32(y), b.constant_u32(z)
    # route x through a virtual target so the op isn't constant-folded
    xv = b.add_virtual_u32_target()
    pw.set_target(xv, x)
    lo, hi = b.mul_add_u32(xv, yt, zt)
    b.connect(lo, b.constant_u32((x * y + z) & 0xFFFFFFFF))
    b.connect(hi, b.constant_u32((x * y + z) >> 32))

    # add_many with carry
    vals = [rng.randrange(1 << 32) for _ in range(10)]
    vts = [b.add_virtual_u32_target() for _ in vals]
    for t, v in zip(vts, vals):
        pw.set_target(t, v)
    total = sum(vals)
    lo, hi = b.add_many_u32(vts)
    b.connect(lo, b.constant_u32(total & 0xFFFFFFFF))
    b.connect(hi, b.constant_u32(total >> 32))

    # subtraction with borrow
    s_lo, s_borrow = b.sub_u32(vts[0], vts[1], b.zero_u32())
    diff = vals[0] - vals[1]
    borrow = 1 if diff < 0 else 0
    b.connect(s_lo, b.constant_u32(diff + (borrow << 32)))
    b.connect(s_borrow, b.constant(borrow))

    # range check + list_le
    b.range_check_u32(vts[:4])
    le = b.list_le_u32([vts[0]], [vts[1]])
    b.connect(le, b.constant(1 if vals[0] <= vals[1] else 0))
    prove_and_verify(b, pw)


def test_biguint_mul_div_cmp():
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    x = rng.randrange(1 << 128)
    y = rng.randrange(1, 1 << 96)
    xt = b.add_virtual_biguint_target(4)
    yt = b.add_virtual_biguint_target(3)
    set_biguint_target(pw, xt, x)
    set_biguint_target(pw, yt, y)

    z = b.mul_biguint(xt, yt)
    b.connect_biguint(z, b.constant_biguint(x * y))

    s = b.add_biguint(xt, yt)
    b.connect_biguint(s, b.constant_biguint(x + y))

    d = b.sub_biguint(xt, yt) if x >= y else b.sub_biguint(yt, xt)
    b.connect_biguint(d, b.constant_biguint(abs(x - y)))

    div, rem = b.div_rem_biguint(xt, yt)
    b.connect_biguint(div, b.constant_biguint(x // y))
    b.connect_biguint(rem, b.constant_biguint(x % y))

    cmp = b.cmp_biguint(xt, yt)
    b.connect(cmp, b.constant(1 if x <= y else 0))
    prove_and_verify(b, pw)


def test_nonnative_field_ops():
    p = SECP256K1_P
    b = CircuitBuilder(CircuitConfig.standard_ecc_config())
    pw = PartialWitness()

    x = rng.randrange(p)
    y = rng.randrange(1, p)
    xt = b.constant_nonnative(x, p)
    yt = b.constant_nonnative(y, p)

    s = b.add_nonnative(xt, yt)
    b.connect_nonnative(s, b.constant_nonnative((x + y) % p, p))

    d = b.sub_nonnative(xt, yt)
    b.connect_nonnative(d, b.constant_nonnative((x - y) % p, p))

    m = b.mul_nonnative(xt, yt)
    b.connect_nonnative(m, b.constant_nonnative(x * y % p, p))

    inv = b.inv_nonnative(yt)
    b.connect_nonnative(inv, b.constant_nonnative(pow(y, -1, p), p))

    n = b.neg_nonnative(xt)
    b.connect_nonnative(n, b.constant_nonnative((-x) % p, p))

    many = b.add_many_nonnative([xt, yt, xt])
    b.connect_nonnative(many, b.constant_nonnative((2 * x + y) % p, p))
    prove_and_verify(b, pw)
