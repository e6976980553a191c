"""Full in-circuit ECDSA signature verification (reference
ecdsa/src/gadgets/ecdsa.rs test_ecdsa_circuit_narrow — the reference also
runs this only on demand as it is a very large circuit)."""
import random

import pytest

from plonky2_tpu.ecdsa import curve as cv
from plonky2_tpu.ecdsa.gadgets import (ECDSAPublicKeyTarget,
                                       ECDSASignatureTarget,
                                       verify_message_circuit)
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


@pytest.mark.heavy
def test_ecdsa_verify_circuit():
    rng = random.Random(0xECD5A)
    config = CircuitConfig.standard_ecc_config()
    pw = PartialWitness()
    b = CircuitBuilder(config)

    n = cv.SECP256K1_N
    msg = rng.randrange(n)
    sk = rng.randrange(1, n)
    pk = cv.public_key(sk)
    sig = cv.sign_message(msg, sk, k=rng.randrange(1, n))
    assert cv.verify_message(msg, sig, pk)

    msg_t = b.constant_nonnative(msg, n)
    pk_t = ECDSAPublicKeyTarget(b.constant_affine_point(pk))
    sig_t = ECDSASignatureTarget(r=b.constant_nonnative(sig.r, n),
                                 s=b.constant_nonnative(sig.s, n))
    verify_message_circuit(b, msg_t, sig_t, pk_t)

    data = b.build()
    proof = data.prove(pw)
    data.verify(proof)
