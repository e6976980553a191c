"""Golden vectors: fixed literals pinning field semantics, FFT answers, and
the full Fiat-Shamir transcript (SURVEY §4; BASELINE transcript-exactness).

The field/FFT vectors are derived INDEPENDENTLY of the implementations
under test (pure-python pow/mul and Horner evaluation); the transcript
digest freezes this framework's own proof bytes so any accidental
Fiat-Shamir / serialization / challenger change is caught — the
stage-by-stage analog of the reference's criterion for bit-exactness.
"""
import hashlib
import random

import numpy as np
import pytest

from plonky2_tpu.field import fft_numpy as fnp
from plonky2_tpu.field import goldilocks as gl

P = (1 << 64) - (1 << 32) + 1


# --- field golden vectors (independent: python pow/%) -----------------------

FIELD_MUL_VECTORS = [
    # (a, b, a*b mod p) — boundary structure values
    (1 << 63, 2, 0xFFFFFFFF),             # 2^64 ≡ 2^32 - 1 (epsilon)
    (P - 1, P - 1, 1),
    (P - 1, 2, P - 2),
    (1 << 32, 1 << 32, 0xFFFFFFFF),
    (0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFE00000001),
    (1234567891011121314, 9876543210987654321,
     1234567891011121314 * 9876543210987654321 % P),
]


def test_field_mul_golden():
    for a, b, c in FIELD_MUL_VECTORS:
        assert a * b % P == c                     # literal really is a*b%p
        assert int(gl.mul(np.uint64(a), np.uint64(b))) == c


def test_field_inverse_golden():
    for a in [1, 2, 0xFFFFFFFF, 1 << 32, P - 1, 0xFFFFFFFF00000000]:
        inv = int(gl.inverse(np.uint64(a)))
        assert inv == pow(a, P - 2, P)
        assert a * inv % P == 1


def test_gf_jax_matches_golden():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from plonky2_tpu.field import gf_jax as gf
    a = np.array([v[0] for v in FIELD_MUL_VECTORS], dtype=np.uint64)
    b = np.array([v[1] for v in FIELD_MUL_VECTORS], dtype=np.uint64)
    c = np.array([v[2] for v in FIELD_MUL_VECTORS], dtype=np.uint64)
    got = gf.to_u64(gf.mul(gf.from_u64(a), gf.from_u64(b)))
    np.testing.assert_array_equal(got, c)


# --- FFT known answers (independent: Horner at subgroup points) -------------

def test_fft_known_answer():
    coeffs = np.array([3, 1, 4, 1, 5, 9, 2, 6], dtype=np.uint64)
    w = gl.primitive_root_of_unity(3)
    expect = []
    for i in range(8):
        x = pow(int(w), i, P)
        acc = 0
        for c in reversed(coeffs.tolist()):
            acc = (acc * x + int(c)) % P
        expect.append(acc)
    got = fnp.fft(coeffs[None])[0]
    np.testing.assert_array_equal(got, np.array(expect, dtype=np.uint64))
    # roundtrip
    np.testing.assert_array_equal(fnp.ifft(got[None])[0], coeffs)


def test_coset_fft_known_answer():
    coeffs = np.array([7, 0, 0, 2], dtype=np.uint64)
    g = gl.coset_shift()
    w = gl.primitive_root_of_unity(2)
    expect = []
    for i in range(4):
        x = int(g) * pow(int(w), i, P) % P
        expect.append((7 + 2 * pow(x, 3, P)) % P)
    got = fnp.coset_fft(coeffs[None])[0]
    np.testing.assert_array_equal(got, np.array(expect, dtype=np.uint64))


# --- frozen transcript ------------------------------------------------------

FROZEN_CIRCUIT_DIGEST = [10084495102491018308, 7705674286920539665,
                         7492695590598488414, 7240379109088082636]
FROZEN_PROOF_SHA256 = \
    "20d02db200cd237a2931679b2a5cb55cc3e018c86c46c9da6f0acff91eba3124"
FROZEN_PROOF_LEN = 25104


@pytest.mark.slow
def test_frozen_fibonacci_transcript(monkeypatch):
    """The complete serialized proof of the seeded fibonacci circuit must
    be byte-stable across refactors (challenger order, PoW grind, FRI
    folds, serialization layout all pinned by one sha256)."""
    import plonky2_tpu.iop.generator as gen_mod
    from plonky2_tpu.models.fibonacci import build_fibonacci_circuit
    from plonky2_tpu.plonk.prover import prove
    from plonky2_tpu.utils.serialization import serialize_proof
    from tests.test_plonk import fast_test_config

    rng = random.Random(0x60)

    def run_once(self, witness, out):
        out.append((self.target, rng.randrange(gl.P)))

    monkeypatch.setattr(gen_mod.RandomValueGenerator, "run_once", run_once)
    data, pw, _ = build_fibonacci_circuit(fast_test_config())
    assert [int(x) for x in data.prover_only.circuit_digest] == \
        FROZEN_CIRCUIT_DIGEST
    proof = prove(data.prover_only, data.common, pw, use_device=False)
    raw = serialize_proof(proof)
    assert len(raw) == FROZEN_PROOF_LEN
    assert hashlib.sha256(raw).hexdigest() == FROZEN_PROOF_SHA256
