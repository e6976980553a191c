"""Example circuits prove and verify with correct public inputs
(reference plonky2/examples/{factorial,square_root}.rs)."""
import pytest

from plonky2_tpu.models.examples import (_sqrt_mod_p, build_factorial_circuit,
                                         build_square_root_circuit)


def test_sqrt_mod_p():
    P = (1 << 64) - (1 << 32) + 1
    for v in [1, 4, 9, 1234567 * 1234567 % P, P - 1]:
        if pow(v, (P - 1) // 2, P) != 1:
            continue
        r = _sqrt_mod_p(v)
        assert r * r % P == v


@pytest.mark.slow
def test_factorial_circuit():
    data, pw, expected = build_factorial_circuit()
    proof = data.prove(pw)
    assert proof.public_inputs == expected
    data.verify(proof)


@pytest.mark.slow
def test_square_root_circuit():
    data, pw = build_square_root_circuit(x_squared_value=9)
    proof = data.prove(pw)
    assert proof.public_inputs == [9]
    data.verify(proof)


def test_generated_poseidon_constants_match_table():
    """The ChaCha8-based generator must reproduce plonky2's hardcoded
    ALL_ROUND_CONSTANTS exactly (reference bin/generate_constants.rs)."""
    from plonky2_tpu.hash import poseidon as pos
    from plonky2_tpu.utils.generate_constants import \
        generate_poseidon_constants
    cs = generate_poseidon_constants()
    assert cs == [int(x) for x in pos.ALL_ROUND_CONSTANTS][:len(cs)]
