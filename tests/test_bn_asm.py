"""BN254 kernel curve ops (evm/bn_asm.py) against the reference's
cpu/kernel/tests/curve_ops.rs `mod bn` vectors, verbatim."""
import pytest

from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.bn_asm import BN_ASM

P = 0x30644E72E131A029B85045B68181585D97816A916871CA8D3C208C16D87CFD47
MAX = (1 << 256) - 1

POINT0 = (0x1feee7ec986e198890cb83be8b8ba09ee953b3f149db6d9bfdaa5c308a33e58d,
          0x2051cc9a9edd46231604fd88f351e95ec72a285be93e289ac59cb48561efb2c6)
POINT1 = (0x15b64d0a5f329fb672029298be8050f444626e6de11903caffa74b388075be1b,
          0x2d9e07340bd5cd7b70687b98f2500ff930a89a30d7b6a3e04b1b4d345319d234)
POINT2 = (0x18659c0e0a8fedcb8747cf463fc7cfa05f667d84e771d0a9521fc1a550688f0c,
          0x283ed10b42703e187e7a808aeb45c6b457bc4cc7d704e53b3348a1e3b0bfa55b)
POINT3 = (0x17da2b7b1a01c8dfdf0f5a6415833c7d755d219aa7e2c4cd0ac83d87d0ca4217,
          0xc9ace9de14aac8114541b50c19320eb40f0eeac3621526d9e34dbcf4c3a6c0f)
S = 0xabb2a34c0e7956cfe6cef9ddb7e810c45ea19a6ebadd79c21959af09f5ba480a
POINT4 = (0xe519344959cc17021fe98878f947f5c1b1675325533a620c1684cfa6367e6c0,
          0x7496a7575b0b6a821e19ce780ecc3e0b156e605327798693defeb9f265b7a6f)
IDENTITY = (0, 0)
INVALID = (0, 3)


def ff_provider(fn, state):
    assert fn == ("ff", "bn254_base", "inverse")
    return pow(state.stack[-1], P - 2, P)


@pytest.fixture(scope="module")
def kernel():
    return assemble([parse(BN_ASM + "\nGLOBAL test_halt:\n    STOP\n")],
                    evm_constants(), optimize=False)


def _run(kernel, label, stack_bottom_first):
    st = run_with_kernel(kernel, kernel.global_labels[label],
                         list(stack_bottom_first),
                         prover_input=ff_provider, max_steps=2_000_000,
                         halt_offsets=[kernel.global_labels["test_halt"]])
    return st.stack


def test_ec_add(kernel):
    ret = kernel.global_labels["test_halt"]
    # standard additions (both operand orders)
    assert _run(kernel, "ec_add",
                [ret, POINT0[1], POINT0[0], POINT1[1], POINT1[0]]) == \
        [POINT2[1], POINT2[0]]
    assert _run(kernel, "ec_add",
                [ret, POINT1[1], POINT1[0], POINT0[1], POINT0[0]]) == \
        [POINT2[1], POINT2[0]]
    # doubling via ec_add and ec_double
    assert _run(kernel, "ec_add",
                [ret, POINT0[1], POINT0[0], POINT0[1], POINT0[0]]) == \
        [POINT3[1], POINT3[0]]
    assert _run(kernel, "ec_double", [ret, POINT0[1], POINT0[0]]) == \
        [POINT3[1], POINT3[0]]
    # identities
    assert _run(kernel, "ec_add",
                [ret, IDENTITY[1], IDENTITY[0], POINT1[1], POINT1[0]]) == \
        [POINT1[1], POINT1[0]]
    assert _run(kernel, "ec_add",
                [ret, POINT1[1], POINT1[0], IDENTITY[1], IDENTITY[0]]) == \
        [POINT1[1], POINT1[0]]
    assert _run(kernel, "ec_add",
                [ret, IDENTITY[1], IDENTITY[0], IDENTITY[1], IDENTITY[0]]) \
        == [IDENTITY[1], IDENTITY[0]]
    # invalid operands -> (MAX, MAX)
    for a, b in [(INVALID, POINT0), (POINT0, INVALID), (IDENTITY, INVALID),
                 (INVALID, INVALID)]:
        assert _run(kernel, "ec_add",
                    [ret, b[1], b[0], a[1], a[0]]) == [MAX, MAX]


def test_ec_mul(kernel):
    ret = kernel.global_labels["test_halt"]
    assert _run(kernel, "ec_mul", [ret, 2, POINT0[1], POINT0[0]]) == \
        [POINT3[1], POINT3[0]]
    assert _run(kernel, "ec_mul", [ret, S, POINT0[1], POINT0[0]]) == \
        [POINT4[1], POINT4[0]]
    assert _run(kernel, "ec_mul", [ret, 0, POINT0[1], POINT0[0]]) == \
        [IDENTITY[1], IDENTITY[0]]
    assert _run(kernel, "ec_mul", [ret, 1, POINT0[1], POINT0[0]]) == \
        [POINT0[1], POINT0[0]]
    assert _run(kernel, "ec_mul", [ret, S, IDENTITY[1], IDENTITY[0]]) == \
        [IDENTITY[1], IDENTITY[0]]
    assert _run(kernel, "ec_mul", [ret, S, INVALID[1], INVALID[0]]) == \
        [MAX, MAX]


def test_ec_multiple_calls(kernel):
    """ec_add tail-calling into ec_mul via its retdest (curve_ops.rs
    'Multiple calls')."""
    ret = kernel.global_labels["test_halt"]
    ec_mul = kernel.global_labels["ec_mul"]
    got = _run(kernel, "ec_add",
               [ret, S, ec_mul, IDENTITY[1], IDENTITY[0],
                POINT0[1], POINT0[0]])
    assert got == [POINT4[1], POINT4[0]]
