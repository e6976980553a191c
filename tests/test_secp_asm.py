"""Kernel-asm tests for the secp256k1 routine library (evm/secp_asm.py),
run in the offline interpreter exactly like the reference tests its kernel:
cpu/kernel/tests/ecrecover.rs (vectors reproduced verbatim) and
tests/curve_ops.rs (point conventions), plus the byte/RLP utilities
(kernel/asm_util.py, spec'd by tests/rlp/encode.rs-style cases)."""
import pytest

from plonky2_tpu.evm.kernel import assemble, parse
from plonky2_tpu.evm.kernel.asm_util import UTIL_ASM
from plonky2_tpu.evm.kernel.constants import evm_constants
from plonky2_tpu.evm.kernel.interpreter import run_with_kernel
from plonky2_tpu.evm.memory import Segment
from plonky2_tpu.evm.secp_asm import SECP_ASM
from plonky2_tpu.hash.keccak import keccak256

P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
U256_MAX = (1 << 256) - 1


def ff_provider(fn, state):
    """PROVER_INPUT(ff::...) dispatch for interpreter runs (subset of
    evm/block.py BlockProverInputs)."""
    assert fn[0] == "ff"
    mod = {"secp256k1_base": P, "secp256k1_scalar": N}[fn[1]]
    x = state.stack[-1]
    if fn[2] == "inverse":
        return pow(x, mod - 2, mod)
    if fn[2] == "sqrt":
        assert (mod + 1) % 4 == 0
        return pow(x, (mod + 1) // 4, mod)
    raise AssertionError(fn)


@pytest.fixture(scope="module")
def kernel():
    asm = UTIL_ASM + SECP_ASM + """
GLOBAL test_halt:
    STOP
"""
    return assemble([parse(asm)], evm_constants(), optimize=False)


def _run(kernel, label, stack_bottom_first, segmem=None, max_steps=2_000_000):
    """Reference convention: initial_stack lists bottom-first
    (tests/mod.rs u256ify), so the LAST element is the stack top."""
    st = run_with_kernel(kernel, kernel.global_labels[label],
                         list(stack_bottom_first), segmem=segmem,
                         prover_input=ff_provider, max_steps=max_steps,
                         halt_offsets=[kernel.global_labels["test_halt"]])
    return st


def _ret(kernel):
    return kernel.global_labels["test_halt"]


# --- point arithmetic (secp256k1 analogues of tests/curve_ops.rs) ----------

def _py_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2:
        if y1 != y2:
            return None
        lam = 3 * x1 * x1 * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _py_mul(k, pt):
    acc = None
    while k:
        if k & 1:
            acc = _py_add(acc, pt)
        pt = _py_add(pt, pt)
        k >>= 1
    return acc


G = (GX, GY)
G2 = _py_mul(2, G)
G3 = _py_mul(3, G)


def test_secp_double(kernel):
    st = _run(kernel, "secp_double", [_ret(kernel), GY, GX])
    assert st.stack == [G2[1], G2[0]]


def test_secp_double_identity(kernel):
    st = _run(kernel, "secp_double", [_ret(kernel), 0, 0])
    assert st.stack == [0, 0]


def test_secp_add_cases(kernel):
    # bottom-first: [ret, y2, x2, y1, x1] — P1 on top
    st = _run(kernel, "secp_add", [_ret(kernel), G2[1], G2[0], GY, GX])
    assert st.stack == [G3[1], G3[0]]
    # same point -> doubling
    st = _run(kernel, "secp_add", [_ret(kernel), GY, GX, GY, GX])
    assert st.stack == [G2[1], G2[0]]
    # identities
    st = _run(kernel, "secp_add", [_ret(kernel), GY, GX, 0, 0])
    assert st.stack == [GY, GX]
    st = _run(kernel, "secp_add", [_ret(kernel), 0, 0, GY, GX])
    assert st.stack == [GY, GX]
    st = _run(kernel, "secp_add", [_ret(kernel), 0, 0, 0, 0])
    assert st.stack == [0, 0]
    # P + (-P) = identity
    st = _run(kernel, "secp_add", [_ret(kernel), P - GY, GX, GY, GX])
    assert st.stack == [0, 0]


def test_secp_scalar_mul(kernel):
    s = 0xabb2a34c0e7956cfe6cef9ddb7e810c45ea19a6ebadd79c21959af09f5ba480a
    want = _py_mul(s, G)
    st = _run(kernel, "secp_scalar_mul", [_ret(kernel), GY, GX, s])
    assert st.stack == [want[1], want[0]]
    st = _run(kernel, "secp_scalar_mul", [_ret(kernel), GY, GX, 0])
    assert st.stack == [0, 0]
    st = _run(kernel, "secp_scalar_mul", [_ret(kernel), GY, GX, 1])
    assert st.stack == [GY, GX]


# --- ecrecover (vectors verbatim from tests/ecrecover.rs) -------------------

def _ecrecover(kernel, hash_, v, r, s):
    # reference: initial_stack = u256ify(["0xdeadbeef", s, r, v, hash])
    st = _run(kernel, "ecrecover", [_ret(kernel), s, r, v, hash_])
    assert len(st.stack) == 1
    return st.stack[0]


def test_valid_ecrecover(kernel):
    h = 0x55f77e8909b1f1c9531c4a309bb2d40388e9ed4b87830c8f90363c6b36255fb9
    r = 0xd667c5a20fa899b253924099e10ae92998626718585b8171eb98de468bbebc
    s = 0x58351f48ce34bf134ee611fb5bf255a5733f0029561d345a7d46bfa344b60ac0
    assert _ecrecover(kernel, h, 0x1b, r, s) == \
        0x67f3c0Da351384838d7F7641AB0fCAcF853E1844
    assert _ecrecover(kernel, h, 0x1c, r, s) == \
        0xaA58436DeABb64982a386B2De1A8015AA28fCCc0
    assert _ecrecover(
        kernel, 0x0, 0x1c, 0x1,
        0xfffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364140,
    ) == 0x3344c6f6eeCA588be132142DB0a32C71ABFAAe7B


def test_invalid_ecrecover(kernel):
    r = 0xd667c5a20fa899b253924099e10ae92998626718585b8171eb98de468bbebc
    smax = 0xfffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364140
    # v not in {27, 28}
    assert _ecrecover(kernel, 0, 0x42, 0x1, smax) == U256_MAX
    # s = 0
    assert _ecrecover(kernel, 0, 0x42, r, 0x0) == U256_MAX
    # r = 0
    assert _ecrecover(kernel, 0, 0x42, 0x0, r) == U256_MAX
    # r^3 + 7 is not a square
    assert _ecrecover(
        kernel, 0, 0x1c,
        0x3a18b21408d275dde53c0ea86f9c1982eca60193db0ce15008fa408d43024847,
        0x5db9745f44089305b2f2c980276e7025a594828d878e6e36dd2abd34ca6b9e3d,
    ) == U256_MAX
    # r >= n (the r+n overflow candidate is explicitly unrecoverable)
    assert _ecrecover(kernel, 0, 0x1b, N, 0x1) == U256_MAX
    assert _ecrecover(kernel, 0, 0x1b, N + 5, 0x1) == U256_MAX


# --- byte/RLP utilities ------------------------------------------------------

def test_store_load_be(kernel):
    seg = int(Segment.KernelGeneral)
    val = 0x0102030405060708090A0B0C0D0E0F
    st = _run(kernel, "store_be", [_ret(kernel), 15, 3, val, seg])
    got = bytes(st.segmem.get((0, seg, 3 + i), 0) for i in range(15))
    assert got == val.to_bytes(15, "big")
    st2 = run_with_kernel(kernel, kernel.global_labels["load_be"],
                          [_ret(kernel), 15, 3, seg], segmem=st.segmem,
                          halt_offsets=[_ret(kernel)])
    assert st2.stack == [val]


def test_u256_byteswap(kernel):
    x = int.from_bytes(bytes(range(32)), "big")
    st = _run(kernel, "u256_byteswap", [_ret(kernel), x])
    assert st.stack == [int.from_bytes(bytes(range(32)), "little")]


def test_u256_bytelen(kernel):
    for v, want in [(0, 0), (1, 1), (0xFF, 1), (0x100, 2),
                    ((1 << 256) - 1, 32)]:
        st = _run(kernel, "u256_bytelen", [_ret(kernel), v])
        assert st.stack == [want], v


def test_rlp_write_scalar(kernel):
    from plonky2_tpu.evm import rlp
    seg = int(Segment.KernelGeneral)
    for v in [0, 1, 0x7F, 0x80, 0xFF, 0x100, 1234567, (1 << 256) - 1]:
        st = _run(kernel, "rlp_write_scalar", [_ret(kernel), v, 5, seg])
        want = rlp.encode(rlp.encode_int(v))
        assert st.stack == [5 + len(want)], v
        got = bytes(st.segmem.get((0, seg, 5 + i), 0)
                    for i in range(len(want)))
        assert got == want, v


def test_rlp_write_list_prefix(kernel):
    seg = int(Segment.KernelGeneral)
    for plen, want in [(0, b"\xc0"), (3, b"\xc3"), (55, b"\xf7"),
                       (56, b"\xf8\x38"), (300, b"\xf9\x01\x2c")]:
        st = _run(kernel, "rlp_write_list_prefix",
                  [_ret(kernel), plen, 9, seg])
        hstart = st.stack[0]
        assert hstart == 9 - len(want), plen
        got = bytes(st.segmem.get((0, seg, hstart + i), 0)
                    for i in range(len(want)))
        assert got == want, plen


def test_pubkey_to_addr(kernel):
    q = _py_mul(12345, G)
    st = _run(kernel, "pubkey_to_addr", [_ret(kernel), q[1], q[0]])
    pub = q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
    want = int.from_bytes(keccak256(pub)[12:], "big")
    assert st.stack == [want]
