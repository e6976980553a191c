"""Keccak-256 hasher for the non-algebraic KeccakGoldilocksConfig (reference
plonky2/src/hash/keccak.rs, hash/hash_types.rs BytesHash).

Digests are 25-byte ``bytes`` (HASH_SIZE = 25).  The challenger
"permutation" is the hash-onion construction: the 12-element state maps to
field elements parsed (with rejection sampling) from the stream
H(state) || H(H(state)) || ... (reference keccak.rs:14-51).
"""
from __future__ import annotations

from typing import List, Sequence

from ..field import goldilocks as gl

HASH_SIZE = 25  # bytes, like the reference's KeccakHash<25>

_ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_M64 = (1 << 64) - 1


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _M64


def keccak_f1600(state: List[int]) -> List[int]:
    a = [[state[x + 5 * y] for y in range(5)] for x in range(5)]
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= rc
    return [a[x][y] for y in range(5) for x in range(5)]


def keccak256(data: bytes) -> bytes:
    """Original Keccak-256 (pre-SHA3 padding, as used by Ethereum)."""
    rate = 136
    state = [0] * 25
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 \
        else b"\x81"
    for block_start in range(0, len(padded), rate):
        block = padded[block_start:block_start + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        state = keccak_f1600(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out[:32]


class KeccakHasher:
    """Hasher with 25-byte digests (reference KeccakHash<25>)."""

    HASH_SIZE = HASH_SIZE
    algebraic = False

    @staticmethod
    def hash_no_pad(inputs: Sequence[int]) -> bytes:
        buf = b"".join(int(x).to_bytes(8, "little") for x in inputs)
        return keccak256(buf)[:HASH_SIZE]

    @staticmethod
    def two_to_one(left: bytes, right: bytes) -> bytes:
        return keccak256(left + right)[:HASH_SIZE]

    @staticmethod
    def hash_or_noop(inputs: Sequence[int]) -> bytes:
        """reference hashing.rs hash_or_noop: pack directly when the input
        fits in the digest size."""
        if len(inputs) * 8 <= HASH_SIZE:
            buf = b"".join(int(x).to_bytes(8, "little") for x in inputs)
            return buf + b"\x00" * (HASH_SIZE - len(buf))
        return KeccakHasher.hash_no_pad(inputs)

    @staticmethod
    def hash_to_elements(digest: bytes) -> List[int]:
        """BytesHash -> field elements: 7-byte little-endian chunks
        (reference hash_types.rs:179-189)."""
        return [int.from_bytes(digest[i:i + 7], "little")
                for i in range(0, len(digest), 7)]

    @staticmethod
    def permute(state: Sequence[int]) -> List[int]:
        """Hash-onion pseudo-permutation for the challenger
        (reference keccak.rs:18-51)."""
        buf = b"".join(int(x).to_bytes(8, "little") for x in state)
        out: List[int] = []
        current = bytes(buf)
        while len(out) < 12:
            current = keccak256(current)
            for i in range(0, 32, 8):
                word = int.from_bytes(current[i:i + 8], "little")
                if word < gl.P:  # rejection sampling
                    out.append(word)
                    if len(out) == 12:
                        break
        return out
