"""Hasher configurations (reference plonky2/src/plonk/config.rs:97-126).

``PoseidonGoldilocksConfig``: algebraic Poseidon digests, vectorized on
device.  ``KeccakGoldilocksConfig``: 25-byte Keccak digests, host-side; the
digests travel through the same (..., 4)-uint64 containers via the lossless
7-byte-chunk field encoding (BytesHash::to_vec, hash_types.rs:179), so caps,
challenger observation, and serialization are hasher-agnostic.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from . import keccak as kc
from . import poseidon as pos


def _keccak_digest_to_elems(digest: bytes) -> List[int]:
    return kc.KeccakHasher.hash_to_elements(digest)


def _elems_to_keccak_digest(elems: Sequence[int]) -> bytes:
    out = b"".join(int(e).to_bytes(7, "little") for e in elems[:3])
    return out + int(elems[3]).to_bytes(4, "little")


class PoseidonConfig:
    name = "PoseidonGoldilocksConfig"
    algebraic = True

    @staticmethod
    def hash_leaves(leaves: np.ndarray) -> np.ndarray:
        N, L = leaves.shape
        if L <= 4:
            out = np.zeros((N, 4), dtype=np.uint64)
            out[:, :L] = leaves
            return out
        return pos.hash_batch_no_pad(leaves)

    @staticmethod
    def compress_batch(left: np.ndarray, right: np.ndarray) -> np.ndarray:
        return pos.compress_batch(left, right)

    @staticmethod
    def hash_or_noop_ints(leaf: List[int]) -> List[int]:
        if len(leaf) <= 4:
            return leaf + [0] * (4 - len(leaf))
        state = [0] * 12
        for start in range(0, len(leaf), 8):
            chunk = leaf[start:start + 8]
            state = chunk + state[len(chunk):]
            state = pos.poseidon_ints(state)
        return state[:4]

    @staticmethod
    def compress_ints(left: List[int], right: List[int]) -> List[int]:
        return pos.poseidon_ints(left + right + [0, 0, 0, 0])[:4]

    @staticmethod
    def permute(state: Sequence[int]) -> List[int]:
        return pos.poseidon_ints(list(state))

    @staticmethod
    def hash_no_pad_elements(inputs: np.ndarray) -> np.ndarray:
        return pos.hash_no_pad(np.asarray(inputs, dtype=np.uint64))

    @staticmethod
    def hash_pad_elements(inputs: List[int]) -> np.ndarray:
        padded = list(inputs) + [1]
        while (len(padded) + 1) % 12 != 0:
            padded.append(0)
        padded.append(1)
        return pos.hash_no_pad(np.array(padded, dtype=np.uint64))


class KeccakConfig:
    name = "KeccakGoldilocksConfig"
    algebraic = False

    @staticmethod
    def hash_leaves(leaves: np.ndarray) -> np.ndarray:
        N, L = leaves.shape
        out = np.zeros((N, 4), dtype=np.uint64)
        for i in range(N):
            digest = kc.KeccakHasher.hash_or_noop([int(x) for x in leaves[i]])
            out[i] = _keccak_digest_to_elems(digest)
        return out

    @staticmethod
    def compress_batch(left: np.ndarray, right: np.ndarray) -> np.ndarray:
        out = np.zeros_like(left)
        for i in range(left.shape[0]):
            d = kc.KeccakHasher.two_to_one(
                _elems_to_keccak_digest([int(x) for x in left[i]]),
                _elems_to_keccak_digest([int(x) for x in right[i]]))
            out[i] = _keccak_digest_to_elems(d)
        return out

    @staticmethod
    def hash_or_noop_ints(leaf: List[int]) -> List[int]:
        return _keccak_digest_to_elems(kc.KeccakHasher.hash_or_noop(leaf))

    @staticmethod
    def compress_ints(left: List[int], right: List[int]) -> List[int]:
        d = kc.KeccakHasher.two_to_one(_elems_to_keccak_digest(left),
                                       _elems_to_keccak_digest(right))
        return _keccak_digest_to_elems(d)

    @staticmethod
    def permute(state: Sequence[int]) -> List[int]:
        return kc.KeccakHasher.permute(state)

    @staticmethod
    def hash_no_pad_elements(inputs: np.ndarray) -> np.ndarray:
        digest = kc.KeccakHasher.hash_no_pad(
            [int(x) for x in np.asarray(inputs, dtype=np.uint64).reshape(-1)])
        return np.array(_keccak_digest_to_elems(digest), dtype=np.uint64)

    @staticmethod
    def hash_pad_elements(inputs: List[int]) -> np.ndarray:
        padded = list(inputs) + [1]
        while (len(padded) + 1) % 12 != 0:
            padded.append(0)
        padded.append(1)
        return KeccakConfig.hash_no_pad_elements(
            np.array(padded, dtype=np.uint64))


POSEIDON_CONFIG = PoseidonConfig()
KECCAK_CONFIG = KeccakConfig()
