"""Poseidon round-constant generation
(reference plonky2/src/bin/generate_constants.rs): ChaCha8 seeded with 0,
uniform sampling below the Goldilocks order.

Reproduces the Rust `rand` stack bit-for-bit: `seed_from_u64` expands the
seed with SplitMix64, `ChaCha8Rng` streams 64-byte blocks of 8-round ChaCha,
and `gen_range(0..ORDER)` is Lemire's widening-multiply rejection sampler —
so the output equals plonky2's hardcoded ALL_ROUND_CONSTANTS."""
from __future__ import annotations

from typing import Iterator, List

M64 = (1 << 64) - 1
M32 = (1 << 32) - 1


def _pcg32_words(seed: int) -> Iterator[int]:
    """rand_core 0.6 seed_from_u64: PCG32 stream expands the u64 seed."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    state = seed & M64
    while True:
        state = (state * MUL + INC) & M64
        xorshifted = (((state >> 18) ^ state) >> 27) & M32
        rot = state >> 59
        yield ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & M32


def _chacha_quarter(state, a, b, c, d):
    state[a] = (state[a] + state[b]) & M32
    state[d] ^= state[a]
    state[d] = ((state[d] << 16) | (state[d] >> 16)) & M32
    state[c] = (state[c] + state[d]) & M32
    state[b] ^= state[c]
    state[b] = ((state[b] << 12) | (state[b] >> 20)) & M32
    state[a] = (state[a] + state[b]) & M32
    state[d] ^= state[a]
    state[d] = ((state[d] << 8) | (state[d] >> 24)) & M32
    state[c] = (state[c] + state[d]) & M32
    state[b] ^= state[c]
    state[b] = ((state[b] << 7) | (state[b] >> 25)) & M32


def _chacha_block(key_words: List[int], counter: int, rounds: int) -> List[int]:
    state = ([0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
             + key_words
             + [counter & M32, (counter >> 32) & M32, 0, 0])
    work = list(state)
    for _ in range(rounds // 2):
        _chacha_quarter(work, 0, 4, 8, 12)
        _chacha_quarter(work, 1, 5, 9, 13)
        _chacha_quarter(work, 2, 6, 10, 14)
        _chacha_quarter(work, 3, 7, 11, 15)
        _chacha_quarter(work, 0, 5, 10, 15)
        _chacha_quarter(work, 1, 6, 11, 12)
        _chacha_quarter(work, 2, 7, 8, 13)
        _chacha_quarter(work, 3, 4, 9, 14)
    return [(w + s) & M32 for w, s in zip(work, state)]


class ChaCha8Rng:
    """rand_chacha's ChaCha8Rng: 64-bit block counter, zero stream nonce."""

    def __init__(self, seed_u64: int):
        pcg = _pcg32_words(seed_u64)
        self.key_words = [next(pcg) for _ in range(8)]
        self.counter = 0
        self.buffer: List[int] = []

    def next_u32(self) -> int:
        if not self.buffer:
            self.buffer = _chacha_block(self.key_words, self.counter, 8)
            self.counter += 1
        return self.buffer.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    def gen_range_u64(self, end: int) -> int:
        """rand 0.8 UniformInt::<u64>::sample_single(0, end): Lemire's
        widening multiply with the leading-zeros zone."""
        range_ = end
        clz = 64 - range_.bit_length()
        zone = ((range_ << clz) - 1) & M64
        while True:
            v = self.next_u64()
            prod = v * range_
            hi, lo = prod >> 64, prod & M64
            if lo <= zone:
                return hi


def generate_poseidon_constants(n: int = 12 * 30) -> List[int]:
    """(reference generate_constants.rs:14-31)."""
    P = (1 << 64) - (1 << 32) + 1
    rng = ChaCha8Rng(0)
    return [rng.gen_range_u64(P) for _ in range(n)]


if __name__ == "__main__":
    cs = generate_poseidon_constants()
    for start in range(0, len(cs), 4):
        print(", ".join(f"{c:#018x}" for c in cs[start:start + 4]) + ",")
