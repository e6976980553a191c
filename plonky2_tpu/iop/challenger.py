"""Fiat-Shamir Challenger — duplex Poseidon sponge, host side.

Transcript-exact mirror of the reference (plonky2/src/iop/challenger.rs:16-156):
overwrite-mode absorb, output buffer popped from the END, any observe clears
buffered outputs.  All values are canonical python ints / numpy uint64.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..hash import poseidon as pos


class Challenger:
    def __init__(self, permutation=None):
        """permutation: callable [12 ints] -> [12 ints]; defaults to
        Poseidon.  KeccakGoldilocksConfig passes the hash-onion permutation
        (reference Challenger<F, C::Hasher>)."""
        self.sponge_state = np.zeros(pos.WIDTH, dtype=np.uint64)
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []
        self.permutation = permutation if permutation is not None \
            else pos.poseidon_ints

    def observe_element(self, element) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(int(element))
        if len(self.input_buffer) == pos.SPONGE_RATE:
            self._duplexing()

    def observe_elements(self, elements: Sequence) -> None:
        for e in np.asarray(elements, dtype=np.uint64).reshape(-1):
            self.observe_element(e)

    def observe_extension_element(self, element) -> None:
        """element: (2,) array or 2-tuple of basefield coordinates."""
        a = np.asarray(element, dtype=np.uint64).reshape(-1)
        assert a.shape[0] == 2
        self.observe_elements(a)

    def observe_extension_elements(self, elements) -> None:
        for e in np.asarray(elements, dtype=np.uint64).reshape(-1, 2):
            self.observe_extension_element(e)

    def observe_hash(self, hash4) -> None:
        self.observe_elements(np.asarray(hash4, dtype=np.uint64).reshape(4))

    def observe_cap(self, cap) -> None:
        """cap: MerkleCap or (k, 4) digest array."""
        digests = cap.digests if hasattr(cap, "digests") else np.asarray(cap)
        for d in digests.reshape(-1, 4):
            self.observe_hash(d)

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_hash(self) -> np.ndarray:
        return np.array(self.get_n_challenges(4), dtype=np.uint64)

    def get_extension_challenge(self) -> tuple:
        c = self.get_n_challenges(2)
        return (c[0], c[1])

    def get_n_extension_challenges(self, n: int) -> List[tuple]:
        return [self.get_extension_challenge() for _ in range(n)]

    def _duplexing(self) -> None:
        assert len(self.input_buffer) <= pos.SPONGE_RATE
        state = [int(x) for x in self.sponge_state]
        for i, v in enumerate(self.input_buffer):
            state[i] = v
        self.input_buffer.clear()
        state = self.permutation(state)
        self.sponge_state = np.array(state, dtype=np.uint64)
        self.output_buffer = list(state[:pos.SPONGE_RATE])

    def compact(self) -> np.ndarray:
        if self.input_buffer:
            self._duplexing()
        self.output_buffer.clear()
        return self.sponge_state.copy()


class RecursiveChallenger:
    """In-circuit duplex sponge over Targets (reference challenger.rs:164-299).

    Unlike the native Challenger, the input buffer may grow beyond the rate;
    it is absorbed in rate-size overwrite chunks when a challenge is needed,
    which yields the identical transcript.
    """

    def __init__(self, builder):
        zero = builder.zero()
        self.sponge_state = [zero] * pos.WIDTH
        self.input_buffer: list = []
        self.output_buffer: list = []

    @classmethod
    def from_state(cls, builder, state_targets):
        """Resume an in-circuit transcript from a compacted sponge state
        (reference challenger.rs from_state / evm recursive verification)."""
        ch = cls(builder)
        assert len(state_targets) == pos.WIDTH
        ch.sponge_state = list(state_targets)
        return ch

    def compact(self, builder):
        """Absorb any pending inputs and return the sponge state targets,
        mirroring the native Challenger.compact transcript position."""
        if self.input_buffer:
            self._absorb_buffered(builder)
        self.output_buffer.clear()
        return list(self.sponge_state)

    def observe_element(self, target) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(target)

    def observe_elements(self, targets) -> None:
        for t in targets:
            self.observe_element(t)

    def observe_hash(self, hash4) -> None:
        self.observe_elements(hash4)

    def observe_cap(self, cap) -> None:
        for h in cap:
            self.observe_hash(h)

    def observe_extension_element(self, element) -> None:
        self.observe_elements(element)

    def observe_extension_elements(self, elements) -> None:
        for e in elements:
            self.observe_extension_element(e)

    def observe_openings(self, openings) -> None:
        """openings: FriOpeningsTarget."""
        for batch in openings.batches:
            self.observe_extension_elements(batch.values)

    def get_challenge(self, builder):
        self._absorb_buffered(builder)
        if not self.output_buffer:
            self.sponge_state = builder.permute(self.sponge_state)
            self.output_buffer = list(self.sponge_state[:pos.SPONGE_RATE])
        return self.output_buffer.pop()

    def get_n_challenges(self, builder, n: int) -> list:
        return [self.get_challenge(builder) for _ in range(n)]

    def get_hash(self, builder) -> tuple:
        return tuple(self.get_n_challenges(builder, 4))

    def get_extension_challenge(self, builder) -> tuple:
        return tuple(self.get_n_challenges(builder, 2))

    def _absorb_buffered(self, builder) -> None:
        if not self.input_buffer:
            return
        for start in range(0, len(self.input_buffer), pos.SPONGE_RATE):
            chunk = self.input_buffer[start:start + pos.SPONGE_RATE]
            for i, t in enumerate(chunk):
                self.sponge_state[i] = t
            self.sponge_state = builder.permute(self.sponge_state)
        self.output_buffer = list(self.sponge_state[:pos.SPONGE_RATE])
        self.input_buffer.clear()

    def fri_challenges(self, builder, commit_phase_merkle_caps, final_poly,
                       pow_witness, inner_fri_config):
        """Returns FriChallengesTarget (reference fri/challenges.rs:76-112)."""
        from ..fri.recursive_verifier import FriChallengesTarget
        fri_alpha = self.get_extension_challenge(builder)
        fri_betas = []
        for cap in commit_phase_merkle_caps:
            self.observe_cap(cap)
            fri_betas.append(self.get_extension_challenge(builder))
        self.observe_extension_elements(final_poly.coeffs)
        self.observe_element(pow_witness)
        fri_pow_response = self.get_challenge(builder)
        fri_query_indices = self.get_n_challenges(
            builder, inner_fri_config.num_query_rounds)
        return FriChallengesTarget(
            fri_alpha=fri_alpha, fri_betas=fri_betas,
            fri_pow_response=fri_pow_response,
            fri_query_indices=fri_query_indices)
