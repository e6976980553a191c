"""Device Fiat-Shamir challenger — duplex Poseidon sponge as traced jnp ops.

The host `Challenger` (iop/challenger.py, mirroring reference
iop/challenger.rs:16-156) forces a host<->device round-trip at every
observe-cap/draw-challenge boundary: each FRI fold layer costs a cap D2H,
a host sponge update, and a challenge H2D (~90 ms each through a tunnel-
attached chip).  This device challenger runs the SAME transcript inside a
jit trace: the sponge state is a (12, 1) GF pair, observes absorb traced
device scalars, and challenges come out as traced GF scalars — so an
entire Fiat-Shamir-sequenced phase (e.g. all FRI fold layers + PoW +
query indices) compiles into ONE device program with no host round-trips.

The buffering discipline is byte-identical to the host challenger:
overwrite-mode absorb, output buffer popped from the END, any observe
clears buffered outputs.  Buffer STRUCTURE (lengths, duplex points) is
host-side python state — legal because the transcript's shape is static
per circuit; only the VALUES are traced.
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from ..field import gf_jax as gf
from ..hash import poseidon as pos

# a traced GF scalar: (lo, hi) pair of () uint32 arrays
GFS = Tuple[jnp.ndarray, jnp.ndarray]


class DeviceChallenger:
    def __init__(self):
        self.state: List[GFS] = [
            (jnp.zeros((), jnp.uint32), jnp.zeros((), jnp.uint32))
            for _ in range(pos.WIDTH)]
        self.input_buffer: List[GFS] = []
        self.output_buffer: List[GFS] = []

    @classmethod
    def from_host(cls, host) -> "DeviceChallenger":
        """Seed from a host Challenger mid-transcript (state + buffers)."""
        import numpy as np
        ch = cls()

        def pairify(v):
            lo, hi = gf.from_u64(np.array([v], dtype=np.uint64))
            return (jnp.asarray(lo[0]), jnp.asarray(hi[0]))

        ch.state = [pairify(int(x)) for x in host.sponge_state]
        ch.input_buffer = [pairify(int(x)) for x in host.input_buffer]
        ch.output_buffer = [pairify(int(x)) for x in host.output_buffer]
        return ch

    def sync_host(self, host, realize) -> None:
        """Write this challenger's (traced->realized) values back into a
        host Challenger so the transcript can continue host-side.
        `realize` maps a GFS to a python int (e.g. after the jit returns
        the packed state)."""
        import numpy as np
        host.sponge_state = np.array([realize(s) for s in self.state],
                                     dtype=np.uint64)
        host.input_buffer = [realize(s) for s in self.input_buffer]
        host.output_buffer = [realize(s) for s in self.output_buffer]

    # -- observes ----------------------------------------------------------

    def observe_element(self, element: GFS) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(element)
        if len(self.input_buffer) == pos.SPONGE_RATE:
            self._duplexing()

    def observe_elements(self, elements) -> None:
        for e in elements:
            self.observe_element(e)

    def observe_extension_element(self, element) -> None:
        self.observe_element(element[0])
        self.observe_element(element[1])

    def observe_elements_array(self, lo, hi) -> None:
        """Bulk absorb of K traced elements ((K,) uint32 pair) — the full
        rate blocks run under ONE lax.scan instead of K/8 unrolled
        permutations.  Byte-identical to K observe_element calls: a 512-
        coefficient final-poly observe was ~128 separately-traced duplexes
        (the bulk of the fused FRI program's 235 s cold compile)."""
        import jax

        K = int(lo.shape[0])
        self.output_buffer.clear()
        # peel elements one-by-one until the input buffer hits a block
        # boundary (host-known length, usually zero elements)
        k = 0
        if self.input_buffer:
            peel = min((pos.SPONGE_RATE - len(self.input_buffer))
                       % pos.SPONGE_RATE, K)
            for i in range(peel):
                self.observe_element((lo[i], hi[i]))
            k = peel
        nfull = (K - k) // pos.SPONGE_RATE
        if nfull:
            st_lo = jnp.stack([s[0] for s in self.state])[:, None]  # (12,1)
            st_hi = jnp.stack([s[1] for s in self.state])[:, None]
            blocks = (lo[k:k + nfull * pos.SPONGE_RATE]
                      .reshape(nfull, pos.SPONGE_RATE),
                      hi[k:k + nfull * pos.SPONGE_RATE]
                      .reshape(nfull, pos.SPONGE_RATE))

            def body(st, blk):
                s = (jnp.concatenate([blk[0][:, None],
                                      st[0][pos.SPONGE_RATE:]], axis=0),
                     jnp.concatenate([blk[1][:, None],
                                      st[1][pos.SPONGE_RATE:]], axis=0))
                from ..hash.poseidon_wires_jax import poseidon_fast_t
                return poseidon_fast_t(s), None

            (st_lo, st_hi), _ = jax.lax.scan(body, (st_lo, st_hi), blocks)
            self.state = [(st_lo[i, 0], st_hi[i, 0])
                          for i in range(pos.WIDTH)]
            # matches _duplexing's post-state exactly (an immediately
            # following observe clears it again, also matching)
            self.output_buffer = list(self.state[:pos.SPONGE_RATE])
            k += nfull * pos.SPONGE_RATE
        for i in range(k, K):
            self.observe_element((lo[i], hi[i]))

    def observe_cap_array(self, cap_pair, cap_len: int) -> None:
        """cap_pair: GF pair of shape (4, cap_len) (column-major digests).
        Element order matches the host challenger: digest-major
        (cap j, then rows 0..3) — i.e. the transposed flatten."""
        lo, hi = cap_pair
        self.observe_elements_array(lo.T.reshape(-1), hi.T.reshape(-1))

    # -- draws -------------------------------------------------------------

    def get_challenge(self) -> GFS:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[GFS]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> Tuple[GFS, GFS]:
        c = self.get_n_challenges(2)
        return (c[0], c[1])

    # -- internals ---------------------------------------------------------

    def _duplexing(self) -> None:
        assert len(self.input_buffer) <= pos.SPONGE_RATE
        st = list(self.state)
        for i, v in enumerate(self.input_buffer):
            st[i] = v
        self.input_buffer.clear()
        lo = jnp.stack([s[0] for s in st])[:, None]     # (12, 1)
        hi = jnp.stack([s[1] for s in st])[:, None]
        from ..hash.poseidon_wires_jax import poseidon_fast_t
        out = poseidon_fast_t((lo, hi))
        self.state = [(out[0][i, 0], out[1][i, 0])
                      for i in range(pos.WIDTH)]
        self.output_buffer = list(self.state[:pos.SPONGE_RATE])
