"""High-arity FRI fold: the lax.scan Horner path must match a host oracle.

The arity-256 dryrun config (``__graft_entry__._fast_config``) routes
``_fold_body`` through a lax.scan Horner (``device_prover._SCAN_ARITY``);
the flagship arity-16 folds stay unrolled (and their XLA programs keep
their cache keys).  The unrolled XLA build is NOT used as the reference
here: XLA:CPU needs minutes to compile it even at arity 32 (the very
pathology the scan path fixes).  Instead the folded coefficients are
checked against an exact host-side extension-field Horner, and the
returned bit-reversed values against the host coset-NTT of those
coefficients.  Ref: /root/reference/plonky2/src/fri/prover.rs
(fold_codeword semantics).
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

from plonky2_tpu.field import extension as ge
from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.fri import device_prover as dp


@pytest.mark.parametrize("arity", [64, 256])
def test_scan_fold_matches_host_oracle(arity, monkeypatch):
    monkeypatch.setattr(dp, "_SCAN_ARITY", 64)
    rng = np.random.default_rng(7)
    n = arity * 8
    m = n // arity
    P = (1 << 64) - (1 << 32) + 1
    coeffs_u64 = rng.integers(0, P, size=(2, n), dtype=np.uint64)
    lo, hi = gf.from_u64(coeffs_u64)
    beta_u64 = rng.integers(0, P, size=(2,), dtype=np.uint64)
    blo, bhi = gf.from_u64(beta_u64)
    b_ext = ((blo[0], bhi[0]), (blo[1], bhi[1]))
    shift = 7

    v_br, new_coeffs = jax.jit(
        lambda c: dp._fold_body(c, b_ext, n, arity, shift))((lo, hi))
    got = np.stack([gf.to_u64((new_coeffs[0][e], new_coeffs[1][e]))
                    for e in range(2)])                       # (2, m)

    # host oracle: per-group Horner over the quadratic extension
    ext = coeffs_u64.T.reshape(m, arity, 2)                   # (m, arity, 2)
    beta = beta_u64.reshape(1, 2)
    want = ext[:, arity - 1, :]
    for i in range(arity - 2, -1, -1):
        want = ge.add(ge.mul(want, np.broadcast_to(beta, (m, 2))),
                      ext[:, i, :])
    np.testing.assert_array_equal(got, want.T)

    # and the values output is the coset-NTT of those coefficients,
    # bit-reversed (same shared jntt code as the unrolled path)
    from plonky2_tpu.ops import ntt as jntt
    nc = (jax.numpy.asarray(new_coeffs[0]), jax.numpy.asarray(new_coeffs[1]))
    vals = jntt.coset_ntt(nc, shift)
    perm = jntt.bitrev_perm_auto(m)
    for e in range(2):   # v_br[e] = (lo, hi) of extension component e
        np.testing.assert_array_equal(
            np.asarray(v_br[e][0]), np.asarray(vals[0][e][perm]))
        np.testing.assert_array_equal(
            np.asarray(v_br[e][1]), np.asarray(vals[1][e][perm]))
