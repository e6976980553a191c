"""The chunked big-shape commit pipeline (poly-block NTT writes + domain-
chunked hashing) must equal the fused single-jit pipeline exactly."""
import numpy as np

from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.ops import commit as C


def _rand(shape, seed=0):
    return np.random.default_rng(seed).integers(0, gl.P, size=shape,
                                                dtype=np.uint64)


def test_chunked_commit_matches_fused():
    v = _rand((70, 1 << 9))          # 70 polys -> uneven 32-poly blocks
    pv = gf.from_u64(v)
    c1, l1, lv1 = C._commit_from_values_fused(pv, 3, 2)
    c2, l2, lv2 = C._commit_chunked(pv, 3, 2, None, True)
    np.testing.assert_array_equal(gf.to_u64(c1), gf.to_u64(c2))
    np.testing.assert_array_equal(gf.to_u64(l1), gf.to_u64(l2))
    assert len(lv1) == len(lv2)
    for a, b in zip(lv1, lv2):
        np.testing.assert_array_equal(gf.to_u64(a), gf.to_u64(b))


def test_chunked_commit_with_salt_matches_fused():
    v = _rand((40, 1 << 9), seed=2)
    pv = gf.from_u64(v)
    s = C.device_salt(1 << 12, salt_rng=np.random.default_rng(5))
    c1, l1, lv1 = C._commit_from_values_fused(pv, 3, 2, s)
    c2, l2, lv2 = C._commit_chunked(pv, 3, 2, s, True)
    np.testing.assert_array_equal(gf.to_u64(l1), gf.to_u64(l2))
    for a, b in zip(lv1, lv2):
        np.testing.assert_array_equal(gf.to_u64(a), gf.to_u64(b))


def test_chunked_from_coeffs_matches_fused():
    p = _rand((40, 1 << 9), seed=3)
    pp = gf.from_u64(p)
    l1, lv1 = C._commit_from_coeffs_fused(pp, 3, 2)
    _, l2, lv2 = C._commit_chunked(pp, 3, 2, None, False)
    np.testing.assert_array_equal(gf.to_u64(l1), gf.to_u64(l2))
    for a, b in zip(lv1, lv2):
        np.testing.assert_array_equal(gf.to_u64(a), gf.to_u64(b))
