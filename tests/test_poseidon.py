"""Poseidon: known-answer tests from the reference
(plonky2/src/hash/poseidon_goldilocks.rs:289-310), JAX vs numpy, sponge."""
import numpy as np

from plonky2_tpu.field import gf_jax as gf
from plonky2_tpu.field import goldilocks as gl
from plonky2_tpu.hash import poseidon as pos
from plonky2_tpu.hash import poseidon_jax as pj

KAT = [
    (np.zeros(12, dtype=np.uint64),
     [0x3c18a9786cb0b359, 0xc4055e3364a246c3, 0x7953db0ab48808f4, 0xc71603f33a1144ca,
      0xd7709673896996dc, 0x46a84e87642f44ed, 0xd032648251ee0b3c, 0x1c687363b207df62,
      0xdf8565563e8045fe, 0x40f5b37ff4254dae, 0xd070f637b431067c, 0x1792b1c4342109d7]),
    (np.arange(12, dtype=np.uint64),
     [0xd64e1e3efc5b8e9e, 0x53666633020aaa47, 0xd40285597c6a8825, 0x613a4f81e81231d2,
      0x414754bfebd051f0, 0xcb1f8980294a023f, 0x6eb2a9e4d54a9d0f, 0x1902bc3af467e056,
      0xf045d5eafdc6021f, 0xe4150f77caaa3be5, 0xc9bfd01d39b50cce, 0x5c0a27fcb0e1459b]),
    (np.full(12, gl.P - 1, dtype=np.uint64),
     [0xbe0085cfc57a8357, 0xd95af71847d05c09, 0xcf55a13d33c1c953, 0x95803a74f4530e82,
      0xfcd99eb30a135df1, 0xe095905e913a3029, 0xde0392461b42919b, 0x7d3260e24e81d031,
      0x10d3d0465d9deaa0, 0xa87571083dfc2a47, 0xe18263681e9958f8, 0xe28e96f1ae5e60d3]),
]


def test_poseidon_kat_numpy():
    for inp, expect in KAT:
        out = pos.poseidon(inp)
        np.testing.assert_array_equal(out, np.array(expect, dtype=np.uint64))


def test_poseidon_kat_jax():
    batch = np.stack([inp for inp, _ in KAT])
    out = gf.to_u64(pj.poseidon(gf.from_u64(batch)))
    expect = np.stack([np.array(e, dtype=np.uint64) for _, e in KAT])
    np.testing.assert_array_equal(out, expect)


def rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, gl.P, size=shape, dtype=np.uint64) % np.uint64(gl.P)


def test_sponge_jax_vs_numpy():
    for L in [1, 4, 8, 9, 16, 135]:
        leaves = rand((7, L), seed=L)
        got = gf.to_u64(pj.hash_leaves(gf.from_u64(leaves)))
        expect = pos.hash_batch_no_pad(leaves)
        np.testing.assert_array_equal(got, expect)
        # scalar sponge agrees with batch
        np.testing.assert_array_equal(expect[0], pos.hash_no_pad(leaves[0]))


def test_compress_jax_vs_numpy():
    x, y = rand((5, 4), 1), rand((5, 4), 2)
    got = gf.to_u64(pj.compress_pairs(gf.from_u64(x), gf.from_u64(y)))
    np.testing.assert_array_equal(got, pos.compress_batch(x, y))
    np.testing.assert_array_equal(got[0], pos.compress(x[0], y[0]))
