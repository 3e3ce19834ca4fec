"""RNG parity: vectorized JAX hash/randf/random_dir vs the loopy GLSL oracle."""

import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from volumerenderer_tpu.ops import rng


def test_hash_matches_oracle():
    rs = np.random.RandomState(0)
    seeds = rs.randint(0, 2**32, size=(200, 3), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(rng.hash_uvec3(seeds[:, 0], seeds[:, 1], seeds[:, 2]))
    want = np.array([ref.hash_uvec3(s) for s in seeds], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_randf_at_matches_randf_inc_sequence():
    seed0 = np.array([123456, 789, 4000000000], np.uint32)
    oracle = ref.Seed(*seed0)
    want = np.array([oracle.randf_inc() for _ in range(64)], np.float32)
    ks = np.arange(1, 65, dtype=np.uint32)
    got = np.asarray(rng.randf_at(jnp.asarray(seed0)[None, :], ks))
    np.testing.assert_array_equal(got, want)


def test_make_seed_wraps_uint32():
    # gid * frameCount with wraparound (light_gen.comp:15).
    s = np.asarray(rng.make_seed(3, 2, 0, 2**31))
    assert s[0] == np.uint32(3 * 2**31 % 2**32)
    assert s[1] == np.uint32(0)


def test_random_dir_matches_and_is_unit():
    rs = np.random.RandomState(1)
    r1 = rs.rand(100).astype(np.float32)
    r2 = rs.rand(100).astype(np.float32)
    got = np.asarray(rng.random_dir(r1, r2))
    want = np.stack([ref.random_dir(a, b) for a, b in zip(r1, r2)])
    np.testing.assert_allclose(got, want, atol=2e-6)
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, atol=1e-5)


def test_random_dir_distribution_uniform():
    # Mean of many uniform sphere directions ~ 0.
    rs = np.random.RandomState(2)
    d = np.asarray(rng.random_dir(rs.rand(20000), rs.rand(20000)))
    assert np.abs(d.mean(axis=0)).max() < 0.02
