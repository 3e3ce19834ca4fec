"""Intersector parity vs the GLSL oracle."""

import numpy as np
import jax.numpy as jnp

import reference_impl as ref
from volumerenderer_tpu.ops import intersect


def test_aabb_parity_random():
    rs = np.random.RandomState(6)
    n = 500
    o = rs.randn(n, 3).astype(np.float32) * 20
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bmin = np.float32([-5, -3, -8])
    bmax = np.float32([7, 9, 2])
    hit, tmin, tmax = intersect.intersect_aabb(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(bmin), jnp.asarray(bmax),
        jnp.zeros(n), jnp.full((n,), 100.0))
    hit, tmin, tmax = map(np.asarray, (hit, tmin, tmax))
    for i in range(n):
        h, t0, t1 = ref.intersect_aabb(o[i], d[i], bmin, bmax, 0.0, 100.0)
        assert bool(hit[i]) == h, i
        if h:
            np.testing.assert_allclose(tmin[i], t0, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(tmax[i], t1, rtol=1e-5, atol=1e-5)


def test_aabb_inside_box():
    hit, tmin, tmax = intersect.intersect_aabb(
        jnp.float32([0, 0, 0]), jnp.float32([0, 0, 1]),
        jnp.float32([-1, -1, -1]), jnp.float32([1, 1, 1]),
        jnp.float32(0.0), jnp.float32(100.0))
    assert bool(hit) and float(tmin) == 0.0 and float(tmax) == 1.0


def test_sphere_closest_positive_root():
    o = jnp.float32([[0, 0, -5], [0, 0, 0], [0, 0, 5]])
    d = jnp.float32([[0, 0, 1]] * 3)
    hit, t = intersect.intersect_sphere(o, d, jnp.float32([0, 0, 0]), 1.0)
    assert list(np.asarray(hit)) == [True, True, False]
    np.testing.assert_allclose(np.asarray(t)[:2], [4.0, 1.0], atol=1e-6)


def test_thick_ray():
    # Camera ray along +z passes within width of a parallel-offset line.
    hit, t = intersect.intersect_thick_ray(
        jnp.float32([0, 0, 0]), jnp.float32([0, 0, 1]),
        jnp.float32([0.05, 0, 5]), jnp.float32([0, 1, 0]), 0.1)
    assert bool(hit)
    np.testing.assert_allclose(float(t), 5.0, atol=1e-5)
    hit2, _ = intersect.intersect_thick_ray(
        jnp.float32([0, 0, 0]), jnp.float32([0, 0, 1]),
        jnp.float32([3.0, 0, 5]), jnp.float32([0, 1, 0]), 0.1)
    assert not bool(hit2)
