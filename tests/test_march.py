"""Transmittance march vs a sequential per-ray reference loop."""

import numpy as np
import pytest
import jax.numpy as jnp

import reference_impl as ref
from volumerenderer_tpu.grid import from_dense
from volumerenderer_tpu.ops import march


def make_grid():
    rs = np.random.RandomState(10)
    vals = (rs.rand(12, 12, 12) < 0.5) * rs.rand(12, 12, 12).astype(np.float32)
    return from_dense(vals, bbox_min=(0, 0, 0))


def seq_march(gnp, o, d, ray_max, step, absorption, max_steps):
    """Sequential port of the color-shader march loop, returning the per-step
    weights T*val*dt the vectorized version must reproduce."""
    F = np.float32
    hit, tmin, tmax = ref.intersect_aabb(
        o, d, *ref.box_minmax(gnp), F(0.0), F(ray_max))
    w = np.zeros(max_steps, F)
    if not (hit and tmax > 0):
        return w
    tmin = F(max(tmin, 0.0))
    T = F(1.0)
    for k in range(max_steps):
        t = F(tmin + k * F(step))
        if not (t < tmax and T > F(0.001)):
            break
        p = (o + d * t).astype(F)
        val = ref.sample_ijk(gnp, np.floor(p).astype(np.int64))
        w[k] = F(T * val * F(step))
        T = F(T * np.exp(F(-val * F(absorption) * F(step))))
    return w


def test_march_weights_match_sequential():
    g = make_grid()
    gnp = ref.grid_to_np(g)
    rs = np.random.RandomState(11)
    n, S = 40, 64
    o = rs.randn(n, 3).astype(np.float32) * 8 + 6
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    step, absorption, ray_max = 0.37, 0.9, 30.0

    m = march.march(g, jnp.asarray(o), jnp.asarray(d),
                    ray_max_distance=ray_max, step_size=step,
                    absorption=absorption, max_steps=S)
    got = np.asarray(m.weight)
    for i in range(n):
        want = seq_march(gnp, o[i], d[i], ray_max, step, absorption, S)
        np.testing.assert_allclose(got[i], want, rtol=2e-4, atol=1e-6,
                                   err_msg=f"ray {i}")


def test_march_cutoff_semantics():
    # Dense absorbing medium: weights stop once transmittance <= 0.001,
    # using the PRE-attenuation T of each step.
    vals = np.full((8, 8, 8), 4.0, np.float32)
    g = from_dense(vals)
    o = jnp.float32([[4.0, 4.0, -3.0]])
    d = jnp.float32([[0.0, 0.0, 1.0]])
    m = march.march(g, o, d, ray_max_distance=100.0, step_size=1.0,
                    absorption=1.0, max_steps=32)
    T = np.asarray(m.trans)[0]
    act = np.asarray(m.active)[0]
    # active exactly where T > 0.001 and inside [tmin, tmax).
    expected_active = (T > 0.001) & (np.asarray(m.t)[0] < float(m.tmax[0]))
    np.testing.assert_array_equal(act, expected_active)
    assert act.sum() < 32  # the cutoff actually triggered


def test_march_miss_is_zero():
    g = make_grid()
    o = jnp.float32([[100.0, 100.0, 100.0]])
    d = jnp.float32([[0.0, 0.0, 1.0]])
    m = march.march(g, o, d, ray_max_distance=50.0, step_size=1.0,
                    absorption=0.1, max_steps=16)
    assert not bool(m.hit[0])
    assert float(jnp.sum(m.weight)) == 0.0


def test_trilinear_march_option():
    import dataclasses
    import jax.numpy as jnp
    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import procedural

    g = procedural.fog_sphere(n=24, center_world=(0.0, 0.0, 10.0),
                              world_extent=20.0)
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -15.0]),
        light_source_world_pos=jnp.float32([0.0, 0.0, 10.0]),
        scattering_probability=jnp.float32(0.4),
        ray_max_distance=jnp.float32(60.0))
    base = StaticConfig(width=16, height=12, light_capacity=64,
                        max_events_per_photon=8, ray_tile=64,
                        probe_tile=64, build_tile=64,
                        max_points_per_segment=32)
    r_near = Renderer(g, base, params, algorithm=Algorithm.POINT)
    r_near.step()
    r_tri = Renderer(g, dataclasses.replace(base, interpolation="trilinear"),
                     params, algorithm=Algorithm.POINT)
    r_tri.step()
    a, b = r_near.image(), r_tri.image()
    assert np.isfinite(b).all() and b.max() > 0
    assert not np.allclose(a, b)  # smoother sampling changes the image


def test_occupied_clip_bit_identical():
    # A volume with a large vacuum skirt: clipped and unclipped marches must
    # produce identical weights at identical sample phases.
    import jax.numpy as jnp
    from volumerenderer_tpu.grid import from_dense
    from volumerenderer_tpu.grid.dense import occupied_bbox
    from volumerenderer_tpu.ops import march as M

    vals = np.zeros((48, 48, 48), np.float32)
    rs = np.random.RandomState(33)
    vals[16:28, 18:30, 20:32] = rs.rand(12, 12, 12).astype(np.float32)
    g = from_dense(vals)
    box = occupied_bbox(g)
    assert box is not None

    o = jnp.asarray((rs.rand(64, 3) * 70 - 10).astype(np.float32))
    d = jnp.asarray(rs.randn(64, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    kw = dict(ray_max_distance=200.0, step_size=0.61, absorption=0.3)
    full = M.march(g, o, d, max_steps=160, **kw)
    clip = M.march(g, o, d, max_steps=64, clip_box=box, **kw)
    # Same totals per ray, and every kept (t, w) pair matches by phase.
    np.testing.assert_allclose(
        np.asarray(full.weight.sum(axis=1)),
        np.asarray(clip.weight.sum(axis=1)), rtol=1e-6, atol=1e-8)
    for i in range(8):
        wf = np.asarray(full.weight[i]); tf = np.asarray(full.t[i])
        wc = np.asarray(clip.weight[i]); tc = np.asarray(clip.t[i])
        nz_f = {round(float(t), 4): float(w) for t, w in zip(tf, wf) if w != 0}
        nz_c = {round(float(t), 4): float(w) for t, w in zip(tc, wc) if w != 0}
        assert nz_f == nz_c, i


@pytest.mark.slow
def test_session_uses_occupied_clip():
    import jax.numpy as jnp
    from volumerenderer_tpu import Algorithm, Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import from_dense

    vals = np.zeros((32, 32, 32), np.float32)
    vals[12:20, 12:20, 12:20] = 0.8
    g = from_dense(vals, translation=(-16.0, -16.0, 0.0))
    params = RenderParams.default().replace(
        camera_pos=jnp.float32([0.0, 0.0, -20.0]),
        light_source_world_pos=jnp.float32([0.0, 0.0, 16.0]),
        scattering_probability=jnp.float32(0.5))
    cfg = StaticConfig(width=16, height=12, ray_tile=64, light_capacity=64,
                       probe_tile=64, build_tile=64,
                       max_events_per_photon=8)
    r = Renderer(g, cfg, params, algorithm=Algorithm.POINT)
    r.step(2)
    r_plain = Renderer(g, cfg, params, algorithm=Algorithm.POINT)
    r_plain.use_view_cache = False
    r_plain.step(2)
    np.testing.assert_allclose(r.image(), r_plain.image(), rtol=1e-5,
                               atol=1e-7)


@pytest.mark.slow
def test_occupancy_compacted_march_bit_identical():
    """Brick-skipping march (occupied_cap) must reproduce the full march
    exactly up to cumprod tree association: identical nonzero SUPPORT
    (same t positions, same zero pattern) and weights within ~1 ulp (the
    transmittance prefix-product of the same factor multiset associates
    differently over a 41- vs 96-length scan; skipped samples contribute
    exactly-1.0 factors)."""
    import numpy as np
    import jax.numpy as jnp
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.ops import march as M

    g = procedural.cloud(n=48, seed=11)
    rs = np.random.RandomState(5)
    o = jnp.asarray((rs.rand(64, 3) * 10 - 5).astype(np.float32))
    o = o.at[:, 2].set(-30.0)
    d = jnp.asarray(rs.randn(64, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o_i = g.world_to_index(o)
    d_i = g.world_to_index_dir(d)
    d_i = d_i / jnp.linalg.norm(d_i, axis=-1, keepdims=True)
    kw = dict(ray_max_distance=2500.0, step_size=1.0, absorption=0.05,
              max_steps=96)
    full = M.march(g, o_i, d_i, **kw)
    counts = M.occupancy_counts(
        g, o_i, d_i, ray_max_distance=2500.0, step_size=1.0, max_steps=96)
    K = int(counts.max())
    assert K < 96  # the scene really has skippable vacuum
    comp = M.march(g, o_i, d_i, occupied_cap=K, **kw)

    wf = np.asarray(full.weight); tf = np.asarray(full.t)
    wc = np.asarray(comp.weight); tc = np.asarray(comp.t)
    np.testing.assert_allclose(wf.sum(axis=-1), wc.sum(axis=-1),
                               rtol=3e-6, atol=1e-9)
    for r in range(wf.shape[0]):
        nz = wf[r] != 0
        got = {float(t): float(w) for t, w in zip(tc[r], wc[r]) if w != 0}
        want = {float(t): float(w) for t, w in zip(tf[r][nz], wf[r][nz])}
        assert set(got) == set(want), f"ray {r}: support differs"
        for t in want:
            assert abs(got[t] - want[t]) <= max(3e-6 * abs(want[t]), 1e-9), (
                f"ray {r} t {t}")


def test_occupancy_counts_zero_for_miss_rays():
    import numpy as np
    import jax.numpy as jnp
    from volumerenderer_tpu.grid import procedural
    from volumerenderer_tpu.ops import march as M

    g = procedural.fog_sphere(n=32)
    o_i = jnp.asarray([[-100.0, -100.0, -100.0]], jnp.float32)
    d_i = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    counts = M.occupancy_counts(
        g, o_i, d_i, ray_max_distance=2500.0, step_size=1.0, max_steps=64)
    assert int(counts[0]) == 0
