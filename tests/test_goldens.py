"""Golden-image regression tests (SURVEY.md §4: the industrialized version
of the reference's CPU_test eyeball-the-PPM workflow).

Deterministic 64x64 renders of every algorithm against committed goldens,
compared by SSIM >= 0.995 and max-abs error.  Goldens are generated on the
CPU backend by ``python tests/test_goldens.py regen``.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def scene():
    from volumerenderer_tpu import Renderer, RenderParams, StaticConfig
    from volumerenderer_tpu.grid import procedural

    g = procedural.cloud(n=48, seed=7, center_world=(0.0, 20.0, 20.0),
                         world_extent=70.0)
    params = RenderParams.default().replace(
        light_source_world_pos=jnp.float32([0.0, 20.0, 20.0]),
        scattering_probability=jnp.float32(0.15),
    )
    config = StaticConfig(width=64, height=64, ray_tile=4096,
                          probe_tile=4096, build_tile=4096,
                          max_events_per_photon=32, light_capacity=512,
                          max_points_per_segment=128, max_path_segments=8)
    return g, params, config


def render(algorithm, frames=2):
    from volumerenderer_tpu import Algorithm, Renderer

    g, params, config = scene()
    r = Renderer(g, config, params, algorithm=algorithm)
    r.step(frames)
    return np.asarray(r.state.accum)


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.npy")


def _check(name, img):
    from volumerenderer_tpu.utils.ssim import ssim

    want = np.load(_golden_path(name))
    s = ssim(img, want)
    err = np.abs(img - want).max()
    assert s >= 0.995, f"{name}: SSIM {s:.5f} < 0.995 (maxerr {err:.2e})"
    assert err < 5e-3, f"{name}: max abs err {err:.2e}"


def test_goldens_all_algorithms():
    from volumerenderer_tpu import Algorithm

    for algo in Algorithm:
        img = render(algo)
        assert img.max() > 0, f"{algo.name}: black frame"
        _check(algo.name.lower(), img)


def test_density_golden():
    from volumerenderer_tpu.render import density

    g, _params, _config = scene()
    img = np.asarray(density.render_density(
        g, width=64, height=64, camera_pos=(0.0, 20.0, -75.0),
        t_max=200.0, dt=1.0, apply_transform=True))
    _check("density", img)


def regen():
    from volumerenderer_tpu import Algorithm
    from volumerenderer_tpu.render import density

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for algo in Algorithm:
        np.save(_golden_path(algo.name.lower()), render(algo))
        print("wrote", algo.name.lower())
    g, _p, _c = scene()
    np.save(_golden_path("density"), np.asarray(density.render_density(
        g, width=64, height=64, camera_pos=(0.0, 20.0, -75.0),
        t_max=200.0, dt=1.0, apply_transform=True)))
    print("wrote density")


if __name__ == "__main__" and "regen" in sys.argv:
    import conftest  # noqa: F401  (forces the CPU backend)

    regen()
