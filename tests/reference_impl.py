"""Loopy NumPy transcription of the reference GLSL — the test oracle.

Each function is a direct, per-thread port of the corresponding shader
(float32 arithmetic throughout), against which the vectorized JAX
implementations are validated.  Deliberately slow and simple.

Where the project documents deviations from the reference (bounded loops,
deterministic photon-major light ordering instead of the racy atomic
append), this oracle implements the *documented* semantics so tests pin the
actual contract.
"""

from __future__ import annotations

import numpy as np

np.seterr(over="ignore")  # uint32 wraparound is intentional (GLSL semantics)

F = np.float32
PI = F(3.14159265358979323846)

# Entry-face disambiguation nudge — see volumerenderer_tpu.ops.march.ENTRY_EPS
# (documented deviation: the reference's first march sample lands exactly on
# the bbox face, where f32 floor() is ambiguous).
ENTRY_EPS = F(1e-3)


# ---------------- RNG (common_functions.h:1-25) ----------------


def hash_uvec3(v):
    x = np.uint32(v[0]) * np.uint32(73856093)
    y = np.uint32(v[1]) * np.uint32(19349663)
    z = np.uint32(v[2]) * np.uint32(83492791)
    h = x ^ y ^ z
    h = np.uint32((h ^ (h >> np.uint32(16))) * np.uint32(0x45D9F3B))
    h = np.uint32((h ^ (h >> np.uint32(16))) * np.uint32(0x45D9F3B))
    h = h ^ (h >> np.uint32(16))
    return np.uint32(h)


def randf(seed):
    return F(F(hash_uvec3(seed)) * (F(1.0) / F(4294967295.0)))


class Seed:
    """Mutable uvec3 seed with randf_inc semantics."""

    def __init__(self, x, y, z):
        self.v = np.array([x, y, z], np.uint32)
        self.draws = 0

    def randf_inc(self):
        self.v = self.v + np.uint32(1)
        self.draws += 1
        return randf(self.v)


def random_dir(r1, r2):
    theta = F(np.arccos(F(1.0) - F(2.0) * F(r1)))
    phi = F(2.0) * PI * F(r2)
    d = np.array(
        [
            np.sin(theta) * np.cos(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(theta),
        ],
        F,
    )
    return d / F(np.linalg.norm(d))


# ---------------- grid helpers ----------------


def grid_to_np(grid):
    """DenseGrid -> plain numpy dict oracle."""
    return dict(
        voxels=np.asarray(grid.voxels),
        bbox_min=np.asarray(grid.bbox_min),
        bbox_max=np.asarray(grid.bbox_max),
        mat=np.asarray(grid.map_mat),
        inv=np.asarray(grid.map_inv),
        vec=np.asarray(grid.map_vec),
    )


def sample_ijk(g, ijk):
    rel = np.asarray(ijk) - g["bbox_min"]
    shape = np.asarray(g["voxels"].shape)
    if np.all(rel >= 0) and np.all(rel < shape):
        return F(g["voxels"][tuple(rel)])
    return F(0.0)


def world_to_index(g, p):
    return (g["inv"] @ (np.asarray(p, F) - g["vec"])).astype(F)


def world_to_index_dir(g, d):
    return (g["inv"] @ np.asarray(d, F)).astype(F)


def index_to_world(g, p):
    return (g["mat"] @ np.asarray(p, F) + g["vec"]).astype(F)


def box_minmax(g):
    return g["bbox_min"].astype(F), (g["bbox_max"] + 1).astype(F)


def intersect_aabb(origin, direction, bmin, bmax, tmin, tmax):
    """common_functions.h:27-40 with early exit."""
    tmin, tmax = F(tmin), F(tmax)
    for i in range(3):
        inv_d = F(1.0) / F(direction[i])
        t0 = F((bmin[i] - origin[i]) * inv_d)
        t1 = F((bmax[i] - origin[i]) * inv_d)
        if inv_d < 0.0:
            t0, t1 = t1, t0
        tmin = F(max(tmin, t0))
        tmax = F(min(tmax, t1))
        if tmax < tmin:
            return False, tmin, tmax
    return True, tmin, tmax


# ---------------- light models ----------------


def point_light_contribution(sample, light_pos, intensity):
    L = np.asarray(light_pos, F) - np.asarray(sample, F)
    d2 = F(np.dot(L, L))
    if d2 < F(1e-4):
        return F(0.0)
    return F(intensity / (F(4.0) * PI * d2))


def sphere_light_contribution(sample, center, intensity, beam_radius):
    diff = np.asarray(sample, F) - np.asarray(center, F)
    n = F(np.linalg.norm(diff))
    if n == 0.0:
        return F(0.0)
    closest = np.asarray(center, F) + diff / n * F(beam_radius)
    return point_light_contribution(sample, closest, intensity)


# ---------------- photon walk (light_gen.comp) ----------------


def generate_lights(grid, params, frame_count, num_photons=16,
                    max_events_per_photon=256, max_segments=None):
    """Returns (events list of (pos_from, pos_to, intensity), count) after
    the documented photon-major maxLights clamp."""
    g = grid_to_np(grid)
    n = int(round(num_photons**0.5))
    if max_segments is None:
        max_segments = max_events_per_photon + 1
    step = F(params.ray_marching_step_size)
    absorption = F(params.absorption_coefficient)
    prob = F(params.scattering_probability)
    per_photon_events = []

    for p in range(num_photons):
        gid = (p % n, p // n, 0)
        seed = Seed(*(np.uint32(c) * np.uint32(frame_count) for c in gid))
        origin_world = np.asarray(params.light_source_world_pos, F)
        d_world = random_dir(seed.randf_inc(), seed.randf_inc())
        o = world_to_index(g, origin_world)
        d = world_to_index_dir(g, d_world)
        d = (d / F(np.linalg.norm(d))).astype(F)
        bmin, bmax = box_minmax(g)
        hit, tmin, tmax = intersect_aabb(
            o, d, bmin, bmax, F(0.0), F(params.ray_max_distance)
        )
        T = F(1.0)
        intensity = F(params.photon_initial_intensity)
        cur_t = F(tmin + ENTRY_EPS * step)
        pos = (o + d * cur_t).astype(F)
        prev_pos = origin_world
        events = []
        segments = 0
        guard = 0
        while hit and cur_t < tmax and T > F(0.001) and intensity > F(0.01):
            guard += 1
            if guard > 500000 or segments >= max_segments:
                break
            ijk = np.floor(pos).astype(np.int64)
            val = sample_ijk(g, ijk)
            if val > 0.0:
                atten = F(np.exp(F(-val * absorption * step)))
                intensity = F(intensity * atten)
                T = F(T * atten)
                if seed.randf_inc() < prob:
                    new_dir = random_dir(seed.randf_inc(), seed.randf_inc())
                    light_world = index_to_world(g, pos)
                    if len(events) < max_events_per_photon:
                        events.append((prev_pos.copy(), light_world.copy(),
                                       F(intensity)))
                        prev_pos = light_world
                    d = new_dir  # used directly in index space (ref :90)
                    o = pos.copy()
                    cur_t = F(0.0)
                    segments += 1
            cur_t = F(cur_t + step)
            pos = (o + d * cur_t).astype(F)
        per_photon_events.append(events)

    flat = [e for evs in per_photon_events for e in evs]
    count = min(len(flat), int(params.max_lights))
    return flat[:count], count


# ---------------- gather color passes ----------------


def _camera_ray(px, py, W, H, fov, cam_pos):
    aspect = F(W / H)
    scale = F(np.tan(F(fov) * F(0.5) * PI / F(180.0)))
    x = F((F(2.0) * (px + F(0.5)) / F(W) - F(1.0)) * aspect * scale)
    y = F((F(1.0) - F(2.0) * (py + F(0.5)) / F(H)) * scale)
    d = np.array([x, y, 1.0], F)
    return np.asarray(cam_pos, F), (d / F(np.linalg.norm(d))).astype(F)


def _light_sum(g, p_world, events, algorithm, params):
    total = F(0.0)
    if algorithm == "point":
        for (pf, pt, it) in events:
            total = F(total + point_light_contribution(p_world, pt, it))
    elif algorithm == "sphere":
        for (pf, pt, it) in events:
            total = F(
                total
                + sphere_light_contribution(p_world, pf, it, params.beam_radius)
            )
    elif algorithm in ("ray", "beam"):
        ls = F(params.light_ray_step_size)
        for (pf, pt, it) in events:
            seg = (np.asarray(pt, F) - np.asarray(pf, F)).astype(F)
            length = F(np.linalg.norm(seg))
            if length == 0.0:
                continue
            direction = (seg / length).astype(F)
            steps = int(length / ls)
            if steps == 0:
                continue
            pint = F(it / F(steps))
            for s in range(steps):
                cp = (np.asarray(pf, F) + F(s) * ls * direction).astype(F)
                if algorithm == "ray":
                    total = F(total + point_light_contribution(p_world, cp, pint))
                else:
                    total = F(
                        total
                        + sphere_light_contribution(
                            p_world, cp, pint, params.beam_radius
                        )
                    )
    return total


def render_gather(grid, params, events, count, algorithm, W, H):
    """point/sphere/ray/beam_compute_color.comp per-pixel port."""
    g = grid_to_np(grid)
    img = np.zeros((H, W), F)
    bmin, bmax = box_minmax(g)
    step = F(params.ray_marching_step_size)
    absorption = F(params.absorption_coefficient)
    for py in range(H):
        for px in range(W):
            cam, d_world = _camera_ray(px, py, W, H, params.fov, params.camera_pos)
            o = world_to_index(g, cam)
            d = world_to_index_dir(g, d_world)
            d = (d / F(np.linalg.norm(d))).astype(F)
            hit, tmin, tmax = intersect_aabb(
                o, d, bmin, bmax, F(0.0), F(params.ray_max_distance)
            )
            final = F(0.0)
            if hit and tmax > 0.0:
                tmin = F(max(tmin, F(0.0)))
                t = F(tmin + ENTRY_EPS * step)
                T = F(1.0)
                while t < tmax and T > F(0.001):
                    p = (o + d * t).astype(F)
                    ijk = np.floor(p).astype(np.int64)
                    rel = ijk - g["bbox_min"]
                    shape = np.asarray(g["voxels"].shape)
                    if np.all(rel >= 0) and np.all(rel < shape):
                        val = F(g["voxels"][tuple(rel)])
                        p_world = index_to_world(g, p)
                        light = _light_sum(g, p_world, events, algorithm, params)
                        final = F(final + T * val * step * light)
                        T = F(T * np.exp(F(-val * absorption * step)))
                    t = F(t + step)
            denom = F(max(count, 1))
            img[py, px] = min(max(final / denom, F(0.0)), F(1.0))
    return img


# ---------------- path trace (path_compute_color.comp) ----------------


def render_path(grid, params, frame_count, W, H, max_segments=32,
                fidelity="reference"):
    g = grid_to_np(grid)
    img = np.zeros((H, W), F)
    bmin, bmax = box_minmax(g)
    step = F(params.ray_marching_step_size)
    absorption = F(params.absorption_coefficient)
    prob = F(params.scattering_probability)
    light_local = world_to_index(g, params.light_source_world_pos)
    i0 = F(params.photon_initial_intensity)
    # path_compute_color.comp:86 — `photonIntensity > 0.01` is constant
    # (PATH never attenuates it): intensity <= 0.01 renders black.
    if not (i0 > F(0.01)):
        return img

    def light_term(sample_local):
        ray_local = (light_local - sample_local).astype(F)
        length = F(np.linalg.norm(ray_local))
        if length > 0:
            rd = (ray_local / length).astype(F)
        else:
            rd = np.zeros(3, F)
        n_steps = int(length / step)
        total = F(i0 / F(10000.0))
        if fidelity == "reference":
            cp = (light_local + rd * step).astype(F)
            val = sample_ijk(g, np.floor(cp).astype(np.int64))
            for _ in range(n_steps):
                total = F(total * np.exp(F(-val * absorption * step)))
        else:
            to_sample = (sample_local - light_local).astype(F)
            rd2 = (to_sample / length).astype(F) if length > 0 else rd
            for s in range(1, n_steps + 1):
                cp = (light_local + rd2 * (F(s) * step)).astype(F)
                val = sample_ijk(g, np.floor(cp).astype(np.int64))
                total = F(total * np.exp(F(-val * absorption * step)))
        return total

    for py in range(H):
        for px in range(W):
            seed = Seed(
                np.uint32(px) * np.uint32(frame_count),
                np.uint32(py) * np.uint32(frame_count),
                0,
            )
            cam, d_world = _camera_ray(px, py, W, H, params.fov, params.camera_pos)
            o = world_to_index(g, cam)
            d = world_to_index_dir(g, d_world)
            d = (d / F(np.linalg.norm(d))).astype(F)
            hit, tmin, tmax = intersect_aabb(
                o, d, bmin, bmax, F(0.0), F(params.ray_max_distance)
            )
            cur_t = F(tmin + ENTRY_EPS * step)
            pos = (o + d * cur_t).astype(F)
            final = F(0.0)
            segments = 0
            guard = 0
            while hit and cur_t < tmax and segments < max_segments:
                guard += 1
                if guard > 500000:
                    break
                ijk = np.floor(pos).astype(np.int64)
                val = sample_ijk(g, ijk)
                if val > 0.0:
                    if seed.randf_inc() < prob:
                        d = random_dir(seed.randf_inc(), seed.randf_inc())
                        o = pos.copy()
                        cur_t = F(0.0)
                        segments += 1
                    final = F(final + F(1.0) * val * step * light_term(pos))
                cur_t = F(cur_t + step)
                pos = (o + d * cur_t).astype(F)
            img[py, px] = min(max(final, F(0.0)), F(1.0))
    return img


# ---------------- density integral (CPU_test/main.cpp) ----------------


def render_density(grid, W=256, H=256, cam_pos=(0.0, 250.0, -800.0),
                   fov=45.0, t_max=1200.0, dt=1.0):
    g = grid_to_np(grid)
    img = np.zeros((H, W), F)
    for j in range(H):
        for i in range(W):
            cam, rd = _camera_ray(i, j, W, H, fov, cam_pos)
            t, density = F(0.0), F(0.0)
            while t < F(t_max):
                pos = (cam + rd * t).astype(F)
                ijk = np.floor(pos).astype(np.int64)
                density = F(density + sample_ijk(g, ijk) * F(dt))
                t = F(t + F(dt))
            img[j, i] = density
    return img
