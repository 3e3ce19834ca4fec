"""Vectorized NumPy oracle for LARGE reference renders (the 256x256 SSIM
ground truth of scripts/compare_reference.py).

Same shader semantics as reference_impl.py (the loopy bit-parity oracle):
pinhole camera (point_compute_color.comp:26-38), slab AABB clip, fixed-step
front-to-back march with the T<=0.001 cutoff (:68-94), and the per-algorithm
light sums (point/sphere/ray/beam_compute_color.comp) — but with the
per-sample and per-light loops vectorized in float32 NumPy so the quadratic
Ray/Beam sub-light sums finish at 256^2 scale (the loopy oracle would take
days there).  Still fully independent of the package's JAX/Pallas code; the
only difference vs reference_impl is FP summation order (pairwise vs
sequential), validated to agree within ~1e-4 relative
(tests/test_reference_vec.py).
"""

from __future__ import annotations

import numpy as np

from reference_impl import ENTRY_EPS, grid_to_np

F = np.float32
PI = F(np.pi)


def _camera_rays(W, H, fov, cam_pos):
    # Mirrors reference_impl._camera_ray's rounding: float64 intermediate
    # expressions cast to f32 once (the loopy oracle computes with Python
    # floats inside F(...)), then an f32 normalize.
    aspect = float(F(W / H))
    scale = float(np.tan(F(fov) * F(0.5) * PI / F(180.0)))
    px = np.arange(W, dtype=np.float64)[None, :]
    py = np.arange(H, dtype=np.float64)[:, None]
    x = ((2.0 * (px + 0.5) / W - 1.0) * aspect * scale).astype(F)
    y = ((1.0 - 2.0 * (py + 0.5) / H) * scale).astype(F)
    d = np.stack(
        [np.broadcast_to(x, (H, W)), np.broadcast_to(y, (H, W)),
         np.ones((H, W), F)], axis=-1,
    ).astype(F)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True).astype(F)
    o = np.broadcast_to(np.asarray(cam_pos, F), (H, W, 3))
    return o.reshape(-1, 3), d.astype(F).reshape(-1, 3)


def _intersect_aabb(o, d, bmin, bmax, t0, t1):
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = (F(1.0) / d).astype(F)
        ta = ((bmin[None, :] - o) * inv).astype(F)
        tb = ((bmax[None, :] - o) * inv).astype(F)
    lo = np.minimum(ta, tb)
    hi = np.maximum(ta, tb)
    tmin = np.maximum(lo.max(axis=-1), F(t0)).astype(F)
    tmax = np.minimum(hi.min(axis=-1), F(t1)).astype(F)
    return (tmax >= tmin), tmin, tmax


def _sample(g, pos):
    """Nearest-voxel fetch at float index positions (..., 3); 0 outside."""
    ijk = np.floor(pos).astype(np.int64)
    rel = ijk - g["bbox_min"]
    shape = np.asarray(g["voxels"].shape)
    inb = np.all((rel >= 0) & (rel < shape), axis=-1)
    relc = np.clip(rel, 0, shape - 1)
    vals = g["voxels"][relc[..., 0], relc[..., 1], relc[..., 2]].astype(F)
    return np.where(inb, vals, F(0.0))


def _point_contrib(samples, light_pos, intensity):
    """(N,3) samples x (E,3)/(E,) lights -> (N,E) I/(4 pi d^2), d^2<1e-4 -> 0."""
    L = light_pos[None, :, :] - samples[:, None, :]
    d2 = np.einsum("nek,nek->ne", L, L).astype(F)
    with np.errstate(divide="ignore"):
        c = (intensity[None, :] / (F(4.0) * PI * d2)).astype(F)
    return np.where(d2 < F(1e-4), F(0.0), c)


def _sphere_contrib(samples, centers, intensity, radius):
    diff = samples[:, None, :] - centers[None, :, :]
    n = np.linalg.norm(diff, axis=-1).astype(F)
    with np.errstate(divide="ignore", invalid="ignore"):
        closest = centers[None, :, :] + diff / n[..., None] * F(radius)
    L = closest - samples[:, None, :]
    d2 = np.einsum("nek,nek->ne", L, L).astype(F)
    with np.errstate(divide="ignore"):
        c = (intensity[None, :] / (F(4.0) * PI * d2)).astype(F)
    return np.where((n == 0.0) | (d2 < F(1e-4)), F(0.0), c)


def _expand_segments(events, light_ray_step):
    """Ray/Beam sub-light expansion (ray_compute_color.comp:11-24): each
    segment discretized every lightRayStepSize into len/step point lights
    of intensity I/steps."""
    ls = F(light_ray_step)
    pos, inten = [], []
    for (pf, pt, it) in events:
        seg = (np.asarray(pt, F) - np.asarray(pf, F)).astype(F)
        length = F(np.linalg.norm(seg))
        if length == 0.0:
            continue
        direction = (seg / length).astype(F)
        steps = int(length / ls)
        if steps == 0:
            continue
        s = np.arange(steps, dtype=F)[:, None]
        pos.append((np.asarray(pf, F)[None, :] + s * ls * direction[None, :])
                   .astype(F))
        inten.append(np.full(steps, F(it / F(steps)), F))
    if not pos:
        return np.zeros((0, 3), F), np.zeros((0,), F)
    return np.concatenate(pos), np.concatenate(inten)


def render_gather(grid, params, events, count, algorithm, W, H,
                  chunk_elems=4_000_000):
    """Vectorized twin of reference_impl.render_gather.

    Two phases: (1) march every ray, keeping only the nonzero-weight
    samples (occupied, in-box, pre-cutoff — typically ~10% of the step
    grid); (2) the quadratic sample x (sub-)light sum over just those
    samples, chunked to ``chunk_elems`` elements."""
    g = grid_to_np(grid)
    bmin = g["bbox_min"].astype(F)
    bmax = (g["bbox_max"] + 1).astype(F)
    step = F(params.ray_marching_step_size)
    absorption = F(params.absorption_coefficient)

    if algorithm in ("ray", "beam"):
        lp, li = _expand_segments(events, params.light_ray_step_size)
    elif algorithm == "point":
        lp = np.asarray([pt for (_pf, pt, _it) in events], F).reshape(-1, 3)
        li = np.asarray([it for (_pf, _pt, it) in events], F)
    else:  # sphere
        lp = np.asarray([pf for (pf, _pt, _it) in events], F).reshape(-1, 3)
        li = np.asarray([it for (_pf, _pt, it) in events], F)

    o_w, d_w = _camera_rays(W, H, params.fov, params.camera_pos)
    o = (np.einsum("ij,nj->ni", g["inv"], o_w - g["vec"][None, :])).astype(F)
    d = (np.einsum("ij,nj->ni", g["inv"], d_w)).astype(F)
    d /= np.linalg.norm(d, axis=-1, keepdims=True).astype(F)
    hit, tmin, tmax = _intersect_aabb(
        o, d, bmin, bmax, 0.0, params.ray_max_distance
    )
    tmin = np.maximum(tmin, F(0.0)) + ENTRY_EPS * step
    live = hit & (tmax > 0.0)
    S = max(1, int(np.ceil(float((tmax - tmin).max() / step))) + 1)

    n = o.shape[0]
    # Phase 1: march (row blocks bound the (blk, S) temporaries).
    ray_id_parts, w_parts, pw_parts = [], [], []
    blk = max(1, 4_000_000 // S)
    for a in range(0, n, blk):
        b = slice(a, min(a + blk, n))
        # Sequential t accumulation (t = F(t + step) per step in the loopy
        # oracle) == an f32 cumsum over [t0, step, step, ...].
        incr = np.full((tmax[b].shape[0], S), step, F)
        incr[:, 0] = tmin[b]
        t = np.cumsum(incr, axis=-1, dtype=F)
        pos = (o[b, None, :] + d[b, None, :] * t[..., None]).astype(F)
        val = _sample(g, pos)
        atten = np.exp(-val * absorption * step).astype(F)
        trans = np.concatenate(
            [np.ones((pos.shape[0], 1), F),
             np.cumprod(atten[:, :-1], axis=-1).astype(F)], axis=-1,
        )
        active = (
            live[b, None] & (t < tmax[b, None]) & (trans > F(0.001))
            & (val > 0.0)
        )
        w = np.where(active, trans * val * step, F(0.0))
        rid, sid = np.nonzero(w)
        w_parts.append(w[rid, sid])
        ray_id_parts.append(rid.astype(np.int64) + a)
        p_world = (
            np.einsum("ij,nj->ni", g["mat"], pos[rid, sid])
            + g["vec"][None, :]
        ).astype(F)
        pw_parts.append(p_world)
    w_nz = np.concatenate(w_parts) if w_parts else np.zeros(0, F)
    rid_nz = np.concatenate(ray_id_parts) if ray_id_parts else np.zeros(0, np.int64)
    pw_nz = np.concatenate(pw_parts) if pw_parts else np.zeros((0, 3), F)

    # Phase 2: sample x light sum over nonzero samples only.
    light = np.zeros(len(w_nz), F)
    if lp.shape[0] and len(w_nz):
        cblk = max(1, chunk_elems // max(1, lp.shape[0]))
        for a in range(0, len(w_nz), cblk):
            b = slice(a, min(a + cblk, len(w_nz)))
            if algorithm in ("point", "ray"):
                c = _point_contrib(pw_nz[b], lp, li)
            else:
                c = _sphere_contrib(pw_nz[b], lp, li, params.beam_radius)
            light[b] = c.sum(axis=-1).astype(F)

    final = np.zeros(n, F)
    np.add.at(final, rid_nz, w_nz * light)
    out = final / F(max(count, 1))
    return np.clip(out, F(0.0), F(1.0)).astype(F).reshape(H, W)
