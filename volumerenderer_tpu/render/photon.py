"""Photon-walk virtual-light generation (light_gen.comp, used by BEAM / RAY /
POINT / SPHERE — all four *_LIGHT_GEN_PATHs load light_gen.comp.spv,
src/main.cpp:47-57).

Reference semantics (light_gen.comp:9-100): 16 photon threads per frame, each
starting at ``lightSourceWorldPos`` with a uniform random direction, fixed-
step marching; at each occupied voxel the photon attenuates intensity and
transmittance by ``exp(-val * absorption * dt)``, then rolls
``scatteringProbability``; on scatter it atomically appends a RayLight
{positionFrom = previous scatter pos, positionTo = here, intensity} and
re-marches from the scatter point with a fresh random direction.

TPU-native redesign — no atomics, no divergent while-loop:

  * Outer ``lax.scan`` over *segments* (straight runs between scatters).
  * Inner step: the whole segment is marched **vectorized** — densities for
    all step positions fetched at once, the scatter roll for every occupied
    voxel evaluated in parallel (the RNG is counter-based, ops/rng.py), and
    the first accepted scatter found with an argmax.  A segment of hundreds
    of steps costs one scan iteration instead of hundreds.
  * Each photon owns a fixed range of event slots; the global ``maxLights``
    cap is applied afterwards by rank (deterministic, photon-major), playing
    the role of the reference's racy overflow clamp (light_gen.comp:85-87).

Deviations (documented): the reference walk is unbounded; we cap at
``max_events_per_photon`` segments and ``max_photon_steps`` steps/segment.
The reference freezes ``previousPosition`` when the *global* buffer is full;
we freeze per-photon when its slots are full.  The reference reuses the
world-space ``randomDir`` directly as an index-space direction after a
scatter (light_gen.comp:90) — identical distribution for axis-aligned
uniform-scale maps; we reproduce that literally.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..engine.params import RenderParams, StaticConfig
from ..grid.dense import DenseGrid
from ..ops import intersect, rng
from ..ops.scan import cumsum_1d


class LightArray(NamedTuple):
    """Fixed-size replacement for the lights SSBO + atomic counter
    (common_bindings.h:10-17)."""

    pos_from: jax.Array  # (L, 3) world
    pos_to: jax.Array  # (L, 3) world
    intensity: jax.Array  # (L,)
    valid: jax.Array  # (L,) bool
    count: jax.Array  # () int32 == lightCount after clamping
    # () bool — some photon scattered with no free event slot, i.e. the
    # max_events_per_photon budget TRUNCATED the light population (the
    # reference's walk is unbounded up to the global maxLights clamp,
    # light_gen.comp:51-87; PARITY #1 scale caveat).  The engine surfaces
    # this as a one-time runtime warning (Renderer._maybe_warn_light_truncation) so
    # production assets don't render quietly dimmer than the reference.
    truncated: jax.Array


def generate_lights(
    grid: DenseGrid,
    params: RenderParams,
    frame_count,
    config: StaticConfig,
    max_steps: int | None = None,
    debug_iters: bool = False,
) -> LightArray:
    """Run the photon walk for one frame. ``frame_count`` is the 1-based frame
    counter (the reference seeds with gid * frameCount, light_gen.comp:15).

    ``max_steps`` bounds each straight segment; a segment's interaction with
    the volume is one contiguous bbox crossing (convex box, no re-entry), so
    bounding it by the bbox diagonal (render.color.required_march_steps) is
    exact.
    """
    n = config.photon_grid
    P = config.num_photons
    K = config.max_events_per_photon
    S = max_steps if max_steps is not None else config.max_photon_steps

    # gl_GlobalInvocationID = (x, y, 0) over the 4x4 local group; x varies
    # fastest.  Photon p <-> gid (p % n, p // n, 0).
    p_ids = jnp.arange(P)
    gx = p_ids % n
    gy = p_ids // n
    seed0 = rng.make_seed(gx, gy, jnp.zeros(P), frame_count)

    # Initial direction: two draws, world space (light_gen.comp:22).
    r1 = rng.randf_at(seed0, 1)
    r2 = rng.randf_at(seed0, 2)
    dir_world = rng.random_dir(r1, r2)
    n_draws = jnp.full((P,), 2, jnp.uint32)

    origin_world = jnp.broadcast_to(params.light_source_world_pos, (P, 3))
    origin_idx = grid.world_to_index(origin_world)
    d_idx = grid.world_to_index_dir(dir_world)
    d_idx = d_idx / jnp.linalg.norm(d_idx, axis=-1, keepdims=True)

    hit, tmin, tmax = intersect.intersect_aabb(
        origin_idx,
        d_idx,
        grid.box_min_f,
        grid.box_max_f,
        jnp.zeros((P,)),
        jnp.full((P,), params.ray_max_distance),
    )
    step = params.ray_marching_step_size
    absorption = params.absorption_coefficient

    from ..ops.march import ENTRY_EPS  # entry-face disambiguation nudge

    carry = dict(
        origin=origin_idx,  # segment origin, index space
        direction=d_idx,
        t0=tmin + ENTRY_EPS * step,  # t of the first sample of this segment
        trans=jnp.ones((P,)),
        intensity=jnp.full((P,), params.photon_initial_intensity),
        prev_pos=origin_world,  # previousPosition (world)
        seed=seed0,
        n_draws=n_draws,
        n_events=jnp.zeros((P,), jnp.int32),
        alive=hit,
        events=jnp.zeros((P, K, 7), jnp.float32),
    )

    # Windowed scanning: each while-iteration examines a WINDOW of steps
    # instead of a full worst-case segment, so cost tracks the steps
    # actually walked (long-diagonal volumes: 10-30x less work).  A window
    # with no scatter either continues the segment (attenuation applied,
    # t0 advanced) or ends the walk; S still bounds a segment exactly
    # (a straight segment cannot re-enter the convex bbox).
    Wn = min(256, S)
    ks = jnp.arange(Wn, dtype=jnp.float32)

    def segment(carry):
        t = carry["t0"][:, None] + ks[None, :] * step  # (P, Wn)
        pos = (
            carry["origin"][:, None, :]
            + carry["direction"][:, None, :] * t[:, :, None]
        )
        val = grid.sample_nearest(pos)  # (P, S), 0 outside bbox
        occ = val > 0.0

        atten = jnp.where(occ, jnp.exp(-val * absorption * step), 1.0)
        cum_att = jnp.cumprod(atten, axis=-1)  # inclusive
        trans_before = jnp.concatenate(
            [jnp.ones((P, 1)), cum_att[:, :-1]], axis=-1
        ) * carry["trans"][:, None]
        int_before = jnp.concatenate(
            [jnp.ones((P, 1)), cum_att[:, :-1]], axis=-1
        ) * carry["intensity"][:, None]
        # Loop-entry condition at step k (light_gen.comp:51) — uses the
        # pre-attenuation values; within tmax of the *initial* clip.
        entered = (
            carry["alive"][:, None]
            & (t < tmax[:, None])
            & (trans_before > 0.001)
            & (int_before > 0.01)
        )

        # Scatter roll: occupied voxel k consumes one draw (after its
        # attenuation); the draw index is n_draws + #occupied in [0..k].
        occ_rank = jnp.cumsum((occ & entered).astype(jnp.uint32), axis=-1)
        roll = rng.randf_at(
            carry["seed"][:, None, :], carry["n_draws"][:, None] + occ_rank
        )
        scatter = occ & entered & (roll < params.scattering_probability)

        any_scatter = jnp.any(scatter, axis=-1)
        k_star = jnp.argmax(scatter, axis=-1)  # first scatter step
        pick = lambda a: jnp.take_along_axis(a, k_star[:, None], axis=-1)[:, 0]

        # Post-attenuation state at the scatter voxel.
        att_at = pick(cum_att)
        new_trans = carry["trans"] * att_at
        new_int = carry["intensity"] * att_at
        draws_used = pick(occ_rank)  # includes the scatter voxel's roll
        scat_pos = jnp.take_along_axis(
            pos, k_star[:, None, None], axis=1
        )[:, 0, :]

        # New direction: two more draws (light_gen.comp:72).
        nd1 = rng.randf_at(carry["seed"], carry["n_draws"] + draws_used + 1)
        nd2 = rng.randf_at(carry["seed"], carry["n_draws"] + draws_used + 2)
        new_dir = rng.random_dir(nd1, nd2)  # used directly in index space

        # Emit the event into the photon's next free slot.  A scatter
        # with no free slot is a DROPPED event — the budget-truncation
        # signal (LightArray.truncated).
        scat_world = grid.index_to_world(scat_pos)
        can_store = any_scatter & (carry["n_events"] < K)
        dropped = carry["dropped"] | jnp.any(any_scatter & ~can_store)
        slot = jnp.clip(carry["n_events"], 0, K - 1)
        record = jnp.concatenate(
            [carry["prev_pos"], scat_world, new_int[:, None]], axis=-1
        )
        onehot = (
            jnp.arange(K)[None, :] == slot[:, None]
        ) & can_store[:, None]
        events = jnp.where(onehot[:, :, None], record[:, None, :], carry["events"])

        # No scatter in this window: the segment CONTINUES into the next
        # window iff the walk was still live at the window's end (entered
        # is monotone within a window) and the segment hasn't exceeded its
        # exact bbox-crossing bound S.
        seg_steps = carry["seg_steps"] + Wn
        window_draws = occ_rank[:, -1]  # all occupied entered voxels rolled
        cont = (
            ~any_scatter
            & entered[:, -1]
            & (seg_steps < S)
        )
        win_att = cum_att[:, -1]

        new_carry = dict(
            seg_i=carry["seg_i"] + 1,
            origin=jnp.where(any_scatter[:, None], scat_pos, carry["origin"]),
            direction=jnp.where(any_scatter[:, None], new_dir, carry["direction"]),
            # After a scatter: currentT=0 then += step before the next
            # sample; otherwise advance to the next window.
            t0=jnp.where(any_scatter, step, carry["t0"] + Wn * step),
            trans=jnp.where(
                any_scatter, new_trans,
                jnp.where(cont, carry["trans"] * win_att, carry["trans"]),
            ),
            intensity=jnp.where(
                any_scatter, new_int,
                jnp.where(cont, carry["intensity"] * win_att, carry["intensity"]),
            ),
            prev_pos=jnp.where(can_store[:, None], scat_world, carry["prev_pos"]),
            seed=carry["seed"],
            n_draws=carry["n_draws"]
            + jnp.where(
                any_scatter, draws_used + 2, jnp.where(cont, window_draws, 0)
            ).astype(jnp.uint32),
            n_events=carry["n_events"] + can_store.astype(jnp.int32),
            alive=carry["alive"] & (any_scatter | cont),
            seg_steps=jnp.where(any_scatter, 0, seg_steps),
            events=events,
            dropped=dropped,
        )
        return new_carry

    # Bounded while-loop over windows+segments; exits as soon as every
    # photon has finished.  The cap covers K+1 scatter segments plus a
    # total straight-marching budget of max_photon_steps.
    carry["seg_i"] = jnp.zeros((), jnp.int32)
    carry["seg_steps"] = jnp.zeros((P,), jnp.int32)
    carry["dropped"] = jnp.zeros((), bool)
    max_iters = (K + 1) + max(1, config.max_photon_steps // Wn)
    carry = jax.lax.while_loop(
        lambda c: jnp.any(c["alive"]) & (c["seg_i"] < max_iters),
        segment,
        carry,
    )

    # ---- global maxLights clamp, deterministic photon-major order ----
    events = carry["events"].reshape(P * K, 7)
    valid_flat = (
        jnp.arange(K)[None, :] < carry["n_events"][:, None]
    ).reshape(P * K)
    rank = cumsum_1d(valid_flat.astype(jnp.int32))  # 1-based among valid
    keep = valid_flat & (rank <= params.max_lights)
    L = config.light_capacity
    dest = jnp.where(keep, rank - 1, L)  # L == dropped (mode="drop")
    out = jnp.zeros((L, 7), jnp.float32).at[dest].set(events, mode="drop")
    count = jnp.minimum(jnp.sum(valid_flat.astype(jnp.int32)), params.max_lights)
    slot_valid = jnp.arange(L) < count
    la = LightArray(
        pos_from=out[:, 0:3],
        pos_to=out[:, 3:6],
        intensity=out[:, 6],
        valid=slot_valid,
        count=count,
        truncated=carry["dropped"],
    )
    if debug_iters:
        return la, carry["seg_i"]
    return la


def empty_lights(config: StaticConfig) -> LightArray:
    """PATH's light-gen is a no-op (path_light_gen.comp:9-11); lightCount
    stays 0 after the per-frame counter reset (src/main.cpp:722-728)."""
    L = config.light_capacity
    return LightArray(
        pos_from=jnp.zeros((L, 3)),
        pos_to=jnp.zeros((L, 3)),
        intensity=jnp.zeros((L,)),
        valid=jnp.zeros((L,), bool),
        count=jnp.zeros((), jnp.int32),
        truncated=jnp.zeros((), bool),
    )
