"""Scene / render parameters — the TPU-native replacement for the UBO + ImGui
state (src/main.cpp:83-98, 538-562; shaders/common_bindings.h:19-34).

Two pieces:

  * ``RenderParams`` — a pytree of the 14 UBO fields (minus frameCount, which
    is render *state*, and framebufferDim, which is static shape).  Editing a
    field is a functional ``replace``; no re-upload machinery needed — jit
    retraces nothing because these are traced leaves.
  * ``StaticConfig`` — hashable compile-time configuration: image size and
    every capacity that sizes an array (light slots, march trip counts...).
    These correspond to the reference's compile-time constants
    (src/main.cpp:40-44, 383; light_gen.comp:7).
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
from flax import struct


class Algorithm(enum.IntEnum):
    """Algorithm ids, same order as the reference enum (src/main.cpp:65-68)
    and the ImGui combo (src/main.cpp:652)."""

    BEAM = 0
    RAY = 1
    POINT = 2
    SPHERE = 3
    PATH = 4


class Fidelity(enum.Enum):
    """PATH single-light transmittance handling.

    REFERENCE reproduces path_compute_color.comp:9-31 literally, including
    the frozen march position (the loop attenuates N times by the density at
    one fixed point one step from the light: line 20 never advances with s).
    CORRECTED marches the light->sample segment properly.
    """

    REFERENCE = "reference"
    CORRECTED = "corrected"


@struct.dataclass
class RenderParams:
    """UBO fields (std140 block at common_bindings.h:19-34), defaults from
    src/main.cpp:546-559."""

    camera_pos: jnp.ndarray  # vec3, default (0, 20, -75)
    # Extension: camera orientation (camera-space +z forward). The reference
    # has NO orientation control — its camera always looks down +z
    # (point_compute_color.comp:36); identity reproduces that. Build with
    # ops.camera.look_at_rotation.
    camera_rotation: jnp.ndarray  # (3, 3), default identity
    fov: jnp.ndarray  # degrees
    photon_initial_intensity: jnp.ndarray
    scattering_probability: jnp.ndarray
    absorption_coefficient: jnp.ndarray
    max_lights: jnp.ndarray  # uint runtime cap (<= StaticConfig.light_capacity)
    ray_max_distance: jnp.ndarray
    ray_marching_step_size: jnp.ndarray
    light_source_world_pos: jnp.ndarray  # vec3
    beam_radius: jnp.ndarray
    light_ray_step_size: jnp.ndarray
    radius_falloff: jnp.ndarray  # plumbed but unused, as in the reference

    @classmethod
    def default(cls) -> "RenderParams":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(
            camera_pos=f32([0.0, 20.0, -75.0]),
            camera_rotation=jnp.eye(3, dtype=jnp.float32),
            fov=f32(45.0),
            photon_initial_intensity=f32(100.0),
            scattering_probability=f32(0.05),
            absorption_coefficient=f32(0.05),
            max_lights=jnp.asarray(1000, jnp.int32),
            ray_max_distance=f32(2500.0),
            ray_marching_step_size=f32(1.0),
            light_source_world_pos=f32([-20.0, 15.0, -15.0]),
            beam_radius=f32(0.1),
            light_ray_step_size=f32(0.3),
            radius_falloff=f32(0.5),
        )


@dataclasses.dataclass(frozen=True)
class StaticConfig:
    """Hashable compile-time knobs (passed as static to jit)."""

    width: int = 1024  # src/main.cpp:40
    height: int = 1024  # src/main.cpp:41
    num_photons: int = 16  # 1x1x1 dispatch x 4x4 local (src/main.cpp:814)
    light_capacity: int = 1000  # slot-array size; reference buffer holds 100k
    max_march_steps: int = 2500  # static bound on color-march trip count
    max_photon_steps: int = 4096  # bound on the (unbounded) photon walk
    max_events_per_photon: int = 256  # scatter-event slots per photon
    max_path_segments: int = 8  # scatter re-origins per camera path
    max_points_per_segment: int = 512  # Ray/Beam sub-light cap per segment
    expanded_light_capacity: int = 16384  # compacted Ray/Beam sub-light slots
    # Optional per-ray top-k cap on baked march samples (0 = uncapped,
    # fully exact).  With compact_view the march is already bounded by the
    # brick-occupancy probe and banded builds bound peak HBM, so the cap
    # is only a deliberate lossy-speed knob, not a memory necessity.
    gather_samples: int = 0
    # Globally compact the baked view to its nonzero-weight samples
    # (render.color.CompactView): engine.session probes the march once per
    # view rebuild, auto-sizes the per-ray cap C = max nonzero samples
    # (<= gather_samples cap, exact when it fits) and the compact capacity
    # = true nonzero count. ~3-5x fewer shade-kernel blocks at the 1080p
    # bench config for every gather algorithm.
    compact_view: bool = True
    # How the CompactView is built:
    #   "host"   — occupancy counts read back to host, np.argsort lane
    #              order, per-band caps sized from the sorted counts
    #              (tight memory; D2H sync + count-dependent shapes).
    #   "device" — everything on device with static shapes
    #              (render.color.build_compact_view_device): no host sync,
    #              no per-camera recompiles, exact by construction; plane
    #              memory covers all rays at the global cap.
    #   "auto"   — "device" when the full-width planes fit the session's
    #              device_view_budget_bytes and gather_samples == 0, else
    #              "host".
    compact_build: str = "auto"
    # Interactive camera motion (VERDICT r2 #3): while the camera/march
    # parameters change BETWEEN CONSECUTIVE frames, render through a cheap
    # degraded path instead of rebuilding the exact view cache per frame;
    # the settled camera rebuilds exactly on the next unchanged frame.
    #   "off"       — reference parity: every frame exact (default).
    #   "coarse"    — motion frames march the FULL depth range at
    #                 ``motion_stride`` × the configured step size (the
    #                 march math multiplies every contribution and
    #                 attenuation by the step, so the coarser Riemann sum
    #                 approximates the same integral — brightness is
    #                 preserved, unlike "truncated"), through the PLAIN
    #                 UNCACHED step: no view build, no transposes, one
    #                 already-compiled program per drag frame (camera is
    #                 a traced value).  Measured @1080p/96^3: stride 12 =
    #                 12.8 Mrays/s mid-drag at settled-image brightness
    #                 (scripts/probe_motion_paths.py; the device-build
    #                 variant pays a ~150 ms fixed build cost and the
    #                 truncated prefix is 5.5x dim).  The photon walk
    #                 shares the coarser step (its attenuation is also
    #                 per-unit-length; scatter placement shifts slightly
    #                 — disclosed preview semantics, and POINT/SPHERE
    #                 normalize by lightCount).
    #   "truncated" — motion frames march only the first ``motion_cap``
    #                 occupied samples per ray via the same device build
    #                 at a shorter cap.  NOTE: with the reference's low
    #                 default absorption (0.05) the front prefix carries
    #                 only a small fraction of the in-scattered radiance,
    #                 so drag frames render several times dimmer than the
    #                 settled image ("coarse" fixes this); kept for the
    #                 cases where the front prefix IS dominant (high
    #                 absorption / dense media).  Measured @1080p/96^3:
    #                 cap 16 = 10.8 Mrays/s, cap 32 = 8.2 (vs 1.2 for the
    #                 default exact rebuild).
    motion_mode: str = "off"
    motion_cap: int = 16
    motion_stride: int = 12
    # Progressive settle ("coarse" motion + device compact build only):
    # when the camera stops, rebuild the exact view ONE row chunk per tick
    # — settle_chunks equal-height chunks, merged at the end
    # (render.color.merge_row_views) — while coarse drag frames keep
    # presenting between chunk dispatches.  The camera-stop hitch becomes
    # ~(rebuild/settle_chunks + one coarse frame) of inter-frame gap
    # instead of one blocking rebuild-sized freeze (the reference never
    # stalls on motion, src/main.cpp:620-934; this is the TPU answer).
    # <= 1, heights not divisible by it, host/banded builds, and PATH fall
    # back to the blocking rebuild.
    settle_chunks: int = 4
    # Gather-sample decimation (approximate FAST tier, all four gather
    # algorithms): fold each run of ``gather_stride`` consecutive march
    # samples into ONE light-field evaluation at the run's weight centroid
    # carrying the run's summed weight (render.color._decimate_band).  The
    # march itself — occupancy, transmittance, weights — stays exact; only
    # the in-scattered light field L(p), smooth away from lights, is
    # sampled coarser: sum_i w_i L(p_i) ~= (sum_i w_i) L(centroid), the
    # first-moment-matched (midpoint-rule) coarsening of the outer
    # integral, exact for locally-linear L.  Error is measured and
    # documented in BENCHMARKS.md; brightness is conserved exactly for a
    # constant field (the weight sum is preserved).  1 = off (default,
    # bit-parity); applies to compact views only.
    gather_stride: int = 1
    # Decimation fold rule (render.color._decimate_band*):
    #   "centroid" — one evaluation point per run of ``gather_stride``
    #                samples at the weight centroid (moments 0-1 matched);
    #   "gauss2"   — TWO evaluation points per run of ``2*gather_stride``
    #                samples at centroid +- weighted-stddev along the ray
    #                (moments 0-2 matched, and moment 3 of the symmetric
    #                pair is centered) — the SAME evaluations/sample cost
    #                as "centroid" at equal ``gather_stride``, roughly one
    #                polynomial order more accurate for smooth light
    #                fields (measured per algorithm in BENCHMARKS.md).
    gather_fold: str = "centroid"
    gather_impl: str = "auto"  # {auto,mxu,xla,vpu} x optional "_interpret"
    fidelity: Fidelity = Fidelity.REFERENCE
    interpolation: str = "nearest"  # "trilinear" = smoother (extension)
    # Ray/VRL + Beam/VBL sub-light handling:
    #   "discrete"          — reference parity: per-lightRayStepSize point
    #                         sampling, iterated in-kernel from the raw
    #                         segment table (uncapped, no HBM expansion).
    #   "discrete_expanded" — legacy parity path: materialize + compact the
    #                         sub-light expansion (capped by
    #                         max_points_per_segment/expanded_light_capacity).
    #   "analytic"          — evaluate the segment integral directly (closed
    #                         form for Ray; midpoint quadrature with
    #                         beam_quadrature_nodes points for Beam) —
    #                         10-100x fewer terms than discrete.
    segment_mode: str = "discrete"
    # Discrete-mode sub-light arithmetic:
    #   "exact"  — one guarded divide per sub-light, bit-parity with the
    #              reference's term order (the test-oracle evaluation).
    #              THE DEFAULT, so "term-for-term with the reference"
    #              holds out of the box (ADVICE r2).
    #   "paired" — the SAME sub-light sum with one divide per 4 terms
    #              (rational combination; ops/pallas/gather_lanes
    #              _discrete_kernel).  ~1.6x faster at 1080p; relative
    #              reassociation error <= 3e-5 (measured, PARITY.md) —
    #              the documented perf mode benchmark configs opt into.
    segment_eval: str = "exact"
    # Point/Sphere light-loop arithmetic, same contract as segment_eval:
    #   "exact"  — one guarded divide per (sample, light), the reference's
    #              term order (the default; test-oracle evaluation).
    #   "paired" — one divide per 4 lights via a rational combination with
    #              per-term numerators (ops/pallas/gather_lanes
    #              _point_kernel; guarded terms contribute exactly 0).
    #              Reassociation-only deviation <= 3e-5 relative — the
    #              perf mode benchmark configs opt into.
    gather_eval: str = "exact"
    beam_quadrature_nodes: int = 16
    # Node placement for the Beam analytic quadrature:
    #   "midpoint" — composite midpoint in arclength s (the default;
    #                validated vs fine discretizations at 16 nodes).
    #   "tangent"  — Gauss-Legendre in the tangent-transformed variable
    #                s = b + q tan(theta), under which the sphere-light
    #                integrand is near-constant (q/(q - r cos theta)^2).
    #                Measured strictly more accurate than midpoint-16 at
    #                8 nodes in every closest-approach regime, at ~half
    #                the per-(sample, light) cost.
    #   "closed"   — EXACT antiderivative of the same integrand, one atan
    #                per (sample, light), no node loop (quad nodes
    #                ignored; ops/pallas/gather_vpu._quad_nodes_nq
    #                "closed" for the derivation).  <= 2.9e-6 relative vs
    #                a 2M-node f64 reference for closest approach
    #                >= 1.02 r (scripts/probe_closed_acc.py; the kernel's
    #                polynomial atan adds ~2e-5); inside that the true
    #                integral diverges and the value saturates — the
    #                regime every rule is approximate in.  The fast Beam
    #                setting (cheaper AND tighter than tangent-8).
    beam_quadrature_rule: str = "midpoint"
    # PATH scatter segments below this many total rays skip the
    # compaction plumbing entirely (the fixed cost outweighs the gather
    # savings on tiny images).  Tests lower it to cover the compact path
    # at small image sizes.
    path_compact_min: int = 4096
    # Ray-tile width for the CACHED camera segment (render.path
    # _seg1_frame_rank over a baked PathView): the cached pass does zero
    # volume fetches — pure VPU replay over (tile, S) planes — so the
    # tile trades IN-PROGRAM loop overhead (measured ~0.38 ms per
    # lax.map iteration at 1080p: 127 tiles cost 47 ms where ONE fused
    # dispatch costs ~6 ms, scripts/probe_path_replay.py round 5)
    # against the (tile, S) working set.  0 (the default) auto-sizes:
    # the largest power-of-two tile whose f32 (tile, S) temporary stays
    # under ~256 MB, clamped to [16384, 524288] — one-to-few dispatches
    # at 1080p/S~170, narrower at asset-scale S~620.  The bake pads the
    # PathView to a multiple of the target so the configured tile
    # actually materializes (pad waste <= one tile).  Explicit values
    # are used directly (ADVICE r4): values below ray_tile shrink the
    # replay temporaries at large S.
    path_cached_tile: int = 0
    # Width of the fixed-shape chunks that walk the compacted alive-ray
    # list (render.path._scatter_segments): smaller = less padding waste
    # on the last chunk, larger = fewer sequential loop iterations.
    # 2048 measured best at 256^2-1080p scales on v5e.
    path_chunk: int = 2048
    # Minor-dim width the packed walk state is padded to (9 payload
    # columns since the round-5 seed-column elimination;
    # render.path._scatter_segments).  A measurement knob: the chunk row
    # gather charges ~5 clocks per ELEMENT at narrow widths, and wider
    # rows' faster per-row rate (width >= 100: ~54-61 ns/row vs 71 at
    # 13) measured a net frame-level LOSS in every sweep
    # (sweep_walk_1080p.py), so no padding is the default.  Values <= 9
    # mean "no padding".
    path_pack_width: int = 0
    # Sample-axis sub-block of the scatter-segment march: each chunk
    # early-exits once every ray has scattered or left the volume, so
    # typical segments fetch 2-4 sub-blocks instead of the worst-case
    # march length (render.path._walk_chunk).
    path_subblock: int = 32
    # Order the compacted alive-ray list by a per-ray block-count bound
    # before chunking (render.path._sorted_compact): each chunk's
    # while_loop runs to its slowest ray, so sorting makes the sum of
    # chunk maxima approach the ideal total (measured at asset scale:
    # per-ray blocks mean ~1.5 vs chunk max ~11).  Bit-exact — chunk
    # grouping never changes per-ray arithmetic; costs one argsort +
    # an arithmetic key per segment.
    path_sort_chunks: bool = True
    # Which per-ray key _sorted_compact orders by:
    #   "cells" — ceil(selected occupied cells / cell block), the chunk
    #             while_loop's true trip count — the tightest key, but its
    #             _select_cells evaluation is full-width (EVERY padded ray
    #             pays it every segment: measured ~40 ms/segment of pure
    #             key cost at 1080p, where the key outweighs the chunk
    #             wins it buys);
    #   "span"  — ceil(remaining in-box distance / sub-block span), one
    #             intersect_aabb: a correlation proxy (empty space along
    #             the span is invisible to it) at ~zero cost;
    #   "auto"  — "cells" up to path_compact_min*16 total rays, "span"
    #             beyond (the crossover measured on v5e: cells wins at
    #             256^2-512^2, span wins at 1080p).
    # Any key is bit-exact (scheduling only).
    path_sort_key: str = "auto"
    # Sort only at segment 2 and inherit the order afterwards: the
    # round-5 forwarding walk writes walked rows contiguously, so later
    # segments' compaction PRESERVES the segment-2 cost order (rays
    # keep their relative slots; only dead rows drop out).  Scattered
    # rays draw fresh directions each segment, so the inherited order
    # decays — a measurement knob (bit-exact either way).
    path_sort_once: bool = False
    # Scatter-segment empty-space skipping (render.path._walk_chunk
    # march_cell): 0 (default) = auto-derive the largest exact cell
    # (cell * step <= one 8-voxel brick pitch, as the camera view build
    # does); 1 = full sample axis; >1 = that exact cell size (caller must
    # keep cell * step <= brick pitch for exactness).  History: with the
    # brick table read via scattered jnp.take this measured SLOWER than
    # the skipped fetches (52.9 vs 44.4 ms/frame at 256^2 on v5e) and
    # defaulted off; the arithmetic bit-packed table select
    # (grid.dense._occ_table_lookup) flipped the trade — 40.3 vs 43.3
    # ms/frame, identical checksums — so it now defaults on.
    path_march_cell: int = 0
    # PATH march decimation (approximate FAST tier — the PATH analogue
    # of gather_stride, VERDICT r4 #8): march the camera segment AND the
    # scatter segments at ``path_stride x ray_marching_step_size`` with
    # the scatter roll probability adjusted to p' = 1 - (1-p)^stride
    # (matches the expected number of scatter events per unit length,
    # since the reference rolls independently per step) and every
    # occupied sample contributing val * (stride*step) * light_term (the
    # coarser Riemann sum of the same in-scatter integral — brightness
    # preserving for smooth fields, like motion_mode="coarse").  The
    # single-light term itself KEEPS reference semantics at the ORIGINAL
    # step (probe point and attenuation count are step-derived and stay
    # exact; the shadow LUT stays valid at any stride).  Volume fetches,
    # RNG rolls, and replay sites all drop ~stride x.  NOT bit-parity
    # (different RNG sites); quality quantified in BENCHMARKS.md.
    # 1 = off (default, bit-parity).
    path_stride: int = 1
    # PATH shadow-probe LUT (render.path): the REFERENCE-fidelity light
    # term reads one voxel within ``step`` of the light, replaceable by a
    # (2R+1)^3 arithmetic-select LUT with R = ceil(step) — bit-exact, no
    # per-sample gather.  The engine enables it while ceil(step) <= this
    # cap (0 disables; large radii would bloat the select chain).
    shadow_lut_max_radius: int = 2
    ray_tile: int = 16384  # rays processed per march tile (memory bound)
    # View-build tiling (render.color).  lax.map iterations cost ~1.5 ms
    # each on the remote-dispatch path, so the 2M-ray 1080p probe at
    # ray_tile granularity paid ~190 ms of pure loop overhead (127 tiles
    # for ~16 ms of work) — these paths get their own, larger tiles:
    #   probe_tile — occupancy_counts_rays (tiny temporaries: positions +
    #                one bool per cell endpoint; 256k rays ~= 63 MB);
    #   build_tile — build_view_rays march tiles (plane + march
    #                temporaries; 64k rays at a 144-cap ~= 0.5 GB peak).
    # Results are bit-identical across tile sizes (per-ray math with
    # pinned rounding); tests pin small values to keep multi-tile
    # coverage on small scenes.
    probe_tile: int = 262144
    build_tile: int = 65536
    accum_dtype: str = "float32"  # reference accumulates in rgba8; see state

    def __post_init__(self):
        # Mode strings compared with `==` downstream would otherwise fall
        # back silently on a typo (e.g. gather_fold="gauss" would measure
        # the centroid fold; an unknown path_sort_key behaves as "span") —
        # a misconfigured benchmark would quietly time the wrong tier.
        _allowed = {
            "gather_fold": {"centroid", "gauss2"},
            "path_sort_key": {"auto", "cells", "span"},
            "motion_mode": {"off", "coarse", "truncated"},
            "compact_build": {"auto", "host", "device"},
            "segment_mode": {"discrete", "discrete_expanded", "analytic"},
            "segment_eval": {"exact", "paired"},
            "gather_eval": {"exact", "paired"},
            "beam_quadrature_rule": {"midpoint", "tangent", "closed"},
            # base impl x optional interpret-mode suffix (ops.gather
            # strips "_interpret" and requires the base below).
            "gather_impl": {
                b + s
                for b in ("auto", "mxu", "xla", "vpu")
                for s in ("", "_interpret")
            },
            "interpolation": {"nearest", "trilinear"},
        }
        for field, ok in _allowed.items():
            v = getattr(self, field)
            if v not in ok:
                raise ValueError(
                    f"StaticConfig.{field}={v!r} — must be one of {sorted(ok)}"
                )
        if self.path_stride < 1:
            raise ValueError("StaticConfig.path_stride must be >= 1")
        if self.gather_stride < 1:
            raise ValueError("StaticConfig.gather_stride must be >= 1")

    @property
    def photon_grid(self):
        """Photon thread ids (gid.x, gid.y) for the 4x4 local group."""
        n = int(self.num_photons**0.5)
        assert n * n == self.num_photons, "num_photons must be a square"
        return n
