"""Microbenchmark: discrete Ray/Beam sub-light inner-loop formulations.

Times candidate Pallas kernel bodies on synthetic lane planes shaped like
the 1080p bench workload (~36M effective samples, ~70 segments x ~32
sub-lights) to pick the per-pair evaluation before wiring it into
ops/pallas/gather_lanes.py.  Also reports max relative error of each
variant vs the exact difference-form evaluation.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from volumerenderer_tpu.ops.lights import FOUR_PI, GUARD

TILE_L = 1024
SLAB = 8


def _slab_loop(need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref, body):
    i = pl.program_id(0)
    o_ref[:] = jnp.zeros_like(o_ref)
    nslab = (need_ref[i] + (SLAB - 1)) // SLAB

    def slab(j, _):
        r = pl.ds(pl.multiple_of(j * SLAB, SLAB), SLAB)
        px = px_ref[r, :]
        py = py_ref[r, :]
        pz = pz_ref[r, :]
        acc = body(px, py, pz)
        o_ref[:] += jnp.sum(w_ref[r, :] * acc, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, nslab, slab, 0)


def _kernel(meta_ref, scal_ref, ax_ref, ay_ref, az_ref, ux_ref,
            uy_ref, uz_ref, ns_ref, ii_ref, need_ref,
            px_ref, py_ref, pz_ref, w_ref, o_ref,
            *, sphere: bool, variant: str):
    start = meta_ref[0]
    count = meta_ref[1]
    lstep = scal_ref[0]
    radius = scal_ref[1]

    BIG = jnp.float32(1e9)

    def body(px, py, pz):
        def seg_pair4(k, acc):
            # 4-way rational pairing: sum 1/q_i with ONE divide per 4
            # sub-lights; guarded/overrun terms get q=BIG -> ~0.
            ax, ay, az = ax_ref[k], ay_ref[k], az_ref[k]
            ux, uy, uz = ux_ref[k], uy_ref[k], uz_ref[k]
            ii = ii_ref[k]
            ns = ns_ref[k]
            quad = variant.startswith("quadpair")
            if quad:
                dx0 = px - ax
                dy0 = py - ay
                dz0 = pz - az
                b = dx0 * ux + dy0 * uy + dz0 * uz
                c = dx0 * dx0 + dy0 * dy0 + dz0 * dz0

            def group(g, inner):
                qs = []
                for j in range(4):
                    s = g * 4 + j
                    sf = s.astype(jnp.float32) * lstep
                    if quad:
                        d2 = (c - (2.0 * sf) * b) + sf * sf
                    else:
                        dx = px - (ax + sf * ux)
                        dy = py - (ay + sf * uy)
                        dz = pz - (az + sf * uz)
                        d2 = dx * dx + dy * dy + dz * dz
                    if sphere:
                        # Sphere-distance variants under identical pairing:
                        #   (default)  exact jnp.sqrt
                        #   *_rsq      dist = d2 * rsqrt(d2) (hardware rsqrt)
                        #   *_fast     bit-trick inverse sqrt + 2 Newton
                        if variant.endswith("_rsq"):
                            dist = d2 * jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                        elif variant.endswith("_fast"):
                            y = jax.lax.bitcast_convert_type(
                                jnp.int32(0x5F3759DF)
                                - (jax.lax.bitcast_convert_type(
                                    d2, jnp.int32) >> 1),
                                jnp.float32,
                            )
                            y = y * (1.5 - 0.5 * d2 * y * y)
                            y = y * (1.5 - 0.5 * d2 * y * y)
                            dist = d2 * y
                        else:
                            dist = jnp.sqrt(d2)
                        dd = dist - radius
                        d2e = dd * dd
                        bad = (d2e < GUARD) | (dist == 0.0) | (s >= ns)
                    else:
                        d2e = d2
                        bad = (d2 < GUARD) | (s >= ns)
                    qs.append(jnp.where(bad, BIG, d2e))
                q12 = qs[0] * qs[1]
                q34 = qs[2] * qs[3]
                s12 = qs[0] + qs[1]
                s34 = qs[2] + qs[3]
                return inner + (s12 * q34 + s34 * q12) / (q12 * q34)

            part = jax.lax.fori_loop(
                0, (ns + 3) // 4, group, jnp.zeros_like(acc)
            )
            return acc + ii * part

        def seg(k, acc):
            if variant.startswith(("pair4", "quadpair4")):
                return seg_pair4(k, acc)
            ax, ay, az = ax_ref[k], ay_ref[k], az_ref[k]
            ux, uy, uz = ux_ref[k], uy_ref[k], uz_ref[k]
            ii = ii_ref[k]
            if variant != "exact":
                dx0 = px - ax
                dy0 = py - ay
                dz0 = pz - az
                b = dx0 * ux + dy0 * uy + dz0 * uz
                c = dx0 * dx0 + dy0 * dy0 + dz0 * dz0

            def sub(s, inner):
                sf = s.astype(jnp.float32) * lstep
                if variant == "exact":
                    dx = px - (ax + sf * ux)
                    dy = py - (ay + sf * uy)
                    dz = pz - (az + sf * uz)
                    d2 = dx * dx + dy * dy + dz * dz
                else:
                    d2 = (c - (2.0 * sf) * b) + sf * sf
                if sphere:
                    if variant == "quad_rsqrt":
                        rs = jax.lax.rsqrt(jnp.maximum(d2, 1e-30))
                        dist = d2 * rs
                    else:
                        dist = jnp.sqrt(d2)
                    dd = dist - radius
                    d2e = dd * dd
                    bad = (d2e < GUARD) | (dist == 0.0)
                    if variant == "quad_rsqrt":
                        r2 = jax.lax.rsqrt(jnp.maximum(d2e, GUARD))
                        contrib = ii * (r2 * r2)
                    else:
                        contrib = ii / jnp.maximum(d2e, GUARD)
                else:
                    bad = d2 < GUARD
                    if variant == "quad_rsqrt":
                        r2 = jax.lax.rsqrt(jnp.maximum(d2, GUARD))
                        contrib = ii * (r2 * r2)
                    elif variant == "quad_nomax":
                        contrib = ii / d2
                    else:
                        contrib = ii / jnp.maximum(d2, GUARD)
                return inner + jnp.where(bad, 0.0, contrib)

            return jax.lax.fori_loop(0, ns_ref[k], sub, acc)

        return jax.lax.fori_loop(start, start + count, seg, jnp.zeros_like(px))

    _slab_loop(need_ref, px_ref, py_ref, pz_ref, w_ref, o_ref, body)


def run(variant, sphere, planes, scalars, block_need, Cp, Rc):
    kern = functools.partial(_kernel, sphere=sphere, variant=variant)
    spec = lambda: pl.BlockSpec(
        (Cp, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        grid=(Rc // TILE_L,),
        in_specs=[smem()] * 11 + [spec()] * 4,
        out_specs=pl.BlockSpec(
            (1, TILE_L), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, Rc), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=10 * Cp * Rc * 70 * 32,
            bytes_accessed=4 * Cp * Rc * 4,
            transcendentals=0,
        ),
    )(*a))
    args = scalars + (block_need,) + planes
    # NOTE: under the axon tunnel block_until_ready does NOT synchronize;
    # a host readback per call is the only trustworthy timing fence.
    np.asarray(f(*args))
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / n
    return out[0], dt


def main():
    rng = np.random.default_rng(0)
    Cp, Rc = 80, 448 * TILE_L  # ~36.7M effective samples
    nseg = 70
    # World-scale coordinates like the bench scene (extent ~100).
    planes = tuple(
        jnp.asarray(rng.uniform(-60, 60, (Cp, Rc)), jnp.float32)
        for _ in range(3)
    )
    w = jnp.asarray(rng.uniform(0.1, 1.0, (Cp, Rc)), jnp.float32)
    planes = planes + (w,)
    a = rng.uniform(-40, 40, (nseg, 3)).astype(np.float32)
    d = rng.normal(size=(nseg, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    length = rng.uniform(5, 15, nseg).astype(np.float32)  # ~32 steps @ 0.3
    lstep = 0.3
    ns = (length / lstep).astype(np.int32)
    ii = (rng.uniform(0.5, 2.0, nseg) / np.maximum(ns, 1) / FOUR_PI).astype(
        np.float32
    )
    meta = jnp.asarray([0, nseg], jnp.int32)
    scal = jnp.asarray([lstep, 0.1], jnp.float32)
    scalars = (
        meta, scal,
        jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]),
        jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]),
        jnp.asarray(ns), jnp.asarray(ii),
    )
    block_need = jnp.full((Rc // TILE_L,), Cp, jnp.int32)
    total_pairs = Cp * Rc * int(ns.sum())

    for sphere in (False, True):
        name = "BEAM" if sphere else "RAY"
        ref = None
        variants = ("exact", "quad_rsqrt", "pair4", "quadpair4")
        if sphere:
            variants += ("quadpair4_rsq", "quadpair4_fast")
        for variant in variants:
            out, dt = run(variant, sphere, planes, scalars, block_need, Cp, Rc)
            if ref is None:
                ref = out
                err = 0.0
            else:
                err = float(
                    np.max(np.abs(out - ref) / np.maximum(np.abs(ref), 1e-6))
                )
            print(
                f"{name:5s} {variant:12s} {dt * 1e3:8.1f} ms"
                f"  {total_pairs / dt / 1e9:7.1f} Gpairs/s"
                f"  relerr {err:.2e}"
            )


if __name__ == "__main__":
    main()
