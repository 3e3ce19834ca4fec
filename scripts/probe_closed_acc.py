"""Accuracy sweep for the closed-form VBL sphere-light segment integral
(beam_quadrature_rule="closed").

Evaluates the f32 closed form — the ACTUAL oracle branch of
ops/gather.segment_sphere_quadrature_xla(rule="closed"), which shares
its algebra with the Pallas kernels but uses exact transcendentals —
against an f64 composite-midpoint reference (2M nodes, NumPy) of the
raw integrand J = int_0^L ds / (d(s) - r)^2, over a log-uniform sweep
of closest approach q/r in [1.02, 1e5] and projection offset b/L in
[-20, 20] — the full nonsingular regime (the kernel clamps q to
r*(1+1/64); below that the true integral diverges through the sphere
surface and every rule saturates).

Committed run (CPU, n=4096 cases, seed 5): see the printed line in the
repo history / params.py's beam_quadrature_rule docstring.  The closed
form is exact to f32 roundoff everywhere it is defined; the in-kernel
polynomial _atan (~2e-5) dominates end-to-end error.  Compare
tangent-8's ~1e-3 near-sphere tail
(tests/test_gather.py::test_beam_closed_form_accuracy).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def reference_f64(q, b, L, r, nodes=2_000_000):
    """f64 composite midpoint of 1/(d(s) - r)^2 with
    d(s) = sqrt(q^2 + (s - b)^2)."""
    s = (np.arange(nodes, dtype=np.float64) + 0.5) * (L / nodes)
    d = np.sqrt(q * q + (s - b) ** 2)
    return float(np.sum((L / nodes) / (d - r) ** 2))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from volumerenderer_tpu.ops.gather import segment_sphere_quadrature_xla
    from volumerenderer_tpu.ops.lights import FOUR_PI

    n = 4096 if "--quick" not in sys.argv else 256
    rs = np.random.RandomState(5)
    r = 0.3
    qs = r * 10.0 ** (rs.rand(n) * (5.0 - np.log10(1.02)) + np.log10(1.02))
    Ls = rs.rand(n) * 20 + 0.25
    bs = (rs.rand(n) * 40 - 20) * Ls

    # One segment per case with closest approach q to the origin sample,
    # parameterized so the projection of the sample onto the segment
    # line is at arclength b.  intensity = 4*pi*L makes ii == 1, so the
    # oracle returns J directly.
    sample = jnp.zeros((1, 3), jnp.float32)
    rels = []
    batch = 64
    for i0 in range(0, n, batch):
        q, L, b = qs[i0:i0 + batch], Ls[i0:i0 + batch], bs[i0:i0 + batch]
        m = len(q)
        pos_from = np.stack([q, -b, np.zeros(m)], axis=1).astype(np.float32)
        pos_to = pos_from + np.stack(
            [np.zeros(m), L, np.zeros(m)], axis=1).astype(np.float32)
        inten = (float(FOUR_PI) * L).astype(np.float32)
        for k in range(m):
            g = float(segment_sphere_quadrature_xla(
                sample, jnp.asarray(pos_from[k:k + 1]),
                jnp.asarray(pos_to[k:k + 1]), jnp.asarray(inten[k:k + 1]),
                jnp.ones((1,), bool), r, nodes=2, rule="closed")[0])
            want = reference_f64(float(q[k]), float(b[k]), float(L[k]), r)
            rels.append(abs(g - want) / max(abs(want), 1e-300))
    rels = np.asarray(rels)
    print("n=%d  q/r in [1.02, 1e5], b/L in [-20, 20]" % n)
    print("max rel %.2e  p99 %.2e  p95 %.2e  median %.2e"
          % (rels.max(), np.percentile(rels, 99), np.percentile(rels, 95),
             np.median(rels)))
    assert rels.max() < 1e-4, "closed form drifted from f32-exact"


if __name__ == "__main__":
    main()
