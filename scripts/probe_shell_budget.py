"""Re-attribute the 145M-voxel shell's 255-light plateau (round 5).

Round 4's PARITY #1 caveat blamed the ``max_events_per_photon`` budget
("a photon crossing ~500 occupied voxels at scattering 0.05 expects ~25
scatters > the 16-event default") — but the default has been 256 events
since the knob existed, and the reference's walk is NOT unbounded: its
loop runs only while ``T > 0.001 && photonIntensity > 0.01``
(light_gen.comp:51), the same attenuation cutoffs our walk reproduces.
This probe settles the attribution empirically with the round-5
``LightArray.truncated`` signal on the shell scene:

  - lights/frame + truncated at the DEFAULT budget
  - the same with max_events_per_photon halved/doubled (a budget-bound
    population would move; an attenuation-bound one would not)
  - per-photon event distribution (from the deterministic slot layout)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_shell_budget.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    t = time.perf_counter()
    _ = float(jnp.zeros((), jnp.float32))
    print(f"claimed in {time.perf_counter() - t:.0f}s", flush=True)

    from probe_shell_gather import shell_grid
    from volumerenderer_tpu.engine.params import RenderParams, StaticConfig
    from volumerenderer_tpu.render import photon
    from volumerenderer_tpu.render.color import required_march_steps

    grid = shell_grid()
    params = RenderParams.default().replace(
        light_source_world_pos=jnp.float32([0.0, 10.0, -30.0]),
    )
    steps = required_march_steps(grid, 1.0, 4096)
    print(f"shell {tuple(np.asarray(grid.voxels.shape))}, "
          f"march bound {steps}", flush=True)

    for label, K in (("default K=256", 256), ("K=128", 128), ("K=64", 64),
                     ("K=512", 512)):
        config = StaticConfig(
            width=64, height=64, max_events_per_photon=K,
            light_capacity=max(1000, 16 * K))
        la = photon.generate_lights(grid, params, jnp.int32(1), config,
                                    max_steps=steps)
        count = int(la.count)
        trunc = bool(la.truncated)
        # per-photon event counts from the deterministic photon-major
        # slot layout: photon p owns slots [p*K, (p+1)*K).
        valid = np.asarray(la.valid)
        per = valid[: 16 * K].reshape(16, K).sum(axis=1)
        print(f"  {label:16s} lights={count:4d} truncated={trunc} "
              f"per-photon min/mean/max = {per.min()}/{per.mean():.1f}/"
              f"{per.max()}", flush=True)

    # frames 2..4: the plateau across frames at defaults
    config = StaticConfig(width=64, height=64)
    for fc in (2, 3, 4):
        la = photon.generate_lights(grid, params, jnp.int32(fc), config,
                                    max_steps=steps)
        print(f"  frame {fc}: lights={int(la.count)} "
              f"truncated={bool(la.truncated)}", flush=True)


if __name__ == "__main__":
    main()
