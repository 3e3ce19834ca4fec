"""Checkpoint / resume of render sessions (SURVEY.md §5.4).

The reference has none: its accumulated image is GPU-resident and lost on
resize (recreateSwapChain zeroes frameCount, src/main.cpp:936-937).  Here the
render state is an explicit pytree, so persistence is trivial — save/restore
the accumulation buffer + frame counter + parameters and a progressive render
continues exactly where it stopped (bit-identical: the photon RNG is a pure
function of frame_count).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..engine.params import Algorithm, RenderParams
from ..engine.session import Renderer
from ..engine.state import RenderState


def save(renderer: Renderer, path: str) -> None:
    """Save session state to ``path`` (.npz)."""
    params = {
        f"param_{k}": np.asarray(v)
        for k, v in vars(renderer.params).items()
    }
    np.savez_compressed(
        path,
        accum=np.asarray(renderer.state.accum),
        frame_count=np.asarray(renderer.state.frame_count),
        algorithm=np.int32(int(renderer.algorithm)),
        **params,
    )


def load(renderer: Renderer, path: str) -> Renderer:
    """Restore state + params + algorithm into an existing session whose grid
    and config match the checkpoint's image size."""
    z = np.load(path)
    accum = z["accum"]
    if accum.shape != (renderer.config.height, renderer.config.width):
        raise ValueError(
            f"checkpoint image {accum.shape} != config "
            f"{(renderer.config.height, renderer.config.width)}"
        )
    renderer.state = RenderState(
        accum=jnp.asarray(accum),
        frame_count=jnp.asarray(z["frame_count"]),
    )
    renderer.algorithm = Algorithm(int(z["algorithm"]))
    fields = {}
    for k in z.files:
        if k.startswith("param_"):
            fields[k[len("param_"):]] = jnp.asarray(z[k])
    renderer.params = RenderParams(**fields)
    return renderer
