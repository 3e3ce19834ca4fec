"""volumerenderer_tpu — a TPU-native (JAX/XLA/Pallas) volume renderer.

A from-scratch reimplementation of the capabilities of chrylt/VolumeRenderer
(a Vulkan/GLSL desktop volume renderer) designed for TPU hardware: sparse
volumes ingested into bricked dense HBM grids, divergent shader loops
re-shaped into vectorized scans and batched contractions, the Vulkan frame
graph replaced by XLA dataflow, and multi-chip scaling via jax.sharding.

Top-level API:

    from volumerenderer_tpu import (
        Renderer, Algorithm, RenderParams, StaticConfig,
        grid, render, engine,
    )

    g = grid.procedural.cloud()
    r = Renderer(g, StaticConfig(width=512, height=512))
    r.set_algorithm(Algorithm.POINT)
    r.step(16)
    r.image()           # (H, W, 3) float in [0, 1]
"""

from . import engine, grid, io, ops, render
from .engine.params import Algorithm, Fidelity, RenderParams, StaticConfig
from .engine.session import Renderer
from .engine.state import RenderState

__version__ = "0.1.0"

__all__ = [
    "Algorithm",
    "Fidelity",
    "RenderParams",
    "RenderState",
    "Renderer",
    "StaticConfig",
    "engine",
    "grid",
    "io",
    "ops",
    "render",
]
