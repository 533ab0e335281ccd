"""Soft-argmax (spatial expectation) over correlation heatmaps.

JAX port of kornia ``dsnt.spatial_expectation2d`` + the std computation used by
the reference fine matcher (``src/models/OnePosePlus/utils/fine_matching.py:78-94``).
Grids use kornia's normalized convention: x = linspace(-1, 1, W) along columns.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def _normalized_grid(window: int) -> np.ndarray:
    """[W*W, 2] grid of (x, y) in [-1, 1] (x varies fastest, kornia order)."""
    lin = np.linspace(-1.0, 1.0, window, dtype=np.float32) if window > 1 else np.zeros((1,), np.float32)
    xs, ys = np.meshgrid(lin, lin, indexing="xy")
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)


def spatial_expectation_2d(heatmap: jnp.ndarray, window: int) -> jnp.ndarray:
    """Expected (x, y) in [-1, 1] of heatmaps [..., W*W] -> [..., 2]."""
    grid = jnp.asarray(_normalized_grid(window), dtype=heatmap.dtype)  # [WW, 2]
    return heatmap @ grid


def heatmap_std(heatmap: jnp.ndarray, coords: jnp.ndarray, window: int) -> jnp.ndarray:
    """Total std (sum over x and y) of the heatmap distribution [..., W*W] -> [...].

    var = E[g^2] - E[g]^2 per axis; std = sum_axis sqrt(clamp(var, 1e-10)).
    """
    grid = jnp.asarray(_normalized_grid(window), dtype=heatmap.dtype)
    e2 = heatmap @ (grid * grid)  # [..., 2]
    var = e2 - coords * coords
    return jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10, None)), axis=-1)
