"""Octahedral direction <-> texel mapping (shaders/gi/cache/octahedral.slangi)."""

from __future__ import annotations

import jax.numpy as jnp


def dir_to_oct_uv(d: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) unit dirs -> (..., 2) uv in [0, 1] (octahedral projection)."""
    n = d / jnp.sum(jnp.abs(d), axis=-1, keepdims=True)
    xy = n[..., :2]
    flip = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.where(xy >= 0.0, 1.0, -1.0)
    xy = jnp.where(n[..., 2:3] < 0.0, flip, xy)
    return xy * 0.5 + 0.5


def oct_uv_to_dir(uv: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) uv in [0, 1] -> (..., 3) unit dirs."""
    xy = uv * 2.0 - 1.0
    z = 1.0 - jnp.abs(xy[..., 0]) - jnp.abs(xy[..., 1])
    flip = (1.0 - jnp.abs(xy[..., ::-1])) * jnp.where(xy >= 0.0, 1.0, -1.0)
    xy = jnp.where(z[..., None] < 0.0, flip, xy)
    d = jnp.concatenate([xy, z[..., None]], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def oct_texel_directions(res: int) -> jnp.ndarray:
    """(res, res, 3) unit direction of every octahedral texel center."""
    u = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res
    uv = jnp.stack(jnp.meshgrid(u, u, indexing="xy"), axis=-1)
    return oct_uv_to_dir(uv)
