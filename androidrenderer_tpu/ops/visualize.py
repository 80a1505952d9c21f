"""Debug visualizers — RenderVisualization + GI debug overlays as image dumps.

The reference draws GI debug geometry in-scene (GV raymarch, VPL billboards, probe
spheres — light_propagation_volume.cpp:1130-1212, irradiance_cache.cpp:308-349) and
exposes a visualizer picker in the ImGui debug menu (debug_menu.cpp:325-335). The
headless equivalent renders any intermediate as a false-color image
(`--visualize` in the CLI).
"""

from __future__ import annotations

import jax.numpy as jnp

from androidrenderer_tpu.ops.post import to_uint8
from androidrenderer_tpu.render.frame import FrameOutputs

MODES = ("none", "depth", "normals", "ids", "albedo", "roughness", "metalness",
         "emission", "position", "overdraw")


def visualize(outputs: FrameOutputs, mode: str) -> jnp.ndarray:
    """(H, W, 3) u8 false-color view of an intermediate buffer."""
    g = outputs.gbuffer
    if mode == "depth":
        # Reversed-Z: log-scale for readability.
        d = outputs.depth
        img = jnp.where(d > 0, jnp.log2(1.0 + d * 4095.0) / 12.0, 0.0)
        return to_uint8(jnp.stack([img] * 3, axis=-1))
    if mode == "normals":
        return to_uint8(g.normal * 0.5 + 0.5)
    if mode == "ids":
        # Hash triangle ids to colors.
        v = outputs.visibility
        h = (v.astype(jnp.uint32) * jnp.uint32(2654435761)) & jnp.uint32(0xFFFFFF)
        r = ((h >> 16) & 255).astype(jnp.float32) / 255.0
        gg = ((h >> 8) & 255).astype(jnp.float32) / 255.0
        b = (h & 255).astype(jnp.float32) / 255.0
        img = jnp.stack([r, gg, b], axis=-1)
        return to_uint8(jnp.where((v >= 0)[..., None], img, 0.0))
    if mode == "albedo":
        return to_uint8(g.base_color)
    if mode == "roughness":
        return to_uint8(jnp.repeat(g.roughness, 3, axis=-1))
    if mode == "metalness":
        return to_uint8(jnp.repeat(g.metalness, 3, axis=-1))
    if mode == "emission":
        return to_uint8(g.emission / (1.0 + g.emission))
    if mode == "position":
        p = g.world_position
        return to_uint8(jnp.abs(p - jnp.floor(p)))
    raise ValueError(f"unknown visualizer '{mode}' (choose from {MODES})")
