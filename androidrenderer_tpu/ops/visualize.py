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
GI_MODES = ("lpv-gv", "lpv-radiance", "vpl", "probes")


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


# --- GI debug visualizers (light_propagation_volume.cpp:1130-1212,
# --- irradiance_cache.cpp:308-349) — rendered as standalone debug dumps.


def _camera_rays(view, h: int, w: int):
    """(H, W, 3) world-space ray directions + (3,) origin."""
    inv_view = jnp.asarray(view.inverse_view)
    p00 = view.projection[0, 0]
    p11 = view.projection[1, 1]
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    py = 1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0
    dirs_v = jnp.stack(
        [
            jnp.broadcast_to(px[None, :] / p00, (h, w)),
            jnp.broadcast_to(py[:, None] / p11, (h, w)),
            -jnp.ones((h, w)),
        ],
        axis=-1,
    )
    d = dirs_v @ inv_view[:3, :3].T
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d, inv_view[:3, 3]


def _march_lpv(volumes, view, h: int, w: int, channel: str):
    """Fixed-step raymarch through the LPV cascades: 'gv' shows the geometry
    volume's occlusion amplitude, 'radiance' the propagated SH DC energy."""
    d, o = _camera_rays(view, h, w)
    c = volumes.radiance.shape[0]
    r = volumes.radiance.shape[-1]
    steps = 96
    extent = volumes.cell_sizes[-1] * r
    dt = extent / steps
    acc = jnp.zeros((h, w, 3))
    trans = jnp.ones((h, w, 1))
    for s in range(steps):
        p = o[None, None, :] + d * (dt * (s + 0.5))
        # finest cascade containing p
        cellf = (p[None] - volumes.mins[:, None, None, :]) / volumes.cell_sizes[
            :, None, None, None
        ]
        inside = jnp.all((cellf >= 0.0) & (cellf <= r - 1.0), axis=-1)  # (C,H,W)
        ci = jnp.argmax(inside, axis=0)
        any_in = jnp.any(inside, axis=0)
        sel = cellf[0]
        for k in range(1, c):
            sel = jnp.where((ci == k)[..., None], cellf[k], sel)
        cell = jnp.clip(sel.astype(jnp.int32), 0, r - 1)
        flat = ((ci * r + cell[..., 2]) * r + cell[..., 1]) * r + cell[..., 0]
        if channel == "gv":
            gv_dc = volumes.gv[..., 0, :, :, :].reshape(-1)  # (C*R^3,)
            a = jnp.clip(gv_dc[flat], 0.0, 1.0) * jnp.where(any_in, 1.0, 0.0)
            col = jnp.stack([a, a, a], axis=-1)
        else:
            rad_dc = volumes.radiance[:, :, 0].transpose(0, 2, 3, 4, 1).reshape(-1, 3)
            col = jnp.maximum(rad_dc[flat], 0.0) * jnp.where(any_in, 1.0, 0.0)[..., None]
            a = jnp.clip(jnp.max(col, axis=-1), 0.0, 1.0)
        a = (a * 0.25)[..., None]
        acc = acc + trans * col * a
        trans = trans * (1.0 - a)
    return to_uint8(acc / (1.0 + acc))


def _splat(img: jnp.ndarray, view, positions: jnp.ndarray, colors: jnp.ndarray,
           mask: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """Scatter colored square billboards at projected world positions."""
    h, w, _ = img.shape
    m = jnp.asarray(view.view_proj)
    clip = positions @ m[:3, :3].T + m[:3, 3]
    wc = positions @ m[3, :3].T + m[3, 3]
    ok = mask & (wc > 1e-6)
    ndc = clip[:, :2] / jnp.maximum(wc[:, None], 1e-6)
    x = ((ndc[:, 0] * 0.5 + 0.5) * w).astype(jnp.int32)
    y = ((0.5 - ndc[:, 1] * 0.5) * h).astype(jnp.int32)
    flat = img.reshape(-1, 3)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            xi = x + dx
            yi = y + dy
            inb = ok & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.where(inb, yi * w + xi, h * w)
            flat = flat.at[idx].set(jnp.where(inb[:, None], colors, 0.0), mode="drop")
    return flat.reshape(h, w, 3)


def visualize_gi(scene, view, config, temporal, outputs, mode: str) -> jnp.ndarray:
    """GI debug dumps — rebuilds the requested GI structure outside the frame jit
    (debug path; perf-irrelevant) and renders it over/instead of the scene."""
    from androidrenderer_tpu.config import GIMode
    from androidrenderer_tpu.ops import lpv as lpv_ops
    from androidrenderer_tpu.ops.raster import rasterize_depth, rasterize_visibility
    from androidrenderer_tpu.ops.raster.binning import bin_triangles

    h, w = config.render_height, config.render_width

    def _raster(setup_, hh, ww):
        th, tw = min(32, hh), min(128, ww)
        bins_ = bin_triangles(setup_, hh // th, ww // tw, th, tw,
                              cap=config.max_tris_per_tile)
        d_ = rasterize_depth(setup_, bins_, hh, ww, th, tw)
        v_ = rasterize_visibility(setup_, bins_, d_, th, tw)
        return d_, v_

    if mode in ("lpv-gv", "lpv-radiance", "vpl"):
        inv_view = jnp.asarray(view.inverse_view)
        volumes = lpv_ops.build_lpv(
            scene, jnp.asarray(view.position), -inv_view[:3, 2], _raster,
            config.lpv_num_cascades, config.lpv_resolution, config.lpv_cell_size,
            config.lpv_rsm_resolution, config.lpv_num_propagation_steps,
            config.lpv_behind_camera_percent,
        )
        if mode in ("lpv-gv", "lpv-radiance"):
            return _march_lpv(volumes, view, h, w, mode.split("-")[1])
        # VPL billboards: extract cascade-0 VPLs and splat flux colors.
        mins, cells = volumes.mins, volumes.cell_sizes
        m = lpv_ops._ortho_from_sphere(
            mins[0] + 0.5 * cells[0] * config.lpv_resolution,
            0.866026 * cells[0] * config.lpv_resolution, scene.sun_direction,
        )
        albedo, nrm, wpos, val = lpv_ops.render_rsm(
            scene, m, config.lpv_rsm_resolution, _raster
        )
        p, n, flux, mask = lpv_ops.extract_vpls(albedo, nrm, wpos, val,
                                                scene.sun_color)
        base = jnp.asarray(outputs.image, jnp.float32) / 255.0 * 0.25
        fl = flux / jnp.maximum(jnp.max(flux, axis=-1, keepdims=True), 1e-6)
        return to_uint8(_splat(base, view, p, fl, mask, radius=1) )
    if mode == "probes":
        grid = config.probe_grid
        p = grid[0] * grid[1] * grid[2]
        imgs = jnp.asarray(outputs.image, jnp.float32) / 255.0 * 0.25
        from androidrenderer_tpu.ops.probes import cascade_spacings

        spacings_v = cascade_spacings(
            config.probe_spacing, temporal.probes.irradiance.shape[0],
            config.probe_spacing_ladder,
        )
        for ci in range(temporal.probes.irradiance.shape[0]):
            spacing = spacings_v[ci]
            pos = (temporal.probes.cell[ci].astype(jnp.float32) + 0.5) * spacing
            col = jnp.mean(temporal.probes.irradiance[ci], axis=1)  # (P, 3)
            col = col / jnp.maximum(jnp.max(col), 1e-6)
            fresh = temporal.probes.age[ci] < 1000
            imgs = _splat(imgs, view, pos, col, fresh, radius=2)
        return to_uint8(imgs)
    raise ValueError(f"unknown GI visualizer '{mode}' (choose from {GI_MODES})")
