"""TAA + motion vectors — the vendor-upscaler replacement.

The reference delegates AA/upscaling to FSR3/DLSS/XeSS vendor blobs behind an
IUpscaler interface with Halton jitter (upscaling/upscaler.hpp:13-32) and renders
motion vectors by reprojection (motion_vectors_phase.cpp:14-103). Those blobs cannot
run on TPU; this module is the IUpscaler-shaped native implementation: reprojection
motion vectors from the visibility buffer's world positions, bilinear history fetch,
3x3 neighborhood clamp (variance-free min/max), and exponential blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def motion_vectors(
    world_position: jnp.ndarray,  # (H, W, 3)
    valid: jnp.ndarray,  # (H, W) bool
    last_view_proj: jnp.ndarray,  # (4, 4) previous frame, unjittered
    unjittered_view_proj: jnp.ndarray,  # (4, 4) current frame, unjittered
) -> jnp.ndarray:
    """(H, W, 2) uv-space motion: uv_prev = uv_curr - mv (motion_vectors.frag)."""
    h, w, _ = world_position.shape

    def project_uv(m):
        clip = world_position @ m[:3, :3].T + m[:3, 3]
        wc = world_position @ m[3, :3].T + m[3, 3]
        ndc = clip[..., :2] / jnp.where(wc[..., None] == 0.0, 1.0, wc[..., None])
        return jnp.stack(
            [ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5], axis=-1
        )

    uv_now = project_uv(unjittered_view_proj)
    uv_prev = project_uv(last_view_proj)
    mv = uv_now - uv_prev
    return jnp.where(valid[..., None], mv, 0.0)


def _bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) at (H, W, 2) uv (clamped)."""
    h, w, _ = img.shape
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    c00 = img[y0i, x0i]
    c01 = img[y0i, x1i]
    c10 = img[y1i, x0i]
    c11 = img[y1i, x1i]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def _neighborhood_minmax(img: jnp.ndarray):
    """3x3 min/max per pixel via shifted pads (clamp box for history rectification)."""
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h, w, _ = img.shape
    mn = img
    mx = img
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            s = p[dy : dy + h, dx : dx + w]
            mn = jnp.minimum(mn, s)
            mx = jnp.maximum(mx, s)
    return mn, mx


def taa_resolve(
    current: jnp.ndarray,  # (H, W, 3) this frame's lit scene (jittered render)
    history: jnp.ndarray,  # (H, W, 3) accumulated history
    history_valid: jnp.ndarray,  # () bool
    mv: jnp.ndarray,  # (H, W, 2) uv motion
    blend: float = 0.1,
):
    """(resolved, new_history) — exponential accumulation with neighborhood clamp."""
    h, w, _ = current.shape
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(
        [jnp.broadcast_to(px[None, :], (h, w)), jnp.broadcast_to(py[:, None], (h, w))],
        axis=-1,
    )
    prev_uv = uv - mv
    hist = _bilinear_sample(history, prev_uv)
    mn, mx = _neighborhood_minmax(current)
    hist = jnp.clip(hist, mn, mx)
    # Off-screen reprojection falls back to current.
    on_screen = (
        (prev_uv[..., 0] >= 0.0)
        & (prev_uv[..., 0] <= 1.0)
        & (prev_uv[..., 1] >= 0.0)
        & (prev_uv[..., 1] <= 1.0)
    )[..., None]
    alpha = jnp.where(history_valid, jnp.float32(blend), jnp.float32(1.0))
    alpha = jnp.where(on_screen, alpha, 1.0)
    resolved = hist + (current - hist) * alpha
    return resolved, resolved


def upscale_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Render-res -> output-res (scene_upsample.frag bilinear contract)."""
    if img.shape[0] == out_h and img.shape[1] == out_w:
        return img
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="linear")
