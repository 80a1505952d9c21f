"""VRSAA — contrast-adaptive supersampling anti-aliasing.

The reference's VRSAA renders at 2x resolution with a variable-rate-shading image
from contrast detection, so flat regions shade one fragment per 2x2 quad (native
rate) while detailed regions shade all four — SSAA only where it matters
(phase/sampling_rate_calculator.cpp:26-175, vrsaa/contrast_detection.comp).

TPUs have no HW shading-rate; the XLA-native equivalent inverts the rate image
into a STATIC-size worklist: geometry rasterizes at 2x the output resolution,
shading runs on the quad top-left samples (native rate), quads whose extra
samples differ in triangle id or depth (a current-frame geometric contrast test —
robust where the reference's previous-frame luminance test shimmers) enter a
padded fine worklist, shade their remaining 3 samples, and box-resolve. The
worklist budget is a config knob (vrsaa_budget); overflowing quads keep their
coarse sample (the reference degrades the same way when the rate image clamps).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def detect_fine_quads(
    vis: jnp.ndarray,  # (2H, 2W) i32 visibility at supersampled res
    depth: jnp.ndarray,  # (2H, 2W) f32
    depth_rel_eps: float = 2e-3,
) -> jnp.ndarray:
    """(H, W) bool — quads needing full-rate shading (contrast_detection analog)."""
    h2, w2 = vis.shape
    v = vis.reshape(h2 // 2, 2, w2 // 2, 2).transpose(0, 2, 1, 3)
    d = depth.reshape(h2 // 2, 2, w2 // 2, 2).transpose(0, 2, 1, 3)
    v00 = v[..., 0, 0]
    id_edge = (
        (v[..., 0, 1] != v00) | (v[..., 1, 0] != v00) | (v[..., 1, 1] != v00)
    )
    d00 = d[..., 0, 0]
    dmax = d.max(axis=(-2, -1))
    dmin = d.min(axis=(-2, -1))
    z_edge = (dmax - dmin) > depth_rel_eps * jnp.maximum(jnp.abs(d00), 1e-6)
    return id_edge | z_edge


def luminance_contrast(
    lit: jnp.ndarray,  # (H, W, 3) coarse-shaded quads (linear HDR)
    threshold: float = 0.15,
) -> jnp.ndarray:
    """(H, W) bool — quads whose shade contrasts with a neighbor (the reference's
    contrast_detection.comp criterion, evaluated on the current coarse shade
    instead of the previous frame). Catches shading edges (shadow boundaries)
    that the geometric test cannot see."""
    lum = (
        lit[..., 0] * 0.2126 + lit[..., 1] * 0.7152 + lit[..., 2] * 0.0722
    )
    mx = lum
    mn = lum
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        n = jnp.roll(lum, (dy, dx), axis=(0, 1))
        mx = jnp.maximum(mx, n)
        mn = jnp.minimum(mn, n)
    return (mx - mn) > threshold * (mx + 0.05)


def fine_worklist(
    fine: jnp.ndarray,  # (H, W) bool
    budget: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact fine quads to a static-size worklist.

    Returns (qy (B,), qx (B,), live (B,), dropped ()) — quad coords; overflow
    drops quads in scan order (they keep their coarse shade) and ``dropped``
    exposes the true over-budget count (CLAUDE.md rule: never silently cap;
    FrameOutputs.vrsaa_dropped surfaces it to callers/tests)."""
    h, w = fine.shape
    flat = fine.reshape(-1)
    total = jnp.sum(flat.astype(jnp.int32))
    (idx,) = jnp.nonzero(flat, size=budget, fill_value=h * w)
    live = idx < h * w
    idx = jnp.minimum(idx, h * w - 1)
    dropped = jnp.maximum(total - jnp.int32(budget), 0)
    return idx // w, idx % w, live, dropped


def resolve_quads(
    lit_coarse: jnp.ndarray,  # (H, W, 3) quad top-left shade
    fine_rgb: jnp.ndarray,  # (B, 3, 3) the 3 extra samples' shade
    qy: jnp.ndarray,
    qx: jnp.ndarray,
    live: jnp.ndarray,
) -> jnp.ndarray:
    """Box-resolve: selected quads average all 4 samples; others keep coarse."""
    h, w, _ = lit_coarse.shape
    base = lit_coarse[jnp.minimum(qy, h - 1), jnp.minimum(qx, w - 1)]
    avg = (base + fine_rgb.sum(axis=1)) * 0.25
    flat = lit_coarse.reshape(-1, 3)
    idx = jnp.where(live, qy * w + qx, h * w)
    flat = flat.at[idx].set(jnp.where(live[:, None], avg, 0.0), mode="drop")
    return flat.reshape(h, w, 3)
