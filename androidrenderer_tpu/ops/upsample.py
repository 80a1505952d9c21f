"""Depth/normal-aware 2x upsampling for half-rate shading.

The reference spends full-rate shading only where VRS says it matters
(sampling_rate_calculator.cpp:26-124) and leans on upscalers for the rest; the
TPU analog shades low-frequency screen signals (LPV GI apply, SSAO — VERDICT
round-2 #8) at half resolution and reconstructs them with a joint bilateral
filter, exactly the shape of FFX CACAO's edge-aware upsample
(ambient_occlusion_phase.cpp:191-355).

Everything is rolls/repeats/selects — no gathers — so the reconstruction is
effectively free next to the halved shading cost (a screen-sized random gather
is ~27-45 ms on this TPU; the half-rate apply halves that class of cost).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift_rows(a: jnp.ndarray, d: int, lo: int, n: int) -> jnp.ndarray:
    """Rows [lo+d, lo+d+n) of a (possibly halo-extended) array, edge-clamped."""
    start = lo + d
    if start + n <= a.shape[0]:
        return a[start : start + n]
    pad = start + n - a.shape[0]
    return jnp.concatenate(
        [a[start:], jnp.repeat(a[-1:], pad, axis=0)], axis=0
    )


def _shift_cols(a: jnp.ndarray, d: int) -> jnp.ndarray:
    if d == 0:
        return a
    return jnp.concatenate([a[:, d:], jnp.repeat(a[:, -1:], d, axis=1)], axis=1)


def bilateral_upsample_2x(
    signal_half: jnp.ndarray,  # (Hh [+2*halo], Wh, C) half-res signal
    depth_half: jnp.ndarray,  # (Hh [+2*halo], Wh) half-res reversed-Z ndc depth
    normal_half: jnp.ndarray,  # (Hh [+2*halo], Wh, 3)
    depth_full: jnp.ndarray,  # (H, W)
    normal_full: jnp.ndarray,  # (H, W, 3)
    row_halo: int = 0,  # extra half-res rows on each side (sharded bands)
) -> jnp.ndarray:
    """(H, W, C) joint-bilateral reconstruction of a half-rate signal.

    Half-res sample (j, i) corresponds to full-res pixel (2j, 2i) (the [::2]
    subsample). Each full pixel blends its 4 surrounding half samples with
    bilinear x depth-similarity x normal-similarity weights; when every
    similarity weight dies (isolated silhouette pixels) the plain bilinear
    fallback keeps the result finite.
    """
    h, w = depth_full.shape
    hh, wh = h // 2, w // 2

    sig = signal_half
    if sig.ndim == 2:
        sig = sig[..., None]

    dy = (jnp.arange(h, dtype=jnp.float32) % 2.0)[:, None] * 0.5  # {0, .5}
    dx = (jnp.arange(w, dtype=jnp.float32) % 2.0)[None, :] * 0.5
    wy = (1.0 - dy, dy)
    wx = (1.0 - dx, dx)

    num = 0.0
    den = 0.0
    num_b = 0.0
    den_b = 0.0
    for dj in (0, 1):
        for di in (0, 1):
            s = _shift_cols(_shift_rows(sig, dj, row_halo, hh), di)
            d = _shift_cols(_shift_rows(depth_half, dj, row_halo, hh), di)
            n = _shift_cols(_shift_rows(normal_half, dj, row_halo, hh), di)
            # Expand the half grid to full res (each half texel covers 2x2).
            s = jnp.repeat(jnp.repeat(s, 2, axis=0), 2, axis=1)
            d = jnp.repeat(jnp.repeat(d, 2, axis=0), 2, axis=1)
            n = jnp.repeat(jnp.repeat(n, 2, axis=0), 2, axis=1)
            wb = wy[dj] * wx[di]
            rel = jnp.abs(d - depth_full) / (jnp.abs(depth_full) + 1e-6)
            wd = 1.0 / (1.0 + 32.0 * rel)
            wn = jnp.maximum(jnp.sum(n * normal_full, axis=-1), 0.0) ** 8
            wgt = wb * wd * wn
            num = num + s * wgt[..., None]
            den = den + wgt
            num_b = num_b + s * wb[..., None]
            den_b = den_b + wb
    bilat = num / jnp.maximum(den[..., None], 1e-8)
    bilin = num_b / jnp.maximum(den_b[..., None], 1e-8)
    out = jnp.where((den > 1e-4)[..., None], bilat, bilin)
    return out if signal_half.ndim > 2 else out  # (H, W, C)
