"""Stochastic-GI reconstruction — the RTGI denoiser slot.

The reference reconstructs its 1-spp RTGI with a screen-space filter
(gi/rtgi.cpp:160-188, shaders/gi/rtgi/overlay.frag.slang) and hands the rest to a
vendor denoiser (DLSS-RR) when present. The TPU-native equivalents:

- ``atrous_filter``: a-trous wavelet (Dammertz 2010), N dilated 5-tap-cross
  passes with depth/normal edge-stopping weights — the overlay.frag analog.
- ``temporal_accumulate``: TAA-style reprojected exponential accumulation of the
  pre-albedo irradiance with neighborhood clamping — the vendor-denoiser
  replacement (same design stance as ops/taa.py replacing DLSS/FSR3).
"""

from __future__ import annotations

import jax.numpy as jnp

# 5-tap B3-spline cross weights.
_W = (0.375, 0.25, 0.0625)  # center, +-1, +-2


def _shift(x, dy, dx):
    return jnp.roll(x, (dy, dx), axis=(0, 1))


def atrous_filter(
    signal: jnp.ndarray,  # (H, W, 3) noisy GI
    depth: jnp.ndarray,  # (H, W) reversed-Z
    normal: jnp.ndarray,  # (H, W, 3)
    valid: jnp.ndarray,  # (H, W)
    iterations: int = 3,
    sigma_z: float = 0.02,
    sigma_n: float = 16.0,
) -> jnp.ndarray:
    """Edge-preserving smoothing of per-pixel stochastic GI."""
    out = signal
    vz = jnp.where(valid, depth, -1.0)
    for it in range(iterations):
        step = 1 << it
        acc = out * _W[0]
        wsum = jnp.full(depth.shape + (1,), _W[0], jnp.float32)
        for tap, wt in ((1, _W[1]), (2, _W[2])):
            d = tap * step
            for dy, dx in ((0, d), (0, -d), (d, 0), (-d, 0)):
                s = _shift(out, dy, dx)
                zq = _shift(vz, dy, dx)
                nq = _shift(normal, dy, dx)
                w_z = jnp.exp(-jnp.abs(zq - vz) / sigma_z)
                w_n = jnp.maximum(jnp.sum(nq * normal, axis=-1), 0.0) ** sigma_n
                w = (wt * w_z * w_n * (zq >= 0.0))[..., None]
                acc = acc + s * w
                wsum = wsum + w
        out = acc / jnp.maximum(wsum, 1e-6)
    return jnp.where(valid[..., None], out, signal)


def temporal_accumulate(
    signal: jnp.ndarray,  # (H, W, 3) this frame's filtered irradiance (one band)
    history: jnp.ndarray,  # (H_full, W, 3) accumulated irradiance (FULL frame)
    history_valid: jnp.ndarray,  # () bool
    mv: jnp.ndarray,  # (H, W, 2) uv motion (ops/taa.py::motion_vectors)
    blend: float = 0.15,
    row_offset=0,
    signal_halo: jnp.ndarray | None = None,  # (H+2, W, 3) for band rendering
):
    """(accumulated, new_history) — reprojected exponential accumulation with a
    3x3 neighborhood clamp (rejects ghosting on disocclusion), mirroring
    taa_resolve's band-mode contract (full-frame history, optional row halo)."""
    from androidrenderer_tpu.ops.taa import (
        _bilinear_sample_packed,
        _neighborhood_minmax,
    )

    h, w, _ = signal.shape
    h_full = history.shape[0]
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5 + row_offset) / h_full
    uv = jnp.stack(
        [jnp.broadcast_to(px[None, :], (h, w)), jnp.broadcast_to(py[:, None], (h, w))],
        axis=-1,
    )
    prev_uv = uv - mv
    # R11G11B10-packed fetch (16-byte gather rows; see taa._bilinear_sample_packed).
    hist = _bilinear_sample_packed(history, prev_uv)
    if signal_halo is not None:
        mn, mx = _neighborhood_minmax(signal_halo)
        mn, mx = mn[1:-1], mx[1:-1]
    else:
        mn, mx = _neighborhood_minmax(signal)
    # Wider clamp box than TAA: irradiance is low-frequency and 1-spp noisy, so a
    # tight clamp would reject the very history that removes the noise.
    pad = 0.5 * (mx - mn) + 1e-4
    hist = jnp.clip(hist, mn - pad, mx + pad)
    on_screen = (
        (prev_uv[..., 0] >= 0.0) & (prev_uv[..., 0] <= 1.0)
        & (prev_uv[..., 1] >= 0.0) & (prev_uv[..., 1] <= 1.0)
    )[..., None]
    alpha = jnp.where(history_valid, jnp.float32(blend), jnp.float32(1.0))
    alpha = jnp.where(on_screen, alpha, 1.0)
    out = hist + (signal - hist) * alpha
    return out, out
