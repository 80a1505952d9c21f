"""Edge-aware reconstruction filter for stochastic GI — the RTGI screen-space
reconstruction analog (gi/rtgi.cpp:160-188, shaders/gi/rtgi/overlay.frag.slang).

A-trous wavelet filter (Dammertz 2010): N dilated 5-tap-cross passes with
depth/normal edge-stopping weights. Runs on the 1-spp RTGI irradiance before it is
multiplied by albedo; TAA integrates the residual noise temporally.
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
