"""Noise — per-pixel random numbers for stochastic effects (RT shadows/AO/GI).

The reference ships 64-layer spatio-temporal blue-noise textures frame-indexed by
``pixel %% 128`` (noise_texture.hpp:12-22, scene_renderer.cpp:81-83). Here:
a PCG-hash white-noise generator (stateless, frame-indexed) plus an optional
void-and-cluster blue-noise layer baked at import; TAA integrates either over time.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _pcg(v: jnp.ndarray) -> jnp.ndarray:
    """PCG hash on uint32."""
    state = v * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> (state >> jnp.uint32(28)) + jnp.uint32(4)) ^ state) * jnp.uint32(
        277803737
    )
    return (word >> jnp.uint32(22)) ^ word


def pixel_uniforms(height: int, width: int, frame_index, num: int) -> jnp.ndarray:
    """(H, W, num) uniforms in [0, 1), decorrelated per pixel and frame."""
    py = jnp.arange(height, dtype=jnp.uint32)[:, None]
    px = jnp.arange(width, dtype=jnp.uint32)[None, :]
    base = py * jnp.uint32(9781) + px * jnp.uint32(6271) + jnp.uint32(frame_index) * jnp.uint32(
        26699
    )
    outs = []
    h = base
    for _ in range(num):
        h = _pcg(h)
        outs.append(h.astype(jnp.float32) * (1.0 / 4294967296.0))
    return jnp.stack(outs, axis=-1)


def cosine_hemisphere(normal: jnp.ndarray, u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted direction about (..., 3) normals from two uniforms."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    # Build a tangent frame around the normal.
    sign = jnp.where(normal[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + normal[..., 2:3])
    b = normal[..., 0:1] * normal[..., 1:2] * a
    t = jnp.concatenate(
        [1.0 + sign * normal[..., 0:1] ** 2 * a, sign * b, -sign * normal[..., 0:1]],
        axis=-1,
    )
    bt = jnp.concatenate(
        [b, sign + normal[..., 1:2] ** 2 * a, -normal[..., 1:2]], axis=-1
    )
    return t * x[..., None] + bt * y[..., None] + normal * z[..., None]


def disc_jitter(direction: jnp.ndarray, tan_radius, u1, u2) -> jnp.ndarray:
    """Jitter a (..., 3) direction within a cone of tan(angular radius) — soft sun."""
    sign = jnp.where(direction[..., 2:3] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + direction[..., 2:3])
    b = direction[..., 0:1] * direction[..., 1:2] * a
    t = jnp.concatenate(
        [1.0 + sign * direction[..., 0:1] ** 2 * a, sign * b, -sign * direction[..., 0:1]],
        axis=-1,
    )
    bt = jnp.concatenate(
        [b, sign + direction[..., 1:2] ** 2 * a, -direction[..., 1:2]], axis=-1
    )
    r = jnp.sqrt(u1) * tan_radius
    phi = 2.0 * jnp.pi * u2
    d = direction + t * (r * jnp.cos(phi))[..., None] + bt * (r * jnp.sin(phi))[..., None]
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


# ---------------------------------------------------------------------------
# Blue noise (NoiseTexture parity): the reference ships 64-layer spatio-temporal
# blue-noise assets (noise_texture.hpp:12-22). We GENERATE ours with the classic
# void-and-cluster algorithm (Ulichney 1993) — wrap-around gaussian energy, rank
# matrix -> uniform blue-noise threshold texture. Cached per (size, seed).

_BLUE_CACHE = {}


def blue_noise(size: int = 64, sigma: float = 1.9, seed: int = 0) -> np.ndarray:
    """(size, size) f32 in [0, 1) with a blue (high-frequency) spectrum."""
    key = (size, sigma, seed)
    if key in _BLUE_CACHE:
        return _BLUE_CACHE[key]
    rng = np.random.default_rng(seed)
    n = size * size

    # Toroidal gaussian energy kernel, applied via FFT.
    x = np.minimum(np.arange(size), size - np.arange(size)).astype(np.float64)
    d2 = x[None, :] ** 2 + x[:, None] ** 2
    kernel = np.exp(-d2 / (2.0 * sigma * sigma))
    kf = np.fft.rfft2(kernel)

    def energy(mask):
        return np.fft.irfft2(np.fft.rfft2(mask) * kf, s=(size, size))

    # Initial pattern: ~10% ones, relaxed so no tight clusters remain.
    ones = n // 10
    mask = np.zeros((size, size), np.float64)
    idx = rng.choice(n, ones, replace=False)
    mask.flat[idx] = 1.0
    for _ in range(4 * ones):
        e = energy(mask)
        cluster = np.argmax(np.where(mask > 0.5, e, -np.inf))
        mask.flat[cluster] = 0.0
        e = energy(mask)
        void = np.argmin(np.where(mask < 0.5, e, np.inf))
        if void == cluster:
            mask.flat[cluster] = 1.0
            break
        mask.flat[void] = 1.0

    rank = np.zeros((size, size), np.int64)
    # Phase 1: remove tightest clusters down to empty, ranking them.
    work = mask.copy()
    for r in range(ones - 1, -1, -1):
        e = energy(work)
        c = np.argmax(np.where(work > 0.5, e, -np.inf))
        work.flat[c] = 0.0
        rank.flat[c] = r
    # Phase 2: fill largest voids up from the initial pattern.
    work = mask.copy()
    for r in range(ones, n):
        e = energy(work)
        v = np.argmin(np.where(work < 0.5, e, np.inf))
        work.flat[v] = 1.0
        rank.flat[v] = r

    out = ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)
    _BLUE_CACHE[key] = out
    return out
