"""Noise — per-pixel random numbers for stochastic effects (RT shadows/AO/GI).

The reference ships 64-layer spatio-temporal blue-noise textures frame-indexed by
``pixel %% 128`` (noise_texture.hpp:12-22, scene_renderer.cpp:81-83). Here:
a PCG-hash white-noise generator (stateless, frame-indexed) plus an optional
void-and-cluster blue-noise layer baked at import; TAA integrates either over time.
"""

from __future__ import annotations

import jax
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
# blue-noise assets frame-indexed by ``pixel % 128`` (noise_texture.hpp:12-22,
# scene_renderer.cpp:81-83). We GENERATE ours with the classic void-and-cluster
# algorithm (Ulichney 1993) — toroidal gaussian energy maintained INCREMENTALLY
# (truncated-kernel block updates instead of a full FFT per step), which makes a
# full 64-layer 128^2 STBN stack generatable in ~1 min (tools/make_stbn.py bakes
# it into an asset; runtime loads the asset and falls back to generation).

_BLUE_CACHE = {}


def _vac_energy_kernel(size: int, sigma: float):
    """Truncated toroidal gaussian kernel + its offset grids."""
    rad = min(size // 2, int(np.ceil(4.0 * sigma)))
    off = np.arange(-rad, rad + 1)
    d2 = off[None, :] ** 2 + off[:, None] ** 2
    kernel = np.exp(-d2 / (2.0 * sigma * sigma))
    return rad, off, kernel


def blue_noise(size: int = 64, sigma: float = 1.9, seed: int = 0) -> np.ndarray:
    """(size, size) f32 in [0, 1) with a blue (high-frequency) spectrum."""
    key = (size, sigma, seed)
    if key in _BLUE_CACHE:
        return _BLUE_CACHE[key]
    rng = np.random.default_rng(seed)
    n = size * size
    rad, off, kernel = _vac_energy_kernel(size, sigma)

    energy = np.zeros((size, size), np.float64)

    def toggle(flat_idx: int, sign: float, mask):
        y, x = divmod(int(flat_idx), size)
        ys = (y + off) % size
        xs = (x + off) % size
        energy[np.ix_(ys, xs)] += sign * kernel
        mask.flat[flat_idx] = sign > 0

    # Initial pattern: ~10% ones, relaxed so no tight clusters remain.
    ones = n // 10
    mask = np.zeros((size, size), bool)
    for i in rng.choice(n, ones, replace=False):
        toggle(i, +1.0, mask)
    neg_inf = -np.inf
    for _ in range(4 * ones):
        cluster = int(np.argmax(np.where(mask, energy, neg_inf)))
        toggle(cluster, -1.0, mask)
        void = int(np.argmin(np.where(~mask, energy, np.inf)))
        if void == cluster:
            toggle(cluster, +1.0, mask)
            break
        toggle(void, +1.0, mask)

    rank = np.zeros((size, size), np.int64)
    initial = mask.copy()
    initial_energy = energy.copy()
    # Phase 1: remove tightest clusters down to empty, ranking them.
    for r in range(ones - 1, -1, -1):
        c = int(np.argmax(np.where(mask, energy, neg_inf)))
        toggle(c, -1.0, mask)
        rank.flat[c] = r
    # Phase 2: fill largest voids up from the initial pattern.
    mask = initial
    energy[...] = initial_energy
    for r in range(ones, n):
        v = int(np.argmin(np.where(~mask, energy, np.inf)))
        toggle(v, +1.0, mask)
        rank.flat[v] = r

    out = ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)
    _BLUE_CACHE[key] = out
    return out


# --- STBN stack: (channels, layers, S, S) independent blue-noise slices ---------

STBN_SIZE = 128
STBN_LAYERS = 64
_STBN_ASSET = "stbn_128_64.npz"
_STBN_CACHE = {}


def _stbn_asset_path() -> str:
    import os

    return os.path.join(os.path.dirname(__file__), "..", "assets", _STBN_ASSET)


def stbn_stack(
    channels: int = 2, layers: int = STBN_LAYERS, size: int = STBN_SIZE
) -> np.ndarray:
    """(channels, layers, size, size) f32 spatio-temporal blue noise.

    Loads the baked asset (tools/make_stbn.py) when present; otherwise generates
    (each slice is an independently-seeded void-and-cluster texture — blue in
    space; temporal decorrelation comes from independent layers, which is what
    the reference's frame-indexed layer array provides)."""
    import os

    key = (channels, layers, size)
    if key in _STBN_CACHE:
        return _STBN_CACHE[key]
    path = _stbn_asset_path()
    if os.path.exists(path):
        with np.load(path) as z:
            stack = z["stbn"].astype(np.float32) / np.float32(65535.0)
        if stack.shape[0] >= channels and stack.shape[1] >= layers and stack.shape[2] == size:
            out = stack[:channels, :layers]
            _STBN_CACHE[key] = out
            return out
    out = np.stack(
        [
            np.stack(
                [blue_noise(size, seed=c * 1000 + l) for l in range(layers)]
            )
            for c in range(channels)
        ]
    ).astype(np.float32)
    _STBN_CACHE[key] = out
    return out


def stbn_uniforms(
    height: int, width: int, frame_index, num: int, row_offset=0
) -> jnp.ndarray:
    """(H, W, num) blue-noise uniforms — the STBN replacement for pixel_uniforms.

    Layer selection is ``frame % 64`` (scene_renderer.cpp:81-83; shaders index
    ``pixel % 128``); screen tiling is dense rolls + tiles, no gathers. The layer
    pick is a dynamic_slice over a (L, S, S) device constant. ``row_offset``
    keeps band-sharded rendering bit-identical to the full frame.
    """
    stack = jnp.asarray(stbn_stack(channels=max(2, num)))  # (C, L, S, S)
    s = STBN_SIZE
    li = jnp.uint32(frame_index) % STBN_LAYERS
    outs = []
    for k in range(num):
        # Distinct layer per channel (k-offset), same spatial slice.
        lk = (li + jnp.uint32(k * 17)) % STBN_LAYERS
        layer = jax.lax.dynamic_index_in_dim(stack[k % stack.shape[0]], lk, 0, False)
        # Tile to cover (height + row_offset... ) rows starting at row_offset.
        layer = jnp.roll(layer, -(row_offset % s), axis=0)
        reps_y = -(-height // s)
        reps_x = -(-width // s)
        tiled = jnp.tile(layer, (reps_y, reps_x))[:height, :width]
        outs.append(tiled)
    return jnp.stack(outs, axis=-1)
