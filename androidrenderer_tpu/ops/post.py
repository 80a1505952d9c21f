"""Post-processing: tonemap composite + sRGB helpers.

Numeric parity with shaders/ui/scene_upsample.frag:55-73 — the final UI-phase composite:
bloom add (x bloom_strength), luminance-weighted simple Reinhard ``c * (L / (L + 1))``,
then gamma 1/2.2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy: a module-level jnp constant commits the backend at import time.
LUMA_WEIGHTS = np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)


def luminance(color: jnp.ndarray) -> jnp.ndarray:
    """Rec.709 luma (scene_upsample.frag:55)."""
    return jnp.sum(color * LUMA_WEIGHTS, axis=-1, keepdims=True)


def reinhard_tonemap(color: jnp.ndarray) -> jnp.ndarray:
    """scene_upsample.frag:63-70: factor = L/(L+1); then gamma 1/2.2."""
    luma = luminance(color)
    factor = luma / (luma + 1.0)
    mapped = color * factor
    return jnp.clip(mapped, 0.0, 1.0) ** (1.0 / 2.2)


def composite(
    scene_color: jnp.ndarray,  # (H, W, 3) linear HDR
    bloom: jnp.ndarray | None = None,  # (H, W, 3) summed bloom chain
    bloom_strength: jnp.ndarray | float = 0.014159,
) -> jnp.ndarray:
    """Full UI-phase composite -> display-ready [0,1] RGB."""
    c = scene_color
    if bloom is not None:
        c = c + bloom * bloom_strength
    return reinhard_tonemap(c)


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """IEC 61966-2-1 EOTF; used when decoding SRGB8 textures / gbuffer targets."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def to_uint8(c: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> u8, round-to-nearest."""
    return jnp.clip(c * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
