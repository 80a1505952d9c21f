"""Bloom — CoD-style 13-tap downsample + tent upsample chain (Bloomer,
bloomer.cpp:38-285; shaders/postprocessing/bloom_downsample.comp:16-53,
bloom_upsample.comp).

TPU-native formulation: the 13 bilinear taps collapse to a fixed 5x5 stencil on the
exact pixel grid, expressed as a stride-2 depthwise convolution (MXU-friendly); the
upsample is a bilinear resize + 3x3 tent + additive blend up the chain. 6 mips
(bloomer.cpp:9). The composite adds ``bloom * 0.014159`` (scene_upsample.frag:61).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

# 13-tap CoD downsample as a 5x5 stencil (taps at even/odd offsets, weights
# accumulated from the 5 overlapping 4-tap groups).
_DOWN_KERNEL = np.array(
    [
        [0.03125, 0.0, 0.0625, 0.0, 0.03125],
        [0.0, 0.125, 0.0, 0.125, 0.0],
        [0.0625, 0.0, 0.125, 0.0, 0.0625],
        [0.0, 0.125, 0.0, 0.125, 0.0],
        [0.03125, 0.0, 0.0625, 0.0, 0.03125],
    ],
    dtype=np.float32,
)

_TENT_KERNEL = (
    np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.float32) / 16.0
)


def _depthwise_conv(img: jnp.ndarray, kernel: np.ndarray, stride: int) -> jnp.ndarray:
    """(H, W, C) depthwise conv with SAME padding."""
    c = img.shape[-1]
    k = jnp.asarray(kernel)[:, :, None, None]  # (kh, kw, 1, 1)
    k = jnp.tile(k, (1, 1, 1, c))  # depthwise: one filter per channel
    out = jax.lax.conv_general_dilated(
        img[None],
        k,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out[0]


def downsample_13tap(img: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution 13-tap downsample (bloom_downsample.comp:16-53)."""
    return _depthwise_conv(img, _DOWN_KERNEL, stride=2)


def upsample_tent(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear x2 upsample + 3x3 tent (bloom_upsample.comp)."""
    up = jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="linear")
    return _depthwise_conv(up, _TENT_KERNEL, stride=1)


def bloom_chain(scene_color: jnp.ndarray, num_mips: int = 6) -> jnp.ndarray:
    """Full bloom: 6-mip down chain, additive tent up chain.

    Returns the full-res bloom texture to be added as ``bloom * strength`` in the
    composite."""
    mips: List[jnp.ndarray] = [scene_color]
    cur = scene_color
    for _ in range(num_mips):
        cur = downsample_13tap(cur)
        mips.append(cur)
    # Up chain: accumulate from the smallest mip back to full res.
    acc = mips[-1]
    for level in range(num_mips - 1, -1, -1):
        target = mips[level]
        acc = upsample_tent(acc, target.shape[0], target.shape[1]) + target
    # Subtract the original so bloom is purely the blurred energy.
    return acc - scene_color
