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
    """(H, W, C) depthwise conv with SAME padding. Test oracle only: the
    grouped-conv path is slow on TPU (6.5 -> 4.3 ms/frame for the full chain,
    tools/microbench_bloom.py) AND less accurate (TPU convs accumulate at
    reduced precision; the dense forms below match this oracle to ~5e-7 on
    CPU but the TPU conv itself drifts ~4e-3)."""
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


def _shift_rows(a: jnp.ndarray, d: int) -> jnp.ndarray:
    """a[i - d] with ZERO fill (the conv's SAME zero-padding semantics)."""
    if d == 0:
        return a
    z = jnp.zeros_like(a[: abs(d)])
    if d > 0:
        return jnp.concatenate([z, a[:-d]], axis=0)
    return jnp.concatenate([a[-d:], z], axis=0)


def _shift_cols(a: jnp.ndarray, d: int) -> jnp.ndarray:
    if d == 0:
        return a
    z = jnp.zeros_like(a[:, : abs(d)])
    if d > 0:
        return jnp.concatenate([z, a[:, :-d]], axis=1)
    return jnp.concatenate([a[:, -d:], z], axis=1)


def _axis_se_so(a: jnp.ndarray, axis: int):
    """1-d stride-2 factor pair along ``axis`` with XLA SAME alignment:
    out(i) = sum_t f(t) a(2i + t - pad_lo), pad_lo = 1 (even n) / 2 (odd n).
    se = [.25,.5,.25] lands on the odd parity plane for even n (even for odd
    n); so = [.5,.5] on the other. All filter math runs at HALF length."""
    n = a.shape[axis]
    sl = lambda s: jax.lax.slice_in_dim(a, s, n, 2, axis=axis)
    sh = _shift_rows if axis == 0 else _shift_cols
    ep, op = sl(0), sl(1)
    if n % 2 == 0:
        se = 0.25 * sh(op, 1) + 0.5 * op + 0.25 * sh(op, -1)
        so = 0.5 * ep + 0.5 * sh(ep, -1)
    else:
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, 1)
        op = jnp.pad(op, pad)
        se = 0.25 * sh(ep, 1) + 0.5 * ep + 0.25 * sh(ep, -1)
        so = 0.5 * sh(op, 1) + 0.5 * op
    return se, so


def downsample_13tap(img: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution 13-tap downsample (bloom_downsample.comp:16-53).

    Dense parity-grid formulation: the 5x5 stencil is
    0.5 * se_r (x) se_c + 0.5 * so_r (x) so_c (zero at mixed parities), so the
    stride-2 conv becomes two separable shift+FMA passes over half-size parity
    planes — no grouped convolution (slow TPU path), no full-res filter math.
    Matches the conv oracle to fp reassociation (tools/microbench_bloom.py)."""
    c_se, c_so = _axis_se_so(img, 1)
    r_se, _ = _axis_se_so(c_se, 0)
    _, r_so = _axis_se_so(c_so, 0)
    return 0.5 * r_se + 0.5 * r_so


def upsample_tent(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear x2 upsample + 3x3 tent (bloom_upsample.comp) — tent as dense
    separable shift+FMAs (zero-fill edges = the conv's SAME padding)."""
    up = jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="linear")
    h = 0.25 * _shift_cols(up, 1) + 0.5 * up + 0.25 * _shift_cols(up, -1)
    return 0.25 * _shift_rows(h, 1) + 0.5 * h + 0.25 * _shift_rows(h, -1)


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
