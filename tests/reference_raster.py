"""Brute-force numpy oracle rasterizer — the golden reference for the TPU raster engine.

Implements the same clipless 2DH math as androidrenderer_tpu.ops.raster in float64,
per-pixel, with no tiling/binning/chunking. Slow and obviously-correct.
"""

from __future__ import annotations

import numpy as np


def clip_to_pixel_h(clip: np.ndarray, width: int, height: int) -> np.ndarray:
    x, y, w = clip[..., 0], clip[..., 1], clip[..., 3]
    xp = (x + w) * (0.5 * width) - 0.5 * w
    yp = (w - y) * (0.5 * height) - 0.5 * w
    return np.stack([xp, yp, w], axis=-1)


def rasterize_reference(
    clip: np.ndarray,  # (V, 4) float
    tri_indices: np.ndarray,  # (N, 3) int
    width: int,
    height: int,
    double_sided: np.ndarray | None = None,
    dtype=np.float64,
):
    """Returns (depth (H,W) cleared to 0, vis (H,W) int32 = -1, bary (H,W,3)).

    ``dtype=np.float32`` ranks depths at production precision — exactly coplanar
    geometry then resolves ties by max id the same way the TPU raster does
    (float64 distinguishes sub-ULP depth differences and flips such winners)."""
    clip = clip.astype(dtype)
    v = clip_to_pixel_h(clip, width, height)
    n = tri_indices.shape[0]
    if double_sided is None:
        double_sided = np.ones(n, dtype=bool)

    px = np.arange(width, dtype=dtype)[None, :]
    py = np.arange(height, dtype=dtype)[:, None]

    depth = np.zeros((height, width), dtype=dtype)
    vis = np.full((height, width), -1, dtype=np.int32)
    bary = np.zeros((height, width, 3), dtype=np.float64)

    for t in range(n):
        i0, i1, i2 = tri_indices[t]
        v0, v1, v2 = v[i0], v[i1], v[i2]
        z = clip[[i0, i1, i2], 2]
        w = np.array([v0[2], v1[2], v2[2]])
        e = np.stack([np.cross(v1, v2), np.cross(v2, v0), np.cross(v0, v1)])  # (3,3)
        if np.abs(e).sum() == 0.0:
            continue
        d = e[:, 0][:, None, None] * px + e[:, 1][:, None, None] * py + e[:, 2][:, None, None]
        # Front face = all edge values <= 0 (y-down pixel space flips glTF CCW);
        # double-sided geometry also accepts the opposite orientation.
        cov = np.all(d <= 0.0, axis=0) | (np.all(d >= 0.0, axis=0) & double_sided[t])
        qv = np.tensordot(w, d, axes=(0, 0))
        rv = np.tensordot(z, d, axes=(0, 0))
        with np.errstate(divide="ignore", invalid="ignore"):
            zn = np.where(qv != 0.0, rv / np.where(qv == 0.0, 1.0, qv), -1.0)
        cov = cov & (zn > 0.0) & (zn <= 1.0) & (qv != 0.0)
        # Depth test GREATER-or-equal with max-id tie break (matches TPU resolve).
        win = cov & ((zn > depth) | ((zn == depth) & (t > vis)))
        depth = np.where(cov & (zn > depth), zn, depth)
        if win.any():
            s = d.sum(axis=0)
            lam = d / np.where(s == 0.0, 1.0, s)
            for k in range(3):
                bary[..., k] = np.where(win, lam[k], bary[..., k])
            vis = np.where(win, t, vis)
    return depth, vis, bary
