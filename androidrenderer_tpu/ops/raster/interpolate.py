"""Visibility-buffer resolve: perspective-correct attribute interpolation.

The reference's gbuffer fragment shader interpolates vertex attributes in hardware and
samples materials per fragment (materials/gltf_basic_pbr.slang:53-253). Here shading is
deferred behind the visibility buffer: for each pixel we gather the winning triangle's
edge coefficients and vertex attributes, re-evaluate the edge functions, and interpolate
with perspective-correct barycentrics ``lambda_i = D_i / sum(D)`` (see setup.py — raw
attributes interpolate directly, no divide-by-w).

Everything is a per-pixel gather + FMA — embarrassingly parallel over the screen.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

from androidrenderer_tpu.ops.raster.setup import TriangleSetup


class PixelBarycentrics(NamedTuple):
    tri_id: jnp.ndarray  # (H, W) int32, -1 = background
    vertex_ids: jnp.ndarray  # (H, W, 3) int32 (clamped-safe for background)
    lam: jnp.ndarray  # (H, W, 3) f32 perspective-correct barycentrics
    valid: jnp.ndarray  # (H, W) bool
    w: jnp.ndarray  # (H, W) f32 interpolated clip w (view distance along -z)
    # For analytic screen-space derivatives: attribute a(p) = f/s with
    # f = sum d_i a_i, so da/dx = (sum A_i a_i * s - f * sum A_i) / s^2.
    d: jnp.ndarray  # (H, W, 3) raw edge-function values
    s: jnp.ndarray  # (H, W) sum of edge values
    edge_a: jnp.ndarray  # (H, W, 3) x-gradient coefficients A_i
    edge_b: jnp.ndarray  # (H, W, 3) y-gradient coefficients B_i


def compute_barycentrics(
    vis: jnp.ndarray,  # (H, W) int32 visibility buffer
    setup: TriangleSetup,
    tri_indices: jnp.ndarray,  # (N, 3) int32
    row_offset: jnp.ndarray | int = 0,
) -> PixelBarycentrics:
    height, width = vis.shape
    valid = vis >= 0
    tid = jnp.maximum(vis, 0)

    # ONE flat 15-wide row gather: a (N, 3, 3) slice gather runs ~8x slower
    # than the identical flat-row gather at screen scale (microbench_gather.py);
    # concatenating edge+q per triangle keeps this at a single fast gather.
    n = setup.edge.shape[0]
    table = jnp.concatenate(
        [setup.edge.reshape(n, 9), setup.q.reshape(n, 3)], axis=1
    )  # (N, 12)
    row = table[tid]  # (H, W, 12)
    edge = row[..., :9].reshape(row.shape[:-1] + (3, 3))  # (H, W, 3, 3)
    q = row[..., 9:12]  # (H, W, 3)
    px = jnp.arange(width, dtype=jnp.float32)[None, :, None]
    py = (jnp.arange(height, dtype=jnp.float32) + row_offset)[:, None, None]

    d = edge[..., 0] * px + edge[..., 1] * py + edge[..., 2]  # (H, W, 3)
    s = jnp.sum(d, axis=-1, keepdims=True)
    lam = d / jnp.where(s == 0.0, 1.0, s)

    qv = q[..., 0] * px[..., 0] + q[..., 1] * py[..., 0] + q[..., 2]
    w = qv / jnp.where(s[..., 0] == 0.0, 1.0, s[..., 0])

    return PixelBarycentrics(
        tri_id=vis,
        vertex_ids=tri_indices[tid],
        lam=lam.astype(jnp.float32),
        valid=valid,
        w=w.astype(jnp.float32),
        d=d.astype(jnp.float32),
        s=s[..., 0].astype(jnp.float32),
        edge_a=edge[..., 0].astype(jnp.float32),
        edge_b=edge[..., 1].astype(jnp.float32),
    )


def interpolate_with_derivatives(
    bary: PixelBarycentrics,
    attr: jnp.ndarray,  # (V, K)
):
    """Interpolated value + analytic d/dx, d/dy — exact hardware-quad-derivative
    replacement for mip selection (texture.py). Returns three (H, W, K) arrays."""
    av = attr[bary.vertex_ids]  # (H, W, 3, K)
    s = jnp.where(bary.s == 0.0, 1.0, bary.s)[..., None]
    f = jnp.sum(av * bary.d[..., None], axis=-2)
    fx = jnp.sum(av * bary.edge_a[..., None], axis=-2)
    fy = jnp.sum(av * bary.edge_b[..., None], axis=-2)
    sx = jnp.sum(bary.edge_a, axis=-1)[..., None]
    sy = jnp.sum(bary.edge_b, axis=-1)[..., None]
    value = f / s
    inv_s2 = 1.0 / (s * s)
    ddx = (fx * s - f * sx) * inv_s2
    ddy = (fy * s - f * sy) * inv_s2
    mask = bary.valid[..., None]
    return (
        jnp.where(mask, value, 0.0),
        jnp.where(mask, ddx, 0.0),
        jnp.where(mask, ddy, 0.0),
    )


def interpolate_attributes(
    bary: PixelBarycentrics,
    attributes: Dict[str, jnp.ndarray],  # name -> (V, K) vertex attribute arrays
) -> Dict[str, jnp.ndarray]:
    """Interpolate each attribute to (H, W, K). Background pixels get zeros."""
    out: Dict[str, jnp.ndarray] = {}
    vids = bary.vertex_ids  # (H, W, 3)
    lam = bary.lam[..., None]  # (H, W, 3, 1)
    mask = bary.valid[..., None]
    for name, a in attributes.items():
        av = a[vids]  # (H, W, 3, K)
        interp = jnp.sum(av * lam, axis=-2)
        out[name] = jnp.where(mask, interp, 0.0).astype(a.dtype)
    return out
