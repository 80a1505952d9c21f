"""Vertex transform + clipless homogeneous triangle setup.

Math (2DH rasterization, Olano-Greer style — no clipping needed):

For clip-space vertices ``(X, Y, Z, W)`` we first fold the viewport transform into
homogeneous *pixel space*  ``v' = (X', Y', W)`` with ``X'/W = px``, ``Y'/W = py``
(pixel centers at integer coordinates +- the convention in camera.py). Edge functions
are then

    D_i(px, py) = dot(cross(v'_j, v'_k), (px, py, 1))        (i, j, k cyclic)

which are affine in pixel coordinates. Writing ``s = D_0 + D_1 + D_2`` and
``q = D_0*W_0 + D_1*W_1 + D_2*W_2``:

- coverage: all D_i >= 0 (front) or all <= 0 (back face / flipped winding);
- perspective-correct barycentrics: ``lambda_i = D_i / s`` — these interpolate raw
  vertex attributes directly, no divide-by-w anywhere;
- interpolated clip w: ``w(p) = q / s``;
- ndc depth under the reference's infinite reversed-Z projection (clip.z == z_near for
  every vertex, scene_view.cpp:13-27): ``z_ndc(p) = z_near * s / q``. The on-screen
  range is (0, 1]; z_ndc > 1 is closer than the near plane (clipped), z_ndc <= 0 is
  behind the camera. For general projections (ortho shadow maps) we carry a third
  accumulator ``r = sum D_i * Z_i`` and use ``z_ndc = r / q``.

Setup emits, per triangle, a 12-float record:
  edge coefficients (3 edges x [A, B, C])  +  q coefficients ([A, B, C]) — since
  s's coefficients are just the sum of the edge rows, and r's equal q's with Z in
  place of W we emit ``r`` coefficients too (3) and a pixel-space AABB (4) + flags.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TriangleSetup(NamedTuple):
    """SoA per-triangle raster constants. N is padded; invalid lanes have valid=0."""

    edge: jnp.ndarray  # (N, 3, 3) f32 — D_i(px,py) = edge[i] . (px, py, 1)
    q: jnp.ndarray  # (N, 3) f32 — q(px,py) coefficients (sum D_i * W_i)
    r: jnp.ndarray  # (N, 3) f32 — r(px,py) coefficients (sum D_i * Z_i)
    bbox: jnp.ndarray  # (N, 4) f32 — [x0, y0, x1, y1] inclusive pixel bounds
    valid: jnp.ndarray  # (N,) bool
    double_sided: jnp.ndarray  # (N,) bool — accept back-facing coverage


def transform_to_clip(world_positions: jnp.ndarray, view_proj: jnp.ndarray) -> jnp.ndarray:
    """(V, 3) world -> (V, 4) clip. One MXU matmul."""
    vp = view_proj.astype(jnp.float32)
    xyz = world_positions.astype(jnp.float32)
    clip = xyz @ vp[:, :3].T + vp[:, 3]
    return clip


def clip_to_pixel_h(clip: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """(..., 4) clip -> (..., 3) homogeneous pixel space (X', Y', W).

    px = (x_ndc + 1) * W/2 - 0.5 ;  py = (1 - y_ndc) * H/2 - 0.5  (y-down image).
    """
    x, y, w = clip[..., 0], clip[..., 1], clip[..., 3]
    xp = (x + w) * (0.5 * width) - 0.5 * w
    yp = (w - y) * (0.5 * height) - 0.5 * w
    return jnp.stack([xp, yp, w], axis=-1)


def gather_corners(
    positions: jnp.ndarray, tri_indices: jnp.ndarray
) -> jnp.ndarray:
    """(V, 3) positions + (N, 3) indices -> (N, 3, 3) per-triangle corners.

    Session-5 profile: the 6 per-corner gathers inside triangle_setup cost
    ~28 ms at 310k triangles — more than the raster KERNEL they feed. Static
    topology means the table can be baked once at scene build (SceneArrays.
    tri_corner_pos / ProxyMesh.corners) and refreshed only on dynamic
    transform updates; per-frame setup then has ZERO gathers
    (triangle_setup_corners)."""
    return positions[tri_indices]


def triangle_setup_corners(
    corner_pos: jnp.ndarray,  # (N, 3, 3) world-space per-triangle corners
    view_proj: jnp.ndarray,  # (4, 4)
    width: int,
    height: int,
    double_sided: jnp.ndarray | None = None,  # (N,) bool
    tri_valid: jnp.ndarray | None = None,  # (N,) bool — padding mask
) -> TriangleSetup:
    """triangle_setup from a baked corner table — gather-free, and fully
    COMPONENT-WISE: the transform is broadcast FMAs on (N,) columns of the
    corner table instead of a (3N, 3) matmul + (N, 3, 4) restack. The round-3
    parity trace showed the stacked formulation cost ~4 ms/frame in
    layout-copy + strided-slice fusions (copy of f32[N,3,4]{0,2,1} +
    slice_reduce_fusions at the old clip_to_pixel_h call sites); component
    math fuses into a handful of flat passes over the table."""
    vp = view_proj.astype(jnp.float32)
    cp = corner_pos.astype(jnp.float32)

    def corner(k):
        wx = cp[:, k, 0]
        wy = cp[:, k, 1]
        wz = cp[:, k, 2]
        x = vp[0, 0] * wx + vp[0, 1] * wy + vp[0, 2] * wz + vp[0, 3]
        y = vp[1, 0] * wx + vp[1, 1] * wy + vp[1, 2] * wz + vp[1, 3]
        z = vp[2, 0] * wx + vp[2, 1] * wy + vp[2, 2] * wz + vp[2, 3]
        w = vp[3, 0] * wx + vp[3, 1] * wy + vp[3, 2] * wz + vp[3, 3]
        return x, y, z, w

    return _setup_from_corner_components(
        corner(0), corner(1), corner(2), width, height, double_sided, tri_valid
    )


def triangle_setup(
    clip: jnp.ndarray,  # (V, 4) clip-space positions
    tri_indices: jnp.ndarray,  # (N, 3) int32 vertex indices
    width: int,
    height: int,
    double_sided: jnp.ndarray | None = None,  # (N,) bool
    tri_valid: jnp.ndarray | None = None,  # (N,) bool — padding mask
) -> TriangleSetup:
    """Build raster constants for N triangles. Pure XLA (gathers + cross products)."""
    clip_c = jnp.stack(
        [
            clip[tri_indices[:, 0]],
            clip[tri_indices[:, 1]],
            clip[tri_indices[:, 2]],
        ],
        axis=1,
    )  # (N, 3, 4)
    return _setup_from_corner_clip(
        clip_c, width, height, double_sided, tri_valid
    )


def _setup_from_corner_clip(
    clip_c: jnp.ndarray,  # (N, 3, 4) per-corner clip positions
    width: int,
    height: int,
    double_sided: jnp.ndarray | None,
    tri_valid: jnp.ndarray | None,
) -> TriangleSetup:
    def corner(k):
        c = clip_c[:, k, :]
        return c[:, 0], c[:, 1], c[:, 2], c[:, 3]

    return _setup_from_corner_components(
        corner(0), corner(1), corner(2), width, height, double_sided, tri_valid
    )


def _setup_from_corner_components(
    c0,  # (x, y, z, w) clip components of corner 0, each (N,) f32
    c1,
    c2,
    width: int,
    height: int,
    double_sided: jnp.ndarray | None,
    tri_valid: jnp.ndarray | None,
) -> TriangleSetup:
    """Component-wise setup core: all math on flat (N,) columns; the only
    materialized stacks are the output records. Semantically identical to the
    old (N, 3, 4)-stacked formulation (same formulas, same reduce order); the
    stacked form cost ~4 ms/frame in layout copies + strided-slice fusions at
    310k triangles (round-3 parity trace)."""
    _, _, z0, w0 = c0
    _, _, z1, w1 = c1
    _, _, z2, w2 = c2

    def pix(c):
        x, y, _, w = c
        xp = (x + w) * (0.5 * width) - 0.5 * w
        yp = (w - y) * (0.5 * height) - 0.5 * w
        return xp, yp

    x0p, y0p = pix(c0)
    x1p, y1p = pix(c1)
    x2p, y2p = pix(c2)
    n = x0p.shape[0]

    # e_i = cross(v_j, v_k) with v = (xp, yp, w) — component-wise (the same
    # minors jnp.cross emits, same order).
    def cross(xa, ya, wa, xb, yb, wb):
        return ya * wb - wa * yb, wa * xb - xa * wb, xa * yb - ya * xb

    e0a, e0b, e0c = cross(x1p, y1p, w1, x2p, y2p, w2)
    e1a, e1b, e1c = cross(x2p, y2p, w2, x0p, y0p, w0)
    e2a, e2b, e2c = cross(x0p, y0p, w0, x1p, y1p, w1)

    # q = sum_i D_i * W_i ; r = sum_i D_i * Z_i — affine, same basis as the edges.
    qa = e0a * w0 + e1a * w1 + e2a * w2
    qb = e0b * w0 + e1b * w1 + e2b * w2
    qc_ = e0c * w0 + e1c * w1 + e2c * w2
    ra = e0a * z0 + e1a * z1 + e2a * z2
    rb = e0b * z0 + e1b * z1 + e2b * z2
    rc_ = e0c * z0 + e1c * z1 + e2c * z2

    # Degenerate triangles: zero area in the homogeneous sense (all cross rows ~ 0).
    nondegenerate = (
        (jnp.abs(e0a) + jnp.abs(e1a) + jnp.abs(e2a))
        + (jnp.abs(e0b) + jnp.abs(e1b) + jnp.abs(e2b))
        + (jnp.abs(e0c) + jnp.abs(e1c) + jnp.abs(e2c))
    ) > 0.0

    # Pixel-space AABB. Only trustworthy when every vertex has w > 0; triangles
    # crossing w == 0 get a full-screen box (they are rare: geometry straddling the
    # camera plane).
    eps = 1e-6
    all_front = (w0 > eps) & (w1 > eps) & (w2 > eps)
    px0 = x0p / jnp.where(w0 == 0, 1, w0)
    px1 = x1p / jnp.where(w1 == 0, 1, w1)
    px2 = x2p / jnp.where(w2 == 0, 1, w2)
    py0 = y0p / jnp.where(w0 == 0, 1, w0)
    py1 = y1p / jnp.where(w1 == 0, 1, w1)
    py2 = y2p / jnp.where(w2 == 0, 1, w2)
    x0 = jnp.where(all_front, jnp.floor(jnp.minimum(jnp.minimum(px0, px1), px2)), 0.0)
    y0 = jnp.where(all_front, jnp.floor(jnp.minimum(jnp.minimum(py0, py1), py2)), 0.0)
    x1 = jnp.where(
        all_front, jnp.ceil(jnp.maximum(jnp.maximum(px0, px1), px2)), float(width - 1)
    )
    y1 = jnp.where(
        all_front, jnp.ceil(jnp.maximum(jnp.maximum(py0, py1), py2)), float(height - 1)
    )
    x0 = jnp.clip(x0, 0.0, float(width - 1))
    y0 = jnp.clip(y0, 0.0, float(height - 1))
    x1 = jnp.clip(x1, 0.0, float(width - 1))
    y1 = jnp.clip(y1, 0.0, float(height - 1))
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)

    # Fully behind the camera => never visible (z_ndc <= 0 everywhere); cull in setup.
    any_front = (w0 > eps) | (w1 > eps) | (w2 > eps)
    # Off-screen AABB cull (only valid when all_front).
    on_screen = jnp.where(all_front, (x1 >= x0) & (y1 >= y0), True)

    # Backface culling (single-sided triangles, fully in front of the camera):
    # glTF CCW front faces have NEGATIVE signed area in our y-down pixel space.
    # Mixed-w triangles are conservatively kept.
    area2 = (px1 - px0) * (py2 - py0) - (py1 - py0) * (px2 - px0)
    dbl = (
        jnp.ones((n,), dtype=bool) if double_sided is None else double_sided
    )
    front_facing = ~all_front | (area2 < 0.0) | dbl

    valid = nondegenerate & any_front & on_screen & front_facing
    if tri_valid is not None:
        valid = valid & tri_valid
    if double_sided is None:
        double_sided = jnp.ones((n,), dtype=bool)

    # Orientation folding: a double-sided triangle FULLY in front of the
    # camera has one fixed screen orientation — negate its plane rows when
    # back-facing so its interior is the canonical all-D<=0 half-space test,
    # and drop the double_sided flag (only camera-plane-crossing triangles
    # keep it: their two coverage sheets genuinely need both sign tests).
    # Every derived quantity is a RATIO of the flipped rows (barycentrics
    # D_i/s, depth r/q, attribute planes / s-plane), and IEEE negation is
    # exact, so the rendered output is bit-identical. What changes is the
    # raster kernels' span math: sid<0 records fall back to full-bbox window
    # spans (raster_bitmask.build_window_masks, raster_binned strips), so
    # before this fold every foliage triangle (14% of the honest scene)
    # emitted bbox-wide touches in the main/CSM/RSM rasters.
    # The sign comes from the homogeneous determinant (same basis as the edge
    # rows — consistent under fp even for slivers); det > 0 = back-facing in
    # y-down pixel space (glTF CCW front faces have det < 0).
    det = x0p * e0a + y0p * e0b + w0 * e0c
    flip = double_sided & all_front & (det > 0.0)
    sgn = jnp.where(flip, -1.0, 1.0)
    edge = jnp.stack(
        [
            jnp.stack([e0a * sgn, e0b * sgn, e0c * sgn], axis=-1),
            jnp.stack([e1a * sgn, e1b * sgn, e1c * sgn], axis=-1),
            jnp.stack([e2a * sgn, e2b * sgn, e2c * sgn], axis=-1),
        ],
        axis=1,
    )  # (N, 3, 3)
    qc = jnp.stack([qa * sgn, qb * sgn, qc_ * sgn], axis=-1)
    rc = jnp.stack([ra * sgn, rb * sgn, rc_ * sgn], axis=-1)
    double_sided = double_sided & ~all_front

    return TriangleSetup(
        edge=edge.astype(jnp.float32),
        q=qc.astype(jnp.float32),
        r=rc.astype(jnp.float32),
        bbox=bbox.astype(jnp.float32),
        valid=valid,
        double_sided=double_sided,
    )
