"""GPU-driven culling — frustum + HiZ occlusion, as masks over the primitive table.

Re-creates shaders/culling/hi_z_culling.comp (frustum plane test :85-99, Mara-McGuire
sphere projection :58-77, HiZ pyramid test :101-131) and DepthCullingPhase's two-pass
scheme (depth_culling_phase.cpp:182-241). The reference's "visibility list ->
compacted indirect draws" (indirect_drawing_utils.cpp:13-82) becomes: primitive mask ->
per-triangle mask fed to the binner (compaction happens inside binning).

Sign conventions here are self-consistent (view-space forward distance d = -z_view > 0,
reversed-Z depth = z_near / d); the reference shader carries a sign confusion it
compensates elsewhere (hi_z_culling.comp:52-54) — we implement the intended algorithm.

HiZ pyramid: reversed-Z "farthest" is the MINIMUM depth value, so the pyramid is a
min-reduction mip chain; a sphere is occluded when its nearest depth is below the
pyramid's min over its screen AABB.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def frustum_cull_spheres(
    bounds: jnp.ndarray,  # (P, 4) world [center, radius]
    view: jnp.ndarray,  # (4, 4)
    frustum: jnp.ndarray,  # (4,) [fx.x, fx.z, fy.y, fy.z] (camera.py)
    z_near,
    radius_pad: float = 0.0,
) -> jnp.ndarray:
    """(P,) bool — True = potentially visible (hi_z_culling.comp:85-99)."""
    c = bounds[:, :3] @ view[:3, :3].T + view[:3, 3]
    r = bounds[:, 3] + radius_pad
    # Inside-left/right: fx.x*x + fx.z*z >= 0 for inside; with symmetric frustum the
    # |x| form tests both planes at once.
    vis = c[:, 2] * frustum[1] - jnp.abs(c[:, 0]) * frustum[0] > -r
    vis &= c[:, 2] * frustum[3] - jnp.abs(c[:, 1]) * frustum[2] > -r
    # Near plane: some part of the sphere is beyond z_near ahead (d = -z).
    vis &= (-c[:, 2]) + r > z_near
    return vis


def project_sphere_aabb(
    center_view: jnp.ndarray,  # (P, 3) view space
    radius: jnp.ndarray,  # (P,)
    z_near,
    p00,
    p11,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mara-McGuire 2013 projected sphere bounds -> uv AABB (P, 4) [u0, v0, u1, v1]
    (0,0 = top-left, matching our pixel convention) + validity mask.

    Only valid when the sphere is fully in front of the near plane."""
    d = -center_view[:, 2]
    ok = d - radius > z_near

    def axis_bounds(cx: jnp.ndarray, cz: jnp.ndarray):
        # cz = forward distance (positive), cx = lateral offset.
        t2 = cx * cx + cz * cz - radius * radius
        t = jnp.sqrt(jnp.maximum(t2, 1e-12))
        # tangent directions: rotate (cx, cz) by +-asin(r/|c|); slope = x/z of the
        # rotated vectors.
        mn = (cx * t - cz * radius) / jnp.maximum(cx * radius + cz * t, 1e-12)
        mx = (cx * t + cz * radius) / jnp.maximum(-cx * radius + cz * t, 1e-12)
        return mn, mx

    minx, maxx = axis_bounds(center_view[:, 0], d)
    miny, maxy = axis_bounds(center_view[:, 1], d)
    # ndc = slope * p00 (x) / slope * p11 (y); uv: u = ndc*0.5+0.5, v = 0.5-ndc*0.5.
    u0 = minx * p00 * 0.5 + 0.5
    u1 = maxx * p00 * 0.5 + 0.5
    v0 = 0.5 - maxy * p11 * 0.5
    v1 = 0.5 - miny * p11 * 0.5
    aabb = jnp.stack([u0, v0, u1, v1], axis=-1)
    return jnp.clip(aabb, 0.0, 1.0), ok


def build_hiz_pyramid(depth: jnp.ndarray, num_levels: int) -> list[jnp.ndarray]:
    """Min-reduction depth pyramid (levels[0] = full res). Replaces the FFX SPD
    single-pass downsampler (mip_chain_generator.cpp:5-48) — XLA fuses the chain."""
    levels = [depth]
    cur = depth
    for _ in range(num_levels - 1):
        h, w = cur.shape
        cur = cur.reshape(h // 2, 2, w // 2, 2).min(axis=(1, 3))
        levels.append(cur)
    return levels


def occlusion_cull_spheres(
    bounds: jnp.ndarray,  # (P, 4) world
    view: jnp.ndarray,
    z_near,
    p00,
    p11,
    hiz_levels: list[jnp.ndarray],
    radius_pad: float = 2.0,  # reference inflates by +2 (hi_z_culling.comp:150)
    row_offset=0,  # band rendering: first screen row covered by hiz_levels[0]
    full_height: int | None = None,  # full-frame height (defaults to hiz height)
) -> jnp.ndarray:
    """(P,) bool — True = NOT occluded. Spheres crossing the near plane pass.

    Band mode (hiz covers rows [row_offset, row_offset + band)): spheres whose
    projected AABB misses the band entirely are culled FOR THIS BAND — they have
    no pixels here; the sharded caller ORs per-band visibility across devices for
    the temporal visibility list (parallel/collectives.any_across)."""
    c = bounds[:, :3] @ view[:3, :3].T + view[:3, 3]
    r = bounds[:, 3] + radius_pad
    aabb, projectable = project_sphere_aabb(c, r, z_near, p00, p11)

    h0, w0 = hiz_levels[0].shape
    fh = full_height if full_height is not None else h0
    width = (aabb[:, 2] - aabb[:, 0]) * w0
    height = (aabb[:, 3] - aabb[:, 1]) * fh
    level = jnp.floor(jnp.log2(jnp.maximum(jnp.maximum(width, height), 1.0)))
    level = jnp.clip(level, 0, len(hiz_levels) - 1).astype(jnp.int32)

    # Sample the pyramid min over the AABB center at the chosen level: gather a 2x2
    # footprint min for conservatism.
    cu = (aabb[:, 0] + aabb[:, 2]) * 0.5
    cv = (aabb[:, 1] + aabb[:, 3]) * 0.5

    samples = []
    for li, lv in enumerate(hiz_levels):
        lh, lw = lv.shape
        x = jnp.clip((cu * lw).astype(jnp.int32), 0, lw - 1)
        yg = (cv * fh - row_offset) / (1 << li)  # band-local row at this level
        y = jnp.clip(yg.astype(jnp.int32), 0, lh - 1)
        x1 = jnp.minimum(x + 1, lw - 1)
        y1 = jnp.minimum(y + 1, lh - 1)
        s = jnp.minimum(
            jnp.minimum(lv[y, x], lv[y, x1]), jnp.minimum(lv[y1, x], lv[y1, x1])
        )
        samples.append(s)
    pyramid_min = jnp.choose(level, samples, mode="clip")

    # Nearest depth of the sphere (reversed-Z): z_near / (d - r).
    d = -c[:, 2]
    sphere_depth = jnp.clip(z_near / jnp.maximum(d - r, 1e-6), 0.0, 1.0)
    visible = sphere_depth >= pyramid_min
    # If un-projectable (crosses near plane), treat as visible.
    visible = visible | ~projectable
    if full_height is not None and full_height != h0:
        in_band = ((aabb[:, 3] * fh) >= row_offset) & (
            (aabb[:, 1] * fh) <= row_offset + h0
        )
        visible = visible & in_band
    return visible


def primitive_mask_to_triangle_mask(
    prim_visible: jnp.ndarray,  # (P,) bool
    tri_primitive: jnp.ndarray,  # (N,) i32
    tri_valid: jnp.ndarray,  # (N,) bool
) -> jnp.ndarray:
    return tri_valid & prim_visible[tri_primitive]


def frustum_cull_triangles(
    corners: jnp.ndarray,  # (N, 3, 3) world-space baked corner table
    view: jnp.ndarray,  # (4, 4)
    frustum: jnp.ndarray,  # (4,) [fx.x, fx.z, fy.y, fy.z]
    z_near,
    tri_valid: jnp.ndarray,  # (N,) bool
) -> jnp.ndarray:
    """(N,) bool — per-triangle frustum test on the baked corner table.

    Conservative separating-plane test: a triangle is culled only when all
    three corners lie outside ONE frustum plane — such a triangle cannot cover
    any pixel (screen coverage implies inside-x/y; the raster's z-in-(0,1]
    test implies forward distance >= z_near). Replaces the per-triangle
    primitive-mask gather (`prim_visible[tri_primitive]`): the 310k-row gather
    costs ~2.9 ms/frame at bench scale while this dense test fuses into the
    surrounding elementwise work, and it culls strictly FINER than the
    primitive-sphere test — it only ever removes triangles that could never
    shade a pixel, so the rasterized output is identical.
    (hi_z_culling.comp:85-99 frustum semantics, refined to triangle grain.)"""
    # Broadcast FMAs, never a (N,3)@(3,3) dot (tiny-K matmuls are catastrophic
    # on this TPU — docs/ROADMAP.md cost model).
    wx = corners[:, :, 0]
    wy = corners[:, :, 1]
    wz = corners[:, :, 2]
    x = view[0, 0] * wx + view[0, 1] * wy + view[0, 2] * wz + view[0, 3]
    y = view[1, 0] * wx + view[1, 1] * wy + view[1, 2] * wz + view[1, 3]
    z = view[2, 0] * wx + view[2, 1] * wy + view[2, 2] * wz + view[2, 3]
    lt = z * frustum[1] - x * frustum[0]  # > 0 = inside the left plane
    rt = z * frustum[1] + x * frustum[0]
    tp = z * frustum[3] - y * frustum[2]
    bt = z * frustum[3] + y * frustum[2]
    out = (
        jnp.all(lt <= 0.0, axis=1)
        | jnp.all(rt <= 0.0, axis=1)
        | jnp.all(tp <= 0.0, axis=1)
        | jnp.all(bt <= 0.0, axis=1)
        | jnp.all(-z < z_near, axis=1)  # all corners nearer than the near plane
    )
    return tri_valid & ~out
