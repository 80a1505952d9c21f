"""Cascaded shadow maps — DirectionalLight (directional_light.cpp:84-230,
directional_light.frag:62-94) as in-jit cascade fitting + ortho depth raster + PCF.

Parity:
- 4 cascades, practical split scheme with lambda 0.95 and 128 m max distance
  (directional_light.cpp:28-44): split_i = lerp(uniform, log, 0.95).
- Sphere-fit per frustum slice with texel snapping (cpp:189-208).
- Slope-scaled bias 0.0005 * sqrt(1 - NoL^2) / NoL (frag:88).
- 2x2 hardware-PCF equivalent: bilinear-weighted depth comparison.
- All 4 cascades rasterize in one batched (vmapped) pass — the TPU analog of the
  reference's multiview render with view_mask 0x000F (cpp:305-326).

Divergence (documented): beyond the last cascade the reference forces shadow = 0
(fully dark, frag:89-94); we return lit (1.0) so distant geometry keeps sunlight.

Depth convention matches the main raster: reversed (1 nearest the sun), ortho matrices
put w = 1 so the shared rasterizer interpolates z = r/s linearly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops.raster import (
    rasterize_depth,
    transform_to_clip,
    triangle_setup,
    triangle_setup_corners,
)
from androidrenderer_tpu.ops.raster.binning import bin_triangles


class CascadeData(NamedTuple):
    matrices: jnp.ndarray  # (C, 4, 4) world -> light clip (ortho, reversed-Z)
    splits: jnp.ndarray  # (C,) far distance of each cascade (view-space meters)
    canonical: jnp.ndarray  # (4, 4) union ortho frame covering every cascade — all
    # cascades share the light basis, so per-cascade raster setups derive from ONE
    # canonical triangle setup by affine coefficient transforms (no extra gathers).


def cascade_splits(
    num_cascades: int, z_near: float, max_distance: float, lam: float
) -> Tuple[float, ...]:
    """Practical split scheme (static — config only)."""
    splits = []
    for i in range(1, num_cascades + 1):
        f = i / num_cascades
        uniform = z_near + (max_distance - z_near) * f
        logarithmic = z_near * (max_distance / z_near) ** f
        splits.append(lam * logarithmic + (1.0 - lam) * uniform)
    return tuple(splits)


def fit_cascades(
    inverse_view: jnp.ndarray,  # (4, 4)
    p00,
    p11,
    sun_direction: jnp.ndarray,  # (3,) travel direction
    num_cascades: int,
    resolution: int,
    z_near: float,
    max_distance: float,
    split_lambda: float,
) -> CascadeData:
    """Sphere-fit + texel-snapped ortho matrices for every cascade, in-jit."""
    splits = cascade_splits(num_cascades, z_near, max_distance, split_lambda)
    sun = sun_direction / jnp.linalg.norm(sun_direction)

    # Stable light basis. Handedness matters: the light view looks along +sun,
    # i.e. view-z = -sun, so (right, lup, -sun) must be right-handed
    # (right x lup == -sun) or the raster sees mirrored winding and back-face
    # culls the WRONG side (sun-facing floors vanished from the maps; closed
    # meshes silently rendered their far faces).
    up_y = jnp.abs(sun[1]) < 0.99
    up = jnp.where(up_y, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    right = jnp.cross(up, sun)
    right = right / jnp.linalg.norm(right)
    lup = jnp.cross(right, sun)

    mats = []
    centers = []
    radii = []
    origins = []
    ranges = []
    near_d = z_near
    for i in range(num_cascades):
        far_d = splits[i]
        # 8 frustum-slice corners in view space -> world.
        corners = []
        for d in (near_d, far_d):
            hx, hy = d / p00, d / p11
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    corners.append(jnp.stack([sx * hx, sy * hy, -d]))
        cv = jnp.stack(corners)  # (8, 3)
        cw = cv @ inverse_view[:3, :3].T + inverse_view[:3, 3]
        center = jnp.mean(cw, axis=0)
        radius = jnp.max(jnp.linalg.norm(cw - center, axis=1))
        # Texel snap in light space (cpp:189-208 snaps to 1/16 texel; full-texel snap
        # of the sphere center achieves the same stationarity).
        texel = 2.0 * radius / resolution
        cx = jnp.floor(jnp.dot(center, right) / texel) * texel
        cy = jnp.floor(jnp.dot(center, lup) / texel) * texel
        cz = jnp.dot(center, sun)
        center = right * cx + lup * cy + sun * cz

        # Light view: rows = (right, lup, -(-sun))… depth measured along +sun from a
        # pulled-back origin so occluders between the sun and the slice are kept.
        backup = 2.0 * radius + 1.0
        origin = center - sun * backup
        depth_range = 2.0 * backup
        # world -> light clip: x,y in [-1,1] over the sphere, z = 1 - dist/range.
        rowx = right / radius
        rowy = lup / radius
        rowz = -sun / depth_range
        m = jnp.stack([
            jnp.concatenate([rowx, (-jnp.dot(rowx, origin))[None]]),
            jnp.concatenate([rowy, (-jnp.dot(rowy, origin))[None]]),
            jnp.concatenate([rowz, (1.0 + jnp.dot(sun, origin) / depth_range)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0]),
        ])
        mats.append(m)
        centers.append(center)
        radii.append(radius)
        origins.append(origin)
        ranges.append(depth_range)
        near_d = far_d

    # Canonical union frame (same basis; covers every cascade's box + depth range).
    cs = jnp.stack(centers)
    rs = jnp.stack(radii)
    cu = jnp.mean(cs, axis=0)
    r_u = jnp.max(jnp.linalg.norm(cs - cu, axis=1) + rs)
    starts = jnp.stack([jnp.dot(sun, o) for o in origins])
    ends = starts + jnp.stack(ranges)
    s0 = jnp.min(starts)
    range_u = jnp.max(ends) - s0
    origin_u = cu + sun * (s0 - jnp.dot(sun, cu))
    rowx = right / r_u
    rowy = lup / r_u
    rowz = -sun / range_u
    canonical = jnp.stack([
        jnp.concatenate([rowx, (-jnp.dot(rowx, origin_u))[None]]),
        jnp.concatenate([rowy, (-jnp.dot(rowy, origin_u))[None]]),
        jnp.concatenate([rowz, (1.0 + jnp.dot(sun, origin_u) / range_u)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0]),
    ])

    return CascadeData(
        matrices=jnp.stack(mats).astype(jnp.float32),
        splits=jnp.asarray(splits, dtype=jnp.float32),
        canonical=canonical.astype(jnp.float32),
    )


def derive_ortho_setup(setup_c, mc: jnp.ndarray, mi: jnp.ndarray, resolution: int):
    """Derive a per-view triangle setup from a canonical ortho setup.

    ``mc``/``mi`` are world->clip ortho matrices sharing the same rotation basis
    (scaled rows); the pixel-space edge/bbox/z transforms are then affine, so one
    canonical `triangle_setup` (gather-heavy) serves every view at the cost of a
    few (N,)-wide FMAs. Triangles whose transformed bbox misses the target are
    invalidated — per-view frustum culling for free."""
    half = resolution * 0.5
    ax = jnp.linalg.norm(mi[0, :3]) / jnp.linalg.norm(mc[0, :3])
    ay = jnp.linalg.norm(mi[1, :3]) / jnp.linalg.norm(mc[1, :3])
    az = jnp.linalg.norm(mi[2, :3]) / jnp.linalg.norm(mc[2, :3])
    bx = mi[0, 3] - ax * mc[0, 3]
    by = mi[1, 3] - ay * mc[1, 3]
    bz = mi[2, 3] - az * mc[2, 3]
    # ndc affine -> pixel affine: px_i = ax*px_c + cx.
    cx = half * bx + (half - 0.5) * (1.0 - ax)
    # y flips in clip_to_pixel_h (py = (w - y) * H/2 - 0.5): y_i = ay*y + by
    # => py_i = ay*py_c + cy with cy = -half*by + (half - 0.5)*(1 - ay).
    cy = -half * by + (half - 0.5) * (1.0 - ay)

    e = setup_c.edge
    a_div = e[:, :, 0] / ax
    b_div = e[:, :, 1] / ay
    c_new = e[:, :, 2] - a_div * cx - b_div * cy
    edge_i = jnp.stack([a_div, b_div, c_new], axis=-1)
    q_i = jnp.sum(edge_i, axis=1)  # ortho: W == 1 for every vertex
    # r transforms like an affine pixel function, then z_i = az*z_c + bz.
    r = setup_c.r
    ra = r[:, 0] / ax
    rb = r[:, 1] / ay
    rc_ = r[:, 2] - ra * cx - rb * cy
    r_t = jnp.stack([ra, rb, rc_], axis=-1)
    r_i = az * r_t + bz * q_i
    # bbox transform (ax, ay > 0).
    b0 = setup_c.bbox
    x0 = jnp.clip(ax * b0[:, 0] + cx, 0.0, resolution - 1.0)
    y0 = jnp.clip(ay * b0[:, 1] + cy, 0.0, resolution - 1.0)
    x1 = jnp.clip(ax * b0[:, 2] + cx, 0.0, resolution - 1.0)
    y1 = jnp.clip(ay * b0[:, 3] + cy, 0.0, resolution - 1.0)
    on = (
        (ax * b0[:, 2] + cx >= 0.0)
        & (ax * b0[:, 0] + cx <= resolution - 1.0)
        & (ay * b0[:, 3] + cy >= 0.0)
        & (ay * b0[:, 1] + cy <= resolution - 1.0)
    )
    return setup_c._replace(
        edge=edge_i.astype(jnp.float32),
        q=q_i.astype(jnp.float32),
        r=r_i.astype(jnp.float32),
        bbox=jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.float32),
        valid=setup_c.valid & on,
    )


def render_shadow_cascades(
    positions: jnp.ndarray,  # (V, 3) world
    tri_indices: jnp.ndarray,  # (N, 3)
    tri_valid: jnp.ndarray,  # (N,) bool
    cascades: CascadeData,
    resolution: int,
    tile_h: int = 64,
    tile_w: int = 128,
    cap: int = 2048,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    double_sided: jnp.ndarray | None = None,  # (N,) — material sidedness
    proxy=None,  # scene.proxy.ProxyMesh | None — decimated far-cascade geometry
    proxy_from_cascade: int = 10**9,  # cascades >= this index rasterize the proxy
    pa_unroll: int = 1,  # binned-kernel Phase A unroll (config.raster_pa_unroll)
    use_bitmask: bool = False,  # bitmask-driven kernel (config.raster_bitmask)
    corners: jnp.ndarray | None = None,  # (N, 3, 3) baked corner table
    win_h: int = 32,  # bitmask-kernel window height (config.shadow_win_h)
) -> jnp.ndarray:
    """(C, R, R) reversed-Z shadow depth maps — batched depth-only raster.

    Back-facing (w.r.t. the light) single-sided triangles are culled: for closed
    meshes this is exact, and it doubles the span-narrowed kernel's throughput.

    ``proxy``/``proxy_from_cascade``: far cascades cover 32-128 m, where one
    shadow texel spans ~3-13 cm — below the proxy's cluster cell. The binned
    kernel is scalar-Phase-A (per-triangle) bound, so rasterizing ~8-10x fewer
    proxy triangles there cuts the pass nearly proportionally. The reference
    rasterizes full geometry into every cascade on HW (directional_light.cpp:
    305-326); this LOD split is the documented TPU-idiomatic divergence
    (scene/proxy.py)."""
    if double_sided is None:
        double_sided = jnp.ones(tri_indices.shape[0], dtype=bool)
    from androidrenderer_tpu.ops.raster.raster_binned import (
        auto_slabs_binned, rasterize_binned,
    )

    num_cascades = int(cascades.matrices.shape[0])
    k_proxy = min(max(int(proxy_from_cascade), 0), num_cascades)
    use_proxy = proxy is not None and k_proxy < num_cascades

    def one_setup(mat):
        # Baked corner table when available: gather-free, bit-identical
        # (session-5: the 6 setup gathers cost ~28 ms at bench scale — most
        # of this pass's budget once the cascades derive affinely).
        if corners is not None:
            return triangle_setup_corners(
                corners, mat, resolution, resolution,
                double_sided=double_sided, tri_valid=tri_valid,
            )
        clip = transform_to_clip(positions, mat)
        return triangle_setup(
            clip, tri_indices, resolution, resolution, double_sided=double_sided,
            tri_valid=tri_valid,
        )

    def one_setup_proxy(mat):
        return triangle_setup_corners(
            proxy.corners, mat, resolution, resolution,
            double_sided=proxy.tri_double_sided, tri_valid=proxy.tri_valid,
        )

    if use_pallas:
        # ONE triangle setup in the canonical union frame; per-cascade setups derive
        # by affine coefficient transforms (all cascades share the light basis, so
        # this costs a handful of (N,)-wide FMAs instead of 4x gather-heavy setups —
        # measured 338 -> ~130 ms on the bench view).
        mc = cascades.canonical
        setup_c = one_setup(mc) if k_proxy > 0 or not use_proxy else None
        setup_p = one_setup_proxy(mc) if use_proxy else None
        maps = []
        for i in range(num_cascades):
            src = setup_p if (use_proxy and i >= k_proxy) else setup_c
            setup_i = derive_ortho_setup(
                src, mc, cascades.matrices[i], resolution
            )
            if use_bitmask:
                from androidrenderer_tpu.ops.raster.raster_bitmask import (
                    rasterize_bitmask,
                )

                maps.append(
                    rasterize_bitmask(
                        setup_i, resolution, resolution,
                        win_h=win_h, kb=4, unroll=2,
                        num_slabs=auto_slabs_binned(
                            resolution, resolution, depth_only=True, win_h=win_h
                        ),
                        depth_only=True, affine_z=True,
                        interpret=pallas_interpret,
                    )
                )
                continue
            ns = auto_slabs_binned(
                resolution, resolution, depth_only=True, win_h=32
            )
            maps.append(
                # Window-binned kernel (round 3): beats the fused kernel at
                # cascade scale (36.7 vs 39.3 ms standalone) and Mosaic-compiles
                # in ~6 s vs ~130 — the fused kernel's cascade instantiation was
                # the bulk of the 1518 s raster-only config compile (BENCH_r02).
                # Ortho: z is an affine plane — no per-touch divide. (Round-2
                # negative results for the fused kernel here: compact=True,
                # win_h=8, XLA scatter-splat.)
                rasterize_binned(
                    setup_i, resolution, resolution,
                    win_h=32, cap=8, kb=4, unroll=2, pa_unroll=pa_unroll,
                    num_slabs=ns,
                    depth_only=True,
                    affine_z=True,
                    interpret=pallas_interpret,
                )
            )
        return jnp.stack(maps)

    def _one(setup):
        bins = bin_triangles(
            setup, resolution // tile_h, resolution // tile_w, tile_h, tile_w, cap
        )
        return rasterize_depth(
            setup, bins, resolution, resolution, tile_h, tile_w, chunk=64
        )

    if not use_proxy:
        return jax.vmap(lambda m: _one(one_setup(m)))(cascades.matrices)
    # Keep the full-geometry vmap over ALL cascades so the near maps are
    # bit-identical to the non-proxy run (a size-k vmap reassociates fp32
    # differently from a size-C one — measured 2e-6 drift, enough to flip PCF
    # texel snapping). The discarded far full-rasters only cost in this
    # XLA fallback/oracle path; production is the per-cascade Pallas loop.
    full_maps = jax.vmap(lambda m: _one(one_setup(m)))(cascades.matrices)
    prox_maps = jax.vmap(lambda m: _one(one_setup_proxy(m)))(
        cascades.matrices[k_proxy:]
    )
    return jnp.concatenate([full_maps[:k_proxy], prox_maps], axis=0)


def _raster_cascade_dynamic(
    setup_c, setup_p, mc, mi, k, k_proxy, resolution, win_h,
    pallas_interpret,
):
    """Rasterize cascade ``k`` (traced index) at traced matrix ``mi``.

    Geometry source is static per cascade id (full below k_proxy, proxy at or
    above) but the id is traced — one lax.cond, both branches (R, R). XLA
    executes only the taken branch. Shared by the staggered and the
    device-sharded cascade paths."""
    from androidrenderer_tpu.ops.raster.raster_binned import auto_slabs_binned
    from androidrenderer_tpu.ops.raster.raster_bitmask import rasterize_bitmask

    def raster(src):
        setup_i = derive_ortho_setup(src, mc, mi, resolution)
        return rasterize_bitmask(
            setup_i, resolution, resolution,
            win_h=win_h, kb=4, unroll=2,
            num_slabs=auto_slabs_binned(
                resolution, resolution, depth_only=True, win_h=win_h
            ),
            depth_only=True, affine_z=True, interpret=pallas_interpret,
        )

    if setup_p is None:
        return raster(setup_c)
    if k_proxy <= 0:
        return raster(setup_p)
    return jax.lax.cond(
        k < k_proxy, lambda: raster(setup_c), lambda: raster(setup_p)
    )


def render_shadow_cascades_sharded(
    positions: jnp.ndarray,
    tri_indices: jnp.ndarray,
    tri_valid: jnp.ndarray,
    cascades: CascadeData,
    resolution: int,
    axis_name: str,
    pallas_interpret: bool = False,
    double_sided: jnp.ndarray | None = None,
    proxy=None,
    proxy_from_cascade: int = 10**9,
    corners: jnp.ndarray | None = None,
    win_h: int = 32,
) -> jnp.ndarray:
    """(C, R, R) cascade maps with the per-cascade rasters DIVIDED across the
    mesh axis (VERDICT r4 item 6): device d rasterizes cascades {i : i %% n ==
    d} from its replicated scene data, contributes them into a zero-initialized
    (C, R, R) stack, and a psum over ICI assembles the full set (0 + x == x
    exactly, so the COMBINE is bit-exact; the cond-wrapped derive contracts
    FMAs differently from the inline single-device loop — coefficient ULPs
    flip coverage at a few % of triangle-EDGE texels (the usual ULP-edge
    contract; <= ~1e-4 depth deltas, gated by tests/test_sharding.py). With
    n >= C each device runs ONE
    cascade raster instead of C — the reference renders all cascades on its
    single GPU in one multiview pass (directional_light.cpp:305-326); this is
    the multi-chip analog."""
    if double_sided is None:
        double_sided = jnp.ones(tri_indices.shape[0], dtype=bool)
    num_cascades = int(cascades.matrices.shape[0])
    k_proxy = min(max(int(proxy_from_cascade), 0), num_cascades)
    use_proxy = proxy is not None and k_proxy < num_cascades
    mc = cascades.canonical

    def full_setup(mat):
        if corners is not None:
            return triangle_setup_corners(
                corners, mat, resolution, resolution,
                double_sided=double_sided, tri_valid=tri_valid,
            )
        clip = transform_to_clip(positions, mat)
        return triangle_setup(
            clip, tri_indices, resolution, resolution,
            double_sided=double_sided, tri_valid=tri_valid,
        )

    # Only build the setups a branch can actually take (k_proxy == 0 means
    # every cascade rasters the proxy; no cond is emitted then).
    setup_c = full_setup(mc) if (not use_proxy or k_proxy > 0) else None
    setup_p = (
        triangle_setup_corners(
            proxy.corners, mc, resolution, resolution,
            double_sided=proxy.tri_double_sided, tri_valid=proxy.tri_valid,
        )
        if use_proxy else None
    )
    if setup_c is None:
        setup_c = setup_p  # k_proxy == 0: single-branch path uses proxy only
        setup_p = None
        k_proxy = 0

    n = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    maps = jnp.zeros((num_cascades, resolution, resolution), jnp.float32)
    for j in range(-(-num_cascades // n)):  # ceil(C / n) rasters per device
        k = d + jnp.int32(j * n)
        own = k < num_cascades
        k_s = jnp.minimum(k, num_cascades - 1)
        mi = jnp.take(cascades.matrices, k_s, axis=0)
        mp = _raster_cascade_dynamic(
            setup_c, setup_p, mc, mi, k_s, k_proxy, resolution, win_h,
            pallas_interpret,
        )
        contrib = jnp.where(own, mp, 0.0)
        maps = jax.lax.dynamic_update_slice(
            maps,
            (jax.lax.dynamic_slice(maps, (k_s, 0, 0), (1, resolution, resolution))
             + contrib[None]),
            (k_s, 0, 0),
        )
    return jax.lax.psum(maps, axis_name)


def render_shadow_cascades_staggered(
    positions: jnp.ndarray,
    tri_indices: jnp.ndarray,
    tri_valid: jnp.ndarray,
    cascades: CascadeData,
    resolution: int,
    cached_packed: jnp.ndarray,  # (C, R, R, 2) i32 packed-PCF atlas (TemporalState)
    cached_matrices: jnp.ndarray,  # (C, 4, 4) matrices the cache was built with
    frame_index,  # () i32 traced
    update_budget: int = 1,  # far cascades re-rastered per frame (besides c0)
    pallas_interpret: bool = False,
    double_sided: jnp.ndarray | None = None,
    proxy=None,
    proxy_from_cascade: int = 10**9,
    corners: jnp.ndarray | None = None,
    win_h: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Budgeted cascade updates: raster cascade 0 every frame plus
    ``update_budget`` far cascades round-robin; the rest keep their cached
    packed maps AND the matrices they were rastered with (a stale map sampled
    through a fresh matrix would shadow from the wrong ortho frame).

    Returns (packed_atlas (C, R, R, 2) i32, matrices (C, 4, 4)) — the
    EFFECTIVE pair to sample with and to cache for next frame.

    The reference refits and re-renders all 4 cascades per frame at 4096^2
    (directional_light.cpp:84-230, 305-326); its own irradiance cache
    legitimizes budgeted updates (irradiance_cache.cpp:15-19 — 1024 probes of
    ~66k/frame). Far cascades move slowly (texel-snapped sphere fits), so on
    a static scene with a static sun the staggered steady state equals the
    rebuild-all maps BIT-exactly after ceil((C-1)/budget) frames
    (tests/test_shadow.py::test_staggered_cascades_steady_state). Pallas
    production path only (bitmask kernel; interpret=True for CPU tests)."""
    from androidrenderer_tpu.ops.raster.raster_binned import auto_slabs_binned
    from androidrenderer_tpu.ops.raster.raster_bitmask import rasterize_bitmask

    if double_sided is None:
        double_sided = jnp.ones(tri_indices.shape[0], dtype=bool)
    num_cascades = int(cascades.matrices.shape[0])
    k_proxy = min(max(int(proxy_from_cascade), 1), num_cascades)
    use_proxy = proxy is not None and k_proxy < num_cascades
    mc = cascades.canonical

    def full_setup(mat):
        if corners is not None:
            return triangle_setup_corners(
                corners, mat, resolution, resolution,
                double_sided=double_sided, tri_valid=tri_valid,
            )
        clip = transform_to_clip(positions, mat)
        return triangle_setup(
            clip, tri_indices, resolution, resolution,
            double_sided=double_sided, tri_valid=tri_valid,
        )

    setup_c = full_setup(mc)
    setup_p = (
        triangle_setup_corners(
            proxy.corners, mc, resolution, resolution,
            double_sided=proxy.tri_double_sided, tri_valid=proxy.tri_valid,
        )
        if use_proxy else None
    )

    def raster(src, mi):
        setup_i = derive_ortho_setup(src, mc, mi, resolution)
        return rasterize_bitmask(
            setup_i, resolution, resolution,
            win_h=win_h, kb=4, unroll=2,
            num_slabs=auto_slabs_binned(
                resolution, resolution, depth_only=True, win_h=win_h
            ),
            depth_only=True, affine_z=True, interpret=pallas_interpret,
        )

    new_packed = cached_packed
    new_matrices = cached_matrices

    def commit(packed_k, mi, k, pk, mk):
        pk = jax.lax.dynamic_update_slice(
            pk, packed_k[None], (k, 0, 0, 0)
        )
        mk = jax.lax.dynamic_update_slice(mk, mi[None], (k, 0, 0))
        return pk, mk

    # Cascade 0 (nearest; the most camera-sensitive) re-rasters every frame.
    m0 = cascades.matrices[0]
    new_packed, new_matrices = commit(
        pack_pcf_taps(raster(setup_c, m0)), m0, jnp.int32(0),
        new_packed, new_matrices,
    )

    # Far cascades: ``update_budget`` consecutive ids round-robin (static
    # divisor — the traced-divisor integer-div trap does not apply).
    n_far = num_cascades - 1
    b = min(max(int(update_budget), 1), n_far)
    for j in range(b):
        k = 1 + (frame_index * b + j) % n_far
        mi = jnp.take(cascades.matrices, k, axis=0)
        if not use_proxy:
            mp = raster(setup_c, mi)
        elif k_proxy == 1:
            mp = raster(setup_p, mi)
        else:
            # Geometry source is static per cascade id but the id is traced:
            # one conditional, both branches shape-(R, R). XLA executes only
            # the taken branch (real lax.cond — operands are large).
            mp = jax.lax.cond(
                k < k_proxy,
                lambda: raster(setup_c, mi),
                lambda: raster(setup_p, mi),
            )
        new_packed, new_matrices = commit(
            pack_pcf_taps(mp), mi, k, new_packed, new_matrices
        )
    return new_packed, new_matrices


def pack_pcf_taps(shadow_maps: jnp.ndarray) -> jnp.ndarray:
    """(..., R, R) depth -> (..., R, R, 2) i32 packed 2x2 PCF taps.

    Leading axes (cascade, or none) pass through; see ``_pack_pcf_taps`` for
    the layout and precision rationale. Exposed per-cascade so the staggered
    CSM path (``render_shadow_cascades_staggered``) can pack ONLY the
    cascades it re-rastered this frame and cache the packed atlas in
    TemporalState — at 2048^2 x 4 cascades the full repack is ~16.7M texels
    of elementwise work per frame for maps that did not change."""
    r = shadow_maps.shape[-1]
    pad = [(0, 0)] * (shadow_maps.ndim - 2) + [(0, 1), (0, 1)]
    p = jnp.pad(shadow_maps, pad, mode="edge")
    q = jnp.round(jnp.clip(p, 0.0, 1.0) * 65535.0).astype(jnp.int32)
    w0 = q[..., :r, :r] | (q[..., :r, 1:] << 16)
    w1 = q[..., 1:, :r] | (q[..., 1:, 1:] << 16)
    return jnp.stack([w0, w1], axis=-1)


def _pack_pcf_taps(shadow_maps: jnp.ndarray) -> jnp.ndarray:
    """(C, R, R) -> (C*R*R, 2) i32: taps [self, +x, +y, +x+y] as u16 fixed-point.

    The PCF fetch operand is LARGE (4 cascades x 1024^2 rows), and large-table
    gather cost scales with row BYTES on this TPU (tools/microbench_taa4.py);
    quantizing the four edge-clamped taps to u16 halves the row from 16 to 8
    bytes. (Session-9 trace correction: the gather measures 4.1 ms/frame even
    with 8-byte rows — at 940k lookups over a 4.2M-row operand it is
    row-LATENCY bound, not byte bound; the projected ~2 ms did not land, and
    narrower rows would not help further.) u16 depth steps
    are 1.5e-5 — the same order as sample_csm's constant bias headroom (2e-5),
    and the reference's own shadow maps are D16 (directional_light.cpp:28-44),
    so the production comparison actually MATCHES the reference's precision
    more closely than the f32 taps did."""
    return pack_pcf_taps(shadow_maps).reshape(-1, 2)


def sample_csm(
    world_position: jnp.ndarray,  # (H, W, 3)
    view_distance: jnp.ndarray,  # (H, W) positive forward distance (-view z)
    ndotl: jnp.ndarray,  # (H, W, 1)
    cascades: CascadeData,
    shadow_maps: jnp.ndarray | None,  # (C, R, R); None with packed_taps
    bias_scale,  # 0.0005 (RenderParams.shadow_bias)
    normal: jnp.ndarray | None = None,  # (H, W, 3) — enables normal-offset
    packed_taps: jnp.ndarray | None = None,  # (C, R, R, 2) i32 pre-packed atlas
) -> jnp.ndarray:
    """(H, W, 1) shadow factor in [0, 1] — sample_csm (frag:62-110) with 2x2 PCF.

    ``normal`` enables normal-offset shadows: the receiver position shifts along
    its normal by ~one cascade texel before projection. The reference leans on
    4096^2 maps + HW slope bias; at our cascade resolutions front-face self-
    shadowing (floors ARE in the maps) needs the offset to stay acne-free.

    ``packed_taps`` skips the in-frame PCF pack and samples a pre-packed atlas
    (the staggered-CSM cache in TemporalState); bit-identical to packing
    ``shadow_maps`` here since pack_pcf_taps is deterministic per cascade."""
    if packed_taps is not None:
        c, r = packed_taps.shape[0], packed_taps.shape[1]
    else:
        c, r, _ = shadow_maps.shape
    # Cascade pick: first cascade whose far plane exceeds the pixel distance.
    idx = jnp.sum(
        (view_distance[..., None] > cascades.splits[None, None, :]).astype(jnp.int32),
        axis=-1,
    )
    in_range = idx < c
    ci = jnp.minimum(idx, c - 1)

    # Per-pixel cascade transform WITHOUT gathering matrices: evaluate the (few)
    # cascades as broadcast FMAs and select by cascade index — tiny-matmul and
    # per-pixel matrix-gather formulations are both catastrophically slow on TPU.
    wx, wy, wz = (world_position[..., k] for k in range(3))
    if normal is not None:
        nl0 = jnp.clip(ndotl[..., 0], 0.0, 1.0)
        slope = jnp.sqrt(jnp.maximum(1.0 - nl0 * nl0, 0.0))
    px_ = jnp.zeros_like(wx)
    py_ = jnp.zeros_like(wx)
    pz_ = jnp.zeros_like(wx)
    for k in range(c):
        mk = cascades.matrices[k]
        sel = ci == k
        ox, oy, oz = wx, wy, wz
        if normal is not None:
            # World texel size of this cascade: |row0| = 1/radius, texel = 2r/R.
            texel = 2.0 / (jnp.linalg.norm(mk[0, :3]) * r)
            off = texel * (1.0 + 1.5 * slope)
            ox = wx + normal[..., 0] * off
            oy = wy + normal[..., 1] * off
            oz = wz + normal[..., 2] * off
        px_ = jnp.where(sel, mk[0, 0] * ox + mk[0, 1] * oy + mk[0, 2] * oz + mk[0, 3], px_)
        py_ = jnp.where(sel, mk[1, 0] * ox + mk[1, 1] * oy + mk[1, 2] * oz + mk[1, 3], py_)
        pz_ = jnp.where(sel, mk[2, 0] * ox + mk[2, 1] * oy + mk[2, 2] * oz + mk[2, 3], pz_)
    u = px_ * 0.5 + 0.5
    v = 0.5 - py_ * 0.5
    z = pz_
    inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (z > 0.0) & (z <= 1.0)

    nl = jnp.clip(ndotl[..., 0], 1e-3, 1.0)
    # Slope-scaled bias (frag:88) + a small constant term: unlike the reference's
    # hardware depth raster, our two separately-compiled evaluations of the same
    # plane can differ by 1 ULP, so NoL == 1 still needs headroom.
    bias = bias_scale * jnp.sqrt(jnp.maximum(1.0 - nl * nl, 0.0)) / nl + 2e-5
    zref = z + bias

    # 2x2 bilinear PCF (hardware sampler2DArrayShadow equivalent) via ONE gather:
    # the maps are pre-packed so channel k of texel (y, x) holds the (y + k//2,
    # x + k%2) neighbor — a screen-sized random gather costs ~27 ms on TPU
    # regardless of width, so 4 taps -> 1 packed gather saves ~80 ms/frame.
    x = u * r - 0.5
    y = v * r - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    if packed_taps is not None:
        packed = packed_taps.reshape(-1, 2)
    else:
        packed = _pack_pcf_taps(shadow_maps)  # (C*R*R, 2) i32, 4 x u16 taps
    xi = jnp.clip(x0.astype(jnp.int32), 0, r - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, r - 1)
    words = packed[ci * (r * r) + yi * r + xi]  # (H, W, 2)
    taps = jnp.stack(
        [
            words[..., 0] & 0xFFFF,
            (words[..., 0] >> 16) & 0xFFFF,
            words[..., 1] & 0xFFFF,
            (words[..., 1] >> 16) & 0xFFFF,
        ],
        axis=-1,
    ).astype(jnp.float32)
    # Reversed-Z: lit when the receiver is at least as near the sun as the
    # occluder (comparison runs in the u16 fixed-point scale of the taps).
    lit4 = (zref[..., None] * 65535.0 >= taps).astype(jnp.float32)
    lit = (
        lit4[..., 0] * (1 - fx) * (1 - fy)
        + lit4[..., 1] * fx * (1 - fy)
        + lit4[..., 2] * (1 - fx) * fy
        + lit4[..., 3] * fx * fy
    )
    shadow = jnp.where(inside & in_range, lit, 1.0)
    return shadow[..., None]
