"""The frame function — SceneRenderer::render() as one jitted XLA program.

Phase sequence mirrors scene_renderer.cpp:121-470:

    culling -> depth prepass -> visibility (gbuffer) -> [GI pre]
    -> shadows -> lighting (sun + GI + emissive + sky) -> AO -> [AA] -> bloom
    -> tonemap composite -> u8 image

but with zero barriers/graphs: data dependencies ARE the schedule. Temporal state
(TAA history, previous depth for HiZ, LPV volumes) is threaded functionally.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from androidrenderer_tpu.camera import ViewData
from androidrenderer_tpu.config import (
    AOMode, AAMode, GIMode, RasterBackend, RenderConfig, RenderParams, ShadowMode,
)
from androidrenderer_tpu.ops import bloom as bloom_ops
from androidrenderer_tpu.ops import lpv as lpv_ops
from androidrenderer_tpu.ops import probes as probe_ops
from androidrenderer_tpu.ops import culling, lighting, post, sky
from androidrenderer_tpu.ops import taa as taa_ops
from androidrenderer_tpu.ops.rt import effects as rt_effects
from androidrenderer_tpu.ops import shadow as shadow_ops
from androidrenderer_tpu.ops.gbuffer import GBuffer, resolve_gbuffer
from androidrenderer_tpu.ops.raster import (
    rasterize_depth,
    rasterize_visibility,
    transform_to_clip,
    triangle_setup,
    triangle_setup_corners,
)
from androidrenderer_tpu.ops.raster.binning import bin_triangles
from androidrenderer_tpu.ops.raster.masked import rasterize_masked_peeled
from androidrenderer_tpu.ops.raster.raster_binned import (
    auto_slabs_binned, rasterize_binned,
)
from androidrenderer_tpu.ops.raster.raster_fused import (
    auto_slabs, rasterize_fused, rasterize_hybrid,
)
from androidrenderer_tpu.render.temporal import TemporalState
from androidrenderer_tpu.scene.scene import SceneArrays


class FrameOutputs(NamedTuple):
    image: jnp.ndarray  # (H, W, 3) u8 display-ready
    hdr: jnp.ndarray  # (H, W, 3) f32 lit scene (pre-tonemap)
    depth: jnp.ndarray  # (H, W) f32
    visibility: jnp.ndarray  # (H, W) i32
    gbuffer: GBuffer
    # CSM cascade data as computed INSIDE this frame (None when shadows != CSM):
    # fp32 texel snapping makes the in-jit fit differ from an eager refit by up
    # to one shadow texel, so parity harnesses must consume these, not recompute.
    csm: object = None
    # (H, W, 2) uv-space reprojection motion (None unless TAA ran) — the flow
    # field frame interpolation consumes (ops/interpolation.py, the FSR3
    # frame-generation analog).
    motion: object = None
    # () i32 contrast quads dropped past vrsaa_budget this frame (None unless
    # VRSAA ran) — the worklist's true overflow count, never silently capped.
    vrsaa_dropped: object = None


def _half_grid(a: jnp.ndarray) -> jnp.ndarray:
    """a[::2, ::2] as two single-axis strided slices — the fused 2-d strided
    slice relayouts lanes AND sublanes in one op and costs ~5x more on TPU
    (tools/microbench_stride.py: 9.7 vs 1.8 ms for the half-rate GI inputs)."""
    return a[::2][:, ::2]


def render_frame(
    scene: SceneArrays,
    view: ViewData,
    params: RenderParams,
    temporal: TemporalState,
    config: RenderConfig,
    band_height: int | None = None,
    row_offset: jnp.ndarray | int = 0,
    axis_name: str | None = None,
):
    """Pure frame function: returns (FrameOutputs, next TemporalState).

    ``band_height``/``row_offset`` render a horizontal screen band — the multi-chip
    screen-sharding entry (parallel/mesh.py). With ``axis_name`` set (called inside
    that shard_map) the FULL pipeline runs sharded: cross-band neighborhoods come
    from ppermute row halos (SSAO, TAA clamp), full-frame passes (TAA history
    fetch, bloom, upscale) all_gather over ICI, and the temporal visibility list
    is OR-reduced across bands. Without it, band rendering is the legacy
    raster+shade-only path."""
    h = band_height or config.render_height
    w = config.render_width
    tiles_y = h // config.tile_height
    tile_row_offset = row_offset // config.tile_height if band_height else 0
    # Band rendering with collectives available => every feature runs.
    full_features = band_height is None or axis_name is not None
    if axis_name is not None:
        from androidrenderer_tpu.parallel import collectives as coll

    # --- culling (depth_culling_phase.cpp analog) --------------------------------
    # Frustum culling runs at TRIANGLE grain directly on the baked corner table
    # (dense separating-plane test, output-identical) — the primitive-mask
    # gather it replaces cost ~2.9 ms/frame at bench scale. The primitive mask
    # is still computed for the two-phase HiZ occlusion path (sphere tests +
    # the temporal visibility list are per-primitive, like the reference's).
    tri_mask = culling.frustum_cull_triangles(
        scene.tri_corner_pos, jnp.asarray(view.view), jnp.asarray(view.frustum),
        view.z_near, scene.tri_valid,
    )
    if config.occlusion_culling and full_features:
        prim_mask = culling.frustum_cull_spheres(
            scene.prim_bounds, jnp.asarray(view.view), jnp.asarray(view.frustum),
            view.z_near,
        )
        prim_mask = prim_mask & scene.prim_valid

    p00 = view.projection[0, 0]
    p11 = view.projection[1, 1]

    # --- geometry: transform + setup + bin (the "GPU-driven" pipe) ----------------
    # Setup is computed against the FULL frame (AABBs live in global pixel space and
    # are identical on every device under screen sharding — replicated work, tiny).
    # The baked corner table makes it gather-free (bit-identical to the
    # positions/tri_indices path; session-5: 6 gathers here cost ~28 ms/frame).
    setup = triangle_setup_corners(
        scene.tri_corner_pos,
        jnp.asarray(view.view_proj),
        w,
        config.render_height,
        double_sided=scene.tri_double_sided,
        tri_valid=tri_mask,
    )
    # Alpha-tested (masked) and translucent (blend) geometry rasterize separately;
    # the opaque pass excludes them (material_pipelines' masked/translucent variants).
    is_masked = scene.tri_alpha_mode == 1
    is_blend = scene.tri_alpha_mode == 2
    use_pallas = (
        config.raster_backend == RasterBackend.PALLAS
        and band_height is None
        and (jax.default_backend() == "tpu" or config.pallas_interpret)
    )
    # With in-kernel alpha bitmaps (TPU path), masked triangles rasterize IN
    # the main pass — one Phase A scan, one Mosaic instance, no merge.
    bitmap_alpha = config.alpha_masking and config.alpha_bitmap and use_pallas
    drop = jnp.zeros_like(setup.valid)
    if config.alpha_masking and not bitmap_alpha:
        drop = drop | is_masked
    # BLEND primitives never rasterize in the opaque pass — the reference
    # classifies them into translucent_primitives (render_scene.cpp:57-69),
    # which its solid/masked passes exclude. (Its draw_transparent helper has
    # NO call sites — the reference's shipped frame never draws them at all;
    # config.translucency adds our peel composite on top, docs/PARITY.md.)
    drop = drop | is_blend
    setup_opaque = setup._replace(valid=setup.valid & ~drop)

    # --- depth prepass + visibility buffer ----------------------------------------
    # The Pallas kernel is the production path; band rendering (multi-chip screen
    # sharding) and the CPU test path use the XLA reduction rasterizer.
    def _raster_full(su):
        if use_pallas:
            # Window-binned kernel, 32-row windows (round 3): 65.4 vs 69.3 ms
            # standalone against the fused kernel at bench scale, and ~2x
            # faster to Mosaic-compile. raster_fused stays as the fallback
            # (tools/bench_raster.py compares them).
            if config.raster_bitmask:
                from androidrenderer_tpu.ops.raster.raster_bitmask import (
                    rasterize_bitmask,
                )

                return rasterize_bitmask(
                    su, h, w, win_h=32, kb=8, unroll=2,
                    num_slabs=auto_slabs_binned(h, w, win_h=32),
                    interpret=config.pallas_interpret,
                    alpha_grid=scene.tri_alpha_grid if bitmap_alpha else None,
                )
            return rasterize_binned(
                su, h, w, win_h=32, cap=14, kb=8, unroll=2,
                num_slabs=auto_slabs_binned(h, w, win_h=32),
                pa_unroll=config.raster_pa_unroll,
                interpret=config.pallas_interpret,
                alpha_grid=scene.tri_alpha_grid if bitmap_alpha else None,
            )
        bins = bin_triangles(
            su, tiles_y, config.tiles_x, config.tile_height, config.tile_width,
            cap=config.max_tris_per_tile, tile_row_offset=tile_row_offset,
        )
        d = rasterize_depth(
            su, bins, h, w, config.tile_height, config.tile_width,
            row_offset=row_offset,
        )
        v = rasterize_visibility(
            su, bins, d, config.tile_height, config.tile_width,
            row_offset=row_offset,
        )
        return d, v

    if config.debug_stub_raster:
        # Profiling stub: pseudo-random visibility ids (realistic random-gather
        # behavior downstream) + analytic depth; no raster/binning runs at all.
        n_tri = scene.tri_indices.shape[0]
        m = 1
        while m * 2 <= n_tri:
            m *= 2
        yy = jnp.arange(h, dtype=jnp.int32)[:, None]
        xx = jnp.arange(w, dtype=jnp.int32)[None, :]
        vis = (yy * 7919 + xx * 104729) & (m - 1)
        depth = 0.05 + 0.9 * jnp.abs(jnp.sin(
            (yy * 0.013 + xx * 0.007).astype(jnp.float32)
        ))
    elif config.occlusion_culling and full_features:
        # Two-phase HiZ occlusion culling (depth_culling_phase.cpp:182-241):
        # 1) draw last-frame-visible, 2) build the HiZ pyramid from that depth,
        # 3) re-test everything, 4) draw the newly visible, merge (max — exact).
        np_ = scene.prim_bounds.shape[0]
        prev_vis = temporal.prev_visible_prims[:np_]
        phase1 = prim_mask & prev_vis
        tri_p1 = culling.primitive_mask_to_triangle_mask(
            phase1, scene.tri_primitive, scene.tri_valid
        )
        depth, vis = _raster_full(setup_opaque._replace(valid=setup_opaque.valid & tri_p1))

        # Band mode builds the pyramid from band rows only — levels limited by
        # band divisibility; spheres are tested against this band's rows.
        n_levels = config.hiz_levels
        hh = h
        while n_levels > 1 and (hh % (1 << (n_levels - 1)) or w % (1 << (n_levels - 1))):
            n_levels -= 1
        hiz = culling.build_hiz_pyramid(depth, n_levels)
        not_occluded = culling.occlusion_cull_spheres(
            scene.prim_bounds, jnp.asarray(view.view), view.z_near, p00, p11, hiz,
            row_offset=row_offset,
            full_height=config.render_height if band_height else None,
        )
        visible_now = prim_mask & not_occluded
        newly = visible_now & ~phase1
        tri_new = culling.primitive_mask_to_triangle_mask(
            newly, scene.tri_primitive, scene.tri_valid
        )
        d2, v2 = _raster_full(setup_opaque._replace(valid=setup_opaque.valid & tri_new))
        vis = jnp.where(d2 > depth, v2, vis)
        depth = jnp.maximum(depth, d2)
        if axis_name is not None:
            # Temporal visibility = union over bands (replicated next frame).
            visible_now = coll.any_across(visible_now, axis_name)
        temporal = temporal._replace(
            prev_visible_prims=temporal.prev_visible_prims.at[:np_].set(visible_now)
        )
    else:
        depth, vis = _raster_full(setup_opaque)

    if config.alpha_masking and not bitmap_alpha:
        setup_m = setup._replace(valid=setup.valid & is_masked)
        depth, vis = rasterize_masked_peeled(
            scene, setup_m, depth, vis, config.tile_height, config.tile_width,
            cap=config.max_tris_per_tile, layers=config.alpha_peel_layers,
            row_offset=row_offset,
            use_pallas=use_pallas, pallas_interpret=config.pallas_interpret,
        )

    # --- gbuffer resolve ------------------------------------------------------------
    flags = dict(
        use_base_textures=config.use_base_textures,
        use_normal_maps=config.use_normal_maps,
        use_mr_textures=config.use_mr_textures,
        use_emission=config.use_emission,
    )
    vrsaa = config.aa_mode == AAMode.VRSAA
    if vrsaa:
        # VRSAA (sampling_rate_calculator.cpp analog, ops/vrsaa.py): geometry
        # rasterized at 2x output res; shading runs on quad top-left samples
        # (native rate); a fine pass below re-shades contrast quads' extra
        # samples. All screen passes from here run on the coarse grid.
        if config.translucency:
            raise ValueError("VRSAA + translucency unsupported (peel at 2x res)")
        if (config.render_width != 2 * config.output_width
                or config.render_height != 2 * config.output_height):
            raise ValueError("VRSAA needs render resolution == 2x output resolution")
        from androidrenderer_tpu.ops import vrsaa as vrsaa_ops
        from androidrenderer_tpu.ops.gbuffer import pack_attribute_planes

        vis_ss, depth_ss = vis, depth
        row_offset_ss = row_offset
        h, w = h // 2, w // 2
        row_offset = row_offset_ss // 2
        vis = _half_grid(vis_ss)
        depth = _half_grid(depth_ss)
        attr_planes = pack_attribute_planes(scene, setup)
        px_g = jnp.broadcast_to(
            (jnp.arange(w, dtype=jnp.float32) * 2.0)[None, :], (h, w)
        )
        py_g = (jnp.arange(h, dtype=jnp.float32) * 2.0)[:, None] + row_offset_ss
        py_g = jnp.broadcast_to(py_g, (h, w))
        gbuf = resolve_gbuffer(
            scene, setup, vis, depth, attr_planes=attr_planes,
            pixel_coords=(px_g, py_g), **flags,
        )
    elif config.debug_stub_resolve:
        # Profiling stub: shape-identical GBuffer from elementwise math only —
        # no attribute-plane pack, no plane gather, no texture sampling.
        zz = depth[..., None]
        xyz = jnp.concatenate(
            [zz * 3.0, zz * zz, jnp.cos(zz)], axis=-1
        )
        one = jnp.ones((h, w, 1), jnp.float32)
        gbuf = GBuffer(
            base_color=jnp.abs(jnp.sin(xyz)),
            normal=xyz / jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True) + 1e-6),
            roughness=0.5 * one,
            metalness=0.1 * one,
            emission=jnp.zeros((h, w, 3), jnp.float32),
            world_position=xyz * 4.0,
            depth=depth,
            valid=vis >= 0,
        )
    else:
        gbuf = resolve_gbuffer(
            scene, setup, vis, depth, row_offset=row_offset, **flags,
            debug_gather_only=config.debug_resolve_gather_only,
        )
    if config.gbuffer_barrier:
        gbuf = GBuffer(*jax.lax.optimization_barrier(tuple(gbuf)))

    # --- sky ------------------------------------------------------------------------
    if config.sky:
        sky_img = sky.sky_background(
            jnp.asarray(view.inverse_view), p00, p11,
            scene.sun_direction, scene.sun_color, h, w,
            exposure=params.sun_exposure,
            row_offset=row_offset,
            full_height=config.render_height // (2 if vrsaa else 1),
        )
    else:
        sky_img = jnp.zeros((h, w, 3), jnp.float32)

    # --- shadows: in-jit cascade fit + batched depth raster + PCF --------------------
    if config.shadow_mode == ShadowMode.CSM:
        cascades = shadow_ops.fit_cascades(
            jnp.asarray(view.inverse_view), p00, p11, scene.sun_direction,
            config.num_shadow_cascades, config.shadow_cascade_resolution,
            config.z_near, config.shadow_max_distance,
            config.shadow_cascade_split_lambda,
        )
        csm_stagger = (
            0 < config.shadow_update_budget < config.num_shadow_cascades
            and use_pallas and config.raster_bitmask
        )
        if csm_stagger:
            want = (
                config.num_shadow_cascades,
                config.shadow_cascade_resolution,
                config.shadow_cascade_resolution, 2,
            )
            if temporal.csm_packed.shape != want:
                raise ValueError(
                    f"TemporalState.csm_packed {temporal.csm_packed.shape} != "
                    f"{want}: initial_temporal_state must be sized with "
                    "shadow_cascades/shadow_resolution from this config when "
                    "shadow_update_budget > 0"
                )
            csm_packed, csm_matrices = shadow_ops.render_shadow_cascades_staggered(
                scene.positions, scene.tri_indices, scene.tri_valid, cascades,
                config.shadow_cascade_resolution,
                temporal.csm_packed, temporal.csm_matrices,
                temporal.frame_index,
                update_budget=config.shadow_update_budget,
                pallas_interpret=config.pallas_interpret,
                double_sided=scene.tri_double_sided,
                proxy=scene.proxy,
                proxy_from_cascade=config.shadow_proxy_from_cascade,
                corners=scene.tri_corner_pos,
                win_h=config.shadow_win_h,
            )
            temporal = temporal._replace(
                csm_packed=csm_packed, csm_matrices=csm_matrices
            )
            # Sampling (and FrameOutputs.csm) consume the EFFECTIVE matrices —
            # each cascade pairs with the matrix its cached map was built with.
            cascades = cascades._replace(matrices=csm_matrices)
            shadow_maps = None
        elif (
            axis_name is not None
            and config.raster_bitmask
            and (jax.default_backend() == "tpu" or config.pallas_interpret)
        ):
            # Multi-chip: divide the independent per-cascade rasters across
            # the mesh axis and psum-assemble (VERDICT r4 item 6) — cascade
            # raster work per device drops by ~n while staying bit-exact
            # (the band path otherwise replicates all C rasters per device).
            shadow_maps = shadow_ops.render_shadow_cascades_sharded(
                scene.positions, scene.tri_indices, scene.tri_valid, cascades,
                config.shadow_cascade_resolution,
                axis_name=axis_name,
                pallas_interpret=config.pallas_interpret,
                double_sided=scene.tri_double_sided,
                proxy=scene.proxy,
                proxy_from_cascade=config.shadow_proxy_from_cascade,
                corners=scene.tri_corner_pos,
                win_h=config.shadow_win_h,
            )
        else:
            shadow_maps = shadow_ops.render_shadow_cascades(
                scene.positions, scene.tri_indices, scene.tri_valid, cascades,
                config.shadow_cascade_resolution,
                cap=config.max_tris_per_tile,
                use_pallas=use_pallas, pallas_interpret=config.pallas_interpret,
                double_sided=scene.tri_double_sided,
                proxy=scene.proxy,
                proxy_from_cascade=config.shadow_proxy_from_cascade,
                pa_unroll=config.raster_pa_unroll,
                use_bitmask=config.raster_bitmask,
                corners=scene.tri_corner_pos,
                win_h=config.shadow_win_h,
            )
        l = -scene.sun_direction / jnp.linalg.norm(scene.sun_direction)
        ndotl = jnp.clip(
            jnp.sum(gbuf.normal * l[None, None, :], axis=-1, keepdims=True), 0.0, 1.0
        )
        view_distance = jnp.where(
            depth > 0.0, view.z_near / jnp.maximum(depth, 1e-12), 0.0
        )
        if config.debug_stub_shadow_sample:
            # Profiling stub: keep the cascade rasters (the Pallas calls are
            # opaque to DCE — consuming one texel keeps them) but skip the
            # PCF pack + sample entirely.
            keep = (
                temporal.csm_packed[0, 0, 0, 0].astype(jnp.float32)
                if csm_stagger else shadow_maps[0, 0, 0]
            )
            shadow = jnp.ones((h, w, 1), jnp.float32) * (1.0 + 0.0 * keep)
        else:
            shadow = shadow_ops.sample_csm(
                gbuf.world_position, view_distance, ndotl, cascades, shadow_maps,
                params.shadow_bias, normal=gbuf.normal,
                packed_taps=temporal.csm_packed if csm_stagger else None,
            )
    elif config.shadow_mode == ShadowMode.RT and full_features:
        # Ray-traced sun shadows (directional_light.cpp:372-422).
        shadow = rt_effects.rt_sun_shadows(
            scene.bvh, gbuf.world_position, gbuf.normal, gbuf.valid,
            scene.sun_direction, scene.sun_angular_size, temporal.frame_index,
            row_offset=row_offset,
            scene=scene, masked=config.alpha_masking,
        )
    else:
        shadow = None

    # --- AO (ambient_occlusion_phase.cpp: Off / CACAO-like SSAO / RTAO) ---------------
    if config.ao_mode == AOMode.RT and full_features:
        ao = rt_effects.rtao(
            scene.bvh, gbuf.world_position, gbuf.normal, gbuf.valid,
            config.rtao_num_samples, params.rtao_max_distance, temporal.frame_index,
            row_offset=row_offset,
            scene=scene, masked=config.alpha_masking,
        )
    elif config.ao_mode == AOMode.SSAO:
        # Half-rate shading (config.half_rate_gi): SSAO runs on the [::2, ::2]
        # grid and reconstructs with a joint bilateral 2x upsample — the CACAO
        # multi-res/VRS-coarse-rate analog (ambient_occlusion_phase.cpp:191-355,
        # sampling_rate_calculator.cpp:26-124). Band sharding subsamples rows
        # identically (band heights stay even), so sharded output remains
        # bit-identical to the single-device frame.
        half_gi = config.half_rate_gi and not vrsaa and h % 2 == 0 and w % 2 == 0
        sub = (
            _half_grid if half_gi else (lambda a: a)
        )
        wp_h, n_h, v_h, dep_s = (
            sub(gbuf.world_position), sub(gbuf.normal), sub(gbuf.valid), sub(depth)
        )
        grid_div = (2 if half_gi else 1)
        fh_grid = (config.render_height // (2 if vrsaa else 1)) // grid_div
        if axis_name is not None:
            # SSAO taps reach +-9 rows and the bilateral blur +-2 (on its own
            # grid); halo-extend with edge semantics — out-of-frame taps are
            # masked by the global row coordinates (de-wrapped CACAO taps).
            halo = 11
            gb_h = gbuf._replace(
                world_position=coll.row_halo(wp_h, halo, axis_name, wrap=False),
                normal=coll.row_halo(n_h, halo, axis_name, wrap=False),
                valid=coll.row_halo(v_h, halo, axis_name, wrap=False),
                depth=coll.row_halo(dep_s, halo, axis_name, wrap=False),
            )
            ao = lighting.ssao(
                gb_h, jnp.asarray(view.position), view.z_near,
                radius=params.ssao_radius, bias=params.ssao_bias,
                intensity=params.ssao_intensity,
                row0=row_offset // grid_div - halo, full_height=fh_grid,
            )[halo:-halo]
        else:
            gb_h = gbuf._replace(
                world_position=wp_h, normal=n_h, valid=v_h, depth=dep_s
            )
            ao = lighting.ssao(
                gb_h, jnp.asarray(view.position), view.z_near,
                radius=params.ssao_radius, bias=params.ssao_bias,
                intensity=params.ssao_intensity,
                row0=0, full_height=fh_grid,
            )
        if half_gi:
            from androidrenderer_tpu.ops.upsample import bilateral_upsample_2x

            d_h = sub(depth)
            if axis_name is not None:
                ao = bilateral_upsample_2x(
                    coll.row_halo(ao, 1, axis_name, wrap=False),
                    coll.row_halo(d_h, 1, axis_name, wrap=False),
                    coll.row_halo(n_h, 1, axis_name, wrap=False),
                    depth, gbuf.normal, row_halo=1,
                )
            else:
                ao = bilateral_upsample_2x(ao, d_h, n_h, depth, gbuf.normal)
    else:
        ao = None

    # --- GI: LPV (pre/post-render slices, gi/light_propagation_volume.cpp) -----------
    if config.gi_mode == GIMode.LPV and full_features:
        def _gi_raster(setup_, hh, ww):
            if config.debug_stub_rsm:
                # Profiling stub: analytic depth + pseudo-random visibility in
                # place of the RSM raster (downstream injection still runs).
                n_tri = scene.tri_indices.shape[0]
                m = 1
                while m * 2 <= n_tri:
                    m *= 2
                yy = jnp.arange(hh, dtype=jnp.int32)[:, None]
                xx = jnp.arange(ww, dtype=jnp.int32)[None, :]
                v_ = (yy * 7919 + xx * 104729) & (m - 1)
                d_ = 0.05 + 0.9 * jnp.abs(
                    jnp.sin((yy * 0.013 + xx * 0.007).astype(jnp.float32))
                )
                return d_, v_
            if use_pallas and ww % 128 == 0:
                # Window-binned kernel. Negative results here (round 3): the
                # splat+kernel hybrid measured 39.4 vs 39.8 ms but costs a 393 s
                # Mosaic compile — at RSM scale only 15% of live triangles are
                # single-pixel (median bbox 3 px), so the scalar Phase A scan
                # (~20 ms/cascade) remains either way. The 4 RSM rasters are
                # ~100 of the ~153 ms LPV delta; propagation itself is ~12 ms.
                if config.raster_bitmask:
                    from androidrenderer_tpu.ops.raster.raster_bitmask import (
                        rasterize_bitmask,
                    )

                    return rasterize_bitmask(
                        setup_, hh, ww, win_h=16,
                        num_slabs=auto_slabs_binned(hh, ww, win_h=16),
                        interpret=config.pallas_interpret,
                    )
                return rasterize_binned(
                    setup_, hh, ww, win_h=16, cap=64,
                    num_slabs=auto_slabs_binned(hh, ww, win_h=16),
                    pa_unroll=config.raster_pa_unroll,
                    interpret=config.pallas_interpret,
                )
            th, tw = min(32, hh), min(128, ww)
            bins_ = bin_triangles(
                setup_, hh // th, ww // tw, th, tw, cap=config.max_tris_per_tile
            )
            d_ = rasterize_depth(setup_, bins_, hh, ww, th, tw)
            v_ = rasterize_visibility(setup_, bins_, d_, th, tw)
            return d_, v_

        inv_view = jnp.asarray(view.inverse_view)
        cam_forward = -inv_view[:3, 2]
        # Scene-view depth surfels for the geometry volume (every 8th pixel; the
        # GV is 32^3 per cascade so this is still ~10x denser than its cells).
        # Split single-axis strided slices (same rule as _half_grid): the fused
        # 2-d strided slice relayouts lanes and sublanes in one op (~0.4 ms for
        # these three in the parity trace).
        sv = (
            gbuf.world_position[::8][:, ::8].reshape(-1, 3),
            gbuf.normal[::8][:, ::8].reshape(-1, 3),
            gbuf.valid[::8][:, ::8].reshape(-1),
        )
        if axis_name is not None:
            # The GV build must see the SAME surfel set on every device (LPV is
            # replicated); gather the ~1 MB subsampled set over ICI. Max-combine
            # injection is order-independent, so band order is fine.
            sv = tuple(coll.gather_rows(x, axis_name) for x in sv)
        # RSM rasters are scalar-Phase-A (per-triangle) bound and their 128^2
        # texels are meters wide — rasterize the vertex-clustered proxy there
        # (scene/proxy.py; ~8-10x fewer triangles, flux/normal detail below a
        # texel either way). Documented divergence from the reference's full-
        # geometry RSM pass (light_propagation_volume.cpp:548-617).
        if config.rsm_proxy:
            from androidrenderer_tpu.scene.proxy import swap_in_proxy

            gi_scene = swap_in_proxy(scene)
        else:
            gi_scene = scene
        if 0 < config.lpv_update_budget < config.lpv_num_cascades:
            # Round-robin cascade rebuilds against cached volumes (the
            # irradiance-cache budget pattern applied to LPV; exact rebuild of
            # every cascade when lpv_update_budget == 0 — docs/PARITY.md).
            want = (config.lpv_num_cascades, 3, 4) + (config.lpv_resolution,) * 3
            if temporal.lpv.radiance.shape != want:
                raise ValueError(
                    f"TemporalState.lpv radiance {temporal.lpv.radiance.shape} != "
                    f"{want}: initial_temporal_state must be sized with "
                    "lpv_cascades/lpv_resolution from this config when "
                    "lpv_update_budget > 0 (a smaller cached volume would "
                    "silently dynamic_update_slice into a corner)"
                )
            volumes = lpv_ops.update_lpv_staggered(
                gi_scene, jnp.asarray(view.position), cam_forward, _gi_raster,
                temporal.lpv, temporal.frame_index,
                config.lpv_num_cascades, config.lpv_resolution,
                config.lpv_cell_size, config.lpv_rsm_resolution,
                config.lpv_num_propagation_steps,
                config.lpv_behind_camera_percent,
                scene_view_surfels=sv, use_base_textures=config.use_base_textures,
                update_budget=config.lpv_update_budget,
            )
            temporal = temporal._replace(lpv=volumes)
        else:
            volumes = lpv_ops.build_lpv(
                gi_scene, jnp.asarray(view.position), cam_forward, _gi_raster,
                config.lpv_num_cascades, config.lpv_resolution, config.lpv_cell_size,
                config.lpv_rsm_resolution, config.lpv_num_propagation_steps,
                config.lpv_behind_camera_percent,
                scene_view_surfels=sv, use_base_textures=config.use_base_textures,
            )
        half_gi = config.half_rate_gi and not vrsaa and h % 2 == 0 and w % 2 == 0
        if config.debug_stub_lpv_apply:
            # Profiling stub: keep the full volume build (consume one texel so
            # the build survives DCE) but skip the screen-space apply/upsample.
            gi = gbuf.base_color * (0.1 + 0.0 * volumes.radiance[0, 0, 0, 0, 0, 0])
        elif half_gi:
            # Half-rate LPV apply (VRS coarse-rate analog): fetch+evaluate the
            # SH volume on the [::2, ::2] grid with unit albedo, bilaterally
            # upsample the irradiance, then modulate by FULL-res base color so
            # texture detail stays sharp.
            from androidrenderer_tpu.ops.upsample import bilateral_upsample_2x

            wp_h = _half_grid(gbuf.world_position)
            n_h = _half_grid(gbuf.normal)
            irr_h = lpv_ops.apply_lpv(
                volumes, wp_h, n_h,
                jnp.ones_like(wp_h), _half_grid(gbuf.valid),
                params.lpv_exposure * params.sun_exposure,
            )
            d_h = _half_grid(depth)
            if axis_name is not None:
                irr = bilateral_upsample_2x(
                    coll.row_halo(irr_h, 1, axis_name, wrap=False),
                    coll.row_halo(d_h, 1, axis_name, wrap=False),
                    coll.row_halo(n_h, 1, axis_name, wrap=False),
                    depth, gbuf.normal, row_halo=1,
                )
            else:
                irr = bilateral_upsample_2x(irr_h, d_h, n_h, depth, gbuf.normal)
            gi = irr * gbuf.base_color
        else:
            gi = lpv_ops.apply_lpv(
                volumes, gbuf.world_position, gbuf.normal, gbuf.base_color,
                gbuf.valid, params.lpv_exposure * params.sun_exposure,
            )
    elif config.gi_mode == GIMode.PROBES and full_features:
        # DDGI-style budgeted probe cache (irradiance_cache.cpp:496-724).
        probes = probe_ops.update_probes(
            temporal.probes, scene.bvh, scene, jnp.asarray(view.position),
            config.probe_grid, config.probe_spacing, config.probe_budget,
            config.probe_rays, temporal.frame_index, params.sun_exposure,
            masked=config.alpha_masking, use_textures=config.use_base_textures,
            hysteresis=params.probe_hysteresis,
            spacing_ladder=config.probe_spacing_ladder,
            # Multi-chip: cascade updates divide across the mesh axis and
            # psum-combine (bit-identical; probes.update_probes docstring).
            axis_name=axis_name,
        )
        half_gi = config.half_rate_gi and not vrsaa and h % 2 == 0 and w % 2 == 0
        if half_gi:
            # Half-rate probe sampling + joint-bilateral 2x reconstruction
            # (the same VRS-coarse-rate policy as the LPV/SSAO paths): probe
            # irradiance is low-frequency, and the sampler's screen-sized
            # gathers are its dominant cost (18 per frame after the round-5
            # cascade-pair/corner-pack restructure).
            from androidrenderer_tpu.ops.upsample import bilateral_upsample_2x

            wp_h = _half_grid(gbuf.world_position)
            n_h = _half_grid(gbuf.normal)
            irr_h = probe_ops.sample_probes(
                probes, wp_h, n_h, _half_grid(gbuf.valid),
                jnp.asarray(view.position), config.probe_grid,
                config.probe_spacing,
                spacing_ladder=config.probe_spacing_ladder,
            )
            d_h = _half_grid(depth)
            if axis_name is not None:
                irr = bilateral_upsample_2x(
                    coll.row_halo(irr_h, 1, axis_name, wrap=False),
                    coll.row_halo(d_h, 1, axis_name, wrap=False),
                    coll.row_halo(n_h, 1, axis_name, wrap=False),
                    depth, gbuf.normal, row_halo=1,
                )
            else:
                irr = bilateral_upsample_2x(irr_h, d_h, n_h, depth, gbuf.normal)
        else:
            irr = probe_ops.sample_probes(
                probes, gbuf.world_position, gbuf.normal, gbuf.valid,
                jnp.asarray(view.position), config.probe_grid,
                config.probe_spacing,
                spacing_ladder=config.probe_spacing_ladder,
            )
        gi = irr * gbuf.base_color
        temporal = temporal._replace(probes=probes)
    elif config.gi_mode == GIMode.RT and full_features:
        # Per-pixel RTGI (gi/rtgi.cpp:69-139; bounce count = r.GI.RT.Bounces).
        irr = rt_effects.rtgi(
            scene.bvh, scene, gbuf.world_position, gbuf.normal, gbuf.valid,
            jnp.asarray(view.inverse_view), p00, p11, temporal.frame_index,
            params.rtgi_exposure, params.sun_exposure,
            num_bounces=config.rtgi_num_bounces, row_offset=row_offset,
            masked=config.alpha_masking, use_textures=config.use_base_textures,
        )
        # Screen-space reconstruction of the 1-spp signal (rtgi overlay filter),
        # then TAA-style temporal accumulation of the pre-albedo irradiance (the
        # vendor-denoiser slot; ops/denoise.py).
        from androidrenderer_tpu.ops.denoise import atrous_filter, temporal_accumulate

        irr = atrous_filter(
            irr, depth, gbuf.normal, gbuf.valid,
            sigma_z=params.atrous_sigma_z, sigma_n=params.atrous_sigma_n,
        )
        if not vrsaa:  # VRSAA shades at coarse res; history shapes do not match
            mv_gi = taa_ops.motion_vectors(
                gbuf.world_position, gbuf.valid,
                jnp.asarray(view.last_view_proj),
                jnp.asarray(view.unjittered_view_proj),
            )
            if axis_name is not None:
                gi_hist = coll.gather_rows(temporal.rtgi_history, axis_name)
                irr_halo = coll.row_halo(irr, 1, axis_name, wrap=False)
            else:
                gi_hist = temporal.rtgi_history
                irr_halo = None
            irr, new_gi_hist = temporal_accumulate(
                irr, gi_hist, temporal.rtgi_valid, mv_gi,
                row_offset=row_offset, signal_halo=irr_halo,
            )
            temporal = temporal._replace(
                rtgi_history=new_gi_hist, rtgi_valid=jnp.array(True)
            )
        gi = irr * gbuf.base_color
    else:
        gi = None

    # --- lighting ---------------------------------------------------------------------
    direct = lighting.sun_lighting(
        gbuf,
        jnp.asarray(view.position),
        scene.sun_direction,
        scene.sun_color,
        shadow,
        params.sun_exposure,
    )
    lit = lighting.compose_lit_scene(gbuf, direct, gi=gi, ao=ao, sky=sky_img)

    # --- translucency: depth-peeled BLEND layers, back-to-front composite ------------
    if config.translucency:
        from androidrenderer_tpu.ops.raster.masked import _sample_alpha
        from androidrenderer_tpu.ops.raster.raster_bitmask import (
            rasterize_bitmask,
        )
        from androidrenderer_tpu.ops.raster.raster_xla import (
            rasterize_depth as _rd, rasterize_visibility as _rv,
        )

        setup_b = setup._replace(valid=setup.valid & is_blend)
        if not use_pallas:
            bins_b = bin_triangles(
                setup_b, tiles_y, config.tiles_x, config.tile_height,
                config.tile_width,
                cap=config.max_tris_per_tile, tile_row_offset=tile_row_offset,
            )
        z_lim = jnp.full((h, w), jnp.inf, jnp.float32)
        layers = []
        for layer_i in range(config.translucent_layers):
            if use_pallas:
                # Same Pallas z_limit peeling as the masked path — the XLA
                # reduction raster costs seconds/layer at 1080p. The BITMASK
                # kernel (not binned): blend triangles are a few % of the
                # scene, and its dead-chunk skipping makes each layer's scan
                # cost ~touches, not ~total slots (with_z_limit=True sizing:
                # the layer-0 binned call at native 1088x1920 measured 16.21M
                # scoped vmem with the 2-slab depth+vis budget).
                d_t, v_t = rasterize_bitmask(
                    setup_b, h, w, win_h=32, kb=4, unroll=2,
                    num_slabs=auto_slabs_binned(
                        h, w, win_h=32, with_z_limit=True
                    ),
                    interpret=config.pallas_interpret,
                    z_limit=None if layer_i == 0 else z_lim,
                )
            else:
                d_t = _rd(setup_b, bins_b, h, w, config.tile_height,
                          config.tile_width, row_offset=row_offset, z_limit=z_lim)
                v_t = _rv(setup_b, bins_b, d_t, config.tile_height,
                          config.tile_width, row_offset=row_offset, z_limit=z_lim)
            gb_t = resolve_gbuffer(
                scene, setup_b, v_t, d_t, row_offset=row_offset,
                use_base_textures=config.use_base_textures,
                use_normal_maps=config.use_normal_maps,
                use_mr_textures=config.use_mr_textures,
                use_emission=config.use_emission,
            )
            alpha_t, _ = _sample_alpha(scene, setup_b, v_t, row_offset)
            color_t = lighting.sun_lighting(
                gb_t, jnp.asarray(view.position), scene.sun_direction,
                scene.sun_color, None, params.sun_exposure,
            ) + gb_t.emission
            layers.append((d_t, color_t, alpha_t[..., None], gb_t.valid))
            z_lim = jnp.where(v_t >= 0, d_t, z_lim)
        # Back-to-front over the opaque lit scene; only layers in front of opaque.
        for d_t, color_t, alpha_t, ok_t in reversed(layers):
            front = (ok_t & (d_t > depth))[..., None]
            lit = jnp.where(front, lit * (1.0 - alpha_t) + color_t * alpha_t, lit)

    # --- VRSAA fine pass: re-shade contrast quads' 3 extra samples --------------------
    if vrsaa:
        fine = vrsaa_ops.detect_fine_quads(vis_ss, depth_ss)
        fine = fine | vrsaa_ops.luminance_contrast(lit)
        budget = max(1, int(config.vrsaa_budget * h * w))
        qy, qx, live, vrsaa_dropped = vrsaa_ops.fine_worklist(fine, budget)
        w_ss = 2 * w
        offs = ((0, 1), (1, 0), (1, 1))
        pys = jnp.stack([qy * 2 + dy for dy, dx in offs], axis=1)  # (B, 3) local
        pxs = jnp.stack([qx * 2 + dx for dy, dx in offs], axis=1)
        flat_idx = pys * w_ss + pxs
        vis_f = vis_ss.reshape(-1)[flat_idx]
        depth_f = depth_ss.reshape(-1)[flat_idx]
        gbuf_f = resolve_gbuffer(
            scene, setup, vis_f, depth_f, attr_planes=attr_planes,
            pixel_coords=(
                pxs.astype(jnp.float32),
                pys.astype(jnp.float32) + row_offset_ss,
            ),
            **flags,
        )

        def quad_fetch(img):  # coarse (h, w, C) values at the quads -> (B, 1, C)
            return img.reshape(h * w, -1)[
                jnp.minimum(qy * w + qx, h * w - 1)
            ][:, None, :]

        if config.shadow_mode == ShadowMode.CSM:
            ndotl_f = jnp.clip(
                jnp.sum(gbuf_f.normal * l[None, None, :], axis=-1, keepdims=True),
                0.0, 1.0,
            )
            vd_f = jnp.where(depth_f > 0.0, view.z_near / jnp.maximum(depth_f, 1e-12), 0.0)
            shadow_f = shadow_ops.sample_csm(
                gbuf_f.world_position, vd_f, ndotl_f, cascades, shadow_maps,
                params.shadow_bias, normal=gbuf_f.normal,
                packed_taps=temporal.csm_packed if csm_stagger else None,
            )
        elif shadow is not None:  # RT shadows: coarse quad value
            shadow_f = quad_fetch(shadow)
        else:
            shadow_f = None
        # Low-frequency channels (GI, AO, sky) come from the quad's coarse shade —
        # exactly what coarse-rate VRS does for them in the reference.
        gi_f = quad_fetch(gi) if gi is not None else None
        ao_f = quad_fetch(ao) if ao is not None else None
        sky_f = quad_fetch(sky_img)
        direct_f = lighting.sun_lighting(
            gbuf_f, jnp.asarray(view.position), scene.sun_direction,
            scene.sun_color, shadow_f, params.sun_exposure,
        )
        lit_f = lighting.compose_lit_scene(gbuf_f, direct_f, gi=gi_f, ao=ao_f, sky=sky_f)
        lit = vrsaa_ops.resolve_quads(lit, lit_f, qy, qx, live)

    # --- anti-aliasing: TAA accumulation (the IUpscaler-shaped native path) -----------
    upscaling = (
        config.render_width != config.output_width
        or config.render_height != config.output_height
    ) and config.aa_mode == AAMode.TAA
    if config.aa_mode == AAMode.TAA and full_features:
        mv = taa_ops.motion_vectors(
            gbuf.world_position, gbuf.valid,
            jnp.asarray(view.last_view_proj), jnp.asarray(view.unjittered_view_proj),
        )
        if axis_name is not None:
            # History reprojection reads cross-band rows: fetch the full history
            # over ICI; the 3x3 clamp needs one neighbor row from each side.
            history_full = coll.gather_rows(temporal.taa_history, axis_name)
            lit_halo = (
                None if upscaling else coll.row_halo(lit, 1, axis_name, wrap=False)
            )
        else:
            history_full = temporal.taa_history
            lit_halo = None
        if upscaling:
            # Temporal UPSCALING resolve — the reference's default frame is
            # FSR3 Quality (render at output/1.5, upscale temporally;
            # scene_renderer.cpp:28, fsr3.cpp:18). `lit` leaves this block at
            # OUTPUT resolution; history accumulates at output resolution.
            # Band mode gathers lit+mv and replicates the dense resample work
            # (bloom precedent: a band-local scale_and_translate cannot be
            # bit-identical to the full-frame op, and the dense work is ~ms),
            # then keeps this device's output band.
            if axis_name is not None:
                lit_f = coll.gather_rows(lit, axis_name)
                mv_f = coll.gather_rows(mv, axis_name)
            else:
                lit_f, mv_f = lit, mv
            lit, new_history = taa_ops.taau_resolve(
                lit_f, history_full, temporal.taa_valid, mv_f,
                jnp.asarray(view.jitter),
                config.output_height, config.output_width,
                pack8=config.taa_pack8,
            )
            if axis_name is not None:
                n_bands = jax.lax.axis_size(axis_name)
                ob = config.output_height // n_bands
                r0 = jax.lax.axis_index(axis_name) * ob
                lit = jax.lax.dynamic_slice_in_dim(lit, r0, ob, 0)
                new_history = jax.lax.dynamic_slice_in_dim(new_history, r0, ob, 0)
        else:
            lit, new_history = taa_ops.taa_resolve(
                lit, history_full, temporal.taa_valid, mv,
                row_offset=row_offset, current_halo=lit_halo,
                pack8=config.taa_pack8,
            )
        taa_state = dict(taa_history=new_history, taa_valid=jnp.array(True))
    else:
        taa_state = {}

    # --- post: bloom chain + upscale + tonemap composite (UiPhase) ---------------------
    if band_height is None:
        display = taa_ops.upscale_bilinear(
            lit, config.output_height, config.output_width
        )
        bloom_tex = (
            bloom_ops.bloom_chain(display, config.bloom_num_mips)
            if config.bloom else None
        )
        image = post.to_uint8(post.composite(display, bloom_tex, params.bloom_strength))
    elif axis_name is not None:
        # Cross-band post: all_gather the lit scene once, run upscale + bloom
        # replicated (bloom's 6-mip chain reads far outside the band; replicating
        # ~10 ms of dense mip work beats a 6-level halo-exchange ladder), and keep
        # this device's output-space band.
        lit_full = coll.gather_rows(lit, axis_name)
        display_full = taa_ops.upscale_bilinear(
            lit_full, config.output_height, config.output_width
        )
        bloom_tex = (
            bloom_ops.bloom_chain(display_full, config.bloom_num_mips)
            if config.bloom else None
        )
        image_full = post.to_uint8(
            post.composite(display_full, bloom_tex, params.bloom_strength)
        )
        n_bands = jax.lax.axis_size(axis_name)
        out_band = config.output_height // n_bands
        image = jax.lax.dynamic_slice_in_dim(
            image_full, jax.lax.axis_index(axis_name) * out_band, out_band, 0
        )
    else:
        # Legacy band path (no collectives): render-res band, no cross-band post.
        image = post.to_uint8(post.composite(lit, None, params.bloom_strength))

    next_temporal = temporal._replace(
        frame_index=temporal.frame_index + 1,
        **taa_state,
    )
    outputs = FrameOutputs(
        image=image, hdr=lit, depth=depth, visibility=vis, gbuffer=gbuf,
        csm=cascades if config.shadow_mode == ShadowMode.CSM else None,
        motion=mv if (config.aa_mode == AAMode.TAA and full_features) else None,
        vrsaa_dropped=vrsaa_dropped if vrsaa else None,
    )
    return outputs, next_temporal


def make_renderer(config: RenderConfig):
    """jit-compiled frame function with the config baked in statically."""
    return jax.jit(partial(render_frame, config=config))
