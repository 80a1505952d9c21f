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
)
from androidrenderer_tpu.ops.raster.binning import bin_triangles
from androidrenderer_tpu.ops.raster.masked import rasterize_masked_peeled
from androidrenderer_tpu.ops.raster.raster_fused import auto_slabs, rasterize_fused
from androidrenderer_tpu.render.temporal import TemporalState
from androidrenderer_tpu.scene.scene import SceneArrays


class FrameOutputs(NamedTuple):
    image: jnp.ndarray  # (H, W, 3) u8 display-ready
    hdr: jnp.ndarray  # (H, W, 3) f32 lit scene (pre-tonemap)
    depth: jnp.ndarray  # (H, W) f32
    visibility: jnp.ndarray  # (H, W) i32
    gbuffer: GBuffer


def render_frame(
    scene: SceneArrays,
    view: ViewData,
    params: RenderParams,
    temporal: TemporalState,
    config: RenderConfig,
    band_height: int | None = None,
    row_offset: jnp.ndarray | int = 0,
):
    """Pure frame function: returns (FrameOutputs, next TemporalState).

    ``band_height``/``row_offset`` render a horizontal screen band — the multi-chip
    screen-sharding entry (parallel/mesh.py); defaults render the full frame."""
    h = band_height or config.render_height
    w = config.render_width
    tiles_y = h // config.tile_height
    tile_row_offset = row_offset // config.tile_height if band_height else 0

    # --- culling (depth_culling_phase.cpp analog) --------------------------------
    prim_mask = culling.frustum_cull_spheres(
        scene.prim_bounds, jnp.asarray(view.view), jnp.asarray(view.frustum), view.z_near
    )
    prim_mask = prim_mask & scene.prim_valid
    tri_mask = culling.primitive_mask_to_triangle_mask(
        prim_mask, scene.tri_primitive, scene.tri_valid
    )

    p00 = view.projection[0, 0]
    p11 = view.projection[1, 1]

    # --- geometry: transform + setup + bin (the "GPU-driven" pipe) ----------------
    clip = transform_to_clip(scene.positions, jnp.asarray(view.view_proj))
    # Setup is computed against the FULL frame (AABBs live in global pixel space and
    # are identical on every device under screen sharding — replicated work, tiny).
    setup = triangle_setup(
        clip,
        scene.tri_indices,
        w,
        config.render_height,
        double_sided=scene.tri_double_sided,
        tri_valid=tri_mask,
    )
    # Alpha-tested (masked) and translucent (blend) geometry rasterize separately;
    # the opaque pass excludes them (material_pipelines' masked/translucent variants).
    is_masked = scene.tri_alpha_mode == 1
    is_blend = scene.tri_alpha_mode == 2
    drop = jnp.zeros_like(setup.valid)
    if config.alpha_masking:
        drop = drop | is_masked
    if config.translucency:
        drop = drop | is_blend
    setup_opaque = setup._replace(valid=setup.valid & ~drop)

    # --- depth prepass + visibility buffer ----------------------------------------
    # The Pallas kernel is the production path; band rendering (multi-chip screen
    # sharding) and the CPU test path use the XLA reduction rasterizer.
    use_pallas = (
        config.raster_backend == RasterBackend.PALLAS
        and band_height is None
        and (jax.default_backend() == "tpu" or config.pallas_interpret)
    )
    def _raster_full(su):
        if use_pallas:
            return rasterize_fused(
                su, h, w, num_slabs=auto_slabs(h, w),
                interpret=config.pallas_interpret,
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

    if config.occlusion_culling and band_height is None:
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

        hiz = culling.build_hiz_pyramid(depth, config.hiz_levels)
        not_occluded = culling.occlusion_cull_spheres(
            scene.prim_bounds, jnp.asarray(view.view), view.z_near, p00, p11, hiz,
        )
        visible_now = prim_mask & not_occluded
        newly = visible_now & ~phase1
        tri_new = culling.primitive_mask_to_triangle_mask(
            newly, scene.tri_primitive, scene.tri_valid
        )
        d2, v2 = _raster_full(setup_opaque._replace(valid=setup_opaque.valid & tri_new))
        vis = jnp.where(d2 > depth, v2, vis)
        depth = jnp.maximum(depth, d2)
        temporal = temporal._replace(
            prev_visible_prims=temporal.prev_visible_prims.at[:np_].set(visible_now)
        )
    else:
        depth, vis = _raster_full(setup_opaque)

    if config.alpha_masking:
        setup_m = setup._replace(valid=setup.valid & is_masked)
        depth, vis = rasterize_masked_peeled(
            scene, setup_m, depth, vis, config.tile_height, config.tile_width,
            cap=config.max_tris_per_tile, layers=config.alpha_peel_layers,
            row_offset=row_offset,
        )

    # --- gbuffer resolve ------------------------------------------------------------
    gbuf = resolve_gbuffer(
        scene, setup, vis, depth, row_offset=row_offset,
        use_base_textures=config.use_base_textures,
        use_normal_maps=config.use_normal_maps,
        use_mr_textures=config.use_mr_textures,
        use_emission=config.use_emission,
    )

    # --- sky ------------------------------------------------------------------------
    if config.sky:
        sky_img = sky.sky_background(
            jnp.asarray(view.inverse_view), p00, p11,
            scene.sun_direction, scene.sun_color, h, w,
            exposure=params.sun_exposure,
            row_offset=row_offset, full_height=config.render_height,
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
        shadow_maps = shadow_ops.render_shadow_cascades(
            scene.positions, scene.tri_indices, scene.tri_valid, cascades,
            config.shadow_cascade_resolution,
            use_pallas=use_pallas, pallas_interpret=config.pallas_interpret,
            double_sided=scene.tri_double_sided,
        )
        l = -scene.sun_direction / jnp.linalg.norm(scene.sun_direction)
        ndotl = jnp.clip(
            jnp.sum(gbuf.normal * l[None, None, :], axis=-1, keepdims=True), 0.0, 1.0
        )
        view_distance = jnp.where(
            depth > 0.0, view.z_near / jnp.maximum(depth, 1e-12), 0.0
        )
        shadow = shadow_ops.sample_csm(
            gbuf.world_position, view_distance, ndotl, cascades, shadow_maps,
            params.shadow_bias,
        )
    elif config.shadow_mode == ShadowMode.RT and band_height is None:
        # Ray-traced sun shadows (directional_light.cpp:372-422).
        shadow = rt_effects.rt_sun_shadows(
            scene.bvh, gbuf.world_position, gbuf.normal, gbuf.valid,
            scene.sun_direction, scene.sun_angular_size, temporal.frame_index,
        )
    else:
        shadow = None

    # --- AO (ambient_occlusion_phase.cpp: Off / CACAO-like SSAO / RTAO) ---------------
    if config.ao_mode == AOMode.RT and band_height is None:
        ao = rt_effects.rtao(
            scene.bvh, gbuf.world_position, gbuf.normal, gbuf.valid,
            config.rtao_num_samples, params.rtao_max_distance, temporal.frame_index,
        )
    elif config.ao_mode == AOMode.SSAO:
        ao = lighting.ssao(gbuf, jnp.asarray(view.position), view.z_near)
    else:
        ao = None

    # --- GI: LPV (pre/post-render slices, gi/light_propagation_volume.cpp) -----------
    if config.gi_mode == GIMode.LPV and band_height is None:
        def _gi_raster(setup_, hh, ww):
            if use_pallas and ww % 128 == 0:
                return rasterize_fused(
                    setup_, hh, ww, num_slabs=auto_slabs(hh, ww),
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
        volumes = lpv_ops.build_lpv(
            scene, jnp.asarray(view.position), cam_forward, _gi_raster,
            config.lpv_num_cascades, config.lpv_resolution, config.lpv_cell_size,
            config.lpv_rsm_resolution, config.lpv_num_propagation_steps,
            config.lpv_behind_camera_percent,
        )
        gi = lpv_ops.apply_lpv(
            volumes, gbuf.world_position, gbuf.normal, gbuf.base_color, gbuf.valid,
            params.lpv_exposure * params.sun_exposure,
        )
    elif config.gi_mode == GIMode.PROBES and band_height is None:
        # DDGI-style budgeted probe cache (irradiance_cache.cpp:496-724).
        probes = probe_ops.update_probes(
            temporal.probes, scene.bvh, scene, jnp.asarray(view.position),
            config.probe_grid, config.probe_spacing, config.probe_budget,
            config.probe_rays, temporal.frame_index, params.sun_exposure,
        )
        irr = probe_ops.sample_probes(
            probes, gbuf.world_position, gbuf.normal, gbuf.valid,
            jnp.asarray(view.position), config.probe_grid, config.probe_spacing,
        )
        gi = irr * gbuf.base_color
        temporal = temporal._replace(probes=probes)
    elif config.gi_mode == GIMode.RT and band_height is None:
        # Per-pixel one-bounce RTGI (gi/rtgi.cpp:69-139).
        irr = rt_effects.rtgi(
            scene.bvh, scene, gbuf.world_position, gbuf.normal, gbuf.valid,
            jnp.asarray(view.inverse_view), p00, p11, temporal.frame_index,
            params.rtgi_exposure, params.sun_exposure,
        )
        # Screen-space reconstruction of the 1-spp signal (rtgi overlay filter).
        from androidrenderer_tpu.ops.denoise import atrous_filter

        irr = atrous_filter(irr, depth, gbuf.normal, gbuf.valid)
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
        from androidrenderer_tpu.ops.raster.raster_xla import (
            rasterize_depth as _rd, rasterize_visibility as _rv,
        )

        setup_b = setup._replace(valid=setup.valid & is_blend)
        bins_b = bin_triangles(
            setup_b, tiles_y, config.tiles_x, config.tile_height, config.tile_width,
            cap=config.max_tris_per_tile, tile_row_offset=tile_row_offset,
        )
        z_lim = jnp.full((h, w), jnp.inf, jnp.float32)
        layers = []
        for _ in range(config.translucent_layers):
            d_t = _rd(setup_b, bins_b, h, w, config.tile_height, config.tile_width,
                      row_offset=row_offset, z_limit=z_lim)
            v_t = _rv(setup_b, bins_b, d_t, config.tile_height, config.tile_width,
                      row_offset=row_offset, z_limit=z_lim)
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

    # --- anti-aliasing: TAA accumulation (the IUpscaler-shaped native path) -----------
    if config.aa_mode == AAMode.TAA and band_height is None:
        mv = taa_ops.motion_vectors(
            gbuf.world_position, gbuf.valid,
            jnp.asarray(view.last_view_proj), jnp.asarray(view.unjittered_view_proj),
        )
        lit, new_history = taa_ops.taa_resolve(
            lit, temporal.taa_history, temporal.taa_valid, mv
        )
        taa_state = dict(taa_history=new_history, taa_valid=jnp.array(True))
    else:
        taa_state = {}

    # --- post: bloom chain + upscale + tonemap composite (UiPhase) ---------------------
    # Band (sharded) rendering outputs at render-res; cross-band ops (upscale, bloom,
    # TAA) run full-frame only — the sharded caller composites bands itself.
    if band_height is None:
        display = taa_ops.upscale_bilinear(
            lit, config.output_height, config.output_width
        )
    else:
        display = lit
    if config.bloom and band_height is None:
        bloom_tex = bloom_ops.bloom_chain(display, config.bloom_num_mips)
    else:
        bloom_tex = None
    image = post.to_uint8(post.composite(display, bloom_tex, params.bloom_strength))

    next_temporal = temporal._replace(
        frame_index=temporal.frame_index + 1,
        **taa_state,
    )
    outputs = FrameOutputs(image=image, hdr=lit, depth=depth, visibility=vis, gbuffer=gbuf)
    return outputs, next_temporal


def make_renderer(config: RenderConfig):
    """jit-compiled frame function with the config baked in statically."""
    return jax.jit(partial(render_frame, config=config))
