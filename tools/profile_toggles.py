"""Whole-frame toggle-delta profiling on the bench scene.

Per docs/ROADMAP.md only ONE-jit whole-frame timings are trustworthy on this
platform (per-call dispatch costs 7-27 ms); this tool times the full bench frame
under a series of feature configs and reports deltas vs the base config.

    python tools/profile_toggles.py [--configs base,ssao,taa,lpv,parity]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def time_config(config, scene, view, params, chain=10, reps=3):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from androidrenderer_tpu.render import initial_temporal_state, make_renderer

    temporal = initial_temporal_state(
        config.render_height, config.render_width,
        probe_cascades=config.probe_cascades, probe_grid=config.probe_grid,
        probe_spacing=config.probe_spacing, max_primitives=config.max_primitives,
        out_height=config.output_height, out_width=config.output_width,
        lpv_cascades=config.lpv_num_cascades,
        lpv_resolution=config.lpv_resolution,
        shadow_cascades=(
            config.num_shadow_cascades if config.shadow_update_budget else 0
        ),
        shadow_resolution=(
            config.shadow_cascade_resolution if config.shadow_update_budget else 0
        ),
    )
    renderer = make_renderer(config)
    t0 = time.perf_counter()
    out, temporal = renderer(scene, view, params, temporal)
    np.asarray(out.image[0, 0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(chain):
            out, temporal = renderer(scene, view, params, temporal)
        np.asarray(out.image[0, 0])
        times.append((time.perf_counter() - t0) * 1e3 / chain)
    return float(np.median(times)), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="base,ssao,taa,lpv,parity")
    ap.add_argument("--detail", type=int, default=13)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import (
        AAMode, AOMode, GIMode, RenderConfig, RenderParams, ShadowMode,
    )
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    w, h = 1920, 1088
    # Base mirrors bench.py's raster-only config (round 3: honest scene —
    # masked foliage + normal/MR maps ON).
    base = RenderConfig(
        render_width=w, render_height=h, output_width=w, output_height=h,
        tile_height=32, tile_width=128, max_tris_per_tile=4096,
        alpha_masking=True, translucency=False,
        use_normal_maps=True, use_mr_textures=True, use_emission=False,
    )
    variants = {
        "base": base,
        "nomask": base.replace(alpha_masking=False),
        "maskpeel": base.replace(alpha_bitmap=False),
        "nonrm": base.replace(use_normal_maps=False),
        "nomr": base.replace(use_mr_textures=False),
        # Everything off: raster + setup + resolve core + sun BRDF + tonemap.
        "flat": base.replace(
            shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
            occlusion_culling=False, alpha_masking=False,
            use_base_textures=False, use_normal_maps=False,
            use_mr_textures=False,
        ),
        # Stage-stub decompositions of the flat core (trustworthy in-frame deltas):
        # flat - flat_sr = raster cost; flat_sr - flat_srr = resolve-core cost;
        # flat_srr itself = setup + planes pack + BRDF + tonemap + dispatch floor.
        "flat_sr": base.replace(
            shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
            occlusion_culling=False, alpha_masking=False,
            use_base_textures=False, use_normal_maps=False,
            use_mr_textures=False, debug_stub_raster=True,
        ),
        "flat_sres": base.replace(
            shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
            occlusion_culling=False, alpha_masking=False,
            use_base_textures=False, use_normal_maps=False,
            use_mr_textures=False, debug_stub_resolve=True,
        ),
        "flat_srr": base.replace(
            shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
            occlusion_culling=False, alpha_masking=False,
            use_base_textures=False, use_normal_maps=False,
            use_mr_textures=False, debug_stub_raster=True,
            debug_stub_resolve=True,
        ),
        "fullrategi": base.replace(
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, half_rate_gi=False
        ),
        "noshadow": base.replace(shadow_mode=ShadowMode.OFF),
        "nobloom": base.replace(bloom=False),
        "noocc": base.replace(occlusion_culling=False),
        "nosky": base.replace(sky=False),
        "notex": base.replace(use_base_textures=False),
        "ssao": base.replace(ao_mode=AOMode.SSAO),
        "taa": base.replace(aa_mode=AAMode.TAA),
        "lpv": base.replace(gi_mode=GIMode.LPV),
        "rtao": base.replace(ao_mode=AOMode.RT),
        "rtgi": base.replace(gi_mode=GIMode.RT),
        "probes": base.replace(gi_mode=GIMode.PROBES),
        "parity": base.replace(
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA
        ),
        # UPSCALED family — bench.py's parity frame (render 1280x736 ->
        # output 1920x1088, the reference's FSR3-Quality default). Read these
        # as absolute times / deltas vs parity_up, not vs base.
        "parity_up": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
        ),
        # Rebuild-all LPV (the reference's clear-and-rebuild policy).
        "parity_up_lpv_b0": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False,
        ),
        # Blend-curtain peel composite cost (delta vs parity_up; the
        # reference never draws its translucent list — draw_transparent has
        # no call sites — so the peel is a beyond-reference feature).
        "parity_up_blend": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, translucency=True,
        ),
        # GBuffer materialization barrier: isolates XLA producer-duplication
        # (consumers re-running the plane/texture gathers inside their fusions).
        "parity_up_gbar": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, gbuffer_barrier=True,
        ),
        "parity_up_noshadow": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, shadow_mode=ShadowMode.OFF,
        ),
        "parity_up_shadow512": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, shadow_cascade_resolution=512,
        ),
        "parity_up_csm1": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, num_shadow_cascades=1,
        ),
        "parity_up_csm2": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, num_shadow_cascades=2,
        ),
        "parity_up_proxyall": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, shadow_proxy_from_cascade=0,
        ),
        "parity_up_lpv_steps8": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_num_propagation_steps=8,
        ),
        "parity_up_lpv_c2": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_num_cascades=2,
        ),
        # Staggered LPV: rebuild ONE cascade/frame round-robin against cached
        # volumes (ops/lpv.py::update_lpv_staggered) — amortizes 4 RSM rasters
        # + inject + propagate to 1/4 of each.
        "parity_up_lpv_b1": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
        ),
        "parity_up_lpv_b2": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=2,
        ),
        # Staggered CSM (round 5): cascade 0 every frame + 1 far cascade
        # round-robin against the cached packed-PCF atlas
        # (shadow.py::render_shadow_cascades_staggered). _2048/_4096 raise the
        # cascade resolution toward the reference's 4096^2 D16
        # (directional_light.cpp:28-44) on the staggered budget.
        "parity_up_csmb1": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
            shadow_update_budget=1,
        ),
        "parity_up_csmb1_2048": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
            shadow_update_budget=1, shadow_cascade_resolution=2048,
        ),
        "parity_up_csmb1_4096": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
            shadow_update_budget=1, shadow_cascade_resolution=4096,
        ),
        # 8-byte luma+chroma history rows vs the 16-byte R11G11B10x4 default —
        # measured NEGATIVE (+0.7 ms: encode math > gather saving; the
        # reprojection gather is coherent and only ~3 ms at 16 B).
        "parity_up_csmb1_p8": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
            shadow_update_budget=1, taa_pack8=True,
        ),
        # Window-height ladder at 2048^2 cascades (the 1024^2 ladder measured
        # bigger-is-better 8 -> 32; 64 is untested at 2048 where triangles
        # span twice the texels).
        "parity_up_csmb1_2048_w64": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
            shadow_update_budget=1, shadow_cascade_resolution=2048,
            shadow_win_h=64,
        ),
        "parity_up_csm2048": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, lpv_update_budget=1,
            shadow_cascade_resolution=2048,
        ),
        "parity_up_nogi": base.replace(
            render_width=1280, render_height=736,
            ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False,
        ),
        "parity_up_noaa": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO,
            occlusion_culling=False,
        ),
        "parity_up_flat": base.replace(
            render_width=1280, render_height=736,
            occlusion_culling=False, shadow_mode=ShadowMode.OFF,
            sky=False, bloom=False, alpha_masking=False,
            use_base_textures=False, use_normal_maps=False,
            use_mr_textures=False,
        ),
        # Proxy-LOD ablations (scene/proxy.py): full geometry in far cascades /
        # RSM instead of the vertex-clustered proxy.
        "noproxy_shadow": base.replace(shadow_proxy_from_cascade=10**6),
        "noproxy_rsm": base.replace(gi_mode=GIMode.LPV, rsm_proxy=False),
        "noproxy": base.replace(
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            shadow_proxy_from_cascade=10**6, rsm_proxy=False,
        ),
        # LPV decomposition variants
        "lpv_steps0": base.replace(gi_mode=GIMode.LPV, lpv_num_propagation_steps=0),
        "lpv_steps8": base.replace(gi_mode=GIMode.LPV, lpv_num_propagation_steps=8),
        "lpv_c1": base.replace(gi_mode=GIMode.LPV, lpv_num_cascades=1),
        "lpv_rsm64": base.replace(gi_mode=GIMode.LPV, lpv_rsm_resolution=64),
        # Phase A unroll A/B on the upscaled parity frame (raster_binned
        # pa_unroll — main + CSM + RSM kernels all inherit it).
        "parity_up_pa4": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, raster_pa_unroll=4,
        ),
        "parity_up_pa8": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, raster_pa_unroll=8,
        ),
        # Fine stage isolation at the flagship config (debug_* stubs): read as
        # parity_up minus the stubbed stage.
        "parity_up_stubpcf": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, debug_stub_shadow_sample=True,
        ),
        "parity_up_stubrsm": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, debug_stub_rsm=True,
        ),
        "parity_up_stublpvapply": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, debug_stub_lpv_apply=True,
        ),
        "parity_up_gonly": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, debug_resolve_gather_only=True,
        ),
        "parity_up_notex": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, use_base_textures=False,
            use_normal_maps=False, use_mr_textures=False,
        ),
        "parity_up_nomask": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, alpha_masking=False,
        ),
        "parity_up_nosky": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, sky=False,
        ),
        "parity_up_nobloom": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, bloom=False,
        ),
        "parity_up_noao": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, aa_mode=AAMode.TAA,
            occlusion_culling=False,
        ),
        "flat_gonly": base.replace(
            shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
            occlusion_culling=False, alpha_masking=False,
            use_base_textures=False, use_normal_maps=False,
            use_mr_textures=False, debug_resolve_gather_only=True,
        ),
        # Bitmask-driven rasterizer (raster_bitmask.py) whole-frame A/B.
        "parity_up_bm": base.replace(
            render_width=1280, render_height=736,
            gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
            occlusion_culling=False, raster_bitmask=True,
        ),
        "base_bm": base.replace(raster_bitmask=True),
    }

    scene, stats = courtyard_scene(column_rings=4, detail=args.detail,
                                   curtains=True).build()
    print(f"# scene: {stats}", file=sys.stderr)
    cam = Camera(fov_degrees=75.0, aspect=w / h, render_resolution=(w, h))
    cam.set_position([0.0, 1.7, 6.0]); cam.pitch, cam.yaw = -0.05, np.pi
    view = cam.view_data()
    params = RenderParams.default()

    results = {}
    for name in args.configs.split(","):
        ms, compile_s = time_config(variants[name], scene, view, params, chain=args.chain)
        results[name] = ms
        delta = ms - results.get("base", ms)
        print(f"{name:10s} {ms:8.2f} ms   (delta vs base {delta:+8.2f}, compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
