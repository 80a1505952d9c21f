"""Headline benchmark: Sponza-class scene (~321k tris, 13% alpha-masked, 3.4% blend) at 1920x1080, ms/frame.

BASELINE.json target: <= 16 ms/frame on one TPU v5e chip. The scene is the procedural
courtyard fixture scaled to Sponza's triangle count (the reference ships no Sponza
asset; triangle count, texture usage, and screen coverage are matched instead).

The headline frame is the PARITY frame — the reference always runs GI + AO + AA
(scene_renderer.cpp:318-411), so the bench enables LPV GI + SSAO + TAA on top of
CSM shadows, sky, bloom, occlusion culling, and tonemap. A raster-only frame
(GI/AO/AA off) is reported as a secondary stderr line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = target_ms / measured_ms (>1 means faster than the 16 ms target).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

TARGET_MS = 16.0


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """Fail fast when the TPU tunnel is down instead of hanging the driver.

    jax backend init is probed in a SUBPROCESS because a dead axon tunnel can
    hang ``jax.devices()`` indefinitely (docs/ROADMAP.md, round-3 outage)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        print("# bench: jax backend init timed out (TPU tunnel down?)",
              file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"# bench: jax backend init failed:\n{r.stderr[-2000:]}",
              file=sys.stderr)
        return False
    print(f"# bench: backend = {r.stdout.strip()}", file=sys.stderr)
    return True


def main() -> int:
    if not _probe_backend():
        return 1
    import jax

    # Persistent compilation cache: compile times on this backend are NOISY
    # (identical configs measured 70-220 s across runs; a SMALLER program once
    # took 390 s — remote-compile contention, not program size). Caching makes
    # driver re-runs of an unchanged bench near-instant; if the backend cannot
    # serialize executables this silently no-ops.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import (
        AAMode, AOMode, GIMode, RenderConfig, RenderParams,
    )
    from androidrenderer_tpu.render import (
        initial_temporal_state, make_renderer, temporal_state_for,
    )
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    # Output 1920x1088 (the extra 8 rows vs 1080 are <1% more work, counted
    # against us). The PARITY frame renders INTERNALLY at 1280x736 and
    # temporally upscales — the reference's default frame is FSR3 in Quality
    # mode, i.e. render at output/1.5 per axis and upscale temporally
    # (scene_renderer.cpp:28 default AA = FSR3; fsr3.cpp:18 Quality;
    # ops/taa.py::taau_resolve is the TPU-native equivalent, convergence-gated
    # by tests/test_taau.py). 1280x736 = 10x23 tiles of 128x32.
    width, height = 1920, 1088
    rw, rh = 1280, 736
    config = RenderConfig(
        render_width=rw, render_height=rh,
        output_width=width, output_height=height,
        tile_height=32, tile_width=128,
        max_tris_per_tile=4096,
        alpha_masking=True,  # masked foliage hedges (peel loop exercised)
        # The scene carries blend-mode curtains (~3.4% of tris) which the
        # opaque pass EXCLUDES — exactly the reference's shipped frame: it
        # classifies translucent primitives (render_scene.cpp:57-69) but its
        # draw_transparent helper has NO call sites, so they are never drawn.
        # Our peel composite (translucency=True) goes beyond the reference;
        # its cost is measured in tools/profile_toggles.py (parity_up vs
        # parity_up_blend) and documented in docs/PARITY.md.
        translucency=False,
        # Static material specialization: normal + metal-rough textures ON
        # (Sponza's census); no emissive in the scene.
        use_normal_maps=True, use_mr_textures=True, use_emission=False,
        # Parity features (the frame the 16 ms target is defined against).
        gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
        # Two-phase HiZ occlusion culling is EXACT here (bit-identical output,
        # tests/test_occlusion.py) and a measured net pessimization at this
        # scene's occlusion rate (+36 ms: HiZ build + sphere re-test + the
        # second raster's fixed cost exceed the touches it saves). The flagship
        # config therefore renders the identical image without it; it stays on
        # by default for occlusion-heavy interiors and in the driver dryrun.
        occlusion_culling=False,
        # Staggered LPV cascade updates (1 cascade/frame round-robin): the
        # reference's own irradiance cache uses exactly this budgeted-update
        # pattern (irradiance_cache.cpp:15-19); its LPV rebuilds all cascades
        # per frame. On a static scene the staggered volumes reach the
        # rebuild-all steady state exactly (tests/test_lpv_stagger.py), so
        # the chained bench frames are identical; dynamic content sees up to
        # lpv_num_cascades frames of GI lag (docs/PARITY.md divergence entry).
        # Measured: -11.3 ms/frame (tools/profile_toggles.py parity_up_lpv_b1).
        lpv_update_budget=1,
        # Staggered CSM (round 5): cascade 0 re-rasters every frame, far
        # cascades round-robin against the cached packed-PCF atlas
        # (shadow.py::render_shadow_cascades_staggered) — the same budget
        # pattern as the LPV stagger above. Static scene + static sun reach
        # the rebuild-all steady state BIT-exactly after 3 frames
        # (tests/test_shadow.py::test_staggered_cascades_steady_state), so
        # the timed chained frames are identical to rebuild-all output.
        # Measured: -10.3 ms/frame (92.8 -> 82.5, parity_up_csmb1).
        shadow_update_budget=1,
    )

    # detail=13 => 320,728 triangles incl. 13% alpha-masked foliage and 3.4%
    # blend-mode curtains (Sponza ~262k + plants + curtains); normal +
    # metal-rough textured materials.
    scene_host = courtyard_scene(column_rings=4, detail=13, curtains=True)
    scene, stats = scene_host.build()
    print(f"# scene: {stats}", file=sys.stderr)

    cam = Camera(
        fov_degrees=config.fov_degrees, aspect=width / height,
        z_near=config.z_near, render_resolution=(rw, rh),
    )
    cam.set_position([0.0, 1.7, 6.0])
    cam.pitch, cam.yaw = -0.05, np.pi
    view = cam.view_data()
    params = RenderParams.default()

    def measure(cfg, label, want_flops=False):
        renderer = make_renderer(cfg)
        temp = temporal_state_for(cfg)
        flops = None
        if want_flops:
            # XLA's own cost model for the compiled frame (cache hit — same
            # trace signature as the calls below). Renderers are gather/
            # bandwidth-bound, so MFU is a utilization DENOMINATOR, not a
            # target; still useful to see how far from compute-bound we run.
            try:
                ca = renderer.lower(scene, view, params, temp).compile().cost_analysis()
                if ca:
                    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                    flops = float(ca.get("flops", 0.0)) or None
            except Exception as e:
                print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
        # Warmup (compile) + 2 cached frames.
        t0 = time.perf_counter()
        out, temp = renderer(scene, view, params, temp)
        np.asarray(out.image[0, 0])
        print(f"# [{label}] compile+first frame: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        for _ in range(2):
            out, temp = renderer(scene, view, params, temp)
        np.asarray(out.image[0, 0])

        # Steady-state frame time: chain CHAIN frames on-device (temporal state is
        # the cross-frame dependency) and sync once — measures the render loop
        # itself rather than per-call host<->device tunnel latency, which a
        # pipelined consumer overlaps.
        CHAIN = 10
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                out, temp = renderer(scene, view, params, temp)
            np.asarray(out.image[0, 0])  # sync via data dependency
            times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
        ms = float(np.median(times))
        print(f"# [{label}] chained frame times (ms): "
              f"{[round(t, 2) for t in times]}", file=sys.stderr)
        return (ms, flops) if want_flops else ms

    # Raster-only mirrors the reference's AA=None mode: NATIVE resolution
    # (scene_renderer.cpp:135-139 sets render res = output res when AA is off).
    raster_cfg = config.replace(
        gi_mode=GIMode.OFF, ao_mode=AOMode.OFF, aa_mode=AAMode.OFF,
        render_width=width, render_height=height,
    )
    raster_ms = measure(raster_cfg, "raster-only")
    print(f"# raster_only_frame_ms: {round(raster_ms, 3)}", file=sys.stderr)
    ms, flops = measure(config, "parity (LPV GI + SSAO + TAA)", want_flops=True)

    result = {
        "metric": "sponza_class_321k_tris_masked_blend_1920x1080_parity_frame_time",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 4),
    }
    if flops:
        # v5e peak = 197 TFLOP/s (bf16 MXU); the frame is mostly f32 VPU +
        # gathers, so read this as "fraction of chip peak", a denominator for
        # perf rounds (VERDICT r4 item 7), not a kernel-quality score.
        result["flops_est"] = round(flops, 0)
        result["mfu_est"] = round(flops / (ms * 1e-3) / 197e12, 5)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
