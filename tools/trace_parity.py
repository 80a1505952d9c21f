"""Capture a jax.profiler trace of the FLAGSHIP parity frame (bench.py's
config: honest courtyard scene, LPV+SSAO+TAAU, render 1280x736 -> 1920x1088).

    python tools/trace_parity.py [--outdir /tmp/parity_trace]

Then aggregate with tools/trace_report.py to get per-fusion device times —
the ground truth the toggle-delta sweeps can only approximate (toggles change
XLA's fusion choices; the trace shows what the production module actually runs).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/parity_trace")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--gbar", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax

    # Persistent compilation cache (compile times are noisy on this backend;
    # bench.py uses the same cache dir so parity-config compiles are shared).
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import (
        AAMode, AOMode, GIMode, RenderConfig, RenderParams,
    )
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    w, h = 1920, 1088
    rw, rh = 1280, 736
    config = RenderConfig(
        render_width=rw, render_height=rh, output_width=w, output_height=h,
        tile_height=32, tile_width=128, max_tris_per_tile=4096,
        alpha_masking=True, translucency=False,
        use_normal_maps=True, use_mr_textures=True, use_emission=False,
        gi_mode=GIMode.LPV, ao_mode=AOMode.SSAO, aa_mode=AAMode.TAA,
        occlusion_culling=False, gbuffer_barrier=args.gbar,
        lpv_update_budget=1,  # the bench headline config (round 4)
        shadow_update_budget=1,  # staggered CSM (round 5 bench default)
    )
    scene_host = courtyard_scene(column_rings=4, detail=13, curtains=True)
    scene, _stats = scene_host.build()
    cam = Camera(
        fov_degrees=config.fov_degrees, aspect=w / h,
        z_near=config.z_near, render_resolution=(rw, rh),
    )
    cam.set_position([0.0, 1.7, 6.0])
    cam.pitch, cam.yaw = -0.05, np.pi
    view = cam.view_data()
    params = RenderParams.default()
    from androidrenderer_tpu.render import temporal_state_for

    temporal = temporal_state_for(config)
    renderer = make_renderer(config)
    out, temporal = renderer(scene, view, params, temporal)
    np.asarray(out.image[0, 0])  # compile + settle outside the trace
    with jax.profiler.trace(args.outdir):
        for _ in range(args.frames):
            out, temporal = renderer(scene, view, params, temporal)
        np.asarray(out.image[0, 0])
    print(f"trace written to {args.outdir}")


if __name__ == "__main__":
    main()
