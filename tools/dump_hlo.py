"""Dump the OPTIMIZED HLO of the flagship parity frame to a text file.

    python tools/dump_hlo.py [--out /tmp/parity_hlo.txt]

XLA_FLAGS=--xla_dump_to does not work on this backend (the axon tunnel
compiles server-side), so this goes through lowered.compile().as_text().
Feed the result to tools/trace_attrib.py to map the trace's fusion.NN names
to source lines.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/parity_hlo.txt")
    args = ap.parse_args()

    import numpy as np
    import jax

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
        occlusion_culling=False,
    )
    scene_host = courtyard_scene(column_rings=4, detail=13)
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
    lowered = jax.jit(renderer).lower(scene, view, params, temporal)
    compiled = lowered.compile()
    txt = compiled.as_text()
    Path(args.out).write_text(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB to {args.out}")


if __name__ == "__main__":
    main()
