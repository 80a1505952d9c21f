"""Capture a jax.profiler trace of the frame — the Tracy-capture analog
(SURVEY.md §5.1; the reference wraps every pass in Tracy CPU+GPU zones).

    python tools/trace_frame.py [--outdir /tmp/artpu_trace] [--scene courtyard-big]

Open the resulting directory with XProf / TensorBoard's profile plugin. Every jitted
stage appears as a named XLA module; Pallas kernels show as tpu_custom_call ops.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/artpu_trace")
    ap.add_argument("--scene", default="courtyard")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    from androidrenderer_tpu.app.application import Application
    from androidrenderer_tpu.config import RenderConfig
    from androidrenderer_tpu.scene import procedural

    scene = {
        "cornell": procedural.cornell_scene,
        "courtyard": procedural.courtyard_scene,
        "courtyard-big": lambda: procedural.courtyard_scene(column_rings=4, detail=13),
    }[args.scene]()
    cfg = RenderConfig(render_width=1920, render_height=1088,
                       output_width=1920, output_height=1088,
                       max_tris_per_tile=4096)
    app = Application(cfg, scene)
    app.camera.set_position([0.0, 1.7, 6.0])
    app.camera.pitch, app.camera.yaw = -0.05, np.pi

    app.tick()  # compile outside the trace
    with jax.profiler.trace(args.outdir):
        for _ in range(args.frames):
            app.tick()
    print(f"trace written to {args.outdir}")


if __name__ == "__main__":
    main()
