"""Standalone timing of the bitmask raster's XLA prep (build_window_masks).

The round-3 parity trace attributes 5.5 ms/frame to the span/word/count side
tables feeding the bitmask kernel (VERDICT r3 #5: target <= 2 ms).  This times
build_window_masks alone (chained, DCE-proof) at the three full-geometry
instance shapes: main view (1088x1920), CSM cascade (1024^2), and the proxy
cascade (45k tris), plus optional packed variants.

    python tools/microbench_prep.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
    from androidrenderer_tpu.ops.raster.raster_bitmask import (
        build_window_masks, pack_fused_records,
    )
    from androidrenderer_tpu.ops.raster.raster_binned import auto_slabs_binned
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    scene, stats = courtyard_scene(column_rings=4, detail=13).build()
    print(f"# scene: {stats['num_triangles']} tris")

    def bench(name, h, w, n_tris=None, depth_only=False, affine=False, reps=3):
        cam = Camera(fov_degrees=75.0, aspect=w / h, render_resolution=(w, h))
        cam.set_position([0.0, 1.7, 6.0])
        cam.pitch, cam.yaw = -0.05, np.pi
        mat = jnp.asarray(cam.view_data().view_proj)
        win_h = 32
        num_slabs = auto_slabs_binned(h, w, depth_only=depth_only, win_h=win_h)
        hp = -(-h // (num_slabs * win_h)) * (num_slabs * win_h)

        pos = scene.positions
        tri = scene.tri_indices
        dbl = scene.tri_double_sided
        val = scene.tri_valid
        if n_tris:
            tri, dbl, val = tri[:n_tris], dbl[:n_tris], val[:n_tris]

        def step(carry, _):
            clip = transform_to_clip(pos + carry * 1e-30, mat)
            su = triangle_setup(clip, tri, w, h, double_sided=dbl, tri_valid=val)
            records = pack_fused_records(su, affine_z=affine)
            bbox = su.bbox
            ty0 = bbox[:, 1].astype(jnp.int32) // win_h
            ty1 = bbox[:, 3].astype(jnp.int32) // win_h
            live = su.valid & (records[:, 18] != 0.0)
            wpack = ty0 + (ty1 << 8)
            wpack = jnp.where(live, wpack, 255)
            records = records.at[:, 23].set(wpack.astype(jnp.float32))
            words, ww, cnt, dw = build_window_masks(
                records, live, hp, w, win_h, num_slabs, 1024
            )
            # FULL reduces keep every output element live (slicing lets XLA
            # DCE-narrow the dense chain — the ROADMAP's stage-timing trap);
            # the extra read pass is ~0.05 ms against the chain being timed.
            s = jnp.sum(words) + jnp.sum(ww) + jnp.sum(cnt) + jnp.sum(dw)
            return carry * 1e-30 + s.astype(jnp.float32), None

        @jax.jit
        def run():
            last, _ = lax.scan(step, jnp.float32(0), None, length=10)
            return last

        t0 = time.perf_counter()
        np.asarray(run())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run())
            times.append((time.perf_counter() - t0) * 1e3 / 10)
        print(f"{name:28s} {float(np.median(times)):7.2f} ms/instance "
              f"(setup+records+masks; compile {compile_s:.0f}s)")

    bench("main 1088x1920", 1088, 1920)
    bench("csm 1024^2 full-geom", 1024, 1024, depth_only=True, affine=True)
    bench("csm 1024^2 proxy-sized 45k", 1024, 1024, n_tris=45504,
          depth_only=True, affine=True)


if __name__ == "__main__":
    main()
