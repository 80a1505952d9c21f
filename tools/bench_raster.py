"""Raster kernel microbench: fused (production) vs window-binned, bench-scale.

Chains N kernel invocations through a real data dependency (previous depth
perturbs the clip positions by ~1e-30 — numerically nothing, but XLA cannot
fold it away), so the measurement reflects in-frame behavior rather than a
DCE-prone standalone loop. Timing syncs via a device-side slice readback
(block_until_ready lies on this platform)."""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="screen", choices=["screen", "csm", "rsm"])
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--kernels", default="fused,binned8,binned16")
    ap.add_argument("--res", type=int, default=0,
                    help="override target resolution (csm/rsm modes)")
    args = ap.parse_args()

    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
    from androidrenderer_tpu.ops.raster.raster_fused import (
        auto_slabs, rasterize_fused,
    )
    from androidrenderer_tpu.ops.raster.raster_binned import (
        auto_slabs_binned, rasterize_binned,
    )
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    scene_host = courtyard_scene(column_rings=4, detail=13)
    scene, stats = scene_host.build()
    print(f"# scene: {stats['num_triangles']} tris")

    if args.mode == "screen":
        w, h = 1920, 1088
        cam = Camera(fov_degrees=75.0, aspect=w / h, render_resolution=(w, h))
        cam.set_position([0.0, 1.7, 6.0])
        cam.pitch, cam.yaw = -0.05, np.pi
        mat = jnp.asarray(cam.view_data().view_proj)
        depth_only, affine = False, False
    elif args.mode == "csm":
        w = h = args.res or 1024
        from androidrenderer_tpu.ops.shadow import fit_cascades
        cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(w, h))
        cam.set_position([0.0, 1.7, 6.0])
        vd = cam.view_data()
        casc = fit_cascades(
            jnp.asarray(vd.inverse_view), vd.projection[0, 0], vd.projection[1, 1],
            scene.sun_direction, 4, w, 0.05, 128.0, 0.95,
        )
        mat = casc.matrices[1]
        depth_only, affine = True, True
    else:  # rsm
        w = h = args.res or 128
        from androidrenderer_tpu.ops.shadow import fit_cascades
        cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(w, h))
        cam.set_position([0.0, 1.7, 6.0])
        vd = cam.view_data()
        casc = fit_cascades(
            jnp.asarray(vd.inverse_view), vd.projection[0, 0], vd.projection[1, 1],
            scene.sun_direction, 4, w, 0.05, 128.0, 0.95,
        )
        mat = casc.matrices[1]
        depth_only, affine = True, True

    def make_fn(raster):
        def step(carry, _):
            clip = transform_to_clip(scene.positions + carry * 1e-30, mat)
            su = triangle_setup(
                clip, scene.tri_indices, w, h,
                double_sided=scene.tri_double_sided, tri_valid=scene.tri_valid,
            )
            out = raster(su)
            d = out if depth_only else out[0]
            # Chain through a scalar only — stacking per-step frames made XLA
            # blow the scoped-vmem budget at the pallas call site.
            return d[0, 0] + d[h // 2, w // 2] * 1e-30, None
        @jax.jit
        def run():
            last, _ = jax.lax.scan(step, jnp.float32(0), None, length=args.chain)
            return last
        return run

    kernels = {}
    for name in args.kernels.split(","):
        if name == "fused":
            kernels["fused(prod)"] = lambda su: rasterize_fused(
                su, h, w, num_slabs=auto_slabs(h, w, depth_only=depth_only),
                depth_only=depth_only, affine_z=affine,
            )
        elif name == "hybrid":
            from androidrenderer_tpu.ops.raster.raster_fused import rasterize_hybrid
            from androidrenderer_tpu.ops.raster.raster_binned import (
                auto_slabs_binned as asb,
            )
            kernels[name] = lambda su: rasterize_hybrid(
                su, h, w, backend="binned", win_h=16, cap=64,
                num_slabs=asb(h, w, depth_only=depth_only, win_h=16),
                depth_only=depth_only, affine_z=affine,
            )
        elif name == "hybrid32":
            from androidrenderer_tpu.ops.raster.raster_fused import rasterize_hybrid
            from androidrenderer_tpu.ops.raster.raster_binned import (
                auto_slabs_binned as asb,
            )
            kernels[name] = lambda su: rasterize_hybrid(
                su, h, w, backend="binned", win_h=32, cap=8, kb=4, unroll=2,
                num_slabs=asb(h, w, depth_only=depth_only, win_h=32),
                depth_only=depth_only, affine_z=affine,
            )
        elif name.startswith("fusedkb"):
            kb = int(name[7:])
            kernels[name] = lambda su, kb=kb: rasterize_fused(
                su, h, w, num_slabs=auto_slabs(h, w, depth_only=depth_only),
                depth_only=depth_only, affine_z=affine, kb=kb,
            )
    for name in args.kernels.split(","):
        if name.startswith("bitmask"):
            from androidrenderer_tpu.ops.raster.raster_bitmask import (
                rasterize_bitmask,
            )

            parts = name[7:].split(":")
            wh = int(parts[0]) if parts[0] else 32
            kb = int(parts[1]) if len(parts) > 1 else 8
            ur = int(parts[2]) if len(parts) > 2 else 4
            dm = 0
            ck = 1024
            vm = False
            for p in parts[3:]:
                if p.startswith("d"):
                    dm = int(p[1:])
                elif p.startswith("c"):
                    ck = int(p[1:])
                elif p == "v":
                    vm = True
            kernels[name] = (
                lambda su, wh=wh, kb=kb, ur=ur, dm=dm, ck=ck, vm=vm: rasterize_bitmask(
                    su, h, w, win_h=wh, kb=kb, unroll=ur, debug_mode=dm, chunk=ck,
                    vmem_records=vm,
                    num_slabs=auto_slabs_binned(h, w, depth_only=depth_only, win_h=wh),
                    depth_only=depth_only, affine_z=affine,
                )
            )
        elif name.startswith("subfold"):
            # subfold[:kb[:unroll[:dN][:cN]]] — win32 tables + per-sub-block
            # lane-batched folds (raster_subfold.py).
            import sys as _sys, os as _os
            _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "experiments"))
            from raster_subfold import (  # design study (tools/experiments/)
                auto_slabs_subfold, rasterize_subfold,
            )

            parts = name[7:].split(":")
            kb = int(parts[1]) if len(parts) > 1 and parts[1] else 4
            ur = int(parts[2]) if len(parts) > 2 and parts[2] else 1
            dm = 0
            ck = 1024
            for p in parts[3:]:
                if p.startswith("d"):
                    dm = int(p[1:])
                elif p.startswith("c"):
                    ck = int(p[1:])
            kernels[name] = (
                lambda su, kb=kb, ur=ur, dm=dm, ck=ck: rasterize_subfold(
                    su, h, w, kb=kb, unroll=ur, debug_mode=dm, chunk=ck,
                    num_slabs=auto_slabs_subfold(h, w, depth_only=depth_only),
                    depth_only=depth_only, affine_z=affine,
                )
            )
        elif name.startswith("binned"):
            parts = name[6:].split(":")
            wh = int(parts[0])
            cap = int(parts[1]) if len(parts) > 1 else 14
            kb = int(parts[2]) if len(parts) > 2 else 8
            ur = int(parts[3]) if len(parts) > 3 else 4
            dm = int(parts[4][1:]) if len(parts) > 4 else 0
            kernels[name] = (
                lambda su, wh=wh, cap=cap, kb=kb, ur=ur, dm=dm: rasterize_binned(
                    su, h, w, win_h=wh, cap=cap, kb=kb, unroll=ur, debug_mode=dm,
                    num_slabs=auto_slabs_binned(h, w, depth_only=depth_only, win_h=wh),
                    depth_only=depth_only, affine_z=affine,
                )
            )

    for name, raster in kernels.items():
        fn = make_fn(raster)
        t0 = time.perf_counter()
        np.asarray(fn())
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn())
            times.append((time.perf_counter() - t0) * 1e3 / args.chain)
        print(f"{name:>16}: {min(times):8.2f} ms/raster  (compile {compile_s:.0f}s, "
              f"runs {[round(t, 1) for t in times]})")


if __name__ == "__main__":
    main()
