"""Per-stage TPU timing for the bench scene — where do the 2919 ms go?

Each stage is jitted separately with donated inputs where possible, timed with
block_until_ready. Run on the TPU (default platform):

    python tools/profile_stages.py [--detail 13] [--width 1920 --height 1088]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=5, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=int, default=13)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--shadows", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import RenderConfig, RenderParams
    from androidrenderer_tpu.ops import shadow as shadow_ops
    from androidrenderer_tpu.ops.gbuffer import resolve_gbuffer
    from androidrenderer_tpu.ops.raster import (
        rasterize_depth, rasterize_visibility, transform_to_clip, triangle_setup,
    )
    from androidrenderer_tpu.ops.raster.binning import bin_triangles
    from androidrenderer_tpu.ops import culling, lighting, post, sky
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    w, h = args.width, args.height
    config = RenderConfig(
        render_width=w, render_height=h, output_width=w, output_height=h,
        tile_height=32, tile_width=128, max_tris_per_tile=4096,
    )
    scene, stats = courtyard_scene(column_rings=4, detail=args.detail).build()
    print(f"scene: {stats}")
    cam = Camera(fov_degrees=75.0, aspect=w / h, render_resolution=(w, h))
    cam.set_position([0.0, 1.7, 6.0]); cam.pitch, cam.yaw = -0.05, np.pi
    view = cam.view_data()
    params = RenderParams.default()

    # Stage 1: transform + setup
    @jax.jit
    def s_setup(positions, tri_indices, dbl, valid):
        clip = transform_to_clip(positions, jnp.asarray(view.view_proj))
        return triangle_setup(clip, tri_indices, w, h, double_sided=dbl, tri_valid=valid)

    t, setup = timeit(s_setup, scene.positions, scene.tri_indices,
                      scene.tri_double_sided, scene.tri_valid)
    print(f"transform+setup:   {t:8.2f} ms")

    # Stage 2: binning
    bin_fn = jax.jit(partial(
        bin_triangles, tiles_y=config.tiles_y, tiles_x=config.tiles_x,
        tile_h=config.tile_height, tile_w=config.tile_width,
        cap=config.max_tris_per_tile))
    t, bins = timeit(bin_fn, setup)
    counts = np.asarray(bins.counts)
    print(f"binning:           {t:8.2f} ms   counts: max={counts.max()} "
          f"mean={counts.mean():.0f} total={counts.sum()} overflow={(counts > config.max_tris_per_tile).sum()}")

    # Stage 3: depth raster
    depth_fn = jax.jit(partial(rasterize_depth, height=h, width=w,
                               tile_h=config.tile_height, tile_w=config.tile_width))
    t, depth = timeit(depth_fn, setup, bins)
    print(f"depth raster:      {t:8.2f} ms")

    # Stage 4: visibility raster
    vis_fn = jax.jit(partial(rasterize_visibility, tile_h=config.tile_height,
                             tile_w=config.tile_width))
    t, vis = timeit(vis_fn, setup, bins, depth)
    print(f"vis raster:        {t:8.2f} ms")

    # Stage 5: gbuffer resolve
    gb_fn = jax.jit(resolve_gbuffer)
    t, gbuf = timeit(gb_fn, scene, setup, vis, depth)
    print(f"gbuffer resolve:   {t:8.2f} ms")

    # Stage 6: shadows (optional)
    if args.shadows:
        @jax.jit
        def s_shadow(positions, tri_indices, valid):
            cascades = shadow_ops.fit_cascades(
                jnp.asarray(view.inverse_view), view.projection[0, 0],
                view.projection[1, 1], scene.sun_direction, 4,
                config.shadow_cascade_resolution, config.z_near, 128.0, 0.95)
            return shadow_ops.render_shadow_cascades(
                positions, tri_indices, valid, cascades,
                config.shadow_cascade_resolution)
        t, _ = timeit(s_shadow, scene.positions, scene.tri_indices, scene.tri_valid)
        print(f"shadow cascades:   {t:8.2f} ms")

    # Stage 7: lighting + sky + post
    @jax.jit
    def s_light(gbuf):
        sky_img = sky.sky_background(
            jnp.asarray(view.inverse_view), view.projection[0, 0],
            view.projection[1, 1], scene.sun_direction, scene.sun_color, h, w,
            exposure=params.sun_exposure)
        direct = lighting.sun_lighting(
            gbuf, jnp.asarray(view.position), scene.sun_direction,
            scene.sun_color, None, params.sun_exposure)
        lit = lighting.compose_lit_scene(gbuf, direct, None, None, sky_img)
        return post.to_uint8(post.composite(lit, None, params.bloom_strength))

    t, _ = timeit(s_light, gbuf)
    print(f"light+sky+post:    {t:8.2f} ms")


if __name__ == "__main__":
    main()
