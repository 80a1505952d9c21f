"""Regenerate golden images for the SSIM regression tests (tests/test_goldens.py).

Run on the CPU backend (deterministic across hosts):
    python tools/make_goldens.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import AAMode, GIMode, RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene, courtyard_scene
from androidrenderer_tpu.utils.image import save_png

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens"
W = H = 128


def render(scene_fn, cam_pos, cam_pitch_yaw, frames=1, render_scale=1, **cfg):
    rw, rh = W * render_scale, H * render_scale
    # cap=4096: courtyard peaks at ~2.4k opaque triangles in one 32x128 tile at
    # this view — 1024 silently truncated bins for months (the XLA raster drops
    # over-capacity triangles), so the old goldens baked in missing geometry and
    # ANY change to the culled set (e.g. finer frustum culling) "failed" SSIM.
    # _assert_no_bin_overflow below keeps this from regressing silently again.
    config = RenderConfig(
        render_width=rw, render_height=rh, output_width=W, output_height=H,
        max_tris_per_tile=4096, occlusion_culling=False, **cfg,
    )
    scene, _ = scene_fn().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(rw, rh))
    cam.set_position(cam_pos)
    cam.pitch, cam.yaw = cam_pitch_yaw
    _assert_no_bin_overflow(scene, cam.view_data(), config)
    renderer = make_renderer(config)
    temporal = initial_temporal_state(
        rh, rw, probe_cascades=config.probe_cascades, probe_grid=config.probe_grid,
        probe_spacing=config.probe_spacing,
    )
    for _ in range(frames):
        out, temporal = renderer(
            scene, cam.view_data(), RenderParams.default(), temporal
        )
    return np.asarray(out.image)


def _assert_no_bin_overflow(scene, view, config):
    """Goldens must never bake in bin-capacity truncation: the XLA raster drops
    triangles beyond max_tris_per_tile per tile, so an under-sized cap renders
    with missing geometry that LOOKS plausible — and then any change to the
    culled/binned set (e.g. a finer frustum test) shifts WHICH triangles drop
    and spuriously fails SSIM. Bound the check with the full untrimmed valid
    set (a superset of anything culling passes to the binner)."""
    import jax.numpy as jnp

    from androidrenderer_tpu.ops.raster.binning import bin_triangles
    from androidrenderer_tpu.ops.raster.setup import triangle_setup_corners

    h, w = config.render_height, config.render_width
    su = triangle_setup_corners(
        scene.tri_corner_pos, jnp.asarray(view.view_proj), w, h,
        double_sided=scene.tri_double_sided, tri_valid=scene.tri_valid,
    )
    bins = bin_triangles(
        su, h // config.tile_height, config.tiles_x,
        config.tile_height, config.tile_width, cap=16,
    )
    peak = int(np.asarray(bins.counts).max())
    assert peak <= config.max_tris_per_tile, (
        f"golden scene peaks at {peak} triangles in one "
        f"{config.tile_height}x{config.tile_width} tile but max_tris_per_tile="
        f"{config.max_tris_per_tile} — raise the cap (silent truncation)"
    )


CASES = {
    "cornell_direct": lambda: render(
        cornell_scene, [0, 0, 2.2], (0.0, np.pi),
        sky=False, bloom=False, shadow_cascade_resolution=256,
    ),
    # lpv_cell_size=0.2261: cornell's walls are axis-aligned planes at +-1.0 —
    # EXACT multiples of the default 0.25 cell, and cascade mins snap to the
    # cell lattice, so every wall's VPLs sat exactly on a cell boundary. Any
    # refactor that shifts interpolated world positions by 1 ULP (e.g. a
    # mathematically-identical resolve reformulation) then flips ENTIRE WALL
    # LAYERS to the adjacent cell (measured: 26% mean radiance change, SSIM
    # 0.967 from a <=4e-6 wpos delta). 0.2261 keeps every wall plane >=0.13
    # cells off the lattice at both cascade scales, so the gate tests VALUES,
    # not coin-flip boundary assignment. Real scenes (Sponza) are generically
    # off-lattice; the degeneracy was an artifact of the synthetic fixture.
    "cornell_lpv": lambda: render(
        cornell_scene, [0, 0, 2.2], (0.0, np.pi),
        sky=False, bloom=False, shadow_cascade_resolution=256,
        gi_mode=GIMode.LPV, lpv_num_cascades=2, lpv_resolution=16,
        lpv_rsm_resolution=64, lpv_num_propagation_steps=8,
        lpv_cell_size=0.2261,
    ),
    "courtyard_csm": lambda: render(
        courtyard_scene, [0, 1.7, 6.0], (-0.05, np.pi),
        shadow_cascade_resolution=256,
    ),
    # Round-3 additions (VERDICT #7): RTGI, probe-cache, and VRSAA goldens.
    "cornell_rtgi": lambda: render(
        cornell_scene, [0, 0, 2.2], (0.0, np.pi),
        sky=False, bloom=False, shadow_cascade_resolution=256,
        gi_mode=GIMode.RT, rtgi_num_bounces=1,
    ),
    "cornell_probes": lambda: render(
        cornell_scene, [0, 0, 2.2], (0.0, np.pi),
        sky=False, bloom=False, shadow_cascade_resolution=256,
        gi_mode=GIMode.PROBES, probe_grid=(8, 8, 8), probe_spacing=0.4,
        probe_budget=256, probe_rays=32,
        frames=3,  # budgeted updates need a few frames to fill the cache
    ),
    "courtyard_vrsaa": lambda: render(
        courtyard_scene, [0, 1.7, 6.0], (-0.05, np.pi),
        shadow_cascade_resolution=256, render_scale=2,
        aa_mode=AAMode.VRSAA, translucency=False,
    ),
}


def main():
    import sys

    only = set(sys.argv[1:])  # optional fixture names: rebake just these
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, fn in CASES.items():
        if only and name not in only:
            continue
        img = fn()
        save_png(str(GOLDEN_DIR / f"{name}.png"), img)
        print(f"wrote {name}.png mean={img.mean():.2f}")


if __name__ == "__main__":
    main()
