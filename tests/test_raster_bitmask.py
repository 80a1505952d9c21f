"""Bitmask-driven rasterizer vs the XLA oracle AND the binned kernel.

The bitmask kernel's contract is strict: identical eval formulas and per-window
touch order as rasterize_binned, exact (compare/select) combine — so its output
must be BIT-IDENTICAL to the binned kernel, not merely ULP-close. The XLA-oracle
comparison reuses the binned suite's tolerance (ULP-edge visibility flips only).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from androidrenderer_tpu.ops.raster import rasterize_depth
from androidrenderer_tpu.ops.raster.raster_binned import rasterize_binned
from androidrenderer_tpu.ops.raster.raster_bitmask import rasterize_bitmask

from test_raster import random_scene
from test_raster_binned import _setup_for, _xla_ref, W, H


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("double_sided", [True, False])
def test_bitmask_matches_xla_and_binned(seed, double_sided):
    verts, tris = random_scene(seed, n_tris=50)
    setup = _setup_for(verts, tris, double_sided)
    depth_ref, vis_ref = _xla_ref(setup)

    depth, vis = rasterize_bitmask(
        setup, H, W, num_slabs=2, chunk=32, kb=4, win_h=8, interpret=True
    )
    depth, vis = np.asarray(depth), np.asarray(vis)

    np.testing.assert_allclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    disagree = vis != vis_ref
    hard = disagree & (depth == depth_ref)
    assert hard.sum() == 0, f"{hard.sum()} visibility mismatches off ULP edges"

    db, vb = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, cap=6, kb=4, win_h=8, interpret=True
    )
    assert np.array_equal(depth, np.asarray(db))
    assert np.array_equal(vis, np.asarray(vb))


def test_bitmask_depth_only_affine():
    """Ortho depth-only mode (the CSM/RSM path) against the binned kernel."""
    verts, tris = random_scene(3, n_tris=60)
    setup = _setup_for(verts, tris, True)
    db = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, depth_only=True, interpret=True
    )
    dm = rasterize_bitmask(
        setup, H, W, num_slabs=2, chunk=32, depth_only=True, interpret=True
    )
    assert np.array_equal(np.asarray(dm), np.asarray(db))


def test_bitmask_sparse_validity():
    """Mostly-invalid sets (frustum-culled cascades): dead chunks scan-free."""
    verts, tris = random_scene(7, n_tris=160)
    setup = _setup_for(verts, tris, True)
    keep = np.zeros(tris.shape[0], dtype=bool)
    keep[[37, 63, 64, 100, 159]] = True
    setup = setup._replace(valid=setup.valid & jnp.asarray(keep))
    depth_ref, vis_ref = _xla_ref(setup)

    depth, vis = rasterize_bitmask(
        setup, H, W, num_slabs=2, chunk=32, kb=4, win_h=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-6, atol=1e-9)
    disagree = np.asarray(vis) != vis_ref
    assert (disagree & (np.asarray(depth) == depth_ref)).sum() == 0


def test_bitmask_z_limit_peeling():
    """Depth-peel upper bound matches the binned kernel bit-exactly."""
    from androidrenderer_tpu.ops.raster.binning import bin_triangles

    verts, tris = random_scene(4, n_tris=60)
    setup = _setup_for(verts, tris, True)
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    d0 = rasterize_depth(setup, bins, H, W, 16, 128, chunk=32)
    zlim = jnp.asarray(d0)

    db, vb = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    dm, vm = rasterize_bitmask(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    assert np.array_equal(np.asarray(dm), np.asarray(db))
    assert np.array_equal(np.asarray(vm), np.asarray(vb))


def test_bitmask_alpha_bitmap():
    """In-kernel 16x16 barycentric alpha bitmaps match the binned kernel."""
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
    from androidrenderer_tpu.scene.procedural import alpha_test_scene

    scene, _ = alpha_test_scene().build()
    w, h = 128, 96
    cam = Camera(fov_degrees=75.0, aspect=w / h, render_resolution=(w, h))
    cam.set_position([0.0, 1.0, -3.0])
    vd = cam.view_data()
    clip = transform_to_clip(scene.positions, jnp.asarray(vd.view_proj))
    setup = triangle_setup(
        clip, scene.tri_indices, w, h,
        double_sided=scene.tri_double_sided, tri_valid=scene.tri_valid,
    )
    masked = scene.tri_alpha_mode == 1
    setup_m = setup._replace(valid=setup.valid & masked)
    db, vb = rasterize_binned(
        setup_m, h, w, num_slabs=2, chunk=32, win_h=8,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    dm, vm = rasterize_bitmask(
        setup_m, h, w, num_slabs=2, chunk=32, win_h=8,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    assert np.array_equal(np.asarray(dm), np.asarray(db))
    assert np.array_equal(np.asarray(vm), np.asarray(vb))


def test_bitmask_full_frame_bit_identical():
    """config.raster_bitmask flips main+CSM+RSM kernels; the full LPV frame
    must be bit-identical to the binned path (production wiring guarantee)."""
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import GIMode, RenderConfig, RenderParams
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.scene.procedural import cornell_scene

    W2 = H2 = 128
    scene, _ = cornell_scene().build(with_bvh=False)
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W2, H2))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    view = cam.view_data()
    outs = []
    for bm in (False, True):
        cfg = RenderConfig(
            render_width=W2, render_height=H2, output_width=W2, output_height=H2,
            tile_height=32, tile_width=128, max_tris_per_tile=16384,
            sky=False, bloom=False, occlusion_culling=False,
            alpha_masking=False, translucency=False,
            gi_mode=GIMode.LPV, lpv_num_cascades=2, lpv_resolution=8,
            lpv_rsm_resolution=32, lpv_num_propagation_steps=4,
            shadow_cascade_resolution=128, num_shadow_cascades=2,
            pallas_interpret=True, raster_bitmask=bm,
        )
        out, _ = make_renderer(cfg)(
            scene, view, RenderParams.default(), initial_temporal_state(H2, W2)
        )
        outs.append(np.asarray(out.image))
    assert np.array_equal(outs[0], outs[1])


@pytest.mark.parametrize("width", [256, 512, 2560, 4096])
def test_bitmask_multi_column_windows(width):
    """ncols > 1 exercises the column-bit packing (uint32 saturating masks)
    and cross-column spans — the W=128 fixtures only ever touch bit 0. The
    2560/4096 widths cover ncols > 16 (4096-wide CSM targets), where the mask
    must saturate at bit 31; the binned kernel's packed bbox stops at 2048, so
    those compare against the XLA oracle only."""
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
    from androidrenderer_tpu.ops.raster.binning import bin_triangles
    from androidrenderer_tpu.ops.raster import rasterize_visibility

    h = 64
    verts, tris = random_scene(9, n_tris=80)
    cam = Camera(fov_degrees=75.0, aspect=width / h, render_resolution=(width, h))
    cam.set_position([0.0, 0.0, 0.0])
    cam.yaw = np.pi
    vd = cam.view_data()
    clip = transform_to_clip(jnp.asarray(verts), jnp.asarray(vd.view_proj))
    setup = triangle_setup(
        clip, jnp.asarray(tris), width, h,
        double_sided=jnp.full((tris.shape[0],), True),
    )
    bins = bin_triangles(setup, h // 16, width // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, h, width, 16, 128, chunk=32))
    vis_ref = np.asarray(rasterize_visibility(
        setup, bins, jnp.asarray(depth_ref), 16, 128, chunk=32))

    depth, vis = rasterize_bitmask(
        setup, h, width, num_slabs=2, chunk=32, kb=4, win_h=8, interpret=True
    )
    # XLA-vs-kernel FMA contraction: ULP-scale depth differences, amplified at
    # perspective edges where q -> 0 (measured max rel 1.4e-5 on ONE 512-wide
    # edge pixel; 256-wide max 1.47e-6; 2560-wide max 2.2e-5 on 4 pixels). The
    # STRICT contract is kernel-vs-kernel bit equality below.
    rtol = 2e-5 if width <= 512 else 5e-5
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=rtol, atol=1e-9)
    disagree = np.asarray(vis) != vis_ref
    assert (disagree & (np.asarray(depth) == depth_ref)).sum() == 0

    if width <= 2048:
        db, vb = rasterize_binned(
            setup, h, width, num_slabs=2, chunk=32, cap=6, kb=4, win_h=8,
            interpret=True,
        )
        assert np.array_equal(np.asarray(depth), np.asarray(db))
        assert np.array_equal(np.asarray(vis), np.asarray(vb))
