"""Sub-block lane-fold kernel vs the binned kernel and the XLA oracle
(interpret mode).

rasterize_subfold shares rasterize_bitmask's win32 tables/walk order and
raster_lanes' eval formulas, so the contract is the lanes contract: depth
allclose, visibility flips only where depth differs (the raster_xla ULP-edge
rule), tie-break = lexicographic (z, id) max == binned's ordered
later-id-wins fold. The per-sub-block list split is conservative (bbox rows),
so its only observable effect must be NONE — every test here would catch a
touch dropped from a sub-block it covers."""

import numpy as np
import jax.numpy as jnp
import pytest

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.ops.raster import (
    rasterize_depth,
    rasterize_visibility,
    transform_to_clip,
    triangle_setup,
)
from androidrenderer_tpu.ops.raster.binning import bin_triangles
from androidrenderer_tpu.ops.raster.raster_binned import rasterize_binned
from raster_subfold import rasterize_subfold

from test_raster import random_scene

W, H = 128, 64


def _setup_for(verts, tris, double_sided=True):
    cam = Camera(fov_degrees=75.0, aspect=W / H, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 0.0])
    cam.yaw = np.pi
    vd = cam.view_data()
    clip = transform_to_clip(jnp.asarray(verts), jnp.asarray(vd.view_proj))
    dbl = jnp.full((tris.shape[0],), double_sided)
    return triangle_setup(clip, jnp.asarray(tris), W, H, double_sided=dbl)


def _xla_ref(setup):
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    vis = np.asarray(
        rasterize_visibility(setup, bins, jnp.asarray(depth), 16, 128, chunk=32)
    )
    return depth, vis


def _assert_matches(depth, vis, depth_ref, vis_ref):
    depth, vis = np.asarray(depth), np.asarray(vis)
    np.testing.assert_allclose(depth, depth_ref, rtol=5e-6, atol=1e-9)
    disagree = vis != vis_ref
    hard = disagree & (depth == depth_ref)
    assert hard.sum() == 0, f"{hard.sum()} visibility mismatches off ULP edges"
    assert disagree.mean() < 0.005


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("double_sided", [True, False])
def test_subfold_matches_xla(seed, double_sided):
    verts, tris = random_scene(seed, n_tris=50)
    setup = _setup_for(verts, tris, double_sided)
    depth_ref, vis_ref = _xla_ref(setup)
    depth, vis = rasterize_subfold(
        setup, H, W, num_slabs=2, chunk=32, kb=4, interpret=True
    )
    _assert_matches(depth, vis, depth_ref, vis_ref)


@pytest.mark.parametrize("unroll", [1, 2])
def test_subfold_matches_binned(unroll):
    verts, tris = random_scene(4, n_tris=80)
    setup = _setup_for(verts, tris, True)
    d_b, v_b = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, win_h=8, interpret=True
    )
    d_s, v_s = rasterize_subfold(
        setup, H, W, num_slabs=2, chunk=32, unroll=unroll, interpret=True
    )
    _assert_matches(d_s, v_s, np.asarray(d_b), np.asarray(v_b))


def test_subfold_subblock_straddle():
    """Thin horizontal slivers placed to straddle every sub-block boundary of
    a window — the exact geometry the per-sub-block list split could drop if
    the bbox-row range were off by one."""
    rows = []
    tris = []
    k = 0
    for i, yc in enumerate(np.linspace(-0.95, 0.95, 16)):
        z = 0.3 + 0.04 * i
        rows += [
            [-1.2, yc - 0.015, z], [1.2, yc - 0.015, z], [0.0, yc + 0.015, z]
        ]
        tris.append([k, k + 1, k + 2])
        k += 3
    verts = np.asarray(rows, np.float32)
    tris = np.asarray(tris, np.int32)
    clip = jnp.concatenate(
        [jnp.asarray(verts), jnp.ones((verts.shape[0], 1), jnp.float32)], axis=1
    )
    setup = triangle_setup(clip, jnp.asarray(tris), W, H)
    d_b, v_b = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, win_h=8, interpret=True
    )
    d_s, v_s = rasterize_subfold(
        setup, H, W, num_slabs=2, chunk=32, interpret=True
    )
    _assert_matches(d_s, v_s, np.asarray(d_b), np.asarray(v_b))
    assert (np.asarray(v_s) >= 0).sum() > 100  # the slivers actually drew


def test_subfold_depth_only_affine():
    """Ortho (shadow-style) projection through the affine-z fast path."""
    rng = np.random.default_rng(7)
    verts = rng.uniform([-1.5, -1.5, 0.1], [1.5, 1.5, 0.9], (90, 3)).astype(
        np.float32
    )
    tris = rng.integers(0, 90, (40, 3)).astype(np.int32)
    clip = jnp.concatenate(
        [jnp.asarray(verts), jnp.ones((90, 1), jnp.float32)], axis=1
    )
    setup = triangle_setup(clip, jnp.asarray(tris), W, H)
    d_b = np.asarray(
        rasterize_binned(setup, H, W, num_slabs=2, chunk=32, depth_only=True,
                         affine_z=True, interpret=True)
    )
    d_s = np.asarray(
        rasterize_subfold(setup, H, W, num_slabs=2, chunk=32, depth_only=True,
                          affine_z=True, interpret=True)
    )
    close = np.isclose(d_s, d_b, rtol=5e-6, atol=1e-9)
    assert close.mean() > 0.995
    assert np.allclose(d_s[close], d_b[close])


def test_subfold_z_limit_peeling():
    verts, tris = random_scene(5, n_tris=60)
    setup = _setup_for(verts, tris, True)
    d0, _ = rasterize_subfold(setup, H, W, num_slabs=2, chunk=32, interpret=True)
    zlim = jnp.asarray(np.asarray(d0))
    d_b, v_b = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    d_s, v_s = rasterize_subfold(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    d_s, d_b = np.asarray(d_s), np.asarray(d_b)
    zl = np.asarray(zlim)
    bad = ~np.isclose(d_s, d_b, rtol=5e-6, atol=1e-9)
    at_boundary = np.isclose(d_s, zl, rtol=4e-6) | np.isclose(
        d_b, zl, rtol=4e-6
    )
    assert (bad & ~at_boundary).sum() == 0
    covered = d_s > 0
    assert np.all(d_s[covered] < zl[covered] + 1e-12)


def test_subfold_alpha_bitmap():
    """Opaque/masked two-ended sub-block lists: coverage matches the binned
    kernel's alpha-grid path (same bitmap semantics)."""
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
    d_b, v_b = rasterize_binned(
        setup, h, w, num_slabs=2, chunk=32, win_h=8,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    d_s, v_s = rasterize_subfold(
        setup, h, w, num_slabs=2, chunk=32,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    _assert_matches(d_s, v_s, np.asarray(d_b), np.asarray(v_b))
    assert (np.asarray(v_s) >= 0).sum() > 50


def test_subfold_sparse_validity():
    """Mostly-invalid triangle sets (the CSM near-cascade shape): dead chunks,
    the live-first permutation, and ragged final batches must be harmless."""
    verts, tris = random_scene(7, n_tris=160)
    setup = _setup_for(verts, tris, True)
    keep = np.zeros(tris.shape[0], dtype=bool)
    keep[[37, 63, 64, 100, 159]] = True
    setup = setup._replace(valid=setup.valid & jnp.asarray(keep))
    depth_ref, vis_ref = _xla_ref(setup)
    depth, vis = rasterize_subfold(
        setup, H, W, num_slabs=2, chunk=32, kb=4, interpret=True
    )
    _assert_matches(depth, vis, depth_ref, vis_ref)
