"""Sublane-batched Pallas kernel vs the binned kernel and the XLA oracle
(interpret mode).

The lanes kernel evaluates 8 touches per issued instruction with coefficients
delivered as VMEM vector rows; its arithmetic matches raster_binned's formulas
up to FMA-contraction ULPs, so the contract is: depth allclose, visibility may
flip only where depth differs (the raster_xla ULP-edge rule), tie-break =
lexicographic (z, id) max == binned's ordered later-id-wins fold."""

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
from raster_lanes import rasterize_lanes

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
def test_lanes_matches_xla(seed, double_sided):
    verts, tris = random_scene(seed, n_tris=50)
    setup = _setup_for(verts, tris, double_sided)
    depth_ref, vis_ref = _xla_ref(setup)
    depth, vis = rasterize_lanes(
        setup, H, W, num_slabs=2, chunk=32, kb=4, interpret=True
    )
    _assert_matches(depth, vis, depth_ref, vis_ref)


@pytest.mark.parametrize("unroll", [1, 2])
def test_lanes_matches_binned(unroll):
    """Same scene through both kernels: identical in interpret mode up to
    FMA-contraction ULPs on depth, vis flips only there."""
    verts, tris = random_scene(4, n_tris=80)
    setup = _setup_for(verts, tris, True)
    d_b, v_b = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, win_h=8, interpret=True
    )
    d_l, v_l = rasterize_lanes(
        setup, H, W, num_slabs=2, chunk=32, unroll=unroll, interpret=True
    )
    _assert_matches(d_l, v_l, np.asarray(d_b), np.asarray(v_b))


def test_lanes_depth_only():
    verts, tris = random_scene(3, n_tris=30)
    setup = _setup_for(verts, tris)
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    depth = np.asarray(
        rasterize_lanes(
            setup, H, W, num_slabs=2, chunk=32, depth_only=True, interpret=True
        )
    )
    close = np.isclose(depth, depth_ref, rtol=5e-6, atol=1e-9)
    assert close.mean() > 0.995
    assert np.allclose(depth[close], depth_ref[close])


def test_lanes_affine_z_matches_binned():
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
    d_l = np.asarray(
        rasterize_lanes(setup, H, W, num_slabs=2, chunk=32, depth_only=True,
                        affine_z=True, interpret=True)
    )
    close = np.isclose(d_l, d_b, rtol=5e-6, atol=1e-9)
    assert close.mean() > 0.995
    assert np.allclose(d_l[close], d_b[close])


def test_lanes_z_limit_peeling():
    """z_limit (depth peeling upper bound): accepted fragments strictly behind
    the limit, agreement with binned away from peel boundaries."""
    verts, tris = random_scene(5, n_tris=60)
    setup = _setup_for(verts, tris, True)
    d0, _ = rasterize_lanes(setup, H, W, num_slabs=2, chunk=32, interpret=True)
    zlim = jnp.asarray(np.asarray(d0))
    d_b, v_b = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    d_l, v_l = rasterize_lanes(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    d_l, d_b = np.asarray(d_l), np.asarray(d_b)
    zl = np.asarray(zlim)
    bad = ~np.isclose(d_l, d_b, rtol=5e-6, atol=1e-9)
    at_boundary = np.isclose(d_l, zl, rtol=4e-6) | np.isclose(
        d_b, zl, rtol=4e-6
    )
    assert (bad & ~at_boundary).sum() == 0
    covered = d_l > 0
    assert np.all(d_l[covered] < zl[covered] + 1e-12)


def test_lanes_alpha_bitmap():
    """In-kernel barycentric alpha bitmaps: coverage matches the binned
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
    masked = scene.tri_alpha_mode == 1
    setup_m = setup._replace(valid=setup.valid & masked)
    d_b, v_b = rasterize_binned(
        setup_m, h, w, num_slabs=2, chunk=32, win_h=8,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    d_l, v_l = rasterize_lanes(
        setup_m, h, w, num_slabs=2, chunk=32,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    _assert_matches(d_l, v_l, np.asarray(d_b), np.asarray(v_b))
    assert (np.asarray(v_l) >= 0).sum() > 50


def test_lanes_sparse_validity():
    """Mostly-invalid triangle sets (the CSM near-cascade shape) render
    identically — dead chunks and ragged final batches must be harmless."""
    verts, tris = random_scene(7, n_tris=160)
    setup = _setup_for(verts, tris, True)
    keep = np.zeros(tris.shape[0], dtype=bool)
    keep[[37, 63, 64, 100, 159]] = True
    setup = setup._replace(valid=setup.valid & jnp.asarray(keep))
    depth_ref, vis_ref = _xla_ref(setup)
    depth, vis = rasterize_lanes(
        setup, H, W, num_slabs=2, chunk=32, kb=4, interpret=True
    )
    _assert_matches(depth, vis, depth_ref, vis_ref)
