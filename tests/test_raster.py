"""Raster engine vs the numpy oracle: depth, visibility, interpolation."""

import numpy as np
import jax.numpy as jnp
import pytest

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.ops.raster import (
    transform_to_clip,
    triangle_setup,
    rasterize_depth,
    rasterize_visibility,
)
from androidrenderer_tpu.ops.raster.binning import bin_triangles
from androidrenderer_tpu.ops.raster.interpolate import (
    compute_barycentrics,
    interpolate_attributes,
)

from reference_raster import rasterize_reference

W = H = 64
TILE_H, TILE_W = 16, 32


def random_scene(seed, n_tris=40, spread=3.0, z_range=(2.0, 12.0)):
    rng = np.random.default_rng(seed)
    centers = np.stack(
        [
            rng.uniform(-spread, spread, n_tris),
            rng.uniform(-spread, spread, n_tris),
            -rng.uniform(*z_range, n_tris),
        ],
        axis=1,
    )
    offsets = rng.normal(0, 0.8, (n_tris, 3, 3))
    verts = (centers[:, None, :] + offsets).reshape(-1, 3).astype(np.float32)
    tris = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return verts, tris


def render_both(verts, tris, cam=None):
    if cam is None:
        cam = Camera(fov_degrees=75.0, aspect=W / H, render_resolution=(W, H))
        cam.set_position([0.0, 0.0, 0.0])
        cam.yaw = np.pi  # look down -z (flycam forward = +z at yaw 0)
    vd = cam.view_data()
    clip = np.asarray(transform_to_clip(jnp.asarray(verts), jnp.asarray(vd.view_proj)))

    setup = triangle_setup(jnp.asarray(clip), jnp.asarray(tris), W, H)
    bins = bin_triangles(setup, H // TILE_H, W // TILE_W, TILE_H, TILE_W, cap=256)
    depth = rasterize_depth(setup, bins, H, W, TILE_H, TILE_W, chunk=32)
    vis = rasterize_visibility(setup, bins, np.asarray(depth), TILE_H, TILE_W, chunk=32)

    ref_depth, ref_vis, ref_bary = rasterize_reference(clip, tris, W, H)
    return np.asarray(depth), np.asarray(vis), ref_depth, ref_vis, ref_bary, setup, vd


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_depth_matches_oracle(seed):
    verts, tris = random_scene(seed)
    depth, vis, ref_depth, ref_vis, _, _, _ = render_both(verts, tris)

    # Depth agrees within f32 tolerance away from triangle edges; a small fraction of
    # edge pixels may differ due to f32 vs f64 coverage decisions.
    close = np.isclose(depth, ref_depth, rtol=1e-4, atol=1e-6)
    assert close.mean() > 0.995, f"depth mismatch fraction {1 - close.mean():.4f}"

    id_match = (vis == ref_vis) | ~close
    assert id_match.mean() > 0.99, f"vis mismatch fraction {1 - id_match.mean():.4f}"

    # Something was actually drawn.
    assert (vis >= 0).mean() > 0.05


def test_behind_camera_is_culled():
    # All triangles behind the camera -> nothing drawn.
    verts, tris = random_scene(3)
    verts = verts.copy()
    verts[:, 2] = np.abs(verts[:, 2]) + 1.0  # camera at origin looking down -z
    depth, vis, *_ = render_both(verts, tris)
    assert (vis == -1).all()
    assert (depth == 0.0).all()


def test_near_plane_rejection():
    # A triangle closer than the near plane must be rejected (z_ndc > 1).
    cam = Camera(fov_degrees=75.0, aspect=1.0, z_near=0.05, render_resolution=(W, H))
    cam.yaw = np.pi
    verts = np.array(
        [[-1, -1, -0.01], [1, -1, -0.01], [0, 1, -0.01]], dtype=np.float32
    )
    tris = np.array([[0, 1, 2]], dtype=np.int32)
    depth, vis, *_ = render_both(verts, tris, cam)
    assert (vis == -1).all()


def test_straddling_triangle_partial():
    # One triangle crossing the camera plane: front part must rasterize, no NaNs.
    verts = np.array(
        [[0.0, -0.5, -5.0], [0.5, 0.5, 5.0], [-0.5, 0.5, 5.0]], dtype=np.float32
    )
    tris = np.array([[0, 1, 2]], dtype=np.int32)
    depth, vis, ref_depth, ref_vis, *_ = render_both(verts, tris)
    assert np.isfinite(depth).all()
    # Oracle agrees on what is covered.
    close = np.isclose(depth, ref_depth, rtol=1e-3, atol=1e-6)
    assert close.mean() > 0.99


def test_interpolation_recovers_linear_attribute():
    # Interpolating world position must reproduce the rasterized point: verify via
    # re-projection — project(interp_world) ~ the pixel center.
    verts, tris = random_scene(5, n_tris=25)
    depth, vis, _, _, _, setup, vd = render_both(verts, tris)

    bary = compute_barycentrics(jnp.asarray(vis), setup, jnp.asarray(tris))
    interp = interpolate_attributes(bary, {"world": jnp.asarray(verts)})
    world = np.asarray(interp["world"])  # (H, W, 3)

    ys, xs = np.nonzero(vis >= 0)
    take = slice(0, min(500, len(ys)))
    pts = world[ys[take], xs[take]]
    h = pts @ vd.view_proj[:, :3].T.astype(np.float64) + vd.view_proj[:, 3]
    ndc = h[:, :2] / h[:, 3:4]
    px = (ndc[:, 0] + 1) * 0.5 * W - 0.5
    py = (1 - ndc[:, 1]) * 0.5 * H - 0.5
    assert np.abs(px - xs[take]).max() < 0.05
    assert np.abs(py - ys[take]).max() < 0.05
    # Interpolated w equals clip w of the reprojected point.
    wbuf = np.asarray(bary.w)[ys[take], xs[take]]
    assert np.allclose(wbuf, h[:, 3], rtol=1e-3)


def test_binning_counts_and_overflow_reporting():
    verts, tris = random_scene(7, n_tris=60)
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.yaw = np.pi
    vd = cam.view_data()
    clip = transform_to_clip(jnp.asarray(verts), jnp.asarray(vd.view_proj))
    setup = triangle_setup(clip, jnp.asarray(tris), W, H)
    bins_small = bin_triangles(setup, H // TILE_H, W // TILE_W, TILE_H, TILE_W, cap=4)
    bins_big = bin_triangles(setup, H // TILE_H, W // TILE_W, TILE_H, TILE_W, cap=256)
    counts_small = np.asarray(bins_small.counts)
    counts_big = np.asarray(bins_big.counts)
    # True counts are capacity-independent.
    assert (counts_small == counts_big).all()
    # Lists are -1 padded and contain at most min(count, cap) real entries.
    lists = np.asarray(bins_small.lists)
    real = (lists >= 0).sum(axis=1)
    assert (real == np.minimum(counts_small, 4)).all()
