"""Pallas raster kernel vs the XLA reduction rasterizer (interpret mode on CPU)."""

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
from androidrenderer_tpu.ops.raster.raster_pallas import (
    bucket_by_slab,
    pack_records,
    rasterize_pallas,
)

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


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("double_sided", [True, False])
def test_pallas_matches_xla(seed, double_sided):
    verts, tris = random_scene(seed, n_tris=50)
    setup = _setup_for(verts, tris, double_sided)

    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    vis_ref = np.asarray(
        rasterize_visibility(setup, bins, jnp.asarray(depth_ref), 16, 128, chunk=32)
    )

    depth, vis = rasterize_pallas(
        setup, H, W, num_slabs=2, chunk=32, interpret=True
    )
    depth, vis = np.asarray(depth), np.asarray(vis)

    # FMA contraction differs between the two lowerings => ULP-level depth deltas.
    np.testing.assert_allclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    # Tie-break semantics match (max id at equal depth); allow disagreement only
    # where the ULP depth difference flipped a z-test.
    disagree = vis != vis_ref
    ulp_edges = depth != depth_ref
    hard = disagree & ~ulp_edges
    assert hard.sum() == 0, f"{hard.sum()} visibility mismatches off ULP edges"
    assert disagree.mean() < 0.005


def test_pallas_depth_only_mode():
    verts, tris = random_scene(3, n_tris=30)
    setup = _setup_for(verts, tris)
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    depth = np.asarray(
        rasterize_pallas(setup, H, W, num_slabs=2, chunk=32, depth_only=True,
                         interpret=True)
    )
    # ULP coverage flips at triangle edges can swap which triangle wins a pixel;
    # everything else matches to float precision.
    close = np.isclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    assert close.mean() > 0.995
    assert np.allclose(depth[close], depth_ref[close])


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("impl", ["fused", "hybrid", "fused8"])
def test_fused_and_hybrid_match_xla(seed, impl):
    """The production fused kernel and the hybrid splat+window raster must match
    the XLA oracle (identical formulas; ULP-edge disagreements only)."""
    from androidrenderer_tpu.ops.raster.raster_fused import (
        rasterize_fused, rasterize_hybrid,
    )

    verts, tris = random_scene(seed, n_tris=60)
    setup = _setup_for(verts, tris, double_sided=(seed == 0))

    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    vis_ref = np.asarray(
        rasterize_visibility(setup, bins, jnp.asarray(depth_ref), 16, 128, chunk=32)
    )

    if impl == "fused":
        depth, vis = rasterize_fused(setup, H, W, num_slabs=2, interpret=True)
    elif impl == "fused8":  # the narrow-window (RSM/shadow) configuration
        depth, vis = rasterize_fused(setup, H, W, num_slabs=2, win_h=8,
                                     interpret=True)
    else:
        depth, vis = rasterize_hybrid(setup, H, W, num_slabs=2, interpret=True)
    depth, vis = np.asarray(depth), np.asarray(vis)

    # ULP-level coverage flips at near-ties can swap the winning triangle on a
    # handful of edge pixels; everywhere else depth matches to float precision.
    close = np.isclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    assert close.mean() > 0.999
    np.testing.assert_allclose(depth[~close], depth_ref[~close], rtol=1e-4)
    disagree = vis != vis_ref
    ulp_edges = depth != depth_ref
    hard = disagree & ~ulp_edges
    assert hard.sum() == 0, f"{hard.sum()} visibility mismatches off ULP edges"
    assert disagree.mean() < 0.005


def test_hybrid_matches_fused_subpixel_scene():
    """A far-away (subpixel-triangle-dominated) view: the hybrid's splat path must
    agree with the pure window kernel bit-for-bit (same formulas, same ties)."""
    from androidrenderer_tpu.ops.raster.raster_fused import (
        rasterize_fused, rasterize_hybrid,
    )

    rng = np.random.default_rng(7)
    # Cloud of tiny triangles ~30 m ahead: nearly all bbox to a single pixel.
    base = rng.uniform([-6, -3, -36], [6, 3, -24], size=(400, 3))
    jitter = rng.uniform(-0.05, 0.05, size=(400, 2, 3))
    verts = np.concatenate(
        [base[:, None], base[:, None] + jitter], axis=1
    ).reshape(-1, 3).astype(np.float32)
    tris = np.arange(1200, dtype=np.int32).reshape(-1, 3)
    setup = _setup_for(verts, tris, double_sided=True)

    d_f, v_f = rasterize_fused(setup, H, W, num_slabs=2, interpret=True)
    d_h, v_h = rasterize_hybrid(setup, H, W, num_slabs=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(d_f), np.asarray(d_h))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_h))


def test_bucket_by_slab_counts():
    verts, tris = random_scene(4, n_tris=40)
    setup = _setup_for(verts, tris)
    records = pack_records(setup)
    tables, counts = bucket_by_slab(records, 4, H // 4)
    counts = np.asarray(counts)
    bbox = np.asarray(setup.bbox)
    valid = np.asarray(setup.valid)
    for s in range(4):
        lo, hi = s * (H // 4), (s + 1) * (H // 4) - 1
        expect = ((bbox[:, 3] >= lo) & (bbox[:, 1] <= hi) & valid).sum()
        assert counts[s] == expect
    # Table rows beyond count are zero (padding id).
    t = np.asarray(tables)
    for s in range(4):
        assert (t[s, counts[s]:, 15] == 0).all()
