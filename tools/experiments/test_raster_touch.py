"""Touch-expansion rasterizer vs the XLA reduction rasterizer."""

import numpy as np
import jax.numpy as jnp
import pytest

from androidrenderer_tpu.ops.raster import rasterize_depth, rasterize_visibility
from androidrenderer_tpu.ops.raster.binning import bin_triangles
from raster_touch import rasterize_touch

from test_raster import random_scene
from test_raster_pallas import _setup_for, W, H


@pytest.mark.parametrize("seed", [0, 2])
@pytest.mark.parametrize("double_sided", [True, False])
def test_touch_matches_xla(seed, double_sided):
    verts, tris = random_scene(seed, n_tris=60)
    setup = _setup_for(verts, tris, double_sided)

    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    vis_ref = np.asarray(
        rasterize_visibility(setup, bins, jnp.asarray(depth_ref), 16, 128, chunk=32)
    )

    depth, vis = rasterize_touch(
        setup, H, W, num_slabs=2, chunk=64, k_batch=8, touches_per_slab=1024,
        interpret=True,
    )
    depth, vis = np.asarray(depth), np.asarray(vis)

    close = np.isclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    assert close.mean() > 0.995, f"depth mismatch {1 - close.mean():.4f}"
    disagree = (vis != vis_ref) & close
    assert disagree.mean() < 0.005, f"vis mismatch {disagree.mean():.4f}"


def test_touch_depth_only():
    verts, tris = random_scene(4, n_tris=40)
    setup = _setup_for(verts, tris)
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    depth = np.asarray(
        rasterize_touch(setup, H, W, num_slabs=2, chunk=64, k_batch=8,
                        touches_per_slab=1024, depth_only=True, interpret=True)
    )
    close = np.isclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    assert close.mean() > 0.995
