"""Window-binned Pallas kernel vs the XLA reduction rasterizer (interpret mode).

Exercises the overflow-drain path (tiny cap), the batched drain (kb), win_h
variants, and the affine-z ortho fast path — the binned kernel must be
bit-compatible with raster_xla under the same tie-break rule (highest id wins
at equal depth)."""

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


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("double_sided", [True, False])
@pytest.mark.parametrize("win_h", [8, 16])
def test_binned_matches_xla(seed, double_sided, win_h):
    verts, tris = random_scene(seed, n_tris=50)
    setup = _setup_for(verts, tris, double_sided)
    depth_ref, vis_ref = _xla_ref(setup)

    depth, vis = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, cap=6, kb=4, win_h=win_h,
        interpret=True,
    )
    depth, vis = np.asarray(depth), np.asarray(vis)

    np.testing.assert_allclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    disagree = vis != vis_ref
    ulp_edges = depth != depth_ref
    hard = disagree & ~ulp_edges
    assert hard.sum() == 0, f"{hard.sum()} visibility mismatches off ULP edges"
    assert disagree.mean() < 0.005


def test_binned_overflow_drain():
    # cap=2 forces constant overflow drains; the drain property is that the
    # result is BIT-IDENTICAL to the same kernel with a cap large enough that
    # no drain ever fires (same eval math, same per-window touch order, exact
    # combine). The oracle comparison below uses the usual ULP-edge contract —
    # a strict allclose here is fragile to FMA-association shifts in setup
    # (one tie pixel moved by 1 ULP after the component-wise setup change).
    verts, tris = random_scene(2, n_tris=60)
    setup = _setup_for(verts, tris, True)
    depth, vis = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=16, cap=2, kb=8, interpret=True
    )
    depth_nd, vis_nd = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=16, cap=128, kb=8, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(depth_nd))
    np.testing.assert_array_equal(np.asarray(vis), np.asarray(vis_nd))

    depth_ref, vis_ref = _xla_ref(setup)
    depth, vis = np.asarray(depth), np.asarray(vis)
    close = np.isclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    assert close.mean() > 0.995
    disagree = vis != vis_ref
    hard = disagree & close & (depth == depth_ref)
    assert hard.sum() == 0


def test_binned_depth_only():
    verts, tris = random_scene(3, n_tris=30)
    setup = _setup_for(verts, tris)
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    depth_ref = np.asarray(rasterize_depth(setup, bins, H, W, 16, 128, chunk=32))
    depth = np.asarray(
        rasterize_binned(
            setup, H, W, num_slabs=2, chunk=32, depth_only=True, interpret=True
        )
    )
    close = np.isclose(depth, depth_ref, rtol=1e-6, atol=1e-9)
    assert close.mean() > 0.995
    assert np.allclose(depth[close], depth_ref[close])


def test_binned_affine_z_matches_fused():
    """Ortho (shadow-style) projection: affine-z path vs the fused kernel."""
    from androidrenderer_tpu.ops.raster.raster_fused import rasterize_fused

    rng = np.random.default_rng(7)
    verts = rng.uniform([-1.5, -1.5, 0.1], [1.5, 1.5, 0.9], (90, 3)).astype(
        np.float32
    )
    tris = rng.integers(0, 90, (40, 3)).astype(np.int32)
    # Ortho "clip" with w=1: x,y in [-1,1], z in (0,1).
    clip = jnp.concatenate(
        [jnp.asarray(verts), jnp.ones((90, 1), jnp.float32)], axis=1
    )
    setup = triangle_setup(clip, jnp.asarray(tris), W, H)

    d_f = np.asarray(
        rasterize_fused(setup, H, W, num_slabs=2, chunk=32, depth_only=True,
                        affine_z=True, interpret=True)
    )
    d_b = np.asarray(
        rasterize_binned(setup, H, W, num_slabs=2, chunk=32, depth_only=True,
                         affine_z=True, interpret=True)
    )
    np.testing.assert_array_equal(d_b, d_f)


def test_binned_z_limit_peeling():
    """z_limit (depth peeling upper bound) matches the XLA raster's."""
    verts, tris = random_scene(5, n_tris=60)
    setup = _setup_for(verts, tris, True)
    bins = bin_triangles(setup, H // 16, W // 128, 16, 128, cap=128)
    d0 = rasterize_depth(setup, bins, H, W, 16, 128, chunk=32)
    zlim = jnp.asarray(d0)  # peel: strictly behind the first layer
    depth_ref = np.asarray(
        rasterize_depth(setup, bins, H, W, 16, 128, chunk=32, z_limit=zlim)
    )
    vis_ref = np.asarray(
        rasterize_visibility(
            setup, bins, jnp.asarray(depth_ref), 16, 128, chunk=32, z_limit=zlim
        )
    )
    depth, vis = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, z_limit=zlim, interpret=True
    )
    depth = np.asarray(depth)
    # The two implementations' z differ by ~1 ULP (different FMA contraction),
    # which flips `z < z_limit` exactly where a fragment's z equals the first
    # layer's — legitimate peel-boundary pixels. Production peels with the SAME
    # kernel for every layer, so those flips never occur in the real path;
    # here, accept mismatches only at the boundary (z within 1 ULP of z_limit).
    # Second-layer fragments chain two evaluations (q, r, divide) through
    # different FMA contractions — up to a few ULP of depth difference.
    bad = ~np.isclose(depth, depth_ref, rtol=5e-6, atol=1e-9)
    zl = np.asarray(zlim)
    at_boundary = np.isclose(depth, zl, rtol=4e-6) | np.isclose(
        depth_ref, zl, rtol=4e-6
    )
    assert (bad & ~at_boundary).sum() == 0
    assert bad.mean() < 0.05
    # Peeling invariant: every accepted fragment is strictly behind the limit.
    covered = depth > 0
    assert np.all(depth[covered] < np.asarray(zlim)[covered] + 1e-12)


def test_binned_alpha_bitmap_vs_peeled():
    """In-kernel barycentric alpha bitmaps vs the exact peeled path on the
    alpha-fence fixture: coverage agrees except at lattice-quantized leaf
    edges (the documented alpha_bitmap divergence)."""
    import jax.numpy as jnp
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.ops.raster.masked import rasterize_masked_peeled
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

    base_d = jnp.zeros((h, w), jnp.float32)
    base_v = jnp.full((h, w), -1, jnp.int32)
    d_ref, v_ref = rasterize_masked_peeled(
        scene, setup_m, base_d, base_v, 32, 128, cap=256, layers=3
    )
    d_bm, v_bm = rasterize_binned(
        setup_m, h, w, num_slabs=2, chunk=32, win_h=8,
        alpha_grid=scene.tri_alpha_grid, interpret=True,
    )
    cov_ref = np.asarray(v_ref) >= 0
    cov_bm = np.asarray(v_bm) >= 0
    agree = (cov_ref == cov_bm).mean()
    assert agree > 0.97, f"coverage agreement {agree:.3f}"
    assert cov_bm.sum() > 50  # holes exist but foliage is present
    assert cov_bm.sum() < cov_ref.size * 0.9  # and holes actually punched


def test_hybrid_binned_matches_xla():
    """Splat + binned-kernel hybrid == XLA raster (single-px tris via scatter)."""
    from androidrenderer_tpu.ops.raster.raster_fused import rasterize_hybrid

    verts, tris = random_scene(6, n_tris=80)
    setup = _setup_for(verts, tris, True)
    depth_ref, vis_ref = _xla_ref(setup)
    depth, vis = rasterize_hybrid(
        setup, H, W, backend="binned", num_slabs=2, chunk=32, interpret=True
    )
    # Splat (XLA) and kernel lower the same formulas with different FMA
    # contraction: a few-ULP depth tolerance, vis flips only at those pixels.
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=5e-6, atol=1e-9)
    disagree = np.asarray(vis) != vis_ref
    assert (disagree & (np.asarray(depth) == depth_ref)).sum() == 0


@pytest.mark.parametrize("pa_unroll", [1, 4])
def test_binned_sparse_validity_range_skip(pa_unroll):
    """Live-range windowing: mostly-invalid triangle sets (the CSM near-cascade
    shape after derive_ortho_setup frustum culling) must render identically —
    dead chunks, dead prefixes/suffixes, and pa_unroll blocks that straddle the
    live range all reduce to desc == 0 skips."""
    verts, tris = random_scene(7, n_tris=160)
    setup = _setup_for(verts, tris, True)
    # Kill everything except a few scattered ids: chunk 0 fully dead, a lone
    # live triangle mid-chunk, a live pair at a chunk boundary, one at the end.
    keep = np.zeros(tris.shape[0], dtype=bool)
    keep[[37, 63, 64, 100, 159]] = True
    setup = setup._replace(valid=setup.valid & jnp.asarray(keep))
    depth_ref, vis_ref = _xla_ref(setup)

    depth, vis = rasterize_binned(
        setup, H, W, num_slabs=2, chunk=32, cap=6, kb=4, win_h=8,
        pa_unroll=pa_unroll, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(depth), depth_ref, rtol=1e-6, atol=1e-9)
    disagree = np.asarray(vis) != vis_ref
    assert (disagree & (np.asarray(depth) == depth_ref)).sum() == 0
