"""Proxy (vertex-clustered) geometry: bake, far-cascade shadow LOD, dynamic
updates (scene/proxy.py — TPU-idiomatic LOD divergence; the reference
rasterizes full geometry into RSM/far cascades on HW,
light_propagation_volume.cpp:548-617, directional_light.cpp:305-326)."""

import numpy as np
import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops import shadow as shadow_ops
from androidrenderer_tpu.scene.dynamic import (
    initial_transforms,
    make_dynamic_data,
    update_primitive_transforms,
)
from androidrenderer_tpu.scene.procedural import cornell_scene, courtyard_scene
from androidrenderer_tpu.scene.proxy import swap_in_proxy


def test_proxy_bake_reduces_and_preserves_bounds():
    rs = courtyard_scene()
    scene, stats = rs.build()
    nt = stats["num_proxy_triangles"]
    assert 0 < nt < stats["num_triangles"]
    # Proxy stays inside (a half-cell inflation of) the full-geometry bounds:
    # cluster means are convex combinations of member vertices.
    n_full = stats["num_vertices"]
    full = np.asarray(scene.positions[:n_full])
    nv = rs.proxy_host["num_clusters"]
    prox = np.asarray(scene.proxy.positions[:nv])
    assert (prox.min(0) >= full.min(0) - 1e-4).all()
    assert (prox.max(0) <= full.max(0) + 1e-4).all()
    # Valid proxy triangles are non-degenerate (distinct cluster ids).
    tri = np.asarray(scene.proxy.tri_indices[:nt])
    assert (tri[:, 0] != tri[:, 1]).all()
    assert (tri[:, 1] != tri[:, 2]).all()
    assert (tri[:, 0] != tri[:, 2]).all()


def test_swap_in_proxy_is_consistent_scene_view():
    rs = cornell_scene()
    scene, _ = rs.build()
    sw = swap_in_proxy(scene)
    vp = sw.positions.shape[0]
    nt = sw.tri_indices.shape[0]
    assert sw.normals.shape == (vp, 3)
    assert sw.uvs.shape == (vp, 2)
    assert sw.tangents.shape == (vp, 4)
    assert sw.tri_material.shape == (nt,)
    assert sw.tri_alpha_mode.shape == (nt,)
    assert sw.tri_alpha_grid.shape == (nt, 8)
    assert int(np.asarray(sw.tri_indices[: int(sw.tri_valid.sum())]).max()) < vp
    # Materials/lighting pass through untouched.
    np.testing.assert_array_equal(
        np.asarray(sw.mat_base_color), np.asarray(scene.mat_base_color)
    )
    np.testing.assert_array_equal(
        np.asarray(sw.sun_direction), np.asarray(scene.sun_direction)
    )


def test_far_cascades_use_proxy_and_near_stay_exact():
    rs = cornell_scene()
    scene, _ = rs.build()
    res = 128
    cascades = shadow_ops.fit_cascades(
        jnp.eye(4), 1.0, 1.0, scene.sun_direction, 4, res, 0.05, 32.0, 0.95
    )
    full = shadow_ops.render_shadow_cascades(
        scene.positions, scene.tri_indices, scene.tri_valid, cascades, res,
        double_sided=scene.tri_double_sided,
    )
    mixed = shadow_ops.render_shadow_cascades(
        scene.positions, scene.tri_indices, scene.tri_valid, cascades, res,
        double_sided=scene.tri_double_sided,
        proxy=scene.proxy, proxy_from_cascade=2,
    )
    assert mixed.shape == full.shape
    # Near cascades (< proxy_from_cascade) are bit-identical to the full run.
    np.testing.assert_array_equal(np.asarray(mixed[:2]), np.asarray(full[:2]))
    # Far cascades still see geometry (coverage within 25% of full-geometry
    # coverage — the proxy is a simplification, not an empty raster).
    for c in (2, 3):
        cov_full = float((np.asarray(full[c]) > 0).mean())
        cov_prox = float((np.asarray(mixed[c]) > 0).mean())
        assert cov_prox > 0.75 * cov_full
        assert cov_prox < 1.25 * cov_full + 1e-3


def test_dynamic_update_moves_proxy_exactly():
    rs = cornell_scene()
    scene, _ = rs.build()
    dyn = make_dynamic_data(rs, scene)
    t0 = initial_transforms(rs)

    # Identity: world proxy == baked proxy (cluster means commute with the
    # per-primitive affine, so the rebake is exact to fp32).
    s_id = jax.jit(update_primitive_transforms)(scene, dyn, t0)
    nv = rs.proxy_host["num_clusters"]
    np.testing.assert_allclose(
        np.asarray(s_id.proxy.positions[:nv]),
        np.asarray(scene.proxy.positions[:nv]),
        atol=2e-5,
    )

    # Pure translation of every primitive: proxy translates rigidly.
    t1 = np.asarray(t0).copy()
    t1[:, 0, 3] += 1.5
    t1[:, 1, 3] -= 0.25
    s_tr = jax.jit(update_primitive_transforms)(scene, dyn, jnp.asarray(t1))
    delta = np.asarray(s_tr.proxy.positions[:nv]) - np.asarray(
        scene.proxy.positions[:nv]
    )
    np.testing.assert_allclose(delta[:, 0], 1.5, atol=2e-5)
    np.testing.assert_allclose(delta[:, 1], -0.25, atol=2e-5)
    np.testing.assert_allclose(delta[:, 2], 0.0, atol=2e-5)
    # Normals unchanged under translation.
    np.testing.assert_allclose(
        np.asarray(s_tr.proxy.normals[:nv]),
        np.asarray(scene.proxy.normals[:nv]),
        atol=2e-5,
    )


def test_dynamic_update_rotates_proxy_exactly():
    """Cluster means commute with any per-primitive AFFINE map, not just
    translation: rotating a primitive rigidly rotates its proxy clusters."""
    rs = cornell_scene()
    scene, _ = rs.build()
    dyn = make_dynamic_data(rs, scene)
    t0 = np.asarray(initial_transforms(rs)).copy()

    th = 0.7
    rot = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    t1 = t0.copy()
    for p in range(t1.shape[0]):
        t1[p, :3, :3] = rot @ t1[p, :3, :3]
        t1[p, :3, 3] = rot @ t1[p, :3, 3]
    s_rot = jax.jit(update_primitive_transforms)(scene, dyn, jnp.asarray(t1))

    nv = rs.proxy_host["num_clusters"]
    expect = np.asarray(scene.proxy.positions[:nv]) @ rot.T
    np.testing.assert_allclose(
        np.asarray(s_rot.proxy.positions[:nv]), expect, atol=3e-5
    )
    # Normals rotate rigidly too (orthonormal map => inverse-transpose = rot).
    expect_n = np.asarray(scene.proxy.normals[:nv]) @ rot.T
    np.testing.assert_allclose(
        np.asarray(s_rot.proxy.normals[:nv]), expect_n, atol=3e-5
    )
