"""Dynamic scenes: in-jit primitive transforms + BVH refit
(render_scene.cpp:90-106, raytracing_scene.cpp:50-170 analogs)."""

import numpy as np
import jax
import jax.numpy as jnp

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.ops.rt.traverse import occlusion
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.dynamic import (
    initial_transforms,
    make_dynamic_data,
    update_primitive_transforms,
)
from androidrenderer_tpu.scene.procedural import cornell_scene

W = H = 128


def _setup():
    rs = cornell_scene()
    scene, _ = rs.build()
    dyn = make_dynamic_data(rs, scene)
    t0 = initial_transforms(rs)
    return rs, scene, dyn, t0


def test_identity_update_is_exact():
    rs, scene, dyn, t0 = _setup()
    scene2 = jax.jit(update_primitive_transforms)(scene, dyn, t0)
    # Real (non-padded) vertex count: padded rows carry arbitrary transforms.
    n = sum(
        rs.meshes.meshes[p.mesh_id].num_vertices for p in rs.primitives
    )
    # World positions match the host bake (same math, fp32 tolerance).
    np.testing.assert_allclose(
        np.asarray(scene2.positions[:n]), np.asarray(scene.positions[:n]),
        atol=2e-5,
    )
    # Empty-box sentinel differs (builder 1e30 vs refit inf) — both never hit.
    np.testing.assert_allclose(
        np.clip(np.asarray(scene2.bvh.node_min), -1e30, 1e30),
        np.clip(np.asarray(scene.bvh.node_min), -1e30, 1e30),
        atol=2e-5,
    )


def test_moved_primitive_renders_and_traces_at_new_location():
    rs, scene, dyn, t0 = _setup()
    # Primitive 6 is the tall box (cornell_scene order); lift it 0.6 up.
    lift = np.asarray(t0).copy()
    lift[6][1, 3] += 0.6
    scene2 = jax.jit(update_primitive_transforms)(scene, dyn, jnp.asarray(lift))

    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        tile_height=32, tile_width=128, max_tris_per_tile=1024,
        shadow_mode=ShadowMode.OFF, bloom=False, occlusion_culling=False,
        alpha_masking=False, translucency=False, sky=False,
    )
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    renderer = make_renderer(cfg)
    params = RenderParams.default()
    ts = initial_temporal_state(H, W)
    out1, _ = renderer(scene, cam.view_data(), params, ts)
    out2, _ = renderer(scene2, cam.view_data(), params, ts)

    # The raster sees the moved box: the visibility image changes meaningfully.
    v1 = np.asarray(out1.visibility)
    v2 = np.asarray(out2.visibility)
    assert (v1 != v2).mean() > 0.02

    # The refit BVH sees it too: the tall box spans y in [-1.0, 0.2] built,
    # [-0.4, 0.8] lifted — a ray at y=-0.7 only hits the OLD box, y=0.5 only
    # the NEW one.
    o = jnp.array([[-0.95, -0.7, -0.3], [-0.95, 0.5, -0.3]])
    d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (2, 1))
    hit_old = np.asarray(occlusion(scene.bvh, o, d, 1e-3, 1.4))
    hit_new = np.asarray(occlusion(scene2.bvh, o, d, 1e-3, 1.4))
    assert hit_old[0] and not hit_new[0], "old-position ray must now miss"
    assert hit_new[1], "new-position ray must hit the lifted box"


def test_scaled_primitive_bounds_stay_conservative():
    rs, scene, dyn, t0 = _setup()
    grow = np.asarray(t0).copy()
    grow[7][:3, :3] *= 2.0  # double the small box
    scene2 = jax.jit(update_primitive_transforms)(scene, dyn, jnp.asarray(grow))
    b = np.asarray(scene2.prim_bounds[7])
    # All of the primitive's vertices lie inside the (conservative) sphere.
    vp = np.asarray(dyn.vertex_prim)
    pts = np.asarray(scene2.positions)[vp == 7]
    assert np.all(np.linalg.norm(pts - b[:3], axis=1) <= b[3] + 1e-4)


def test_refit_lookahead_boxes_track_geometry():
    # The packed-row lookahead target BOXES (traverse.py LOOK0+) must follow
    # refit geometry — a stale-box splice would make post-refit rays miss
    # moved geometry two levels early (round-5 regression guard).
    from androidrenderer_tpu.ops.rt.traverse import LOOK0

    rs, scene, dyn, t0 = _setup()
    t1 = t0.at[1, 1, 3].add(3.0)  # move primitive 1 up 3 m
    scene2 = jax.jit(update_primitive_transforms)(scene, dyn, t1)
    rows = np.asarray(scene2.bvh.node_rows)
    slots = rows[:, LOOK0:LOOK0 + 4]
    boxes = rows[:, LOOK0 + 4:LOOK0 + 28].reshape(-1, 4, 2, 3)
    ok = slots >= 0
    # Each valid target's stored box equals the refit node_min/max at that slot.
    nmin = np.asarray(scene2.bvh.node_min)
    nmax = np.asarray(scene2.bvh.node_max)
    si = np.clip(slots.astype(np.int64), 0, nmin.shape[0] - 1)
    np.testing.assert_allclose(
        np.where(ok[..., None], boxes[:, :, 0, :], 0.0),
        np.where(ok[..., None], nmin[si], 0.0), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.where(ok[..., None], boxes[:, :, 1, :], 0.0),
        np.where(ok[..., None], nmax[si], 0.0), atol=1e-5,
    )
