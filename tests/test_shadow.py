"""CSM shadow tests: cascade fit geometry + end-to-end shadowing."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.ops import shadow as S
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.material_storage import Material
from androidrenderer_tpu.scene.procedural import box_mesh, plane_mesh
from androidrenderer_tpu.scene.scene import RenderScene


def test_cascade_splits_monotone_and_bounded():
    splits = S.cascade_splits(4, 0.05, 128.0, 0.95)
    assert len(splits) == 4
    assert all(splits[i] < splits[i + 1] for i in range(3))
    assert abs(splits[-1] - 128.0) < 1e-3


def test_fit_cascades_cover_frustum_slices():
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(128, 128))
    cam.set_position([1.0, 2.0, 3.0])
    cam.yaw = 2.1
    vd = cam.view_data()
    sun = jnp.array([0.3, -1.0, 0.2])
    cascades = S.fit_cascades(
        jnp.asarray(vd.inverse_view), vd.projection[0, 0], vd.projection[1, 1],
        sun, 4, 1024, 0.05, 128.0, 0.95,
    )
    splits = np.asarray(cascades.splits)
    mats = np.asarray(cascades.matrices)
    inv_view = vd.inverse_view.astype(np.float64)
    near = 0.05
    for i in range(4):
        far = splits[i]
        corners = []
        for d in (near, far):
            hx = d / vd.projection[0, 0]
            hy = d / vd.projection[1, 1]
            for sx in (-1, 1):
                for sy in (-1, 1):
                    corners.append([sx * hx, sy * hy, -d])
        cw = np.asarray(corners) @ inv_view[:3, :3].T + inv_view[:3, 3]
        clip = cw @ mats[i][:3, :3].T + mats[i][:3, 3]
        # Every slice corner lands inside the cascade's ortho volume.
        assert np.all(np.abs(clip[:, :2]) <= 1.0 + 1e-3), f"cascade {i} xy"
        assert np.all((clip[:, 2] > 0.0) & (clip[:, 2] <= 1.0)), f"cascade {i} z"
        near = far


def _shadow_scene():
    scene = RenderScene()
    white = scene.materials.add_material(
        Material(np.array([0.8, 0.8, 0.8, 1.0], np.float32), roughness_factor=1.0)
    )
    fp, fi, fn, fu = plane_mesh(20.0, 20.0, subdiv=2)
    floor = scene.meshes.add_mesh(fp, fi, fn, uvs=fu)
    bp, bi, bn, bu = box_mesh(2.0, 0.4, 2.0)
    box = scene.meshes.add_mesh(bp, bi, bn, uvs=bu)
    scene.add_primitive(floor, white)
    t = np.eye(4, dtype=np.float32)
    t[1, 3] = 2.0  # box floating 2m above the floor
    scene.add_primitive(box, white, t)
    scene.set_sun([0.0, -1.0, 0.0], [1.0, 1.0, 1.0], 100000.0)  # straight down
    return scene


def test_end_to_end_shadow_under_box():
    W = H = 128
    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        tile_height=32, tile_width=128, max_tris_per_tile=256,
        shadow_mode=ShadowMode.CSM, shadow_cascade_resolution=512, sky=False,
    )
    scene, _ = _shadow_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 6.0, 6.0])
    cam.pitch = -0.8
    cam.yaw = np.pi
    out, _ = make_renderer(cfg)(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    hdr = np.asarray(out.hdr)
    vis = np.asarray(out.visibility)
    gpos = np.asarray(out.gbuffer.world_position)
    gnrm = np.asarray(out.gbuffer.normal)

    # Floor pixels (normal up, y ~ 0), split by horizontal distance from the box.
    floor_px = (vis >= 0) & (gnrm[..., 1] > 0.9) & (np.abs(gpos[..., 1]) < 0.05)
    r = np.maximum(np.abs(gpos[..., 0]), np.abs(gpos[..., 2]))
    under = floor_px & (r < 0.8)
    outside = floor_px & (r > 2.0) & (r < 8.0)
    assert under.sum() > 20 and outside.sum() > 100
    lum_under = hdr[under].mean()
    lum_out = hdr[outside].mean()
    # The umbra under a sun directly overhead must be much darker than open floor.
    assert lum_under < 0.15 * lum_out, (lum_under, lum_out)
    # Box top is lit.
    box_top = (vis >= 0) & (gpos[..., 1] > 2.1)
    assert hdr[box_top].mean() > 0.5 * lum_out


def test_canonical_frame_cascades_match_direct_raster():
    # The Pallas path derives all cascade setups from ONE canonical-frame setup via
    # affine coefficient transforms; it must match the direct per-cascade raster.
    import jax.numpy as jnp

    scene, _ = _shadow_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(128, 128))
    cam.set_position([0.0, 6.0, 6.0])
    cam.pitch, cam.yaw = -0.8, np.pi
    vd = cam.view_data()
    c = S.fit_cascades(
        jnp.asarray(vd.inverse_view), vd.projection[0, 0], vd.projection[1, 1],
        scene.sun_direction, 4, 256, 0.05, 128.0, 0.95,
    )
    m_ref = np.asarray(S.render_shadow_cascades(
        scene.positions, scene.tri_indices, scene.tri_valid, c, 256,
        double_sided=scene.tri_double_sided,
    ))
    m_can = np.asarray(S.render_shadow_cascades(
        scene.positions, scene.tri_indices, scene.tri_valid, c, 256,
        use_pallas=True, pallas_interpret=True,
        double_sided=scene.tri_double_sided,
    ))
    for i in range(4):
        # atol 5e-5: the affine-z derivation rounds differently than the direct
        # matrix path (~3e-5 on constant-depth floors) — well under the 5e-4
        # shadow bias, invisible to the PCF compare.
        close = np.isclose(m_ref[i], m_can[i], rtol=1e-4, atol=5e-5)
        assert close.mean() > 0.98, f"cascade {i}: {close.mean():.4f}"


def test_bitmask_cascades_win_height_bit_identical():
    # config.shadow_win_h changes only the kernel's window decomposition; the
    # cascade maps must be BIT-identical across window heights (the combine is
    # exact and emission order per window is ascending triangle id either way).
    import jax.numpy as jnp

    scene, _ = _shadow_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(128, 128))
    cam.set_position([0.0, 6.0, 6.0])
    cam.pitch, cam.yaw = -0.8, np.pi
    vd = cam.view_data()
    c = S.fit_cascades(
        jnp.asarray(vd.inverse_view), vd.projection[0, 0], vd.projection[1, 1],
        scene.sun_direction, 2, 256, 0.05, 128.0, 0.95,
    )
    maps = {}
    for wh in (32, 16, 8):
        maps[wh] = np.asarray(S.render_shadow_cascades(
            scene.positions, scene.tri_indices, scene.tri_valid, c, 256,
            use_pallas=True, pallas_interpret=True, use_bitmask=True,
            double_sided=scene.tri_double_sided, win_h=wh,
        ))
    assert np.array_equal(maps[32], maps[16])
    assert np.array_equal(maps[32], maps[8])


def test_staggered_cascades_steady_state():
    # config.shadow_update_budget=1: cascade 0 re-rasters every frame, far
    # cascades round-robin against the cached packed atlas. Static scene +
    # static sun => after C-1 frames the staggered frame must equal the
    # rebuild-all frame EXACTLY (matrices are identical every frame, the
    # kernel is deterministic, and sampling consumes the same packed taps).
    scene, _ = _shadow_scene().build()
    W = H = 128
    common = dict(
        render_width=W, render_height=H, output_width=W, output_height=H,
        tile_height=32, tile_width=128, max_tris_per_tile=256,
        shadow_mode=ShadowMode.CSM, shadow_cascade_resolution=256,
        sky=False, bloom=False, alpha_masking=False, translucency=False,
        occlusion_culling=False, pallas_interpret=True,
    )
    cfg_all = RenderConfig(**common)
    cfg_st = RenderConfig(**common, shadow_update_budget=1)
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 6.0, 6.0])
    cam.pitch, cam.yaw = -0.8, np.pi
    view = cam.view_data()
    params = RenderParams.default()

    out_all, _ = make_renderer(cfg_all)(
        scene, view, params, initial_temporal_state(H, W)
    )
    r_st = make_renderer(cfg_st)
    t_st = initial_temporal_state(H, W, shadow_cascades=4, shadow_resolution=256)
    hdrs = []
    for _ in range(4):
        out_st, t_st = r_st(scene, view, params, t_st)
        hdrs.append(np.asarray(out_st.hdr))
    # Frames 0-1 are transients (stale far cascades degrade to LIT, never to
    # garbage): the image may differ from rebuild-all but must stay finite.
    assert np.isfinite(hdrs[0]).all()
    # By frame C-2 = 2 every cascade has been rastered once (c0 every frame;
    # c1@f0, c2@f1, c3@f2) -> steady state from frame 3 onward.
    np.testing.assert_array_equal(hdrs[3], np.asarray(out_all.hdr))
