"""LPV GI tests: SH math, cascades, injection/propagation physics, end-to-end bleed."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import GIMode, RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.ops import lpv, sh
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene


def test_sh_cosine_lobe_directionality():
    n = jnp.array([0.0, 1.0, 0.0])
    lobe = sh.sh_cosine_lobe(n)
    same = float(sh.sh_dot(lobe, sh.sh_evaluate(n)))
    opposite = float(sh.sh_dot(lobe, sh.sh_evaluate(-n)))
    assert same > 0.0
    assert opposite < same
    side = float(sh.sh_dot(lobe, sh.sh_evaluate(jnp.array([1.0, 0.0, 0.0]))))
    assert opposite < side < same


def test_cascade_origins_contain_camera():
    pos = jnp.array([3.0, 1.5, -2.0])
    fwd = jnp.array([0.0, 0.0, -1.0])
    mins, cells = lpv.cascade_origins(pos, fwd, 4, 32, 0.25)
    mins, cells = np.asarray(mins), np.asarray(cells)
    assert np.allclose(cells, [0.25, 0.5, 1.0, 2.0])
    for c in range(4):
        extent = cells[c] * 32
        assert np.all(pos >= mins[c]) and np.all(np.asarray(pos) <= mins[c] + extent)
        # snapped to whole cells
        assert np.allclose(np.round(mins[c] / cells[c]), mins[c] / cells[c], atol=1e-4)


def test_inject_and_propagate_spreads_light():
    r = 16
    radiance = jnp.zeros((1, 3, 4, r, r, r))
    gv = jnp.zeros((1, 4, r, r, r))
    pos = jnp.array([[4.0, 4.0, 4.0]])
    nrm = jnp.array([[1.0, 0.0, 0.0]])  # emitting toward +x
    flux = jnp.array([[1.0, 0.5, 0.25]])
    mask = jnp.array([True])
    rc, gc = lpv.inject(radiance[0], gv[0], pos, nrm, flux, mask,
                        jnp.zeros(3), 1.0, r)
    radiance = radiance.at[0].set(rc)
    out = lpv.propagate(radiance, gv, num_steps=8, occlusion=False)
    out = np.asarray(out)[0]  # (3, 4, r, r, r)
    # DC term at cells along +x of the source must receive energy, decaying.
    dc = out[0, 0]  # red channel Y00, (z, y, x)
    src = (4, 4, 4)
    assert dc[4, 4, 5] > 0 and dc[4, 4, 7] > 0
    assert dc[4, 4, 5] > dc[4, 4, 7] > dc[4, 4, 10]
    # More energy forward (+x) than behind (-x).
    assert dc[4, 4, 6] > dc[4, 4, 2]
    # Red > green > blue everywhere (flux ratios preserved).
    assert out[0, 0].sum() > out[1, 0].sum() > out[2, 0].sum()


def test_occlusion_blocks_propagation():
    r = 16
    radiance = jnp.zeros((1, 3, 4, r, r, r))
    gv = jnp.zeros((1, 4, r, r, r))
    pos = jnp.array([[4.0, 8.0, 8.0]])
    nrm = jnp.array([[1.0, 0.0, 0.0]])
    flux = jnp.array([[1.0, 1.0, 1.0]])
    mask = jnp.array([True])
    rc, _ = lpv.inject(radiance[0], gv[0], pos, nrm, flux, mask, jnp.zeros(3), 1.0, r)
    radiance = radiance.at[0].set(rc)
    # A dense occluder wall at x = 8.
    gv_wall = gv.at[0, 0, :, :, 8].set(2.0)
    free = np.asarray(lpv.propagate(radiance, gv, 10, occlusion=True))[0, 0, 0]
    blocked = np.asarray(lpv.propagate(radiance, gv_wall, 10, occlusion=True))[0, 0, 0]
    # Beyond the wall the blocked volume is darker.
    assert blocked[8, 8, 12] < 0.5 * free[8, 8, 12]


def test_gv_scene_depth_injection_blocks_leak():
    """GV parity (light_propagation_volume.cpp:1065-1128): a sun-SHADOWED wall is
    invisible to the RSM, so the VPL/RSM-built GV cannot occlude it — light from a
    bright floor leaks through unless camera-visible depth surfels are injected.
    Round-1 behavior (no scene-view injection) fails this test."""
    from androidrenderer_tpu.ops.raster import rasterize_depth, rasterize_visibility
    from androidrenderer_tpu.ops.raster.binning import bin_triangles
    from androidrenderer_tpu.scene.procedural import plane_mesh, transform
    from androidrenderer_tpu.scene.scene import RenderScene
    from androidrenderer_tpu.scene.material_storage import Material

    def rot_z(deg):
        a = np.radians(deg)
        m = np.eye(4, dtype=np.float32)
        m[0, 0], m[0, 1] = np.cos(a), -np.sin(a)
        m[1, 0], m[1, 1] = np.sin(a), np.cos(a)
        return m

    scene_h = RenderScene()
    white = scene_h.materials.add_material(
        Material(np.array([0.9, 0.9, 0.9, 1.0], np.float32))
    )
    pos, idx, nrm, uv = plane_mesh(8.0, 8.0, subdiv=4)
    floor = scene_h.meshes.add_mesh(pos, idx, nrm, uvs=uv)
    pos, idx, nrm, uv = plane_mesh(2.4, 8.0, subdiv=4)
    wallm = scene_h.meshes.add_mesh(pos, idx, nrm, uvs=uv)
    pos, idx, nrm, uv = plane_mesh(2.0, 8.0, subdiv=2)
    roofm = scene_h.meshes.add_mesh(pos, idx, nrm, uvs=uv)
    # Bright floor strip x in [-2, 6] (lit by the straight-down sun).
    scene_h.add_primitive(floor, white, transform((2.0, 0.0, 0.0)))
    # Full-width vertical wall at x = 0 (plane's +y normal rotated to -x),
    # y in [0, 2.4] — meets the roof, no gaps to flank through.
    scene_h.add_primitive(wallm, white, rot_z(90.0) @ transform((0.0, 1.2, 0.0)))
    # Roof at y = 2.2 spanning x in [-1.5, 0.5]: sun-shadows the wall AND the
    # region behind it, so neither appears in the RSM.
    scene_h.add_primitive(roofm, white, transform((-0.5, 2.2, 0.0)))
    scene_h.set_sun([0.0, -1.0, 0.0], [1.0, 1.0, 1.0], 100_000.0)
    scene, _ = scene_h.build()

    def raster(setup_, hh, ww):
        th, tw = min(32, hh), min(128, ww)
        bins_ = bin_triangles(setup_, hh // th, ww // tw, th, tw, cap=2048)
        d_ = rasterize_depth(setup_, bins_, hh, ww, th, tw)
        v_ = rasterize_visibility(setup_, bins_, d_, th, tw)
        return d_, v_

    cam_pos = jnp.array([0.0, 1.0, 0.0])
    fwd = jnp.array([1.0, 0.0, 0.0])
    # "Camera-visible" wall surfels (what the gbuffer would supply).
    wz, wy = np.meshgrid(np.linspace(-3.9, 3.9, 48), np.linspace(0.05, 2.35, 16))
    sp = jnp.asarray(
        np.stack([np.zeros_like(wy), wy, wz], axis=-1).reshape(-1, 3), jnp.float32
    )
    sn = jnp.broadcast_to(jnp.array([-1.0, 0.0, 0.0]), sp.shape)
    sv = (sp, sn, jnp.ones(sp.shape[0], bool))

    kw = dict(num_cascades=1, resolution=32, base_cell=0.25, rsm_resolution=128,
              num_steps=8)
    leaked_v = lpv.build_lpv(scene, cam_pos, fwd, raster, **kw)
    blocked_v = lpv.build_lpv(scene, cam_pos, fwd, raster, scene_view_surfels=sv,
                              **kw)

    probe = jnp.array([[[-0.5, 0.5, 0.0]]])  # behind the wall, under the roof
    n = jnp.array([[[1.0, 0.0, 0.0]]])  # facing the wall
    ones = jnp.ones((1, 1, 3))
    valid = jnp.ones((1, 1), bool)
    leaked = float(np.asarray(
        lpv.apply_lpv(leaked_v, probe, n, ones, valid, 1.0)).sum())
    blocked = float(np.asarray(
        lpv.apply_lpv(blocked_v, probe, n, ones, valid, 1.0)).sum())
    assert leaked > 1e-6, "fixture must actually leak without scene-view GV"
    assert blocked < 0.5 * leaked, f"leak not blocked: {blocked} vs {leaked}"


def test_cornell_gi_bleeds_color():
    W = H = 128
    base = dict(render_width=W, render_height=H, output_width=W, output_height=H,
                tile_height=32, tile_width=128, max_tris_per_tile=1024,
                shadow_mode=ShadowMode.CSM, shadow_cascade_resolution=256,
                sky=False, bloom=False,
                lpv_num_cascades=2, lpv_resolution=16, lpv_rsm_resolution=64,
                lpv_num_propagation_steps=8)
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 2.2]); cam.yaw = np.pi
    params = RenderParams.default()
    t0 = initial_temporal_state(H, W)

    off, _ = make_renderer(RenderConfig(**base, gi_mode=GIMode.OFF))(
        scene, cam.view_data(), params, t0)
    on, _ = make_renderer(RenderConfig(**base, gi_mode=GIMode.LPV))(
        scene, cam.view_data(), params, t0)

    hdr_off = np.asarray(off.hdr)
    hdr_on = np.asarray(on.hdr)
    assert np.isfinite(hdr_on).all()
    # GI adds energy overall.
    assert hdr_on.sum() > hdr_off.sum()
    # Indirect light reaches pixels that receive no direct sun: the darkest areas
    # brighten.
    dark = hdr_off.sum(-1) < 1e-6
    valid = np.asarray(on.gbuffer.valid)
    lit_dark = hdr_on.sum(-1)[dark & valid]
    assert lit_dark.size > 50
    assert (lit_dark > 1e-6).mean() > 0.3, "GI should reach shadowed surfaces"
