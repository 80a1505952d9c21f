"""Two-phase HiZ occlusion culling: exact image, occluded prims culled when settled."""

import numpy as np

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.material_storage import Material
from androidrenderer_tpu.scene.procedural import box_mesh, plane_mesh
from androidrenderer_tpu.scene.scene import RenderScene


def _occluder_scene():
    scene = RenderScene()
    m = scene.materials.add_material(Material(np.array([0.7, 0.7, 0.7, 1], np.float32)))
    wp, wi, wn, wu = plane_mesh(8.0, 8.0, subdiv=2)
    wall = scene.meshes.add_mesh(wp, wi, wn, uvs=wu)
    bp, bi, bn, bu = box_mesh(1.0, 1.0, 1.0)
    box = scene.meshes.add_mesh(bp, bi, bn, uvs=bu)

    def rot_x(deg):
        a = np.radians(deg)
        t = np.eye(4, dtype=np.float32)
        t[1, 1], t[1, 2] = np.cos(a), -np.sin(a)
        t[2, 1], t[2, 2] = np.sin(a), np.cos(a)
        return t

    def tr(v):
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = v
        return t

    scene.add_primitive(wall, m, rot_x(90.0) @ tr([0, 0, 0]))  # big wall facing +z... (prim 0)
    scene.add_primitive(box, m, tr([0.0, 0.0, -3.0]))  # behind the wall (prim 1)
    scene.add_primitive(box, m, tr([2.5, 0.0, 2.0]))  # beside, visible (prim 2)
    scene.set_sun([0.2, -1.0, 0.3], [1, 1, 1], 100000.0)
    return scene


def make(cfg_extra):
    W = H = 128
    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        shadow_mode=ShadowMode.OFF, sky=False, bloom=False, alpha_masking=False,
        max_tris_per_tile=256, **cfg_extra,
    )
    scene, _ = _occluder_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.5, 5.0])
    cam.yaw = np.pi
    return make_renderer(cfg), scene, cam.view_data(), W, H


def test_occlusion_culling_is_exact_and_culls():
    r_on, scene, view, W, H = make(dict(occlusion_culling=True))
    r_off, *_ = make(dict(occlusion_culling=False))
    params = RenderParams.default()

    t_on = initial_temporal_state(H, W)
    t_off = initial_temporal_state(H, W)
    for _ in range(3):
        out_on, t_on = r_on(scene, view, params, t_on)
        out_off, t_off = r_off(scene, view, params, t_off)

    # Image identical with and without culling (two-phase is exact).
    np.testing.assert_array_equal(np.asarray(out_on.image), np.asarray(out_off.image))
    # The box fully behind the wall is recognized as occluded after settling.
    np_prims = np.asarray(scene.prim_bounds).shape[0]
    visible = np.asarray(t_on.prev_visible_prims[:np_prims])
    assert not visible[1], "box behind the wall should be culled"
    assert visible[0] and visible[2], "wall and side box stay visible"
