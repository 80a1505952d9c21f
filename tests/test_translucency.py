"""Translucent (BLEND) geometry: peeled layers composite back-to-front."""

import numpy as np

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.material_storage import ALPHA_BLEND, Material
from androidrenderer_tpu.scene.procedural import plane_mesh
from androidrenderer_tpu.scene.scene import RenderScene


def _glass_scene(two_panes=False):
    scene = RenderScene()
    white = scene.materials.add_material(
        Material(np.array([0.8, 0.8, 0.8, 1.0], np.float32))
    )
    red_glass = scene.materials.add_material(
        Material(np.array([1.0, 0.0, 0.0, 0.5], np.float32),
                 alpha_mode=ALPHA_BLEND, double_sided=True)
    )
    blue_glass = scene.materials.add_material(
        Material(np.array([0.0, 0.0, 1.0, 0.5], np.float32),
                 alpha_mode=ALPHA_BLEND, double_sided=True)
    )
    wp, wi, wn, wu = plane_mesh(6.0, 6.0, subdiv=1)
    wall = scene.meshes.add_mesh(wp, wi, wn, uvs=wu)

    def rot_x90_at(z, scale=1.0):
        t = np.eye(4, dtype=np.float32)
        t[0, 0] = scale
        t[1, 1], t[1, 2] = 0.0, -scale
        t[2, 1], t[2, 2] = scale, 0.0
        t[2, 3] = z
        return t

    scene.add_primitive(wall, white, rot_x90_at(-2.0))  # opaque backdrop
    scene.add_primitive(wall, red_glass, rot_x90_at(0.0, scale=0.3))  # small pane
    if two_panes:
        scene.add_primitive(wall, blue_glass, rot_x90_at(1.0, scale=0.3))
    scene.set_sun([0.0, -0.3, -1.0], [1, 1, 1], 60000.0)
    return scene


def _render(scene_host):
    W = H = 128
    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
        max_tris_per_tile=256, translucent_layers=2, alpha_masking=False,
    )
    scene, stats = scene_host.build()
    assert stats["num_blend_triangles"] > 0
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 4.0])
    cam.yaw = np.pi
    out, _ = make_renderer(cfg)(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    return np.asarray(out.hdr), W, H


def test_single_pane_blends_over_backdrop():
    hdr, W, H = _render(_glass_scene())
    c = hdr[H // 2, W // 2]
    # Through red glass: red boosted relative to blue vs the plain backdrop.
    edge = hdr[4, 4]  # backdrop seen outside the pane
    assert c[0] > c[2], "red pane should tint the center red"
    assert abs(edge[0] - edge[2]) < 0.3 * max(edge[0], 1e-6), "backdrop is neutral"
    # Backdrop still contributes (alpha 0.5, not opaque).
    assert c[2] > 0.0


def test_two_panes_composite_in_order():
    hdr1, W, H = _render(_glass_scene(two_panes=False))
    hdr2, _, _ = _render(_glass_scene(two_panes=True))
    c1 = hdr1[H // 2, W // 2]
    c2 = hdr2[H // 2, W // 2]
    # Adding the nearer blue pane increases blue at the center.
    assert c2[2] > c1[2]
    assert np.isfinite(hdr2).all()
