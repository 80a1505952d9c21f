"""End-to-end frame tests: BASELINE config 1 scope (depth prepass + shaded forward)."""

import numpy as np
import jax
import pytest

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import RenderConfig, RenderParams
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene, courtyard_scene

W = H = 128
CFG = RenderConfig(
    render_width=W, render_height=H, output_width=W, output_height=H,
    tile_height=32, tile_width=128, max_tris_per_tile=1024,
    occlusion_culling=False,  # covered by test_occlusion; halves compile time
    translucency=False,
)


@pytest.fixture(scope="module")
def cornell():
    scene, stats = cornell_scene().build()
    return scene, stats


def make_camera():
    cam = Camera(fov_degrees=75.0, aspect=W / H, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi  # look down -z into the box
    return cam


def test_cornell_end_to_end(cornell):
    scene, stats = cornell
    assert stats["num_triangles"] > 100
    cam = make_camera()
    renderer = make_renderer(CFG)
    temporal = initial_temporal_state(H, W)
    out, temporal2 = renderer(scene, cam.view_data(), RenderParams.default(), temporal)

    depth = np.asarray(out.depth)
    vis = np.asarray(out.visibility)
    img = np.asarray(out.image)
    hdr = np.asarray(out.hdr)

    # Center of the image looks at the back wall: must be drawn.
    assert depth[H // 2, W // 2] > 0.0
    assert vis[H // 2, W // 2] >= 0
    # Most of the frame is covered by the box interior.
    assert (vis >= 0).mean() > 0.6
    assert np.isfinite(hdr).all()
    assert img.dtype == np.uint8
    # The image is not all black and not saturated.
    assert img.mean() > 2.0
    assert img.mean() < 250.0
    # Temporal state advanced.
    assert int(temporal2.frame_index) == 1


def test_cornell_depth_ordering(cornell):
    scene, _ = cornell
    cam = make_camera()
    renderer = make_renderer(CFG)
    out, _ = renderer(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    depth = np.asarray(out.depth)
    # Reversed-Z: the tall box (closer) has larger depth than the back wall behind it.
    back_wall = depth[H // 2, W - 8]
    assert (depth[depth > 0].max() > back_wall), "nearer geometry should exceed wall depth"


def test_gbuffer_plausibility(cornell):
    scene, _ = cornell
    cam = make_camera()
    renderer = make_renderer(CFG)
    out, _ = renderer(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    g = out.gbuffer
    normal = np.asarray(g.normal)
    valid = np.asarray(g.valid)
    lens = np.linalg.norm(normal[valid], axis=-1)
    assert np.allclose(lens, 1.0, atol=1e-3)
    base = np.asarray(g.base_color)
    assert (base[valid] >= 0).all() and (base[valid] <= 1.0 + 1e-5).all()
    # Left wall is red-dominant, right wall green-dominant.
    left = base[H // 2, 4]
    right = base[H // 2, W - 4]
    assert left[0] > left[1] and right[1] > right[0]


def test_frustum_culling_drops_offscreen_prims(cornell):
    scene, _ = cornell
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 50.0])
    cam.yaw = 0.0  # looking away from the box (+z)
    renderer = make_renderer(CFG)
    out, _ = renderer(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    assert (np.asarray(out.visibility) == -1).all()


def test_courtyard_smoke():
    scene, stats = courtyard_scene(column_rings=2, detail=2).build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 1.7, 6.0])
    cam.yaw = np.pi
    renderer = make_renderer(CFG)
    out, _ = renderer(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    img = np.asarray(out.image)
    assert np.isfinite(np.asarray(out.hdr)).all()
    assert (np.asarray(out.visibility) >= 0).mean() > 0.3
    assert img.std() > 10.0  # actual visual structure


def test_pallas_frame_with_alpha_bitmap_matches_xla_peel():
    """Full frame through the interpret-mode Pallas path (window-binned kernel,
    in-kernel alpha bitmaps, masked-in-main raster) vs the XLA peel path: the
    two alpha strategies must agree on coverage except at lattice-quantized
    leaf edges (the documented alpha_bitmap divergence)."""
    import numpy as np
    import jax.numpy as jnp
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import RasterBackend, RenderConfig, RenderParams, ShadowMode
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.scene.procedural import alpha_test_scene

    scene, _ = alpha_test_scene().build(with_bvh=False)
    w = h = 128
    base = dict(
        render_width=w, render_height=h, output_width=w, output_height=h,
        tile_height=32, tile_width=128, max_tris_per_tile=512,
        shadow_mode=ShadowMode.OFF, sky=False, bloom=False,
        occlusion_culling=False, translucency=False,
        use_normal_maps=False, use_mr_textures=False, use_emission=False,
    )
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(w, h))
    cam.set_position([0.0, 1.0, -3.0])
    view = cam.view_data()
    params = RenderParams.default()

    cfg_p = RenderConfig(**base, raster_backend=RasterBackend.PALLAS,
                         pallas_interpret=True, alpha_bitmap=True)
    cfg_x = RenderConfig(**base, raster_backend=RasterBackend.XLA)
    out_p, _ = make_renderer(cfg_p)(scene, view, params, initial_temporal_state(h, w))
    out_x, _ = make_renderer(cfg_x)(scene, view, params, initial_temporal_state(h, w))
    cov_p = np.asarray(out_p.visibility) >= 0
    cov_x = np.asarray(out_x.visibility) >= 0
    agree = (cov_p == cov_x).mean()
    assert agree > 0.97, f"coverage agreement {agree:.3f}"


def test_gbuffer_barrier_is_bit_identical():
    """config.gbuffer_barrier only constrains XLA fusion (optimization_barrier
    is the identity) — the frame must be bit-exact with it on."""
    scene, _ = cornell_scene().build()
    cam = make_camera()
    base, _ = make_renderer(CFG)(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    bar, _ = make_renderer(CFG.replace(gbuffer_barrier=True))(
        scene, cam.view_data(), RenderParams.default(), initial_temporal_state(H, W)
    )
    assert (np.asarray(base.image) == np.asarray(bar.image)).all()
    assert (np.asarray(base.hdr) == np.asarray(bar.hdr)).all()
