"""Irradiance probe cache tests: octahedral math, toroidal scroll, end-to-end GI."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import GIMode, RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.ops import probes as P
from androidrenderer_tpu.ops.octahedral import dir_to_oct_uv, oct_uv_to_dir
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene


def test_octahedral_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rt = np.asarray(oct_uv_to_dir(dir_to_oct_uv(jnp.asarray(d, jnp.float32))))
    dots = np.sum(rt * d, axis=1)
    assert dots.min() > 0.9999


def test_desired_cells_cover_camera_and_match_slots():
    grid = (8, 4, 8)
    cam = jnp.array([3.3, 1.2, -7.9])
    cells = np.asarray(P._desired_cells(cam, grid, 1.0))
    slots = np.asarray(P._slot_coords(grid))
    g = np.array(grid)
    # Toroidal assignment: cell mod grid == slot coords.
    assert (np.mod(cells, g) == slots).all()
    # The covered block is contiguous [base, base+g).
    base = cells.min(axis=0)
    assert (cells.max(axis=0) - base + 1 == g).all()
    # Camera cell inside the block.
    cc = np.floor(np.asarray(cam)).astype(int)
    assert (cc >= base).all() and (cc < base + g).all()


def test_probe_gi_end_to_end_accumulates():
    W = H = 128
    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        gi_mode=GIMode.PROBES, shadow_mode=ShadowMode.CSM,
        shadow_cascade_resolution=256, sky=False, bloom=False,
        probe_cascades=1, probe_grid=(8, 8, 8), probe_spacing=0.4,
        probe_budget=128, probe_rays=32, max_tris_per_tile=1024,
    )
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    renderer = make_renderer(cfg)
    params = RenderParams.default()
    temporal = initial_temporal_state(
        H, W, probe_cascades=1, probe_grid=(8, 8, 8), probe_spacing=0.4
    )
    # A few frames to cycle the probe budget through the grid.
    hdr0 = None
    for i in range(5):
        out, temporal = renderer(scene, cam.view_data(), params, temporal)
        if i == 0:
            hdr0 = np.asarray(out.hdr)
    hdr = np.asarray(out.hdr)
    assert np.isfinite(hdr).all()
    # Probes updated: ages reset for some slots.
    assert int(np.asarray(temporal.probes.age).min()) == 0
    # GI energy present in shadowed regions after accumulation.
    valid = np.asarray(out.gbuffer.valid)
    assert (hdr.sum(-1)[valid] > 1e-7).mean() > 0.2
