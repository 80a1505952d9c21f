"""VRSAA — contrast-adaptive supersampling (sampling_rate_calculator.cpp analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import AAMode, RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.ops import vrsaa
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene

W, H = 128, 64  # output res; VRSAA renders geometry at 256x128


def test_detect_fine_quads():
    vis = np.zeros((8, 8), np.int32)
    vis[0:2, 2] = 1  # id edge inside quad (0, 1)
    depth = np.full((8, 8), 0.5, np.float32)
    depth[6, 6] = 0.6  # depth edge inside quad (3, 3)
    fine = np.asarray(vrsaa.detect_fine_quads(jnp.asarray(vis), jnp.asarray(depth)))
    assert fine[0, 1] and fine[3, 3]
    assert fine.sum() == 2


def test_fine_worklist_budget_and_overflow():
    fine = np.zeros((4, 4), bool)
    fine[1, 2] = fine[3, 0] = fine[3, 3] = True
    qy, qx, live, dropped = vrsaa.fine_worklist(jnp.asarray(fine), budget=2)
    assert list(np.asarray(live)) == [True, True]
    assert (int(qy[0]), int(qx[0])) == (1, 2)
    assert (int(qy[1]), int(qx[1])) == (3, 0)  # third quad dropped (over budget)
    assert int(dropped) == 1  # the true overflow count is EXPOSED, not silent
    _, _, _, d0 = vrsaa.fine_worklist(jnp.asarray(fine), budget=8)
    assert int(d0) == 0


def _render(aa_mode, render_scale=1, native=False):
    out_scale = render_scale if native else 1
    cfg = RenderConfig(
        render_width=W * render_scale, render_height=H * render_scale,
        output_width=W * out_scale, output_height=H * out_scale,
        tile_height=32, tile_width=128, max_tris_per_tile=1024,
        shadow_mode=ShadowMode.CSM, shadow_cascade_resolution=256,
        num_shadow_cascades=2, bloom=False, occlusion_culling=False,
        translucency=False, alpha_masking=False,
        aa_mode=aa_mode,
    )
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=W / H,
                 render_resolution=(cfg.render_width, cfg.render_height))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    out, _ = make_renderer(cfg)(
        scene, cam.view_data(), RenderParams.default(),
        initial_temporal_state(cfg.render_height, cfg.render_width),
    )
    # Compare pre-tonemap linear HDR (out.hdr) — the VRSAA quad resolve averages
    # linear samples, so the oracle must too.
    return np.asarray(out.hdr, np.float32)


def test_vrsaa_approaches_ssaa():
    """VRSAA output must be much closer to brute-force 2x SSAA (2x native render,
    2x2 box resolve — the same resolve kernel VRSAA uses) than the aliased 1x
    render is — that is the whole point of the technique."""
    native2x = _render(AAMode.OFF, render_scale=2, native=True)
    ssaa = native2x.reshape(H, 2, W, 2, 3).mean(axis=(1, 3))
    naive = _render(AAMode.OFF, render_scale=1)
    adaptive = _render(AAMode.VRSAA, render_scale=2)

    err_naive = float(np.mean((naive - ssaa) ** 2))
    err_vrsaa = float(np.mean((adaptive - ssaa) ** 2))
    assert err_vrsaa < 0.35 * err_naive, (err_vrsaa, err_naive)


def test_vrsaa_requires_2x_render_res():
    with pytest.raises(ValueError, match="2x"):
        _render(AAMode.VRSAA, render_scale=1)
