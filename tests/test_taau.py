"""Temporal upscaling (ops/taa.py::taau_resolve) — the FSR3-Quality analog
(scene_renderer.cpp:28 default AA = FSR3; fsr3.cpp:18 Quality => render at
output/1.5 and upscale temporally).

The convergence test drives the resolver exactly like the renderer does:
synthetic jittered render frames of a known continuous image (the camera
convention from camera.py projection_matrix — +jx shifts content -jx pixels,
+jy shifts +jy), cycling the Halton jitter sequence. Converged output must
beat a bilinear upscale of the unjittered render by a wide margin."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.camera import taa_jitter
from androidrenderer_tpu.ops import taa


RH, RW = 64, 96
OH, OW = 96, 144  # 1.5x per axis


def truth(x, y):
    """High-frequency test image (periods of 3-5 render px — the detail band
    where temporal reconstruction beats single-frame bilinear upscaling)."""
    return np.stack(
        [
            0.5 + 0.45 * np.sin(1.70 * x) * np.cos(1.23 * y),
            0.5 + 0.45 * np.sin(1.31 * x + 1.0) * np.sin(1.52 * y),
            0.5 + 0.45 * np.cos(1.44 * x) * np.cos(1.82 * y + 0.5),
        ],
        axis=-1,
    ).astype(np.float32)


def render_jittered(jx, jy):
    """Simulated jittered render: pixel p shows content at unjittered
    (px + jx, py - jy) — the camera.py projection jitter convention."""
    px, py = np.meshgrid(np.arange(RW), np.arange(RH))
    return jnp.asarray(truth(px + jx, py - jy))


def test_taau_converges_past_bilinear():
    history = jnp.zeros((OH, OW, 3), jnp.float32)
    valid = jnp.bool_(False)
    mv = jnp.zeros((RH, RW, 2), jnp.float32)
    out = None
    for i in range(24):
        j = taa_jitter(i)
        cur = render_jittered(j[0], j[1])
        out, history = taa.taau_resolve(
            cur, history, valid, mv, jnp.asarray(j), OH, OW
        )
        valid = jnp.bool_(True)

    # Ground truth at output pixel centers mapped into render coordinates.
    ox = (np.arange(OW) + 0.5) / (OW / RW) - 0.5
    oy = (np.arange(OH) + 0.5) / (OH / RH) - 0.5
    gx, gy = np.meshgrid(ox, oy)
    ref = truth(gx, gy)

    taau_rmse = float(np.sqrt(np.mean((np.asarray(out) - ref) ** 2)))

    bil = np.asarray(
        taa.upscale_bilinear(render_jittered(0.0, 0.0), OH, OW)
    )
    bil_rmse = float(np.sqrt(np.mean((bil - ref) ** 2)))

    # Temporal accumulation over the jitter phases reconstructs detail a
    # single-frame bilinear upscale cannot.
    assert taau_rmse < 0.6 * bil_rmse, (taau_rmse, bil_rmse)
    assert taau_rmse < 0.02, taau_rmse


def test_taau_rejects_history_on_disocclusion_box():
    """The 3x3 clamp keeps stale history from ghosting through."""
    history = jnp.full((OH, OW, 3), 5.0, jnp.float32)  # bogus bright history
    mv = jnp.zeros((RH, RW, 2), jnp.float32)
    cur = jnp.full((RH, RW, 3), 0.25, jnp.float32)
    out, _ = taa.taau_resolve(
        cur, history, jnp.bool_(True), mv, jnp.zeros(2, jnp.float32), OH, OW
    )
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-5)


def test_taau_frame_shapes_and_upscaled_output():
    """End-to-end: TAA with render != output runs the temporal upscaler and
    the frame image lands at output resolution."""
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import AAMode, RenderConfig, RenderParams, ShadowMode
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.scene.procedural import cornell_scene

    rw, rh, ow, oh = 128, 96, 192, 144
    cfg = RenderConfig(
        render_width=rw, render_height=rh, output_width=ow, output_height=oh,
        shadow_mode=ShadowMode.OFF, sky=False, bloom=False, aa_mode=AAMode.TAA,
        max_tris_per_tile=512, occlusion_culling=False, translucency=False,
        tile_height=32, tile_width=128,
    )
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=rw / rh, render_resolution=(rw, rh))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    r = make_renderer(cfg)
    t = initial_temporal_state(rh, rw, out_height=oh, out_width=ow)
    for i in range(3):
        cam.set_jitter(taa_jitter(i))
        out, t = r(scene, cam.view_data(), RenderParams.default(), t)
        cam.end_frame()
    img = np.asarray(out.image)
    assert img.shape == (oh, ow, 3)
    assert img.std() > 5.0
    assert t.taa_history.shape == (oh, ow, 3)


def test_taau_pack8_convergence_not_worse():
    # The 8-byte history row option (config.taa_pack8; measured-negative perf
    # default, kept as an option) must converge at least as well as the
    # 16-byte R11G11B10 rows on the synthetic fixture.
    def run(pack8):
        history = jnp.zeros((OH, OW, 3), jnp.float32)
        valid = jnp.bool_(False)
        mv = jnp.zeros((RH, RW, 2), jnp.float32)
        out = None
        for i in range(24):
            j = taa_jitter(i)
            out, history = taa.taau_resolve(
                render_jittered(j[0], j[1]), history, valid, mv,
                jnp.asarray(j), OH, OW, pack8=pack8,
            )
            valid = jnp.bool_(True)
        ox = (np.arange(OW) + 0.5) / (OW / RW) - 0.5
        oy = (np.arange(OH) + 0.5) / (OH / RH) - 0.5
        gx, gy = np.meshgrid(ox, oy)
        ref = truth(gx, gy)
        return float(np.sqrt(np.mean((np.asarray(out) - ref) ** 2)))

    r16, r8 = run(False), run(True)
    assert r8 < r16 * 1.05, (r8, r16)
