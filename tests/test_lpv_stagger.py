"""Staggered LPV cascade updates (config.lpv_update_budget > 0).

The reference clears and rebuilds every LPV cascade per frame
(light_propagation_volume.cpp:839-926); the staggered path rebuilds B cascades
round-robin per frame against cached volumes in TemporalState — the reference's
own irradiance-cache budget pattern (irradiance_cache.cpp:15-19) applied to its
LPV. Contract gated here: with a static scene + camera, after ceil(C/B) frames
the staggered steady state matches the every-frame build (per-cascade pipelines
are independent; only batch-size-dependent fp reassociation may differ).
"""

import numpy as np
import pytest

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import GIMode, RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene

W = H = 128
BASE = dict(
    render_width=W, render_height=H, output_width=W, output_height=H,
    tile_height=32, tile_width=128, max_tris_per_tile=1024,
    shadow_mode=ShadowMode.CSM, shadow_cascade_resolution=256,
    sky=False, bloom=False, occlusion_culling=False, translucency=False,
    gi_mode=GIMode.LPV,
    lpv_num_cascades=2, lpv_resolution=16, lpv_rsm_resolution=64,
    lpv_num_propagation_steps=8,
)


def _run(budget: int, frames: int):
    cfg = RenderConfig(**BASE, lpv_update_budget=budget)
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    params = RenderParams.default()
    temporal = initial_temporal_state(
        H, W, lpv_cascades=cfg.lpv_num_cascades, lpv_resolution=cfg.lpv_resolution
    )
    renderer = make_renderer(cfg)
    out = None
    for _ in range(frames):
        out, temporal = renderer(scene, cam.view_data(), params, temporal)
    return out, temporal


def test_staggered_reaches_every_frame_steady_state():
    from androidrenderer_tpu.ops.post import to_uint8, composite
    from androidrenderer_tpu.utils.image import ssim

    # Budget 1 over 2 cascades: both cascades current after 2 frames; run 3.
    ref, _ = _run(budget=0, frames=1)
    stag, temporal = _run(budget=1, frames=3)

    hdr_ref = np.asarray(ref.hdr)
    hdr_stag = np.asarray(stag.hdr)
    assert np.isfinite(hdr_stag).all()
    # The staggered program and the every-frame program are DIFFERENT jit
    # graphs: XLA's fp contraction can flip an RSM texel / injection cell
    # between them (the floor()-snapping drift class from docs/ROADMAP.md),
    # and propagation spreads a flipped VPL broadly — so the gate is
    # image-level (mean error + SSIM), not allclose. Measured: the two
    # volume sets agree to 1e-8 relative when built by structurally
    # identical programs; cross-program image mean |diff| ~0.008.
    d = np.abs(hdr_stag - hdr_ref)
    assert d.mean() < 0.03, float(d.mean())
    img_ref = np.asarray(to_uint8(composite(ref.hdr, None, 0.0)))
    img_stag = np.asarray(to_uint8(composite(stag.hdr, None, 0.0)))
    s = ssim(img_stag, img_ref)
    assert s >= 0.98, s
    # The cached volumes carry real radiance for every cascade.
    rad = np.asarray(temporal.lpv.radiance)
    assert rad.shape[0] == 2
    assert (np.abs(rad).sum(axis=(1, 2, 3, 4, 5)) > 0).all()
    # Built cascades carry real (snapped, finite) origins, not the 1e30 init.
    assert (np.abs(np.asarray(temporal.lpv.mins)) < 1e6).all()


def test_staggered_steady_state_is_frame_invariant():
    # Within ONE program, a static scene's staggered GI is bit-stable across
    # full update cycles (each cascade rebuilds from identical inputs).
    a, _ = _run(budget=1, frames=3)
    b, _ = _run(budget=1, frames=5)
    assert np.array_equal(np.asarray(a.hdr), np.asarray(b.hdr))


def test_first_frame_has_partial_gi_and_no_nans():
    # Frame 1 with budget 1: only cascade 0 exists; cascade 1 must exclude all
    # pixels (mins=1e30 sentinel) instead of sampling zeros at a bogus origin.
    out, temporal = _run(budget=1, frames=1)
    hdr = np.asarray(out.hdr)
    assert np.isfinite(hdr).all()
    mins = np.asarray(temporal.lpv.mins)
    assert (np.abs(mins[0]) < 1e6).all()  # cascade 0 built
    assert (mins[1] > 1e20).all()  # cascade 1 untouched


def test_budget_zero_leaves_lpv_state_untouched():
    _, temporal = _run(budget=0, frames=2)
    assert float(np.abs(np.asarray(temporal.lpv.radiance)).sum()) == 0.0
    assert (np.asarray(temporal.lpv.mins) > 1e20).all()


def test_mismatched_state_shape_raises():
    cfg = RenderConfig(**BASE, lpv_update_budget=1)
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(W, H))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    temporal = initial_temporal_state(H, W)  # default (4, 32) != config (2, 16)
    with pytest.raises(ValueError, match="lpv"):
        make_renderer(cfg)(scene, cam.view_data(), RenderParams.default(), temporal)
