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
