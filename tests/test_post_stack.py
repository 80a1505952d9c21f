"""Post-stack tests: bloom energy, TAA convergence, frame interpolation."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.ops import bloom, interpolation, taa


def test_bloom_spreads_energy():
    img = jnp.zeros((64, 128, 3)).at[32, 64].set(100.0)
    out = np.asarray(bloom.bloom_chain(img, num_mips=4))
    assert out[32, 70].sum() > 0.01  # energy spread beyond the source pixel
    assert np.isfinite(out).all()
    # Downsample preserves mean (kernel sums to 1).
    down = np.asarray(bloom.downsample_13tap(jnp.ones((64, 128, 3))))
    assert np.allclose(down[2:-2, 2:-2], 1.0, atol=1e-4)


def test_taa_converges_on_static_scene():
    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0, 1, (32, 128, 3)).astype(np.float32))
    mv = jnp.zeros((32, 128, 2))
    history = jnp.zeros_like(clean)
    valid = jnp.array(False)
    err = []
    for i in range(12):
        noisy = clean + jnp.asarray(rng.normal(0, 0.1, clean.shape).astype(np.float32))
        resolved, history = taa.taa_resolve(noisy, history, valid, mv)
        valid = jnp.array(True)
        err.append(float(jnp.abs(resolved - clean).mean()))
    # Accumulation reduces noise over time.
    assert err[-1] < err[0] * 0.6


def test_frame_interpolation_translating_pattern():
    # A bright bar moving right by 8 px/frame: the midpoint frame should show it
    # ~4 px along.
    w, h, shift = 128, 32, 8
    def frame(x0):
        img = np.zeros((h, w, 3), np.float32)
        img[:, x0:x0 + 8] = 1.0
        return jnp.asarray(img)

    prev, curr = frame(40), frame(48)
    # uv_prev = uv_curr - mv => mv = +shift/w for the moving content.
    mv = jnp.zeros((h, w, 2)).at[..., 0].set(shift / w)
    mid = np.asarray(interpolation.interpolate_frame(prev, curr, mv, t=0.5))
    col = mid[h // 2, :, 0]
    center = np.argmax(np.convolve(col, np.ones(8), mode="same"))
    assert 44 <= center <= 52  # ~midway (40+4..48+4 window)
    assert np.isfinite(mid).all()


def test_render_res_output_res_split():
    # The IUpscaler contract: render at 128x128, output at 256x256 via TAA+bilinear.
    import jax
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import AAMode, RenderConfig, RenderParams, ShadowMode
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.scene.procedural import cornell_scene

    cfg = RenderConfig(
        render_width=128, render_height=128, output_width=256, output_height=256,
        shadow_mode=ShadowMode.OFF, sky=False, bloom=False, aa_mode=AAMode.TAA,
        max_tris_per_tile=512, occlusion_culling=False, translucency=False,
    )
    scene, _ = cornell_scene().build()
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(128, 128))
    cam.set_position([0.0, 0.0, 2.2])
    cam.yaw = np.pi
    r = make_renderer(cfg)
    t = initial_temporal_state(128, 128)
    for _ in range(2):
        out, t = r(scene, cam.view_data(), RenderParams.default(), t)
    img = np.asarray(out.image)
    assert img.shape == (256, 256, 3)
    assert img.std() > 5.0
    assert np.asarray(out.depth).shape == (128, 128)  # internal render res


def test_r11g11b10_history_codec():
    """Packed-history codec: exact zeros/max, mantissa-bounded relative error
    (r/g: 6 mantissa bits -> 2^-7 round-to-nearest; b: 5 bits -> 2^-6), and
    the packed bilinear sampler matches the f32 one within that bound."""
    import jax.numpy as jnp
    from androidrenderer_tpu.ops.taa import (
        _bilinear_sample,
        _bilinear_sample_packed,
        _decode_r11g11b10,
        _encode_r11g11b10,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(0, 100, (4096, 3)),
                rng.uniform(0, 1, (4096, 3)),
                [[0, 0, 0], [64512, 64512, 64512]],
            ]
        ).astype(np.float32)
    )
    y = np.asarray(_decode_r11g11b10(_encode_r11g11b10(x)))
    rel = np.abs(y - np.asarray(x)) / np.maximum(np.asarray(x), 1e-3)
    # Double rounding (f32 -> f16 m10 -> m6/m5) adds up to a half f16 ulp.
    assert rel[:, :2].max() <= 2.0 ** -7 + 2.0 ** -11 + 1e-6
    assert rel[:, 2].max() <= 2.0 ** -6 + 2.0 ** -11 + 1e-6
    np.testing.assert_array_equal(y[-2], [0, 0, 0])
    np.testing.assert_array_equal(y[-1], [64512, 64512, 64512])

    img = jnp.asarray(rng.uniform(0, 10, (64, 96, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(0, 1, (64, 96, 2)).astype(np.float32))
    a = np.asarray(_bilinear_sample(img, uv))
    b = np.asarray(_bilinear_sample_packed(img, uv))
    np.testing.assert_allclose(b, a, rtol=2.0 ** -5, atol=1e-3)


def test_bloom_dense_matches_conv_oracle():
    """The dense parity-grid downsample and shift+FMA tent must match the
    grouped-conv formulation (SAME zero padding) to fp reassociation, at even
    AND odd mip sizes (XLA SAME alignment flips with input parity)."""
    rng = np.random.default_rng(3)
    for h, w in [(64, 128), (23, 40), (17, 33), (12, 20)]:
        img = jnp.asarray(rng.uniform(0, 4, (h, w, 3)), jnp.float32)
        ref = np.asarray(bloom._depthwise_conv(img, bloom._DOWN_KERNEL, 2))
        got = np.asarray(bloom.downsample_13tap(img))
        assert ref.shape == got.shape
        assert np.abs(ref - got).max() < 1e-5, (h, w)
        reft = np.asarray(bloom._depthwise_conv(img, bloom._TENT_KERNEL, 1))
        gott = np.asarray(
            bloom.upsample_tent(img, h, w)
        )  # resize to same size = identity path + tent
        assert np.abs(reft - gott).max() < 1e-5, (h, w)


def test_frame_interpolation_disocclusion_ssim():
    # Disocclusion fixture (VERDICT r4 item 9): a bright square slides over a
    # textured background; the analytic mid-frame puts the square halfway and
    # reveals background behind its trailing edge. The interpolated frame must
    # match it closely (SSIM gate) — the trailing band is the disocclusion
    # case the confidence fallback handles.
    from androidrenderer_tpu.utils.image import ssim

    w, h, shift = 128, 64, 12

    def bg():
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        g = 0.25 + 0.15 * np.sin(xx * 0.5) * np.cos(yy * 0.4)
        return np.stack([g, g * 0.8, g * 1.2], -1).astype(np.float32)

    def frame(x0):
        img = bg()
        img[16:48, x0:x0 + 24] = (1.5, 1.4, 1.2)  # HDR-bright mover
        return img

    prev, curr = frame(40), frame(40 + shift)
    truth = frame(40 + shift // 2)
    # Flow: the square's pixels moved +shift px; background static.
    mv = np.zeros((h, w, 2), np.float32)
    sq = np.zeros((h, w), bool)
    sq[16:48, 40 + shift:40 + shift + 24] = True  # mover in CURR frame coords
    mv[sq, 0] = shift / w
    mid = np.asarray(
        interpolation.interpolate_frame(
            jnp.asarray(prev), jnp.asarray(curr), jnp.asarray(mv), t=0.5
        )
    )
    assert np.isfinite(mid).all()
    s = ssim(np.clip(truth, 0, 2), np.clip(mid, 0, 2), data_range=2.0)
    assert s > 0.90, s
