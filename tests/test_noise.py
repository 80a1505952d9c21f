"""Noise tests: PCG distribution, hemisphere orientation, blue-noise spectrum."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.ops import noise


def test_pixel_uniforms_distribution():
    u = np.asarray(noise.pixel_uniforms(64, 128, 3, 2))
    assert u.shape == (64, 128, 2)
    assert 0.45 < u.mean() < 0.55
    assert u.min() >= 0.0 and u.max() < 1.0
    # Frames decorrelate.
    v = np.asarray(noise.pixel_uniforms(64, 128, 4, 2))
    assert abs(np.corrcoef(u.ravel(), v.ravel())[0, 1]) < 0.05


def test_cosine_hemisphere_up():
    n = jnp.zeros((4096, 3)).at[:, 2].set(1.0)
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.uniform(0, 1, 4096).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(0, 1, 4096).astype(np.float32))
    d = np.asarray(noise.cosine_hemisphere(n, u1, u2))
    assert (d[:, 2] > -1e-6).all()  # in the hemisphere
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # Cosine weighting: mean z = 2/3.
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.03


def test_blue_noise_spectrum_and_uniformity():
    bn = noise.blue_noise(32)
    assert bn.shape == (32, 32)
    # Every rank appears exactly once (a threshold/rank texture).
    assert len(np.unique(bn)) == 32 * 32
    # Blue spectrum: less low-frequency energy than white noise.
    def lowfreq_energy(x):
        f = np.abs(np.fft.fft2(x - x.mean()))
        f = np.fft.fftshift(f)
        c = 16
        return f[c - 4 : c + 4, c - 4 : c + 4].sum() / f.sum()

    rng = np.random.default_rng(1)
    white = rng.uniform(0, 1, (32, 32))
    assert lowfreq_energy(bn) < 0.6 * lowfreq_energy(white)


def test_trilinear_fused_matches_two_gather():
    """The mip-pair pool's single-gather trilinear == the two-gather path."""
    import numpy as np
    import jax.numpy as jnp
    from androidrenderer_tpu.ops import texture as tex
    from androidrenderer_tpu.scene.material_storage import MaterialStorage

    rng = np.random.default_rng(0)
    ms = MaterialStorage()
    ms.add_texture(rng.integers(0, 256, (64, 64, 4)).astype(np.uint8))
    ms.add_texture(rng.integers(0, 256, (16, 16, 4)).astype(np.uint8))
    pool, starts, log2b = ms.pack_texture_pool()
    pool = jnp.asarray(pool)

    n = 4096
    uv = jnp.asarray(rng.uniform(-2, 3, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(-1, 8, (n,)).astype(np.float32))
    for t in (2, 3):  # skip default white/flat-normal at 0/1
        st = jnp.full((n,), starts[t], jnp.int32)
        lb = jnp.full((n,), log2b[t], jnp.int32)
        a = np.asarray(tex.sample_trilinear(pool, st, lb, uv, lod))
        b = np.asarray(tex.sample_trilinear_fused(pool, st, lb, uv, lod))
        np.testing.assert_allclose(a, b, atol=1e-6)
