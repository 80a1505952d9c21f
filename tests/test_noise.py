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

    from androidrenderer_tpu.scene.material_storage import Material

    rng = np.random.default_rng(0)
    ms = MaterialStorage()
    t1 = ms.add_texture(rng.integers(0, 256, (64, 64, 4)).astype(np.uint8))
    t2 = ms.add_texture(rng.integers(0, 256, (16, 16, 4)).astype(np.uint8))
    ms.add_material(Material(np.ones(4, np.float32), base_color_texture=t1))
    ms.add_material(Material(np.ones(4, np.float32), base_color_texture=t2))
    pool, starts, log2b = ms.pack_texture_pool()
    pool = jnp.asarray(pool)

    n = 4096
    uv = jnp.asarray(rng.uniform(-2, 3, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(-1, 8, (n,)).astype(np.float32))
    for t in (1, 2):  # material-triple entries (0 = the all-defaults triple)
        st = jnp.full((n,), starts[t], jnp.int32)
        lb = jnp.full((n,), log2b[t], jnp.int32)
        a = np.asarray(tex.sample_trilinear(pool, st, lb, uv, lod))
        b = np.asarray(tex.sample_trilinear_fused(pool, st, lb, uv, lod))
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_material_fused_matches_per_map_sampling():
    """sample_material_fused == per-map TRILINEAR sampling (round 4: every
    material slot filters mip-linear, the reference's default sampler —
    gltf_model.cpp:497-534).

    The normal / metal-rough maps are registered as BASE textures of sibling
    materials, so their per-map reference path samples the same images through
    the base channels of their own triple entries (sizes equal => the triple
    bake stores them untouched)."""
    import numpy as np
    import jax.numpy as jnp
    from androidrenderer_tpu.ops import texture as tex
    from androidrenderer_tpu.scene.material_storage import Material, MaterialStorage

    rng = np.random.default_rng(3)
    ms = MaterialStorage()
    tb = ms.add_texture(rng.integers(0, 256, (32, 32, 4)).astype(np.uint8))
    tn = ms.add_texture(rng.integers(0, 256, (32, 32, 4)).astype(np.uint8))
    tm = ms.add_texture(rng.integers(0, 256, (32, 32, 4)).astype(np.uint8))
    one = np.ones(4, np.float32)
    ms.add_material(Material(one, base_color_texture=tb, normal_texture=tn,
                             metal_rough_texture=tm))  # entry 1 (the triple)
    ms.add_material(Material(one, base_color_texture=tn))  # entry 2: nrm as base
    ms.add_material(Material(one, base_color_texture=tm))  # entry 3: mr as base
    pool, starts, log2b = ms.pack_texture_pool()
    pool = jnp.asarray(pool)

    n = 4096
    uv = jnp.asarray(rng.uniform(-2, 3, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(-1, 7, (n,)).astype(np.float32))

    def meta(e):
        return (jnp.full((n,), starts[e], jnp.int32),
                jnp.full((n,), log2b[e], jnp.int32))

    st, lb = meta(1)
    base, nrm, mr = tex.sample_material_fused(pool, st, lb, uv, lod)

    ref_base = tex.sample_trilinear_fused(pool, st, lb, uv, lod)
    np.testing.assert_allclose(np.asarray(base), np.asarray(ref_base), atol=1e-6)

    stn, lbn = meta(2)
    ref_nrm = tex.sample_trilinear(pool, stn, lbn, uv, lod)[..., :3]
    np.testing.assert_allclose(np.asarray(nrm), np.asarray(ref_nrm), atol=1e-6)

    stm, lbm = meta(3)
    ref_mr = tex.sample_trilinear(pool, stm, lbm, uv, lod)[..., 1:3]
    np.testing.assert_allclose(np.asarray(mr), np.asarray(ref_mr), atol=1e-6)
    # The integer-LOD MR sampler (RT hit shading) still matches bilinear.
    level = jnp.floor(jnp.clip(lod, 0.0, 5.0)).astype(jnp.int32)
    ref_mr2 = tex.sample_bilinear(pool, stm, lbm, uv, level)[..., 1:3]
    got_mr2 = tex.sample_mr_bilinear(pool, st, lb, uv, level)
    np.testing.assert_allclose(np.asarray(got_mr2), np.asarray(ref_mr2), atol=1e-6)


def test_material_triple_mixed_sizes_resample():
    """A triple whose normal/MR maps differ in size from the base resamples
    them to the triple's max size at bake — sampling must match the base-path
    sampling of the pre-resampled image."""
    import numpy as np
    import jax.numpy as jnp
    from androidrenderer_tpu.ops import texture as tex
    from androidrenderer_tpu.scene.material_storage import (
        Material, MaterialStorage, _resample_to_square,
    )

    rng = np.random.default_rng(7)
    ms = MaterialStorage()
    base64 = rng.integers(0, 256, (64, 64, 4)).astype(np.uint8)
    nrm16 = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    tb = ms.add_texture(base64)
    tn = ms.add_texture(nrm16)
    one = np.ones(4, np.float32)
    ms.add_material(Material(one, base_color_texture=tb, normal_texture=tn))
    # Reference: the UPSAMPLED normal registered as a base texture.
    tn_up = ms.add_texture(_resample_to_square(nrm16, 64))
    ms.add_material(Material(one, base_color_texture=tn_up))
    pool, starts, log2b = ms.pack_texture_pool()
    pool = jnp.asarray(pool)
    assert log2b[1] == 6  # triple size = max(64, 16) = 64

    n = 2048
    uv = jnp.asarray(rng.uniform(-1, 2, (n, 2)).astype(np.float32))
    lod = jnp.asarray(rng.uniform(0, 6, (n,)).astype(np.float32))
    st = jnp.full((n,), starts[1], jnp.int32)
    lb = jnp.full((n,), log2b[1], jnp.int32)
    _, nrm, _ = tex.sample_material_fused(pool, st, lb, uv, lod)

    st2 = jnp.full((n,), starts[2], jnp.int32)
    ref = tex.sample_trilinear(pool, st2, lb, uv, lod)[..., :3]
    np.testing.assert_allclose(np.asarray(nrm), np.asarray(ref), atol=1e-6)
