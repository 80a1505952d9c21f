"""BRDF + tonemap numeric parity tests (brdf.slangi:22-115, scene_upsample.frag:55-73)."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.ops import brdf as B
from androidrenderer_tpu.ops import post


def test_d_ggx_matches_manual():
    noh, rough = 0.9, 0.4
    k = rough / (1 - noh * noh + rough * rough)
    expected = k * k / np.float32(3.1415927)
    got = float(B.d_ggx(jnp.float32(noh), jnp.float32(rough)))
    assert abs(got - expected) < 1e-6


def test_schlick_endpoints():
    f0 = jnp.array([0.04, 0.04, 0.04])
    at_normal = B.f_schlick(jnp.float32(1.0), f0, 1.0)
    grazing = B.f_schlick(jnp.float32(0.0), f0, 1.0)
    assert np.allclose(np.asarray(at_normal), 0.04, atol=1e-6)
    assert np.allclose(np.asarray(grazing), 1.0, atol=1e-6)


def test_brdf_zero_below_horizon():
    n = jnp.array([0.0, 1.0, 0.0])
    v = jnp.array([0.0, 1.0, 0.0])
    l_below = B.normalize(jnp.array([0.3, -0.5, 0.1]))
    out = B.brdf(jnp.array([0.8, 0.2, 0.2]), n, jnp.array([0.0]), jnp.array([0.5]), l_below, v)
    assert np.allclose(np.asarray(out), 0.0)


def test_brdf_diffuse_only_matches_fd():
    # For a pure dielectric with normal incidence, Fd ~ albedo*(1-0.04)/pi * Burley.
    n = jnp.array([0.0, 1.0, 0.0])
    v = B.normalize(jnp.array([0.0, 1.0, 0.0]))
    l = B.normalize(jnp.array([0.0, 1.0, 0.0]))
    albedo = jnp.array([0.5, 0.5, 0.5])
    out = np.asarray(
        B.brdf(albedo, n, jnp.array([0.0]), jnp.array([1.0]), l, v, diffuse_only=True)
    )
    # Burley at NoV=NoL=LoH=1, rough=1: f90 = 2.5 ->
    # F(NoL)=F(NoV)=1 (u=1 => (1-u)^5=0 => f0=1) so Fd = 1/pi.
    expected = 0.5 * (1 - 0.04) / np.pi
    assert np.allclose(out, expected, rtol=1e-4)


def test_brdf_batched_shapes():
    shape = (4, 8)
    rng = np.random.default_rng(0)
    n = B.normalize(jnp.asarray(rng.normal(size=(*shape, 3)).astype(np.float32)))
    v = B.normalize(jnp.asarray(rng.normal(size=(*shape, 3)).astype(np.float32)))
    l = B.normalize(jnp.asarray(rng.normal(size=(*shape, 3)).astype(np.float32)))
    base = jnp.asarray(rng.uniform(0, 1, (*shape, 3)).astype(np.float32))
    metal = jnp.asarray(rng.uniform(0, 1, (*shape, 1)).astype(np.float32))
    rough = jnp.asarray(rng.uniform(0.05, 1, (*shape, 1)).astype(np.float32))
    out = np.asarray(B.brdf(base, n, metal, rough, l, v))
    assert out.shape == (*shape, 3)
    assert np.isfinite(out).all()
    assert (out >= 0).all()


def test_reinhard_tonemap_formula():
    c = jnp.array([[0.5, 1.0, 2.0]])
    luma = 0.5 * 0.2126 + 1.0 * 0.7152 + 2.0 * 0.0722
    factor = luma / (luma + 1.0)
    expected = np.clip(np.array([0.5, 1.0, 2.0]) * factor, 0, 1) ** (1 / 2.2)
    got = np.asarray(post.reinhard_tonemap(c))[0]
    assert np.allclose(got, expected, rtol=1e-5)


def test_composite_adds_bloom_with_reference_strength():
    scene = jnp.ones((2, 2, 3)) * 0.25
    bloom = jnp.ones((2, 2, 3))
    out_nb = np.asarray(post.composite(scene, None))
    out_b = np.asarray(post.composite(scene, bloom))
    # bloom raises brightness; strength default is the reference's 0.014159.
    assert (out_b > out_nb).all()
    manual = np.asarray(post.reinhard_tonemap(scene + bloom * 0.014159))
    assert np.allclose(out_b, manual)


def test_srgb_roundtrip():
    x = jnp.linspace(0, 1, 64)
    rt = np.asarray(post.srgb_to_linear(post.linear_to_srgb(x)))
    assert np.allclose(rt, np.asarray(x), atol=1e-5)


def test_to_uint8_rounds():
    assert int(post.to_uint8(jnp.float32(1.0))) == 255
    assert int(post.to_uint8(jnp.float32(0.0))) == 0
    assert int(post.to_uint8(jnp.float32(0.5))) in (127, 128)


def test_sky_multiscatter_energy():
    """Hillaire Psi_ms (procedural_sky multiscattering LUT analog): adds ambient
    energy everywhere, most visibly at low sun; the polynomial fit tracks the
    integrated LUT."""
    import numpy as np
    import jax.numpy as jnp

    from androidrenderer_tpu.ops import sky

    psi, mu_s, h_km = sky.multiscatter_lut()
    assert psi.min() >= 0.0 and psi.max() > 0.01
    co = sky.multiscatter_poly()
    MU, HK = np.meshgrid(mu_s, h_km, indexing="ij")
    fit = np.asarray(sky.psi_ms(jnp.asarray(MU), jnp.asarray(HK), jnp.asarray(co)))
    assert np.abs(fit - psi).max() <= 0.15 * psi.max()

    d = jnp.asarray([[0.0, 0.05, -0.999]])
    d = d / jnp.linalg.norm(d)
    dusk_sun = jnp.asarray([0.0, -0.15, -1.0])
    with_ms = float(np.asarray(sky.sky_radiance(d, dusk_sun, multiscatter=True)).sum())
    without = float(np.asarray(sky.sky_radiance(d, dusk_sun, multiscatter=False)).sum())
    assert with_ms > 1.05 * without, (with_ms, without)
