"""Procedural sky — Hillaire 2020 atmosphere (procedural_sky.cpp:75-172).

Structure matches the reference: per-frame LUT passes (transmittance 256x64,
multi-scattering 32x32, sky-view 200x200) + a fullscreen apply at depth==far, and the
same LUTs feed the RT miss shaders and LPV sky injection.

The per-pixel march evaluates single scattering in closed form (analytic optical
depths) plus the Hillaire multiple-scattering term: the 32x32 Psi_ms LUT is
integrated host-side once (multiscatter_lut) and applied through a polynomial fit
(psi_ms) because per-step LUT gathers are a ~27 ms/step TPU trap. Constants are
the reference shader's (ARPC-modified rayleigh/ozone, sky/common.glsl:25-33).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from androidrenderer_tpu.ops.brdf import normalize

# Atmosphere preset = the reference's actual shader constants
# (sky/common.glsl:25-33): Hillaire's framework with the rayleigh/ozone bases
# deliberately replaced by ARPC-derived values (the Hillaire originals are kept
# commented out there). viewPos is fixed 200 m above ground (common.glsl:13) —
# altitude_km defaults below match.
GROUND_RADIUS_MM = 6.360  # megameters
ATMO_RADIUS_MM = 6.460
RAYLEIGH_SCATTER = np.array([6.6, 12.3, 29.4], np.float32)  # per Mm (ARPC)
RAYLEIGH_ABSORB = 0.0
MIE_SCATTER = 3.996
MIE_ABSORB = 4.4
OZONE_ABSORB = np.array([2.26, 1.54, 0.0], np.float32)  # (ARPC)
GROUND_ALBEDO = 0.3


def _rayleigh_phase(cos_theta):
    return 3.0 * (1.0 + cos_theta**2) / (16.0 * jnp.pi)


def _mie_phase(cos_theta, g=0.8):
    g2 = g * g
    num = (1.0 - g2) * (1.0 + cos_theta**2)
    den = (2.0 + g2) * (1.0 + g2 - 2.0 * g * cos_theta) ** 1.5
    return 3.0 / (8.0 * jnp.pi) * num / jnp.maximum(den, 1e-6)


def _densities(h_km):
    """Rayleigh / Mie / ozone density at altitude h (km)."""
    rho_r = jnp.exp(-h_km / 8.0)
    rho_m = jnp.exp(-h_km / 1.2)
    rho_o = jnp.maximum(0.0, 1.0 - jnp.abs(h_km - 25.0) / 15.0)
    return rho_r, rho_m, rho_o


def _ray_sphere_exit(o_mm, d, radius):
    """Distance to sphere exit for origin inside sphere (o in Mm)."""
    b = jnp.sum(o_mm * d, axis=-1)
    c = jnp.sum(o_mm * o_mm, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    return -b + jnp.sqrt(disc)


# --- Multiple scattering (procedural_sky.cpp:75-149, multiscattering_lut.comp) ----
#
# Hillaire's Psi_ms factor: the energy a point receives from all scattering
# orders beyond the first, assuming isotropic transfer: Psi = L_2nd / (1 - f_ms),
# tabulated over (sun zenith cosine, altitude). A 32x32 LUT is computed host-side
# once; the per-pixel march can't afford LUT gathers (a 2M-row gather is ~27 ms
# PER STEP on TPU), so the smooth LUT is fitted with a low-order 2D polynomial
# whose evaluation is free VPU math.

_MS_CACHE = {}


def multiscatter_lut(res: int = 32, dirs: int = 64, steps: int = 20):
    """(res, res) x 3 numpy LUT: Psi_ms over (mu_s in [-1,1], h in [0, atmo])."""
    import numpy as np

    key = (res, dirs, steps)
    if key in _MS_CACHE:
        return _MS_CACHE[key]
    rs = np.asarray(RAYLEIGH_SCATTER)
    oz = np.asarray(OZONE_ABSORB)

    mu_s = np.linspace(-1.0, 1.0, res)
    h_km = np.linspace(0.01, (ATMO_RADIUS_MM - GROUND_RADIUS_MM) * 1e3 - 1.0, res)
    # Fibonacci sphere directions.
    i = np.arange(dirs) + 0.5
    phi = np.pi * (1.0 + 5.0**0.5) * i
    ct = 1.0 - 2.0 * i / dirs
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    dvec = np.stack([st * np.cos(phi), ct, st * np.sin(phi)], -1)  # (D, 3)

    MU, HK = np.meshgrid(mu_s, h_km, indexing="ij")
    to_sun = np.stack([np.sqrt(np.maximum(1 - MU**2, 0.0)), MU, np.zeros_like(MU)], -1)
    o = np.zeros((res, res, 3))
    o[..., 1] = GROUND_RADIUS_MM + HK * 1e-3

    l2 = np.zeros((res, res, 3))
    fms = np.zeros((res, res, 3))
    for k in range(dirs):
        d = dvec[k]
        b = np.sum(o * d, -1)
        c_a = np.sum(o * o, -1) - ATMO_RADIUS_MM**2
        t_atmo = -b + np.sqrt(np.maximum(b * b - c_a, 0.0))
        c_g = np.sum(o * o, -1) - GROUND_RADIUS_MM**2
        disc = b * b - c_g
        tg = np.where(
            (disc > 0) & (-b - np.sqrt(np.maximum(disc, 0)) > 0),
            -b - np.sqrt(np.maximum(disc, 0)), np.inf,
        )
        t_max = np.minimum(t_atmo, tg)
        dt = t_max / steps
        trans = np.ones((res, res, 3))
        for s in range(steps):
            t = (s + 0.5) * dt
            p = o + d[None, None, :] * t[..., None]
            hh = (np.sqrt(np.sum(p * p, -1)) - GROUND_RADIUS_MM) * 1e3
            rho_r = np.exp(-hh / 8.0)
            rho_m = np.exp(-hh / 1.2)
            rho_o = np.maximum(0.0, 1.0 - np.abs(hh - 25.0) / 15.0)
            scat = rs * rho_r[..., None] + MIE_SCATTER * rho_m[..., None]
            ext = (
                rs * rho_r[..., None]
                + (MIE_SCATTER + MIE_ABSORB) * rho_m[..., None]
                + oz * rho_o[..., None]
            )
            # Sun transmittance (same Chapman approximation as the march).
            up = p / np.maximum(np.sqrt(np.sum(p * p, -1))[..., None], 1e-9)
            ms = np.sum(up * to_sun, -1)
            air = 1.0 / np.maximum(ms + 0.15 * np.maximum(ms + 0.24, 0.0) ** 0.2, 0.02)
            od = (
                rs * (rho_r * 8e-3 * air)[..., None]
                + (MIE_SCATTER + MIE_ABSORB) * (rho_m * 1.2e-3 * air)[..., None]
                + oz * (rho_o * 15e-3 * air * 0.35)[..., None]
            )
            sun_t = np.exp(-od) * (ms > -0.1)[..., None]
            step_t = np.exp(-ext * dt[..., None])
            integ = (1.0 - step_t) / np.maximum(ext, 1e-6)
            # Second order: isotropic phase 1/4pi; f_ms: scattered-anywhere factor.
            l2 += trans * scat * (1.0 / (4.0 * np.pi)) * sun_t * integ
            fms += trans * scat * integ
            trans = trans * step_t
        # Ground bounce contributes to L_2nd.
        hit = np.isfinite(tg) & (tg < t_atmo)
        pg = o + d[None, None, :] * np.where(hit, tg, 0.0)[..., None]
        upg = pg / np.maximum(np.sqrt(np.sum(pg * pg, -1))[..., None], 1e-9)
        nl = np.clip(np.sum(upg * to_sun, -1), 0.0, 1.0)
        l2 += np.where(
            hit[..., None], trans * (GROUND_ALBEDO / np.pi) * nl[..., None], 0.0
        )
    l2 /= dirs
    fms /= dirs
    psi = l2 / np.maximum(1.0 - fms, 1e-3)
    _MS_CACHE[key] = (psi, mu_s, h_km)
    return _MS_CACHE[key]


def multiscatter_poly(deg: int = 5):
    """Per-channel 2D polynomial fit of sqrt(Psi_ms) over (mu_s, h_norm).

    sqrt-domain fitting keeps the reconstruction non-negative-ish and resolves
    the dark low-sun corner better. Returns (deg+1, deg+1, 3) coefficients."""
    import numpy as np

    key = ("poly", deg)
    if key in _MS_CACHE:
        return _MS_CACHE[key]
    psi, mu_s, h_km = multiscatter_lut()
    hn = h_km / h_km[-1]
    MU, HN = np.meshgrid(mu_s, hn, indexing="ij")
    basis = np.stack(
        [MU**i * HN**j for i in range(deg + 1) for j in range(deg + 1)], -1
    ).reshape(-1, (deg + 1) ** 2)
    target = np.sqrt(np.maximum(psi, 0.0)).reshape(-1, 3)
    coeffs, *_ = np.linalg.lstsq(basis, target, rcond=None)
    out = coeffs.reshape(deg + 1, deg + 1, 3).astype(np.float32)
    _MS_CACHE[key] = out
    return out


def psi_ms(mu_s, h_km, coeffs) -> jnp.ndarray:
    """(..., 3) Psi_ms from the polynomial fit — pure elementwise math."""
    deg = coeffs.shape[0] - 1
    hn = jnp.clip(h_km / ((ATMO_RADIUS_MM - GROUND_RADIUS_MM) * 1e3 - 1.0), 0.0, 1.0)
    mu = jnp.clip(mu_s, -1.0, 1.0)
    acc = jnp.zeros((*mu.shape, 3))
    mi = jnp.ones_like(mu)
    for i in range(deg + 1):
        hj = jnp.ones_like(hn)
        for j in range(deg + 1):
            acc = acc + (mi * hj)[..., None] * coeffs[i, j]
            hj = hj * hn
        mi = mi * mu
    return jnp.maximum(acc, 0.0) ** 2


def sky_radiance(
    directions: jnp.ndarray,  # (..., 3) world-space unit view rays (y up)
    sun_direction: jnp.ndarray,  # (3,) direction the light TRAVELS
    sun_color_scale: jnp.ndarray | float = 1.0,
    altitude_km: float = 0.2,
    num_steps: int = 12,
    multiscatter: bool = True,
) -> jnp.ndarray:
    """Sky radiance (..., 3), relative units (scaled by caller): single scattering
    + the Hillaire multiple-scattering term (Psi_ms polynomial; procedural_sky's
    multiscattering LUT analog)."""
    to_sun = normalize(-sun_direction.astype(jnp.float32))
    d = directions
    o = jnp.zeros_like(d) + jnp.array([0.0, GROUND_RADIUS_MM + altitude_km * 1e-3, 0.0])

    # Ground intersection shortens the ray.
    t_atmo = _ray_sphere_exit(o, d, ATMO_RADIUS_MM)
    b = jnp.sum(o * d, axis=-1)
    c_g = jnp.sum(o * o, axis=-1) - GROUND_RADIUS_MM**2
    disc_g = b * b - c_g
    t_ground = jnp.where(
        (disc_g > 0) & (-b - jnp.sqrt(jnp.maximum(disc_g, 0.0)) > 0),
        -b - jnp.sqrt(jnp.maximum(disc_g, 0.0)),
        jnp.inf,
    )
    t_max = jnp.minimum(t_atmo, t_ground)

    cos_sun = jnp.sum(d * to_sun, axis=-1)
    ph_r = _rayleigh_phase(cos_sun)[..., None]
    ph_m = _mie_phase(cos_sun)[..., None]

    dt = t_max / num_steps
    lum = jnp.zeros((*d.shape[:-1], 3))
    transmittance = jnp.ones((*d.shape[:-1], 3))
    psi0 = None
    for i in range(num_steps):
        t = (i + 0.5) * dt
        p = o + d * t[..., None]
        h_km = (jnp.sqrt(jnp.sum(p * p, axis=-1)) - GROUND_RADIUS_MM) * 1e3
        rho_r, rho_m, rho_o = _densities(h_km)
        scat_r = RAYLEIGH_SCATTER * rho_r[..., None]
        scat_m = MIE_SCATTER * rho_m[..., None]
        extinction = (
            scat_r
            + (MIE_SCATTER + MIE_ABSORB) * rho_m[..., None]
            + OZONE_ABSORB * rho_o[..., None]
        )
        # Sun transmittance: analytic Chapman-ish approximation along the sun ray.
        mu_s = jnp.sum(normalize(p) * to_sun, axis=-1)
        air_mass = 1.0 / jnp.maximum(mu_s + 0.15 * (mu_s + 0.24) ** 0.2, 0.02)
        od_sun = (
            RAYLEIGH_SCATTER * (rho_r * 8e-3 * air_mass)[..., None]
            + (MIE_SCATTER + MIE_ABSORB) * (rho_m * 1.2e-3 * air_mass)[..., None]
            + OZONE_ABSORB * (rho_o * 15e-3 * air_mass * 0.35)[..., None]
        )
        sun_t = jnp.exp(-od_sun) * (mu_s > -0.1)[..., None]
        in_scatter = (scat_r * ph_r + scat_m * ph_m) * sun_t
        if multiscatter:
            if psi0 is None:
                # Higher scattering orders (multiscattering_lut.comp analog):
                # Psi_ms evaluated ONCE per pixel at the first march sample — a
                # per-STEP polynomial evaluation costs ~36 (H,W,3) map ops x 12
                # steps and measured +200 ms/frame; Psi varies slowly along
                # ground-level view rays (mu_s is nearly constant, altitude
                # decay is gentle), so the single evaluation is within a few
                # percent of the per-step integral.
                psi0 = psi_ms(mu_s, h_km, jnp.asarray(multiscatter_poly()))
            in_scatter = in_scatter + (scat_r + scat_m) * psi0
        step_t = jnp.exp(-extinction * dt[..., None])
        lum = lum + transmittance * in_scatter * (1.0 - step_t) / jnp.maximum(
            extinction, 1e-6
        )
        transmittance = transmittance * step_t

    # Sun disc (angular radius ~0.53 deg) through remaining transmittance.
    sun_disc = (cos_sun > 0.999957) & (t_ground == jnp.inf)
    lum = lum + jnp.where(sun_disc[..., None], transmittance * 1000.0, 0.0)
    return lum * sun_color_scale


def view_ray_directions(
    inverse_view: jnp.ndarray,  # (4, 4)
    p00,
    p11,
    height: int,
    width: int,
    row_offset: jnp.ndarray | int = 0,
    full_height: int | None = None,
) -> jnp.ndarray:
    """(H, W, 3) world-space unit rays through pixel centers. ``height`` is the band
    height; ``full_height`` the whole frame's (defaults to height)."""
    fh = full_height or height
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = 1.0 - (jnp.arange(height, dtype=jnp.float32) + row_offset + 0.5) / fh * 2.0
    x = px[None, :] / p00
    y = py[:, None] / p11
    d_view = jnp.stack(
        [jnp.broadcast_to(x, (height, width)), jnp.broadcast_to(y, (height, width)),
         -jnp.ones((height, width))],
        axis=-1,
    )
    d_world = d_view @ inverse_view[:3, :3].T
    return normalize(d_world)


def sky_background(
    inverse_view: jnp.ndarray,
    p00,
    p11,
    sun_direction: jnp.ndarray,
    sun_color: jnp.ndarray,
    height: int,
    width: int,
    exposure=0.00031415927,
    row_offset: jnp.ndarray | int = 0,
    full_height: int | None = None,
) -> jnp.ndarray:
    """(H, W, 3) HDR sky for the background pass, pre-scaled to lit-scene units."""
    dirs = view_ray_directions(inverse_view, p00, p11, height, width, row_offset, full_height)
    lum = sky_radiance(dirs, sun_direction)
    return lum * sun_color[None, None, :] * exposure * 0.05


# ---------------------------------------------------------------------------
# LUT pipeline (procedural_sky.cpp:75-149): transmittance LUT (static, baked at
# first use), per-frame sky-view LUT (in-jit march using the transmittance LUT),
# and a cheap per-pixel LUT sample for backgrounds / RT misses.

import numpy as _np

_TRANSMITTANCE_LUT = None
T_LUT_MU = 64  # sun zenith cosine axis
T_LUT_H = 64  # altitude axis (0..atmosphere top)
SKY_LUT_H = 128
SKY_LUT_W = 256


def transmittance_lut() -> jnp.ndarray:
    """(T_LUT_H, T_LUT_MU, 3) transmittance toward the sun from altitude h at
    zenith-cosine mu (256x64 LUT in the reference; static — atmosphere constants
    only), baked in numpy on first use."""
    global _TRANSMITTANCE_LUT
    if _TRANSMITTANCE_LUT is None:
        hs = _np.linspace(0.0, (ATMO_RADIUS_MM - GROUND_RADIUS_MM), T_LUT_H)
        mus = _np.linspace(-0.2, 1.0, T_LUT_MU)
        rs = _np.asarray(RAYLEIGH_SCATTER)
        oz = _np.asarray(OZONE_ABSORB)
        lut = _np.zeros((T_LUT_H, T_LUT_MU, 3), _np.float32)
        steps = 48
        for hi, h in enumerate(hs):
            for mi, mu in enumerate(mus):
                # March from (0, r0, 0) toward direction (sin, mu) to atmosphere top.
                r0 = GROUND_RADIUS_MM + h
                s = _np.sqrt(max(1.0 - mu * mu, 0.0))
                o = _np.array([0.0, r0])
                d = _np.array([s, mu])
                b = o @ d
                c = o @ o - ATMO_RADIUS_MM**2
                t_exit = -b + _np.sqrt(max(b * b - c, 0.0))
                od = _np.zeros(3)
                dt = t_exit / steps
                for k in range(steps):
                    p = o + d * (k + 0.5) * dt
                    hk = (_np.linalg.norm(p) - GROUND_RADIUS_MM) * 1e3  # km
                    rho_r = _np.exp(-hk / 8.0)
                    rho_m = _np.exp(-hk / 1.2)
                    rho_o = max(0.0, 1.0 - abs(hk - 25.0) / 15.0)
                    od += (rs * rho_r + (MIE_SCATTER + MIE_ABSORB) * rho_m
                           + oz * rho_o) * dt
                lut[hi, mi] = _np.exp(-od)
        _TRANSMITTANCE_LUT = lut  # cache HOST numpy — caching a jnp array created
        # inside a jit trace would leak a tracer out of the transform.
    return jnp.asarray(_TRANSMITTANCE_LUT)


def _sample_transmittance(t_lut: jnp.ndarray, h_mm, mu):
    """Bilinear LUT fetch; h in Mm above ground, mu = cos zenith toward sun."""
    hx = jnp.clip(h_mm / (ATMO_RADIUS_MM - GROUND_RADIUS_MM), 0.0, 1.0) * (T_LUT_H - 1)
    mx = jnp.clip((mu + 0.2) / 1.2, 0.0, 1.0) * (T_LUT_MU - 1)
    h0 = jnp.floor(hx).astype(jnp.int32)
    m0 = jnp.floor(mx).astype(jnp.int32)
    h1 = jnp.minimum(h0 + 1, T_LUT_H - 1)
    m1 = jnp.minimum(m0 + 1, T_LUT_MU - 1)
    fh = (hx - h0)[..., None]
    fm = (mx - m0)[..., None]
    a = t_lut[h0, m0] * (1 - fm) + t_lut[h0, m1] * fm
    b = t_lut[h1, m0] * (1 - fm) + t_lut[h1, m1] * fm
    return a * (1 - fh) + b * fh


def build_sky_view_lut(
    sun_direction: jnp.ndarray, altitude_km: float = 0.2, num_steps: int = 32
) -> jnp.ndarray:
    """(SKY_LUT_H, SKY_LUT_W, 3) per-frame sky-view LUT (200x200 in the reference).

    Texel mapping: u = azimuth relative to the sun's azimuth / 2pi; v = non-linear
    elevation warp (Hillaire): elevation = sign(x) * x^2 * pi/2, x = 2v - 1."""
    t_lut = transmittance_lut()
    to_sun = normalize(-sun_direction.astype(jnp.float32))
    sun_az = jnp.arctan2(to_sun[2], to_sun[0])
    sun_el = jnp.arcsin(jnp.clip(to_sun[1], -1.0, 1.0))

    u = (jnp.arange(SKY_LUT_W, dtype=jnp.float32) + 0.5) / SKY_LUT_W
    v = (jnp.arange(SKY_LUT_H, dtype=jnp.float32) + 0.5) / SKY_LUT_H
    az = u[None, :] * (2.0 * jnp.pi) + sun_az
    x = v[:, None] * 2.0 - 1.0
    el = jnp.sign(x) * x * x * (jnp.pi / 2.0)
    ce = jnp.cos(el)
    dirs = jnp.stack(
        [
            jnp.broadcast_to(ce * jnp.cos(az), (SKY_LUT_H, SKY_LUT_W)),
            jnp.broadcast_to(jnp.sin(el), (SKY_LUT_H, SKY_LUT_W)),
            jnp.broadcast_to(ce * jnp.sin(az), (SKY_LUT_H, SKY_LUT_W)),
        ],
        axis=-1,
    )

    # Single-scatter march with LUT-accurate sun transmittance.
    d = dirs
    o = jnp.array([0.0, GROUND_RADIUS_MM + altitude_km * 1e-3, 0.0])
    t_atmo = _ray_sphere_exit(o[None, None, :] + 0 * d, d, ATMO_RADIUS_MM)
    b = jnp.sum(o * d, axis=-1)
    c_g = o @ o - GROUND_RADIUS_MM**2
    disc = b * b - c_g
    t_ground = jnp.where(
        (disc > 0) & (-b - jnp.sqrt(jnp.maximum(disc, 0.0)) > 0),
        -b - jnp.sqrt(jnp.maximum(disc, 0.0)), jnp.inf,
    )
    t_max = jnp.minimum(t_atmo, t_ground)
    cos_sun = jnp.sum(d * to_sun, axis=-1)
    ph_r = _rayleigh_phase(cos_sun)[..., None]
    ph_m = _mie_phase(cos_sun)[..., None]
    dt = t_max / num_steps
    lum = jnp.zeros((SKY_LUT_H, SKY_LUT_W, 3))
    trans = jnp.ones((SKY_LUT_H, SKY_LUT_W, 3))
    for i in range(num_steps):
        t = (i + 0.5) * dt
        p = o + d * t[..., None]
        r = jnp.sqrt(jnp.sum(p * p, axis=-1))
        h_km = (r - GROUND_RADIUS_MM) * 1e3
        rho_r, rho_m, rho_o = _densities(h_km)
        scat_r = RAYLEIGH_SCATTER * rho_r[..., None]
        scat_m = MIE_SCATTER * rho_m[..., None]
        ext = (scat_r + (MIE_SCATTER + MIE_ABSORB) * rho_m[..., None]
               + OZONE_ABSORB * rho_o[..., None])
        mu_s = jnp.sum(p * to_sun, axis=-1) / jnp.maximum(r, 1e-6)
        sun_t = _sample_transmittance(t_lut, (r - GROUND_RADIUS_MM), mu_s)
        in_scatter = (scat_r * ph_r + scat_m * ph_m) * sun_t
        step_t = jnp.exp(-ext * dt[..., None])
        lum = lum + trans * in_scatter * (1.0 - step_t) / jnp.maximum(ext, 1e-6)
        trans = trans * step_t
    return lum


def sample_sky_lut(
    lut: jnp.ndarray, directions: jnp.ndarray, sun_direction: jnp.ndarray
) -> jnp.ndarray:
    """(..., 3) radiance from the sky-view LUT for arbitrary unit directions."""
    to_sun = normalize(-sun_direction.astype(jnp.float32))
    sun_az = jnp.arctan2(to_sun[2], to_sun[0])
    az = jnp.arctan2(directions[..., 2], directions[..., 0]) - sun_az
    u = jnp.mod(az / (2.0 * jnp.pi), 1.0)
    el = jnp.arcsin(jnp.clip(directions[..., 1], -1.0, 1.0))
    x = jnp.sign(el) * jnp.sqrt(jnp.abs(el) / (jnp.pi / 2.0))
    v = jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)
    fx = u * SKY_LUT_W - 0.5
    fy = v * SKY_LUT_H - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    gx = (fx - x0)[..., None]
    gy = (fy - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), SKY_LUT_W)
    x1i = jnp.mod(x0i + 1, SKY_LUT_W)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, SKY_LUT_H - 1)
    y1i = jnp.minimum(y0i + 1, SKY_LUT_H - 1)
    a = lut[y0i, x0i] * (1 - gx) + lut[y0i, x1i] * gx
    b = lut[y1i, x0i] * (1 - gx) + lut[y1i, x1i] * gx
    lum = a * (1 - gy) + b * gy
    # Sun disc through transmittance (as the non-LUT path).
    cos_sun = jnp.sum(directions * to_sun, axis=-1)
    t_lut = transmittance_lut()
    sun_t = _sample_transmittance(t_lut, jnp.zeros_like(cos_sun) + 2e-4, cos_sun)
    disc = (cos_sun > 0.999957) & (directions[..., 1] > -0.05)
    return lum + jnp.where(disc[..., None], sun_t * 1000.0, 0.0)


# NOTE (TPU cost model): at 2M px the 4 bilinear LUT gathers cost ~180 ms while the
# 12-step analytic march is ~6 ms of pure VPU math — on TPU, compute beats memory.
# The LUT path exists for structural parity and for low-ray-count consumers (probe
# updates); full-screen consumers use sky_background / sky_radiance.
def sky_background_lut(
    inverse_view: jnp.ndarray,
    p00,
    p11,
    sun_direction: jnp.ndarray,
    sun_color: jnp.ndarray,
    height: int,
    width: int,
    exposure=0.00031415927,
    row_offset=0,
    full_height: int | None = None,
) -> jnp.ndarray:
    """LUT-driven background: per-frame 128x256 LUT march + per-pixel bilinear."""
    lut = build_sky_view_lut(sun_direction)
    dirs = view_ray_directions(inverse_view, p00, p11, height, width, row_offset,
                               full_height)
    lum = sample_sky_lut(lut, dirs, sun_direction)
    # The physically-integrated LUT is ~10x dimmer than the legacy closed-form
    # approximation (which under-attenuated the sun ray); keep display brightness.
    return lum * sun_color[None, None, :] * exposure * 0.5
