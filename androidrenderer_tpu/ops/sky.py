"""Procedural sky — Hillaire 2020 atmosphere (procedural_sky.cpp:75-172).

Structure matches the reference: per-frame LUT passes (transmittance 256x64,
multi-scattering 32x32, sky-view 200x200) + a fullscreen apply at depth==far, and the
same LUTs feed the RT miss shaders and LPV sky injection.

This module currently ships the sky-view evaluation in closed form (single-scattering
Rayleigh/Mie with an analytic optical-depth approximation) producing the LUT-shaped
arrays the rest of the pipeline consumes; the full multi-scatter LUT chain is the
documented upgrade path. All constants follow Hillaire's earth preset.
"""

from __future__ import annotations

import jax.numpy as jnp

from androidrenderer_tpu.ops.brdf import normalize

# Hillaire earth-atmosphere preset.
GROUND_RADIUS_MM = 6.360  # megameters
ATMO_RADIUS_MM = 6.460
RAYLEIGH_SCATTER = jnp.array([5.802, 13.558, 33.1])  # per Mm
RAYLEIGH_ABSORB = 0.0
MIE_SCATTER = 3.996
MIE_ABSORB = 4.4
OZONE_ABSORB = jnp.array([0.650, 1.881, 0.085])
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


def sky_radiance(
    directions: jnp.ndarray,  # (..., 3) world-space unit view rays (y up)
    sun_direction: jnp.ndarray,  # (3,) direction the light TRAVELS
    sun_color_scale: jnp.ndarray | float = 1.0,
    altitude_km: float = 0.2,
    num_steps: int = 12,
) -> jnp.ndarray:
    """Single-scattered sky radiance (..., 3), relative units (scaled by caller)."""
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
