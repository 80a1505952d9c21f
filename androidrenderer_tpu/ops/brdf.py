"""Filament-style PBR BRDF — numeric parity with shaders/common/brdf.slangi:22-115.

diffuse = Burley, specular = GGX ``D_GGX`` x height-correlated Smith
``V_SmithGGXCorrelated`` x Schlick Fresnel with f90 = 1;
``f0 = lerp(0.04, base_color, metalness)``;
``diffuse_color = base_color * (1 - 0.04) * (1 - metalness)``.

All functions are broadcasting jnp ops over trailing feature axes: vectors are (..., 3),
scalars (..., 1) or (...,). Everything is pure and jit/vmap-friendly — the sun lighting
pass evaluates these over the full screen at once (directional_light.frag:62-149).
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.1415927
DIELECTRIC_F0 = 0.04


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return v * jnp.reciprocal(jnp.sqrt(jnp.maximum(_dot(v, v), eps)))


def d_ggx(noh: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """brdf.slangi:22-25."""
    k = roughness / (1.0 - noh * noh + roughness * roughness)
    return k * k * (1.0 / PI)


def f_schlick(u: jnp.ndarray, f0: jnp.ndarray, f90) -> jnp.ndarray:
    """brdf.slangi:27."""
    return f0 + (f90 - f0) * jnp.clip(1.0 - u, 0.0, 1.0) ** 5


def v_smith_ggx_correlated(nov: jnp.ndarray, nol: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """brdf.slangi:29-35."""
    a2 = a * a
    ggxl = nov * jnp.sqrt((-nol * a2 + nol) * nol + a2)
    ggxv = nol * jnp.sqrt((-nov * a2 + nov) * nov + a2)
    return 0.5 / jnp.maximum(ggxv + ggxl, 1e-9)


def fd_lambert() -> float:
    return 1.0 / PI


def fd_burley(
    nov: jnp.ndarray, nol: jnp.ndarray, loh: jnp.ndarray, roughness: jnp.ndarray
) -> jnp.ndarray:
    """brdf.slangi:39-45."""
    f90 = 0.5 + 2.0 * roughness * loh * loh
    light_scatter = f_schlick(nol, jnp.ones_like(nol), f90)
    view_scatter = f_schlick(nov, jnp.ones_like(nov), f90)
    return light_scatter * view_scatter * (1.0 / PI)


def brdf(
    base_color: jnp.ndarray,  # (..., 3)
    normal: jnp.ndarray,  # (..., 3) unit
    metalness: jnp.ndarray,  # (..., 1)
    roughness: jnp.ndarray,  # (..., 1)
    l: jnp.ndarray,  # (..., 3) unit, surface -> light
    v: jnp.ndarray,  # (..., 3) unit, surface -> view
    diffuse_only: bool = False,
) -> jnp.ndarray:
    """Full brdf() = Fd + Fr (brdf.slangi:60-115). Returns (..., 3).

    ``diffuse_only=True`` gives the Fd-only variant used by the RSM flux pass and RT
    bounce shading (gltf_basic_pbr.slang:246, 438).
    """
    f0 = DIELECTRIC_F0 + (base_color - DIELECTRIC_F0) * metalness
    diffuse_color = base_color * (1.0 - DIELECTRIC_F0) * (1.0 - metalness)

    h = normalize(v + l)
    nov = jnp.abs(_dot(normal, v) + 1e-5)
    nol_raw = _dot(normal, l)
    nol = jnp.clip(nol_raw, 0.0, 1.0)
    noh = jnp.clip(_dot(normal, h), 0.0, 1.0)
    voh = jnp.clip(_dot(v, h), 0.0, 1.0)
    loh = jnp.clip(_dot(l, h), 0.0, 1.0)

    fd = diffuse_color * fd_burley(nov, nol, loh, roughness)
    if diffuse_only:
        result = fd
    else:
        d = d_ggx(noh, roughness)
        f = f_schlick(voh, f0, 1.0)
        vis = v_smith_ggx_correlated(nov, nol, roughness)
        fr = (d * vis) * f
        result = fd + fr

    # NoL <= 0 contributes nothing (brdf.slangi:83-85).
    return jnp.where(nol_raw > 0.0, result, 0.0)
