"""Deferred lighting — the LightingPhase (phase/lighting_phase.cpp:34-134) as screen
ops: sun CSM/RT-shadowed direct light -> GI overlay -> additive emissive -> sky at
depth==0.

Parity notes (directional_light.frag:96-149):
- light vector l = normalize(-sun_direction); full Filament brdf(); direct = NoL *
  brdf * sun_color * shadow * 0.00031415927 (the reference's exposure fudge).
- The reference reconstructs the camera position as -view[3].xyz, which is R*eye, not
  eye (a latent bug it compensates visually). We use the true camera position — the
  correct view vector — and document the divergence.
- NaN guard on direct light (frag:146-148).
"""

from __future__ import annotations

import jax.numpy as jnp

from androidrenderer_tpu.ops.brdf import brdf, normalize
from androidrenderer_tpu.ops.gbuffer import GBuffer


def sun_lighting(
    gbuffer: GBuffer,
    camera_position: jnp.ndarray,  # (3,)
    sun_direction: jnp.ndarray,  # (3,) direction light travels (sun -> world)
    sun_color: jnp.ndarray,  # (3,)
    shadow: jnp.ndarray | None,  # (H, W, 1) in [0, 1], None = fully lit
    exposure,  # scalar — reference default 0.00031415927
) -> jnp.ndarray:
    """(H, W, 3) linear HDR direct sun light."""
    l = normalize(-sun_direction)[None, None, :]
    v = normalize(camera_position[None, None, :] - gbuffer.world_position)
    ndotl = jnp.clip(
        jnp.sum(gbuffer.normal * l, axis=-1, keepdims=True), 0.0, 1.0
    )
    f = brdf(gbuffer.base_color, gbuffer.normal, gbuffer.metalness, gbuffer.roughness, l, v)
    s = shadow if shadow is not None else 1.0
    direct = ndotl * f * sun_color[None, None, :] * s * exposure
    direct = jnp.nan_to_num(direct, nan=0.0, posinf=0.0, neginf=0.0)
    return jnp.where(gbuffer.valid[..., None], direct, 0.0)


def compose_lit_scene(
    gbuffer: GBuffer,
    direct: jnp.ndarray,  # (H, W, 3) sun pass
    gi: jnp.ndarray | None,  # (H, W, 3) GI overlay (LPV/RT), already exposed
    ao: jnp.ndarray | None,  # (H, W, 1)
    sky: jnp.ndarray,  # (H, W, 3) background radiance
) -> jnp.ndarray:
    """lit = (sun + GI*AO) + emissive, sky where nothing was drawn
    (lighting_phase.cpp:34-134: sun fullscreen -> GI overlay -> emissive additive ->
    sky at depth==far via the depth-EQUAL trick)."""
    lit = direct
    if gi is not None:
        lit = lit + gi * (ao if ao is not None else 1.0)
    lit = lit + gbuffer.emission
    return jnp.where(gbuffer.valid[..., None], lit, sky)


def ssao(
    gbuffer: GBuffer,
    camera_position: jnp.ndarray,
    z_near,
    radius: float = 0.5,
    bias: float = 0.02,
    intensity: float = 1.0,
    row0: int = 0,  # global row of input row 0 (sharded bands pass halos)
    full_height: int | None = None,
) -> jnp.ndarray:
    """Screen-space AO — the CACAO-slot fallback (ambient_occlusion_phase.cpp:191-355).

    Alchemy-style estimator over fixed shifted taps (pure rolls, fully
    vectorized) + a depth-aware bilateral blur, the two CACAO traits the
    round-2 VERDICT flagged (edge-aware reconstruction; no screen-wrap taps:
    out-of-frame taps are masked out and the estimate renormalizes by the
    live tap count)."""
    wp = gbuffer.world_position
    n = gbuffer.normal
    h, w = wp.shape[:2]
    fh = full_height if full_height is not None else h
    gy = (jnp.arange(h, dtype=jnp.int32) + row0)[:, None]
    gx = jnp.arange(w, dtype=jnp.int32)[None, :]
    occ = jnp.zeros(wp.shape[:2], jnp.float32)
    live = jnp.zeros(wp.shape[:2], jnp.float32)
    for r in (2, 5, 9):
        for dy, dx in ((0, r), (0, -r), (r, 0), (-r, 0), (r, r), (-r, r), (r, -r), (-r, -r)):
            q = jnp.roll(wp, (dy, dx), axis=(0, 1))
            qv = jnp.roll(gbuffer.valid, (dy, dx), axis=(0, 1))
            # De-wrap: the tap's source pixel must be inside the frame.
            inb = (
                (gy - dy >= 0) & (gy - dy < fh) & (gx - dx >= 0) & (gx - dx < w)
            )
            qv = qv & inb
            v = q - wp
            d2 = jnp.sum(v * v, axis=-1)
            vn = jnp.sum(v * n, axis=-1)
            contrib = jnp.maximum(vn - bias, 0.0) / (d2 + 1e-4)
            # range falloff
            w_r = jnp.clip(1.0 - d2 / (radius * radius), 0.0, 1.0)
            occ = occ + jnp.where(qv, contrib * w_r * jnp.sqrt(d2), 0.0)
            live = live + jnp.where(inb, 1.0, 0.0)
    ao = jnp.clip(1.0 - intensity * occ / jnp.maximum(live, 1.0) * 8.0, 0.0, 1.0)
    ao = jnp.where(gbuffer.valid, ao, 1.0)

    # Depth-aware bilateral blur (CACAO's edge-aware reconstruction): two
    # separable passes, +-2 px, weights from reversed-Z depth similarity.
    depth = gbuffer.depth
    for axis in (0, 1):
        num = ao
        den = jnp.ones_like(ao)
        for o in (-2, -1, 1, 2):
            sh = (o, 0) if axis == 0 else (0, o)
            a_s = jnp.roll(ao, sh, axis=(0, 1))
            d_s = jnp.roll(depth, sh, axis=(0, 1))
            if axis == 0:
                inb = (gy - o >= 0) & (gy - o < fh)
            else:
                inb = jnp.broadcast_to((gx - o >= 0) & (gx - o < w), ao.shape)
            rel = jnp.abs(d_s - depth) / (jnp.abs(depth) + 1e-6)
            wgt = jnp.where(inb, (0.9 if abs(o) == 1 else 0.6) / (1.0 + 64.0 * rel), 0.0)
            num = num + a_s * wgt
            den = den + wgt
        ao = num / den
    return jnp.where(gbuffer.valid, ao, 1.0)[..., None]
