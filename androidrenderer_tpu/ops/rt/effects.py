"""RT effects over the BVH: sun shadows, ambient occlusion, multi-bounce GI.

Parity targets:
- RT sun shadows (directional_light.cpp:372-422, directional_light.rt.slang): one ray
  per pixel toward the sun, jittered within the solar disc (tan size from
  sun_light_constants), origin offset along the normal.
- RTAO (shaders/ao/rtao.comp.slang:55-90): cosine-ish hemisphere rays, TMin 0.01,
  TMax cvar (default 8 m), occlusion decrements the sample count.
- RTGI (gi/rtgi.cpp:69-139, rtgi.rt.slang:57-110): one noise-driven cosine ray per
  pixel; closest hit evaluates sun diffuse with a shadow ray; sky on miss; result is
  irradiance scaled by the 0.0031415927 exposure fudge. Backface hits go black
  (gltf_basic_pbr.slang:380-521). ``num_bounces`` >= 2 unrolls the reference's
  recursive closest-hit bounce (cvar r.GI.RT.Bounces) as a wavefront loop with
  diffuse-albedo throughput.

All sampling uses the spatio-temporal blue-noise stack frame-indexed like the
reference's STBN textures (scene_renderer.cpp:81-83; shaders index pixel % 128) —
blue noise converges visibly better than white under TAA. ``row_offset`` keeps
band-sharded rendering bit-identical to the full frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from androidrenderer_tpu.ops import noise
from androidrenderer_tpu.ops import sky as sky_ops
from androidrenderer_tpu.ops.rt.traverse import DeviceBVH, occlusion, trace_rays

RAY_EPS = 0.01  # TMin (rtao.comp.slang)


def _flat(x):
    return x.reshape(-1, x.shape[-1]) if x.ndim == 3 else x.reshape(-1)


def rt_sun_shadows(
    bvh: DeviceBVH,
    world_position: jnp.ndarray,  # (H, W, 3)
    normal: jnp.ndarray,  # (H, W, 3)
    valid: jnp.ndarray,  # (H, W)
    sun_direction: jnp.ndarray,  # (3,)
    sun_tan_size,  # tan of angular radius
    frame_index,
    row_offset=0,
) -> jnp.ndarray:
    """(H, W, 1) shadow factor: 0 occluded, 1 lit."""
    h, w, _ = world_position.shape
    to_sun = -sun_direction / jnp.linalg.norm(sun_direction)
    u = noise.stbn_uniforms(h, w, frame_index, 2, row_offset=row_offset)
    d = noise.disc_jitter(
        jnp.broadcast_to(to_sun, (h, w, 3)), sun_tan_size, u[..., 0], u[..., 1]
    )
    o = world_position + normal * 0.02
    occ = occlusion(bvh, _flat(o), _flat(d), RAY_EPS, 1e30)
    occ = occ.reshape(h, w) & valid
    return jnp.where(occ, 0.0, 1.0)[..., None]


def rtao(
    bvh: DeviceBVH,
    world_position: jnp.ndarray,
    normal: jnp.ndarray,
    valid: jnp.ndarray,
    num_samples: int,
    max_distance,
    frame_index,
    row_offset=0,
) -> jnp.ndarray:
    """(H, W, 1) ambient visibility in [0, 1] (rtao.comp.slang)."""
    h, w, _ = world_position.shape
    o = _flat(world_position + normal * 0.02)
    vis = jnp.zeros((h * w,), jnp.float32)
    for s in range(num_samples):
        u = noise.stbn_uniforms(
            h, w, frame_index * num_samples + s, 2, row_offset=row_offset
        )
        d = noise.cosine_hemisphere(normal, u[..., 0], u[..., 1])
        occ = occlusion(bvh, o, _flat(d), RAY_EPS, max_distance)
        vis = vis + jnp.where(occ, 0.0, 1.0)
    ao = (vis / num_samples).reshape(h, w)
    return jnp.where(valid, ao, 1.0)[..., None]


def rtgi(
    bvh: DeviceBVH,
    scene,  # SceneArrays
    world_position: jnp.ndarray,
    normal: jnp.ndarray,
    valid: jnp.ndarray,
    inverse_view: jnp.ndarray,
    p00,
    p11,
    frame_index,
    exposure,  # rtgi exposure fudge (0.0031415927)
    sun_exposure,
    num_bounces: int = 1,
    row_offset=0,
) -> jnp.ndarray:
    """(H, W, 3) diffuse GI irradiance (x albedo happens in lighting).

    The wavefront loop: each bounce traces the live rays, adds sun+emission at
    front-face hits (weighted by the path throughput), terminates rays on miss
    (adding sky) or backface, and continues with a cosine-sampled ray and
    albedo-scaled throughput — the reference's recursive closest-hit unrolled
    (gltf_basic_pbr.slang:380-521)."""
    h, w, _ = world_position.shape
    to_sun = -scene.sun_direction / jnp.linalg.norm(scene.sun_direction)

    u = noise.stbn_uniforms(h, w, frame_index, 2, row_offset=row_offset)
    d = _flat(noise.cosine_hemisphere(normal, u[..., 0], u[..., 1]))
    o = _flat(world_position + normal * 0.02)

    n_rays = h * w
    radiance = jnp.zeros((n_rays, 3), jnp.float32)
    throughput = jnp.ones((n_rays, 3), jnp.float32)
    alive = valid.reshape(-1)

    for b in range(num_bounces):
        hits = trace_rays(bvh, o, d, RAY_EPS, 1e30)
        hit = (hits.slot >= 0) & alive
        slot = jnp.maximum(hits.slot, 0)

        # Hit-point attributes via the BVH slot -> triangle mapping.
        tri = jnp.maximum(bvh.slot_tri[slot], 0)
        tri_idx = scene.tri_indices[tri]  # (R, 3)
        n0 = scene.normals[tri_idx[:, 0]]
        n1 = scene.normals[tri_idx[:, 1]]
        n2 = scene.normals[tri_idx[:, 2]]
        uu = hits.u[:, None]
        vv = hits.v[:, None]
        hn = n0 * (1 - uu - vv) + n1 * uu + n2 * vv
        hn = hn / jnp.maximum(jnp.linalg.norm(hn, axis=-1, keepdims=True), 1e-9)
        albedo = scene.mat_base_color[scene.tri_material[tri]][:, :3]
        emission = scene.mat_emission[scene.tri_material[tri]]
        hp = o + d * hits.t[:, None]

        # Backface hits (normal facing away from the ray origin) go black
        # (gltf_basic_pbr closest-hit).
        front = jnp.sum(hn * -d, axis=-1) > 0.0

        # Direct sun at the hit (diffuse only) with a shadow ray.
        ndotl = jnp.clip(jnp.sum(hn * to_sun, axis=-1), 0.0, 1.0)
        sh_occ = occlusion(
            bvh, hp + hn * 0.02, jnp.broadcast_to(to_sun, hp.shape), RAY_EPS, 1e30
        )
        sun_li = (
            albedo / jnp.pi
            * scene.sun_color[None, :]
            * (ndotl * jnp.where(sh_occ, 0.0, 1.0))[:, None]
            * sun_exposure
        )
        emit = jnp.where((hit & front)[:, None], sun_li + emission * sun_exposure, 0.0)
        radiance = radiance + throughput * emit

        # Sky on miss — analytic march (cheaper than LUT gathers at 2M rays; see
        # ops/sky.py TPU cost note).
        sky_l = sky_ops.sky_radiance(d, scene.sun_direction) * scene.sun_color[
            None, :
        ] * sun_exposure * 0.05
        radiance = radiance + jnp.where(
            (alive & ~hit)[:, None], throughput * sky_l, 0.0
        )

        alive = hit & front
        if b + 1 < num_bounces:
            throughput = throughput * albedo
            ub = noise.stbn_uniforms(
                h, w, frame_index + (b + 1) * 7919, 2, row_offset=row_offset
            )
            d = _flat(
                noise.cosine_hemisphere(
                    hn.reshape(h, w, 3), ub[..., 0], ub[..., 1]
                )
            )
            o = hp + hn * 0.02

    gi = radiance.reshape(h, w, 3) * (exposure / jnp.float32(0.00031415927))
    return jnp.where(valid[..., None], gi, 0.0)
