"""GBuffer resolve — visibility buffer -> shaded surface attributes.

The TPU analog of GbufferPhase + the gltf_basic_pbr uber-shader's gbuffer fragment
stage (phase/gbuffer_phase.cpp:27-98, materials/gltf_basic_pbr.slang:53-253): bindless
texture fetches with TBN normal mapping, vertex-color modulation, and the reference's
channel conventions (data.g = roughness, data.b = metalness;
base color/emission stored sRGB — here kept linear f32, conversion folded into
sampling). Runs deferred behind the visibility buffer, so each pixel shades exactly
once — the depth-EQUAL trick taken to its conclusion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from androidrenderer_tpu.ops import texture as tex
from androidrenderer_tpu.ops.post import srgb_to_linear
from androidrenderer_tpu.ops.raster.setup import TriangleSetup
from androidrenderer_tpu.scene.material_storage import START_ALIGN
from androidrenderer_tpu.scene.scene import SceneArrays


class GBuffer(NamedTuple):
    """Deferred surface attributes (all (H, W, C) f32). Matches the reference's four
    MRTs + depth (scene_renderer.cpp:580-649)."""

    base_color: jnp.ndarray  # (H, W, 3) linear
    normal: jnp.ndarray  # (H, W, 3) world, unit
    roughness: jnp.ndarray  # (H, W, 1)
    metalness: jnp.ndarray  # (H, W, 1)
    emission: jnp.ndarray  # (H, W, 3) linear
    world_position: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W) reversed-Z ndc
    valid: jnp.ndarray  # (H, W) bool


def _normalize(v, eps=1e-12):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps))


def _interp(attr, bary):
    """Barycentric attribute interpolation as broadcast mul-sum.

    NOTE: never einsum here — XLA lowers the (hwvk,hwv->hwk) contraction to a batched
    dot_general with catastrophic layouts on TPU (measured 333 ms vs 0.1 ms for this
    formulation at 2M px)."""
    return jnp.sum(attr[bary.vertex_ids] * bary.lam[..., None], axis=-2)


ATTR_CHANNELS = 16  # uv(2) normal(3) tangent(4) color(3) position(3) pad(1)
# Per-triangle CONSTANT channels appended after the interpolated ones + the s-plane:
# base_factor(3) metal(1) rough(1) emission(3) packed_texture_meta(4). Constants
# ride in the C coefficient with A = B = 0 so the same per-pixel evaluation
# yields value * s, divided back out by 1/s — i.e. they fall out of the
# interpolation for free. Texture metadata packs (start/START_ALIGN) * 16 +
# log2(base size) into ONE float per slot (exact in f32 up to pools of ~16 GB;
# 1-ULP round-trip error << 0.5 so round() recovers it). Round-3 microbench
# (tools/microbench_gather.py): gather width is ~free up to >= 87 f32; what the
# round-2 "width cliff" actually measured was the (N, 3, C) slice-gather layout
# (206 ms vs 26 ms flat at 2M px) — the table is stored FLAT (N, 3C) now.
CONST_CHANNELS = 12


def pack_attribute_planes(scene: SceneArrays, setup: TriangleSetup) -> jnp.ndarray:
    """(N, 3, A+1+K) per-triangle interpolation planes + constants.

    Any vertex attribute a interpolates as a(p) = (fa*x + fb*y + fc) / s(p) with
    (fa, fb, fc) = sum_i edge_i * a_i (setup.py math). Precomputing these planes
    turns the resolve's many per-pixel VERTEX gathers (3 per attribute — the dominant
    cost: a 2M-row gather is ~45 ms on TPU regardless of width) into ONE wide
    per-triangle gather. Channel A is the s-plane; per-triangle material constants
    follow so material parameter lookups need no separate gathers either.
    """
    # Per-triangle attribute corners and material constants are BAKED at scene
    # build (SceneArrays.tri_attr_corners / tri_consts, refreshed on dynamic
    # updates): the 3 vertex-attr gathers + 5 material gathers this pack used
    # to issue cost ~6 ms/frame at 310k tris; now it is pure FMAs. Values and
    # summation order are identical to the gather formulation (bit-exact).
    #
    # Built DIRECTLY in the flat (N, 3C) row layout the resolve gathers — one
    # (N, C) block per plane coefficient, concatenated along the row axis. A
    # (N, 3, C) intermediate + reshape forced a ~108 MB layout-change copy
    # (the parity trace's single largest "data formatting" op, ~1.2 ms/frame);
    # row-major concat of row-major blocks fuses into the producing FMAs. The
    # flat layout itself is load-bearing: a (N, 3, C) slice gather measures
    # 206 ms vs 26 ms for the identical flat row gather at 2M px
    # (tools/microbench_gather.py).
    t = scene.tri_attr_corners  # (N, 3, A)
    blocks = []
    for c in range(3):
        attrs_c = (
            setup.edge[:, 0, c, None] * t[:, 0]
            + setup.edge[:, 1, c, None] * t[:, 1]
            + setup.edge[:, 2, c, None] * t[:, 2]
        )  # (N, A)
        s_c = (
            setup.edge[:, 0, c] + setup.edge[:, 1, c] + setup.edge[:, 2, c]
        )  # (N,)
        # Multiply by the s-plane so the per-pixel divide by s(p) cancels
        # exactly (constant channels recover bit-exactly).
        const_c = scene.tri_consts * s_c[:, None]  # (N, K)
        blocks += [attrs_c, s_c[:, None], const_c]
    return jnp.concatenate(blocks, axis=1)  # (N, 3 * (A + 1 + K))


def resolve_gbuffer(
    scene: SceneArrays,
    setup: TriangleSetup,
    vis: jnp.ndarray,  # (H, W) int32
    depth: jnp.ndarray,  # (H, W) f32
    mip_bias: jnp.ndarray | float = 0.0,
    row_offset: jnp.ndarray | int = 0,
    attr_planes: jnp.ndarray | None = None,  # pack_attribute_planes result (reused)
    use_base_textures: bool = True,
    use_normal_maps: bool = True,
    use_mr_textures: bool = True,
    use_emission: bool = True,
    pixel_coords=None,  # optional ((...,) px f32, (...,) py f32) matching vis shape
    debug_gather_only: bool = False,
) -> GBuffer:
    """Shade the visibility buffer. ``vis`` may be any shape; by default pixel
    coordinates come from the (H, W) grid + row_offset, or pass ``pixel_coords``
    for scattered/strided shading (VRSAA fine samples, coarse quad grids)."""
    valid = vis >= 0
    tid = jnp.maximum(vis, 0)

    if attr_planes is None:
        attr_planes = pack_attribute_planes(scene, setup)
    # The one big gather: FLAT (N, 3C) rows (a (N, 3, C) slice gather is 8x
    # slower — see pack_attribute_planes). The three plane-coefficient groups
    # are SLICED out of the flat row rather than reshaped to (..., 3, C):
    # the 4-d reshape forced a layout-changing transpose copy on TPU
    # (f32[N,87]{1,0} -> [H,W,3,C]{1,0,3,2}, measured 4.3 ms/frame in the
    # parity trace); minor-dim slices are free inside the consumer fusions.
    pl = attr_planes[tid]
    nch = pl.shape[-1] // 3
    pa = pl[..., :nch]
    pb = pl[..., nch : 2 * nch]
    pc = pl[..., 2 * nch :]
    if debug_gather_only:
        # Profiling stub: one cheap pass consuming every gathered channel (the
        # gather survives; the multi-head plane evaluation below is skipped).
        g = pa + pb + pc
        one = jnp.ones(g.shape[:-1] + (1,), jnp.float32)
        return GBuffer(
            base_color=jnp.abs(g[..., 0:3]),
            normal=_normalize(g[..., 2:5] + 0.1),
            roughness=0.5 * one + 0.0 * g[..., 5:6],
            metalness=0.1 * one + 0.0 * g[..., 6:7],
            emission=0.0 * g[..., 7:10],
            world_position=g[..., 10:13],
            depth=depth,
            valid=valid,
        )
    if pixel_coords is None:
        height, width = vis.shape
        px = jnp.arange(width, dtype=jnp.float32)[None, :, None]
        py = (jnp.arange(height, dtype=jnp.float32) + row_offset)[:, None, None]
    else:
        px = pixel_coords[0].astype(jnp.float32)[..., None]
        py = pixel_coords[1].astype(jnp.float32)[..., None]
    f = pa * px + pb * py + pc  # (..., A+1+K)
    s = f[..., ATTR_CHANNELS : ATTR_CHANNELS + 1]
    inv_s = 1.0 / jnp.where(s == 0.0, 1.0, s)
    a = f * inv_s  # interpolated attributes; constant channels recover exactly
    uv = a[..., 0:2]
    geo_n = _normalize(a[..., 2:5])
    tan4 = a[..., 5:9]
    vcolor = a[..., 9:12]
    world_pos = a[..., 12:15]
    c0 = ATTR_CHANNELS + 1
    base_factor = a[..., c0 : c0 + 3]
    metal_f = a[..., c0 + 3 : c0 + 4]
    rough_f = a[..., c0 + 4 : c0 + 5]
    emission_f = a[..., c0 + 5 : c0 + 8]
    packed_tv = jnp.round(a[..., c0 + 8 : c0 + 12]).astype(jnp.int32)
    tex_log2b = packed_tv & 15
    tex_start = jnp.right_shift(packed_tv, 4) * START_ALIGN
    # Analytic UV derivatives from the planes: da/dx = (fa*s - f*sa) / s^2.
    sa = pa[..., ATTR_CHANNELS : ATTR_CHANNELS + 1]
    sb = pb[..., ATTR_CHANNELS : ATTR_CHANNELS + 1]
    duvdx = (pa[..., 0:2] - uv * sa) * inv_s
    duvdy = (pb[..., 0:2] - uv * sb) * inv_s

    # Size-free LOD + per-slot base size (textures have native resolutions).
    lod_uv = tex.compute_lod_uv(duvdx, duvdy, mip_bias)

    def slot(k):
        return tex_start[..., k], tex_log2b[..., k], (
            lod_uv + tex_log2b[..., k].astype(jnp.float32)
        )

    # ONE material gather: the triple pool row carries base (trilinear-fused)
    # + normal + metal-rough at the shared level — collapsing what was 3
    # screen-sized gathers (~15-27 ms each) into 1 (sample_material_fused).
    if use_base_textures or use_normal_maps or use_mr_textures:
        s0, b0, lod0 = slot(0)
        base_s, nrm_s, mr_s = tex.sample_material_fused(
            scene.textures, s0, b0, uv, lod0
        )
    if use_base_textures:
        base_rgb = srgb_to_linear(base_s[..., :3])
    else:
        base_rgb = 1.0
    base_color = base_rgb * base_factor * vcolor

    # Normal mapping (gltf_basic_pbr.slang TBN path) — compiled out for scenes
    # without normal maps, like the reference's shader variants.
    if use_normal_maps:
        n_ts = nrm_s * 2.0 - 1.0
        t = tan4[..., :3]
        t_len2 = jnp.sum(t * t, axis=-1, keepdims=True)
        has_tangent = t_len2 > 1e-8
        t = jnp.where(has_tangent, t / jnp.sqrt(jnp.maximum(t_len2, 1e-12)), 0.0)
        b = jnp.cross(geo_n, t) * tan4[..., 3:4]
        mapped_n = _normalize(
            t * n_ts[..., 0:1] + b * n_ts[..., 1:2] + geo_n * n_ts[..., 2:3]
        )
        normal = jnp.where(has_tangent, mapped_n, geo_n)
    else:
        normal = geo_n

    # Metal/rough: glTF metallicRoughness texture (G = roughness, B = metalness) —
    # the same channels the reference's gbuffer data target carries; the triple
    # row stores them as [G, B].
    if use_mr_textures:
        roughness = (mr_s[..., 0:1]) * rough_f
        metalness = (mr_s[..., 1:2]) * metal_f
    else:
        roughness = rough_f
        metalness = metal_f

    if use_emission:
        s3, b3, lod3 = slot(3)
        # Emission entries are (emission, flat, white) triples — their base
        # channels carry the emission image, sampled trilinear like every
        # material slot (the reference's default sampler, gltf_model.cpp:497).
        em_s = tex.sample_trilinear_fused(scene.textures, s3, b3, uv, lod3)
        emission = srgb_to_linear(em_s[..., :3]) * emission_f
    else:
        emission = jnp.zeros_like(base_color)

    mask = valid[..., None]
    zero = jnp.zeros_like(base_color)
    return GBuffer(
        base_color=jnp.where(mask, base_color, 0.0),
        normal=jnp.where(mask, normal, 0.0),
        roughness=jnp.where(mask[..., :1], jnp.clip(roughness, 0.045, 1.0), 1.0),
        metalness=jnp.where(mask[..., :1], jnp.clip(metalness, 0.0, 1.0), 0.0),
        emission=jnp.where(mask, emission, zero),
        world_position=jnp.where(mask, world_pos, 0.0),
        depth=depth,
        valid=valid,
    )
