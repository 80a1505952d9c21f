"""Texture pool sampling — the TPU replacement for bindless sampled images.

The reference binds a bindless texture array and samples with HW trilinear filtering +
a global mip bias (texture_descriptor_pool.hpp:16-46, view_data.hpp
material_texture_mip_bias). Here the pool is ONE flat mip-packed texel array
(R, 117) u8 holding every MATERIAL TRIPLE (base + normal + metal-rough) at its
native power-of-two resolution (material_storage.pack_texture_pool): texel
(entry, level, y, x) lives at flat row
``start_t + (4*b^2 - 4*s^2)/3 + y*s + x`` (b = entry base size, s = b >> level).
Channels 0:16 carry the base 2x2 wrap-footprint's four RGBA texels (bilinear =
ONE gather), 16:52 the next level's 3x3 (single-gather trilinear), 52:64 /
onward the normal / metal-rough L+L+1 tap pairs — a whole material resolves
from one gather with no branching on level or size (sample_material_fused).

Per-sample metadata is (start, log2b) — integers small enough to ride the gbuffer's
attribute-plane constants (start is 1024-row aligned and carried /1024 so the f32
plane round-trip stays exact).

Mip selection is analytic from the visibility buffer: uv(p) = f(p)/s(p) with f, s
affine in pixel coords, so duv/dpixel is closed-form per pixel — equivalent to the
hardware's quad derivatives but exact. ``compute_lod_uv`` returns the size-free
part; add log2b per texture slot.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(
    pool: jnp.ndarray,  # (R, 16) u8 flat tap-packed texel pool
    start: jnp.ndarray,  # (...,) i32 per-sample texture start row
    log2b: jnp.ndarray,  # (...,) i32 per-sample log2(base size)
    uv: jnp.ndarray,  # (..., 2) f32, repeat-wrapped
    level: jnp.ndarray,  # (...,) i32 mip level (clamped per texture)
) -> jnp.ndarray:
    """Bilinear sample at an integer mip level — ONE gather. (..., 4) f32 [0,1]."""
    log2b = log2b.astype(jnp.int32)
    level = jnp.clip(level.astype(jnp.int32), 0, log2b)
    b = jnp.left_shift(jnp.int32(1), log2b)
    size = jnp.right_shift(b, level)
    sizef = size.astype(jnp.float32)
    # Mip offset within the texture: sum of coarser... finer levels above:
    # (4*b^2 - 4*s^2) / 3 (exact integer; divisor is a constant, not traced).
    mip_off = ((b * b - size * size) * 4) // 3

    # Repeat wrap, texel centers at (i + 0.5) / size.
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * sizef - 0.5
    y = v * sizef - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def wrap(i):
        # Repeat wrap via bitwise AND (size is always a power of two). Integer
        # modulo with a traced divisor lowers to a costly soft-division on TPU.
        return i.astype(jnp.int32) & (size - 1)

    x0i = wrap(x0)
    y0i = wrap(y0)

    # Single-axis flat gather — multi-index forms lower to a slow multi-index
    # gather on TPU (measured ~40x slower).
    taps = pool[start + mip_off + y0i * size + x0i].astype(jnp.float32) * (1.0 / 255.0)
    c00 = taps[..., 0:4]
    c01 = taps[..., 4:8]
    c10 = taps[..., 8:12]
    c11 = taps[..., 12:16]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def sample_trilinear(
    pool: jnp.ndarray,
    start: jnp.ndarray,
    log2b: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,  # (...,) f32 fractional level of detail
) -> jnp.ndarray:
    """Two-gather trilinear (reference path; see sample_trilinear_fused)."""
    lodc = jnp.clip(lod, 0.0, log2b.astype(jnp.float32))
    l0 = jnp.floor(lodc).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, log2b.astype(jnp.int32))
    f = (lodc - l0.astype(jnp.float32))[..., None]
    a = sample_bilinear(pool, start, log2b, uv, l0)
    b = sample_bilinear(pool, start, log2b, uv, l1)
    return a + (b - a) * f


def sample_trilinear_fused(
    pool: jnp.ndarray,  # (R, 52) u8 — rows carry level L 2x2 + level L+1 3x3
    start: jnp.ndarray,
    log2b: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,  # (...,) f32 fractional level of detail
) -> jnp.ndarray:
    """Trilinear filtering with ONE pool gather (..., 4).

    The gathered row's channels 16:52 hold the NEXT mip level's 3x3
    wrap-neighborhood centered at (y0 >> 1, x0 >> 1); the finer level's texel
    footprint maps into columns/rows {center-1, center} of that block, so the
    coarse bilinear resolves with channel selects instead of a second gather
    (a 2M-row gather is ~27-45 ms/frame). Bit-identical to sample_trilinear.
    """
    log2b = log2b.astype(jnp.int32)
    lodc = jnp.clip(lod, 0.0, log2b.astype(jnp.float32))
    level = jnp.floor(lodc).astype(jnp.int32)
    fl = (lodc - level.astype(jnp.float32))[..., None]
    b = jnp.left_shift(jnp.int32(1), log2b)
    size = jnp.right_shift(b, level)
    sizef = size.astype(jnp.float32)
    mip_off = ((b * b - size * size) * 4) // 3

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * sizef - 0.5
    y = v * sizef - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32) & (size - 1)
    y0i = y0.astype(jnp.int32) & (size - 1)

    taps = pool[start + mip_off + y0i * size + x0i].astype(jnp.float32) * (
        1.0 / 255.0
    )
    c00 = taps[..., 0:4]
    c01 = taps[..., 4:8]
    c10 = taps[..., 8:12]
    c11 = taps[..., 12:16]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    fine = top + (bot - top) * fy

    # Coarse level from the same row's 3x3 block (centered at x0i>>1, y0i>>1;
    # identical when level == log2b, where fl == 0).
    s1 = jnp.maximum(jnp.right_shift(size, 1), 1)
    s1f = s1.astype(jnp.float32)
    xc = u * s1f - 0.5
    yc = v * s1f - 0.5
    xc0 = jnp.floor(xc)
    yc0 = jnp.floor(yc)
    fxc = (xc - xc0)[..., None]
    fyc = (yc - yc0)[..., None]
    last = level >= log2b
    # Offset of the coarse footprint's base inside the 3x3 (0 or 1 per axis).
    kx = jnp.where(last, x0i, jnp.right_shift(x0i, 1))
    ky = jnp.where(last, y0i, jnp.right_shift(y0i, 1))
    sc = jnp.where(last, size, s1)
    xc0i = xc0.astype(jnp.int32) & (sc - 1)
    yc0i = yc0.astype(jnp.int32) & (sc - 1)
    ox = (xc0i - kx + 1) & (sc - 1)  # in {0, 1}
    oy = (yc0i - ky + 1) & (sc - 1)
    ox1 = (ox == 1)[..., None]
    oy1 = (oy == 1)[..., None]

    def cell(i, j):  # 3x3 block texel (row i, col j), i/j in 0..2
        o = 16 + (i * 3 + j) * 4
        return taps[..., o : o + 4]

    def pick(di, dj):  # coarse tap (oy+di, ox+dj)
        r0 = jnp.where(ox1, cell(0 + di, 1 + dj), cell(0 + di, 0 + dj))
        r1 = jnp.where(ox1, cell(1 + di, 1 + dj), cell(1 + di, 0 + dj))
        return jnp.where(oy1, r1, r0)

    d00 = pick(0, 0)
    d01 = pick(0, 1)
    d10 = pick(1, 0)
    d11 = pick(1, 1)
    ctop = d00 + (d01 - d00) * fxc
    cbot = d10 + (d11 - d10) * fxc
    coarse = ctop + (cbot - ctop) * fyc
    return fine + (coarse - fine) * fl


def sample_material_fused(
    pool: jnp.ndarray,  # (R, 117) u8 material-triple pool (material_storage)
    start: jnp.ndarray,
    log2b: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,  # (...,) f32 fractional level of detail
):
    """(base (..., 4), normal (..., 3), metal_rough (..., 2)) — ONE gather.

    Every slot resolves TRILINEAR (fused-trilinear scheme: L 2x2 + L+1 3x3
    pairs per slot; base 0:16/16:52, normal 52:64/64:91, MR 91:99/99:117) —
    the reference's default sampler is mip-LINEAR for all material slots
    (gltf_model.cpp:497-534). Integer-LOD normal/MR (the round-3 scheme) was
    a measured fidelity amplifier: floor(lod) flips at LOD boundaries swing
    GGX speculars through quantized normal x roughness. Collapses the gbuffer
    resolve's 3 texture gathers into 1 (each 2M-row gather is ~15-27
    ms/frame); rows widened 72 -> 117 u8 at zero gather cost (width-free,
    tools/microbench_gather2.py)."""
    log2b = log2b.astype(jnp.int32)
    lodc = jnp.clip(lod, 0.0, log2b.astype(jnp.float32))
    level = jnp.floor(lodc).astype(jnp.int32)
    fl = (lodc - level.astype(jnp.float32))[..., None]
    b = jnp.left_shift(jnp.int32(1), log2b)
    size = jnp.right_shift(b, level)
    sizef = size.astype(jnp.float32)
    mip_off = ((b * b - size * size) * 4) // 3

    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * sizef - 0.5
    y = v * sizef - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32) & (size - 1)
    y0i = y0.astype(jnp.int32) & (size - 1)

    taps = pool[start + mip_off + y0i * size + x0i].astype(jnp.float32) * (
        1.0 / 255.0
    )

    def bilerp(c00, c01, c10, c11):
        top = c00 + (c01 - c00) * fx
        bot = c10 + (c11 - c10) * fx
        return top + (bot - top) * fy

    fine = bilerp(
        taps[..., 0:4], taps[..., 4:8], taps[..., 8:12], taps[..., 12:16]
    )

    # Coarse base level from the row's 3x3 block (sample_trilinear_fused math).
    s1 = jnp.maximum(jnp.right_shift(size, 1), 1)
    s1f = s1.astype(jnp.float32)
    xc = u * s1f - 0.5
    yc = v * s1f - 0.5
    xc0 = jnp.floor(xc)
    yc0 = jnp.floor(yc)
    fxc = (xc - xc0)[..., None]
    fyc = (yc - yc0)[..., None]
    last = level >= log2b
    kx = jnp.where(last, x0i, jnp.right_shift(x0i, 1))
    ky = jnp.where(last, y0i, jnp.right_shift(y0i, 1))
    sc = jnp.where(last, size, s1)
    xc0i = xc0.astype(jnp.int32) & (sc - 1)
    yc0i = yc0.astype(jnp.int32) & (sc - 1)
    ox1 = (((xc0i - kx + 1) & (sc - 1)) == 1)[..., None]
    oy1 = (((yc0i - ky + 1) & (sc - 1)) == 1)[..., None]

    def coarse_bilerp(block_off, ch):
        """Coarse-level bilinear from a 3x3 block at ``block_off`` with ``ch``
        channels per tap (shared ox1/oy1/fxc/fyc select machinery)."""

        def cell(i, j):
            o = block_off + (i * 3 + j) * ch
            return taps[..., o : o + ch]

        def pick(di, dj):
            r0 = jnp.where(ox1, cell(0 + di, 1 + dj), cell(0 + di, 0 + dj))
            r1 = jnp.where(ox1, cell(1 + di, 1 + dj), cell(1 + di, 0 + dj))
            return jnp.where(oy1, r1, r0)

        ctop = pick(0, 0) + (pick(0, 1) - pick(0, 0)) * fxc
        cbot = pick(1, 0) + (pick(1, 1) - pick(1, 0)) * fxc
        return ctop + (cbot - ctop) * fyc

    base = fine + (coarse_bilerp(16, 4) - fine) * fl

    nrm_fine = bilerp(
        taps[..., 52:55], taps[..., 55:58], taps[..., 58:61], taps[..., 61:64]
    )
    nrm = nrm_fine + (coarse_bilerp(64, 3) - nrm_fine) * fl
    mr_fine = bilerp(
        taps[..., 91:93], taps[..., 93:95], taps[..., 95:97], taps[..., 97:99]
    )
    mr = mr_fine + (coarse_bilerp(99, 2) - mr_fine) * fl
    return base, nrm, mr


def sample_mr_bilinear(
    pool: jnp.ndarray,  # (R, 117) u8 material-triple pool
    start: jnp.ndarray,
    log2b: jnp.ndarray,
    uv: jnp.ndarray,
    level: jnp.ndarray,  # (...,) i32 mip level
) -> jnp.ndarray:
    """Metal-rough bilinear from the triple row's 91:99 channels — (..., 2)
    [G = roughness, B = metalness] (glTF metallicRoughness channel order).
    Integer-LOD (RT hit shading, where rays carry no derivatives — the
    reference's hit shaders sample level 0 likewise)."""
    log2b = log2b.astype(jnp.int32)
    level = jnp.clip(level.astype(jnp.int32), 0, log2b)
    b = jnp.left_shift(jnp.int32(1), log2b)
    size = jnp.right_shift(b, level)
    sizef = size.astype(jnp.float32)
    mip_off = ((b * b - size * size) * 4) // 3
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    x = u * sizef - 0.5
    y = v * sizef - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32) & (size - 1)
    y0i = y0.astype(jnp.int32) & (size - 1)
    taps = pool[start + mip_off + y0i * size + x0i].astype(jnp.float32) * (
        1.0 / 255.0
    )
    c00 = taps[..., 91:93]
    c01 = taps[..., 93:95]
    c10 = taps[..., 95:97]
    c11 = taps[..., 97:99]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def compute_lod_uv(
    duv_dx: jnp.ndarray,  # (..., 2) analytic UV derivative wrt pixel x
    duv_dy: jnp.ndarray,  # (..., 2)
    mip_bias: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Size-free LOD: log2 of the max screen-space footprint in UV units.

    Per-texture LOD = compute_lod_uv(...) + log2(base size) — the additive split
    lets mixed-resolution texture slots share one derivative computation."""
    fx = jnp.sum(duv_dx * duv_dx, axis=-1)
    fy = jnp.sum(duv_dy * duv_dy, axis=-1)
    rho2 = jnp.maximum(jnp.maximum(fx, fy), 1e-24)
    return 0.5 * jnp.log2(rho2) + mip_bias
