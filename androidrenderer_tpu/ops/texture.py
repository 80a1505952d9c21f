"""Texture array sampling — the TPU replacement for bindless sampled images.

The reference binds a bindless texture array and samples with HW trilinear filtering +
a global mip bias (texture_descriptor_pool.hpp:16-46, view_data.hpp
material_texture_mip_bias). Here the pool is a mip-packed flat array
(T, sum(s_l^2), 4) u8 (scene.py:_pack_mips_flat): a texel at (tex, level, y, x) lives at
flat index ``level_offset[level] + y * size_l + x``, so trilinear filtering is 8 gathers
with computed indices and no branching on level.

Mip selection is analytic from the visibility buffer: uv(p) = f(p)/s(p) with f, s
affine in pixel coords, so duv/dpixel is closed-form per pixel — equivalent to the
hardware's quad derivatives but exact.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(
    textures: jnp.ndarray,  # (T, F, 16) u8 tap-packed mip-flat pool (scene.py)
    level_offsets: jnp.ndarray,  # (L,) i32
    base_size: int,  # static: size of mip 0
    tex_ids: jnp.ndarray,  # (...,) i32
    uv: jnp.ndarray,  # (..., 2) f32, repeat-wrapped
    level: jnp.ndarray,  # (...,) i32 clamped mip level
) -> jnp.ndarray:
    """Bilinear sample at an integer mip level — ONE gather: the pool's 16 channels
    carry the 2x2 footprint's four RGBA texels (wrap-shifted copies per level).
    Returns (..., 4) f32 in [0, 1]."""
    num_levels = level_offsets.shape[0]
    level = jnp.clip(level, 0, num_levels - 1)
    # size_l = base_size >> level
    size = jnp.right_shift(jnp.int32(base_size), level.astype(jnp.int32))
    sizef = size.astype(jnp.float32)

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

    off = level_offsets[level]
    t, f, _ = textures.shape
    flat = textures.reshape(t * f, 16)
    tex_base = tex_ids.astype(jnp.int32) * f
    # Single-axis flat gather — the two-axis form textures[tex_ids, idx] lowers to a
    # slow multi-index gather on TPU (measured ~40x slower).
    taps = flat[tex_base + off + y0i * size + x0i].astype(jnp.float32) * (1.0 / 255.0)
    c00 = taps[..., 0:4]
    c01 = taps[..., 4:8]
    c10 = taps[..., 8:12]
    c11 = taps[..., 12:16]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def sample_trilinear(
    textures: jnp.ndarray,
    level_offsets: jnp.ndarray,
    base_size: int,
    tex_ids: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,  # (...,) f32 fractional level of detail
) -> jnp.ndarray:
    num_levels = level_offsets.shape[0]
    lod = jnp.clip(lod, 0.0, float(num_levels - 1))
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, num_levels - 1)
    f = (lod - l0.astype(jnp.float32))[..., None]
    a = sample_bilinear(textures, level_offsets, base_size, tex_ids, uv, l0)
    b = sample_bilinear(textures, level_offsets, base_size, tex_ids, uv, l1)
    return a + (b - a) * f


def compute_lod(
    duv_dx: jnp.ndarray,  # (..., 2) analytic UV derivative wrt pixel x
    duv_dy: jnp.ndarray,  # (..., 2)
    base_size: int,
    mip_bias: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Hardware-style LOD: log2 of the max screen-space texel footprint."""
    s = float(base_size)
    fx = jnp.sum((duv_dx * s) ** 2, axis=-1)
    fy = jnp.sum((duv_dy * s) ** 2, axis=-1)
    rho2 = jnp.maximum(jnp.maximum(fx, fy), 1e-12)
    return 0.5 * jnp.log2(rho2) + mip_bias
