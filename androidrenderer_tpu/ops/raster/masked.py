"""Alpha-masked rasterization via depth peeling.

The reference compiles *_masked PSO variants whose fragment shaders sample base-color
alpha and discard below the cutoff (material_pipelines.cpp:14-175,
gltf_basic_pbr.slang alpha test). A visibility-buffer rasterizer decides coverage
before shading, so alpha testing becomes iterative depth peeling: rasterize the
masked subset, evaluate alpha at the winning fragments, and re-rasterize with a
per-pixel z upper bound to peel failed layers until every pixel has either an
alpha-passing fragment or none. 3 layers cover typical foliage.

The masked set is usually small, so this uses the XLA raster; results merge with the
opaque buffers by plain depth compare (max).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from androidrenderer_tpu.ops import texture as tex
from androidrenderer_tpu.ops.raster.binning import bin_triangles
from androidrenderer_tpu.ops.raster.interpolate import compute_barycentrics
from androidrenderer_tpu.ops.raster.raster_xla import (
    rasterize_depth,
    rasterize_visibility,
)
from androidrenderer_tpu.ops.raster.setup import TriangleSetup
from androidrenderer_tpu.scene.scene import SceneArrays


def _triangle_lod_uv(scene: SceneArrays, setup: TriangleSetup) -> jnp.ndarray:
    """(N,) size-free LOD per triangle, evaluated at the bbox center.

    The reference samples alpha with hardware derivatives; a per-TRIANGLE
    footprint (constant-per-triangle LOD) matches it to within one level at
    typical foliage scales and costs only (N,)-wide math — no per-pixel
    derivative gathers."""
    idx = scene.tri_indices
    uvs = scene.uvs
    e = setup.edge  # (N, 3, 3)
    # uv interpolation plane: f_k(p) = sum_i edge_i * uv_i[k], affine in pixels.
    f = (
        e[:, 0, :, None] * uvs[idx[:, 0]][:, None, :]
        + e[:, 1, :, None] * uvs[idx[:, 1]][:, None, :]
        + e[:, 2, :, None] * uvs[idx[:, 2]][:, None, :]
    )  # (N, 3=coeff, 2=uv)
    q = setup.q  # (N, 3)
    cx = 0.5 * (setup.bbox[:, 0] + setup.bbox[:, 2])
    cy = 0.5 * (setup.bbox[:, 1] + setup.bbox[:, 3])
    fv = f[:, 0] * cx[:, None] + f[:, 1] * cy[:, None] + f[:, 2]  # (N, 2)
    qv = q[:, 0] * cx + q[:, 1] * cy + q[:, 2]
    inv_q = 1.0 / jnp.where(qv == 0.0, 1.0, qv)
    uv_c = fv * inv_q[:, None]
    duvdx = (f[:, 0] - uv_c * q[:, 0:1]) * inv_q[:, None]
    duvdy = (f[:, 1] - uv_c * q[:, 1:2]) * inv_q[:, None]
    return tex.compute_lod_uv(duvdx, duvdy)


def pack_alpha_planes(scene: SceneArrays, setup: TriangleSetup) -> jnp.ndarray:
    """(N, 13) per-triangle rows for single-gather alpha evaluation:
    uv-plane coefficients (6) + s-plane (3) + packed texture meta (1) +
    triangle LOD (1) + alpha factor (1) + cutoff (1). The round-3 bench showed
    the barycentric path's per-layer gathers dominating the peel loop (several
    2M-row gathers per layer at ~27-45 ms each); this packs everything into
    ONE row gather + one texture gather per layer."""
    from androidrenderer_tpu.scene.material_storage import START_ALIGN

    idx = scene.tri_indices
    uvs = scene.uvs
    e = setup.edge  # (N, 3, 3)
    f = (
        e[:, 0, :, None] * uvs[idx[:, 0]][:, None, :]
        + e[:, 1, :, None] * uvs[idx[:, 1]][:, None, :]
        + e[:, 2, :, None] * uvs[idx[:, 2]][:, None, :]
    )  # (N, 3, 2)
    s_plane = jnp.sum(e, axis=1)  # (N, 3)
    mat = scene.tri_material
    tex_id = scene.mat_texture_ids[mat][:, 0]
    meta = (scene.tex_start[tex_id] // START_ALIGN) * 16 + scene.tex_log2b[tex_id]
    lod_tri = _triangle_lod_uv(scene, setup)
    n = idx.shape[0]
    return jnp.concatenate(
        [
            f[:, :, 0], f[:, :, 1], s_plane,
            meta.astype(jnp.float32)[:, None],
            lod_tri[:, None],
            scene.mat_base_color[mat][:, 3:4],
            scene.mat_alpha[mat][:, 1:2],
        ],
        axis=1,
    ).astype(jnp.float32)


def _sample_alpha(
    scene: SceneArrays, setup: TriangleSetup, vis, row_offset=0,
    alpha_planes: jnp.ndarray | None = None,
):
    """Base-color alpha x factor at the winning fragments (computed LOD).

    Pass ``alpha_planes`` (pack_alpha_planes, reused across peel layers) to
    evaluate with ONE row gather + one texture gather."""
    from androidrenderer_tpu.scene.material_storage import START_ALIGN

    if alpha_planes is None:
        alpha_planes = pack_alpha_planes(scene, setup)
    tid = jnp.maximum(vis, 0)
    row = alpha_planes[tid]  # (..., 13) — the one gather
    h, w = vis.shape
    px = jnp.arange(w, dtype=jnp.float32)[None, :]
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + row_offset
    fu = row[..., 0] * px + row[..., 1] * py + row[..., 2]
    fv = row[..., 3] * px + row[..., 4] * py + row[..., 5]
    sv = row[..., 6] * px + row[..., 7] * py + row[..., 8]
    inv_s = 1.0 / jnp.where(sv == 0.0, 1.0, sv)
    uv = jnp.stack([fu * inv_s, fv * inv_s], axis=-1)
    meta = jnp.round(row[..., 9]).astype(jnp.int32)
    log2b = meta & 15
    start = jnp.right_shift(meta, 4) * START_ALIGN
    lod = jnp.clip(
        jnp.round(row[..., 10] + log2b.astype(jnp.float32)), 0, log2b
    ).astype(jnp.int32)
    s = tex.sample_bilinear(scene.textures, start, log2b, uv, lod)
    alpha = s[..., 3] * row[..., 11]
    cutoff = row[..., 12]
    return alpha, cutoff


def rasterize_masked_peeled(
    scene: SceneArrays,
    setup_masked: TriangleSetup,  # setup with valid &= masked
    base_depth: jnp.ndarray,  # (H, W) opaque depth
    base_vis: jnp.ndarray,  # (H, W) opaque visibility
    tile_h: int,
    tile_w: int,
    cap: int,
    layers: int = 3,
    row_offset=0,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(depth, vis) merged opaque + alpha-tested masked geometry.

    ``use_pallas`` peels with the window-binned Pallas kernel (z_limit inputs)
    — the XLA reduction raster at 1080p costs seconds per layer at Sponza-class
    masked loads (round-3 bench: 4.4 s/frame with 43k masked triangles)."""
    height, width = base_depth.shape
    if use_pallas:
        from androidrenderer_tpu.ops.raster.raster_binned import (
            auto_slabs_binned, rasterize_binned,
        )
    else:
        tiles_y, tiles_x = height // tile_h, width // tile_w
        bins = bin_triangles(
            setup_masked, tiles_y, tiles_x, tile_h, tile_w, cap,
            tile_row_offset=row_offset // tile_h,
        )

    aplanes = pack_alpha_planes(scene, setup_masked)
    z_limit = jnp.full((height, width), jnp.inf, jnp.float32)
    out_depth = jnp.zeros_like(base_depth)
    out_vis = jnp.full_like(base_vis, -1)
    settled = jnp.zeros((height, width), bool)

    for layer in range(layers):
        if use_pallas:
            d, v = rasterize_binned(
                setup_masked, height, width, win_h=32, cap=14, kb=8, unroll=2,
                num_slabs=auto_slabs_binned(
                    height, width, win_h=32, with_z_limit=layer > 0
                ),
                interpret=pallas_interpret,
                z_limit=None if layer == 0 else z_limit,
            )
        else:
            d = rasterize_depth(
                setup_masked, bins, height, width, tile_h, tile_w,
                row_offset=row_offset, z_limit=z_limit,
            )
            v = rasterize_visibility(
                setup_masked, bins, d, tile_h, tile_w, row_offset=row_offset,
                z_limit=z_limit,
            )
        covered = v >= 0
        alpha, cutoff = _sample_alpha(
            scene, setup_masked, v, row_offset, alpha_planes=aplanes
        )
        passes = covered & (alpha >= cutoff)
        take = passes & ~settled
        out_depth = jnp.where(take, d, out_depth)
        out_vis = jnp.where(take, v, out_vis)
        settled = settled | passes | ~covered
        z_limit = jnp.where(covered & ~passes, d, z_limit)

    # Merge with opaque: masked fragment wins where nearer (reversed-Z max).
    masked_wins = (out_vis >= 0) & (out_depth > base_depth)
    depth = jnp.where(masked_wins, out_depth, base_depth)
    vis = jnp.where(masked_wins, out_vis, base_vis)
    return depth, vis
