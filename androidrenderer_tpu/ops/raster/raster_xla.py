"""Depth + visibility rasterization as tiled XLA reductions.

Reversed-Z + GREATER depth test (pipeline_builder.hpp:44-49, cleared to 0.0 per
depth_culling_phase.cpp:465-469) makes the depth pass a plain ``max`` reduction over
covering triangles — commutative, so triangles need no ordering and map directly onto
vector lanes. The visibility pass re-evaluates coverage and keeps the largest triangle
id whose depth reaches the depth buffer — the analog of the reference's depth-EQUAL
gbuffer pass (material_pipelines.cpp:105-111) producing a visibility buffer instead of
MRT attachments.

Both passes share one tile kernel: vmap over screen tiles, ``lax.scan`` over chunks of
the tile's binned triangle list, evaluating the three affine edge functions on the
tile's pixel grid. On TPU the (3 x pixels) evaluation vectorizes on the VPU; chunking
bounds live memory to (chunk, 3, tile_h, tile_w).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops.raster.binning import TileBins
from androidrenderer_tpu.ops.raster.setup import TriangleSetup


def _eval_chunk(
    edge: jnp.ndarray,  # (C, 3, 3)
    q: jnp.ndarray,  # (C, 3)
    r: jnp.ndarray,  # (C, 3)
    double_sided: jnp.ndarray,  # (C,) bool
    live: jnp.ndarray,  # (C,) bool — padding lanes off
    px: jnp.ndarray,  # (tw,) f32 pixel x centers
    py: jnp.ndarray,  # (th,) f32 pixel y centers
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coverage (C, th, tw) bool and ndc depth (C, th, tw) f32 for a triangle chunk."""
    x = px[None, None, None, :]
    y = py[None, None, :, None]
    # D[c, e, y, x] = A*px + B*py + C
    d = edge[:, :, 0, None, None] * x + edge[:, :, 1, None, None] * y + edge[:, :, 2, None, None]
    # Front face = glTF CCW winding with right-hand-rule normals. In our y-down pixel
    # space that orientation makes all edge values NEGATIVE (the viewport y-flip
    # mirrors the winding), hence the <= for front coverage.
    cov_front = jnp.all(d <= 0.0, axis=1)
    cov_back = jnp.all(d >= 0.0, axis=1)
    cov = cov_front | (cov_back & double_sided[:, None, None])

    x2 = px[None, None, :]
    y2 = py[None, :, None]
    qv = q[:, 0, None, None] * x2 + q[:, 1, None, None] * y2 + q[:, 2, None, None]
    rv = r[:, 0, None, None] * x2 + r[:, 1, None, None] * y2 + r[:, 2, None, None]
    z = rv / jnp.where(qv == 0.0, 1.0, qv)
    # Depth-range rejection replaces near clipping: visible iff 0 < z <= 1.
    cov = cov & (z > 0.0) & (z <= 1.0) & (qv != 0.0) & live[:, None, None]
    return cov, z


def _tile_pixel_centers(
    tile_index: jnp.ndarray, tiles_x: int, tile_h: int, tile_w: int, row_offset
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    ty = tile_index // tiles_x
    tx = tile_index % tiles_x
    px = (tx * tile_w + jnp.arange(tile_w)).astype(jnp.float32)
    py = (ty * tile_h + jnp.arange(tile_h) + row_offset).astype(jnp.float32)
    return px, py


def _gather_chunk(setup: TriangleSetup, ids: jnp.ndarray):
    safe = jnp.maximum(ids, 0)
    live = ids >= 0
    return (
        setup.edge[safe],
        setup.q[safe],
        setup.r[safe],
        setup.double_sided[safe],
        live,
    )


def rasterize_depth(
    setup: TriangleSetup,
    bins: TileBins,
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    row_offset: jnp.ndarray | int = 0,
    z_limit: jnp.ndarray | None = None,  # (H, W): accept only z < z_limit (peeling)
) -> jnp.ndarray:
    """Depth buffer (H, W) f32, cleared to 0.0, max-reduced reversed-Z.

    ``height`` is the rendered band height; ``row_offset`` is the band's first pixel
    row in the full frame (0 for single-device rendering)."""
    tiles_y, tiles_x = height // tile_h, width // tile_w
    cap = bins.lists.shape[1]
    chunk = min(chunk, cap)
    num_chunks = -(-cap // chunk)
    pad = num_chunks * chunk - cap
    lists = jnp.pad(bins.lists, ((0, 0), (0, pad)), constant_values=-1)
    lists = lists.reshape(-1, num_chunks, chunk)
    if z_limit is None:
        zl_tiles = jnp.full((tiles_y * tiles_x, tile_h, tile_w), jnp.inf, jnp.float32)
    else:
        zl_tiles = (
            z_limit.reshape(tiles_y, tile_h, tiles_x, tile_w)
            .transpose(0, 2, 1, 3).reshape(-1, tile_h, tile_w)
        )

    def tile_fn(tile_index: jnp.ndarray, tile_lists: jnp.ndarray, zl) -> jnp.ndarray:
        px, py = _tile_pixel_centers(tile_index, tiles_x, tile_h, tile_w, row_offset)

        def body(acc, ids):
            edge, q, r, dbl, live = _gather_chunk(setup, ids)
            cov, z = _eval_chunk(edge, q, r, dbl, live, px, py)
            cov = cov & (z < zl[None])
            zc = jnp.max(jnp.where(cov, z, 0.0), axis=0)
            return jnp.maximum(acc, zc), None

        acc0 = jnp.zeros((tile_h, tile_w), dtype=jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, tile_lists)
        return acc

    tile_ids = jnp.arange(tiles_y * tiles_x, dtype=jnp.int32)
    tiles = jax.vmap(tile_fn)(tile_ids, lists, zl_tiles)  # (T, th, tw)
    return (
        tiles.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )


def rasterize_visibility(
    setup: TriangleSetup,
    bins: TileBins,
    depth: jnp.ndarray,  # (H, W) f32 from rasterize_depth
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    row_offset: jnp.ndarray | int = 0,
    z_limit: jnp.ndarray | None = None,  # (H, W): accept only z < z_limit (peeling)
) -> jnp.ndarray:
    """Visibility buffer (H, W) int32 triangle ids; -1 where nothing was drawn.

    A triangle wins a pixel iff it covers it and its depth >= the depth buffer value
    (i.e. it IS the max — the depth-EQUAL trick); ties resolve to the largest id.
    """
    height, width = depth.shape
    tiles_y, tiles_x = height // tile_h, width // tile_w
    cap = bins.lists.shape[1]
    chunk = min(chunk, cap)
    num_chunks = -(-cap // chunk)
    pad = num_chunks * chunk - cap
    lists = jnp.pad(bins.lists, ((0, 0), (0, pad)), constant_values=-1)
    lists = lists.reshape(-1, num_chunks, chunk)
    depth_tiles = (
        depth.reshape(tiles_y, tile_h, tiles_x, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(-1, tile_h, tile_w)
    )
    if z_limit is None:
        zl_tiles = jnp.full((tiles_y * tiles_x, tile_h, tile_w), jnp.inf, jnp.float32)
    else:
        zl_tiles = (
            z_limit.reshape(tiles_y, tile_h, tiles_x, tile_w)
            .transpose(0, 2, 1, 3).reshape(-1, tile_h, tile_w)
        )

    def tile_fn(
        tile_index: jnp.ndarray, tile_lists: jnp.ndarray, tile_depth: jnp.ndarray,
        zl: jnp.ndarray,
    ) -> jnp.ndarray:
        px, py = _tile_pixel_centers(tile_index, tiles_x, tile_h, tile_w, row_offset)

        def body(acc, ids):
            edge, q, r, dbl, live = _gather_chunk(setup, ids)
            cov, z = _eval_chunk(edge, q, r, dbl, live, px, py)
            hit = cov & (z >= tile_depth[None]) & (tile_depth[None] > 0.0)
            hit = hit & (z < zl[None])
            idc = jnp.max(jnp.where(hit, ids[:, None, None], -1), axis=0)
            return jnp.maximum(acc, idc), None

        acc0 = jnp.full((tile_h, tile_w), -1, dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, acc0, tile_lists)
        return acc

    tile_ids = jnp.arange(tiles_y * tiles_x, dtype=jnp.int32)
    tiles = jax.vmap(tile_fn)(tile_ids, lists, depth_tiles, zl_tiles)
    return (
        tiles.reshape(tiles_y, tiles_x, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(height, width)
    )
