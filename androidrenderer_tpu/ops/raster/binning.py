"""Tile binning — sort-middle triangle distribution, as pure XLA.

The reference leans on the mobile GPU's hardware tiler plus GPU-driven indirect draws
(visibility_list_to_draw_commands.comp.slang:30-50). Here binning is explicit: each
screen tile gets a fixed-capacity list of triangle ids whose pixel AABB overlaps the
tile. Fixed capacity + padding keeps every shape static for XLA; ``counts`` reports
real occupancy so overflow is observable (never silent).

The compaction is a masked cumsum + scatter-with-drop — deterministic slot assignment,
no atomics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from androidrenderer_tpu.ops.raster.setup import TriangleSetup


class TileBins(NamedTuple):
    lists: jnp.ndarray  # (num_tiles, cap) int32 triangle ids, -1 padded
    counts: jnp.ndarray  # (num_tiles,) int32 true overlap count (may exceed cap)


def bin_triangles(
    setup: TriangleSetup,
    tiles_y: int,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    cap: int,
    tile_row_offset: jnp.ndarray | int = 0,
) -> TileBins:
    """Bin into a (tiles_y x tiles_x) tile grid whose first tile row is
    ``tile_row_offset`` (nonzero when rendering a horizontal screen band under
    multi-chip screen sharding — parallel/mesh.py)."""
    n = setup.edge.shape[0]
    num_tiles = tiles_y * tiles_x

    # Triangle tile ranges from the pixel AABB.
    tx0 = jnp.floor(setup.bbox[:, 0] / tile_w).astype(jnp.int32)
    ty0 = jnp.floor(setup.bbox[:, 1] / tile_h).astype(jnp.int32)
    tx1 = jnp.floor(setup.bbox[:, 2] / tile_w).astype(jnp.int32)
    ty1 = jnp.floor(setup.bbox[:, 3] / tile_h).astype(jnp.int32)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_x = (tile_ids % tiles_x)[:, None]  # (num_tiles, 1)
    tile_y = (tile_ids // tiles_x)[:, None] + tile_row_offset

    mask = (
        (tile_x >= tx0[None, :])
        & (tile_x <= tx1[None, :])
        & (tile_y >= ty0[None, :])
        & (tile_y <= ty1[None, :])
        & setup.valid[None, :]
    )  # (num_tiles, n)

    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    pos = jnp.cumsum(mask, axis=1, dtype=jnp.int32) - 1
    # Out-of-capacity or unmasked slots are sent to index `cap`, dropped by the scatter.
    slot = jnp.where(mask & (pos < cap), pos, cap)
    rows = jnp.broadcast_to(tile_ids[:, None], (num_tiles, n))
    tri = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (num_tiles, n))
    lists = (
        jnp.full((num_tiles, cap), -1, dtype=jnp.int32)
        .at[rows.reshape(-1), slot.reshape(-1)]
        .set(tri.reshape(-1), mode="drop")
    )
    return TileBins(lists=lists, counts=counts)
