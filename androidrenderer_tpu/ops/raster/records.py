"""Shared raster record packing — VMEM-row triangle records.

``pack_lane_records`` packs each triangle's edge/q/r coefficients, sidedness,
id, and 16x16 alpha-bitmap words into one 32-lane f32 VMEM row. Production
consumer: the bitmask kernel's drain fold (raster_bitmask.py); the sublane-fold
design studies in tools/experiments/ share the same layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops.raster.setup import TriangleSetup

WIN_W = 128
LREC = 32  # f32 lanes per record row (VMEM)


def pack_lane_records(
    setup: TriangleSetup,
    affine_z: bool = False,
    alpha_grid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """((N, 32) f32 VMEM rows, (N,) bool live) — lane layout:

    0-8   edge coefficients (a0,b0,c0, a1,b1,c1, a2,b2,c2)
    9-11  q plane (perspective) or affine z plane (ortho: z = r/qc directly)
    12-14 r plane (perspective; zeros when affine)
    15    sid (+1 single-sided, -1 double-sided, 0 dead)
    16    global triangle id as f32 (exact below 2^24 — enforced by caller)
    17-24 16x16 barycentric alpha bitmap words, i32 bitcast to f32
    25-31 zero padding
    """
    n = setup.edge.shape[0]
    sid = jnp.where(setup.double_sided, -1.0, 1.0)
    sid = jnp.where(setup.valid, sid, 0.0)
    if affine_z:
        qc = setup.q[:, 2:3]
        zplane = setup.r / jnp.where(qc == 0.0, 1.0, qc)
        mid = [zplane, jnp.zeros((n, 3), jnp.float32)]
    else:
        mid = [setup.q, setup.r]
    ids = jnp.arange(n, dtype=jnp.float32)[:, None]
    if alpha_grid is not None:
        gw = jax.lax.bitcast_convert_type(
            alpha_grid.astype(jnp.int32), jnp.float32
        )
    else:
        gw = jnp.zeros((n, 8), jnp.float32)
    rows = jnp.concatenate(
        [
            setup.edge.reshape(n, 9),
            *mid,
            sid[:, None],
            ids,
            gw,
            jnp.zeros((n, LREC - 25), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    live = setup.valid & (sid != 0.0)
    return rows, live
