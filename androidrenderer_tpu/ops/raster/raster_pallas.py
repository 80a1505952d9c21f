"""Fused depth + visibility rasterization as a Pallas TPU kernel.

Design (replaces the XLA tile reductions for the hot path):

- The framebuffer lives in VMEM, split into S horizontal slabs; each slab's
  (slab_h, W) depth (f32) and visibility (i32) blocks persist across the chunk grid
  dimension (constant index_map -> Mosaic revisiting keeps them on-chip).
- Triangles are pre-bucketed by slab (masked cumsum, like tile binning but only S
  buckets) and streamed as (chunk, 24)-float records into SMEM.
- The kernel loops triangles SEQUENTIALLY (scalar loop): reads the record as scalars,
  clips its pixel bbox to the slab, and updates the covered aligned (8, 128) windows
  with a read-modify-write z-test. Because execution is sequential there is no
  parallel-conflict hazard: depth AND triangle id resolve exactly in ONE pass (the
  two-pass depth-EQUAL dance the XLA path needs collapses).
- Cost is proportional to sum over triangles of covered (8, 128) windows — each
  window is exactly one f32 vreg, so a small triangle costs ~25 VPU ops.

Ties at equal depth go to the later-processed triangle; slab lists are built in
ascending triangle order, so ties resolve to the max id — matching raster_xla.

Record layout (f32 x 24, SMEM):
  [0:3]  e0 (A, B, C)      [3:6]  e1      [6:9] e2
  [9:12] q coeffs          [12:15] r coeffs
  [15]   signed id: (id + 1), negated when double-sided; 0 = padding
  [16:20] pixel bbox (x0, y0, x1, y1)
  [20:24] padding
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from androidrenderer_tpu.ops.raster.setup import TriangleSetup

WIN_H = 8
WIN_W = 128
REC = 24


def pack_records(setup: TriangleSetup) -> jnp.ndarray:
    """(N, 24) f32 triangle records from TriangleSetup (pure XLA)."""
    n = setup.edge.shape[0]
    ids = jnp.arange(1, n + 1, dtype=jnp.float32)
    signed_id = jnp.where(setup.double_sided, -ids, ids)
    signed_id = jnp.where(setup.valid, signed_id, 0.0)
    return jnp.concatenate(
        [
            setup.edge.reshape(n, 9),
            setup.q,
            setup.r,
            signed_id[:, None],
            setup.bbox,
            jnp.zeros((n, REC - 20), jnp.float32),
        ],
        axis=1,
    )


def bucket_by_slab(
    records: jnp.ndarray,  # (N, 24)
    num_slabs: int,
    slab_h: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact per-slab record tables: (S, N, 24) + counts (S,).

    A triangle lands in every slab its bbox y-range intersects (at most all S for a
    full-screen triangle). Worst-case capacity N keeps shapes static; the kernel stops
    at counts[s]."""
    n = records.shape[0]
    y0 = records[:, 17]
    y1 = records[:, 19]
    live = records[:, 15] != 0.0
    slab_ids = jnp.arange(num_slabs, dtype=jnp.float32)[:, None]
    lo = slab_ids * slab_h
    hi = lo + (slab_h - 1)
    mask = (y1[None, :] >= lo) & (y0[None, :] <= hi) & live[None, :]  # (S, N)
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    pos = jnp.cumsum(mask, axis=1, dtype=jnp.int32) - 1
    slot = jnp.where(mask, pos, n)  # n = dropped
    rows = jnp.broadcast_to(jnp.arange(num_slabs, dtype=jnp.int32)[:, None], mask.shape)
    src = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], mask.shape)
    gather_idx = (
        jnp.full((num_slabs, n), n, dtype=jnp.int32)
        .at[rows.reshape(-1), slot.reshape(-1)]
        .set(src.reshape(-1), mode="drop")
    )
    padded = jnp.concatenate([records, jnp.zeros((1, REC), records.dtype)], axis=0)
    return padded[gather_idx], counts


def _raster_kernel(
    counts_ref,  # (S,) i32 scalar prefetch
    recs_ref,  # (1, C, 24) f32 SMEM
    depth_ref,  # (slab_h, W) f32 VMEM block
    vis_ref=None,  # (slab_h, W) i32 VMEM block (absent in depth-only mode)
    *,
    slab_h: int,
    width: int,
    chunk: int,
    depth_only: bool,
):
    s = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)

    count = counts_ref[s]
    base = c * chunk
    n_here = jnp.clip(count - base, 0, chunk)
    slab_y0 = (s * slab_h).astype(jnp.float32)

    # Mosaic iota must be integer-typed; convert after.
    rowf = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, WIN_W), 0).astype(jnp.float32)
    colf = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, WIN_W), 1).astype(jnp.float32)

    def tri_body(k, carry):
        sid = recs_ref[0, k, 15]

        @pl.when(sid != 0.0)
        def _():
            a0 = recs_ref[0, k, 0]
            b0 = recs_ref[0, k, 1]
            c0 = recs_ref[0, k, 2]
            a1 = recs_ref[0, k, 3]
            b1 = recs_ref[0, k, 4]
            c1 = recs_ref[0, k, 5]
            a2 = recs_ref[0, k, 6]
            b2 = recs_ref[0, k, 7]
            c2 = recs_ref[0, k, 8]
            qa = recs_ref[0, k, 9]
            qb = recs_ref[0, k, 10]
            qc = recs_ref[0, k, 11]
            ra = recs_ref[0, k, 12]
            rb = recs_ref[0, k, 13]
            rc = recs_ref[0, k, 14]
            bx0 = recs_ref[0, k, 16]
            by0 = recs_ref[0, k, 17]
            bx1 = recs_ref[0, k, 18]
            by1 = recs_ref[0, k, 19]

            double_sided = sid < 0.0
            tri_id = (jnp.abs(sid) - 1.0).astype(jnp.int32)

            # Slab-local integer bbox.
            ly0 = jnp.maximum(by0.astype(jnp.int32) - s * slab_h, 0)
            ly1 = jnp.minimum(by1.astype(jnp.int32) - s * slab_h, slab_h - 1)
            lx0 = jnp.maximum(bx0.astype(jnp.int32), 0)
            lx1 = jnp.minimum(bx1.astype(jnp.int32), width - 1)

            @pl.when((ly1 >= ly0) & (lx1 >= lx0))
            def _():
                wy0 = (ly0 // WIN_H) * WIN_H
                ny = (ly1 // WIN_H) - (ly0 // WIN_H) + 1

                # Per-edge reciprocals for span math (amortized over strips).
                # Sign-preserving clamp: the bound direction below keys off the
                # SIGN of A, so a near-zero negative A must clamp to -eps (a +eps
                # replacement would flip the half-line and drop covered pixels).
                eps = 1e-12

                def _safe(a):
                    return jnp.where(
                        jnp.abs(a) < eps, jnp.where(a < 0.0, -eps, eps), a
                    )

                inv_a0 = 1.0 / _safe(a0)
                inv_a1 = 1.0 / _safe(a1)
                inv_a2 = 1.0 / _safe(a2)
                lx0f = lx0.astype(jnp.float32)
                lx1f = lx1.astype(jnp.float32)

                def strip_y(iy, _):
                    y = pl.multiple_of(wy0 + iy * WIN_H, WIN_H)
                    # Exact x-span of front coverage (all d_i <= 0) over this strip's
                    # rows, conservative union across the strip's 8 rows: per edge,
                    # the admissible half-line bound -(B*y + C)/A evaluated at both
                    # row extremes. Double-sided triangles fall back to the bbox
                    # (their back-face region would need the mirrored span too).
                    ytf = y.astype(jnp.float32) + slab_y0
                    ybf = ytf + (WIN_H - 1)

                    def bounds(aa, inv_aa, bb, cc):
                        bt = -(bb * ytf + cc) * inv_aa
                        bb_ = -(bb * ybf + cc) * inv_aa
                        # a < 0: x >= min(bounds);  a > 0: x <= max(bounds);
                        # a ~ 0: no x constraint from this edge.
                        lo = jnp.where(aa < 0.0, jnp.minimum(bt, bb_), lx0f)
                        hi = jnp.where(aa > 0.0, jnp.maximum(bt, bb_), lx1f)
                        return lo, hi

                    lo0, hi0 = bounds(a0, inv_a0, b0, c0)
                    lo1, hi1 = bounds(a1, inv_a1, b1, c1)
                    lo2, hi2 = bounds(a2, inv_a2, b2, c2)
                    span_lo = jnp.maximum(jnp.maximum(lo0, lo1), lo2)
                    span_hi = jnp.minimum(jnp.minimum(hi0, hi1), hi2)
                    span_lo = jnp.where(double_sided, lx0f, span_lo)
                    span_hi = jnp.where(double_sided, lx1f, span_hi)

                    sx0 = jnp.clip(span_lo.astype(jnp.int32), lx0, lx1)
                    sx1 = jnp.clip((span_hi + 1.0).astype(jnp.int32), lx0, lx1)
                    wx0 = (sx0 // WIN_W) * WIN_W
                    nx = jnp.where(
                        span_hi >= span_lo,
                        (sx1 // WIN_W) - (sx0 // WIN_W) + 1,
                        0,
                    )

                    def strip_x(ix, _):
                        x = pl.multiple_of(wx0 + ix * WIN_W, WIN_W)
                        gx = colf + x.astype(jnp.float32)
                        gy = rowf + y.astype(jnp.float32) + slab_y0
                        d0 = a0 * gx + b0 * gy + c0
                        d1 = a1 * gx + b1 * gy + c1
                        d2 = a2 * gx + b2 * gy + c2
                        dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
                        dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
                        cov = (dmax <= 0.0) | ((dmin >= 0.0) & double_sided)
                        qv = qa * gx + qb * gy + qc
                        rv = ra * gx + rb * gy + rc
                        z = rv / qv
                        cov = cov & (z > 0.0) & (z <= 1.0)

                        zwin = depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                        upd = cov & (z >= zwin)
                        depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.where(
                            upd, z, zwin
                        )
                        if not depth_only:
                            vwin = vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                            vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.where(
                                upd, tri_id, vwin
                            )
                        return 0

                    jax.lax.fori_loop(0, nx, strip_x, 0)
                    return 0

                jax.lax.fori_loop(0, ny, strip_y, 0)

        return carry

    jax.lax.fori_loop(0, n_here, tri_body, 0)


def rasterize_pallas(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 4,
    chunk: int = 512,
    depth_only: bool = False,
    interpret: bool = False,
):
    """(depth (H, W) f32, vis (H, W) i32) — or depth only.

    height must divide into num_slabs slabs of whole 8-px rows; width % 128 == 0."""
    if height % (num_slabs * WIN_H):
        raise ValueError(f"height {height} must be a multiple of num_slabs*8")
    if width % WIN_W:
        raise ValueError(f"width {width} must be a multiple of 128")
    slab_h = height // num_slabs

    records = pack_records(setup)
    if num_slabs == 1:
        # No bucketing needed: stream records directly (dead rows skip in-kernel).
        tables = records[None]
        counts = jnp.array([records.shape[0]], jnp.int32)
    else:
        tables, counts = bucket_by_slab(records, num_slabs, slab_h)
    n_cap = tables.shape[1]
    num_chunks = -(-n_cap // chunk)
    pad = num_chunks * chunk - n_cap
    if pad:
        tables = jnp.pad(tables, ((0, 0), (0, pad), (0, 0)))

    kernel = functools.partial(
        _raster_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        depth_only=depth_only,
    )

    out_shape = [jax.ShapeDtypeStruct((height, width), jnp.float32)]
    out_specs = [
        pl.BlockSpec((slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM)
    ]
    if not depth_only:
        out_shape.append(jax.ShapeDtypeStruct((height, width), jnp.int32))
        out_specs.append(
            pl.BlockSpec((slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_slabs, num_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, REC), lambda s, c, *_: (s, c, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=out_specs,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, tables)
    if depth_only:
        return result[0]
    return result[0], result[1]
