"""Fused touch-expansion rasterizer — coverage-proportional, single Pallas kernel.

Round-1 measured two designs (see raster_pallas.py, raster_touch.py):

- span-scalar kernel: correct, but pays 45-150 cycles per (triangle, 8x128-window)
  visit on the dependent VMEM read-modify-write chain AND visits every window in the
  triangle's span (~150 ms main raster, ~180 ms shadow cascades at bench scale).
- touch-expansion kernel: the right kernel (batched coverage eval + short RMWs), but
  its XLA-side ragged expansion costs ~580 ms (scatter/cumsum/gather soup).

This kernel fuses the expansion INTO the raster kernel so the irregular work never
leaves the chip and there are no XLA gathers at all:

  grid = (num_slabs, num_chunks); each step streams a chunk of triangle records into
  SMEM and, for the current slab:

  Phase A (scalar): for each triangle, walk its 8-px strips inside the slab, compute
  the exact x-span per strip (same span math as raster_pallas), and append one packed
  i32 per touched (strip, 128-px window) into an SMEM staging buffer:
      packed = local_tri_id << 11 | strip_local << 4 | window_col
  When the staging buffer fills mid-triangle it is drained (Phase B) and refilled —
  no touch is ever dropped, any capacity works.

  Phase B (vector): drain the staged touches in order: per touch, broadcast the
  triangle's 16 coefficients from the SMEM record chunk into (8, 128) coverage +
  depth evaluation, then one short window RMW (load, compare, store). Batches of
  KB touches are evaluated before their RMWs so the vector work pipelines while the
  serialized RMW chain retires.

Ascending (chunk, triangle, strip, window) emission order + in-order draining keeps
the tie-break identical to raster_xla: equal depth resolves to the highest id.

Replaces the reference's hardware rasterizer for all passes (gbuffer visibility,
depth prepass, CSM/RSM depth — scene_renderer.cpp:286-365 analog) — same contract as
rasterize_pallas.

Record layout (f32 x 24, SMEM):
  [0:9]   e0/e1/e2 (A, B, C)       [9:12]  inv_A (sign-preserving reciprocal)
  [12:15] q coeffs                 [15:18] r coeffs
  [18]    sid: +1 single-sided, -1 double-sided, 0 dead
  [19:23] pixel bbox (x0, y0, x1, y1)      [23] pad
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from androidrenderer_tpu.ops.raster.setup import TriangleSetup

WIN_H = 8
WIN_W = 128
REC = 24


def pack_fused_records(setup: TriangleSetup) -> jnp.ndarray:
    """(N, 24) f32 records (pure XLA, elementwise only — no gathers)."""
    n = setup.edge.shape[0]
    a = setup.edge[:, :, 0]
    eps = 1e-12
    inv_a = 1.0 / jnp.where(jnp.abs(a) < eps, jnp.where(a < 0, -eps, eps), a)
    sid = jnp.where(setup.double_sided, -1.0, 1.0)
    sid = jnp.where(setup.valid, sid, 0.0)
    return jnp.concatenate(
        [
            setup.edge.reshape(n, 9),
            inv_a,
            setup.q,
            setup.r,
            sid[:, None],
            setup.bbox,
            jnp.zeros((n, REC - 23), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)


def _fused_kernel(
    recs_ref,  # (1, CHUNK, 24) f32 SMEM
    depth_ref,  # (slab_h, W) f32 VMEM
    *rest,  # [vis_ref (slab_h, W) i32 VMEM,] stage_ref (STAGE,) i32, off_ref (1,) i32
    slab_h: int,
    width: int,
    chunk: int,
    stage_cap: int,
    kb: int,
    depth_only: bool,
):
    if depth_only:
        vis_ref = None
        stage_ref, off_ref = rest
    else:
        vis_ref, stage_ref, off_ref = rest
    s = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)
        off_ref[0] = 0

    strips_per_slab = slab_h // WIN_H
    slab_row0 = s * strips_per_slab  # global strip index of the slab's first strip
    slab_y0 = (s * slab_h).astype(jnp.float32)
    chunk_base = c * chunk

    rowf = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, WIN_W), 0).astype(jnp.float32)
    colf = jax.lax.broadcasted_iota(jnp.int32, (WIN_H, WIN_W), 1).astype(jnp.float32)

    def drain(n):
        """Phase B: rasterize staged touches [0, n) in order."""

        def batch(i, _):
            base = i * kb
            # Evaluate KB coverage/depth windows first (independent vector work) …
            zs = []
            meta = []
            for j in range(kb):
                idx = base + j
                live = idx < n
                packed = jnp.where(live, stage_ref[jnp.minimum(idx, stage_cap - 1)], 0)
                k = packed >> 11
                row = (packed >> 4) & 127
                col = packed & 15
                a0 = recs_ref[0, k, 0]
                b0 = recs_ref[0, k, 1]
                c0 = recs_ref[0, k, 2]
                a1 = recs_ref[0, k, 3]
                b1 = recs_ref[0, k, 4]
                c1 = recs_ref[0, k, 5]
                a2 = recs_ref[0, k, 6]
                b2 = recs_ref[0, k, 7]
                c2 = recs_ref[0, k, 8]
                qa = recs_ref[0, k, 12]
                qb = recs_ref[0, k, 13]
                qc = recs_ref[0, k, 14]
                ra = recs_ref[0, k, 15]
                rb = recs_ref[0, k, 16]
                rc = recs_ref[0, k, 17]
                sid = recs_ref[0, k, 18]
                gx = colf + (col * WIN_W).astype(jnp.float32)
                gy = rowf + (row * WIN_H).astype(jnp.float32) + slab_y0
                d0 = a0 * gx + b0 * gy + c0
                d1 = a1 * gx + b1 * gy + c1
                d2 = a2 * gx + b2 * gy + c2
                dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
                dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
                cov = (dmax <= 0.0) | ((dmin >= 0.0) & (sid < 0.0))
                z = (ra * gx + rb * gy + rc) / (qa * gx + qb * gy + qc)
                cov = cov & (z > 0.0) & (z <= 1.0)
                zs.append(jnp.where(cov, z, 0.0))
                meta.append((live, row, col, k))
            # … then retire the (short, serialized) window RMW chain.
            for j in range(kb):
                live, row, col, k = meta[j]

                @pl.when(live)
                def _(j=j, row=row, col=col, k=k):
                    y = pl.multiple_of(row * WIN_H, WIN_H)
                    x = pl.multiple_of(col * WIN_W, WIN_W)
                    zk = zs[j]
                    zw = depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                    if depth_only:
                        depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.maximum(
                            zw, zk
                        )
                    else:
                        upd = (zk >= zw) & (zk > 0.0)
                        depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.where(
                            upd, zk, zw
                        )
                        vw = vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                        vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.where(
                            upd, chunk_base + k, vw
                        )

            return 0

        jax.lax.fori_loop(0, pl.cdiv(n, kb), batch, 0)

    def tri_body(k, _):
        sid = recs_ref[0, k, 18]

        @pl.when(sid != 0.0)
        def _():
            by0 = recs_ref[0, k, 20]
            by1 = recs_ref[0, k, 22]
            sy0 = jnp.maximum(by0.astype(jnp.int32) // WIN_H, slab_row0)
            sy1 = jnp.minimum(
                by1.astype(jnp.int32) // WIN_H, slab_row0 + strips_per_slab - 1
            )

            @pl.when(sy1 >= sy0)
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
                ia0 = recs_ref[0, k, 9]
                ia1 = recs_ref[0, k, 10]
                ia2 = recs_ref[0, k, 11]
                bx0 = recs_ref[0, k, 19]
                bx1 = recs_ref[0, k, 21]
                dbl = sid < 0.0

                def strip(iy, _):
                    row = sy0 + iy  # global strip index
                    ytf = (row * WIN_H).astype(jnp.float32)
                    ybf = ytf + (WIN_H - 1)

                    def bounds(aa, inv_aa, bb, cc):
                        bt = -(bb * ytf + cc) * inv_aa
                        bb_ = -(bb * ybf + cc) * inv_aa
                        lo = jnp.where(aa < 0.0, jnp.minimum(bt, bb_), bx0)
                        hi = jnp.where(aa > 0.0, jnp.maximum(bt, bb_), bx1)
                        return lo, hi

                    lo0, hi0 = bounds(a0, ia0, b0, c0)
                    lo1, hi1 = bounds(a1, ia1, b1, c1)
                    lo2, hi2 = bounds(a2, ia2, b2, c2)
                    span_lo = jnp.maximum(jnp.maximum(jnp.maximum(lo0, lo1), lo2), bx0)
                    span_hi = jnp.minimum(jnp.minimum(jnp.minimum(hi0, hi1), hi2), bx1)
                    span_lo = jnp.where(dbl, bx0, span_lo)
                    span_hi = jnp.where(dbl, bx1, span_hi)

                    wx0 = (
                        jnp.clip(span_lo, 0.0, width - 1.0).astype(jnp.int32) // WIN_W
                    )
                    wx1 = (
                        jnp.clip(span_hi, 0.0, width - 1.0).astype(jnp.int32) // WIN_W
                    )
                    nw = jnp.where(span_hi >= span_lo, wx1 - wx0 + 1, 0)
                    base_packed = (k << 11) | ((row - slab_row0) << 4) | wx0

                    def win(iw, _):
                        o = off_ref[0]
                        stage_ref[o] = base_packed + iw
                        off_ref[0] = o + 1

                        @pl.when(o + 1 == stage_cap)
                        def _():
                            drain(stage_cap)
                            off_ref[0] = 0

                        return 0

                    jax.lax.fori_loop(0, nw, win, 0)
                    return 0

                jax.lax.fori_loop(0, sy1 - sy0 + 1, strip, 0)

        return 0

    jax.lax.fori_loop(0, chunk, tri_body, 0)
    # End-of-chunk drain: the staging buffer must be empty before the record window
    # advances (Phase B reads coefficients from the CURRENT chunk).
    drain(off_ref[0])
    off_ref[0] = 0


def rasterize_fused(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    chunk: int = 1024,
    stage_cap: int = 4096,
    kb: int = 8,
    depth_only: bool = False,
    interpret: bool = False,
):
    """(depth (H, W) f32, vis (H, W) i32) — or depth only.

    Constraints: height % (num_slabs * 8) == 0; slab height <= 1024 (7-bit strip
    field); width % 128 == 0 and <= 2048 (4-bit window-column field); chunk <= 2^20.
    """
    if height % (num_slabs * WIN_H):
        raise ValueError(f"height {height} must be a multiple of num_slabs*8")
    if width % WIN_W or width > 16 * WIN_W:
        raise ValueError(f"width {width} must be a multiple of 128 and <= 2048")
    slab_h = height // num_slabs
    if slab_h > 128 * WIN_H:
        raise ValueError(f"slab height {slab_h} exceeds the 7-bit strip field")

    records = pack_fused_records(setup)
    n = records.shape[0]
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        records = jnp.pad(records, ((0, pad), (0, 0)))
    records = records.reshape(num_chunks, chunk, REC)

    kernel = functools.partial(
        _fused_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        stage_cap=stage_cap,
        kb=kb,
        depth_only=depth_only,
    )
    out_shape = [jax.ShapeDtypeStruct((height, width), jnp.float32)]
    out_specs = [
        pl.BlockSpec((slab_h, width), lambda s, c: (s, 0), memory_space=pltpu.VMEM)
    ]
    if not depth_only:
        out_shape.append(jax.ShapeDtypeStruct((height, width), jnp.int32))
        out_specs.append(
            pl.BlockSpec((slab_h, width), lambda s, c: (s, 0), memory_space=pltpu.VMEM)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_slabs, num_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, REC), lambda s, c: (c, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((stage_cap,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(records)
    if depth_only:
        return result[0]
    return result[0], result[1]
