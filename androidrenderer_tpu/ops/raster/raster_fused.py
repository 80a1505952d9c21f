"""Fused touch-expansion rasterizer — coverage-proportional, single Pallas kernel.

Round-1 measured two designs (see raster_pallas.py, raster_touch.py):

- span-scalar kernel: correct, but pays per-(triangle, 8x128-window) scalar-issued
  RMW visits (~105 ms main raster, ~180 ms shadow cascades at bench scale).
- touch-expansion kernel: the right kernel shape, but its XLA-side ragged expansion
  costs ~580 ms (scatter/cumsum/gather soup at the ~27 ms/2M-row gather rate).

This kernel fuses the expansion INTO the raster kernel so the irregular work never
leaves the chip and there are no XLA gathers at all. Measured (round 2, v5e,
266k-triangle bench view at 1920x1088, chained timing): 54 ms vs 105 ms for the
span kernel, bit-identical visibility.

  grid = (num_slabs, num_chunks); each step streams a chunk of triangle records
  into SMEM (flat layout — SMEM windows pad the minor dimension to 128 lanes, so a
  (chunk, 24) block would waste 5x) and, for the current slab:

  Phase A (scalar): walk each triangle's 32-px-tall window rows inside the slab.
  Small triangles (1 row x <= 2 window columns — the vast majority at Sponza scale)
  emit their bbox windows directly with no span math and no edge-coefficient reads.
  Larger triangles compute the exact x-span per row (same math as raster_pallas).
  Each touched (row, 128-px window) appends one packed i32 to an SMEM staging
  buffer:  packed = local_tri_id << 9 | row_local << 4 | window_col.
  When staging fills mid-triangle it is drained (Phase B) and refilled — no touch
  is ever dropped, any capacity works.

  Phase B (vector): drain staged touches in order: per touch, broadcast the
  triangle's 16 coefficients from the SMEM record chunk into (32, 128) coverage +
  depth evaluation, then one window RMW. Batches of KB touches evaluate before
  their RMWs retire so vector work overlaps the serialized RMW chain. kb=2 is
  the default: measured identical speed to kb=8 (the RMW latency wall does not
  care about eval batching) and ~8x faster to Mosaic-compile (17 s vs ~130 s at
  bench scale — the kb-unrolled drain body dominated BENCH_r02's 1518 s
  raster-only config compile).

Ascending (chunk, triangle, row, window) emission order + in-order draining keeps
the tie-break identical to raster_xla: equal depth resolves to the highest id.

Replaces the reference's hardware rasterizer for all passes (gbuffer visibility,
depth prepass, CSM/RSM depth — scene_renderer.cpp:286-365 analog) — same contract
as rasterize_pallas.

Record layout (f32 x 24, flat in SMEM):
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

WIN_H = 32
WIN_W = 128
REC = 24


def pack_fused_records(setup: TriangleSetup, affine_z: bool = False) -> jnp.ndarray:
    """(N, 24) f32 records (pure XLA, elementwise only — no gathers).

    ``affine_z``: for orthographic projections (shadow/RSM depth) every vertex has
    w == 1, so q(x,y) = sum D_i = the constant twice-area (= q's C coefficient) and
    z = r/qc is an affine PLANE. Slots 12:15 then carry the plane coefficients
    r/qc directly and the kernel skips the per-touch divide."""
    n = setup.edge.shape[0]
    a = setup.edge[:, :, 0]
    eps = 1e-12
    inv_a = 1.0 / jnp.where(jnp.abs(a) < eps, jnp.where(a < 0, -eps, eps), a)
    sid = jnp.where(setup.double_sided, -1.0, 1.0)
    sid = jnp.where(setup.valid, sid, 0.0)
    if affine_z:
        qc = setup.q[:, 2:3]
        zplane = setup.r / jnp.where(qc == 0.0, 1.0, qc)
        mid = [zplane, jnp.zeros((n, 3), jnp.float32)]
    else:
        mid = [setup.q, setup.r]
    return jnp.concatenate(
        [
            setup.edge.reshape(n, 9),
            inv_a,
            *mid,
            sid[:, None],
            setup.bbox,
            jnp.zeros((n, REC - 23), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)


def _fused_kernel(
    count_ref,  # (1,) i32 scalar prefetch — live triangle count (valid-first order)
    recs_ref,  # (1, 1, CHUNK*24) f32 SMEM, flat records
    depth_ref,  # (slab_h, W) f32 VMEM
    *rest,  # [vis_ref,] [acc_d, [acc_v,]] stage_ref (STAGE,) i32, off_ref (1,) i32
    slab_h: int,
    width: int,
    chunk: int,
    stage_cap: int,
    kb: int,
    depth_only: bool,
    affine_z: bool,
    win_h: int,
    accum_bufs: int,
    num_chunks: int,
):
    rest = list(rest)
    vis_ref = None if depth_only else rest.pop(0)
    if accum_bufs > 1:
        acc_d = rest.pop(0)
        acc_v = None if depth_only else rest.pop(0)
    stage_ref, off_ref = rest

    s = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        if accum_bufs > 1:
            acc_d[...] = jnp.zeros((accum_bufs, slab_h, width), jnp.float32)
            if not depth_only:
                acc_v[...] = jnp.full((accum_bufs, slab_h, width), -1, jnp.int32)
        else:
            depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
            if not depth_only:
                vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)
        off_ref[0] = 0

    rows_per_slab = slab_h // win_h
    slab_row0 = s * rows_per_slab  # global window-row index of the slab's first row
    slab_y0 = (s * slab_h).astype(jnp.float32)
    chunk_base = c * chunk

    rowf = jax.lax.broadcasted_iota(jnp.int32, (win_h, WIN_W), 0).astype(jnp.float32)
    colf = jax.lax.broadcasted_iota(jnp.int32, (win_h, WIN_W), 1).astype(jnp.float32)

    def rd(k, i):
        return recs_ref[0, 0, k * REC + i]

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
                k = packed >> 9
                row = (packed >> 4) & 31
                col = packed & 15
                a0 = rd(k, 0)
                b0 = rd(k, 1)
                c0 = rd(k, 2)
                a1 = rd(k, 3)
                b1 = rd(k, 4)
                c1 = rd(k, 5)
                a2 = rd(k, 6)
                b2 = rd(k, 7)
                c2 = rd(k, 8)
                sid = rd(k, 18)
                gx = colf + (col * WIN_W).astype(jnp.float32)
                gy = rowf + (row * win_h).astype(jnp.float32) + slab_y0
                d0 = a0 * gx + b0 * gy + c0
                d1 = a1 * gx + b1 * gy + c1
                d2 = a2 * gx + b2 * gy + c2
                dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
                dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
                cov = (dmax <= 0.0) | ((dmin >= 0.0) & (sid < 0.0))
                if affine_z:
                    z = rd(k, 12) * gx + rd(k, 13) * gy + rd(k, 14)
                else:
                    qv = rd(k, 12) * gx + rd(k, 13) * gy + rd(k, 14)
                    z = (rd(k, 15) * gx + rd(k, 16) * gy + rd(k, 17)) / qv
                cov = cov & (z > 0.0) & (z <= 1.0)
                zs.append(jnp.where(cov, z, 0.0))
                meta.append((live, row, col, k))
            # … then retire the window RMW chains. With accum_bufs > 1, touch j
            # lands in buffer j % accum_bufs: consecutive touches to the SAME
            # window hit DIFFERENT buffers, so their load-select-store chains
            # are independent and pipeline (Mosaic serializes stores to one ref
            # with dynamic offsets — the ~150-cycle per-touch latency wall).
            for j in range(kb):
                live, row, col, k = meta[j]

                @pl.when(live)
                def _(j=j, row=row, col=col, k=k):
                    y = pl.multiple_of(row * win_h, win_h)
                    x = pl.multiple_of(col * WIN_W, WIN_W)
                    zk = zs[j]
                    if accum_bufs > 1:
                        b = j % accum_bufs
                        zw = acc_d[b, pl.ds(y, win_h), pl.ds(x, WIN_W)]
                        if depth_only:
                            acc_d[b, pl.ds(y, win_h), pl.ds(x, WIN_W)] = (
                                jnp.maximum(zw, zk)
                            )
                        else:
                            upd = (zk >= zw) & (zk > 0.0)
                            acc_d[b, pl.ds(y, win_h), pl.ds(x, WIN_W)] = jnp.where(
                                upd, zk, zw
                            )
                            vw = acc_v[b, pl.ds(y, win_h), pl.ds(x, WIN_W)]
                            acc_v[b, pl.ds(y, win_h), pl.ds(x, WIN_W)] = jnp.where(
                                upd, chunk_base + k, vw
                            )
                    else:
                        zw = depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
                        if depth_only:
                            depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = jnp.maximum(
                                zw, zk
                            )
                        else:
                            upd = (zk >= zw) & (zk > 0.0)
                            depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = jnp.where(
                                upd, zk, zw
                            )
                            vw = vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
                            vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = jnp.where(
                                upd, chunk_base + k, vw
                            )

            return 0

        jax.lax.fori_loop(0, pl.cdiv(n, kb), batch, 0)

    def emit(packed):
        o = off_ref[0]
        stage_ref[o] = packed
        off_ref[0] = o + 1

        @pl.when(o + 1 == stage_cap)
        def _():
            drain(stage_cap)
            off_ref[0] = 0

    def tri_body(k, _):
        sid = rd(k, 18)

        @pl.when(sid != 0.0)
        def _():
            by0 = rd(k, 20)
            by1 = rd(k, 22)
            ty0 = jnp.maximum(by0.astype(jnp.int32) // win_h, slab_row0)
            ty1 = jnp.minimum(
                by1.astype(jnp.int32) // win_h, slab_row0 + rows_per_slab - 1
            )

            @pl.when(ty1 >= ty0)
            def _():
                bx0 = rd(k, 19)
                bx1 = rd(k, 21)
                cx0 = bx0.astype(jnp.int32) // WIN_W
                cx1 = bx1.astype(jnp.int32) // WIN_W
                small = (ty1 == ty0) & (cx1 - cx0 <= 1)

                # Fast path: bbox-window emission, no span math, no coeff reads.
                @pl.when(small)
                def _():
                    base_packed = (k << 9) | ((ty0 - slab_row0) << 4) | cx0
                    emit(base_packed)

                    @pl.when(cx1 > cx0)
                    def _():
                        emit(base_packed + 1)

                @pl.when(~small)
                def _():
                    a0 = rd(k, 0)
                    b0 = rd(k, 1)
                    c0 = rd(k, 2)
                    a1 = rd(k, 3)
                    b1 = rd(k, 4)
                    c1 = rd(k, 5)
                    a2 = rd(k, 6)
                    b2 = rd(k, 7)
                    c2 = rd(k, 8)
                    ia0 = rd(k, 9)
                    ia1 = rd(k, 10)
                    ia2 = rd(k, 11)
                    dbl = sid < 0.0

                    def strip(iy, _):
                        row = ty0 + iy
                        ytf = (row * win_h).astype(jnp.float32)
                        ybf = ytf + (win_h - 1)

                        def bounds(aa, inv_aa, bb, cc):
                            bt = -(bb * ytf + cc) * inv_aa
                            bb_ = -(bb * ybf + cc) * inv_aa
                            lo = jnp.where(aa < 0.0, jnp.minimum(bt, bb_), bx0)
                            hi = jnp.where(aa > 0.0, jnp.maximum(bt, bb_), bx1)
                            return lo, hi

                        lo0, hi0 = bounds(a0, ia0, b0, c0)
                        lo1, hi1 = bounds(a1, ia1, b1, c1)
                        lo2, hi2 = bounds(a2, ia2, b2, c2)
                        span_lo = jnp.maximum(
                            jnp.maximum(jnp.maximum(lo0, lo1), lo2), bx0
                        )
                        span_hi = jnp.minimum(
                            jnp.minimum(jnp.minimum(hi0, hi1), hi2), bx1
                        )
                        span_lo = jnp.where(dbl, bx0, span_lo)
                        span_hi = jnp.where(dbl, bx1, span_hi)

                        wx0 = (
                            jnp.clip(span_lo, 0.0, width - 1.0).astype(jnp.int32)
                            // WIN_W
                        )
                        wx1 = (
                            jnp.clip(span_hi, 0.0, width - 1.0).astype(jnp.int32)
                            // WIN_W
                        )
                        nw = jnp.where(span_hi >= span_lo, wx1 - wx0 + 1, 0)
                        base_packed = (k << 9) | ((row - slab_row0) << 4) | wx0

                        def win(iw, _):
                            emit(base_packed + iw)
                            return 0

                        jax.lax.fori_loop(0, nw, win, 0)
                        return 0

                    jax.lax.fori_loop(0, ty1 - ty0 + 1, strip, 0)

        return 0

    # Chunks wholly past the live count cost nothing (compaction + count prefetch).
    n_here = jnp.clip(count_ref[0] - chunk_base, 0, chunk)
    jax.lax.fori_loop(0, n_here, tri_body, 0)
    # End-of-chunk drain: staging must be empty before the record window advances
    # (Phase B reads coefficients from the CURRENT chunk).
    drain(off_ref[0])
    off_ref[0] = 0

    if accum_bufs > 1:
        # Last chunk of the slab: merge the accumulators into the outputs.
        # Ties (equal depth) resolve to the highest id, matching the global rule:
        # each buffer's winner is already its max id at that depth (round-robin
        # assignment keeps ids ascending per buffer).
        @pl.when(c == num_chunks - 1)
        def _merge():
            d0 = acc_d[0]
            if depth_only:
                for b in range(1, accum_bufs):
                    d0 = jnp.maximum(d0, acc_d[b])
                depth_ref[:, :] = d0
            else:
                v0 = acc_v[0]
                for b in range(1, accum_bufs):
                    db = acc_d[b]
                    vb = acc_v[b]
                    better = (db > d0) | ((db == d0) & (vb > v0))
                    d0 = jnp.where(better, db, d0)
                    v0 = jnp.where(better, vb, v0)
                depth_ref[:, :] = d0
                vis_ref[:, :] = v0


def auto_slabs(
    height: int, width: int, depth_only: bool = False, win_h: int = WIN_H,
    accum_bufs: int = 1,
) -> int:
    """Smallest slab count satisfying the row-field and VMEM constraints."""
    bytes_per_px = (4 if depth_only else 8) * (1 + accum_bufs if accum_bufs > 1 else 1)
    budget = 10 * 2**20  # framebuffer slab budget (VMEM is ~16 MB total)
    s = 1
    while True:
        hp = -(-height // (s * win_h)) * (s * win_h)
        slab_h = hp // s
        if slab_h <= 32 * win_h and slab_h * width * bytes_per_px <= budget:
            return s
        s += 1


def rasterize_fused(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    chunk: int = 1024,
    stage_cap: int = 2048,
    kb: int = 2,
    depth_only: bool = False,
    affine_z: bool = False,
    compact: bool = False,
    interpret: bool = False,
    win_h: int = WIN_H,
    accum_bufs: int = 1,
):
    """(depth (H, W) f32, vis (H, W) i32) — or depth only.

    ``accum_bufs`` > 1 interleaves the window RMWs across that many VMEM
    accumulator copies (merged at slab end) so consecutive touches pipeline
    instead of serializing on the ~150-cycle load-select-store latency.

    Heights that do not split into num_slabs x win_h-px rows are padded internally
    and sliced on return. Constraints: slab height <= 32 * win_h (5-bit row field);
    width % 128 == 0 and <= 2048 (4-bit window-column field); chunk <= 2^22.

    ``win_h``: RMW window height. 32 suits screen-scale targets; small targets
    dense with subpixel triangles (RSM 128^2) want 8 — every touch costs a full
    (win_h, 128) window RMW, so undersized triangles waste 4x at win_h=32.
    ``affine_z``: orthographic fast path (see pack_fused_records).
    ``compact``: sort valid records first (one XLA gather) so the kernel scans only
    the live count — pays off when most triangles are culled (shadow cascades) AND
    triangle ids are not consumed (ids change under compaction; require depth_only).
    """
    if width % WIN_W or width > 16 * WIN_W:
        raise ValueError(f"width {width} must be a multiple of 128 and <= 2048")
    hp = -(-height // (num_slabs * win_h)) * (num_slabs * win_h)
    slab_h = hp // num_slabs
    if slab_h > 32 * win_h:
        raise ValueError(f"slab height {slab_h} exceeds the 5-bit row field")
    if compact and not depth_only:
        raise ValueError("compact reorders triangle ids; only valid with depth_only")

    records = pack_fused_records(setup, affine_z=affine_z)
    n = records.shape[0]
    if compact:
        live = setup.valid
        count = jnp.sum(live, dtype=jnp.int32)
        pos = jnp.cumsum(live, dtype=jnp.int32) - 1
        slot = jnp.where(live, pos, n - 1)
        order = (
            jnp.zeros((n,), jnp.int32)
            .at[slot]
            .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        records = records[order]
        records = records.at[:, 18].set(
            jnp.where(jnp.arange(n) < count, records[:, 18], 0.0)
        )
    else:
        count = jnp.int32(n)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        records = jnp.pad(records, ((0, pad), (0, 0)))
    # Flat SMEM layout: windows pad the minor dimension to 128 lanes, so expose one
    # dense (chunk*24,) row instead of a (chunk, 24) block (which would cost 5x).
    records = records.reshape(num_chunks, 1, chunk * REC)

    kernel = functools.partial(
        _fused_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        stage_cap=stage_cap,
        kb=kb,
        depth_only=depth_only,
        affine_z=affine_z,
        win_h=win_h,
        accum_bufs=accum_bufs,
        num_chunks=num_chunks,
    )

    out_shape = [jax.ShapeDtypeStruct((hp, width), jnp.float32)]
    out_specs = [
        pl.BlockSpec((slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM)
    ]
    if not depth_only:
        out_shape.append(jax.ShapeDtypeStruct((hp, width), jnp.int32))
        out_specs.append(
            pl.BlockSpec((slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM)
        )

    scratch = []
    if accum_bufs > 1:
        scratch.append(pltpu.VMEM((accum_bufs, slab_h, width), jnp.float32))
        if not depth_only:
            scratch.append(pltpu.VMEM((accum_bufs, slab_h, width), jnp.int32))
    scratch += [
        pltpu.SMEM((stage_cap,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_slabs, num_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk * REC), lambda s, c, *_: (c, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(count[None], records)
    if depth_only:
        return result[0][:height]
    return result[0][:height], result[1][:height]


def rasterize_hybrid(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    depth_only: bool = False,
    affine_z: bool = False,
    interpret: bool = False,
    backend: str = "fused",  # "fused" | "binned" window kernel for the big tris
    **fused_kwargs,
):
    """Hybrid splat + window raster — same contract/bit-exactness as
    rasterize_fused, built for triangle-dense small targets (RSM/shadow views,
    where most triangles footprint a single pixel but each costs the kernel a
    full (32, 128)-window RMW):

    - triangles whose integer bbox is ONE candidate pixel evaluate coverage/depth
      at that pixel center in XLA and retire via flat scatter-max (a 266k-row
      scatter costs ~3 ms vs ~60 ms of window RMWs at RSM scale);
    - everything else goes through the fused Pallas kernel.

    Exactness: pixel-center edge/z evaluation uses the identical formulas as the
    kernel; ties (equal z) resolve to the highest triangle id in both halves and
    across them."""
    bbox = setup.bbox
    x0i = bbox[:, 0].astype(jnp.int32)
    y0i = bbox[:, 1].astype(jnp.int32)
    x1i = bbox[:, 2].astype(jnp.int32)
    y1i = bbox[:, 3].astype(jnp.int32)
    single = setup.valid & (x0i == x1i) & (y0i == y1i)

    px = x0i.astype(jnp.float32)
    py = y0i.astype(jnp.float32)
    e = setup.edge
    d0 = e[:, 0, 0] * px + e[:, 0, 1] * py + e[:, 0, 2]
    d1 = e[:, 1, 0] * px + e[:, 1, 1] * py + e[:, 1, 2]
    d2 = e[:, 2, 0] * px + e[:, 2, 1] * py + e[:, 2, 2]
    dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
    dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
    cov = (dmax <= 0.0) | ((dmin >= 0.0) & setup.double_sided)
    if affine_z:
        qc = setup.q[:, 2]
        zp = setup.r / jnp.where(qc == 0.0, 1.0, qc)[:, None]
        z = zp[:, 0] * px + zp[:, 1] * py + zp[:, 2]
    else:
        qv = setup.q[:, 0] * px + setup.q[:, 1] * py + setup.q[:, 2]
        z = (setup.r[:, 0] * px + setup.r[:, 1] * py + setup.r[:, 2]) / qv
    cov = cov & (z > 0.0) & (z <= 1.0) & single

    n_px = height * width
    idx = jnp.where(cov, y0i * width + x0i, n_px)
    depth_splat = (
        jnp.zeros((n_px,), jnp.float32)
        .at[idx]
        .max(jnp.where(cov, z, 0.0), mode="drop")
    )

    setup_big = setup._replace(valid=setup.valid & ~single)
    if backend == "binned":
        from androidrenderer_tpu.ops.raster.raster_binned import rasterize_binned

        def _kernel(**kw):
            return rasterize_binned(
                setup_big, height, width, num_slabs=num_slabs,
                affine_z=affine_z, interpret=interpret, **fused_kwargs, **kw,
            )
    else:
        def _kernel(**kw):
            return rasterize_fused(
                setup_big, height, width, num_slabs=num_slabs,
                affine_z=affine_z, interpret=interpret, **fused_kwargs, **kw,
            )
    if depth_only:
        depth_big = _kernel(depth_only=True)
        return jnp.maximum(depth_big, depth_splat.reshape(height, width))

    depth_big, vis_big = _kernel()
    depth = jnp.maximum(depth_big, depth_splat.reshape(height, width))
    # Splat winners: the splat whose z equals the final per-pixel depth; equal-z
    # splats resolve to the highest id (scatter-max), and splat-vs-kernel equal-z
    # resolves to the highest id below.
    dg = depth.reshape(-1)[jnp.minimum(idx, n_px - 1)]
    win = cov & (z == dg)
    tri_ids = jnp.arange(setup.valid.shape[0], dtype=jnp.int32)
    vis_splat = (
        jnp.full((n_px,), -1, jnp.int32)
        .at[idx]
        .max(jnp.where(win, tri_ids, -1), mode="drop")
    ).reshape(height, width)
    ds = depth_splat.reshape(height, width)
    vis = jnp.where(
        ds > depth_big,
        vis_splat,
        jnp.where(ds == depth_big, jnp.maximum(vis_splat, vis_big), vis_big),
    )
    return depth, vis
