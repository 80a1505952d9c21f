"""Touch-expansion rasterizer — coverage-proportional Pallas raster (roadmap item 1).

The span-scalar kernel (raster_pallas.py) pays per-triangle scalar setup plus span
math *inside* the kernel. This variant moves ALL irregularity into vectorized XLA:

  triangles --ragged expand--> 8-row strips --exact x-span--> (8,128)-window TOUCHES

(for the 266k-triangle bench view: 345k touches vs 4.4M bbox windows — 12.8x). The
kernel then streams touch records and, per batch of K touches, evaluates coverage and
depth VECTORIZED as one (K, 8, 128) computation, followed by K unrolled window
read-modify-writes (sequential => batch-internal conflicts resolve correctly, and
ascending triangle order preserves the XLA path's max-id tie-break).

Touch records are pre-gathered in XLA, stored TRANSPOSED (ROWS, T) so the kernel
vector-slices coefficient rows; window addresses + ids ride in SMEM.

Record rows [f32 x 18, padded to 24]:
  0..8  e0/e1/e2 (A,B,C)   9..11 q   12..14 r   15 signed id (0 dead)
addr rows [i32 x 4]: 0 window row (slab-local, in 8-px units), 1 window col (in
  128-px units), 2 triangle id, 3 live flag.
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
REC_ROWS = 24


def _ragged_expand(counts: jnp.ndarray, offsets: jnp.ndarray, cap: int):
    """Marker-cumsum ragged expansion.

    Given per-source counts and exclusive offsets, returns for each flat slot:
    (source index, live mask). Sources with count 0 are skipped."""
    n = counts.shape[0]
    has = counts > 0
    starts = jnp.zeros((cap + 1,), jnp.int32)
    starts = starts.at[jnp.where(has, offsets, cap)].add(1, mode="drop")
    ends = jnp.zeros((cap + 1,), jnp.int32)
    ends = ends.at[jnp.where(has, offsets + counts, cap)].add(1, mode="drop")
    src_rank = jnp.cumsum(starts[:-1]) - 1  # rank among non-empty sources
    inside = (jnp.cumsum(starts[:-1]) - jnp.cumsum(ends[:-1])) > 0
    # rank -> original source index.
    rank_of = jnp.cumsum(has.astype(jnp.int32)) - 1
    rank_to_src = (
        jnp.zeros((n + 1,), jnp.int32)
        .at[jnp.where(has, rank_of, n)]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    src = rank_to_src[jnp.clip(src_rank, 0, n)]
    return src, inside


def expand_touches(
    setup: TriangleSetup,
    width: int,
    height: int,
    num_slabs: int,
    slab_h: int,
    touches_per_slab: int,
    chunk: int,
):
    """XLA side: build the flat touch tables.

    Returns (records (24, T), addr (4, T), chunk_slab (n_chunks,), chunk_first
    (n_chunks,), overflow (num_slabs,) true touch counts for diagnostics)."""
    n = setup.edge.shape[0]
    t_slab = touches_per_slab
    t_total = num_slabs * t_slab
    assert t_slab % chunk == 0

    edge = setup.edge
    # Per-edge x-span helpers (same math as the span kernel, fully vectorized).
    a = edge[:, :, 0]
    b = edge[:, :, 1]
    cc = edge[:, :, 2]
    eps = 1e-12
    inv_a = 1.0 / jnp.where(jnp.abs(a) < eps, eps, a)

    bx0 = jnp.clip(setup.bbox[:, 0], 0.0, width - 1.0)
    bx1 = jnp.clip(setup.bbox[:, 2], 0.0, width - 1.0)

    signed_id = jnp.where(setup.double_sided, -(jnp.arange(n) + 1.0), jnp.arange(n) + 1.0)
    signed_id = jnp.where(setup.valid, signed_id, 0.0).astype(jnp.float32)

    rec_cols = jnp.concatenate(
        [
            edge.reshape(n, 9),
            setup.q,
            setup.r,
            signed_id[:, None],
            jnp.zeros((n, REC_ROWS - 16), jnp.float32),
        ],
        axis=1,
    )  # (N, 24)
    rec_cols = jnp.concatenate([rec_cols, jnp.zeros((1, REC_ROWS), jnp.float32)], 0)

    all_records = []
    all_addr = []
    chunk_slab = []
    chunk_first = []
    overflow = []

    sy0_g = jnp.floor(setup.bbox[:, 1] / WIN_H).astype(jnp.int32)
    sy1_g = jnp.floor(setup.bbox[:, 3] / WIN_H).astype(jnp.int32)

    for s in range(num_slabs):
        rows_lo = s * (slab_h // WIN_H)
        rows_hi = (s + 1) * (slab_h // WIN_H) - 1
        lo = jnp.maximum(sy0_g, rows_lo)
        hi = jnp.minimum(sy1_g, rows_hi)
        s_counts = jnp.where(setup.valid & (hi >= lo), hi - lo + 1, 0)
        s_offsets = jnp.cumsum(s_counts) - s_counts
        s_cap = t_slab  # strips <= touches, reuse the same capacity
        src, live = _ragged_expand(s_counts, s_offsets, s_cap)
        strip_tri = jnp.clip(src, 0, n - 1)
        strip_row = (
            jnp.arange(s_cap, dtype=jnp.int32) - s_offsets[strip_tri] + lo[strip_tri]
        )
        strip_live = live & (jnp.arange(s_cap) < s_offsets[-1] + s_counts[-1])

        # Exact x-span over the strip's rows (union across rows; bbox for
        # double-sided).
        ytf = (strip_row * WIN_H).astype(jnp.float32)
        ybf = ytf + (WIN_H - 1)
        at = a[strip_tri]
        bt = b[strip_tri]
        ct = cc[strip_tri]
        iat = inv_a[strip_tri]
        b_top = -(bt * ytf[:, None] + ct) * iat
        b_bot = -(bt * ybf[:, None] + ct) * iat
        lo_e = jnp.where(at < 0.0, jnp.minimum(b_top, b_bot), 0.0)
        hi_e = jnp.where(at > 0.0, jnp.maximum(b_top, b_bot), width - 1.0)
        span_lo = jnp.max(lo_e, axis=1)
        span_hi = jnp.min(hi_e, axis=1)
        dbl = setup.double_sided[strip_tri]
        span_lo = jnp.where(dbl, bx0[strip_tri], jnp.maximum(span_lo, bx0[strip_tri]))
        span_hi = jnp.where(dbl, bx1[strip_tri], jnp.minimum(span_hi, bx1[strip_tri]))
        wx0 = jnp.clip(span_lo, 0.0, width - 1.0).astype(jnp.int32) // WIN_W
        wx1 = jnp.clip(span_hi, 0.0, width - 1.0).astype(jnp.int32) // WIN_W
        t_counts = jnp.where(strip_live & (span_hi >= span_lo), wx1 - wx0 + 1, 0)
        t_offsets = jnp.cumsum(t_counts) - t_counts
        total = t_offsets[-1] + t_counts[-1]
        overflow.append(total)

        tsrc, tlive = _ragged_expand(t_counts, t_offsets, t_slab)
        tsrc = jnp.clip(tsrc, 0, s_cap - 1)
        tlive = tlive & (jnp.arange(t_slab) < total)
        touch_tri = jnp.where(tlive, strip_tri[tsrc], n)  # n = dead row
        touch_row = strip_row[tsrc] - rows_lo  # slab-local window row
        touch_col = wx0[tsrc] + (jnp.arange(t_slab, dtype=jnp.int32) - t_offsets[tsrc])

        recs = rec_cols[touch_tri]  # (t_slab, 24) — the one gather
        all_records.append(recs)
        addr = jnp.stack(
            [
                jnp.where(tlive, touch_row, 0),
                jnp.where(tlive, touch_col, 0),
                jnp.where(tlive, touch_tri, -1),
                tlive.astype(jnp.int32),
            ],
            axis=0,
        )  # (4, t_slab)
        all_addr.append(addr)
        n_chunks_slab = t_slab // chunk
        chunk_slab.extend([s] * n_chunks_slab)
        chunk_first.extend([1] + [0] * (n_chunks_slab - 1))

    records = jnp.concatenate(all_records, axis=0).T  # (24, T)
    addr = jnp.concatenate(all_addr, axis=1)  # (4, T)
    return (
        records,
        addr,
        jnp.asarray(chunk_slab, jnp.int32),
        jnp.asarray(chunk_first, jnp.int32),
        jnp.stack(overflow),
    )


def _touch_kernel(
    chunk_slab_ref,  # (n_chunks,) i32 prefetch
    chunk_first_ref,  # (n_chunks,) i32 prefetch
    recs_ref,  # (24, C) f32 VMEM
    addr_ref,  # (4, C) i32 SMEM
    depth_ref,  # (slab_h, W) f32
    vis_ref=None,  # (slab_h, W) i32
    *,
    slab_h: int,
    width: int,
    chunk: int,
    k_batch: int,
    depth_only: bool,
):
    c = pl.program_id(0)

    @pl.when(chunk_first_ref[c] == 1)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)

    slab_y0 = (chunk_slab_ref[c] * slab_h).astype(jnp.float32)
    rowf = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_H, WIN_W), 1).astype(jnp.float32)
    colf = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_H, WIN_W), 2).astype(jnp.float32)

    def batch(i, _):
        base = i * k_batch

        def row(j):
            return recs_ref[j, pl.ds(base, k_batch)].reshape(k_batch, 1, 1)

        sid = row(15)
        # Window origins, vectorized (pixel coords of each touch's window).
        wy = addr_ref[0, pl.ds(base, k_batch)].reshape(k_batch, 1, 1)
        wx = addr_ref[1, pl.ds(base, k_batch)].reshape(k_batch, 1, 1)
        gx = wx.astype(jnp.float32) * WIN_W + colf
        gy = wy.astype(jnp.float32) * WIN_H + slab_y0 + rowf

        d0 = row(0) * gx + row(1) * gy + row(2)
        d1 = row(3) * gx + row(4) * gy + row(5)
        d2 = row(6) * gx + row(7) * gy + row(8)
        dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
        dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
        cov = (dmax <= 0.0) | ((dmin >= 0.0) & (sid < 0.0))
        qv = row(9) * gx + row(10) * gy + row(11)
        rv = row(12) * gx + row(13) * gy + row(14)
        z = rv / qv
        cov = cov & (z > 0.0) & (z <= 1.0) & (sid != 0.0)
        zm = jnp.where(cov, z, 0.0)  # (K, 8, 128)

        # Sequential window RMW (batch-internal conflicts resolve in order).
        for k in range(k_batch):
            y = pl.multiple_of(addr_ref[0, base + k] * WIN_H, WIN_H)
            x = pl.multiple_of(addr_ref[1, base + k] * WIN_W, WIN_W)
            live = addr_ref[3, base + k] == 1

            @pl.when(live)
            def _():
                zw = depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                zk = zm[k]
                if depth_only:
                    depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.maximum(zw, zk)
                else:
                    upd = (zk >= zw) & (zk > 0.0)
                    depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.where(
                        upd, zk, zw
                    )
                    vw = vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                    vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = jnp.where(
                        upd, addr_ref[2, base + k], vw
                    )

        return 0

    jax.lax.fori_loop(0, chunk // k_batch, batch, 0)


def rasterize_touch(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 4,
    chunk: int = 1024,
    k_batch: int = 16,
    touches_per_slab: int | None = None,
    depth_only: bool = False,
    interpret: bool = False,
):
    """Touch-expansion raster: (depth, vis) or depth-only. Correctness parity with
    raster_xla/raster_pallas (ULP-level edge differences only)."""
    if height % (num_slabs * WIN_H) or width % WIN_W:
        raise ValueError("height must split into slabs of 8-px rows; width % 128 == 0")
    slab_h = height // num_slabs
    n = setup.edge.shape[0]
    if touches_per_slab is None:
        # Ceil to chunk multiples; 2N touches/slab is generous for typical scenes
        # (the bench view needs ~0.4N per slab). Overflow is reported, never silent.
        touches_per_slab = max(4 * chunk, -(-2 * n // chunk) * chunk)

    records, addr, chunk_slab, chunk_first, true_counts = expand_touches(
        setup, width, height, num_slabs, slab_h, touches_per_slab, chunk
    )
    n_chunks = int(chunk_slab.shape[0])

    kernel = functools.partial(
        _touch_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        k_batch=k_batch,
        depth_only=depth_only,
    )
    out_shape = [jax.ShapeDtypeStruct((height, width), jnp.float32)]
    out_specs = [
        pl.BlockSpec((slab_h, width), lambda c, *_: (0, 0), memory_space=pltpu.VMEM)
    ]
    if not depth_only:
        out_shape.append(jax.ShapeDtypeStruct((height, width), jnp.int32))
        out_specs.append(
            pl.BlockSpec((slab_h, width), lambda c, *_: (0, 0), memory_space=pltpu.VMEM)
        )

    # Output block follows the chunk's slab (prefetch-driven index map).
    def out_map(c, slab_ref, first_ref):
        return (slab_ref[c], 0)

    out_specs = [
        pl.BlockSpec((slab_h, width), out_map, memory_space=pltpu.VMEM)
        for _ in out_specs
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((REC_ROWS, chunk), lambda c, *_: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, chunk), lambda c, *_: (0, c), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs if not depth_only else out_specs[:1],
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(chunk_slab, chunk_first, records, addr)
    if depth_only:
        return result[0]
    return result[0], result[1]
