"""Window-binned rasterizer — breaks the per-touch RMW latency chain.

The fused kernel (raster_fused.py) retires every staged (triangle, window) touch
with its own dynamic-offset window read-modify-write. Mosaic cannot prove two
dynamic-offset windows disjoint, so each load waits for the previous store to
retire: ~150 cycles of serialized latency per touch, independent of window size —
the round-2 parity frame's single largest cost (main raster 54 ms + CSM ~98 ms +
4xRSM inside the LPV delta; docs/ROADMAP.md "Remaining perf plan" #1).

This kernel keeps Phase A (in-kernel touch expansion — no XLA gathers) but stages
touches into PER-WINDOW bins instead of one flat list:

  Phase A: for each triangle row-strip, emit the triangle's local id into the
  SMEM bin of every (win_h x 128) window it touches. Emission is the scalar
  hot path (~45-65 cyc/touch round 3), so it does the bare minimum — count
  read, bin write, count write; the dirty-window list is NOT maintained per
  touch but rebuilt at drain time by scanning the few-hundred-entry counts
  array (nwin scalar reads per chunk, ~free).

  Phase B (end of chunk): scan counts -> dirty list, then walk it in batches
  of K windows.
    1. issue all K window loads      (no intervening stores -> independent,
                                      the ~150-cycle latencies overlap)
    2. per window, fold its binned touches into a REGISTER accumulator —
       the dependency chain per touch is a vector select, a few cycles,
       not a VMEM load-store round trip
    3. issue all K window stores     (write-only, fire and forget)

  A bin that fills mid-chunk drains immediately (single-window RMW; rare) and
  stays on the dirty list, so any touch distribution is correct at any capacity.

Windows are win_h=8 rows tall by default: the per-touch coverage/depth
evaluation then runs on a single (8, 128) vreg row instead of four, and the
extra touches from tall triangles cost vector throughput (cheap) rather than
RMW latency (expensive).

Emission stays in ascending (chunk, triangle, row, window) order per window, so
the equal-depth tie-break (highest id wins) is bit-identical to raster_xla.

Replaces the reference's hardware rasterizer for all passes (gbuffer visibility,
depth prepass, CSM/RSM depth — scene_renderer.cpp:286-365 analog); same contract
as rasterize_fused / rasterize_pallas.

Record layout: identical to raster_fused.pack_fused_records (f32 x 24, flat).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from androidrenderer_tpu.ops.raster.setup import TriangleSetup
from androidrenderer_tpu.ops.raster.raster_fused import pack_fused_records

WIN_W = 128
REC = 24


def _binned_kernel(
    count_ref,  # (1,) i32 scalar prefetch — live triangle count
    range_ref,  # (num_slabs*num_chunks,) i32 prefetch — lo | hi_excl<<16 per chunk
    recs_ref,  # (1, 1, CHUNK*24) f32 SMEM, flat records
    desc_ref,  # (1, 1, CHUNK) i32 SMEM — per-(slab, tri) emit descriptors
    *rest,  # [grid_ref,] [zlim_ref,] depth_ref, [vis_ref,] bins, counts, dirty, nd
    slab_h: int,
    width: int,
    chunk: int,
    cap: int,
    kb: int,
    depth_only: bool,
    affine_z: bool,
    win_h: int,
    unroll: int,
    pa_unroll: int,
    debug_mode: int,
    has_z_limit: bool,
    has_alpha_grid: bool,
):
    rest = list(rest)
    grid_ref = rest.pop(0) if has_alpha_grid else None
    zlim_ref = rest.pop(0) if has_z_limit else None
    depth_ref = rest.pop(0)
    vis_ref = None if depth_only else rest.pop(0)
    bins_ref, counts_ref, dirty_ref = rest

    s = pl.program_id(0)
    c = pl.program_id(1)
    ncols = width // WIN_W
    rows_per_slab = slab_h // win_h
    nwin = rows_per_slab * ncols

    @pl.when(c == 0)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)

        def ci(i, _):
            counts_ref[i] = 0
            return 0

        jax.lax.fori_loop(0, nwin + 1, ci, 0)  # +1: the dummy dead-emit row

    slab_row0 = s * rows_per_slab  # global window-row index of the slab's first row
    slab_y0 = (s * slab_h).astype(jnp.float32)
    chunk_base = c * chunk

    rowf = jax.lax.broadcasted_iota(jnp.int32, (win_h, WIN_W), 0).astype(jnp.float32)
    colf = jax.lax.broadcasted_iota(jnp.int32, (win_h, WIN_W), 1).astype(jnp.float32)

    def rd(k, i):
        return recs_ref[0, 0, k * REC + i]

    def fold_touches(row, col, cnt, zacc, vacc, zlim=None):
        """Fold a window's binned touches into register accumulators.

        The loop processes ``unroll`` touches per iteration: their evaluations
        are independent, and a tree reduce (later touch wins depth ties) feeds
        ONE combine into the loop carry — so the loop-carried dependency (which
        Mosaic round-trips through memory) amortizes over ``unroll`` touches
        instead of serializing per touch."""
        w = row * ncols + col
        gx = colf + (col * WIN_W).astype(jnp.float32)
        gy = rowf + (row * win_h).astype(jnp.float32) + slab_y0

        def eval_touch(t):
            live = t < cnt
            # Dead lanes (t >= cnt) read an in-bounds bin slot whose content may
            # be UNINITIALIZED SMEM — clamp k before any record read or the
            # offset goes out of bounds (observed as a TPU backend crash).
            k = jnp.where(live, bins_ref[w * cap + jnp.minimum(t, cap - 1)], 0)
            a0 = rd(k, 0)
            b0 = rd(k, 1)
            c0 = rd(k, 2)
            a1 = rd(k, 3)
            b1 = rd(k, 4)
            c1 = rd(k, 5)
            a2 = rd(k, 6)
            b2 = rd(k, 7)
            c2 = rd(k, 8)
            sid = jnp.where(live, rd(k, 18), 0.0)
            d0 = a0 * gx + b0 * gy + c0
            d1 = a1 * gx + b1 * gy + c1
            d2 = a2 * gx + b2 * gy + c2
            dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
            dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
            cov = ((dmax <= 0.0) & (sid != 0.0)) | ((dmin >= 0.0) & (sid < 0.0))
            if affine_z:
                z = rd(k, 12) * gx + rd(k, 13) * gy + rd(k, 14)
            else:
                qv = rd(k, 12) * gx + rd(k, 13) * gy + rd(k, 14)
                z = (rd(k, 15) * gx + rd(k, 16) * gy + rd(k, 17)) / qv
            cov = cov & (z > 0.0) & (z <= 1.0)
            if has_alpha_grid:
                # In-flight alpha test: the triangle's 16x16 barycentric alpha
                # bitmap (scene.tri_alpha_grid) — coverage drops where the
                # baked base-color alpha fails the cutoff, so masked geometry
                # resolves in ONE pass with no peel layers or texture gathers.
                sv = d0 + d1 + d2
                inv_sv = 1.0 / jnp.where(sv == 0.0, 1.0, sv)
                ui = jnp.clip((d1 * inv_sv * 16.0), 0.0, 15.0).astype(jnp.int32)
                vi = jnp.clip((d2 * inv_sv * 16.0), 0.0, 15.0).astype(jnp.int32)
                idx = vi * 16 + ui
                wsel = idx >> 5
                word = grid_ref[0, 0, k * 8]
                for wj in range(1, 8):
                    word = jnp.where(wsel == wj, grid_ref[0, 0, k * 8 + wj], word)
                bit = jnp.right_shift(word, idx & 31) & 1
                cov = cov & (bit == 1)
            if zlim is not None:
                # Depth-peeling upper bound: only fragments strictly behind the
                # previous layer survive (reversed-Z: smaller z is farther).
                cov = cov & (z < zlim)
            return jnp.where(cov, z, 0.0), chunk_base + k

        def comb(a, b):
            """Combine (z, id) pairs; b is the LATER touch and wins ties."""
            za, va = a
            zb, vb = b
            take = zb >= za
            if depth_only:
                return (jnp.maximum(za, zb), va)
            return (jnp.where(take, zb, za), jnp.where(take, vb, va))

        def block(i, carry):
            zacc, vacc = carry
            evals = [eval_touch(i * unroll + j) for j in range(unroll)]
            while len(evals) > 1:
                evals = [
                    comb(evals[p], evals[p + 1]) if p + 1 < len(evals) else evals[p]
                    for p in range(0, len(evals), 2)
                ]
            zb, vb = evals[0]
            if depth_only:
                return (jnp.maximum(zacc, zb), vacc)
            upd = (zb >= zacc) & (zb > 0.0)
            return (jnp.where(upd, zb, zacc), jnp.where(upd, vb, vacc))

        return jax.lax.fori_loop(0, pl.cdiv(cnt, unroll), block, (zacc, vacc))

    def drain_one(row, col):
        """Overflow drain: single-window load/fold/store (rare; serialized)."""
        w = row * ncols + col
        if debug_mode == 1:
            counts_ref[w] = 0
            return
        y = pl.multiple_of(row * win_h, win_h)
        x = pl.multiple_of(col * WIN_W, WIN_W)
        zacc = depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
        zlim = (
            zlim_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] if has_z_limit else None
        )
        vacc = (
            None if depth_only else vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
        )
        if debug_mode == 0:
            zacc, vacc = fold_touches(row, col, counts_ref[w], zacc, vacc, zlim)
        depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = zacc
        if not depth_only:
            vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = vacc
        counts_ref[w] = 0  # re-dirtied automatically if more touches land

    def drain_all():
        """End-of-chunk drain: K-window batches, loads before stores.

        The dirty list is rebuilt here from counts (nwin scalar reads, ~free)
        instead of being maintained per touch in emit — emission is the scalar
        hot path and the append machinery cost ~5 ops/touch."""

        def scanw(w, nd):
            dirty_ref[nd] = w
            return nd + (counts_ref[w] > 0).astype(jnp.int32)

        nd = jax.lax.fori_loop(0, nwin, scanw, 0)

        def batch(bi, _):
            base = bi * kb
            loaded = []
            for j in range(kb):
                idx = base + j
                live = idx < nd
                dw = jnp.where(live, dirty_ref[jnp.minimum(idx, nwin - 1)], 0)
                row = dw // ncols  # static divisor — compiles to shifts/mults
                col = dw - row * ncols
                y = pl.multiple_of(row * win_h, win_h)
                x = pl.multiple_of(col * WIN_W, WIN_W)
                if debug_mode == 1:  # Phase A cost only: no window traffic
                    loaded.append((live, row, col, y, x, None, None, None))
                    continue
                zacc = depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
                zlim = (
                    zlim_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
                    if has_z_limit else None
                )
                vacc = (
                    None
                    if depth_only
                    else vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
                )
                loaded.append((live, row, col, y, x, zacc, vacc, zlim))
            results = []
            for j in range(kb):
                live, row, col, y, x, zacc, vacc, zlim = loaded[j]
                w = row * ncols + col
                cnt = jnp.where(live, jnp.maximum(counts_ref[w], 0), 0)
                if debug_mode == 0:
                    zacc, vacc = fold_touches(row, col, cnt, zacc, vacc, zlim)
                elif debug_mode == 2:  # RMW traffic without the eval
                    zacc = zacc + cnt.astype(jnp.float32) * 1e-30
                results.append((live, y, x, zacc, vacc))

                @pl.when(live)
                def _(w=w):
                    counts_ref[w] = 0

            if debug_mode != 1:
                for j in range(kb):
                    live, y, x, zacc, vacc = results[j]

                    @pl.when(live)
                    def _(y=y, x=x, zacc=zacc, vacc=vacc):
                        depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = zacc
                        if not depth_only:
                            vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = vacc

            return 0

        jax.lax.fori_loop(0, pl.cdiv(nd, kb), batch, 0)

    def emit_w(w, k, real=None):
        """Branchless touch emission (the measured Phase A cost is scalar-core
        BRANCHES, not SMEM traffic — ~90 ms/frame with pl.when-based emit at
        bench scale, vs ~50 with this formulation).

        ``real=None`` emits unconditionally; a bool ``real`` redirects dead
        emits to a DUMMY bin row (index nwin) whose count grows unchecked (the
        bins write clamps to its last slot) and which is never drained — so
        conditional call sites cost a select instead of a branch. No dirty-list
        maintenance here: drain_all rebuilds it from counts (emission is the
        scalar hot path; the append machinery cost ~5 ops/touch)."""
        if real is not None:
            w = jnp.where(real, w, nwin)
        cnt = counts_ref[w]
        bins_ref[w * cap + jnp.minimum(cnt, cap - 1)] = k
        counts_ref[w] = cnt + 1

        full = cnt + 1 == cap
        if real is not None:
            full = full & real

        @pl.when(full)
        def _():
            # Rare (bin overflow): the div by the static ncols is shifts/mults.
            drain_one(w // ncols, w - (w // ncols) * ncols)

    def emit(row, col, k, real=None):
        emit_w(row * ncols + col, k, real)

    def tri_body(k, _):
        # Per-(slab, triangle) descriptor, precomputed VECTORIZED in XLA
        # (rasterize_binned): 0 = skip (invalid / no slab overlap), bit 15 =
        # big triangle (span loop below), else a SMALL triangle's first window
        # id + 1 with bit 14 = also-emit-next-column. The descriptor read
        # replaces the packed-bbox decode + slab clip + small classification
        # (~15 scalar ops) with one SMEM read + two branches; smalls are the
        # vast majority at every target, so Phase A drops to the append cost.
        d = desc_ref[0, 0, k]
        if debug_mode == 3:  # loop + desc-read floor: one write, no RMW
            bins_ref[(nwin + 1) * cap - 1] = d
            return 0

        @pl.when(d != 0)
        def _():
            small = d < (1 << 15)

            @pl.when(small)
            def _():
                w0 = (d & 0x3FFF) - 1
                emit_w(w0, k)
                emit_w(w0 + 1, k, real=(d & (1 << 14)) != 0)

            @pl.when(~small)
            def _():
                wp = rd(k, 23).astype(jnp.int32)
                ty0 = jnp.maximum(wp & 255, slab_row0)
                ty1 = jnp.minimum((wp >> 8) & 255, slab_row0 + rows_per_slab - 1)
                cx0 = (wp >> 16) & 15
                cx1 = (wp >> 20) & 15
                sid = rd(k, 18)
                bx0 = rd(k, 19)
                bx1 = rd(k, 21)
                if True:
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
                        r0 = row - slab_row0

                        def win(iw, _):
                            emit(r0, wx0 + iw, k)
                            return 0

                        jax.lax.fori_loop(0, nw, win, 0)
                        return 0

                    jax.lax.fori_loop(0, ty1 - ty0 + 1, strip, 0)

        return 0

    # Live-range windowing: [lo, hi) bounds the chunk's desc != 0 triangles for
    # THIS slab (both pa_unroll-aligned, precomputed vectorized in XLA). Chunks
    # with no slab-overlapping triangle cost nothing; frustum-culled prefixes/
    # suffixes (CSM near cascades cull most of the scene, and mesh-order ids are
    # spatially coherent) skip at zero Phase-A cost instead of a desc==0 branch
    # per triangle.
    rng = range_ref[s * pl.num_programs(1) + c]
    lo = rng & 0xFFFF
    hi = rng >> 16
    if pa_unroll > 1:
        def tri_block(i, _):
            for j in range(pa_unroll):
                tri_body(lo + i * pa_unroll + j, 0)
            return 0

        jax.lax.fori_loop(0, (hi - lo) // pa_unroll, tri_block, 0)
    else:
        jax.lax.fori_loop(lo, hi, tri_body, 0)
    # Phase B must run before the record window advances (coefficients are read
    # from the CURRENT chunk during the fold). A chunk with no live triangles
    # emitted nothing and the previous drain left counts clean, so even the
    # nwin-read dirty scan is skipped — dead chunks cost only the grid step.
    @pl.when(hi > lo)
    def _():
        drain_all()


def auto_slabs_binned(
    height: int, width: int, depth_only: bool = False, win_h: int = 8,
    with_z_limit: bool = False,
) -> int:
    """Smallest slab count satisfying the row-field and VMEM constraints.

    ``with_z_limit`` accounts for the peel-bound input block, which Mosaic may
    double-buffer (measured: 2-slab 1088x1920 peel = 16.33M scoped vmem)."""
    bytes_per_px = (4 if depth_only else 8) + (8 if with_z_limit else 0)
    # win_h >= 64 doubles the bitmask kernel's per-window scratch (lists +
    # mask tables scale with window rows): a 2-slab 2048^2 w64 depth raster
    # measured 16.04M scoped vmem against the 16M limit — shrink the
    # framebuffer budget so the slab count rises first.
    budget = (6 if win_h >= 64 else 10) * 2**20
    s = 1
    while True:
        hp = -(-height // (s * win_h)) * (s * win_h)
        slab_h = hp // s
        if slab_h <= 256 * win_h and slab_h * width * bytes_per_px <= budget:
            return s
        s += 1


def rasterize_binned(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    chunk: int = 1024,
    cap: int = 14,
    kb: int = 8,
    depth_only: bool = False,
    affine_z: bool = False,
    interpret: bool = False,
    win_h: int = 8,
    unroll: int = 4,
    pa_unroll: int = 1,  # Phase A triangles per loop iteration
    debug_mode: int = 0,  # 1 = Phase A only, 2 = RMWs without eval, 3 = scan floor
    z_limit: jnp.ndarray | None = None,  # (H, W) reversed-Z upper bound (peel)
    alpha_grid: jnp.ndarray | None = None,  # (N, 8) i32 barycentric alpha bitmaps
):
    """(depth (H, W) f32, vis (H, W) i32) — or depth only with depth_only=True.

    Heights that do not split into num_slabs x win_h rows are padded internally
    and sliced on return. Constraints: width % 128 == 0 and <= 2048 (4-bit
    window-column field); slab height <= 256 * win_h (8-bit row field);
    chunk <= 2^22 (bin entries are local ids).

    ``cap``: per-window bin capacity; overflowing bins drain immediately (still
    correct, just serialized). Small dense targets (RSM) want larger caps.
    ``kb``: windows per drain batch — all kb loads issue before any store, so
    their RMW latencies overlap.
    """
    if width % WIN_W or width > 16 * WIN_W:
        raise ValueError(f"width {width} must be a multiple of 128 and <= 2048")
    hp = -(-height // (num_slabs * win_h)) * (num_slabs * win_h)
    slab_h = hp // num_slabs
    if slab_h > 256 * win_h:
        raise ValueError(f"slab height {slab_h} exceeds the 8-bit row field")
    if hp // win_h > 255:
        raise ValueError(
            f"height {height} exceeds the packed window-bbox row field "
            f"(max {255 * win_h} at win_h={win_h})"
        )

    records = pack_fused_records(setup, affine_z=affine_z)
    # Slot 23 (pad): window-space bbox packed into one f32-exact integer
    # (ty0 | ty1<<8 | cx0<<16 | cx1<<20 < 2^24). Invalid triangles pack
    # ty0=255 > ty1=0 so the kernel's slab test skips them for free.
    bbox = setup.bbox
    ty0 = bbox[:, 1].astype(jnp.int32) // win_h
    ty1 = bbox[:, 3].astype(jnp.int32) // win_h
    cx0 = bbox[:, 0].astype(jnp.int32) // WIN_W
    cx1 = bbox[:, 2].astype(jnp.int32) // WIN_W
    wpack = ty0 + (ty1 << 8) + (cx0 << 16) + (cx1 << 20)
    live = setup.valid & (records[:, 18] != 0.0)
    wpack = jnp.where(live, wpack, 255)
    records = records.at[:, 23].set(wpack.astype(jnp.float32))
    n = records.shape[0]
    count = jnp.int32(n)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n
    if pad:
        records = jnp.pad(records, ((0, pad), (0, 0)))
    records = records.reshape(num_chunks, 1, chunk * REC)

    ncols = width // WIN_W
    nwin = (slab_h // win_h) * ncols

    # Per-(slab, triangle) emit descriptors, computed VECTORIZED here so the
    # kernel's scalar Phase A skips the bbox decode / slab clip / small
    # classification entirely: 0 = skip, bit 15 = big-triangle span path,
    # else (first window id + 1) | (emit-second-column << 14). Smalls (1
    # window row, <= 2 columns) are the vast majority at every target.
    rows_per_slab = slab_h // win_h
    slab0 = (jnp.arange(num_slabs, dtype=jnp.int32) * rows_per_slab)[:, None]
    ty0v = ty0[None, :]
    ty1v = ty1[None, :]
    in_slab = live[None, :] & (ty1v >= slab0) & (ty0v <= slab0 + rows_per_slab - 1)
    small = (ty0v == ty1v) & ((cx1 - cx0) <= 1)[None, :]
    w0 = (ty0v - slab0) * ncols + cx0[None, :]
    two = (cx1 > cx0)[None, :].astype(jnp.int32)
    desc = jnp.where(
        in_slab,
        jnp.where(small, (w0 + 1) | (two << 14), 1 << 15),
        0,
    ).astype(jnp.int32)
    if pad:
        desc = jnp.pad(desc, ((0, 0), (0, pad)))
    desc = desc.reshape(num_slabs * num_chunks, 1, chunk)

    # Per-(slab, chunk) live range lo | hi_excl<<16, pa_unroll-aligned (chunk is
    # a power-of-two multiple of pa_unroll, so rounding hi up stays <= chunk).
    if pa_unroll & (pa_unroll - 1) or chunk % pa_unroll:
        raise ValueError("pa_unroll must be a power of two dividing chunk")
    live_d = desc[:, 0, :] != 0  # (S*C, chunk)
    kidx = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    lo = jnp.min(jnp.where(live_d, kidx, chunk), axis=-1)
    hi = jnp.max(jnp.where(live_d, kidx + 1, 0), axis=-1)
    lo = jnp.minimum(lo & ~(pa_unroll - 1), hi)
    hi = -(-hi // pa_unroll) * pa_unroll
    ranges = (lo | (hi << 16)).astype(jnp.int32)

    kernel = functools.partial(
        _binned_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        cap=cap,
        kb=kb,
        depth_only=depth_only,
        affine_z=affine_z,
        win_h=win_h,
        unroll=unroll,
        pa_unroll=pa_unroll,
        debug_mode=debug_mode,
        has_z_limit=z_limit is not None,
        has_alpha_grid=alpha_grid is not None,
    )

    out_shape = [jax.ShapeDtypeStruct((hp, width), jnp.float32)]
    out_specs = [
        pl.BlockSpec((slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM)
    ]
    if not depth_only:
        out_shape.append(jax.ShapeDtypeStruct((hp, width), jnp.int32))
        out_specs.append(
            pl.BlockSpec(
                (slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM
            )
        )

    scratch = [
        pltpu.SMEM(((nwin + 1) * cap,), jnp.int32),  # bins (+1 dummy row)
        pltpu.SMEM((nwin + 1,), jnp.int32),  # counts (0 = clean)
        pltpu.SMEM((nwin + 1,), jnp.int32),  # dirty window list (raw w index)
    ]
    in_specs = [
        pl.BlockSpec(
            (1, 1, chunk * REC), lambda s, c, *_: (c, 0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, 1, chunk),
            lambda s, c, *_: (s * num_chunks + c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    inputs = [records, desc]
    if alpha_grid is not None:
        ag = alpha_grid.astype(jnp.int32)
        if pad:
            ag = jnp.pad(ag, ((0, pad), (0, 0)))
        in_specs.append(
            pl.BlockSpec(
                (1, 1, chunk * 8), lambda s, c, *_: (c, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(ag.reshape(num_chunks, 1, chunk * 8))
    if z_limit is not None:
        zl = z_limit
        if zl.shape[0] != hp:
            zl = jnp.pad(zl, ((0, hp - zl.shape[0]), (0, 0)))
        in_specs.append(
            pl.BlockSpec(
                (slab_h, width), lambda s, c, *_: (s, 0), memory_space=pltpu.VMEM
            )
        )
        inputs.append(zl)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_slabs, num_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(count[None], ranges, *inputs)
    if depth_only:
        return result[0][:height]
    return result[0][:height], result[1][:height]
