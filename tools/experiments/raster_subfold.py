"""Sub-block lane-fold rasterizer — win32 tables, win8 vector work.

The two measured walls of the raster kernels, and what each design fixed:

  * raster_bitmask (production): win32 window tables keep the XLA prep and the
    touch count low (178k touches / 20 MB of words at bench scale), but the
    fold evaluates every touch on the FULL (32, 128) window — ~15 logical
    vector ops x 4 vregs + ~13 dependent scalar SMEM coefficient loads
    ≈ 100+ cycles per touch, even though the median bench triangle is 3 px
    tall and covers one eighth of the window's rows.
  * raster_lanes (design study): the 8-touch sublane-batched fold cut vector
    issue to ~15 ops per 8 touches per row (~50 cyc/touch all-in, measured),
    but its win_h=8 TABLES inflated the dense bitmask prep 4x (79 MB) and
    touch count 4.75x — floor-bound at 173 ms before any fold ran.

This kernel composes the two winning halves:

  * Tables stay win32 (raster_bitmask's build_window_masks, byte-for-byte the
    same prep — ~5.5 ms/frame measured across all rasters).
  * The scalar ctz list build splits each window's touches into FOUR
    sub-block lists (8 pixel rows each) using a per-triangle packed y-bbox
    side table (SMEM, 2 loads + ~6 ALU + 4 predicated stores per touch,
    ~+12 cyc on the ~10-cyc build). A touch lands only in the lists of
    sub-blocks its bbox rows overlap — tall touches appear in several
    (bench-scale average ~1.3x), short ones in one.
  * Each non-empty sub-block list folds with the lanes scheme: 8 touches per
    issued instruction (coefficients as (8, 32) VMEM row blocks, sublane s =
    touch s), per-row slot accumulators, one 3-step sublane rotate reduce at
    sub-block end, then a conditional (8, 128) merge-store. Empty sub-blocks
    cost two scalar compares.

MEASURED NEGATIVE (v5e, bench main view, 310k tris; tools/bench_raster.py):
56.99 ms vs rasterize_bitmask's 25.38. Decomposition via debug_mode:
DMA + dirty-scan floor (d3) 15.9 ms, + list build (d1) 23.7 ms — the NSB
predicated stores per touch cost ~8 ms, i.e. nearly the production kernel's
entire list+fold budget — and the sub-block folds add the remaining 33 ms
(~135 cyc/touch all-in). The per-touch vector savings (1 vreg vs 4) are
swamped by per-fold fixed overhead: ragged 8-touch batches on ~24-entry
lists, 16 carried accumulator vregs round-tripping through memory each
fori step (the known Mosaic vector-carry behavior), the 3-step sublane
reduce per sub-block, and 8 serial dynamic record-row loads per batch.
Kept as a tested design study: any future fold redesign should batch
RECORDS into lanes only if accumulators can live in registers across the
batch loop (they cannot, today) — otherwise win32 full-window eval with
scalar coefficient broadcast remains the cheapest fold on this hardware.

Correctness contract: identical tables and touch walk order as
rasterize_bitmask; eval formulas match raster_lanes (A0 + (b0*yr + c0)
association), so output matches rasterize_binned up to FMA-contraction ULPs
on depth, with visibility flips only where depth differs (the raster_xla
ULP-edge contract; tests/test_raster_subfold.py). Tie-break = lexicographic
(z, id) max = binned's ordered later-id-wins fold. The opaque/masked
two-ended split runs the alpha-bitmap eval only over the masked segment.

Replaces the reference's hardware rasterizer (scene_renderer.cpp:286-365
analog) like the binned kernel; same call contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from androidrenderer_tpu.ops.raster.setup import TriangleSetup
from androidrenderer_tpu.ops.raster.raster_bitmask import (
    _ctz32,
    build_window_masks,
)
from androidrenderer_tpu.ops.raster.records import LREC, pack_lane_records

WIN_W = 128
WIN_H = 32  # window height (tables, RMW granularity)
SB = 8  # sub-block height (fold granularity)
NSB = WIN_H // SB


def _subfold_kernel(
    pref_ref,  # (S + S*C,) i32 scalar prefetch: [live chunks per slab, perm]
    recs_ref,  # (1, CHUNK, 32) f32 VMEM lane records
    ybox_ref,  # (1, 1, CHUNK) i32 SMEM — packed y0 | (y1 << 16) pixel bbox
    words_ref,  # (1, 1, NWIN*wpc) i32 SMEM — per-window triangle bitmask words
    ww_ref,  # (1, 1, NWIN) i32 SMEM — per-window nonzero-word bitmask
    dw_ref,  # (1, 1, ceil(NWIN/32)) i32 SMEM — dirty-window bitmask
    *rest,  # [mb_ref,] [zlim_ref,] depth_ref, [vis_ref,] list_a, list_b, dirty
    slab_h: int,
    width: int,
    chunk: int,
    kb: int,
    unroll: int,
    depth_only: bool,
    affine_z: bool,
    has_z_limit: bool,
    has_alpha_grid: bool,
    num_slabs: int,
    num_chunks: int,
    debug_mode: int = 0,
):
    rest = list(rest)
    mb_ref = rest.pop(0) if has_alpha_grid else None
    zlim_ref = rest.pop(0) if has_z_limit else None
    depth_ref = rest.pop(0)
    vis_ref = None if depth_only else rest.pop(0)
    list_a, list_b, dirty_ref = rest

    s = pl.program_id(0)
    c = pl.program_id(1)
    ncols = width // WIN_W
    rows_per_slab = slab_h // WIN_H
    nwin = rows_per_slab * ncols
    wpc = chunk // 32
    cmask = chunk - 1  # chunk is a power of two; keeps stale list slots in-bounds
    dump = NSB * chunk  # rejected predicated stores land here (extra slot)

    @pl.when(c == 0)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)

    # Dead-chunk skipping (see raster_bitmask): step c handles the c-th LIVE
    # chunk via the prefetched live-first permutation.
    nl = pref_ref[s]

    lanef = jax.lax.broadcasted_iota(jnp.int32, (SB, WIN_W), 1).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SB, 1), 0)
    row_masks = [sub == r for r in range(SB)]
    slab_y0 = pl.program_id(0) * slab_h

    def build_list(w, wy, live, list_ref):
        """Scalar ctz scan -> per-sub-block two-ended lists.

        Returns (o0..o3, m0..m3): opaque/masked counts per sub-block. Each
        touch reads its packed pixel y-bbox (1 SMEM load), computes the
        covered sub-block range relative to the window top, and issues NSB
        predicated stores (rejected ones land in the dump slot) — branchless,
        ~12 extra cycles over the plain build."""

        def body(k, st, mf):
            yb = ybox_ref[0, 0, k]
            y0p = yb & 0xFFFF
            y1p = yb >> 16
            g0 = jnp.maximum((y0p - wy) >> 3, 0)
            g1 = jnp.minimum((y1p - wy) >> 3, NSB - 1)
            out = []
            for g in range(NSB):
                o, m = st[2 * g], st[2 * g + 1]
                pred = (g0 <= g) & (g <= g1)
                if has_alpha_grid:
                    at = jnp.where(mf, chunk - 1 - m, o)
                    list_ref[jnp.where(pred, g * chunk + at, dump)] = k
                    out.append(o + jnp.where(pred & ~mf, 1, 0))
                    out.append(m + jnp.where(pred & mf, 1, 0))
                else:
                    list_ref[jnp.where(pred, g * chunk + o, dump)] = k
                    out.append(o + jnp.where(pred, 1, 0))
                    out.append(m)
            return tuple(out)

        def outer(state):
            www = state[0]
            j = _ctz32(www)
            word0 = words_ref[0, 0, w * wpc + j]

            def inner(st):
                bits = st[0]
                b = _ctz32(bits)
                k = j * 32 + b
                if has_alpha_grid:
                    mf = ((mb_ref[0, 0, j] >> b) & 1) != 0
                else:
                    mf = False
                return (bits & (bits - 1),) + body(k, st[1:], mf)

            st = jax.lax.while_loop(
                lambda st: st[0] != 0, inner, (word0,) + state[1:]
            )
            return (www & (www - 1),) + st[1:]

        zero = jnp.int32(0)
        # Dead batch slots walk a zeroed ww word: zero counts, no folds.
        init = (jnp.where(live, ww_ref[0, 0, w], 0),) + (zero,) * (2 * NSB)
        final = jax.lax.while_loop(lambda st: st[0] != 0, outer, init)
        return final[1:]

    def fold_sub(g, col, wy, n_op, n_mk, zacc8, vacc8, list_ref, zlim8):
        """Lane-batched fold of sub-block g's list; returns the merged
        (8, 128) tile. raster_lanes' fold with the list segment based at
        g*chunk; the masked segment walks from the top end with the
        alpha-bitmap eval."""
        gx = lanef + (col * WIN_W).astype(jnp.float32)
        wy0 = (wy + g * SB).astype(jnp.float32)

        if zlim8 is not None:
            zlim_rows = [
                jnp.broadcast_to(zlim8[r : r + 1, :], (SB, WIN_W))
                for r in range(SB)
            ]

        def eval_batch(base, cnt, with_alpha, reverse):
            rows = []
            for j in range(8):
                t = base + j
                if reverse:
                    idx = g * chunk + ((chunk - 1 - t) & cmask)
                else:
                    idx = g * chunk + jnp.minimum(t, chunk - 1)
                k = list_ref[idx] & cmask
                rows.append(recs_ref[0, pl.ds(k, 1), :])
            cb = jnp.concatenate(rows, axis=0)  # (8, 32)
            a0 = cb[:, 0:1]
            b0 = cb[:, 1:2]
            c0 = cb[:, 2:3]
            a1 = cb[:, 3:4]
            b1 = cb[:, 4:5]
            c1 = cb[:, 5:6]
            a2 = cb[:, 6:7]
            b2 = cb[:, 7:8]
            c2 = cb[:, 8:9]
            aq = cb[:, 9:10]
            bq = cb[:, 10:11]
            cq = cb[:, 11:12]
            sid = cb[:, 15:16]
            idv = cb[:, 16:17].astype(jnp.int32)
            live = ((base + sub) < cnt) & (sid != 0.0)
            double = live & (sid < 0.0)
            A0 = a0 * gx
            A1 = a1 * gx
            A2 = a2 * gx
            AQ = aq * gx
            if not affine_z:
                ar = cb[:, 12:13]
                br = cb[:, 13:14]
                cr = cb[:, 14:15]
                AR = ar * gx
            if with_alpha:
                gwords = [
                    jax.lax.bitcast_convert_type(cb[:, 17 + j : 18 + j], jnp.int32)
                    for j in range(8)
                ]
            zs = []
            vs = []
            for r in range(SB):
                yr = wy0 + jnp.float32(r)
                d0 = A0 + (b0 * yr + c0)
                d1 = A1 + (b1 * yr + c1)
                d2 = A2 + (b2 * yr + c2)
                dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
                dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
                cov = ((dmax <= 0.0) & live) | ((dmin >= 0.0) & double)
                if affine_z:
                    z = AQ + (bq * yr + cq)
                else:
                    qv = AQ + (bq * yr + cq)
                    z = (AR + (br * yr + cr)) / qv
                cov = cov & (z > 0.0) & (z <= 1.0)
                if with_alpha:
                    sv = d0 + d1 + d2
                    inv_sv = 1.0 / jnp.where(sv == 0.0, 1.0, sv)
                    ui = jnp.clip(d1 * inv_sv * 16.0, 0.0, 15.0).astype(jnp.int32)
                    vi = jnp.clip(d2 * inv_sv * 16.0, 0.0, 15.0).astype(jnp.int32)
                    idx = vi * 16 + ui
                    wsel = idx >> 5
                    word = gwords[0]
                    for wj in range(1, 8):
                        word = jnp.where(wsel == wj, gwords[wj], word)
                    bit = jnp.right_shift(word, idx & 31) & 1
                    cov = cov & (bit == 1)
                if zlim8 is not None:
                    cov = cov & (z < zlim_rows[r])
                zs.append(jnp.where(cov, z, 0.0))
                vs.append(idv)
            return zs, vs

        def lex(za, va, zb, vb):
            if depth_only:
                return jnp.maximum(za, zb), va
            take = (zb > za) | ((zb == za) & (vb > va))
            return jnp.where(take, zb, za), jnp.where(take, vb, va)

        def make_block(cnt, with_alpha, reverse):
            def block(i, carry):
                accs_z, accs_v = carry
                evals = [
                    eval_batch((i * unroll + u) * 8, cnt, with_alpha, reverse)
                    for u in range(unroll)
                ]
                while len(evals) > 1:
                    nxt = []
                    for p in range(0, len(evals), 2):
                        if p + 1 == len(evals):
                            nxt.append(evals[p])
                            continue
                        (za, va), (zb, vb) = evals[p], evals[p + 1]
                        merged = [
                            lex(za[r], va[r], zb[r], vb[r]) for r in range(SB)
                        ]
                        nxt.append(
                            ([m[0] for m in merged], [m[1] for m in merged])
                        )
                    evals = nxt
                zs, vs = evals[0]
                out = [
                    lex(accs_z[r], accs_v[r], zs[r], vs[r]) for r in range(SB)
                ]
                return (
                    tuple(o[0] for o in out),
                    tuple(o[1] for o in out),
                )

            return block

        accs_z = tuple(jnp.zeros((SB, WIN_W), jnp.float32) for _ in range(SB))
        accs_v = tuple(jnp.full((SB, WIN_W), -1, jnp.int32) for _ in range(SB))
        accs = (accs_z, accs_v)
        accs = jax.lax.fori_loop(
            0, pl.cdiv(n_op, 8 * unroll), make_block(n_op, False, False), accs
        )
        if has_alpha_grid:
            accs = jax.lax.fori_loop(
                0, pl.cdiv(n_mk, 8 * unroll), make_block(n_mk, True, True), accs
            )
        accs_z, accs_v = accs

        # Reduce each row's 8 slot accumulators (lex over sublanes), assemble
        # the (8, 128) sub-block tile, merge with the framebuffer slice
        # (current-chunk ids exceed all stored ids: >= keeps binned's
        # later-chunk-wins-ties semantics).
        wz = jnp.zeros((SB, WIN_W), jnp.float32)
        wv = jnp.full((SB, WIN_W), -1, jnp.int32)
        for r in range(SB):
            az, av = accs_z[r], accs_v[r]
            for sh in (4, 2, 1):
                oz = jnp.concatenate([az[sh:], az[:sh]], axis=0)
                if depth_only:
                    az = jnp.maximum(az, oz)
                else:
                    ov = jnp.concatenate([av[sh:], av[:sh]], axis=0)
                    take = (oz > az) | ((oz == az) & (ov > av))
                    az = jnp.where(take, oz, az)
                    av = jnp.where(take, ov, av)
            wz = jnp.where(row_masks[r], az, wz)
            if not depth_only:
                wv = jnp.where(row_masks[r], av, wv)
        upd = (wz >= zacc8) & (wz > 0.0)
        zout = jnp.where(upd, wz, zacc8)
        if depth_only:
            return zout, vacc8
        return zout, jnp.where(upd, wv, vacc8)  # lane 16 carries GLOBAL ids

    # Dirty-window list from the XLA dirty bitmask (see raster_bitmask).
    nw_words = -(-nwin // 32)

    def scan_word(wj, nd):
        def inner(st):
            bits, nd2 = st
            b = _ctz32(bits)
            dirty_ref[nd2] = wj * 32 + b
            return (bits & (bits - 1), nd2 + 1)

        bits0 = jnp.where(c < nl, dw_ref[0, 0, wj], 0)
        _, nd = jax.lax.while_loop(lambda st: st[0] != 0, inner, (bits0, nd))
        return nd

    if debug_mode == 4:
        return
    nd = jax.lax.fori_loop(0, nw_words, scan_word, 0)
    if debug_mode == 3:
        list_a[0] = nd
        return

    def batch(bi, _):
        base = bi * kb
        loaded = []
        for j in range(kb):
            idx = base + j
            live = idx < nd
            wv = jnp.where(live, dirty_ref[jnp.minimum(idx, nwin - 1)], 0)
            row = wv // ncols  # static divisor — shifts/mults
            col = wv - row * ncols
            y = pl.multiple_of(row * WIN_H, WIN_H)
            x = pl.multiple_of(col * WIN_W, WIN_W)
            zacc = depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
            zlim = (
                zlim_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] if has_z_limit else None
            )
            vacc = (
                None if depth_only else vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
            )
            loaded.append((live, wv, row, col, y, x, zacc, vacc, zlim))
        for j in range(kb):
            live, wv, row, col, y, x, zacc, vacc, zlim = loaded[j]
            list_ref = list_a if j % 2 == 0 else list_b
            wy = slab_y0 + row * WIN_H  # global window-top pixel row
            counts = build_list(wv, wy, live, list_ref)
            if debug_mode == 1:
                # List-build floor: consume the counts, skip all folds.
                list_ref[dump] = sum(counts[: 2 * NSB])
                continue
            for g in range(NSB):
                n_op = counts[2 * g]
                n_mk = counts[2 * g + 1]

                @pl.when(n_op + n_mk > 0)
                def _(g=g, col=col, wy=wy, n_op=n_op, n_mk=n_mk,
                      zacc=zacc, vacc=vacc, zlim=zlim, list_ref=list_ref,
                      y=y, x=x):
                    z8, v8 = fold_sub(
                        g, col, wy, n_op, n_mk,
                        zacc[g * SB : (g + 1) * SB],
                        None if depth_only else vacc[g * SB : (g + 1) * SB],
                        list_ref,
                        None if zlim is None else zlim[g * SB : (g + 1) * SB],
                    )
                    yg = pl.multiple_of(y + g * SB, SB)
                    depth_ref[pl.ds(yg, SB), pl.ds(x, WIN_W)] = z8
                    if not depth_only:
                        vis_ref[pl.ds(yg, SB), pl.ds(x, WIN_W)] = v8

        return 0

    jax.lax.fori_loop(0, pl.cdiv(nd, kb), batch, 0)


def auto_slabs_subfold(
    height: int, width: int, depth_only: bool = False,
    with_z_limit: bool = False,
) -> int:
    """Smallest slab count satisfying the row-field and VMEM constraints
    (the lane-record block adds 2 x chunk x 32 x 4 B on top of the slab)."""
    bytes_per_px = (4 if depth_only else 8) + (4 if with_z_limit else 0)
    budget = 10 * 2**20 - 2 * 1024 * LREC * 4
    s = 1
    while True:
        hp = -(-height // (s * WIN_H)) * (s * WIN_H)
        slab_h = hp // s
        if slab_h <= 255 * WIN_H and slab_h * width * bytes_per_px <= budget:
            return s
        s += 1


def rasterize_subfold(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    chunk: int = 1024,
    kb: int = 4,
    unroll: int = 1,
    depth_only: bool = False,
    affine_z: bool = False,
    interpret: bool = False,
    z_limit: jnp.ndarray | None = None,
    alpha_grid: jnp.ndarray | None = None,
    debug_mode: int = 0,  # 1 = build lists only, 3 = DMA+scan floor, 4 = DMA floor
):
    """(depth (H, W) f32, vis (H, W) i32) — same contract as rasterize_binned;
    matches it up to FMA-contraction ULPs on edge/depth evaluation (vis may
    flip only where depth differs — the raster_xla ULP-edge contract)."""
    if width % WIN_W or width > 16 * WIN_W:
        raise ValueError(f"width {width} must be a multiple of 128 and <= 2048")
    if chunk & (chunk - 1) or chunk > 1024 or chunk < 32:
        raise ValueError("chunk must be a power of two in [32, 1024]")
    hp = -(-height // (num_slabs * WIN_H)) * (num_slabs * WIN_H)
    slab_h = hp // num_slabs
    if hp // WIN_H > 255:
        raise ValueError(
            f"height {height} exceeds the packed window-bbox row field "
            f"(max {255 * WIN_H} at win_h={WIN_H})"
        )

    records, live = pack_lane_records(
        setup, affine_z=affine_z, alpha_grid=alpha_grid
    )
    n = records.shape[0]
    if n >= (1 << 24):
        raise ValueError("triangle ids must stay f32-exact (< 2^24)")

    # The bitmask prep consumes the BINNED record layout (see raster_lanes).
    from androidrenderer_tpu.ops.raster.raster_fused import pack_fused_records

    brecords = pack_fused_records(setup, affine_z=affine_z)
    bbox = setup.bbox
    ty0 = bbox[:, 1].astype(jnp.int32) // WIN_H
    ty1 = bbox[:, 3].astype(jnp.int32) // WIN_H
    wpack = ty0 + (ty1 << 8)
    wpack = jnp.where(live, wpack, 255)
    brecords = brecords.at[:, 23].set(wpack.astype(jnp.float32))

    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n

    words, ww, _cnt, dw = build_window_masks(
        brecords, live, hp, width, WIN_H, num_slabs, chunk
    )

    # Packed pixel y-bbox side table (SMEM): the list build derives each
    # touch's covered sub-blocks from it. Clamped to the padded framebuffer.
    y0p = jnp.clip(bbox[:, 1], 0.0, hp - 1.0).astype(jnp.int32)
    y1p = jnp.clip(bbox[:, 3], 0.0, hp - 1.0).astype(jnp.int32)
    ybox = y0p | (y1p << 16)
    if pad:
        ybox = jnp.pad(ybox, (0, pad))
    ybox = ybox.reshape(num_chunks, 1, chunk)

    # Live-first chunk permutation per slab (see raster_bitmask).
    live_sc = jnp.any(dw.reshape(num_slabs, num_chunks, -1) != 0, axis=-1)
    liv = live_sc.astype(jnp.int32)
    nl = jnp.sum(liv, axis=1)
    pos = jnp.cumsum(liv, axis=1) - 1
    slot = jnp.where(live_sc, pos, num_chunks - 1)
    perm = (
        jnp.zeros((num_slabs, num_chunks), jnp.int32)
        .at[jnp.arange(num_slabs)[:, None], slot]
        .set(
            jnp.broadcast_to(
                jnp.arange(num_chunks, dtype=jnp.int32)[None],
                (num_slabs, num_chunks),
            ),
            mode="drop",
        )
    )
    prefetch = jnp.concatenate([nl.astype(jnp.int32), perm.reshape(-1)])

    mb_blocks = None
    if alpha_grid is not None:
        # Per-chunk masked-triangle bitmask: the two-ended list build reads
        # each touch's masked flag from it (records live in VMEM, not
        # scalar-addressable).
        masked_tri = jnp.any(alpha_grid.astype(jnp.int32) != -1, axis=1) & live
        mt = masked_tri.astype(jnp.int32)
        if pad:
            mt = jnp.pad(mt, (0, pad))
        mt = mt.reshape(num_chunks, chunk // 32, 32)
        stride = 1
        width_now = 32
        while width_now > 1:
            mt = mt[..., 0::2] | (mt[..., 1::2] << stride)
            stride *= 2
            width_now //= 2
        mb_blocks = mt[..., 0].reshape(num_chunks, 1, chunk // 32)

    if pad:
        records = jnp.pad(records, ((0, pad), (0, 0)))
    records = records.reshape(num_chunks, chunk, LREC)

    ncols = width // WIN_W
    nwin = (slab_h // WIN_H) * ncols

    kernel = functools.partial(
        _subfold_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        kb=kb,
        unroll=unroll,
        depth_only=depth_only,
        affine_z=affine_z,
        has_z_limit=z_limit is not None,
        has_alpha_grid=alpha_grid is not None,
        num_slabs=num_slabs,
        num_chunks=num_chunks,
        debug_mode=debug_mode,
    )

    def _cp(s, c, pref):
        nl_s = pref[s]
        return pref[
            num_slabs + s * num_chunks + jnp.minimum(c, jnp.maximum(nl_s - 1, 0))
        ]

    chunk_block = lambda s, c, pref: (_cp(s, c, pref), 0, 0)
    slabchunk_block = lambda s, c, pref: (s * num_chunks + _cp(s, c, pref), 0, 0)

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

    in_specs = [
        pl.BlockSpec((1, chunk, LREC), chunk_block, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, chunk), chunk_block, memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, 1, nwin * (chunk // 32)), slabchunk_block, memory_space=pltpu.SMEM
        ),
        pl.BlockSpec((1, 1, nwin), slabchunk_block, memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, 1, -(-nwin // 32)), slabchunk_block, memory_space=pltpu.SMEM
        ),
    ]
    inputs = [records, ybox, words, ww, dw]
    if alpha_grid is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, chunk // 32), chunk_block, memory_space=pltpu.SMEM)
        )
        inputs.append(mb_blocks)
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
        num_scalar_prefetch=1,
        grid=(num_slabs, num_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((NSB * chunk + 1,), jnp.int32),  # lists (even batch slots)
            pltpu.SMEM((NSB * chunk + 1,), jnp.int32),  # lists (odd batch slots)
            pltpu.SMEM((nwin + 1,), jnp.int32),  # dirty window list
        ],
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(prefetch, *inputs)
    if depth_only:
        return result[0][:height]
    return result[0][:height], result[1][:height]
