"""Sublane-batched rasterizer — vectorizes the fold ACROSS triangles.

Round-3 finding (tools/session_measure.sh + /tmp prototypes, v5e): with the
bitmask prep (raster_bitmask.build_window_masks) Phase A is gone, and the
per-touch fold is the wall at ~370-400 cycles/touch — ~12 dependent scalar
SMEM coefficient loads plus ~120 per-touch vector instructions (the win32
window is 4 vregs and every logical op issues once per vreg). unroll/kb/win_h
sweeps cannot move it: the cost is per-touch instruction ISSUE, not RMW
latency (that was round 2's wall, killed by window binning) and not Phase A
(round 3's wall, killed by the bitmask prep).

This kernel inverts the fold's layout so EIGHT touches share every issued
instruction:

  * records live in VMEM, one 32-lane row per triangle; a batch of 8 touches
    is fetched as 8 dynamic-offset (1, 32) row loads concatenated into an
    (8, 32) coefficient block (measured ~8 cyc/touch — dynamic sublane-offset
    loads are cheap; it is SCALAR loads that cost).
  * the window is win_h=8 pixel rows x 128 columns. For each row y the batch
    evaluates all 8 touches at once on an (8, 128) vreg — sublane s = touch s,
    lane x = pixel x — via (8,1)-slice x (8,128) broadcast FMAs. Per-row
    per-slot accumulators (z, id) defer ALL cross-touch reduction.
  * at window end, each row's 8 slot-accumulators reduce with a 3-step
    sublane rotate (lexicographic (z, id) max — order-independent, so slot
    grouping cannot change the result), rows assemble into the (8, 128)
    window tile, and one batched RMW merges it into the slab framebuffer
    (loads-before-stores across kb windows, as in raster_binned).

Measured (v5e, bench view 1088x1920, 310k tris, session 5): the fold itself
delivers — fold loop 15 ms + final reduce 19 ms + list builds 10 ms for 846k
win8 touches (~50 cyc/touch all-in vs 376 for the scalar-coefficient fold) —
but the KERNEL IS FLOOR-BOUND at 173 ms total: debug_mode=5 (grid + block DMA
+ XLA prep only, nothing scalar) is 126 ms. win_h=8 inflates the dense
bitmask table 4x vs win32 (79 MB vs 20 MB per raster: bits = windows x
triangles), and tall bench triangles inflate touches 4.75x (846k vs 178k).
The lanes-FOLD idea survives; the win8 TABLES do not. See raster_bitmask for
the production win32 variant that adopted the vector-row coefficient
broadcast (this file is kept as the measured design study + its tests).

Tie-break semantics: lexicographic (z, id) max == raster_binned's ordered
later-id-wins fold (ids ascend in emission order), so output matches the
binned kernel up to FMA-contraction ULPs on edge/depth evaluation (the
raster_xla ULP-edge contract; tests/test_raster_lanes.py).

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

from androidrenderer_tpu.ops.raster.records import (  # noqa: F401
    LREC, WIN_W, pack_lane_records,
)

WIN_H = 8  # fixed: per-row slot accumulators are 8 (8,128) vreg pairs


def _lanes_kernel(
    count_ref,  # (1,) i32 scalar prefetch (ABI parity; unused)
    recs_ref,  # (1, CHUNK, 32) f32 VMEM — lane records
    words_ref,  # (1, 1, NWIN*wpc) i32 SMEM — per-window triangle bitmask words
    ww_ref,  # (1, 1, NWIN) i32 SMEM — per-window nonzero-word bitmask
    cnt_ref,  # (1, 1, NWIN) i32 SMEM — per-window exact touch count
    *rest,  # [zlim_ref,] depth_ref, [vis_ref,] list_a, list_b, dirty
    slab_h: int,
    width: int,
    chunk: int,
    kb: int,
    unroll: int,
    depth_only: bool,
    affine_z: bool,
    has_z_limit: bool,
    has_alpha_grid: bool,
    debug_mode: int,
):
    rest = list(rest)
    zlim_ref = rest.pop(0) if has_z_limit else None
    depth_ref = rest.pop(0)
    vis_ref = None if depth_only else rest.pop(0)
    list_a, list_b, dirty_ref = rest

    c = pl.program_id(1)
    ncols = width // WIN_W
    rows_per_slab = slab_h // WIN_H
    nwin = rows_per_slab * ncols
    wpc = chunk // 32
    cmask = chunk - 1  # chunk is a power of two; keeps stale list slots in-bounds

    @pl.when(c == 0)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)

    lanef = jax.lax.broadcasted_iota(jnp.int32, (8, WIN_W), 1).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row_masks = [sub == r for r in range(WIN_H)]
    slab_y0 = (pl.program_id(0) * slab_h).astype(jnp.float32)

    def build_list(w, list_ref):
        """Scalar ctz scan (see raster_bitmask): ww -> words -> set bits."""

        def outer(state):
            www, n = state
            j = _ctz32(www)
            word0 = words_ref[0, 0, w * wpc + j]

            def inner(st):
                bits, n2 = st
                b = _ctz32(bits)
                list_ref[n2] = j * 32 + b
                return (bits & (bits - 1), n2 + 1)

            _, n = jax.lax.while_loop(lambda st: st[0] != 0, inner, (word0, n))
            return (www & (www - 1), n)

        jax.lax.while_loop(
            lambda st: st[0] != 0, outer, (ww_ref[0, 0, w], 0)
        )

    def fold_lanes(row, col, cnt, zacc, vacc, list_ref, zlim):
        """Fold the window's listed touches, 8 per issued instruction."""
        gx = lanef + (col * WIN_W).astype(jnp.float32)
        wy0 = (row * WIN_H).astype(jnp.float32) + slab_y0

        if zlim is not None:
            zlim_rows = [
                jnp.broadcast_to(zlim[r : r + 1, :], (8, WIN_W))
                for r in range(WIN_H)
            ]

        def eval_batch(base):
            """(zs, vs): per-row (8,128) candidates for touches base..base+7."""
            rows = []
            for j in range(8):
                k = list_ref[jnp.minimum(base + j, chunk - 1)] & cmask
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
            if has_alpha_grid:
                gwords = [
                    jax.lax.bitcast_convert_type(cb[:, 17 + j : 18 + j], jnp.int32)
                    for j in range(8)
                ]
            zs = []
            vs = []
            for r in range(WIN_H):
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
                if has_alpha_grid:
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
                if zlim is not None:
                    cov = cov & (z < zlim_rows[r])
                zs.append(jnp.where(cov, z, 0.0))
                vs.append(idv)
            return zs, vs

        def lex(za, va, zb, vb):
            if depth_only:
                return jnp.maximum(za, zb), va
            take = (zb > za) | ((zb == za) & (vb > va))
            return jnp.where(take, zb, za), jnp.where(take, vb, va)

        def block(i, carry):
            accs_z, accs_v = carry
            evals = [eval_batch((i * unroll + u) * 8) for u in range(unroll)]
            while len(evals) > 1:
                nxt = []
                for p in range(0, len(evals), 2):
                    if p + 1 == len(evals):
                        nxt.append(evals[p])
                        continue
                    (za, va), (zb, vb) = evals[p], evals[p + 1]
                    merged = [
                        lex(za[r], va[r], zb[r], vb[r]) for r in range(WIN_H)
                    ]
                    nxt.append(
                        ([m[0] for m in merged], [m[1] for m in merged])
                    )
                evals = nxt
            zs, vs = evals[0]
            out = [
                lex(accs_z[r], accs_v[r], zs[r], vs[r]) for r in range(WIN_H)
            ]
            return (
                tuple(o[0] for o in out),
                tuple(o[1] for o in out),
            )

        accs_z = tuple(jnp.zeros((8, WIN_W), jnp.float32) for _ in range(WIN_H))
        accs_v = tuple(jnp.full((8, WIN_W), -1, jnp.int32) for _ in range(WIN_H))
        if debug_mode == 1:  # skip the fold: scan + list + RMW cost only
            return zacc, vacc
        accs_z, accs_v = jax.lax.fori_loop(
            0, pl.cdiv(cnt, 8 * unroll), block, (accs_z, accs_v)
        )
        if debug_mode == 2:  # skip the final reduce/assemble (timing only)
            upd = accs_z[0] > zacc
            zout = jnp.where(upd, accs_z[0], zacc)
            if depth_only:
                return zout, vacc
            return zout, jnp.where(upd, accs_v[0], vacc)

        # Reduce each row's 8 slot accumulators (lex over sublanes) and
        # assemble the (8, 128) window tile; merge with the framebuffer
        # (current-chunk ids exceed all stored ids, so >= keeps binned's
        # later-chunk-wins-ties semantics).
        wz = jnp.zeros((8, WIN_W), jnp.float32)
        wv = jnp.full((8, WIN_W), -1, jnp.int32)
        for r in range(WIN_H):
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
        upd = (wz >= zacc) & (wz > 0.0)
        zout = jnp.where(upd, wz, zacc)
        if depth_only:
            return zout, vacc
        vout = jnp.where(upd, wv, vacc)  # lane 16 already carries GLOBAL ids
        return zout, vout

    if debug_mode == 5:  # grid + block DMA floor (no scan)
        dirty_ref[0] = cnt_ref[0, 0, 0]
        return

    def scanw(w, nd):
        dirty_ref[nd] = w
        return nd + (cnt_ref[0, 0, w] > 0).astype(jnp.int32)

    nd = jax.lax.fori_loop(0, nwin, scanw, 0)

    if debug_mode == 3:  # grid + block DMA + dirty-scan floor
        return

    if debug_mode == 4:  # + list builds, no window traffic / fold

        def lists_only(bi, _):
            base = bi * kb
            for j in range(kb):
                idx = base + j
                live = idx < nd
                wv = jnp.where(live, dirty_ref[jnp.minimum(idx, nwin - 1)], 0)
                list_ref = list_a if j % 2 == 0 else list_b

                @pl.when(live)
                def _(wv=wv, list_ref=list_ref):
                    build_list(wv, list_ref)

            return 0

        jax.lax.fori_loop(0, pl.cdiv(nd, kb), lists_only, 0)
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
                zlim_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
                if has_z_limit
                else None
            )
            vacc = (
                None
                if depth_only
                else vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)]
            )
            loaded.append((live, wv, row, col, y, x, zacc, vacc, zlim))
        results = []
        for j in range(kb):
            live, wv, row, col, y, x, zacc, vacc, zlim = loaded[j]
            list_ref = list_a if j % 2 == 0 else list_b

            @pl.when(live)
            def _(wv=wv, list_ref=list_ref):
                build_list(wv, list_ref)

            cntw = jnp.where(live, cnt_ref[0, 0, wv], 0)
            zacc, vacc = fold_lanes(row, col, cntw, zacc, vacc, list_ref, zlim)
            results.append((live, y, x, zacc, vacc))
        for j in range(kb):
            live, y, x, zacc, vacc = results[j]

            @pl.when(live)
            def _(y=y, x=x, zacc=zacc, vacc=vacc):
                depth_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = zacc
                if not depth_only:
                    vis_ref[pl.ds(y, WIN_H), pl.ds(x, WIN_W)] = vacc

        return 0

    jax.lax.fori_loop(0, pl.cdiv(nd, kb), batch, 0)


def auto_slabs_lanes(
    height: int, width: int, depth_only: bool = False,
    with_z_limit: bool = False,
) -> int:
    """Smallest slab count satisfying the row-field and VMEM constraints
    (the lane-record block adds 2 x chunk x 32 x 4 B on top of the slab)."""
    bytes_per_px = (4 if depth_only else 8) + (8 if with_z_limit else 0)
    budget = 10 * 2**20 - 2 * 1024 * LREC * 4
    s = 1
    while True:
        hp = -(-height // (s * WIN_H)) * (s * WIN_H)
        slab_h = hp // s
        if slab_h <= 256 * WIN_H and slab_h * width * bytes_per_px <= budget:
            return s
        s += 1


def rasterize_lanes(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    chunk: int = 1024,
    kb: int = 8,
    unroll: int = 2,
    depth_only: bool = False,
    affine_z: bool = False,
    interpret: bool = False,
    z_limit: jnp.ndarray | None = None,
    alpha_grid: jnp.ndarray | None = None,
    debug_mode: int = 0,  # 1 = skip fold, 2 = skip final reduce (timing only)
):
    """(depth (H, W) f32, vis (H, W) i32) — same contract as rasterize_binned;
    matches it up to FMA-contraction ULPs on edge/z evaluation (vis may flip
    only where depth differs — the raster_xla ULP-edge contract)."""
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

    # The bitmask prep reads slots 0-11 (edges + inv_a), 18 (sid), 19/21
    # (bbox x) and 23 (window-row span) of the BINNED record layout — build
    # that view for it (cheap elementwise; shares the edge math).
    from androidrenderer_tpu.ops.raster.raster_fused import pack_fused_records

    brecords = pack_fused_records(setup, affine_z=affine_z)
    bbox = setup.bbox
    ty0 = bbox[:, 1].astype(jnp.int32) // WIN_H
    ty1 = bbox[:, 3].astype(jnp.int32) // WIN_H
    wpack = ty0 + (ty1 << 8)
    wpack = jnp.where(live, wpack, 255)
    brecords = brecords.at[:, 23].set(wpack.astype(jnp.float32))

    count = jnp.int32(n)
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n

    words, ww, cnt, _dw = build_window_masks(
        brecords, live, hp, width, WIN_H, num_slabs, chunk
    )

    if pad:
        records = jnp.pad(records, ((0, pad), (0, 0)))
    records = records.reshape(num_chunks, chunk, LREC)

    ncols = width // WIN_W
    nwin = (slab_h // WIN_H) * ncols

    kernel = functools.partial(
        _lanes_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        kb=kb,
        unroll=unroll,
        depth_only=depth_only,
        affine_z=affine_z,
        has_z_limit=z_limit is not None,
        has_alpha_grid=alpha_grid is not None,
        debug_mode=debug_mode,
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

    in_specs = [
        pl.BlockSpec(
            (1, chunk, LREC), lambda s, c, *_: (c, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, 1, nwin * (chunk // 32)),
            lambda s, c, *_: (s * num_chunks + c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 1, nwin),
            lambda s, c, *_: (s * num_chunks + c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 1, nwin),
            lambda s, c, *_: (s * num_chunks + c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    inputs = [records, words, ww, cnt]
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
            pltpu.SMEM((chunk,), jnp.int32),  # touch list (even batch slots)
            pltpu.SMEM((chunk,), jnp.int32),  # touch list (odd batch slots)
            pltpu.SMEM((nwin + 1,), jnp.int32),  # dirty window list
        ],
    )

    result = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(count[None], *inputs)
    if depth_only:
        return result[0][:height]
    return result[0][:height], result[1][:height]
