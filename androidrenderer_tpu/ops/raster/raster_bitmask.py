"""Bitmask-driven rasterizer — kills scalar Phase A entirely.

The window-binned kernel (raster_binned.py) spends its frame budget on Phase A:
a SCALAR per-triangle scan + SMEM bin append at ~45-65 cycles per (triangle,
window) touch — the measured ceiling of main raster, CSM, and RSM alike
(docs/ROADMAP.md round-3 findings). Every attempt to vectorize the append
failed: the TPU vector unit has no scatter, and XLA-side sorts/scatters each
cost more than the whole raster (tools/microbench_sort.py).

This kernel inverts the data flow so NOTHING is appended:

  XLA prep (vectorized, dense — build_window_masks): for every (window-row,
  triangle) compute the exact x-span the binned kernel's span loop would walk
  (same f32 edge math, widened by a half-pixel guard band so an XLA-vs-Mosaic
  FMA-contraction ULP can only ADD harmless non-covering candidates, never
  drop a covering one), convert to a <= 16-bit column mask (width <= 2048 =
  16 windows of 128), and transpose-pack into per-window WORDS: bit j of
  words[w, i] says triangle 32*i + j of the chunk touches window w. Two side
  tables make the kernel's scan proportional to real work: ww[w] = bitmask of
  nonzero words, cnt[w] = exact touch count (population count, also XLA-side).
  All of it is elementwise/reshape work XLA fuses to a few HBM passes (~3 ms
  at 310k triangles — vs ~50 ms of scalar emits it replaces).

  Kernel (per slab x chunk grid step, like raster_binned): for each window
  batch (kb loads issued before stores so the RMW latencies overlap), a scalar
  ctz loop walks ww -> nonzero words -> set bits and writes the touch list
  into ONE chunk-sized SMEM scratch (~10 cycles/touch, no counts RMW, no
  capacity/overflow machinery), then the register fold from raster_binned
  (unroll-tree combine, later-id-wins depth ties) retires the touches.

Correctness: touch order per window is ascending (chunk, word, bit) =
ascending triangle id — identical to the binned kernel's emission order, and
the combine is exact (compares/selects only), so any grouping yields the same
result: output is BIT-IDENTICAL to rasterize_binned (tests/test_raster_bitmask
asserts equality, plus the usual raster_xla ULP-edge contract).

Replaces the reference's hardware rasterizer (scene_renderer.cpp:286-365
analog) like the binned kernel; same contract/record layout
(raster_fused.pack_fused_records).
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


# Which count-trailing-zeros lowering the kernel uses. "clz" and "popcount"
# are single TPU instructions if Mosaic exposes them on the scalar core
# (unverified off-TPU); "select" is a 10-op portable fallback. Switch here if
# the Mosaic compile rejects the default.
CTZ_IMPL = "clz"


def _ctz32(x):
    """Count trailing zeros of a nonzero int32."""
    lsb = jnp.bitwise_and(x, -x)
    if CTZ_IMPL == "clz":
        return 31 - jax.lax.clz(lsb)
    if CTZ_IMPL == "popcount":
        return jax.lax.population_count(lsb - 1)
    # Portable: binary search with masks/selects.
    r = jnp.int32(0)
    r = r | jnp.where((lsb & jnp.int32(0x0000FFFF)) == 0, 16, 0)
    r = r | jnp.where((lsb & jnp.int32(0x00FF00FF)) == 0, 8, 0)
    r = r | jnp.where((lsb & jnp.int32(0x0F0F0F0F)) == 0, 4, 0)
    r = r | jnp.where((lsb & jnp.int32(0x33333333)) == 0, 2, 0)
    r = r | jnp.where((lsb & jnp.int32(0x55555555)) == 0, 1, 0)
    return r


def _bitmask_kernel(
    pref_ref,  # (S + S*C,) i32 scalar prefetch: [live chunks per slab, perm]
    recs_ref,  # (1, 1, CHUNK*24) f32 SMEM flat records, or — when
    #            vmem_records — (1, CHUNK, 32) f32 VMEM lane records
    words_ref,  # (1, 1, NWIN*32) i32 SMEM — per-window triangle bitmask words
    ww_ref,  # (1, 1, NWIN) i32 SMEM — per-window nonzero-word bitmask
    cnt_ref,  # (1, 1, NWIN) i32 SMEM — per-window exact touch count
    dw_ref,  # (1, 1, ceil(NWIN/32)) i32 SMEM — dirty-window bitmask
    *rest,  # [grid_ref | mb_ref,] [zlim_ref,] depth_ref, [vis_ref,] lists, dirty
    slab_h: int,
    width: int,
    chunk: int,
    kb: int,
    depth_only: bool,
    affine_z: bool,
    win_h: int,
    unroll: int,
    has_z_limit: bool,
    has_alpha_grid: bool,
    num_slabs: int,
    num_chunks: int,
    rec_w: int = REC,
    debug_mode: int = 0,
    vmem_records: bool = False,
):
    rest = list(rest)
    cntmk_ref = rest.pop(0) if has_alpha_grid else None
    if has_alpha_grid:
        # Scalar path: per-triangle 16x16 alpha bitmap words (SMEM). VMEM
        # path: the bitmaps ride record lanes 17-24; what remains in SMEM is
        # the per-chunk masked-triangle BITMASK (wpc words) consumed by the
        # two-ended list build.
        grid_ref = None if vmem_records else rest.pop(0)
        mb_ref = rest.pop(0) if vmem_records else None
    else:
        grid_ref = mb_ref = None
    zlim_ref = rest.pop(0) if has_z_limit else None
    depth_ref = rest.pop(0)
    vis_ref = None if depth_only else rest.pop(0)
    list_a, list_b, dirty_ref = rest

    s = pl.program_id(0)
    c = pl.program_id(1)
    ncols = width // WIN_W
    rows_per_slab = slab_h // win_h
    nwin = rows_per_slab * ncols
    wpc = chunk // 32  # bitmask words per (window, chunk)

    @pl.when(c == 0)
    def _init():
        depth_ref[:, :] = jnp.zeros((slab_h, width), jnp.float32)
        if not depth_only:
            vis_ref[:, :] = jnp.full((slab_h, width), -1, jnp.int32)

    # Dead-chunk skipping: grid step c processes the c-th LIVE chunk of this
    # slab (live-first stable permutation, computed XLA-side from the dirty
    # bitmask); steps past the live count map to the last live block (no new
    # DMA — Mosaic elides copies when the block index repeats) and fall
    # through. Per-cascade frustum culling makes most chunks dead in the near
    # shadow cascades, where per-chunk fixed costs were the measured floor.
    nl = pref_ref[s]
    cp = pref_ref[
        num_slabs + s * num_chunks + jnp.minimum(c, jnp.maximum(nl - 1, 0))
    ]
    chunk_base = cp * chunk

    rowf = jax.lax.broadcasted_iota(jnp.int32, (win_h, WIN_W), 0).astype(jnp.float32)
    colf = jax.lax.broadcasted_iota(jnp.int32, (win_h, WIN_W), 1).astype(jnp.float32)
    slab_y0 = (pl.program_id(0) * slab_h).astype(jnp.float32)

    def rd(k, i):
        return recs_ref[0, 0, k * rec_w + i]

    # Slim depth-only records (rec_w=16) remap z -> 9:12 and sid -> 12; the
    # full layout keeps pack_fused_records' slots.
    z_at = 9 if rec_w == 16 else 12
    sid_at = 12 if rec_w == 16 else 18

    def build_list(w, list_ref):
        """Scalar ctz scan: ww -> nonzero words -> set bits -> list entries.

        ~10 cycles/touch (two ctz loops + one SMEM write), vs the binned
        kernel's ~45-65-cycle emit (count RMW + bin write + overflow branch).
        Scalar carries only — Mosaic keeps them in registers. The list scratch
        is double-buffered across the kb batch (list_a/list_b by window parity)
        so window j+1's scalar build has no dependency on window j's vector
        fold and the two units can overlap.

        With an alpha grid the list is TWO-ENDED: opaque touches fill from 0
        up, alpha-masked touches (record slot 19, set XLA-side) from chunk-1
        down — the fold then runs the expensive bitmap-tested eval only over
        the masked segment instead of taxing every touch (~85% of the bench
        scene's touches are opaque)."""

        def outer(state):
            www, n_op, n_mk = state
            j = _ctz32(www)
            word0 = words_ref[0, 0, w * wpc + j]

            def inner(st):
                bits, o, m = st
                b = _ctz32(bits)
                k = j * 32 + b
                if has_alpha_grid:
                    if vmem_records:
                        mf = ((mb_ref[0, 0, j] >> b) & 1) != 0
                    else:
                        mf = recs_ref[0, 0, k * rec_w + 19] != 0.0
                    list_ref[jnp.where(mf, chunk - 1 - m, o)] = k
                    return (
                        bits & (bits - 1),
                        o + jnp.where(mf, 0, 1),
                        m + jnp.where(mf, 1, 0),
                    )
                list_ref[o] = k
                return (bits & (bits - 1), o + 1, m)

            def inner_cond(st):
                return st[0] != 0

            _, n_op, n_mk = jax.lax.while_loop(
                inner_cond, inner, (word0, n_op, n_mk)
            )
            return (www & (www - 1), n_op, n_mk)

        def outer_cond(state):
            return state[0] != 0

        jax.lax.while_loop(outer_cond, outer, (ww_ref[0, 0, w], 0, 0))

    def fold_list(
        row, col, cnt, zacc, vacc, list_ref, zlim=None,
        with_alpha=False, reverse=False,
    ):
        """Register fold of the window's listed touches (raster_binned's
        fold_touches with k read from the list scratch). ``reverse`` walks the
        masked segment (chunk-1 downward); the combine is lexicographic
        (z, id) max, so segment order cannot change the result."""
        gx = colf + (col * WIN_W).astype(jnp.float32)
        gy = rowf + (row * win_h).astype(jnp.float32) + slab_y0

        def eval_touch_vmem(t):
            """VMEM-record eval: ONE dynamic (1, 32) row load replaces the
            ~13 scalar SMEM coefficient loads, and — the actual point — moves
            the records block out of SMEM, whose fill DMA (~3.4 GB/s measured)
            floors every kernel instance. Coefficients become (8, 1) lane
            slices of the sublane-replicated row; the window is evaluated in
            (8, 128) sub-blocks (Mosaic rejects both-dims broadcasts, and
            (8, 1) x (8, 128) lane broadcasts are the proven raster_lanes
            pattern). Formula text and association match eval_touch exactly:
            interpret-mode output is bit-identical; on TPU the usual
            FMA-contraction ULP contract applies.

            MEASURED NEGATIVE (round 3, tools/bench_raster.py, 310k tris):
            screen 46.8 vs 26.7 ms, CSM 16.1 vs 10.6, RSM 12.8 vs 7.8 — the
            dynamic row load + 8x sublane replication + 4x (8, 128) sub-block
            eval costs more per touch than the scalar loads it replaces, on
            every shape. The SMEM fill was evidently NOT the floor. Kept
            off-by-default as a tested design study; one genuine upside is
            compile time (screen kernel 13 s vs 256 s — the scalar eval's
            unrolled per-touch scalar loads blow up Mosaic lowering)."""
            live = t < cnt
            if reverse:
                k = jnp.where(live, list_ref[jnp.maximum(chunk - 1 - t, 0)], 0)
            else:
                k = jnp.where(live, list_ref[jnp.minimum(t, chunk - 1)], 0)
            if debug_mode == 1:
                return (
                    jnp.full((win_h, WIN_W), 1e-30, jnp.float32) * k.astype(jnp.float32),
                    chunk_base + k,
                )
            rowv = recs_ref[0, pl.ds(k, 1), :]  # (1, 32)
            cb = jnp.concatenate([rowv] * 8, axis=0)  # (8, 32) replicated
            a0 = cb[:, 0:1]
            b0 = cb[:, 1:2]
            c0 = cb[:, 2:3]
            a1 = cb[:, 3:4]
            b1 = cb[:, 4:5]
            c1 = cb[:, 5:6]
            a2 = cb[:, 6:7]
            b2 = cb[:, 7:8]
            c2 = cb[:, 8:9]
            az = cb[:, 9:10]
            bz = cb[:, 10:11]
            cz = cb[:, 11:12]
            if not affine_z:
                ar = cb[:, 12:13]
                br = cb[:, 13:14]
                cr = cb[:, 14:15]
            sid = jnp.where(live, cb[:, 15:16], 0.0)
            if has_alpha_grid and with_alpha:
                gwords = [
                    jax.lax.bitcast_convert_type(cb[:, 17 + j : 18 + j], jnp.int32)
                    for j in range(8)
                ]
            colf8 = jax.lax.broadcasted_iota(jnp.int32, (8, WIN_W), 1).astype(
                jnp.float32
            )
            rowf8 = jax.lax.broadcasted_iota(jnp.int32, (8, WIN_W), 0).astype(
                jnp.float32
            )
            gx8 = colf8 + (col * WIN_W).astype(jnp.float32)
            gy0 = (row * win_h).astype(jnp.float32) + slab_y0
            zs = []
            for g in range(win_h // 8):
                gyg = rowf8 + jnp.float32(g * 8) + gy0
                if debug_mode == 2:
                    z = az * gx8 + bz * gyg + cz
                    zs.append(jnp.where(jnp.full((8, WIN_W), live), z, 0.0))
                    continue
                d0 = a0 * gx8 + b0 * gyg + c0
                d1 = a1 * gx8 + b1 * gyg + c1
                d2 = a2 * gx8 + b2 * gyg + c2
                dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
                dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
                cov = ((dmax <= 0.0) & (sid != 0.0)) | ((dmin >= 0.0) & (sid < 0.0))
                if affine_z:
                    z = az * gx8 + bz * gyg + cz
                else:
                    qv = az * gx8 + bz * gyg + cz
                    z = (ar * gx8 + br * gyg + cr) / qv
                cov = cov & (z > 0.0) & (z <= 1.0)
                if has_alpha_grid and with_alpha:
                    sv = d0 + d1 + d2
                    inv_sv = 1.0 / jnp.where(sv == 0.0, 1.0, sv)
                    ui = jnp.clip((d1 * inv_sv * 16.0), 0.0, 15.0).astype(jnp.int32)
                    vi = jnp.clip((d2 * inv_sv * 16.0), 0.0, 15.0).astype(jnp.int32)
                    idx = vi * 16 + ui
                    wsel = idx >> 5
                    word = gwords[0]
                    for wj in range(1, 8):
                        word = jnp.where(wsel == wj, gwords[wj], word)
                    bit = jnp.right_shift(word, idx & 31) & 1
                    cov = cov & (bit == 1)
                if zlim is not None:
                    cov = cov & (z < zlim[g * 8 : (g + 1) * 8, :])
                zs.append(jnp.where(cov, z, 0.0))
            return jnp.concatenate(zs, axis=0), chunk_base + k

        def eval_touch(t):
            live = t < cnt
            if reverse:
                k = jnp.where(live, list_ref[jnp.maximum(chunk - 1 - t, 0)], 0)
            else:
                k = jnp.where(live, list_ref[jnp.minimum(t, chunk - 1)], 0)
            if debug_mode == 1:
                # List-build + loop floor: consume the list entry, no eval.
                return (
                    jnp.full((win_h, WIN_W), 1e-30, jnp.float32) * k.astype(jnp.float32),
                    chunk_base + k,
                )
            if debug_mode == 2:
                # Single-plane eval: z FMA + unconditional coverage (measures
                # the coverage/edge logic's share vs debug 0).
                z = rd(k, z_at) * gx + rd(k, z_at + 1) * gy + rd(k, z_at + 2)
                return jnp.where(jnp.full((win_h, WIN_W), live), z, 0.0), chunk_base + k
            a0 = rd(k, 0)
            b0 = rd(k, 1)
            c0 = rd(k, 2)
            a1 = rd(k, 3)
            b1 = rd(k, 4)
            c1 = rd(k, 5)
            a2 = rd(k, 6)
            b2 = rd(k, 7)
            c2 = rd(k, 8)
            sid = jnp.where(live, rd(k, sid_at), 0.0)
            d0 = a0 * gx + b0 * gy + c0
            d1 = a1 * gx + b1 * gy + c1
            d2 = a2 * gx + b2 * gy + c2
            dmax = jnp.maximum(jnp.maximum(d0, d1), d2)
            dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
            cov = ((dmax <= 0.0) & (sid != 0.0)) | ((dmin >= 0.0) & (sid < 0.0))
            if affine_z:
                z = rd(k, z_at) * gx + rd(k, z_at + 1) * gy + rd(k, z_at + 2)
            else:
                qv = rd(k, 12) * gx + rd(k, 13) * gy + rd(k, 14)
                z = (rd(k, 15) * gx + rd(k, 16) * gy + rd(k, 17)) / qv
            cov = cov & (z > 0.0) & (z <= 1.0)
            if has_alpha_grid and with_alpha:
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
                cov = cov & (z < zlim)
            return jnp.where(cov, z, 0.0), chunk_base + k

        def comb(a, b):
            za, va = a
            zb, vb = b
            if depth_only:
                return (jnp.maximum(za, zb), va)
            # Lexicographic (z, id) max: with ascending ids this equals the
            # previous later-wins combine bit-for-bit, and it makes the fold
            # ORDER-INDEPENDENT — required for the opaque/masked segment
            # split, which interleaves ids across the two passes.
            take = (zb > za) | ((zb == za) & (vb > va))
            return (jnp.where(take, zb, za), jnp.where(take, vb, va))

        ev = eval_touch_vmem if vmem_records else eval_touch

        def block(i, carry):
            zacc, vacc = carry
            evals = [ev(i * unroll + j) for j in range(unroll)]
            while len(evals) > 1:
                evals = [
                    comb(evals[p], evals[p + 1]) if p + 1 < len(evals) else evals[p]
                    for p in range(0, len(evals), 2)
                ]
            zb, vb = evals[0]
            if depth_only:
                return (jnp.maximum(zacc, zb), vacc)
            upd = ((zb > zacc) | ((zb == zacc) & (vb > vacc))) & (zb > 0.0)
            return (jnp.where(upd, zb, zacc), jnp.where(upd, vb, vacc))

        return jax.lax.fori_loop(0, pl.cdiv(cnt, unroll), block, (zacc, vacc))

    # Dirty-window list from the XLA-precomputed dirty BITMASK: ctz-walk the
    # set bits (~10 cyc per dirty window + one load per word) instead of a
    # fori over all nwin windows — the full scan (nwin x chunks x slabs x
    # ~5 cyc) measured as the floor of the depth-only cascade rasters.
    nw_words = -(-nwin // 32)

    def scan_word(wj, nd):
        def inner(st):
            bits, nd2 = st
            b = _ctz32(bits)
            dirty_ref[nd2] = wj * 32 + b
            return (bits & (bits - 1), nd2 + 1)

        # Dead grid steps (c >= nl) zero the word at the source: the while
        # exits immediately, nd stays 0, the batch loop never runs.
        bits0 = jnp.where(c < nl, dw_ref[0, 0, wj], 0)
        _, nd = jax.lax.while_loop(lambda st: st[0] != 0, inner, (bits0, nd))
        return nd

    if debug_mode == 4:
        # DMA floor: block fetches happen regardless of use; no scan, no work.
        return
    nd = jax.lax.fori_loop(0, nw_words, scan_word, 0)
    if debug_mode == 3:
        # DMA + dirty-scan floor: consume nd so the scan survives (SMEM
        # scalar store — VMEM refs reject scalar writes).
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
            y = pl.multiple_of(row * win_h, win_h)
            x = pl.multiple_of(col * WIN_W, WIN_W)
            zacc = depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
            zlim = (
                zlim_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] if has_z_limit else None
            )
            vacc = (
                None if depth_only else vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)]
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
            if has_alpha_grid:
                # Opaque segment (cheap eval) then masked segment (bitmap
                # eval) — counts are XLA-precomputed per window.
                cmk = jnp.where(live, cntmk_ref[0, 0, wv], 0)
                zacc, vacc = fold_list(
                    row, col, cntw - cmk, zacc, vacc, list_ref, zlim,
                    with_alpha=False,
                )
                zacc, vacc = fold_list(
                    row, col, cmk, zacc, vacc, list_ref, zlim,
                    with_alpha=True, reverse=True,
                )
            else:
                zacc, vacc = fold_list(
                    row, col, cntw, zacc, vacc, list_ref, zlim
                )
            results.append((live, y, x, zacc, vacc))
        for j in range(kb):
            live, y, x, zacc, vacc = results[j]

            @pl.when(live)
            def _(y=y, x=x, zacc=zacc, vacc=vacc):
                depth_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = zacc
                if not depth_only:
                    vis_ref[pl.ds(y, win_h), pl.ds(x, WIN_W)] = vacc

        return 0

    jax.lax.fori_loop(0, pl.cdiv(nd, kb), batch, 0)


def build_window_masks(
    records: jnp.ndarray,  # (N, 24) f32 packed records (slot 23 = wpack)
    valid: jnp.ndarray,  # (N,) bool — live triangles (setup.valid & sid != 0)
    hp: int,
    width: int,
    win_h: int,
    num_slabs: int,
    chunk: int,
):
    """(words (S*C, 1, nwin*32), ww (S*C, 1, nwin), cnt (S*C, 1, nwin)) i32.

    Exact span -> window-column masks, computed DENSE in XLA. The span math
    mirrors the binned kernel's strip() bounds with a +-0.5 px guard band:
    FMA-contraction differences between XLA and Mosaic are ULP-scale, so the
    guard can only add non-covering candidates (harmless — their coverage
    test fails in the fold), never drop a covering window."""
    n = records.shape[0]
    ncols = width // WIN_W
    rows_per_slab = (hp // num_slabs) // win_h
    nrows = hp // win_h
    num_chunks = -(-n // chunk)
    wpc = chunk // 32  # words per (window, chunk); ww packs wpc bits

    wp = records[:, 23].astype(jnp.int32)
    ty0 = wp & 255
    ty1 = (wp >> 8) & 255

    a = records[:, 0:9].reshape(n, 3, 3)  # (N, edge, [a, b, c])
    ia = records[:, 9:12]  # (N, 3) 1/a per edge
    sid = records[:, 18]
    bx0 = records[:, 19]
    bx1 = records[:, 21]

    # ROW PACKING (round 4, VERDICT r3 #5): k = 32 // ncols window rows share
    # one u32 element (row j's column bits occupy field [j*ncols, (j+1)*ncols)),
    # so the butterfly transpose + reduces below run on a k-times smaller
    # table — the transpose does not care what the 32 bits MEAN, and after it,
    # transposed bit position p = j*ncols + c IS the (row j, col c) word.
    # Main view (ncols 15) packs 2 rows/element, CSM 1024^2 (ncols 8) packs 4,
    # RSM 128-wide packs 32.
    k_pack = max(1, 32 // ncols)
    f_bits = ncols
    nrp = -(-nrows // k_pack)

    colmask = jnp.zeros((nrp, n), jnp.uint32)
    rp = jnp.arange(nrp, dtype=jnp.float32)[:, None]  # (RP, 1)
    rpi = jnp.arange(nrp, dtype=jnp.int32)[:, None]
    for jj in range(k_pack):
        ytf = (rp * k_pack + jj) * win_h
        ybf = ytf + (win_h - 1)
        span_lo = jnp.broadcast_to(bx0[None, :], (nrp, n))
        span_hi = jnp.broadcast_to(bx1[None, :], (nrp, n))
        for e in range(3):
            aa = a[:, e, 0][None, :]
            bb = a[:, e, 1][None, :]
            cc = a[:, e, 2][None, :]
            inv = ia[:, e][None, :]
            bt = -(bb * ytf + cc) * inv
            bb_ = -(bb * ybf + cc) * inv
            lo_e = jnp.where(aa < 0.0, jnp.minimum(bt, bb_), bx0[None, :])
            hi_e = jnp.where(aa > 0.0, jnp.maximum(bt, bb_), bx1[None, :])
            span_lo = jnp.maximum(span_lo, lo_e)
            span_hi = jnp.minimum(span_hi, hi_e)
        dbl = (sid < 0.0)[None, :]
        span_lo = jnp.where(dbl, bx0[None, :], span_lo)
        span_hi = jnp.where(dbl, bx1[None, :], span_hi)
        # Guard band (see docstring) applied to the WINDOW conversion only.
        wx0 = (jnp.clip(span_lo - 0.5, 0.0, width - 1.0) // WIN_W).astype(
            jnp.int32
        )
        wx1 = (jnp.clip(span_hi + 0.5, 0.0, width - 1.0) // WIN_W).astype(
            jnp.int32
        )
        ri = rpi * k_pack + jj
        row_live = (
            valid[None, :]
            & (span_hi + 0.5 >= span_lo - 0.5)
            & (ri >= ty0[None, :])
            & (ri <= ty1[None, :])
            & (ri < nrows)
        )
        # ncols <= 32 bits used; uint32 with a saturating high mask (1 << 32
        # is UB in i32 — wx1 = 31 must yield all-ones) covers 4096-wide
        # targets (k_pack = 1 there).
        m_hi = jnp.where(
            wx1 >= 31,
            jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (wx1 + 1).astype(jnp.uint32)) - jnp.uint32(1),
        )
        m_lo = (jnp.uint32(1) << wx0.astype(jnp.uint32)) - jnp.uint32(1)
        field = jnp.where(row_live, m_hi & ~m_lo, jnp.uint32(0))
        colmask = colmask | (field << jnp.uint32(jj * f_bits))
    colmask = colmask.astype(jnp.int32)  # (RP, N)

    pad = num_chunks * chunk - n
    if pad:
        colmask = jnp.pad(colmask, ((0, 0), (0, pad)))
    ntot = num_chunks * chunk
    nwords = ntot // 32

    # Transpose (packed row-col fields <-> triangle bits): a 32x32 BIT-MATRIX
    # TRANSPOSE per (packed row, word) via the Hacker's-Delight anti-diagonal
    # butterfly (5 levels x ~3 passes; the session-5 per-column shift-OR-tree
    # was 49 of 71 ms at bench scale). After the transpose, output bit
    # position p = j*ncols + c is exactly the 32-triangle word of
    # (row rp*k_pack + j, col c) — the butterfly never interprets the bits,
    # so row packing divides its traffic by k_pack for free.
    cm = colmask.reshape(nrp, nwords, 32)
    x = cm.astype(jnp.uint32)
    m = jnp.uint32(0x0000FFFF)
    j = 16
    while j:
        sh = x.reshape(nrp, nwords, 32 // (2 * j), 2, j)
        lo = sh[..., 0, :]
        hi = sh[..., 1, :]
        t = ((lo >> j) ^ hi) & m
        hi = hi ^ t
        lo = lo ^ (t << j)
        x = jnp.stack([lo, hi], axis=-2).reshape(nrp, nwords, 32)
        j >>= 1
        if j:
            m = m ^ (m << j)
    kf = k_pack * f_bits
    # (RP, W, k, f) -> (RP, k, f, W) -> (R, ncols, W); rows past nrows (dead
    # fields in the last packed element) are all-zero and sliced away.
    y = x[..., :kf].reshape(nrp, nwords, k_pack, f_bits)
    words = (
        jnp.transpose(y, (0, 2, 3, 1))
        .reshape(nrp * k_pack, f_bits, nwords)[:nrows]
        .astype(jnp.int32)
    )

    # ww: bitmask of nonzero words per (window, chunk); cnt: exact touches.
    # Both REDUCE over wpc on the pre-transpose layout (row-major split of the
    # nwords axis is free); ww as a weighted sum (bit j = word j nonzero) and
    # cnt as a popcount sum are single fused reduce passes.
    xs = x[..., :kf].reshape(nrp, num_chunks, wpc, kf)  # layout-free
    weights = (1 << jnp.arange(wpc, dtype=jnp.int32))[None, None, :, None]
    ww_t = jnp.sum((xs != 0).astype(jnp.int32) * weights, axis=2)  # (RP, C, kf)
    cnt_t = jnp.sum(
        jax.lax.population_count(xs).astype(jnp.int32), axis=2
    )  # (RP, C, kf)

    def unpack_rows(z):
        # (RP, C, k*f) -> (R, ncols, C)
        z = z.reshape(nrp, num_chunks, k_pack, f_bits)
        return jnp.transpose(z, (0, 2, 3, 1)).reshape(
            nrp * k_pack, f_bits, num_chunks
        )[:nrows]

    ww = unpack_rows(ww_t).astype(jnp.int32)
    cnt = unpack_rows(cnt_t)

    # Dirty-window bitmask per (slab, chunk): bit w of word w//32 = window w
    # has touches. The kernel's dirty-list build ctz-walks these words
    # (~10 cyc per DIRTY window) instead of a fori over ALL nwin windows
    # (~5 cyc x nwin x chunks x slabs — measured as the CSM kernels' floor:
    # eval was only 0.7 of 12.3 ms standalone; the scan dominated).
    nwin = rows_per_slab * ncols
    nw_words = -(-nwin // 32)
    d = (cnt > 0).astype(jnp.int32).reshape(
        num_slabs, rows_per_slab, ncols, num_chunks
    )
    d = jnp.transpose(d, (0, 3, 1, 2)).reshape(num_slabs * num_chunks, nwin)
    if nwin % 32:
        d = jnp.pad(d, ((0, 0), (0, nw_words * 32 - nwin)))
    d = d.reshape(num_slabs * num_chunks, nw_words, 32)
    stride = 1
    width_now = 32
    while width_now > 1:
        d = d[..., 0::2] | (d[..., 1::2] << stride)
        stride *= 2
        width_now //= 2
    dw = d[..., 0].reshape(num_slabs * num_chunks, 1, nw_words)

    # Kernel block layout: (S*C, 1, nwin*per_win) with slab-major chunk indexing.
    def to_blocks(x, per_win):
        x = x.reshape(num_slabs, rows_per_slab, ncols, num_chunks, per_win)
        x = jnp.transpose(x, (0, 3, 1, 2, 4))
        return x.reshape(num_slabs * num_chunks, 1, rows_per_slab * ncols * per_win)

    return (
        to_blocks(words.reshape(nrows, ncols, num_chunks, wpc), wpc),
        to_blocks(ww[..., None], 1),
        to_blocks(cnt[..., None], 1),
        dw,
    )


def rasterize_bitmask(
    setup: TriangleSetup,
    height: int,
    width: int,
    num_slabs: int = 2,
    chunk: int = 1024,
    kb: int = 8,
    depth_only: bool = False,
    affine_z: bool = False,
    interpret: bool = False,
    win_h: int = 32,
    unroll: int = 4,
    z_limit: jnp.ndarray | None = None,
    alpha_grid: jnp.ndarray | None = None,
    debug_mode: int = 0,  # profiling only: 1 = skip eval, 2 = z-plane only,
    # 3 = DMA+scan floor, 4 = DMA floor, 5 = pin records block (isolates the
    # records DMA share: the repeated block index elides its per-chunk copy),
    # 6 = pin the words block likewise. 5/6 produce garbage output.
    vmem_records: bool = False,  # records (+ alpha bitmaps) as VMEM lane rows
):
    """(depth (H, W) f32, vis (H, W) i32) — same contract as rasterize_binned;
    output is bit-identical to it (same eval formulas, same per-window touch
    order, exact combine)."""
    if width % WIN_W or width > 32 * WIN_W:
        raise ValueError(f"width {width} must be a multiple of 128 and <= 4096")
    if win_h <= 0 or win_h % 8:
        raise ValueError(
            f"win_h {win_h} must be a positive multiple of 8 (the fold loop "
            "consumes 8-row groups; cvar r.Shadow.CSM.WinH)"
        )
    if chunk % 32 or chunk > 1024 or (chunk // 32) & (chunk // 32 - 1):
        raise ValueError(
            "chunk must be 32 * a power of two, <= 1024 (ww packs chunk/32 bits)"
        )
    hp = -(-height // (num_slabs * win_h)) * (num_slabs * win_h)
    slab_h = hp // num_slabs
    if hp // win_h > 255:
        raise ValueError(
            f"height {height} exceeds the packed window-bbox row field "
            f"(max {255 * win_h} at win_h={win_h})"
        )

    records = pack_fused_records(setup, affine_z=affine_z)
    bbox = setup.bbox
    ty0 = bbox[:, 1].astype(jnp.int32) // win_h
    ty1 = bbox[:, 3].astype(jnp.int32) // win_h
    live = setup.valid & (records[:, 18] != 0.0)
    wpack = ty0 + (ty1 << 8)
    wpack = jnp.where(live, wpack, 255)
    records = records.at[:, 23].set(wpack.astype(jnp.float32))

    n = records.shape[0]
    num_chunks = -(-n // chunk)
    pad = num_chunks * chunk - n

    words, ww, cnt, dw = build_window_masks(
        records, live, hp, width, win_h, num_slabs, chunk
    )

    # Live-first chunk permutation per slab (scalar prefetch): grid step c
    # processes perm[s, c]; steps past nl[s] repeat the last live block (the
    # copy is elided) and skip. Stable ascending order among live chunks
    # preserves per-window touch order -> output stays bit-identical.
    live_sc = jnp.any(
        dw.reshape(num_slabs, num_chunks, -1) != 0, axis=-1
    )  # (S, C)
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

    cnt_mk = None
    mb_blocks = None
    if alpha_grid is not None:
        # Opaque/masked touch-list split: flag masked triangles in record
        # slot 19 (bbox — already consumed by build_window_masks above) and
        # precompute per-window MASKED touch counts (popcount of the window
        # words AND the masked-triangle bitmask) in the same block layout as
        # cnt. tri_alpha_grid is all-ones (-1 words) for non-masked triangles.
        masked_tri = jnp.any(alpha_grid.astype(jnp.int32) != -1, axis=1) & live
        records = records.at[:, 19].set(jnp.where(masked_tri, 1.0, 0.0))
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
        mbits = mt[..., 0].astype(jnp.uint32)  # (C, wpc)
        nwin_ = words.shape[-1] // (chunk // 32)
        wblk = words.reshape(num_slabs, num_chunks, nwin_, chunk // 32)
        mk = jax.lax.population_count(
            wblk.astype(jnp.uint32) & mbits[None, :, None, :]
        ).astype(jnp.int32)
        cnt_mk = jnp.sum(mk, axis=-1).reshape(num_slabs * num_chunks, 1, nwin_)
        # VMEM-records mode: the two-ended list build reads the masked flag
        # from this per-chunk bitmask (SMEM, wpc words) instead of a record
        # slot (the record rows are no longer scalar-addressable).
        mb_blocks = mbits.astype(jnp.int32).reshape(num_chunks, 1, chunk // 32)

    # Slim depth-only records: the ortho depth kernel reads only the edge
    # planes, the affine z plane, and sid — 13 of 24 slots. A 16-wide copy
    # cuts the per-chunk SMEM fill (the cascade kernels' measured floor) by a
    # third; build_window_masks keeps consuming the full records.
    if vmem_records:
        from androidrenderer_tpu.ops.raster.records import pack_lane_records

        krecs, _ = pack_lane_records(setup, affine_z=affine_z, alpha_grid=alpha_grid)
        rec_w = krecs.shape[1]  # 32 lanes
        if pad:
            krecs = jnp.pad(krecs, ((0, pad), (0, 0)))
        krecs = krecs.reshape(num_chunks, chunk, rec_w)
    elif depth_only and affine_z and alpha_grid is None:
        krecs = jnp.concatenate(
            [
                records[:, 0:9],
                records[:, 12:15],
                records[:, 18:19],
                jnp.zeros((n, 3), jnp.float32),
            ],
            axis=1,
        )
    else:
        krecs = records
    if not vmem_records:
        rec_w = krecs.shape[1]
        if pad:
            krecs = jnp.pad(krecs, ((0, pad), (0, 0)))
        krecs = krecs.reshape(num_chunks, 1, chunk * rec_w)

    ncols = width // WIN_W
    nwin = (slab_h // win_h) * ncols

    kernel = functools.partial(
        _bitmask_kernel,
        slab_h=slab_h,
        width=width,
        chunk=chunk,
        kb=kb,
        depth_only=depth_only,
        affine_z=affine_z,
        win_h=win_h,
        unroll=unroll,
        has_z_limit=z_limit is not None,
        has_alpha_grid=alpha_grid is not None,
        num_slabs=num_slabs,
        num_chunks=num_chunks,
        rec_w=rec_w,
        debug_mode=debug_mode if debug_mode < 5 else 0,
        vmem_records=vmem_records,
    )

    def _cp(s, c, pref):
        nl_s = pref[s]
        return pref[
            num_slabs + s * num_chunks + jnp.minimum(c, jnp.maximum(nl_s - 1, 0))
        ]

    chunk_block = lambda s, c, pref: (_cp(s, c, pref), 0, 0)
    slabchunk_block = lambda s, c, pref: (s * num_chunks + _cp(s, c, pref), 0, 0)
    if debug_mode == 5:  # pin records: one block index -> copy elided
        chunk_block = lambda s, c, pref: (0, 0, 0)
    if debug_mode == 6:  # pin words likewise
        slabchunk_block_words = lambda s, c, pref: (0, 0, 0)
    else:
        slabchunk_block_words = slabchunk_block

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
            (1, chunk, rec_w), chunk_block, memory_space=pltpu.VMEM
        )
        if vmem_records
        else pl.BlockSpec(
            (1, 1, chunk * rec_w), chunk_block, memory_space=pltpu.SMEM
        ),
        pl.BlockSpec(
            (1, 1, nwin * (chunk // 32)), slabchunk_block_words,
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec((1, 1, nwin), slabchunk_block, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, nwin), slabchunk_block, memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, 1, -(-nwin // 32)), slabchunk_block, memory_space=pltpu.SMEM
        ),
    ]
    inputs = [krecs, words, ww, cnt, dw]
    if alpha_grid is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, nwin), slabchunk_block, memory_space=pltpu.SMEM)
        )
        inputs.append(cnt_mk)
        if vmem_records:
            in_specs.append(
                pl.BlockSpec(
                    (1, 1, chunk // 32), chunk_block, memory_space=pltpu.SMEM
                )
            )
            inputs.append(mb_blocks)
        else:
            ag = alpha_grid.astype(jnp.int32)
            if pad:
                ag = jnp.pad(ag, ((0, pad), (0, 0)))
            in_specs.append(
                pl.BlockSpec((1, 1, chunk * 8), chunk_block, memory_space=pltpu.SMEM)
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
    )(prefetch, *inputs)
    if depth_only:
        return result[0][:height]
    return result[0][:height], result[1][:height]
