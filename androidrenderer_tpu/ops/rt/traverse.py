"""Lockstep BVH traversal — the TPU replacement for RT pipelines / ray queries.

Every ray carries ONE integer of traversal state (preorder skip-link BVH,
scene/bvh.py): per step, gather the node, slab-test, and either descend
(``idx + 1``) or skip (``miss``); leaves Moller-Trumbore-test their 4 triangle
slots. All rays advance in lockstep inside one ``lax.while_loop`` — pure
gathers + VPU math, no divergence control flow. Any-hit rays (shadows/AO) park
at the end index as soon as they find an occluder.

Round-4 restructure: the per-step state is ONE row gather. The original
formulation issued 17 gathers per ray per step (5 node fields + 4 leaf slots x
v0/e1/e2) — at the ~12 ns/lookup gather floor that was ~11 ms/step at 65k rays
and made 512^2 RTGI frames exceed the device watchdog. ``node_rows`` packs
node AABB + links + all four slots' Moller-Trumbore data (+ per-slot opacity
for masked any-hit) into a (M, 49) f32 row; small-table gathers are WIDTH-FREE
(tools/microbench_gather2.py), so the packed row costs the same as gathering
node_min alone. Rows bake host-side at scene build; dynamic refits rebuild
them in-jit (scene/dynamic.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Must match scene/bvh.py LEAF_SIZE (kept local to avoid a package import cycle;
# scene.build asserts equality).
LEAF_SIZE = 4

# node_rows channel layout (all f32; integer fields are f32-exact, < 2^24):
# 0:3 aabb min | 3:6 aabb max | 6 miss link | 7 first slot (-1 = inner) |
# 8 slot count | SLOT0 : OPQ0 slots x (v0, e1, e2) | OPQ0 : +LEAF_SIZE
# per-slot opaque flags | GRID0 : +LEAF_SIZE*8 per-slot 16x16 barycentric
# alpha bitmaps (8 i32 words bitcast to f32; all-ones for opaque slots) |
# LOOK0 : +4 lookahead target slots (-1 = none) | +4*6 target AABBs.
#
# Lookahead (round 5): an inner node's 4 targets are its GRANDCHILDREN (or a
# leaf child directly), in preorder order. A traversal step at an inner node
# slab-tests the 4 target boxes riding the SAME gathered row and jumps
# straight to the first hit target — descending TWO levels (or skipping a
# whole 2-level subtree) per gather. Correct under preorder skip links:
# every arrival (descend or miss-link) re-tests the node's own box, a target
# box contains its whole subtree, and all skipped intermediates are either
# ancestors of the jump target or subtrees whose target box missed.
SLOT0 = 9
OPQ0 = SLOT0 + LEAF_SIZE * 9
GRID0 = OPQ0 + LEAF_SIZE
LOOK0 = GRID0 + LEAF_SIZE * 8
NODE_ROW_CHANNELS = LOOK0 + 4 + 4 * 6


class DeviceBVH(NamedTuple):
    """Device-side BVH + slot-ordered triangle data (built in scene.build)."""

    node_min: jnp.ndarray  # (M, 3)
    node_max: jnp.ndarray  # (M, 3)
    node_miss: jnp.ndarray  # (M,)
    node_first: jnp.ndarray  # (M,)
    node_count: jnp.ndarray  # (M,)
    slot_tri: jnp.ndarray  # (S,) original triangle id per slot (-1 padded)
    slot_v0: jnp.ndarray  # (S, 3) Moller-Trumbore precomputed
    slot_e1: jnp.ndarray  # (S, 3)
    slot_e2: jnp.ndarray  # (S, 3)
    node_rows: jnp.ndarray  # (M, NODE_ROW_CHANNELS) packed traversal rows


def pack_node_rows(
    node_min,
    node_max,
    node_miss,
    node_first,
    node_count,
    slot_v0,
    slot_e1,
    slot_e2,
    slot_opaque=None,  # (S,) bool; None = everything opaque
    slot_alpha_grid=None,  # (S, 8) i32 16x16 barycentric bitmaps; None = solid
) -> jnp.ndarray:
    """(M, NODE_ROW_CHANNELS) f32 packed rows (see layout above).

    Pure jnp — usable both at host bake (scene.build) and inside jitted
    dynamic refits. The leaf-slot inlining is LEAF_SIZE*3 M-row gathers; at
    155k nodes that is ~20 ms in-jit, paid once per REFIT (host bakes are
    free), then every traversal step reads one row instead of 17 gathers."""
    m = node_min.shape[0]
    s = slot_v0.shape[0]
    # Links (miss/first/count) ride as f32, exact only below 2^24. Expose the
    # true capacity loudly (CLAUDE.md rule) instead of silently corrupting
    # traversal on a >16.7M-slot scene. m/s are static shapes, so this is a
    # host-side check even inside jit traces.
    if m >= 2 ** 24 or s >= 2 ** 24:
        raise ValueError(
            f"BVH too large for f32-packed node rows: nodes={m}, slots={s} "
            "(links are exact only below 2**24); split the scene or widen the "
            "row links to a bitcast-i32 channel"
        )
    first = node_first.astype(jnp.int32)
    base = jnp.maximum(first, 0)
    cols = [
        node_min.astype(jnp.float32),
        node_max.astype(jnp.float32),
        node_miss.astype(jnp.float32)[:, None],
        first.astype(jnp.float32)[:, None],
        node_count.astype(jnp.float32)[:, None],
    ]
    if slot_opaque is None:
        opq = jnp.ones((s,), jnp.float32)
    else:
        opq = slot_opaque.astype(jnp.float32)
    if slot_alpha_grid is None:
        grid_f = jnp.broadcast_to(
            jax.lax.bitcast_convert_type(jnp.full((8,), -1, jnp.int32),
                                         jnp.float32)[None, :],
            (s, 8),
        )
    else:
        grid_f = jax.lax.bitcast_convert_type(
            slot_alpha_grid.astype(jnp.int32), jnp.float32
        )
    opq_cols = []
    grid_cols = []
    for k in range(LEAF_SIZE):
        sl = jnp.minimum(base + k, s - 1)
        cols += [slot_v0[sl], slot_e1[sl], slot_e2[sl]]
        opq_cols.append(opq[sl][:, None])
        grid_cols.append(grid_f[sl])

    # Lookahead targets (see layout comment). Topology-derived, so this works
    # identically at host bake and inside jitted refits: left child of inner
    # X is X+1; the right child is the left subtree's miss link.
    from androidrenderer_tpu.scene.bvh import FAR_SENTINEL

    nm = node_min.astype(jnp.float32)
    nx = node_max.astype(jnp.float32)
    miss_i = node_miss.astype(jnp.int32)
    first_i = first
    ids = jnp.arange(m, dtype=jnp.int32)
    is_inner = first_i < 0

    def child_targets(c, c_valid):
        """Two targets for child c: (c itself) when c is a leaf, else c's two
        children. Returns [(slot, valid), (slot, valid)]."""
        c_s = jnp.clip(c, 0, m - 1)
        c_leaf = first_i[c_s] >= 0
        g1 = c_s + 1
        g1_ok = c_valid & ~c_leaf & (g1 < m)
        g1_s = jnp.clip(g1, 0, m - 1)
        g2 = miss_i[g1_s]
        g2_ok = g1_ok & (g2 > g1) & (g2 < m)
        tA = jnp.where(c_leaf, c_s, g1_s)
        tA_ok = c_valid & (c_leaf | g1_ok)
        return [(tA, tA_ok), (jnp.clip(g2, 0, m - 1), g2_ok)]

    left = ids + 1
    left_ok = is_inner & (left < m)
    left_s = jnp.clip(left, 0, m - 1)
    right = miss_i[left_s]
    right_ok = left_ok & (right > left) & (right < m)
    targets = child_targets(left_s, left_ok) + child_targets(
        jnp.clip(right, 0, m - 1), right_ok
    )
    t_slots = []
    t_boxes = []
    for slot_k, ok_k in targets:
        t_slots.append(
            jnp.where(ok_k, slot_k, -1).astype(jnp.float32)[:, None]
        )
        bmin = jnp.where(ok_k[:, None], nm[slot_k], FAR_SENTINEL)
        bmax = jnp.where(ok_k[:, None], nx[slot_k], FAR_SENTINEL)
        t_boxes.append(jnp.concatenate([bmin, bmax], axis=1))
    return jnp.concatenate(
        cols + opq_cols + grid_cols + t_slots + t_boxes, axis=1
    ).astype(jnp.float32)


class Hits(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance (tmax where missed)
    slot: jnp.ndarray  # (R,) hit slot id, -1 = miss
    u: jnp.ndarray  # (R,) barycentric u
    v: jnp.ndarray  # (R,) barycentric v
    # () i32 traversal steps executed / () bool true when the step cap parked
    # rays that had not finished (possible silently-truncated tail hits —
    # expose the true count rather than silently capping; CLAUDE.md rule).
    steps: jnp.ndarray | None = None
    overflow: jnp.ndarray | None = None


def _phase(
    bvh: DeviceBVH,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    tmin,
    state,
    limit: int,
    *,
    any_hit: bool,
    masked_any_hit: bool,
    alpha_bitmap_test: bool,
):
    """Run the lockstep walk until ``limit`` total steps or all rays park.

    ``state`` = (step, idx, best_t, best_slot, best_u, best_v, best_opq);
    resumable — trace_rays chains phases with ray compaction in between."""
    m = bvh.node_rows.shape[0]
    inv_d = 1.0 / jnp.where(directions == 0.0, 1e-30, directions)

    def cond(state):
        step, idx, *_ = state
        return (step < limit) & jnp.any(idx < m)

    def body(state):
        step, idx, best_t, best_slot, best_u, best_v, best_opq = state
        active = idx < m
        ni = jnp.minimum(idx, m - 1)
        row = bvh.node_rows[ni]  # THE one gather per step
        nmin = row[:, 0:3]
        nmax = row[:, 3:6]
        miss = row[:, 6].astype(jnp.int32)
        first_f = row[:, 7]
        count = row[:, 8]

        t0 = (nmin - origins) * inv_d
        t1 = (nmax - origins) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = active & (tn <= tf) & (tf >= tmin) & (tn <= best_t)

        is_leaf = box_hit & (first_f >= 0.0)
        first = first_f.astype(jnp.int32)

        # Test all LEAF_SIZE triangle slots as ONE batched (R, k, 3)
        # Moller-Trumbore evaluation. Slot data rides the SAME gathered row.
        # Batched — not unrolled — because at 16-65k rays each XLA op is
        # overhead-bound (~10 us launch vs ~0.1 ms of VPU work): the k-unroll
        # was ~160 tiny ops/step, this is ~40 fatter ones (measured 2x on the
        # whole trace).
        v0 = row[:, SLOT0:OPQ0].reshape(-1, LEAF_SIZE, 3, 3)  # (R, k, [v0 e1 e2], 3)
        e1 = v0[:, :, 1, :]
        e2 = v0[:, :, 2, :]
        v0 = v0[:, :, 0, :]
        d_b = directions[:, None, :]
        pvec = jnp.cross(d_b, e2)
        det = jnp.sum(e1 * pvec, axis=-1)  # (R, k)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvec = origins[:, None, :] - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(d_b * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        kk = jnp.arange(LEAF_SIZE, dtype=jnp.float32)[None, :]
        tmin_b = jnp.asarray(tmin, jnp.float32)
        tmin_b = (tmin_b if tmin_b.ndim == 0 else tmin_b[:, None])
        ok = (
            is_leaf[:, None]
            & (kk < count[:, None])
            & (jnp.abs(det) > 1e-12)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > tmin_b)
            & (t < best_t[:, None])
        )
        if alpha_bitmap_test:
            # MT's u = lambda1, v = lambda2 — the bake's (ui, vi) convention
            # (scene/scene.py _bake_alpha_grids; raster_bitmask eval math).
            gwords = jax.lax.bitcast_convert_type(
                row[:, GRID0:GRID0 + LEAF_SIZE * 8], jnp.int32
            ).reshape(-1, LEAF_SIZE, 8)
            ui = jnp.clip(u * 16.0, 0.0, 15.0).astype(jnp.int32)
            vi = jnp.clip(v * 16.0, 0.0, 15.0).astype(jnp.int32)
            idx_b = vi * 16 + ui  # (R, k)
            wsel = idx_b >> 5
            word = gwords[:, :, 0]
            for wj in range(1, 8):
                word = jnp.where(wsel == wj, gwords[:, :, wj], word)
            bit = jnp.right_shift(word, idx_b & 31) & 1
            ok = ok & (bit == 1)
        # Among this leaf's passing slots, keep the nearest (slots in a leaf
        # are unordered; the old ascending-k unroll kept the LAST passing k
        # with t < best-so-far, i.e. also the running nearest).
        t_ok = jnp.where(ok, t, jnp.inf)
        kbest = jnp.argmin(t_ok, axis=-1)  # (R,)
        onehot = jnp.arange(LEAF_SIZE)[None, :] == kbest[:, None]  # (R, k)
        # One-hot selects, NOT take_along_axis — a minor-axis gather at 2M
        # rays is the exact trap this kernel exists to avoid.
        any_ok = jnp.any(ok & onehot, axis=-1)
        oh = onehot.astype(jnp.float32)
        tb = jnp.sum(jnp.where(onehot, t, 0.0), axis=-1)
        ub = jnp.sum(u * oh, axis=-1)
        vb = jnp.sum(v * oh, axis=-1)
        best_slot = jnp.where(any_ok, first + kbest.astype(jnp.int32), best_slot)
        best_u = jnp.where(any_ok, ub, best_u)
        best_v = jnp.where(any_ok, vb, best_v)
        best_t = jnp.where(any_ok, tb, best_t)
        opq_b = jnp.sum(row[:, OPQ0:OPQ0 + LEAF_SIZE] * oh, axis=-1)
        best_opq = jnp.where(any_ok, opq_b != 0.0, best_opq)

        # Inner nodes: jump to the first (preorder) hit lookahead target —
        # two levels per gather; no hit target => the whole 2-level subtree
        # misses and we take the skip link.
        t_slot_f = row[:, LOOK0:LOOK0 + 4]  # (R, 4) f32, -1 = none
        t_box = row[:, LOOK0 + 4:LOOK0 + 28].reshape(-1, 4, 2, 3)
        tb0 = (t_box[:, :, 0, :] - origins[:, None, :]) * inv_d[:, None, :]
        tb1 = (t_box[:, :, 1, :] - origins[:, None, :]) * inv_d[:, None, :]
        ttn = jnp.max(jnp.minimum(tb0, tb1), axis=-1)  # (R, 4)
        ttf = jnp.min(jnp.maximum(tb0, tb1), axis=-1)
        t_hit = (
            (t_slot_f >= 0.0)
            & (ttn <= ttf)
            & (ttf >= tmin_b)  # scalar or (R, 1) — broadcasts over targets
            & (ttn <= best_t[:, None])
        )
        k1 = jnp.argmax(t_hit, axis=-1)  # first hit target (preorder order)
        oh1 = jnp.arange(4)[None, :] == k1[:, None]
        jump = jnp.sum(
            jnp.where(oh1, t_slot_f, 0.0), axis=-1
        ).astype(jnp.int32)
        any_target = jnp.any(t_hit, axis=-1)

        descend = box_hit & (first_f < 0.0) & any_target
        nxt = jnp.where(descend, jump, miss)
        nxt = jnp.where(active, nxt, idx)
        if any_hit:
            committed = best_slot >= 0
            if masked_any_hit:
                # Park only on opaque hits; masked hits need the caller's
                # alpha test (reference any-hit IgnoreHit path).
                committed = committed & best_opq
            nxt = jnp.where(committed, m, nxt)
        return step + 1, nxt, best_t, best_slot, best_u, best_v, best_opq


    return jax.lax.while_loop(cond, body, state)


def trace_rays(
    bvh: DeviceBVH,
    origins: jnp.ndarray,  # (R, 3)
    directions: jnp.ndarray,  # (R, 3) need not be normalized
    tmin,
    tmax,
    any_hit: bool = False,
    # Park-step p100 on the bench scene is ~950 (tools/microbench_rt.py);
    # 512 silently truncated the deepest ~5% of closest-hit walks. The loop
    # exits when every ray parks, so the cap only bounds the worst case.
    max_steps: int = 1024,
    active: jnp.ndarray | None = None,  # (R,) bool — inactive rays report miss
    masked_any_hit: bool = False,  # any-hit parks only on OPAQUE hits (see below)
    alpha_bitmap_test: bool = False,  # in-traversal 16x16 barycentric alpha test
    compact_after: int | None = None,  # steps before compacting survivors;
    # None = auto (128 for closest-hit traces of >= 32k rays), 0 = never.
    compact_div: int = 4,  # survivor buffer = r // compact_div (>= 1024)
) -> Hits:
    """Closest-hit (or any-hit) trace of R rays.

    ``tmin`` may be per-ray (R,) — used by the alpha-test re-trace loop to peel
    past ignored hits. ``masked_any_hit`` changes any-hit semantics to match
    the reference's masked any-hit shader (gltf_basic_pbr.slang:291-317): rays
    park (terminate) only on OPAQUE hits (per-slot opacity baked into
    node_rows); alpha-masked hits keep the closest-so-far and continue, so the
    caller can alpha-test the committed hit and re-trace.

    ``alpha_bitmap_test`` instead resolves masked geometry INSIDE the
    traversal with the same per-triangle 16x16 barycentric alpha bitmaps the
    raster kernel uses (docs/PARITY.md alpha_bitmap divergence; baked into
    node_rows channels GRID0+): slots whose bitmap bit at the hit's (u, v) is
    0 simply do not hit, so ONE trace replaces the 3-peel IgnoreHit loop for
    both closest-hit and any-hit masked queries."""
    r = origins.shape[0]
    m = bvh.node_rows.shape[0]

    idx0 = jnp.zeros((r,), jnp.int32)
    if active is not None:
        idx0 = jnp.where(active, idx0, m)
    state = (
        jnp.int32(0),
        idx0,
        jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,)),
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), bool),
    )
    flags = dict(
        any_hit=any_hit, masked_any_hit=masked_any_hit,
        alpha_bitmap_test=alpha_bitmap_test,
    )

    if compact_after is None:
        # Auto: both walk kinds have long straggler tails (park p50 ~ 1/3 of
        # p100 — tools/microbench_rt.py). Closest-hit: deep walks; any-hit:
        # occluded rays park instantly but UNOCCLUDED rays must walk the
        # whole tree to prove a miss (sky/probe rays are mostly unoccluded).
        # 48/x4 then 240/x4 measured best on 512^2 RTGI (720 ms vs 950 for a
        # 32/x4 + 128/x8 schedule, whose stage 1 fires before enough rays
        # park and whose over-shrunk stage 2 then falls back full-width).
        compact_after = 48 if r >= 32 * 1024 else 0
    per_ray_tmin = jnp.ndim(tmin) == 1

    def run_staged(origins_, directions_, tmin_, state_, stages):
        """Chain _phase segments, compacting surviving rays between them.

        ``stages`` = ((step_limit, width_divisor), ...); the final segment
        runs to max_steps. Compaction gathers survivors to the front of a
        smaller buffer (step cost scales with array width — the straggler
        tail stops costing full-width iterations), bit-exact, with a
        full-width cond fallback when more than the buffer survives."""
        if not stages:
            return _phase(bvh, origins_, directions_, tmin_, state_, max_steps,
                          **flags)
        limit, div = stages[0]
        rest = stages[1:]
        r_cur = origins_.shape[0]
        state_ = _phase(bvh, origins_, directions_, tmin_, state_, limit, **flags)
        cap = max(1024, r_cur // div)
        if cap >= r_cur:
            return run_staged(origins_, directions_, tmin_, state_, rest)

        def finish_full(st):
            return run_staged(origins_, directions_, tmin_, st, rest)

        def finish_compact(st):
            step, idx, bt, bs, bu, bv, bo = st
            act = idx < m
            pos = jnp.cumsum(act.astype(jnp.int32)) - 1
            scat = jnp.where(act, pos, cap)  # OOB (cap) rows drop
            inv = jnp.zeros((cap,), jnp.int32).at[scat].set(
                jnp.arange(r_cur, dtype=jnp.int32), mode="drop"
            )
            lane_ok = jnp.arange(cap, dtype=jnp.int32) < jnp.sum(
                act.astype(jnp.int32)
            )
            o_c = origins_[inv]
            d_c = directions_[inv]
            tmin_c = (
                jnp.asarray(tmin_, jnp.float32)[inv] if per_ray_tmin else tmin_
            )
            sub = (
                step,
                jnp.where(lane_ok, idx[inv], m),
                bt[inv], bs[inv], bu[inv], bv[inv], bo[inv],
            )
            sub = run_staged(o_c, d_c, tmin_c, sub, rest)
            s_step, s_idx, s_bt, s_bs, s_bu, s_bv, s_bo = sub
            back = jnp.where(lane_ok, inv, r_cur)  # OOB rows drop
            return (
                s_step,
                idx.at[back].set(s_idx, mode="drop"),
                bt.at[back].set(s_bt, mode="drop"),
                bs.at[back].set(s_bs, mode="drop"),
                bu.at[back].set(s_bu, mode="drop"),
                bv.at[back].set(s_bv, mode="drop"),
                bo.at[back].set(s_bo, mode="drop"),
            )

        n_act = jnp.sum((state_[1] < m).astype(jnp.int32))
        return jax.lax.cond(n_act <= cap, finish_compact, finish_full, state_)

    if compact_after <= 0 or compact_after >= max_steps or r < 4 * 1024:
        state = _phase(bvh, origins, directions, tmin, state, max_steps, **flags)
    else:
        # Two compaction stages: survivors after `compact_after` steps drop
        # to width r/div (with a full-width cond fallback when most rays are
        # still live — e.g. stage 1 on deep scenes); stragglers drop again,
        # harder, at 4x the step count.
        # Schedule by batch size (both measured on the SAH tree): big
        # batches (262k-ray RTGI, 410k-ray probes) park FAST on their
        # workloads — a /4 stage 1 sticks and wins (715 ms RTGI vs 900 for
        # /2 + /8); primary-ray batches (65k) still have ~half the rays
        # live at step 48, so /4 falls back full-width (290 ms) while
        # gradual /2 + /8 sticks (147 ms).
        if r > 128 * 1024:
            stages = (
                (compact_after, compact_div),
                (compact_after * 5, compact_div),
            )
        else:
            stages = (
                (compact_after, max(2, compact_div // 2)),
                (compact_after * 4, compact_div * 2),
            )
        state = run_staged(origins, directions, tmin, state, stages)

    steps, idx_f, best_t, best_slot, best_u, best_v, _ = state
    return Hits(
        t=best_t, slot=best_slot, u=best_u, v=best_v,
        steps=steps, overflow=jnp.any(idx_f < m),
    )


def occlusion(bvh: DeviceBVH, origins, directions, tmin, tmax, max_steps=1024,
              active=None):
    """(R,) bool — True where the segment is occluded (any-hit shadow query).

    ``active``: rays outside the mask report unoccluded without walking —
    callers whose shading ignores the occlusion term for missed primary rays
    (probe/RTGI sun tests) pass their hit mask so compaction drops the
    sky-ray lanes immediately."""
    hits = trace_rays(bvh, origins, directions, tmin, tmax, any_hit=True,
                      max_steps=max_steps, active=active)
    live = jnp.ones(origins.shape[:1], bool) if active is None else active
    return (hits.slot >= 0) & live
