"""Lockstep BVH traversal — the TPU replacement for RT pipelines / ray queries.

Every ray carries ONE integer of traversal state (preorder skip-link BVH,
scene/bvh.py): per step, gather the node, slab-test, and either descend
(``idx + 1``) or skip (``miss``); leaves Moller-Trumbore-test their 4 triangle slots.
All rays advance in lockstep inside one ``lax.while_loop`` — pure gathers + VPU math,
no divergence control flow. Any-hit rays (shadows/AO) park at the end index as soon
as they find an occluder.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Must match scene/bvh.py LEAF_SIZE (kept local to avoid a package import cycle;
# scene.build asserts equality).
LEAF_SIZE = 4


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


class Hits(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance (tmax where missed)
    slot: jnp.ndarray  # (R,) hit slot id, -1 = miss
    u: jnp.ndarray  # (R,) barycentric u
    v: jnp.ndarray  # (R,) barycentric v


def trace_rays(
    bvh: DeviceBVH,
    origins: jnp.ndarray,  # (R, 3)
    directions: jnp.ndarray,  # (R, 3) need not be normalized
    tmin,
    tmax,
    any_hit: bool = False,
    max_steps: int = 512,
    active: jnp.ndarray | None = None,  # (R,) bool — inactive rays report miss
    slot_opaque: jnp.ndarray | None = None,  # (S,) bool — see below
) -> Hits:
    """Closest-hit (or any-hit) trace of R rays.

    ``tmin`` may be per-ray (R,) — used by the alpha-test re-trace loop to peel
    past ignored hits. ``slot_opaque`` changes any-hit semantics to match the
    reference's masked any-hit shader (gltf_basic_pbr.slang:291-317): rays park
    (terminate) only on OPAQUE hits; alpha-masked hits keep the closest-so-far
    and continue, so the caller can alpha-test the committed hit and re-trace.
    """
    r = origins.shape[0]
    m = bvh.node_min.shape[0]
    inv_d = 1.0 / jnp.where(directions == 0.0, 1e-30, directions)

    idx0 = jnp.zeros((r,), jnp.int32)
    if active is not None:
        idx0 = jnp.where(active, idx0, m)
    best_t = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    best_slot = jnp.full((r,), -1, jnp.int32)
    best_u = jnp.zeros((r,), jnp.float32)
    best_v = jnp.zeros((r,), jnp.float32)

    def cond(state):
        step, idx, *_ = state
        return (step < max_steps) & jnp.any(idx < m)

    def body(state):
        step, idx, best_t, best_slot, best_u, best_v = state
        active = idx < m
        ni = jnp.minimum(idx, m - 1)
        nmin = bvh.node_min[ni]
        nmax = bvh.node_max[ni]
        miss = bvh.node_miss[ni]
        first = bvh.node_first[ni]
        count = bvh.node_count[ni]

        t0 = (nmin - origins) * inv_d
        t1 = (nmax - origins) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = active & (tn <= tf) & (tf >= tmin) & (tn <= best_t)

        is_leaf = box_hit & (first >= 0)

        # Test the leaf's triangle slots (static unroll over LEAF_SIZE).
        for k in range(LEAF_SIZE):
            slot = first + k
            live = is_leaf & (k < count)
            sl = jnp.maximum(slot, 0)
            v0 = bvh.slot_v0[sl]
            e1 = bvh.slot_e1[sl]
            e2 = bvh.slot_e2[sl]
            pvec = jnp.cross(directions, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            tvec = origins - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(directions * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            ok = (
                live
                & (jnp.abs(det) > 1e-12)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > tmin)
                & (t < best_t)
            )
            best_slot = jnp.where(ok, slot, best_slot)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            best_t = jnp.where(ok, t, best_t)

        descend = box_hit & (first < 0)
        nxt = jnp.where(descend, idx + 1, miss)
        nxt = jnp.where(active, nxt, idx)
        if any_hit:
            committed = best_slot >= 0
            if slot_opaque is not None:
                # Park only on opaque hits; masked hits need the caller's
                # alpha test (reference any-hit IgnoreHit path).
                committed = committed & slot_opaque[jnp.maximum(best_slot, 0)]
            nxt = jnp.where(committed, m, nxt)
        return step + 1, nxt, best_t, best_slot, best_u, best_v

    state = (jnp.int32(0), idx0, best_t, best_slot, best_u, best_v)
    _, _, best_t, best_slot, best_u, best_v = jax.lax.while_loop(cond, body, state)
    return Hits(t=best_t, slot=best_slot, u=best_u, v=best_v)


def occlusion(bvh: DeviceBVH, origins, directions, tmin, tmax, max_steps=512):
    """(R,) bool — True where the segment is occluded (any-hit shadow query)."""
    hits = trace_rays(bvh, origins, directions, tmin, tmax, any_hit=True,
                      max_steps=max_steps)
    return hits.slot >= 0
