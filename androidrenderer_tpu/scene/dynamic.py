"""Dynamic scenes — per-frame primitive transforms with BVH refit.

The reference updates primitives per frame through scatter uploads and rebuilds
the TLAS when dirty (render_scene.cpp:90-106, scatter_upload_buffer.hpp:16-33,
raytracing_scene.cpp:50-170). The TPU-native equivalent is a pure jitted update:

    scene2 = update_primitive_transforms(scene, dyn, transforms)   # inside jit

re-derives every transform-dependent device array from baked OBJECT-space data —
world vertices/normals/tangents (per-vertex FMAs against per-primitive matrices),
primitive bounding spheres (conservative Frobenius scale bound), and the RT BVH
via a REFIT: the skip-link BVH's topology (an implicitly-balanced complete tree
over Morton-ordered leaves) is static, so only node AABBs and the slot triangle
data recompute — bottom-up level reductions scattered into the baked preorder
slots (bvh.complete_tree_level_slots).

Refit keeps traversal CORRECT under any motion; tree QUALITY degrades if
primitives travel far from their built positions (boxes inflate). Rebuild from
the host (RenderScene.build) when the scene has deformed beyond recognition —
exactly the reference's refit-vs-rebuild tradeoff.

Limitations: emissive GI point clouds stay at their baked positions (moving
emissive meshes need a host rebuild), and Morton leaf order is from build time.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np

from androidrenderer_tpu.ops.rt.traverse import DeviceBVH
from androidrenderer_tpu.scene.bvh import LEAF_SIZE
from androidrenderer_tpu.scene.scene import SceneArrays


class DynamicSceneData(NamedTuple):
    """Object-space source data for in-jit transform updates (pytree)."""

    base_positions: jnp.ndarray  # (V, 3) object space
    base_normals: jnp.ndarray  # (V, 3)
    base_tangents: jnp.ndarray  # (V, 4)
    vertex_prim: jnp.ndarray  # (V,) i32 primitive owning each vertex
    base_bounds: jnp.ndarray  # (P, 4) object-space sphere [center, radius]
    level_slots: List[jnp.ndarray]  # preorder slots per BVH level (static topo)
    # Object-space cluster means for the proxy mesh (scene/proxy.py). Clusters
    # never span primitives, so the mean commutes with the per-primitive affine
    # transform: world proxy vertex = M_prim @ object cluster mean, EXACTLY the
    # world-rebuilt cluster mean.
    proxy_base_positions: jnp.ndarray  # (Vp, 3)
    proxy_base_normals: jnp.ndarray  # (Vp, 3)


def update_primitive_transforms(
    scene: SceneArrays,
    dyn: DynamicSceneData,
    transforms: jnp.ndarray,  # (P, 4, 4) model -> world per primitive
) -> SceneArrays:
    """Pure update: new SceneArrays with every transform-dependent array rebuilt."""
    vp = dyn.vertex_prim
    # Flat 16-wide row gather then reshape — a (P, 4, 4) slice gather lowers to
    # the ~8x slower multi-dim gather form (tools/microbench_gather.py).
    p = transforms.shape[0]
    m = transforms.reshape(p, 16)[vp].reshape(vp.shape[0], 4, 4)  # (V, 4, 4)

    def xform(base, rows):  # broadcast FMAs (batched tiny matmuls are a TPU trap)
        return (
            rows[:, :, 0] * base[:, 0:1]
            + rows[:, :, 1] * base[:, 1:2]
            + rows[:, :, 2] * base[:, 2:3]
        )

    positions = xform(dyn.base_positions, m[:, :3, :3]) + m[:, :3, 3]

    # Normal matrix = inverse-transpose of the upper 3x3, per PRIMITIVE.
    r = transforms[:, :3, :3]
    nmat = jnp.transpose(jnp.linalg.inv(r), (0, 2, 1))  # (P, 3, 3)
    nm = nmat[vp]
    normals = xform(dyn.base_normals, nm)
    normals = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12
    )
    tan_xyz = xform(dyn.base_tangents[:, :3], m[:, :3, :3])
    tl = jnp.linalg.norm(tan_xyz, axis=-1, keepdims=True)
    tan_xyz = jnp.where(tl > 1e-12, tan_xyz / jnp.maximum(tl, 1e-12), tan_xyz)
    tangents = jnp.concatenate([tan_xyz, dyn.base_tangents[:, 3:4]], axis=-1)

    # Bounding spheres: exact center transform + conservative Frobenius-norm
    # radius scale (sigma_max <= ||R||_F; a bigger sphere is never wrongly culled).
    c = dyn.base_bounds[:, :3]
    wc = (
        r[:, :, 0] * c[:, 0:1] + r[:, :, 1] * c[:, 1:2] + r[:, :, 2] * c[:, 2:3]
        + transforms[:, :3, 3]
    )
    scale = jnp.sqrt(jnp.sum(r * r, axis=(1, 2)))
    prim_bounds = jnp.concatenate(
        [wc, (dyn.base_bounds[:, 3] * scale)[:, None]], axis=-1
    )
    np_ = scene.prim_bounds.shape[0]
    prim_bounds = scene.prim_bounds.at[: prim_bounds.shape[0]].set(
        prim_bounds[:np_]
    )

    # Proxy geometry rides the same transforms (cluster means commute with the
    # per-primitive affine — see DynamicSceneData).
    pvp = scene.proxy.vertex_prim
    pm = transforms.reshape(p, 16)[pvp].reshape(pvp.shape[0], 4, 4)
    ppos = xform(dyn.proxy_base_positions, pm[:, :3, :3]) + pm[:, :3, 3]
    pnrm = xform(dyn.proxy_base_normals, nmat[pvp])
    pnrm = pnrm / jnp.maximum(jnp.linalg.norm(pnrm, axis=-1, keepdims=True), 1e-12)
    proxy = scene.proxy._replace(
        positions=ppos, normals=pnrm, corners=ppos[scene.proxy.tri_indices],
        # Attribute-corner refresh (uv/color static, tangents zero, consts
        # transform-invariant) — mirrors the main scene's tri_attr_corners
        # rebuild below.
        attr_corners=jnp.concatenate(
            [
                scene.proxy.uvs,
                pnrm,
                jnp.zeros((ppos.shape[0], 4), jnp.float32),
                scene.proxy.colors[:, :3],
                ppos,
                jnp.zeros((ppos.shape[0], 1), jnp.float32),
            ],
            axis=1,
        )[scene.proxy.tri_indices],
    )

    bvh = refit_bvh(scene.bvh, positions, scene.tri_indices, dyn.level_slots)
    return scene._replace(
        positions=positions,
        normals=normals,
        tangents=tangents,
        prim_bounds=prim_bounds,
        bvh=bvh,
        proxy=proxy,
        # Corner-table refresh: the per-frame raster setup is gather-free, so
        # the 3 gathers move here, paid only when transforms change.
        tri_corner_pos=positions[scene.tri_indices],
        # Attribute-corner refresh (uv/color static; normal/tangent/position
        # transform): same deal — pack_attribute_planes is gather-free per
        # frame, the rebuild is paid here.
        tri_attr_corners=jnp.concatenate(
            [
                scene.uvs,
                normals,
                tangents,
                scene.colors[:, :3],
                positions,
                jnp.zeros((positions.shape[0], 1), jnp.float32),
            ],
            axis=1,
        )[scene.tri_indices],
    )


def refit_bvh(
    bvh: DeviceBVH,
    positions: jnp.ndarray,
    tri_indices: jnp.ndarray,
    level_slots: List[jnp.ndarray],
) -> DeviceBVH:
    """Recompute node AABBs + slot triangle data for moved vertices (topology,
    miss links, and leaf assignments are static — raytracing_scene refit)."""
    slots = bvh.slot_tri
    safe = jnp.maximum(slots, 0)
    idx = tri_indices[safe]
    t0 = positions[idx[:, 0]]
    t1 = positions[idx[:, 1]]
    t2 = positions[idx[:, 2]]
    dead = (slots < 0)[:, None]
    slot_v0 = jnp.where(dead, 0.0, t0)
    slot_e1 = jnp.where(dead, 0.0, t1 - t0)
    slot_e2 = jnp.where(dead, 0.0, t2 - t0)

    tmin = jnp.where(dead, jnp.inf, jnp.minimum(jnp.minimum(t0, t1), t2))
    tmax = jnp.where(dead, -jnp.inf, jnp.maximum(jnp.maximum(t0, t1), t2))
    p = slots.shape[0] // LEAF_SIZE
    mins = [tmin.reshape(p, LEAF_SIZE, 3).min(axis=1)]
    maxs = [tmax.reshape(p, LEAF_SIZE, 3).max(axis=1)]
    while mins[-1].shape[0] > 1:
        m = mins[-1].reshape(-1, 2, 3)
        x = maxs[-1].reshape(-1, 2, 3)
        mins.append(jnp.minimum(m[:, 0], m[:, 1]))
        maxs.append(jnp.maximum(x[:, 0], x[:, 1]))

    node_min = bvh.node_min
    node_max = bvh.node_max
    for lvl, s in enumerate(level_slots):
        node_min = node_min.at[s].set(mins[lvl])
        node_max = node_max.at[s].set(maxs[lvl])
    # All-padded subtrees come out of the unions inverted (+inf, -inf) —
    # ALWAYS-HIT under the slab test (scene/bvh.py sanitize_padded_boxes);
    # replace them with the finite far sentinel, same as the host build.
    from androidrenderer_tpu.scene.bvh import FAR_SENTINEL

    inverted = (node_min[:, 0] > node_max[:, 0])[:, None]
    node_min = jnp.where(inverted, FAR_SENTINEL, node_min)
    node_max = jnp.where(inverted, FAR_SENTINEL, node_max)
    # Rebuild the packed traversal rows (ops/rt/traverse.py layout). The
    # LEAF_SIZE*3 M-row gathers cost ~20 ms at 155k nodes — paid per refit,
    # saving 16 gathers per ray per traversal STEP. Per-slot opacity is
    # topology-static: reuse it from the old rows (channels 45:49 keyed by
    # node_first, which never changes in a refit).
    from androidrenderer_tpu.ops.rt.traverse import LOOK0, OPQ0, pack_node_rows

    rows = pack_node_rows(
        node_min, node_max, bvh.node_miss, bvh.node_first, bvh.node_count,
        slot_v0, slot_e1, slot_e2,
    )
    # Splice: opacity + alpha grids [OPQ0:LOOK0] are topology-static (keyed by
    # node_first) — reuse them; the lookahead target BOXES [LOOK0:] follow the
    # refit geometry and must come from the fresh pack (target SLOTS are
    # topology-static either way).
    rows = jnp.concatenate(
        [rows[:, :OPQ0], bvh.node_rows[:, OPQ0:LOOK0], rows[:, LOOK0:]],
        axis=1,
    )
    return bvh._replace(
        node_min=node_min, node_max=node_max,
        slot_v0=slot_v0, slot_e1=slot_e1, slot_e2=slot_e2,
        node_rows=rows,
    )


def make_dynamic_data(render_scene, scene: SceneArrays) -> DynamicSceneData:
    """Bake the object-space source arrays for a built RenderScene."""
    all_pos, all_nrm, all_tan, vp = [], [], [], []
    bounds = []
    for pid, prim in enumerate(render_scene.primitives):
        mesh = render_scene.meshes.meshes[prim.mesh_id]
        s, e = mesh.first_vertex, mesh.first_vertex + mesh.num_vertices
        all_pos.append(render_scene.meshes.positions[s:e])
        all_nrm.append(render_scene.meshes.normals[s:e])
        all_tan.append(render_scene.meshes.tangents[s:e])
        vp.append(np.full(mesh.num_vertices, pid, np.int32))
        bounds.append(mesh.bounds_sphere)
    pos = np.concatenate(all_pos)
    v = scene.positions.shape[0]

    def pad(a, fill=0.0):
        out = np.full((v, *a.shape[1:]), fill, a.dtype)
        out[: a.shape[0]] = a
        return jnp.asarray(out)

    from androidrenderer_tpu.scene.bvh import complete_tree_level_slots

    # Object-space cluster means for the proxy (same vertex order as the bake,
    # so proxy_host["inv"] maps directly).
    inv = render_scene.proxy_host["inv"]
    vp_n = render_scene.proxy_host["num_clusters"]
    vp_pad = render_scene.proxy_host["padded_vertices"]
    nrm = np.concatenate(all_nrm)

    def cluster_mean(vals):
        acc = np.zeros((vp_pad, vals.shape[1]), np.float64)
        np.add.at(acc, inv, vals.astype(np.float64))
        cnt = np.zeros((vp_pad,), np.float64)
        np.add.at(cnt, inv, 1.0)
        return jnp.asarray((acc / np.maximum(cnt[:, None], 1.0)).astype(np.float32))

    p = int(scene.bvh.slot_tri.shape[0]) // LEAF_SIZE
    return DynamicSceneData(
        base_positions=pad(pos.astype(np.float32)),
        base_normals=pad(nrm.astype(np.float32)),
        base_tangents=pad(np.concatenate(all_tan).astype(np.float32)),
        vertex_prim=pad(np.concatenate(vp)),
        base_bounds=jnp.asarray(np.stack(bounds).astype(np.float32)),
        level_slots=[jnp.asarray(s) for s in complete_tree_level_slots(p)],
        proxy_base_positions=cluster_mean(pos),
        proxy_base_normals=cluster_mean(nrm),
    )


def initial_transforms(render_scene) -> jnp.ndarray:
    """(P, 4, 4) the transforms the scene was built with."""
    return jnp.asarray(
        np.stack([p.transform for p in render_scene.primitives]).astype(np.float32)
    )
