"""Proxy (decimated) meshes for triangle-rate-bound raster passes.

The binned rasterizer's cost is dominated by its scalar Phase A — ~45-65 cycles
per (triangle, window) touch (docs/ROADMAP.md) — so passes whose OUTPUT is low
frequency (128^2 RSM flux maps, far shadow cascades at 1024^2 covering 32-128 m)
pay full per-triangle cost for detail their texels cannot resolve. The reference
rasterizes full geometry into these targets on a hardware rasterizer where
triangles are nearly free (light_propagation_volume.cpp:548-617,
directional_light.cpp:305-326); on TPU the idiomatic fix is level-of-detail:
a vertex-clustered proxy mesh built once at scene bake.

Vertex clustering (Rossignac-Borrel): snap vertices to a uniform grid of
``cell_size`` meters (keyed per-primitive so dynamic transforms stay exact),
collapse each cell to its mean vertex, drop degenerate triangles, and dedupe
collapsed duplicates. Robust, O(V), and preserves material ids / double-sided
flags per triangle. Typical reduction on the bench scene: ~8-10x fewer
triangles at 0.25 m cells.

Divergence from the reference (documented in docs/PARITY.md): RSM flux/depth
and far-cascade shadow silhouettes come from geometry simplified to
``cell_size``; masked (alpha-tested) triangles become solid in the proxy
(conservative occlusion). Near cascades (0..shadow_proxy_from_cascade-1) and
every visible-surface raster keep full geometry.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ProxyMesh(NamedTuple):
    """Device-resident decimated geometry (pytree; padded static shapes)."""

    positions: jnp.ndarray  # (Vp, 3) f32 world
    normals: jnp.ndarray  # (Vp, 3) f32 (cluster mean, normalized)
    uvs: jnp.ndarray  # (Vp, 2) f32 (cluster mean — approximate across seams)
    colors: jnp.ndarray  # (Vp, 4) f32 (cluster mean vertex color)
    vertex_prim: jnp.ndarray  # (Vp,) i32 owning primitive (dynamic updates)
    tri_indices: jnp.ndarray  # (Np, 3) i32
    tri_material: jnp.ndarray  # (Np,) i32
    tri_double_sided: jnp.ndarray  # (Np,) bool
    tri_valid: jnp.ndarray  # (Np,) bool
    # Baked per-triangle corners (see SceneArrays.tri_corner_pos).
    corners: jnp.ndarray  # (Np, 3, 3) f32
    # Baked attribute corners + material consts in SceneArrays' channel order
    # (tangents zero — proxy resolves never normal-map). These make proxy
    # resolves (RSM flux) plane-gather based like the main view's, instead of
    # re-issuing per-pixel vertex gathers (ops/lpv.py::_resolve_rsm).
    attr_corners: jnp.ndarray  # (Np, 3, 16) f32
    consts: jnp.ndarray  # (Np, 12) f32


def _pad(a: np.ndarray, rows: int, fill=0):
    out = np.full((rows, *a.shape[1:]), fill, a.dtype)
    out[: a.shape[0]] = a
    return out


def build_proxy_mesh(
    positions: np.ndarray,  # (V, 3) world
    normals: np.ndarray,  # (V, 3)
    uvs: np.ndarray,  # (V, 2)
    colors: np.ndarray,  # (V, 4)
    vertex_prim: np.ndarray,  # (V,) i32
    tri_indices: np.ndarray,  # (N, 3) i32
    tri_material: np.ndarray,  # (N,) i32
    tri_double_sided: np.ndarray,  # (N,) bool
    cell_size: float = 0.25,
    pad: int = 512,
):
    """Vertex-cluster decimation (host, bake time).

    Returns (ProxyMesh, host) — ``host`` carries the vertex->cluster mapping
    (``inv``) so scene/dynamic.py can bake OBJECT-space cluster means (the mean
    commutes with the per-primitive affine transform, so the dynamic update is
    exact)."""
    v = positions.shape[0]
    cells = np.floor(positions.astype(np.float64) / cell_size).astype(np.int64)
    # Cluster key = (primitive, cell) — never merge across primitives, so the
    # per-primitive transform update (scene/dynamic.py) stays exact.
    key = np.concatenate(
        [vertex_prim.astype(np.int64)[:, None], cells], axis=1
    )  # (V, 4)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    vp = uniq.shape[0]

    def mean_per_cluster(vals):
        acc = np.zeros((vp, vals.shape[1]), np.float64)
        np.add.at(acc, inv, vals.astype(np.float64))
        cnt = np.zeros((vp,), np.float64)
        np.add.at(cnt, inv, 1.0)
        return (acc / np.maximum(cnt[:, None], 1.0)).astype(np.float32)

    p_pos = mean_per_cluster(positions)
    p_nrm = mean_per_cluster(normals)
    nl = np.linalg.norm(p_nrm, axis=1, keepdims=True)
    p_nrm = np.where(nl > 1e-6, p_nrm / np.maximum(nl, 1e-12), [0.0, 1.0, 0.0])
    p_uv = mean_per_cluster(uvs)
    p_col = mean_per_cluster(colors)
    p_prim = uniq[:, 0].astype(np.int32)

    ptri = inv[tri_indices]  # (N, 3) cluster ids
    nondegen = (
        (ptri[:, 0] != ptri[:, 1])
        & (ptri[:, 1] != ptri[:, 2])
        & (ptri[:, 0] != ptri[:, 2])
    )
    ptri = ptri[nondegen]
    pmat = tri_material[nondegen]
    pdbl = tri_double_sided[nondegen]
    # Dedupe exact collapsed duplicates (winding preserved — no vertex sorting).
    tkey = np.concatenate([ptri, pmat[:, None]], axis=1)
    _, first = np.unique(tkey, axis=0, return_index=True)
    first = np.sort(first)
    ptri, pmat, pdbl = ptri[first], pmat[first], pdbl[first]
    np_tris = ptri.shape[0]

    vp_pad = max(-(-vp // pad) * pad, pad)
    nt_pad = max(-(-np_tris // pad) * pad, pad)
    host = {
        "inv": inv,
        "num_clusters": vp,
        "padded_vertices": vp_pad,
        "num_triangles": np_tris,
    }
    mesh = ProxyMesh(
        positions=jnp.asarray(_pad(p_pos, vp_pad)),
        normals=jnp.asarray(_pad(p_nrm, vp_pad)),
        uvs=jnp.asarray(_pad(p_uv, vp_pad)),
        colors=jnp.asarray(_pad(p_col, vp_pad, fill=1)),
        vertex_prim=jnp.asarray(_pad(p_prim, vp_pad)),
        tri_indices=jnp.asarray(_pad(ptri.astype(np.int32), nt_pad)),
        tri_material=jnp.asarray(_pad(pmat.astype(np.int32), nt_pad)),
        tri_double_sided=jnp.asarray(_pad(pdbl, nt_pad, fill=False)),
        tri_valid=jnp.asarray(
            _pad(np.ones(np_tris, dtype=bool), nt_pad, fill=False)
        ),
        corners=jnp.asarray(
            _pad(p_pos, vp_pad)[_pad(ptri.astype(np.int32), nt_pad)]
        ),
        attr_corners=jnp.asarray(
            _pad(
                np.concatenate(
                    [
                        p_uv,
                        p_nrm,
                        np.zeros((vp, 4), np.float32),
                        p_col[:, :3],
                        p_pos,
                        np.zeros((vp, 1), np.float32),
                    ],
                    axis=1,
                ).astype(np.float32),
                vp_pad,
            )[_pad(ptri.astype(np.int32), nt_pad)]
        ),
        # Filled by the scene bake (needs the material tables): scene.py calls
        # _bake_tri_consts on the proxy's tri_material after construction.
        consts=jnp.zeros((nt_pad, 12), jnp.float32),
    )
    return mesh, host


def swap_in_proxy(scene):
    """SceneArrays view whose GEOMETRY fields are the proxy's.

    Raster + resolve paths (RSM build, shadow cascades) consume the result
    exactly like a full scene: materials, textures, sun, and BVH fields pass
    through untouched. Tangents are zeroed (proxy resolves never normal-map)
    and alpha modes are opaque (masked geometry is solid in the proxy)."""
    p = scene.proxy
    vp = p.positions.shape[0]
    nt = p.tri_indices.shape[0]
    return scene._replace(
        positions=p.positions,
        normals=p.normals,
        tangents=jnp.zeros((vp, 4), jnp.float32),
        uvs=p.uvs,
        colors=p.colors,
        tri_indices=p.tri_indices,
        tri_material=p.tri_material,
        tri_primitive=jnp.zeros((nt,), jnp.int32),
        tri_double_sided=p.tri_double_sided,
        tri_alpha_mode=jnp.zeros((nt,), jnp.int32),
        tri_alpha_grid=jnp.full((nt, 8), -1, jnp.int32),
        tri_valid=p.tri_valid,
        tri_corner_pos=p.corners,
        tri_attr_corners=p.attr_corners,
        tri_consts=p.consts,
    )
