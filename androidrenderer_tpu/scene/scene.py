"""RenderScene — the primitive pool + sun/sky owner, and its device-side pytree.

Mirrors the reference's RenderScene (render_scene.hpp:22-124): an ObjectPool of
MeshPrimitives whose GPU face is the PrimitiveDataGPU buffer with pointers into the
mesh/material pools (render_scene.cpp:38-88), plus the sun and procedural sky.

TPU-native redesign: ``build()`` bakes the scene into :class:`SceneArrays`, a NamedTuple
pytree of device arrays. Primitive transforms are folded into world-space vertex
mega-arrays at build time (primitives are static after add_to_scene in the reference
too — gltf_model.cpp:141), triangle-level tables carry material/primitive ids, and
every axis is padded to static capacity so the whole frame stays one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.scene.material_storage import (
    ALPHA_BLEND,
    ALPHA_MASK,
    ALPHA_OPAQUE,
    MaterialStorage,
)
from androidrenderer_tpu.scene.mesh_storage import MAX_POINT_CLOUD_POINTS, MeshStorage
from androidrenderer_tpu.scene.bvh import LEAF_SIZE, build_bvh
from androidrenderer_tpu.scene.proxy import ProxyMesh, build_proxy_mesh
from androidrenderer_tpu.ops.rt.traverse import DeviceBVH
from androidrenderer_tpu.ops.rt import traverse as _traverse

assert _traverse.LEAF_SIZE == LEAF_SIZE


def _pad_rows(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.full((n - a.shape[0], *a.shape[1:]), fill, dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bake_tri_consts(tri_material, mat_params, tex_start, tex_log2b):
    """(N, 12) per-triangle material constants in pack_attribute_planes'
    channel order: base(3) metal(1) rough(1) emission(3) packed_tex(4)."""
    from androidrenderer_tpu.scene.material_storage import START_ALIGN

    m = np.asarray(tri_material)
    tex_ids = np.asarray(mat_params["entry_ids"])[m]  # (N, 4)
    packed = (
        np.asarray(tex_start)[tex_ids] // START_ALIGN
    ) * 16 + np.asarray(tex_log2b)[tex_ids]
    return np.concatenate(
        [
            np.asarray(mat_params["base_color_factor"])[m][:, :3],
            np.asarray(mat_params["metal_rough_factor"])[m],
            np.asarray(mat_params["emission_factor"])[m],
            packed.astype(np.float32),
        ],
        axis=1,
    ).astype(np.float32)


class SceneArrays(NamedTuple):
    """Device-resident scene — the TPU analog of the mesh/material/primitive buffers."""

    # Instance-expanded world-space geometry (V = padded vertex count).
    positions: jnp.ndarray  # (V, 3) f32
    normals: jnp.ndarray  # (V, 3) f32 (world, normalized)
    tangents: jnp.ndarray  # (V, 4) f32 (world xyz, handedness w)
    uvs: jnp.ndarray  # (V, 2) f32
    colors: jnp.ndarray  # (V, 4) f32
    # Triangle tables (N = padded triangle count).
    tri_indices: jnp.ndarray  # (N, 3) i32
    tri_material: jnp.ndarray  # (N,) i32
    tri_primitive: jnp.ndarray  # (N,) i32
    tri_double_sided: jnp.ndarray  # (N,) bool
    tri_alpha_mode: jnp.ndarray  # (N,) i32 (0 opaque / 1 mask / 2 blend)
    # Per-triangle 16x16 barycentric alpha-test bitmap (8 x u32 as i32), baked
    # from the base-color texture at LOD 0: bit (v*16+u) = alpha(lam1=(u+.5)/16,
    # lam2=(v+.5)/16) >= cutoff. Lets the raster kernel alpha-test in-flight
    # (one pass, no peel layers / per-layer texture gathers). All-ones for
    # non-masked triangles.
    tri_alpha_grid: jnp.ndarray  # (N, 8) i32
    tri_valid: jnp.ndarray  # (N,) bool
    # Baked per-triangle corner positions (world): the raster setup's vertex
    # fetch (6 gathers x N rows, ~28 ms/frame at 310k tris) collapses to zero
    # runtime gathers (ops/raster/setup.py::triangle_setup_corners). Refreshed
    # on dynamic transform updates (scene/dynamic.py).
    tri_corner_pos: jnp.ndarray  # (N, 3, 3) f32
    # Baked per-triangle ATTRIBUTE corners + material constants for the
    # attribute-plane pack (gbuffer.pack_attribute_planes): the 3 vertex-attr
    # gathers + 5 material-table gathers it issued per frame (~6 ms at 310k
    # tris) collapse to pure FMAs. Channel layout matches gbuffer's ATTR order
    # (uv 2, normal 3, tangent 4, color 3, position 3, pad 1) / const order
    # (base 3, metal 1, rough 1, emission 3, packed_tex 4). Attr corners are
    # refreshed on dynamic transform updates; consts are transform-invariant.
    tri_attr_corners: jnp.ndarray  # (N, 3, 16) f32
    tri_consts: jnp.ndarray  # (N, 12) f32
    # Primitive table (P = padded primitive count) for culling.
    prim_bounds: jnp.ndarray  # (P, 4) f32 world bounding sphere
    prim_tri_range: jnp.ndarray  # (P, 2) i32 [first_triangle, num_triangles]
    prim_valid: jnp.ndarray  # (P,) bool
    # Materials (M = padded material count).
    mat_base_color: jnp.ndarray  # (M, 4) f32
    mat_metal_rough: jnp.ndarray  # (M, 2) f32
    mat_emission: jnp.ndarray  # (M, 3) f32
    # Pool-ENTRY slots [triple, triple, triple, emission]: slots 0..2 share one
    # material-triple entry (base + normal + MR in one row — one gather/pixel),
    # slot 3 is the emission image's own entry (base-layout channels).
    mat_texture_ids: jnp.ndarray  # (M, 4) i32
    mat_alpha: jnp.ndarray  # (M, 2) f32 [mode, cutoff]
    mat_double_sided: jnp.ndarray  # (M,) bool
    # Texture pool, ONE flat mip-packed tap-packed texel array (R, 117) u8 with
    # material-triple rows (base 2x2 of level L + 3x3 of level L+1 + normal RGB
    # 2x2 + metal-rough 2x2) at native resolutions
    # (material_storage.pack_texture_pool).
    textures: jnp.ndarray
    tex_start: jnp.ndarray  # (E,) i32 flat row of each entry's mip-0 texel (0,0)
    tex_log2b: jnp.ndarray  # (E,) i32 log2 of each entry's base size
    # Lighting environment.
    sun_direction: jnp.ndarray  # (3,) f32 — direction the light TRAVELS (sun -> world)
    sun_color: jnp.ndarray  # (3,) f32 premultiplied color * intensity
    sun_angular_size: jnp.ndarray  # () f32 tan(angular radius), for soft RT shadows
    # Emissive surface point cloud for GI injection (K, 9): pos, normal, radiance.
    emissive_points: jnp.ndarray
    emissive_point_count: jnp.ndarray  # () i32
    # Acceleration structure (RaytracingScene analog) — preorder skip-link BVH.
    bvh: DeviceBVH
    # Vertex-clustered proxy geometry for triangle-rate-bound passes (RSM, far
    # shadow cascades) — scene/proxy.py. The reference rasterizes full geometry
    # everywhere on HW; the TPU-idiomatic fix for scalar-Phase-A-bound targets
    # whose texels cannot resolve the detail is LOD.
    proxy: "ProxyMesh"




@dataclasses.dataclass
class Primitive:
    mesh_id: int
    material_id: int
    transform: np.ndarray  # (4, 4) model -> world


ALPHA_GRID_RES = 16  # barycentric alpha-bitmap lattice (16x16 = 8 u32 words)


def _bake_alpha_grids(alpha_modes, tri_mat, tri_indices, uvs, mat_params, images):
    """(N, 8) i32 alpha-test bitmaps (see SceneArrays.tri_alpha_grid)."""
    n = tri_indices.shape[0]
    grids = np.full((n, 8), -1, np.int64)  # all bits set (opaque)
    masked = np.nonzero(alpha_modes == 1)[0]
    if masked.size == 0:
        return grids.astype(np.int32)
    g = ALPHA_GRID_RES
    l1 = (np.arange(g) + 0.5) / g
    l2 = (np.arange(g) + 0.5) / g
    L1, L2 = np.meshgrid(l1, l2)  # (g, g): rows = lam2 (v), cols = lam1 (u)
    L0 = 1.0 - L1 - L2
    tex_ids = mat_params["texture_ids"][:, 0]
    cutoffs = mat_params["alpha"][:, 1]
    afac = mat_params["base_color_factor"][:, 3]
    word_weights = (np.int64(1) << np.arange(32, dtype=np.int64))[None, None, :]
    # Vectorized over triangles, batched per texture (the per-triangle Python
    # loop cost ~7.5 s of the 310k-tri bake — 90+% of RenderScene.build).
    masked_tex = tex_ids[tri_mat[masked]]
    for ti in np.unique(masked_tex):
        sel_all = masked[masked_tex == ti]
        img = images[ti]
        size = img.shape[0]
        a = img[..., 3].astype(np.float64) / 255.0
        aflat = np.ascontiguousarray(a.reshape(-1))
        for s0 in range(0, sel_all.size, 2048):  # chunked: keeps taps in cache
            sel = sel_all[s0 : s0 + 2048]
            tri = tri_indices[sel]  # (M, 3)
            uv = (
                L0[None, ..., None] * uvs[tri[:, 0], None, None, :]
                + L1[None, ..., None] * uvs[tri[:, 1], None, None, :]
                + L2[None, ..., None] * uvs[tri[:, 2], None, None, :]
            )  # (M, g, g, 2)
            x = uv[..., 0] * size - 0.5
            y = uv[..., 1] * size - 0.5
            x0 = np.floor(x).astype(np.int64)
            y0 = np.floor(y).astype(np.int64)
            fx = x - x0
            fy = y - y0

            def tap(yy, xx):
                # Textures are power-of-two square: wrap via mask, flat gather.
                return aflat[((yy & (size - 1)) << size.bit_length() - 1)
                             + (xx & (size - 1))]

            al = (
                tap(y0, x0) * (1 - fx) * (1 - fy)
                + tap(y0, x0 + 1) * fx * (1 - fy)
                + tap(y0 + 1, x0) * (1 - fx) * fy
                + tap(y0 + 1, x0 + 1) * fx * fy
            ) * afac[tri_mat[sel], None, None]
            bits = al >= cutoffs[tri_mat[sel], None, None]  # (M, g, g)
            # idx = v*16 + u: flatten (g, g) -> 256 bits -> 8 u32 words.
            words = (
                (bits.reshape(len(sel), 8, 32) * word_weights).sum(axis=2)
            )
            grids[sel] = np.where(words >= 2**31, words - 2**32, words)
    return grids.astype(np.int32)


class RenderScene:
    """Host-side scene builder."""

    def __init__(
        self,
        meshes: MeshStorage | None = None,
        materials: MaterialStorage | None = None,
        max_primitives: int = 65536,
    ):
        self.meshes = meshes or MeshStorage()
        self.materials = materials or MaterialStorage()
        self.max_primitives = max_primitives
        self.primitives: List[Primitive] = []
        # Sun defaults: pointing down-ish; color white * intensity (render_scene.cpp
        # sun defaults; exact angles differ per scene).
        self.sun_direction = np.array([0.1, -1.0, 0.3], dtype=np.float32)
        self.sun_color = np.array([1.0, 1.0, 1.0], dtype=np.float32) * 110_000.0
        self.sun_angular_size = 0.00918  # tan(~0.526 deg), solar disc

    def add_primitive(self, mesh_id: int, material_id: int, transform=None) -> int:
        if len(self.primitives) >= self.max_primitives:
            raise RuntimeError("primitive pool exhausted (65536 slots)")
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        self.primitives.append(
            Primitive(mesh_id, material_id, np.asarray(transform, np.float32))
        )
        return len(self.primitives) - 1

    def set_sun(self, direction, color, intensity: float = 1.0) -> None:
        d = np.asarray(direction, np.float64)
        self.sun_direction = (d / np.linalg.norm(d)).astype(np.float32)
        self.sun_color = (np.asarray(color, np.float32) * intensity).astype(np.float32)

    # ------------------------------------------------------------------ build
    def build(
        self, pad: int = 512, with_bvh: bool = True, proxy_cell_size: float = 0.25
    ) -> Tuple[SceneArrays, dict]:
        """Bake to device arrays. Returns (scene_arrays, stats)."""
        all_pos, all_nrm, all_tan, all_uv, all_col, all_vp = [], [], [], [], [], []
        all_tri, all_mat, all_prim, all_dbl, all_alpha = [], [], [], [], []
        prim_bounds, prim_range = [], []
        vtx_base = 0

        mat_params = self.materials.pack_parameters()
        for pid, prim in enumerate(self.primitives):
            mesh = self.meshes.meshes[prim.mesh_id]
            s, e = mesh.first_vertex, mesh.first_vertex + mesh.num_vertices
            m = prim.transform.astype(np.float64)
            pos = self.meshes.positions[s:e].astype(np.float64)
            wpos = pos @ m[:3, :3].T + m[:3, 3]
            # Normal matrix = inverse transpose of upper 3x3.
            nmat = np.linalg.inv(m[:3, :3]).T
            nrm = self.meshes.normals[s:e].astype(np.float64) @ nmat.T
            nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
            tan = self.meshes.tangents[s:e].astype(np.float64)
            tan_w = tan[:, 3:4]
            tan_xyz = tan[:, :3] @ m[:3, :3].T
            tl = np.linalg.norm(tan_xyz, axis=1, keepdims=True)
            tan_xyz = np.where(tl > 1e-12, tan_xyz / np.maximum(tl, 1e-12), tan_xyz)

            all_pos.append(wpos.astype(np.float32))
            all_nrm.append(nrm.astype(np.float32))
            all_tan.append(np.concatenate([tan_xyz, tan_w], axis=1).astype(np.float32))
            all_uv.append(self.meshes.uvs[s:e])
            all_col.append(self.meshes.colors[s:e])
            all_vp.append(np.full(mesh.num_vertices, pid, np.int32))

            tris = self.meshes.mesh_triangles(prim.mesh_id) - mesh.first_vertex + vtx_base
            ntri = tris.shape[0]
            first_tri = sum(t.shape[0] for t in all_tri)
            all_tri.append(tris)
            all_mat.append(np.full(ntri, prim.material_id, np.int32))
            all_prim.append(np.full(ntri, pid, np.int32))
            mat = self.materials.materials[prim.material_id]
            all_dbl.append(np.full(ntri, mat.double_sided, bool))
            all_alpha.append(np.full(ntri, mat.alpha_mode, np.int32))

            # World bounding sphere: transform object sphere (uniform-ish scale assumed;
            # use max singular value for safety).
            c = mesh.bounds_sphere[:3].astype(np.float64)
            r = float(mesh.bounds_sphere[3])
            wc = m[:3, :3] @ c + m[:3, 3]
            scale = np.linalg.svd(m[:3, :3], compute_uv=False)[0]
            prim_bounds.append(np.array([*wc, r * scale], np.float32))
            prim_range.append(np.array([first_tri, ntri], np.int32))
            vtx_base += mesh.num_vertices

        if not all_pos:
            raise RuntimeError("empty scene")

        positions = np.concatenate(all_pos)
        tri_indices = np.concatenate(all_tri)
        nv, nt = positions.shape[0], tri_indices.shape[0]
        npr = len(self.primitives)
        pv, pt, pp = _round_up(nv, pad), _round_up(nt, pad), _round_up(npr, 64)

        tex_pool, tex_start, tex_log2b = self.materials.pack_texture_pool()

        # Emissive surface point clouds for GI mesh lights (render_scene.cpp:257-310,
        # mesh_storage.cpp:246-319): area-weighted samples on every emissive primitive.
        emissive_samples = []
        rng = np.random.default_rng(7)
        for prim in self.primitives:
            mat = self.materials.materials[prim.material_id]
            if np.any(np.asarray(mat.emission_factor) > 0.0):
                pts = self.meshes.sample_surface_points(prim.mesh_id, rng)
                if pts.shape[0] == 0:
                    continue
                m = prim.transform.astype(np.float64)
                wp = pts[:, :3] @ m[:3, :3].T + m[:3, 3]
                nmat = np.linalg.inv(m[:3, :3]).T
                wn = pts[:, 3:6] @ nmat.T
                wn /= np.maximum(np.linalg.norm(wn, axis=1, keepdims=True), 1e-12)
                rad = np.tile(mat.emission_factor, (pts.shape[0], 1))
                emissive_samples.append(
                    np.concatenate([wp, wn, rad], axis=1).astype(np.float32)
                )
        if emissive_samples:
            epts = np.concatenate(emissive_samples)[:MAX_POINT_CLOUD_POINTS]
            ecount = epts.shape[0]
            epts = _pad_rows(epts, _round_up(max(ecount, 1), 256))
        else:
            epts = np.zeros((1, 9), np.float32)
            ecount = 0

        alpha_grid = _bake_alpha_grids(
            np.concatenate(all_alpha), np.concatenate(all_mat), tri_indices,
            np.concatenate(all_uv), mat_params, self.materials._images,
        )

        # BVH over the world-space triangles (RT path). Prefer the native builder
        # (native/sah_native.cpp, ~8x faster, bit-identical output).
        if with_bvh:
            from androidrenderer_tpu import native as _native

            bvh_np = _native.build_bvh_native(positions, tri_indices)
            if bvh_np is None:
                bvh_np = build_bvh(positions, tri_indices)
        else:
            from androidrenderer_tpu.scene.bvh import BVHArrays
            inf = np.full((1, 3), np.inf, np.float32)
            bvh_np = None
        if bvh_np is not None:
            slots = bvh_np.tri_order
            safe = np.maximum(slots, 0)
            t0 = positions[tri_indices[safe, 0]]
            t1 = positions[tri_indices[safe, 1]]
            t2 = positions[tri_indices[safe, 2]]
            dead = (slots < 0)[:, None]
            slot_v0 = np.where(dead, 0.0, t0).astype(np.float32)
            slot_e1 = np.where(dead, 0.0, t1 - t0).astype(np.float32)
            slot_e2 = np.where(dead, 0.0, t2 - t0).astype(np.float32)
            # Per-slot opacity (masked any-hit parks only on opaque hits) is
            # baked into the packed traversal rows.
            tri_alpha_np = np.concatenate(all_alpha)
            slot_opaque_np = np.where(
                slots >= 0, tri_alpha_np[safe] != 1, True
            )
            from androidrenderer_tpu.ops.rt.traverse import pack_node_rows

            device_bvh = DeviceBVH(
                node_min=jnp.asarray(bvh_np.node_min),
                node_max=jnp.asarray(bvh_np.node_max),
                node_miss=jnp.asarray(bvh_np.node_miss),
                node_first=jnp.asarray(bvh_np.node_first),
                node_count=jnp.asarray(bvh_np.node_count),
                slot_tri=jnp.asarray(slots),
                slot_v0=jnp.asarray(slot_v0),
                slot_e1=jnp.asarray(slot_e1),
                slot_e2=jnp.asarray(slot_e2),
                node_rows=pack_node_rows(
                    jnp.asarray(bvh_np.node_min), jnp.asarray(bvh_np.node_max),
                    jnp.asarray(bvh_np.node_miss),
                    jnp.asarray(bvh_np.node_first),
                    jnp.asarray(bvh_np.node_count),
                    jnp.asarray(slot_v0), jnp.asarray(slot_e1),
                    jnp.asarray(slot_e2), jnp.asarray(slot_opaque_np),
                    slot_alpha_grid=jnp.asarray(
                        np.where(slots[:, None] >= 0, alpha_grid[safe], -1)
                    ),
                ),
            )
        else:
            from androidrenderer_tpu.ops.rt.traverse import NODE_ROW_CHANNELS

            from androidrenderer_tpu.scene.bvh import FAR_SENTINEL

            z3 = jnp.zeros((1, 3), jnp.float32)
            empty_rows = jnp.zeros((1, NODE_ROW_CHANNELS), jnp.float32)
            # Degenerate AABB at the FINITE far sentinel: an inverted
            # (+inf,-inf) box is ALWAYS-HIT under the slab test (tn=-inf <=
            # tf=+inf — the round-4 trap sanitize_padded_boxes exists for);
            # the sentinel box genuinely misses every ray.
            empty_rows = empty_rows.at[0, 0:3].set(FAR_SENTINEL)
            empty_rows = empty_rows.at[0, 3:6].set(FAR_SENTINEL)
            empty_rows = empty_rows.at[0, 6].set(1.0)  # miss link -> park
            empty_rows = empty_rows.at[0, 7].set(-1.0)  # inner (no slots)
            from androidrenderer_tpu.ops.rt.traverse import LOOK0

            # No lookahead targets (slot -1; zeroed boxes are never tested
            # because the slot gate fails first).
            empty_rows = empty_rows.at[0, LOOK0:LOOK0 + 4].set(-1.0)
            empty_rows = empty_rows.at[0, LOOK0 + 4:].set(FAR_SENTINEL)
            device_bvh = DeviceBVH(
                node_min=jnp.full((1, 3), jnp.inf),
                node_max=jnp.full((1, 3), -jnp.inf),
                node_miss=jnp.ones((1,), jnp.int32),
                node_first=jnp.full((1,), -1, jnp.int32),
                node_count=jnp.zeros((1,), jnp.int32),
                slot_tri=jnp.full((4,), -1, jnp.int32),
                slot_v0=jnp.zeros((4, 3)), slot_e1=jnp.zeros((4, 3)),
                slot_e2=jnp.zeros((4, 3)),
                node_rows=empty_rows,
            )

        proxy, self.proxy_host = build_proxy_mesh(
            positions, np.concatenate(all_nrm), np.concatenate(all_uv),
            np.concatenate(all_col), np.concatenate(all_vp), tri_indices,
            np.concatenate(all_mat), np.concatenate(all_dbl),
            cell_size=proxy_cell_size,
        )
        proxy = proxy._replace(
            consts=jnp.asarray(_bake_tri_consts(
                np.asarray(proxy.tri_material), mat_params, tex_start, tex_log2b,
            ))
        )
        scene = SceneArrays(
            positions=jnp.asarray(_pad_rows(positions, pv)),
            normals=jnp.asarray(_pad_rows(np.concatenate(all_nrm), pv)),
            tangents=jnp.asarray(_pad_rows(np.concatenate(all_tan), pv)),
            uvs=jnp.asarray(_pad_rows(np.concatenate(all_uv), pv)),
            colors=jnp.asarray(_pad_rows(np.concatenate(all_col), pv, fill=1)),
            tri_indices=jnp.asarray(_pad_rows(tri_indices, pt)),
            tri_material=jnp.asarray(_pad_rows(np.concatenate(all_mat), pt)),
            tri_primitive=jnp.asarray(_pad_rows(np.concatenate(all_prim), pt)),
            tri_double_sided=jnp.asarray(_pad_rows(np.concatenate(all_dbl), pt)),
            tri_alpha_mode=jnp.asarray(_pad_rows(np.concatenate(all_alpha), pt)),
            tri_alpha_grid=jnp.asarray(_pad_rows(alpha_grid, pt, fill=-1)),
            tri_valid=jnp.asarray(
                _pad_rows(np.ones(nt, dtype=bool), pt, fill=False)
            ),
            tri_corner_pos=jnp.asarray(
                _pad_rows(positions, pv)[_pad_rows(tri_indices, pt)]
            ),
            tri_attr_corners=jnp.asarray(
                _pad_rows(
                    np.concatenate(
                        [
                            np.concatenate(all_uv),
                            np.concatenate(all_nrm),
                            np.concatenate(all_tan),
                            np.concatenate(all_col)[:, :3],
                            positions,
                            np.zeros((nv, 1), np.float32),
                        ],
                        axis=1,
                    ).astype(np.float32),
                    pv,
                )[_pad_rows(tri_indices, pt)]
            ),
            tri_consts=jnp.asarray(_bake_tri_consts(
                _pad_rows(np.concatenate(all_mat), pt),
                mat_params, tex_start, tex_log2b,
            )),
            prim_bounds=jnp.asarray(_pad_rows(np.stack(prim_bounds), pp)),
            prim_tri_range=jnp.asarray(_pad_rows(np.stack(prim_range), pp)),
            prim_valid=jnp.asarray(_pad_rows(np.ones(npr, dtype=bool), pp, fill=False)),
            mat_base_color=jnp.asarray(mat_params["base_color_factor"]),
            mat_metal_rough=jnp.asarray(mat_params["metal_rough_factor"]),
            mat_emission=jnp.asarray(mat_params["emission_factor"]),
            mat_texture_ids=jnp.asarray(mat_params["entry_ids"]),
            mat_alpha=jnp.asarray(mat_params["alpha"]),
            mat_double_sided=jnp.asarray(mat_params["double_sided"]),
            textures=jnp.asarray(tex_pool),
            tex_start=jnp.asarray(tex_start),
            tex_log2b=jnp.asarray(tex_log2b),
            sun_direction=jnp.asarray(self.sun_direction),
            sun_color=jnp.asarray(self.sun_color),
            sun_angular_size=jnp.float32(self.sun_angular_size),
            emissive_points=jnp.asarray(epts),
            emissive_point_count=jnp.int32(ecount),
            bvh=device_bvh,
            proxy=proxy,
        )
        stats = {
            "num_vertices": nv,
            "num_triangles": nt,
            "num_primitives": npr,
            "num_materials": len(self.materials.materials),
            "num_textures": self.materials.num_textures,
            "num_masked_triangles": int((np.concatenate(all_alpha) == 1).sum()),
            "num_blend_triangles": int((np.concatenate(all_alpha) == 2).sum()),
            "num_proxy_triangles": int(self.proxy_host["num_triangles"]),
        }
        return scene, stats


