"""Independent full-shading oracle — float64 numpy, written from the REFERENCE's
shader spec (SURVEY.md §2.7), not from the production code.

Implements, per pixel, with no tiling/packing/gather tricks:
  raster coverage/depth (reference_raster.py, float64 2DH edges)
  -> perspective-correct attribute interpolation  (sum(D_i a_i) / sum(D_i))
  -> bilinear base-color texture fetch (repeat wrap, texel centers at (i+.5)/s)
  -> Filament BRDF: Burley diffuse + GGX * height-correlated Smith * Schlick
     (shaders/common/brdf.slangi:22-115)
  -> CSM shadow: cascade pick by view distance, slope-scaled bias
     0.0005*sqrt(1-NoL^2)/NoL (+2e-5 software-raster headroom), 2x2 PCF
     (directional_light.frag:62-110)
  -> direct = NoL * brdf * sun_color * shadow * 0.00031415927
     (directional_light.frag:141-149) + emission
  -> Reinhard luminance tonemap c*(L/(L+1)), gamma 1/2.2
     (scene_upsample.frag:55-73)

tests/test_fidelity.py gates the production pipeline against this oracle at
SSIM >= 0.98 (BASELINE.md criterion) — the first fidelity measure that is NOT
the renderer compared to its own past output.
"""

from __future__ import annotations

import numpy as np

from reference_raster import rasterize_reference


def _normalize(v, axis=-1):
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-12)


def brdf_reference(base_color, normal, metal, rough, l, v):
    """float64 oracle of the reference's ACTUAL shader math (brdf.slangi:22-115).

    Two deliberate departures from Filament's published docs, both faithful to
    the shader: (1) NO perceptual-roughness remap — surface.roughness (data.g
    * roughness_factor, gltf_basic_pbr.slang:222,244) feeds D/V directly;
    (2) D uses the shader's own k-form ``k = r / (1 - NoH^2 + r^2)`` (the
    Filament half-float variant would carry NoH^2 on the r^2 term). Round-3's
    oracle squared roughness per the Filament docs — production (which matches
    the shader) measured 6.3x the oracle's specular on grazing gold, the
    dominant fidelity residual."""
    rough = np.clip(rough, 0.045, 1.0)
    a = rough  # brdf.slangi passes surface.roughness through unsquared
    h = _normalize(l + v)
    nol = np.clip(np.sum(normal * l, axis=-1, keepdims=True), 0.0, 1.0)
    nov = np.abs(np.sum(normal * v, axis=-1, keepdims=True)) + 1e-5
    noh = np.clip(np.sum(normal * h, axis=-1, keepdims=True), 0.0, 1.0)
    loh = np.clip(np.sum(l * h, axis=-1, keepdims=True), 0.0, 1.0)

    # D_GGX (brdf.slangi:22-25: k = r / (1 - NoH^2 + r^2), D = k^2 / pi)
    a2 = a * a
    k = a / np.maximum(1.0 - noh * noh + a2, 1e-12)
    d = k * k / np.pi
    # V_SmithGGXCorrelated (brdf.slangi:29-35, a = surface.roughness)
    ggxv = nol * np.sqrt(nov * nov * (1.0 - a2) + a2)
    ggxl = nov * np.sqrt(nol * nol * (1.0 - a2) + a2)
    vis = 0.5 / np.maximum(ggxv + ggxl, 1e-12)
    # F_Schlick, f90 = 1
    f0 = 0.04 * (1.0 - metal) + base_color * metal
    f = f0 + (1.0 - f0) * (1.0 - loh) ** 5
    specular = d * vis * f
    # Fd_Burley (brdf.slangi:39-45: f90 = 0.5 + 2 * roughness * LoH^2)
    f90 = 0.5 + 2.0 * a * loh * loh

    def schlick(u, one, ninety):
        return one + (ninety - one) * (1.0 - u) ** 5

    fd = schlick(nol, 1.0, f90) * schlick(nov, 1.0, f90) / np.pi
    diffuse_color = base_color * (1.0 - 0.04) * (1.0 - metal)
    return diffuse_color * fd + specular


def sample_texture_bilinear(img, uv):
    """(h, w, c) u8/f64 texture, repeat wrap, float64 [0,1] result."""
    h, w = img.shape[:2]
    u = uv[..., 0] - np.floor(uv[..., 0])
    v = uv[..., 1] - np.floor(uv[..., 1])
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t = img.astype(np.float64) / 255.0

    def at(yy, xx):
        return t[yy % h, xx % w]

    top = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
    bot = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
    return top + (bot - top) * fy


def _mip_chain(img):
    """Box-filtered power-of-two mip chain (round-to-nearest u8 per level)."""
    mips = [np.asarray(img, np.uint8)]
    cur = mips[0].astype(np.float64)
    while cur.shape[0] > 1:
        s = cur.shape[0]
        cur = cur.reshape(s // 2, 2, s // 2, 2, -1).mean(axis=(1, 3))
        mips.append(np.clip(cur + 0.5, 0, 255).astype(np.uint8))
    return mips


def _uv_analytic_lod(clip, tris, uvs, vis, uv_px, width, height, base_size):
    """Per-pixel LOD from the EXACT derivative of the perspective-correct UV:
    uv(p) = f(p)/s(p) with f, s affine in pixel coords (the 2DH edge planes), so
    duv/dx = (f_a*s - f*s_a)/s^2 — what hardware quad derivatives approximate."""
    from reference_raster import clip_to_pixel_h

    v = clip_to_pixel_h(clip.astype(np.float64), width, height)
    e = np.stack([
        np.cross(v[tris[:, 1]], v[tris[:, 2]]),
        np.cross(v[tris[:, 2]], v[tris[:, 0]]),
        np.cross(v[tris[:, 0]], v[tris[:, 1]]),
    ], axis=1)  # (N, 3 edges, 3 coeffs)
    # f_k plane: sum_i e[:, i, :] * uv_i -> (N, 3 coeffs, 2)
    f_pl = (
        e[:, 0, :, None] * uvs[tris[:, 0]][:, None, :]
        + e[:, 1, :, None] * uvs[tris[:, 1]][:, None, :]
        + e[:, 2, :, None] * uvs[tris[:, 2]][:, None, :]
    )
    s_pl = e.sum(axis=1)  # (N, 3)

    t = np.maximum(vis, 0)
    fp = f_pl[t]  # (H, W, 3, 2)
    sp = s_pl[t]  # (H, W, 3)
    px = np.arange(width, dtype=np.float64)[None, :, None]
    py = np.arange(height, dtype=np.float64)[:, None, None]
    s_val = sp[..., 0:1] * px + sp[..., 1:2] * py + sp[..., 2:3]
    inv_s = 1.0 / np.where(s_val == 0.0, 1.0, s_val)
    duvdx = (fp[..., 0, :] - uv_px * sp[..., 0:1]) * inv_s
    duvdy = (fp[..., 1, :] - uv_px * sp[..., 1:2]) * inv_s
    fx = np.sum((duvdx * base_size) ** 2, axis=-1)
    fy = np.sum((duvdy * base_size) ** 2, axis=-1)
    rho2 = np.maximum(np.maximum(fx, fy), 1e-24)
    return 0.5 * np.log2(rho2)


def sample_texture_trilinear(img, uv_px, lod):
    """Mip-mapped trilinear fetch at a per-pixel LOD."""
    mips = _mip_chain(img)
    levels = len(mips) - 1
    lod = np.clip(lod, 0.0, levels)
    l0 = np.floor(lod).astype(np.int64)
    l1 = np.minimum(l0 + 1, levels)
    f = (lod - l0)[..., None]
    out = np.zeros((*uv_px.shape[:-1], img.shape[-1]), np.float64)
    for lv in range(levels + 1):
        m0 = l0 == lv
        m1 = l1 == lv
        if not (m0.any() or m1.any()):
            continue
        s = sample_texture_bilinear(mips[lv], uv_px)
        out = np.where(m0[..., None], out + s * (1.0 - f), out)
        out = np.where(m1[..., None], out + s * f, out)
    return out


def srgb_to_linear(c):
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def shade_reference(
    render_scene,  # host RenderScene (meshes/materials/primitives)
    view,  # camera ViewData
    width: int,
    height: int,
    cascade_matrices: np.ndarray,  # (C, 4, 4) world -> light clip (input data)
    cascade_splits: np.ndarray,  # (C,)
    shadow_resolution: int,
    sun_exposure: float = 0.00031415927,
    bias_scale: float = 0.0005,
    use_normal_maps: bool = True,
    use_mr_textures: bool = True,
):
    """(H, W, 3) u8 — full direct-light frame, independently implemented."""
    # ---- flatten the scene to world-space triangles (float64) ----
    pos_l, nrm_l, tan_l, col_l, uv_l, tri_l, mat_l = [], [], [], [], [], [], []
    vbase = 0
    for prim in render_scene.primitives:
        mesh = render_scene.meshes.meshes[prim.mesh_id]
        s, e = mesh.first_vertex, mesh.first_vertex + mesh.num_vertices
        m = prim.transform.astype(np.float64)
        p = render_scene.meshes.positions[s:e].astype(np.float64)
        pos_l.append(p @ m[:3, :3].T + m[:3, 3])
        nmat = np.linalg.inv(m[:3, :3]).T
        n = render_scene.meshes.normals[s:e].astype(np.float64) @ nmat.T
        nrm_l.append(_normalize(n))
        tan = render_scene.meshes.tangents[s:e].astype(np.float64)
        txyz = tan[:, :3] @ m[:3, :3].T
        tl = np.linalg.norm(txyz, axis=1, keepdims=True)
        txyz = np.where(tl > 1e-12, txyz / np.maximum(tl, 1e-12), txyz)
        tan_l.append(np.concatenate([txyz, tan[:, 3:4]], axis=1))
        col_l.append(render_scene.meshes.colors[s:e].astype(np.float64))
        uv_l.append(render_scene.meshes.uvs[s:e].astype(np.float64))
        t = render_scene.meshes.mesh_triangles(prim.mesh_id) - mesh.first_vertex
        tri_l.append(t + vbase)
        mat_l.append(np.full(t.shape[0], prim.material_id, np.int64))
        vbase += mesh.num_vertices
    positions = np.concatenate(pos_l)
    normals = np.concatenate(nrm_l)
    tangents = np.concatenate(tan_l)
    colors = np.concatenate(col_l)
    uvs = np.concatenate(uv_l)
    tris = np.concatenate(tri_l)
    tri_mat = np.concatenate(mat_l)
    mats = render_scene.materials.materials
    images = render_scene.materials._images
    dbl = np.array([mats[m].double_sided for m in tri_mat])

    # ---- raster (float64 oracle) ----
    vp = np.asarray(view.view_proj, np.float64)
    clip = np.concatenate([positions, np.ones((len(positions), 1))], 1) @ vp.T
    # f32 depth ranking: exactly-coplanar fixture geometry must resolve its ties
    # by max id the same way the production raster does.
    depth, vis, bary = rasterize_reference(
        clip, tris, width, height, dbl, dtype=np.float32
    )
    covered = vis >= 0
    t = np.maximum(vis, 0)

    # ---- perspective-correct attributes ----
    lam = bary[..., None]  # (H, W, 3, 1)
    idx = tris[t]  # (H, W, 3)
    n_px = _normalize(np.sum(normals[idx] * lam, axis=-2))
    w_px = np.sum(positions[idx] * lam, axis=-2)
    c_px = np.sum(colors[idx][..., :3] * lam, axis=-2)
    uv_px = np.sum(uvs[idx] * lam, axis=-2)

    mat_px = tri_mat[t]
    base_f = np.stack([mats[m].base_color_factor[:3] for m in range(len(mats))])
    metal_f = np.array([m.metalness_factor for m in mats])
    rough_f = np.array([m.roughness_factor for m in mats])
    emis_f = np.stack([m.emission_factor for m in mats])
    tex_of = np.array([m.base_color_texture for m in mats])

    base = base_f[mat_px] * c_px
    # base-color texture: mip-mapped trilinear with analytic-derivative LOD
    lod_uv = _uv_analytic_lod(clip, tris, uvs, vis, uv_px, width, height, 1.0)
    tex_px = np.zeros_like(base)
    for ti in np.unique(tex_of[mat_px]):
        mask = tex_of[mat_px] == ti
        lod = lod_uv + np.log2(images[ti].shape[0])
        tex_px[mask] = srgb_to_linear(
            sample_texture_trilinear(images[ti], uv_px, lod)[..., :3]
        )[mask]
    base = base * tex_px

    def sample_mat_texture(tex_ids, int_lod=False):
        """Per-material texture sample at the analytic LOD — TRILINEAR for all
        material slots, the reference's default sampler mode
        (gltf_model.cpp:497-534: VK_SAMPLER_MIPMAP_MODE_LINEAR)."""
        out = np.zeros(uv_px.shape[:2] + (4,))
        ids = tex_ids[mat_px]
        for ti in np.unique(ids):
            mask = ids == ti
            lod = lod_uv + np.log2(images[ti].shape[0])
            if int_lod:
                lod = np.floor(lod)
            out[mask] = sample_texture_trilinear(images[ti], uv_px, lod)[mask]
        return out

    # Normal mapping (gltf_basic_pbr.slang TBN path; resolve_gbuffer analog).
    if use_normal_maps:
        nrm_of = np.array([m.normal_texture for m in mats])
        ns = sample_mat_texture(nrm_of)
        n_ts = ns[..., :3] * 2.0 - 1.0
        tan_px = np.sum(tangents[idx] * lam, axis=-2)
        t_vec = tan_px[..., :3]
        t_len2 = np.sum(t_vec * t_vec, axis=-1, keepdims=True)
        has_t = t_len2 > 1e-8
        t_vec = np.where(has_t, t_vec / np.sqrt(np.maximum(t_len2, 1e-12)), 0.0)
        b_vec = np.cross(n_px, t_vec) * tan_px[..., 3:4]
        mapped = _normalize(
            t_vec * n_ts[..., 0:1] + b_vec * n_ts[..., 1:2] + n_px * n_ts[..., 2:3]
        )
        n_px = np.where(has_t, mapped, n_px)

    if use_mr_textures:
        mr_of = np.array([m.metal_rough_texture for m in mats])
        mr_s = sample_mat_texture(mr_of)
        rough = np.clip(mr_s[..., 1:2] * rough_f[mat_px][..., None], 0.045, 1.0)
        metal = np.clip(mr_s[..., 2:3] * metal_f[mat_px][..., None], 0.0, 1.0)
    else:
        metal = metal_f[mat_px][..., None]
        rough = np.clip(rough_f[mat_px][..., None], 0.045, 1.0)
    emission = emis_f[mat_px]

    # ---- CSM shadow (independent sampling math) ----
    sun_dir = _normalize(np.asarray(render_scene.sun_direction, np.float64), axis=0)
    l = -sun_dir
    view_m = np.asarray(view.view, np.float64)
    vz = w_px @ view_m[2, :3].T + view_m[2, 3]
    dist = -vz
    ci = np.sum(dist[..., None] > cascade_splits[None, None, :], axis=-1)
    in_range = ci < len(cascade_splits)
    ci = np.minimum(ci, len(cascade_splits) - 1)

    # Render the shadow maps with the same float64 oracle raster (depth-only).
    # Sidedness matches the production shadow pass: single-sided triangles
    # back-face-cull w.r.t. the light (ops/shadow.py).
    shadow_maps = []
    for cm in cascade_matrices:
        clip_s = np.concatenate([positions, np.ones((len(positions), 1))], 1) @ \
            cm.astype(np.float64).T
        d_s, _, _ = rasterize_reference(
            clip_s, tris, shadow_resolution, shadow_resolution, dbl,
        )
        shadow_maps.append(d_s)
    shadow_maps = np.stack(shadow_maps)

    nol = np.clip(np.sum(n_px * l[None, None, :], axis=-1), 1e-3, 1.0)
    bias = bias_scale * np.sqrt(np.maximum(1.0 - nol * nol, 0.0)) / nol + 2e-5
    slope = np.sqrt(np.maximum(1.0 - nol * nol, 0.0))
    r = shadow_resolution
    lit = np.ones_like(nol)
    for k in range(len(cascade_matrices)):
        sel = ci == k
        cm = cascade_matrices[k].astype(np.float64)
        # Normal-offset shadows (ops/shadow.py::sample_csm): shift the receiver
        # along its normal by ~one cascade texel before projecting.
        texel = 2.0 / (np.linalg.norm(cm[0, :3]) * r)
        off = (texel * (1.0 + 1.5 * slope))[..., None]
        pc = (w_px + n_px * off) @ cm[:3, :3].T + cm[:3, 3]
        u = pc[..., 0] * 0.5 + 0.5
        v = 0.5 - pc[..., 1] * 0.5
        z = pc[..., 2]
        inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (z > 0) & (z <= 1)
        x = u * r - 0.5
        y = v * r - 0.5
        x0 = np.clip(np.floor(x).astype(np.int64), 0, r - 1)
        y0 = np.clip(np.floor(y).astype(np.int64), 0, r - 1)
        fx = x - np.floor(x)
        fy = y - np.floor(y)
        sm = shadow_maps[k]
        zr = z + bias
        l00 = (zr >= sm[y0, x0]).astype(np.float64)
        l01 = (zr >= sm[y0, np.minimum(x0 + 1, r - 1)]).astype(np.float64)
        l10 = (zr >= sm[np.minimum(y0 + 1, r - 1), x0]).astype(np.float64)
        l11 = (zr >= sm[np.minimum(y0 + 1, r - 1), np.minimum(x0 + 1, r - 1)])
        pcf = (
            l00 * (1 - fx) * (1 - fy) + l01 * fx * (1 - fy)
            + l10 * (1 - fx) * fy + l11.astype(np.float64) * fx * fy
        )
        lit = np.where(sel & inside & in_range, pcf, lit)

    # ---- direct light + tonemap ----
    cam = np.asarray(view.position, np.float64)
    vdir = _normalize(cam[None, None, :] - w_px)
    f = brdf_reference(base, n_px, metal, rough, l[None, None, :], vdir)
    sun_color = np.asarray(render_scene.sun_color, np.float64)
    direct = (
        np.clip(np.sum(n_px * l[None, None, :], axis=-1, keepdims=True), 0, 1)
        * f * sun_color[None, None, :] * lit[..., None] * sun_exposure
    )
    hdr = np.where(covered[..., None], direct + emission * 1.0, 0.0)
    # emission is carried linearly by the gbuffer; fixtures use factors only.
    lum = (
        hdr[..., 0] * 0.2126 + hdr[..., 1] * 0.7152 + hdr[..., 2] * 0.0722
    )[..., None]
    tonemapped = hdr * (lum / (lum + 1.0))
    out = np.clip(tonemapped, 0.0, 1.0) ** (1.0 / 2.2)
    return np.clip(out * 255.0 + 0.5, 0, 255).astype(np.uint8)
