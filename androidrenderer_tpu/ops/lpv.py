"""Light Propagation Volumes — Crytek-style cascaded LPV GI
(gi/light_propagation_volume.cpp:321-1212, shaders/gi/lpv/*).

Parity structure (SURVEY.md §2.7):
- 4 cascades x 32^3 cells, cell 0.25 m doubling per cascade, camera-following with
  ~10% of the volume behind the camera (cpp:455-519), snapped to whole cells.
- RSM (flux/normal/depth) rendered from the sun per cascade at 128^2 (cpp:548-617)
  — here: a visibility-buffer raster from the sun + deferred resolve.
- VPL extraction: brightest of each 2x2 RSM quad (rsm_generate_vpls.comp:55-64).
- Injection: cosine-lobe SH x flux scatter-add into the radiance volume; geometry
  volume (GV) gets surfel occlusion with max-combine (gv_injection).
- 32-step propagation, 6-neighbor faces scheme with side faces
  (lpv_propagate.comp.slang:36-80) with GV occlusion.
- Apply: fullscreen overlay evaluating the SH toward the surface normal
  (overlay.frag), scaled by the lpv exposure cvar (default pi*10, cpp:77-79).

Everything is pure XLA: the volumes are (C, 3, 4, R, R, R) arrays, propagation is a
rolled-shift stencil (vectorized over all cascades/cells), injection is scatter-add.
Volumes are rebuilt every frame exactly like the reference (clear_volume each frame,
cpp:839-926) — no temporal state.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from androidrenderer_tpu.ops import sh
from androidrenderer_tpu.ops.post import srgb_to_linear
from androidrenderer_tpu.ops.raster.setup import (
    transform_to_clip,
    triangle_setup,
    triangle_setup_corners,
)

# Solid angles of the far face / side faces of a cell as seen from the neighbor
# (standard LPV constants; 6 * (direct + 4 * side) == 4pi).
SA_DIRECT = 0.4006696846
SA_SIDE = 0.4234413544

# numpy (not jnp): module-level device arrays would commit the jax backend at
# import time, breaking later jax_platforms overrides (headless --platform cpu).
_DIRS = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    dtype=np.float32,
)


class LPVVolumes(NamedTuple):
    radiance: jnp.ndarray  # (C, 3, 4, R, R, R) RGB x SH4, grid order (z, y, x)
    gv: jnp.ndarray  # (C, 4, R, R, R) occlusion SH
    mins: jnp.ndarray  # (C, 3) world-space min corner
    cell_sizes: jnp.ndarray  # (C,) meters


def cascade_origins(
    camera_position: jnp.ndarray,  # (3,)
    camera_forward: jnp.ndarray,  # (3,)
    num_cascades: int,
    resolution: int,
    base_cell: float,
    behind_percent: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(C, 3) snapped cascade min corners + (C,) cell sizes (cpp:455-519)."""
    mins = []
    sizes = []
    for c in range(num_cascades):
        cell = base_cell * (2.0**c)
        extent = cell * resolution
        center = camera_position + camera_forward * extent * (0.5 - behind_percent)
        mn = center - 0.5 * extent
        mn = jnp.floor(mn / cell) * cell  # snap to whole cells
        mins.append(mn)
        sizes.append(cell)
    return jnp.stack(mins), jnp.asarray(sizes, jnp.float32)


def _ortho_from_sphere(center: jnp.ndarray, radius, sun_direction: jnp.ndarray):
    """World -> light clip ortho covering a bounding sphere (RSM camera).

    All RSM views share the sun basis, so per-cascade matrices differ from any
    canonical one only by scaled rows + translation — exactly the precondition of
    shadow.derive_ortho_setup."""
    sun = sun_direction / jnp.linalg.norm(sun_direction)
    up = jnp.where(jnp.abs(sun[1]) < 0.99, jnp.array([0.0, 1.0, 0.0]),
                   jnp.array([1.0, 0.0, 0.0]))
    right = jnp.cross(up, sun)
    right = right / jnp.linalg.norm(right)
    # right x lup must equal -sun (view-z) or winding mirrors — see
    # shadow.fit_cascades' handedness note.
    lup = jnp.cross(right, sun)
    backup = radius + 1.0
    origin = center - sun * backup
    depth_range = 2.0 * backup
    rowx = right / radius
    rowy = lup / radius
    rowz = -sun / depth_range
    return jnp.stack([
        jnp.concatenate([rowx, (-jnp.dot(rowx, origin))[None]]),
        jnp.concatenate([rowy, (-jnp.dot(rowy, origin))[None]]),
        jnp.concatenate([rowz, (1.0 + jnp.dot(sun, origin) / depth_range)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0]),
    ]).astype(jnp.float32)


def _rsm_ortho_matrix(
    cascade_min: jnp.ndarray, extent, sun_direction: jnp.ndarray
) -> jnp.ndarray:
    """World -> light clip ortho covering the cascade volume (RSM camera)."""
    center = cascade_min + 0.5 * extent
    radius = 0.866026 * extent  # bounding sphere of the cube
    return _ortho_from_sphere(center, radius, sun_direction)


def _resolve_rsm(scene, setup, vis, use_base_textures: bool = True):
    """RSM deferred resolve: (albedo (R,R,3), normal, world_pos, valid).

    Plane-gather formulation (the main view's resolve scheme, gbuffer.py):
    ONE flat row gather into the per-triangle attribute-plane table replaces
    the 3-gathers-per-attribute barycentric path (normals/positions/uvs +
    material tables — measured ~2 ms/frame across the 4 cascades in the
    parity trace). Proxy scenes carry baked attr corners/consts
    (scene/proxy.py) so swap_in_proxy feeds this identically to a full scene.

    Flux samples the material's base-color texture at a coarse mip like the
    reference's RSM fragment stage (gltf_basic_pbr.slang:240-252)."""
    from androidrenderer_tpu.ops.gbuffer import (
        ATTR_CHANNELS, pack_attribute_planes,
    )
    from androidrenderer_tpu.scene.material_storage import START_ALIGN

    valid = vis >= 0
    tid = jnp.maximum(vis, 0)
    table = pack_attribute_planes(scene, setup)
    pl = table[tid]
    nch = pl.shape[-1] // 3
    pa = pl[..., :nch]
    pb = pl[..., nch : 2 * nch]
    pc = pl[..., 2 * nch :]
    px = jnp.arange(vis.shape[1], dtype=jnp.float32)[None, :, None]
    py = jnp.arange(vis.shape[0], dtype=jnp.float32)[:, None, None]
    f = pa * px + pb * py + pc
    s = f[..., ATTR_CHANNELS : ATTR_CHANNELS + 1]
    a = f / jnp.where(s == 0.0, 1.0, s)
    nrm = a[..., 2:5]
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
    wpos = a[..., 12:15]
    c0 = ATTR_CHANNELS + 1
    albedo = a[..., c0 : c0 + 3]  # base-color factor (tri_consts channel 0-2)
    if use_base_textures and scene.textures.shape[0] > 0:
        from androidrenderer_tpu.ops import texture as tex

        uv = a[..., 0:2]
        packed_t = jnp.round(a[..., c0 + 8]).astype(jnp.int32)  # slot 0 meta
        log2b = packed_t & 15
        start = jnp.right_shift(packed_t, 4) * START_ALIGN
        # RSM texels are meters wide: a coarse mip (~16^2) matches the footprint
        # (the reference gets this from HW derivatives at 128^2).
        level = jnp.maximum(log2b - 4, 0)
        texel = tex.sample_bilinear(scene.textures, start, log2b, uv, level)
        albedo = albedo * srgb_to_linear(texel[..., :3])
    return albedo, nrm, wpos, valid


def render_rsm(
    scene,  # SceneArrays
    matrix: jnp.ndarray,  # (4, 4) RSM camera
    resolution: int,
    raster_fn,  # (setup, h, w) -> (depth, vis)
):
    """Render one RSM: (albedo (R,R,3), normal (R,R,3), world_pos (R,R,3), valid)."""
    setup = triangle_setup_corners(
        scene.tri_corner_pos, matrix, resolution, resolution,
        double_sided=jnp.ones_like(scene.tri_double_sided), tri_valid=scene.tri_valid,
    )
    depth, vis = raster_fn(setup, resolution, resolution)
    return _resolve_rsm(scene, setup, vis)


def inject_all(
    radiance: jnp.ndarray,  # (C, 3, 4, R, R, R)
    gv: jnp.ndarray,  # (C, 4, R, R, R)
    vpl_parts,  # per cascade: (pos (K,3), normal, flux, mask)
    surfel_parts,  # per cascade: (pos, normal, mask) — RSM texel occluders
    shared_surfels,  # (pos, normal, mask) injected into EVERY cascade, or None
    emissive,  # (pos, normal, flux, mask) into every cascade, or None
    mins: jnp.ndarray,  # (C, 3)
    cells: jnp.ndarray,  # (C,)
    resolution: int,
):
    """All cascades' VPL/GV injection as ONE scatter-add + ONE scatter-max.

    The per-cascade loop issued 4-5 small scatters per cascade plus a dense
    `.at[c].set` volume copy each — per-scatter fixed cost dominates at these
    row counts on TPU (docs/ROADMAP.md cost model). Flattening every source's
    (cascade-offset) cell indices into the (C*R^3,) row space batches the whole
    injection into two scatters."""
    c_n = radiance.shape[0]
    r = resolution
    r3 = r**3

    def flat_idx(pos, mask, c):
        cell = jnp.floor((pos - mins[c]) / cells[c]).astype(jnp.int32)
        inb = mask & jnp.all((cell >= 0) & (cell < r), axis=-1)
        local = (cell[:, 2] * r + cell[:, 1]) * r + cell[:, 0]
        return jnp.where(inb, c * r3 + local, c_n * r3), inb

    add_idx, add_rows = [], []
    max_idx, max_rows = [], []
    for c in range(c_n):
        p, n, flux, mask = vpl_parts[c]
        # Radiance: half-cell normal offset against self-light (vpl bias).
        ai, ainb = flat_idx(p + n * (0.5 * cells[c]), mask, c)
        lobe = sh.sh_cosine_lobe(n)
        contrib = (flux[:, :, None] * lobe[:, None, :]).reshape(-1, 12)
        add_idx.append(ai)
        add_rows.append(jnp.where(ainb[:, None], contrib, 0.0))
        # GV occlusion from the VPLs (unbiased position).
        gi, ginb = flat_idx(p, mask, c)
        max_idx.append(gi)
        max_rows.append(
            jnp.where(ginb[:, None], jnp.abs(sh.sh_cosine_lobe(n)), 0.0)
        )
        sp, sn, sv = surfel_parts[c]
        si, sinb = flat_idx(sp, sv, c)
        max_idx.append(si)
        max_rows.append(
            jnp.where(sinb[:, None], jnp.abs(sh.sh_cosine_lobe(sn)), 0.0)
        )
        if shared_surfels is not None:
            hp, hn, hv = shared_surfels
            hi, hinb = flat_idx(hp, hv, c)
            max_idx.append(hi)
            max_rows.append(
                jnp.where(hinb[:, None], jnp.abs(sh.sh_cosine_lobe(hn)), 0.0)
            )
        if emissive is not None:
            ep, en, ef, em = emissive
            ei, einb = flat_idx(ep + en * (0.5 * cells[c]), em, c)
            elobe = sh.sh_cosine_lobe(en)
            add_idx.append(ei)
            add_rows.append(
                jnp.where(
                    einb[:, None], (ef[:, :, None] * elobe[:, None, :]).reshape(-1, 12),
                    0.0,
                )
            )
            egi, eginb = flat_idx(ep, em, c)
            max_idx.append(egi)
            max_rows.append(
                jnp.where(eginb[:, None], jnp.abs(sh.sh_cosine_lobe(en)), 0.0)
            )

    rad_rows = radiance.reshape(c_n, 12, r3).transpose(0, 2, 1).reshape(c_n * r3, 12)
    rad_rows = rad_rows.at[jnp.concatenate(add_idx)].add(
        jnp.concatenate(add_rows), mode="drop"
    )
    radiance = rad_rows.reshape(c_n, r3, 12).transpose(0, 2, 1).reshape(radiance.shape)

    gv_rows = gv.reshape(c_n, 4, r3).transpose(0, 2, 1).reshape(c_n * r3, 4)
    gv_rows = gv_rows.at[jnp.concatenate(max_idx)].max(
        jnp.concatenate(max_rows), mode="drop"
    )
    gv = gv_rows.reshape(c_n, r3, 4).transpose(0, 2, 1).reshape(gv.shape)
    return radiance, gv


def extract_vpls(
    albedo: jnp.ndarray,  # (R, R, 3)
    normal: jnp.ndarray,
    world_pos: jnp.ndarray,
    valid: jnp.ndarray,
    sun_color: jnp.ndarray,  # (3,)
):
    """Brightest-of-2x2 VPL extraction (rsm_generate_vpls.comp:55-64).

    Returns (pos (K,3), normal (K,3), flux (K,3), mask (K,)) with K = (R/2)^2."""
    r = albedo.shape[0]
    flux = albedo * sun_color[None, None, :] * jnp.where(valid[..., None], 1.0, 0.0)
    lum = flux @ jnp.array([0.2126, 0.7152, 0.0722])
    # group into 2x2 quads
    lum4 = lum.reshape(r // 2, 2, r // 2, 2).transpose(0, 2, 1, 3).reshape(-1, 4)
    # Deterministic tie-break: uniform-albedo surfaces (flat-lit walls) tie the
    # whole quad's luminance EXACTLY, so a 1-ULP shift anywhere upstream (any
    # mathematically-identical resolve refactor) flipped 24% of picks — the VPL
    # set scattered by a texel and cornell_lpv's golden moved by SSIM ~0.02.
    # A +idx*1e-5-relative nudge dwarfs ULP noise (~1e-7) while leaving any
    # genuine luminance difference (>1e-5 relative) in charge, making the pick
    # a stable function of the VALUES rather than of XLA's fusion choices.
    tb = jnp.max(lum4, axis=1, keepdims=True) * (
        1e-5 * jnp.arange(4, dtype=jnp.float32)
    )
    pick = jnp.argmax(lum4 + tb, axis=1)  # (K,)

    def gather(img):
        k = img.shape[-1]
        q = img.reshape(r // 2, 2, r // 2, 2, k).transpose(0, 2, 1, 3, 4).reshape(-1, 4, k)
        return jnp.take_along_axis(q, pick[:, None, None], axis=1)[:, 0]

    v4 = valid.reshape(r // 2, 2, r // 2, 2).transpose(0, 2, 1, 3).reshape(-1, 4)
    mask = jnp.take_along_axis(v4, pick[:, None], axis=1)[:, 0]
    # Scale: VPL count ratio (32^2 / 128^2) like vpl_injection.frag:36-52.
    scale = (32.0 * 32.0) / (r * r)
    f = gather(flux) * scale
    # HSV saturation x2 ("because yolo", vpl_injection.frag:39-42). The
    # reference's rgb2hsv -> s*=2 -> hsv2rgb round trip reduces algebraically
    # to rgb' = 2*rgb - max(rgb): hsv2rgb(v, s, hue_q) = v*(1 + s*(q - 1)), so
    # doubling s gives 2*v*(1 + s*(q-1)) - v. Components may go negative for
    # strongly saturated colors — the reference's unorm-free MRTs do the same.
    f = 2.0 * f - jnp.max(f, axis=-1, keepdims=True)
    return gather(world_pos), gather(normal), f, mask


def inject(
    radiance: jnp.ndarray,  # (3, 4, R, R, R) one cascade
    gv: jnp.ndarray,  # (4, R, R, R)
    vpl_pos: jnp.ndarray,  # (K, 3)
    vpl_normal: jnp.ndarray,  # (K, 3)
    vpl_flux: jnp.ndarray,  # (K, 3)
    vpl_mask: jnp.ndarray,  # (K,)
    cascade_min: jnp.ndarray,  # (3,)
    cell_size,
    resolution: int,
):
    """Scatter VPLs into the radiance volume (+ surfel occlusion into the GV)."""
    # Offset half a cell along the normal to avoid self-light/self-occlusion
    # (vpl_injection bias).
    pos = vpl_pos + vpl_normal * (0.5 * cell_size)
    cellf = (pos - cascade_min) / cell_size
    cell = jnp.floor(cellf).astype(jnp.int32)
    inb = vpl_mask & jnp.all((cell >= 0) & (cell < resolution), axis=-1)
    cx, cy, cz = cell[:, 0], cell[:, 1], cell[:, 2]
    # Out-of-bounds -> index R (dropped).
    drop = jnp.where(inb, cz, resolution)

    lobe = sh.sh_cosine_lobe(vpl_normal)  # (K, 4)
    contrib = vpl_flux[:, :, None] * lobe[:, None, :]  # (K, 3, 4)
    # Flat ROW scatter-add: multi-dim advanced-index scatters (`.at[:, :, z, y, x]`)
    # lower to the same catastrophic multi-index path as multi-dim gathers on this
    # TPU (docs/ROADMAP.md) — flatten the volume to (R^3, 12) rows and scatter once.
    r3 = resolution**3
    flat_idx = jnp.where(inb, (drop * resolution + cy) * resolution + cx, r3)
    rad_rows = radiance.reshape(12, r3).T  # (R^3, 12)
    add_rows = jnp.where(inb[:, None], contrib.reshape(-1, 12), 0.0)
    rad_rows = rad_rows.at[flat_idx].add(add_rows, mode="drop")
    radiance = rad_rows.T.reshape(radiance.shape)

    # GV surfel occlusion, max-combined (gv uses raw RSM resolution in the reference;
    # VPL-level injection is the coarse equivalent).
    gv_cell = jnp.floor((vpl_pos - cascade_min) / cell_size).astype(jnp.int32)
    ginb = vpl_mask & jnp.all((gv_cell >= 0) & (gv_cell < resolution), axis=-1)
    gx, gy, gz = gv_cell[:, 0], gv_cell[:, 1], gv_cell[:, 2]
    occ = jnp.abs(sh.sh_cosine_lobe(vpl_normal))  # (K, 4)
    gidx = jnp.where(ginb, (gz * resolution + gy) * resolution + gx, r3)
    gv_rows = gv.reshape(4, r3).T  # (R^3, 4)
    gv_rows = gv_rows.at[gidx].max(jnp.where(ginb[:, None], occ, 0.0), mode="drop")
    gv = gv_rows.T.reshape(gv.shape)
    return radiance, gv


def inject_gv_surfels(
    gv: jnp.ndarray,  # (4, R, R, R) one cascade's geometry volume
    pos: jnp.ndarray,  # (K, 3) surfel positions
    normal: jnp.ndarray,  # (K, 3)
    mask: jnp.ndarray,  # (K,)
    cascade_min: jnp.ndarray,
    cell_size,
    resolution: int,
) -> jnp.ndarray:
    """Max-combine surfel occlusion lobes into the GV (gv_injection /
    inject_scene_depth_into_gv — light_propagation_volume.cpp:932-968, 1065-1128).

    Unlike the round-1 build (VPL surfels only), this takes ARBITRARY surfel sets:
    build_lpv feeds it every RSM texel (sun-visible geometry at full RSM density)
    plus downsampled scene-view depth surfels (camera-visible geometry the sun
    never sees — the surfaces the VPL-only GV leaked light through)."""
    r3 = resolution**3
    cell = jnp.floor((pos - cascade_min) / cell_size).astype(jnp.int32)
    inb = mask & jnp.all((cell >= 0) & (cell < resolution), axis=-1)
    occ = jnp.abs(sh.sh_cosine_lobe(normal))  # (K, 4)
    idx = jnp.where(
        inb, (cell[:, 2] * resolution + cell[:, 1]) * resolution + cell[:, 0], r3
    )
    gv_rows = gv.reshape(4, r3).T
    gv_rows = gv_rows.at[idx].max(jnp.where(inb[:, None], occ, 0.0), mode="drop")
    return gv_rows.T.reshape(gv.shape)


def propagate(
    radiance: jnp.ndarray,  # (C, 3, 4, R, R, R)
    gv: jnp.ndarray,  # (C, 4, R, R, R)
    num_steps: int,
    occlusion: bool = True,
) -> jnp.ndarray:
    """32-step 6-neighbor propagation with side faces + GV occlusion
    (lpv_propagate.comp.slang:36-80). Returns accumulated radiance."""
    # Precompute per-direction face data (static, host numpy -> baked constants).
    def np_sh_eval(v):
        return np.array([sh.SH_C0, -sh.SH_C1 * v[1], sh.SH_C1 * v[2], -sh.SH_C1 * v[0]],
                        np.float32)

    def np_cos_lobe(v):
        return np.array(
            [sh.COS_LOBE_C0, -sh.COS_LOBE_C1 * v[1], sh.COS_LOBE_C1 * v[2],
             -sh.COS_LOBE_C1 * v[0]], np.float32)

    dirs_np = np.asarray(_DIRS)
    face_terms = []
    for d_idx in range(6):
        d = dirs_np[d_idx]
        d_axis = int(np.argmax(np.abs(d)))
        terms = [(jnp.asarray(np_sh_eval(d)), jnp.asarray(np_cos_lobe(d)), SA_DIRECT)]
        for s_idx in range(6):
            sdir = dirs_np[s_idx]
            if int(np.argmax(np.abs(sdir))) == d_axis:
                continue
            eval_dir = d + 0.5 * sdir
            eval_dir = eval_dir / np.linalg.norm(eval_dir)
            terms.append(
                (jnp.asarray(np_sh_eval(eval_dir)), jnp.asarray(np_cos_lobe(sdir)),
                 SA_SIDE)
            )
        face_terms.append(terms)

    # TPU layout: flatten (y, x) into one R*R minor dim — R=32 alone pads to 128
    # lanes (4x traffic waste); R*R = 1024 fills them. Grid shifts become flat
    # rolls: y +-1 = roll by +-R (x preserved; the wrapped y-plane is re-zeroed),
    # x +-1 = roll by +-1 (the carry between y-rows lands in the re-zeroed x-edge
    # column — R is a power of two, so the column mask is an iota AND).
    # _DIRS[0] = +x: the contributing neighbor sits at cell - d, so positive d
    # rolls by +1 (bringing index i-1 to i).
    c_n = radiance.shape[0]
    r = radiance.shape[-1]
    if r & (r - 1):
        raise ValueError(f"LPV resolution {r} must be a power of two (the "
                         "flat-roll edge masks are iota-AND based)")
    rad_f = radiance.reshape(c_n, 3, 4, r, r * r)
    gv_f = gv.reshape(c_n, 4, r, r * r)
    col = jax.lax.broadcasted_iota(jnp.int32, (r * r,), 0)
    masks = {
        0: (col & (r - 1)) == 0,          # +x: zero the x == 0 column
        1: (col & (r - 1)) == (r - 1),    # -x: zero the x == R-1 column
        2: col < r,                       # +y: zero the y == 0 plane
        3: col >= r * (r - 1),            # -y: zero the y == R-1 plane
    }
    flat_shift = {0: 1, 1: -1, 2: r, 3: -r}

    def shifted(a, d_idx, z_axis):
        """Neighbor-at-(cell - dir_d) with out-of-volume cells zeroed."""
        if d_idx >= 4:  # +-z: roll the z axis, zero the wrapped slab
            shift = 1 if d_idx == 4 else -1
            n = jnp.roll(a, shift, axis=z_axis)
            idx = 0 if shift == 1 else r - 1
            return jax.lax.dynamic_update_slice_in_dim(
                n, jnp.zeros_like(jax.lax.index_in_dim(n, idx, z_axis)), idx, z_axis,
            )
        n = jnp.roll(a, flat_shift[d_idx], axis=z_axis + 1)
        return jnp.where(masks[d_idx], 0.0, n)

    # GV occlusion per direction is LOOP-INVARIANT (the geometry volume does
    # not change during propagation) — precompute all 6 outside the while
    # body; XLA does not reliably hoist it out itself (measured as in-loop
    # shift/einsum ops in the parity trace).
    occ_by_dir = []
    for d_idx in range(6):
        if occlusion:
            ngv = shifted(gv_f, d_idx, z_axis=2)
            # Surfels block flux crossing them from EITHER side (a wall is a
            # wall): evaluate the stored lobe toward both orientations and
            # take the stronger. A single-signed evaluation lets flux pass
            # free through back-facing surfels (dot < 0 clips to 0).
            e_neg = sh.sh_evaluate(-_DIRS[d_idx])  # (4,)
            e_pos = sh.sh_evaluate(_DIRS[d_idx])
            amp = jnp.maximum(
                jnp.einsum("k,ckzf->czf", e_neg, ngv),
                jnp.einsum("k,ckzf->czf", e_pos, ngv),
            )
            occ = 1.0 - jnp.clip(amp, 0.0, 1.0)
            occ_by_dir.append(occ[:, None, None])  # (C,1,1,R,R*R)
        else:
            occ_by_dir.append(1.0)

    def step(delta):
        out = jnp.zeros_like(delta)
        for d_idx in range(6):
            neighbor = shifted(delta, d_idx, z_axis=3)
            occ = occ_by_dir[d_idx]
            for eval_sh, lobe_sh, sa in face_terms[d_idx]:
                flux = jnp.maximum(
                    jnp.einsum("k,cgkzf->cgzf", eval_sh, neighbor), 0.0
                ) * (sa / jnp.pi)
                out = out + flux[:, :, None] * occ * lobe_sh[None, None, :, None, None]
        return out

    acc = rad_f
    delta = rad_f

    def body(_, carry):
        acc, delta = carry
        delta = step(delta)
        return acc + delta, delta

    acc, _ = jax.lax.fori_loop(0, num_steps, body, (acc, delta))
    return acc.reshape(radiance.shape)


def apply_lpv(
    volumes: LPVVolumes,
    world_position: jnp.ndarray,  # (H, W, 3)
    normal: jnp.ndarray,  # (H, W, 3)
    base_color: jnp.ndarray,  # (H, W, 3)
    valid: jnp.ndarray,  # (H, W)
    exposure,  # lpv exposure cvar (default pi*10)
) -> jnp.ndarray:
    """Fullscreen GI overlay (overlay.frag): trilinear SH fetch from the finest
    cascade containing the pixel, evaluated toward the surface normal."""
    c, _, _, r, _, _ = volumes.radiance.shape

    # Select finest cascade containing the point (with a 1-cell margin).
    cellf = (world_position[None] - volumes.mins[:, None, None, :]) / volumes.cell_sizes[
        :, None, None, None
    ]
    inside = jnp.all((cellf >= 1.0) & (cellf <= r - 2.0), axis=-1)  # (C, H, W)
    first_inside = jnp.argmax(inside, axis=0)  # finest containing
    any_inside = jnp.any(inside, axis=0)
    ci = first_inside

    h, w, _ = world_position.shape
    # Select the finest cascade's cell coords with unrolled selects (a
    # take_along_axis over the cascade axis is a gather; C is tiny).
    sel = cellf[0]
    for k in range(1, c):
        sel = jnp.where((ci == k)[..., None], cellf[k], sel)
    sel = sel - 0.5  # sample at cell centers
    c0 = jnp.floor(sel)
    f = sel - c0
    c0i = jnp.clip(c0.astype(jnp.int32), 0, r - 2)

    # Corner-pack the volume so the trilinear fetch is ONE flat gather: row
    # (c, z, y, x) carries all 8 cell corners x 12 SH coefficients (96 ch). Random
    # screen-sized gathers cost ~27-45 ms each on this TPU regardless of width
    # (docs/ROADMAP.md), so 8 separate corner gathers dominate the whole LPV pass;
    # the packing itself is a few dense 6 MB shifts (~free).
    # (bf16 corner pack measured a NEGATIVE: the packed table is ~98k rows —
    # small-table regime, gather cost is width-free — so halving row bytes
    # saved only ~25 MB of dense build bandwidth while the quantization broke
    # the cornell_lpv golden at SSIM 0.967. f32 stays.)
    rad = volumes.radiance.transpose(0, 3, 4, 5, 1, 2).reshape(c, r, r, r, 12)
    corners = [
        jnp.roll(rad, (-dz, -dy, -dx), axis=(1, 2, 3))
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]  # wrap rows land at z/y/x == r-1, never addressed (c0i <= r-2)
    packed = jnp.concatenate(corners, axis=-1).reshape(c * r * r * r, 96)
    idx = ((ci * r + c0i[..., 2]) * r + c0i[..., 1]) * r + c0i[..., 0]
    taps = packed[idx]  # (H, W, 96)

    fx = f[..., 0:1]
    fy = f[..., 1:2]
    fz = f[..., 2:3]
    def tap(i):
        return taps[..., i * 12 : (i + 1) * 12]
    # corner order above: i = dz*4 + dy*2 + dx
    v00 = tap(0) + (tap(1) - tap(0)) * fx
    v10 = tap(2) + (tap(3) - tap(2)) * fx
    v01 = tap(4) + (tap(5) - tap(4)) * fx
    v11 = tap(6) + (tap(7) - tap(6)) * fx
    v0 = v00 + (v10 - v00) * fy
    v1 = v01 + (v11 - v01) * fy
    shv = (v0 + (v1 - v0) * fz).reshape(h, w, 3, 4)

    lobe = sh.sh_cosine_lobe(-normal)  # (H, W, 4)
    # Broadcast FMA, not einsum: batched tiny matmuls at 2M px are a measured
    # 100-300 ms trap on this TPU (docs/ROADMAP.md).
    gi = (
        shv[..., 0] * lobe[..., None, 0]
        + shv[..., 1] * lobe[..., None, 1]
        + shv[..., 2] * lobe[..., None, 2]
        + shv[..., 3] * lobe[..., None, 3]
    )
    gi = jnp.maximum(gi, 0.0)
    gi = gi * base_color * (1.0 / jnp.pi) * exposure
    return jnp.where((valid & any_inside)[..., None], gi, 0.0)


def _canonical_rsm_setup(scene, mins, cells, resolution: int, rsm_resolution: int):
    """Union sun frame + ONE gather-heavy triangle setup serving every cascade.

    Per-cascade RSM setups derive by affine coefficient transforms
    (shadow.derive_ortho_setup) — this drops 3 of 4 gather-heavy setups AND culls
    each cascade's raster to the triangles inside its volume footprint (the
    reference's multiview RSM pass, light_propagation_volume.cpp:583-617, gets
    the same effect from HW culling)."""
    extents = cells * resolution
    centers = mins + 0.5 * extents[:, None]
    radii = 0.866026 * extents
    cu = jnp.mean(centers, axis=0)
    ru = jnp.max(jnp.linalg.norm(centers - cu, axis=1) + radii)
    m_canon = _ortho_from_sphere(cu, ru, scene.sun_direction)
    # Material sidedness, like the reference's rsm PSOs (material_pipelines.cpp):
    # sun-backfacing single-sided triangles neither make VPLs (their flux points
    # into the surface) nor cost raster touches. Corner-table setup: gather-free.
    setup_rsm = triangle_setup_corners(
        scene.tri_corner_pos, m_canon, rsm_resolution, rsm_resolution,
        double_sided=scene.tri_double_sided, tri_valid=scene.tri_valid,
    )
    return m_canon, setup_rsm, centers, radii


def _rsm_cascade_parts(
    scene, setup_rsm, m_canon, center, radius, raster_fn, rsm_resolution: int,
    use_base_textures: bool,
):
    """One cascade's RSM render -> (vpl_parts, surfel_parts) tuples.

    ``center``/``radius`` may be traced (the staggered path selects the cascade
    by a frame-index-derived id)."""
    from androidrenderer_tpu.ops.shadow import derive_ortho_setup

    m = _ortho_from_sphere(center, radius, scene.sun_direction)
    setup_i = derive_ortho_setup(setup_rsm, m_canon, m, rsm_resolution)
    _, vis_c = raster_fn(setup_i, rsm_resolution, rsm_resolution)
    albedo, nrm, wpos, val = _resolve_rsm(
        scene, setup_i, vis_c, use_base_textures=use_base_textures
    )
    vpls = extract_vpls(albedo, nrm, wpos, val, scene.sun_color)
    # GV from RSM depth: EVERY sun-visible texel is an occluder surfel
    # (gv_injection path, cpp:932-968) — much denser than the VPL subset.
    surfels = (wpos.reshape(-1, 3), nrm.reshape(-1, 3), val.reshape(-1))
    return vpls, surfels


def _emissive_parts(scene):
    """Emissive mesh-light point clouds (render_scene.cpp:257-310), or None."""
    ep = scene.emissive_points
    if ep.shape[0] <= 1:
        return None
    emask = jnp.arange(ep.shape[0]) < scene.emissive_point_count
    return (ep[:, 0:3], ep[:, 3:6], ep[:, 6:9], emask)


def build_lpv(
    scene,
    camera_position: jnp.ndarray,
    camera_forward: jnp.ndarray,
    raster_fn,
    num_cascades: int,
    resolution: int,
    base_cell: float,
    rsm_resolution: int,
    num_steps: int,
    behind_percent: float = 0.1,
    scene_view_surfels=None,  # (pos (K,3), normal (K,3), valid (K,)) from the gbuffer
    use_base_textures: bool = True,
) -> LPVVolumes:
    """Full LPV frame slice: cascades -> RSM -> VPLs -> inject -> propagate."""
    mins, cells = cascade_origins(
        camera_position, camera_forward, num_cascades, resolution, base_cell,
        behind_percent,
    )
    radiance = jnp.zeros((num_cascades, 3, 4, resolution, resolution, resolution))
    gv = jnp.zeros((num_cascades, 4, resolution, resolution, resolution))

    m_canon, setup_rsm, centers, radii = _canonical_rsm_setup(
        scene, mins, cells, resolution, rsm_resolution
    )

    vpl_parts = []
    surfel_parts = []
    for c in range(num_cascades):
        vpls, surfels = _rsm_cascade_parts(
            scene, setup_rsm, m_canon, centers[c], radii[c], raster_fn,
            rsm_resolution, use_base_textures,
        )
        vpl_parts.append(vpls)
        surfel_parts.append(surfels)
    # Scene-view depth surfels guard against light leaking through sun-shadowed
    # walls (inject_scene_depth_into_gv, cpp:1065-1128).
    radiance, gv = inject_all(
        radiance, gv, vpl_parts, surfel_parts, scene_view_surfels,
        _emissive_parts(scene), mins, cells, resolution,
    )
    radiance = propagate(radiance, gv, num_steps)
    return LPVVolumes(radiance=radiance, gv=gv, mins=mins, cell_sizes=cells)


def make_lpv_state(num_cascades: int, resolution: int) -> LPVVolumes:
    """Empty cached volumes for the staggered path (TemporalState.lpv).

    ``mins`` start at +1e30 so apply_lpv's containment test excludes every pixel
    from a cascade that has never been built — no separate validity mask."""
    return LPVVolumes(
        radiance=jnp.zeros(
            (num_cascades, 3, 4, resolution, resolution, resolution), jnp.float32
        ),
        gv=jnp.zeros((num_cascades, 4, resolution, resolution, resolution),
                     jnp.float32),
        mins=jnp.full((num_cascades, 3), 1e30, jnp.float32),
        cell_sizes=jnp.ones((num_cascades,), jnp.float32),
    )


def update_lpv_staggered(
    scene,
    camera_position: jnp.ndarray,
    camera_forward: jnp.ndarray,
    raster_fn,
    state: LPVVolumes,  # cached volumes (make_lpv_state / previous frame)
    frame_index,  # () i32 traced
    num_cascades: int,
    resolution: int,
    base_cell: float,
    rsm_resolution: int,
    num_steps: int,
    behind_percent: float = 0.1,
    scene_view_surfels=None,
    use_base_textures: bool = True,
    update_budget: int = 1,
) -> LPVVolumes:
    """Round-robin cascade updates: rebuild ``update_budget`` cascades this frame
    (RSM -> VPL -> inject -> propagate, from scratch like build_lpv), keep the
    rest from ``state`` — each cached cascade applies with the mins/cell it was
    BUILT with, so a stale cascade lags the camera by at most
    ceil(C/B)-1 frames instead of sampling a shifted volume.

    The per-cascade pipeline is independent (injection row spaces are disjoint,
    propagation never crosses cascades), so a static scene reaches the
    every-frame build's steady state after ceil(C/B) frames
    (tests/test_lpv_stagger.py gates this). The amortization pattern is the
    reference's own irradiance-cache budget (irradiance_cache.cpp:15-19)
    applied to its LPV; the reference itself clears and rebuilds every cascade
    per frame (light_propagation_volume.cpp:839-926) — set
    config.lpv_update_budget = 0 for that exact behavior."""
    b = min(update_budget, num_cascades)
    mins, cells = cascade_origins(
        camera_position, camera_forward, num_cascades, resolution, base_cell,
        behind_percent,
    )
    m_canon, setup_rsm, centers, radii = _canonical_rsm_setup(
        scene, mins, cells, resolution, rsm_resolution
    )
    # Cascades updated this frame: b consecutive ids round-robin. j < b <= C so
    # the slots are distinct; % is by a STATIC divisor (the traced-divisor
    # integer-division trap does not apply).
    upd = (frame_index * b + jnp.arange(b, dtype=jnp.int32)) % num_cascades
    mins_sel = mins[upd]  # (b, 3) — tiny gathers
    cells_sel = cells[upd]

    vpl_parts = []
    surfel_parts = []
    for j in range(b):
        vpls, surfels = _rsm_cascade_parts(
            scene, setup_rsm, m_canon, centers[upd[j]], radii[upd[j]], raster_fn,
            rsm_resolution, use_base_textures,
        )
        vpl_parts.append(vpls)
        surfel_parts.append(surfels)

    radiance_b = jnp.zeros((b, 3, 4, resolution, resolution, resolution))
    gv_b = jnp.zeros((b, 4, resolution, resolution, resolution))
    radiance_b, gv_b = inject_all(
        radiance_b, gv_b, vpl_parts, surfel_parts, scene_view_surfels,
        _emissive_parts(scene), mins_sel, cells_sel, resolution,
    )
    radiance_b = propagate(radiance_b, gv_b, num_steps)

    rad = state.radiance
    gv = state.gv
    new_mins = state.mins
    new_cells = state.cell_sizes
    for j in range(b):
        at = (upd[j], 0, 0, 0, 0, 0)
        rad = jax.lax.dynamic_update_slice(rad, radiance_b[j : j + 1], at)
        gv = jax.lax.dynamic_update_slice(gv, gv_b[j : j + 1], at[:-1])
        new_mins = new_mins.at[upd[j]].set(mins_sel[j])
        new_cells = new_cells.at[upd[j]].set(cells_sel[j])
    return LPVVolumes(radiance=rad, gv=gv, mins=new_mins, cell_sizes=new_cells)
