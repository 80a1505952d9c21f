"""Irradiance probe cache — the DDGI-style IrradianceCache (gi/irradiance_cache.cpp).

Parity structure:
- Probe grid cascades following the camera (cpp:90-218, 362-453) — here with toroidal
  (wrap-around) addressing: a probe slot owns world cell ``cell mod grid``, so camera
  scrolling never moves data, it only invalidates slots whose world cell changed.
- Budgeted updates (1024 probes/frame cvar, scored by invalid-then-age, cpp:496-583).
- Per-probe octahedral maps: irradiance (light cache) + depth mean/mean^2 for
  Chebyshev visibility (probe_depth/light_cache updates, cpp:585-724).
- Probe rays shaded like the RTGI bounce (sun diffuse + emission + sky miss).
- Sampling: 8 surrounding probes with trilinear x wrap-normal x Chebyshev weights
  (probe_sampling.slangi).

The ray->texel convolution is a (texels x rays) matmul per updated probe — MXU work.
All state lives in the TemporalState pytree (ProbeCascades).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from androidrenderer_tpu.ops import noise
from androidrenderer_tpu.ops import sky as sky_ops
from androidrenderer_tpu.ops.octahedral import dir_to_oct_uv, oct_texel_directions
from androidrenderer_tpu.ops.rt.traverse import DeviceBVH, occlusion, trace_rays

IRR_RES = 13  # irradiance octahedral resolution (reference light cache 13x13)
DEPTH_RES = 12  # depth octahedral resolution (reference 12x12)
HYSTERESIS = 0.9  # default history kept per update (promoted to RenderParams)
DEPTH_SHARPNESS = 32.0


class ProbeCascades(NamedTuple):
    irradiance: jnp.ndarray  # (C, P, IRR_RES*IRR_RES, 3)
    depth: jnp.ndarray  # (C, P, DEPTH_RES*DEPTH_RES, 2) mean / mean^2
    cell: jnp.ndarray  # (C, P, 3) i32 world cell each slot currently represents
    age: jnp.ndarray  # (C, P) i32 frames since last update (high = stale/invalid)


def make_probe_state(num_cascades: int, grid: tuple, spacing_base: float) -> ProbeCascades:
    p = grid[0] * grid[1] * grid[2]
    return ProbeCascades(
        irradiance=jnp.zeros((num_cascades, p, IRR_RES * IRR_RES, 3), jnp.float32),
        depth=jnp.zeros((num_cascades, p, DEPTH_RES * DEPTH_RES, 2), jnp.float32),
        cell=jnp.full((num_cascades, p, 3), 2**20, jnp.int32),
        age=jnp.full((num_cascades, p), 10_000, jnp.int32),
    )


def _slot_coords(grid):
    gx, gy, gz = grid
    idx = np.arange(gx * gy * gz)
    return jnp.asarray(
        np.stack([idx % gx, (idx // gx) % gy, idx // (gx * gy)], axis=-1), jnp.int32
    )  # (P, 3) slot grid coords


def _desired_cells(camera_pos, grid, spacing):
    """(P, 3) world cells the grid should cover, toroidally assigned to slots."""
    gx, gy, gz = grid
    g = jnp.asarray([gx, gy, gz], jnp.int32)
    base = jnp.floor(camera_pos / spacing).astype(jnp.int32) - g // 2
    slots = _slot_coords(grid)  # (P, 3)
    # World cells covered: base + 0..g-1; slot owning a cell c is c mod g, so the
    # cell assigned to slot s is the unique one in range with (cell mod g) == s.
    offset = (slots - base % jnp.asarray([gx, gy, gz], jnp.int32)) % jnp.asarray(
        [gx, gy, gz], jnp.int32
    )
    return base + offset


def cascade_spacings(spacing_base: float, num: int, ladder=None):
    """Per-cascade probe spacings. ``ladder`` = multipliers on spacing_base;
    default follows the reference's cascade extents (irradiance_cache.cpp:15-18:
    16x16x4 m / 64x64x16 / 512x512x128 / 8x8x2 km over a 32x8x32 grid =>
    spacings 0.5, 2, 16, 250 m — multipliers 1x/4x/32x/500x). Cascades beyond
    the ladder keep doubling off its last entry."""
    if ladder is None:
        ladder = (1.0, 4.0, 32.0, 500.0)
    out = []
    for ci in range(num):
        if ci < len(ladder):
            out.append(spacing_base * float(ladder[ci]))
        else:
            out.append(out[-1] * 2.0)
    return tuple(out)


def update_probes(
    state: ProbeCascades,
    bvh: DeviceBVH,
    scene,
    camera_position: jnp.ndarray,
    grid: tuple,
    spacing_base: float,
    budget_per_cascade: int,
    rays_per_probe: int,
    frame_index,
    sun_exposure,
    masked: bool = False,  # alpha-tested geometry: any-hit IgnoreHit emulation
    use_textures: bool = True,  # sample base/emission textures at hits (LOD 0)
    hysteresis=HYSTERESIS,  # traced history blend (irradiance_cache cvar)
    spacing_ladder=None,  # per-cascade spacing multipliers (cascade_spacings)
    axis_name: str | None = None,  # shard cascade updates across a mesh axis
) -> ProbeCascades:
    """Scroll cascades, pick the stalest probes, trace + convolve + blend.

    Round-5 restructure: ALL cascades' probe rays batch into ONE closest-hit
    trace and ONE sun-occlusion trace (4x fewer lockstep while_loops — the
    straggler tail and the ~10 us/op launch overhead are paid once), and the
    cascade spacing ladder follows the reference's 4-16x extents instead of
    2x doubling (cascade_spacings).

    ``axis_name`` (inside a shard_map): each device traces only the cascades
    it owns ({i : i %% n == d} — probe updates are cascade-independent) and
    the irradiance/depth deltas psum-combine (exactly one owner per cascade
    contributes a nonzero delta, so the result is BIT-identical to the
    replicated update; picks/ages/cells are deterministic functions of
    replicated state and stay replicated). The update is the probes frame's
    dominant cost (~2 s of rays at the 400-ray reference budget), so an
    n-chip mesh cuts it ~n-fold."""
    c = state.irradiance.shape[0]
    p = state.irradiance.shape[1]
    irr_dirs = oct_texel_directions(IRR_RES).reshape(-1, 3)  # (T, 3)
    dep_dirs = oct_texel_directions(DEPTH_RES).reshape(-1, 3)
    spacings = cascade_spacings(spacing_base, c, spacing_ladder)
    b = budget_per_cascade

    # Spherical-fibonacci ray set (shared by every cascade), rotated per frame.
    i = jnp.arange(rays_per_probe, dtype=jnp.float32)
    golden = 2.399963229728653
    z = 1.0 - (2.0 * i + 1.0) / rays_per_probe
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = i * golden + frame_index.astype(jnp.float32) * 1.618
    dirs = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)  # (R, 3)

    picks, ages, desireds, origins_c = [], [], [], []
    for ci in range(c):
        desired = _desired_cells(camera_position, grid, spacings[ci])  # (P, 3)
        moved = jnp.any(desired != state.cell[ci], axis=-1)
        age = jnp.where(moved, 10_000, state.age[ci] + 1)
        _, pick = jax.lax.top_k(age, b)  # stalest first (invalid = huge age)
        probe_pos = (desired[pick].astype(jnp.float32) + 0.5) * spacings[ci]
        picks.append(pick)
        ages.append(age)
        desireds.append(desired)
        origins_c.append(jnp.repeat(probe_pos, rays_per_probe, axis=0))

    spac_t = jnp.asarray(spacings, jnp.float32)
    if axis_name is None:
        nb = c  # cascade batches traced locally
        o = jnp.concatenate(origins_c, axis=0)  # (C*B*R, 3)
        clamp_d = jnp.repeat(spac_t * 4.0, b * rays_per_probe)
        own_ids = None
    else:
        n_dev = jax.lax.axis_size(axis_name)
        d_dev = jax.lax.axis_index(axis_name)
        nb = -(-c // n_dev)  # ceil: owned cascade batches per device
        origins_all = jnp.stack(origins_c)  # (C, B*R, 3)
        own_ids = [
            jnp.minimum(d_dev + jnp.int32(j * n_dev), c - 1) for j in range(nb)
        ]
        own_valid = [d_dev + jnp.int32(j * n_dev) < c for j in range(nb)]
        o = jnp.concatenate([origins_all[i] for i in own_ids], axis=0)
        clamp_d = jnp.concatenate([
            jnp.broadcast_to(spac_t[i] * 4.0, (b * rays_per_probe,))
            for i in own_ids
        ])
    d = jnp.tile(dirs, (nb * b, 1))
    if masked:
        from androidrenderer_tpu.ops.rt.effects import (
            occlusion_masked, trace_rays_masked,
        )
        hits = trace_rays_masked(bvh, scene, o, d, 0.01, 1e30)
    else:
        hits = trace_rays(bvh, o, d, 0.01, 1e30)

    # Shade like the RTGI bounce (probe_tracing.rt.slang shares the
    # gltf_basic_pbr closest-hit: textures sampled at LOD 0).
    slot = jnp.maximum(hits.slot, 0)
    tri = jnp.maximum(bvh.slot_tri[slot], 0)
    tri_idx = scene.tri_indices[tri]
    uu = hits.u[:, None]
    vv = hits.v[:, None]
    ww = 1 - uu - vv
    hn = (
        scene.normals[tri_idx[:, 0]] * ww
        + scene.normals[tri_idx[:, 1]] * uu
        + scene.normals[tri_idx[:, 2]] * vv
    )
    hn = hn / jnp.maximum(jnp.linalg.norm(hn, axis=-1, keepdims=True), 1e-9)
    mat = scene.tri_material[tri]
    albedo = scene.mat_base_color[mat][:, :3]
    emission = scene.mat_emission[mat]
    if use_textures:
        from androidrenderer_tpu.ops import texture as tex
        from androidrenderer_tpu.ops.post import srgb_to_linear

        huv = (
            scene.uvs[tri_idx[:, 0]] * ww
            + scene.uvs[tri_idx[:, 1]] * uu
            + scene.uvs[tri_idx[:, 2]] * vv
        )
        tex_ids = scene.mat_texture_ids[mat]
        lod0 = jnp.zeros(tri.shape, jnp.int32)
        bs = tex.sample_bilinear(
            scene.textures, scene.tex_start[tex_ids[:, 0]],
            scene.tex_log2b[tex_ids[:, 0]], huv, lod0,
        )
        albedo = albedo * srgb_to_linear(bs[:, :3])
        es = tex.sample_bilinear(
            scene.textures, scene.tex_start[tex_ids[:, 3]],
            scene.tex_log2b[tex_ids[:, 3]], huv, lod0,
        )
        emission = emission * srgb_to_linear(es[:, :3])
    hp = o + d * hits.t[:, None]
    to_sun = -scene.sun_direction / jnp.linalg.norm(scene.sun_direction)
    ndotl = jnp.clip(jnp.sum(hn * to_sun, axis=-1), 0.0, 1.0)
    # Sun-occlusion only matters where the probe ray HIT geometry (missed
    # rays shade from the sky LUT) — the active mask lets ray compaction
    # drop the sky-ray lanes at the first stage.
    hit_mask = hits.slot >= 0
    if masked:
        occ = occlusion_masked(
            bvh, scene, hp + hn * 0.02, jnp.broadcast_to(to_sun, hp.shape),
            0.01, 1e30, active=hit_mask,
        )
    else:
        occ = occlusion(bvh, hp + hn * 0.02,
                        jnp.broadcast_to(to_sun, hp.shape), 0.01, 1e30,
                        active=hit_mask)
    li = (
        albedo / jnp.pi * scene.sun_color[None, :] * sun_exposure
        * (ndotl * jnp.where(occ, 0.0, 1.0))[:, None]
        + emission * sun_exposure
    )
    sky_lut = sky_ops.build_sky_view_lut(scene.sun_direction)
    sky_l = sky_ops.sample_sky_lut(sky_lut, d, scene.sun_direction) * (
        scene.sun_color[None, :] * sun_exposure
    )  # no extra factor — matches the background sky pass (weak #5 fixed)
    hit = hits.slot >= 0
    radiance = jnp.where(hit[:, None], li, sky_l).reshape(
        nb * b, rays_per_probe, 3
    )
    # Per-cascade miss/clamp distance (spacing * 4; clamp_d built above).
    dist = jnp.minimum(
        jnp.where(hit, hits.t, clamp_d), clamp_d
    ).reshape(nb * b, rays_per_probe)

    # Convolutions: texel x ray weight matmuls (MXU), batched over nb*B probes.
    cosw = jnp.maximum(irr_dirs @ dirs.T, 0.0)  # (T, R)
    irr_all = jnp.einsum("tr,brk->btk", cosw, radiance) / jnp.maximum(
        jnp.sum(cosw, axis=1)[None, :, None], 1e-6
    )  # (nb*B, T, 3)
    dw = jnp.maximum(dep_dirs @ dirs.T, 0.0) ** DEPTH_SHARPNESS  # (Td, R)
    wsum = jnp.maximum(jnp.sum(dw, axis=1), 1e-6)
    dmean = (dist @ dw.T) / wsum[None, :]  # (C*B, Td)
    dmean2 = ((dist * dist) @ dw.T) / wsum[None, :]
    dep_all = jnp.stack([dmean, dmean2], axis=-1)  # (C*B, Td, 2)

    if axis_name is not None:
        t_i = IRR_RES * IRR_RES
        t_d = DEPTH_RES * DEPTH_RES
        flat_irr = state.irradiance.reshape(c * p, t_i, 3)
        flat_dep = state.depth.reshape(c * p, t_d, 2)
        d_irr = jnp.zeros_like(flat_irr)
        d_dep = jnp.zeros_like(flat_dep)
        picks_s = jnp.stack(picks)  # (C, B)
        ages_s = jnp.stack(ages)  # (C, P)
        for j in range(nb):
            cid = own_ids[j]
            ok = own_valid[j]
            pick = picks_s[cid]  # (B,)
            age_pick = ages_s[cid][pick]
            rows = cid * p + pick
            old_irr = flat_irr[rows]
            old_dep = flat_dep[rows]
            irr_b = irr_all[j * b:(j + 1) * b]
            dep_b = dep_all[j * b:(j + 1) * b]
            fresh = (age_pick > 5_000)[:, None, None]
            irr_upd = jnp.where(
                fresh, irr_b, old_irr * hysteresis + irr_b * (1 - hysteresis)
            )
            dep_upd = jnp.where(
                fresh, dep_b, old_dep * hysteresis + dep_b * (1 - hysteresis)
            )
            d_irr = d_irr.at[rows].add(jnp.where(ok, irr_upd - old_irr, 0.0))
            d_dep = d_dep.at[rows].add(jnp.where(ok, dep_upd - old_dep, 0.0))
        new_irr_all = flat_irr + jax.lax.psum(d_irr, axis_name)
        new_dep_all = flat_dep + jax.lax.psum(d_dep, axis_name)
        return ProbeCascades(
            irradiance=new_irr_all.reshape(state.irradiance.shape),
            depth=new_dep_all.reshape(state.depth.shape),
            cell=jnp.stack(desireds),
            age=jnp.stack([
                ages[ci].at[picks[ci]].set(0) for ci in range(c)
            ]),
        )

    new_irr, new_dep, new_cell, new_age = [], [], [], []
    for ci in range(c):
        pick, age, desired = picks[ci], ages[ci], desireds[ci]
        irr_b = irr_all[ci * b:(ci + 1) * b]
        dep_b = dep_all[ci * b:(ci + 1) * b]
        # Hysteresis blend; fresh (moved/invalid) probes take the new value.
        fresh = (age[pick] > 5_000)[:, None, None]
        old_irr = state.irradiance[ci][pick]
        old_dep = state.depth[ci][pick]
        irr_upd = jnp.where(
            fresh, irr_b, old_irr * hysteresis + irr_b * (1 - hysteresis)
        )
        dep_upd = jnp.where(
            fresh, dep_b, old_dep * hysteresis + dep_b * (1 - hysteresis)
        )
        new_irr.append(state.irradiance[ci].at[pick].set(irr_upd))
        new_dep.append(state.depth[ci].at[pick].set(dep_upd))
        new_cell.append(desired)
        new_age.append(age.at[pick].set(0))

    return ProbeCascades(
        irradiance=jnp.stack(new_irr),
        depth=jnp.stack(new_dep),
        cell=jnp.stack(new_cell),
        age=jnp.stack(new_age),
    )


def sample_probes(
    state: ProbeCascades,
    world_position: jnp.ndarray,  # (H, W, 3)
    normal: jnp.ndarray,  # (H, W, 3)
    valid: jnp.ndarray,  # (H, W)
    camera_position: jnp.ndarray,
    grid: tuple,
    spacing_base: float,
    spacing_ladder=None,  # per-cascade multipliers (cascade_spacings)
) -> jnp.ndarray:
    """(H, W, 3) irradiance, blended across cascades near their borders.

    The finest containing cascade dominates; within ~1.5 cells of its usable
    edge it cross-fades into the next coarser one (the reference scrolls +
    blends cascades rather than hard-switching — irradiance_cache.cpp:362-453).

    Round-5 gather-count restructure (the round-4 sampler issued 64
    screen-sized gathers = 8 corners x (irradiance + depth) x 4 cascades,
    ~1.7 s/frame at 2M px alone):
    - PER-PIXEL CASCADE PAIR: only the finest containing cascade and its
      next-coarser neighbor are fetched (the front-to-back composite
      saturates after the finest cascade everywhere except its 1.5-cell
      fade band, where exactly the next cascade contributes — deeper
      overlaps cannot occur because fade bands of 4x-spaced cascades never
      nest). 4 cascades of fetches -> 2.
    - CORNER-PACKED IRRADIANCE: the irradiance texel id depends only on the
      surface normal, so all 8 corner probes read the SAME texel —
      ``irr_packed`` rows hold that texel for the 8 corners of each cell
      (built by 8 tiny P-row gathers), turning 8 screen gathers into ONE
      24-f32-row gather (the LPV corner-packed-volume trick).
    - Depth moments stay per-corner (the Chebyshev test direction differs
      per corner): 8 gathers x 2 cascades.
    Net: 64 -> 2 x (1 + 8) = 18 screen-sized gathers."""
    cnum = state.irradiance.shape[0]
    gx, gy, gz = grid
    h, w, _ = world_position.shape
    p = gx * gy * gz
    spacings = cascade_spacings(spacing_base, cnum, spacing_ladder)
    spac = jnp.asarray(spacings, jnp.float32)  # (C,)
    bases = jnp.stack([
        jnp.floor(camera_position / spacings[ci]).astype(jnp.int32)
        - jnp.asarray([gx, gy, gz], jnp.int32) // 2
        for ci in range(cnum)
    ])  # (C, 3)

    # Corner-packed irradiance table: row (cell-slot, texel) -> the texel for
    # the cell's 8 corner probes (+dx +dy +dz offsets in slot space).
    slots_xyz = _slot_coords(grid)  # (P, 3)
    packs = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                c = (slots_xyz + jnp.asarray([dx, dy, dz], jnp.int32)) % (
                    jnp.asarray([gx, gy, gz], jnp.int32)
                )
                s = c[:, 0] + c[:, 1] * gx + c[:, 2] * gx * gy  # (P,)
                packs.append(state.irradiance[:, s])  # (C, P, T, 3)
    irr_packed = jnp.concatenate(packs, axis=-1)  # (C, P, T, 24)
    irr_tab = irr_packed.reshape(-1, 24)  # rows: ((ci*P + slot)*T + texel)
    dep_tab = state.depth.reshape(-1, 2)  # rows: ((ci*P + slot)*Td + texel)

    # Per-pixel finest containing cascade + its fade.
    def cascade_geom(ci_arr):
        """Per-pixel spacing/base/cell math for a traced cascade index.

        Selected by per-cascade WHERE chains, not table gathers — a
        screen-sized gather costs ~27 ms at 2M px even on a 4-row table."""
        sp = jnp.full(ci_arr.shape, float(spacings[0]), jnp.float32)
        base = jnp.broadcast_to(bases[0], ci_arr.shape + (3,))
        for ci in range(1, cnum):
            sel = ci_arr == ci
            sp = jnp.where(sel, float(spacings[ci]), sp)
            base = jnp.where(sel[..., None], bases[ci], base)
        sp = sp[..., None]  # (H, W, 1)
        cellf = world_position / sp - 0.5
        c0 = jnp.floor(cellf).astype(jnp.int32)
        f = cellf - c0
        gvec = jnp.asarray([gx, gy, gz], jnp.int32)
        inside = jnp.all((c0 >= base + 1) & (c0 + 1 <= base + gvec - 2), axis=-1)
        lo = (base + 1).astype(jnp.float32)
        hi = (base + gvec - 2).astype(jnp.float32)
        edge = jnp.min(jnp.minimum(cellf - lo, hi - (cellf + 1.0)), axis=-1)
        fade = jnp.clip(edge / 1.5, 0.0, 1.0)
        return sp[..., 0], c0, f, inside, fade

    # inside flags per cascade (cheap elementwise; no gathers).
    insides = []
    for ci in range(cnum):
        sp = spacings[ci]
        cellf = world_position / sp - 0.5
        c0 = jnp.floor(cellf).astype(jnp.int32)
        gvec = jnp.asarray([gx, gy, gz], jnp.int32)
        insides.append(jnp.all(
            (c0 >= bases[ci] + 1) & (c0 + 1 <= bases[ci] + gvec - 2), axis=-1
        ))
    inside_any = jnp.stack(insides)  # (C, H, W)
    # Finest containing cascade (argmax picks the first True).
    ci0 = jnp.argmax(inside_any, axis=0).astype(jnp.int32)  # (H, W)
    has_any = jnp.any(inside_any, axis=0)

    total = jnp.zeros((h, w, 3), jnp.float32)
    acc = jnp.zeros((h, w, 1), jnp.float32)
    for j in (0, 1):
        ci_px = jnp.minimum(ci0 + j, cnum - 1)
        sp, c0, f, inside, fade = cascade_geom(ci_px)
        if j == 0:
            wc = jnp.where(ci_px == cnum - 1, 1.0, fade)  # coarsest: hard edge
        else:
            # The coarser member's own fade ~ 1 where the finer one fades
            # (bands of 4x-spaced cascades don't nest); the front-to-back
            # (1 - acc) factor below applies the remainder — skip entirely
            # when j=0 already was the coarsest (ci_px unchanged).
            wc = jnp.where(ci_px == ci0, 0.0, 1.0)
        use = inside & valid & has_any
        wct = jnp.where(use, wc, 0.0)[..., None]

        # Irradiance: ONE corner-packed gather at the normal's texel.
        iuv = dir_to_oct_uv(normal)
        it = jnp.clip((iuv * IRR_RES).astype(jnp.int32), 0, IRR_RES - 1)
        iidx = it[..., 1] * IRR_RES + it[..., 0]
        gvec = jnp.asarray([gx, gy, gz], jnp.int32)
        cw = ((c0 % gvec) + gvec) % gvec
        slot0 = cw[..., 0] + cw[..., 1] * gx + cw[..., 2] * gx * gy
        row = irr_tab[
            ((ci_px * p + slot0) * (IRR_RES * IRR_RES)) + iidx
        ]  # (H, W, 24)
        e8 = row.reshape(h, w, 8, 3)

        irr = jnp.zeros((h, w, 3), jnp.float32)
        wsum = jnp.zeros((h, w, 1), jnp.float32)
        k = 0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    cell = c0 + jnp.asarray([dx, dy, dz], jnp.int32)
                    cw_k = ((cell % gvec) + gvec) % gvec
                    slot = (
                        cw_k[..., 0] + cw_k[..., 1] * gx + cw_k[..., 2] * gx * gy
                    )
                    probe_pos = (cell.astype(jnp.float32) + 0.5) * sp[..., None]
                    to_probe = probe_pos - world_position
                    dist = jnp.linalg.norm(to_probe, axis=-1, keepdims=True)
                    dir_tp = to_probe / jnp.maximum(dist, 1e-6)
                    tw = (
                        jnp.where(dx, f[..., 0], 1 - f[..., 0])
                        * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                        * jnp.where(dz, f[..., 2], 1 - f[..., 2])
                    )[..., None]
                    bw = (jnp.sum(dir_tp * normal, axis=-1, keepdims=True) + 1.0) * 0.5
                    bw = bw * bw + 0.2
                    duv = dir_to_oct_uv(-dir_tp)
                    dt = jnp.clip(
                        (duv * DEPTH_RES).astype(jnp.int32), 0, DEPTH_RES - 1
                    )
                    didx = dt[..., 1] * DEPTH_RES + dt[..., 0]
                    moments = dep_tab[
                        ((ci_px * p + slot) * (DEPTH_RES * DEPTH_RES)) + didx
                    ]  # (H, W, 2)
                    mean = moments[..., 0:1]
                    var = jnp.maximum(moments[..., 1:2] - mean * mean, 1e-4)
                    delta = jnp.maximum(dist - mean, 0.0)
                    cheb = var / (var + delta * delta)
                    vis = jnp.where(dist <= mean, 1.0, jnp.maximum(cheb, 0.05))
                    wgt = tw * bw * vis
                    irr = irr + e8[:, :, k] * wgt
                    wsum = wsum + wgt
                    k += 1
        irr = irr / jnp.maximum(wsum, 1e-5)
        total = total + irr * wct * (1.0 - acc)
        acc = acc + wct * (1.0 - acc)
    return total / jnp.maximum(acc, 1e-5) * jnp.minimum(acc * 1e5, 1.0)
