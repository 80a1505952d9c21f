"""Independent float64 oracles for sky, LPV propagation, and SSAO (VERDICT
round-2 #7: extend the oracle beyond the direct-lighting slice).

Each oracle is written from the reference's shader/paper spec — plain numpy
loops, no shared code with the production ops (shared *constants* are the
SURVEY §2.7 parity data: Hillaire atmosphere coefficients, LPV solid angles,
SH basis factors)."""

import numpy as np
import jax.numpy as jnp
import pytest

from androidrenderer_tpu.ops import sky as sky_ops
from androidrenderer_tpu.ops import sh as sh_ops
from androidrenderer_tpu.ops import lpv as lpv_ops


# --------------------------------------------------------------- sky oracle


def _sky_oracle(direction, sun_dir, altitude_km=0.2, steps=400, sun_steps=60):
    """Single-scatter Hillaire sky by brute-force float64 integration: nested
    numeric sun-transmittance integrals instead of the production's analytic
    Chapman approximation."""
    RG, RA = 6.36, 6.46  # ground/atmosphere radius, megameters
    # Constants from the reference shader (sky/common.glsl:25-33): ARPC-modified
    # rayleigh/ozone bases, NOT Hillaire's published earth preset.
    rayleigh = np.array([6.6, 12.3, 29.4])  # per Mm
    mie_s, mie_a = 3.996, 4.4
    ozone = np.array([2.26, 1.54, 0.0])

    def densities(h_km):
        rho_r = np.exp(-h_km / 8.0)
        rho_m = np.exp(-h_km / 1.2)
        rho_o = max(0.0, 1.0 - abs(h_km - 25.0) / 15.0)
        return rho_r, rho_m, rho_o

    def extinction(p):
        h = (np.linalg.norm(p) - RG) * 1e3
        rr, rm, ro = densities(h)
        return rayleigh * rr + (mie_s + mie_a) * rm + ozone * ro

    def exit_t(o, d, radius):
        b = np.dot(o, d)
        c = np.dot(o, o) - radius * radius
        disc = b * b - c
        if disc < 0:
            return 0.0
        return -b + np.sqrt(disc)

    d = np.asarray(direction, np.float64)
    d /= np.linalg.norm(d)
    to_sun = -np.asarray(sun_dir, np.float64)
    to_sun /= np.linalg.norm(to_sun)
    o = np.array([0.0, RG + altitude_km * 1e-3, 0.0])

    t_atmo = exit_t(o, d, RA)
    b = np.dot(o, d)
    c_g = np.dot(o, o) - RG * RG
    disc = b * b - c_g
    t_max = t_atmo
    if disc > 0 and -b - np.sqrt(disc) > 0:
        t_max = min(t_max, -b - np.sqrt(disc))

    mu = np.dot(d, to_sun)
    ph_r = 3.0 / (16.0 * np.pi) * (1.0 + mu * mu)
    g = 0.8
    ph_m = (3.0 / (8.0 * np.pi)) * ((1 - g * g) * (1 + mu * mu)) / (
        (2 + g * g) * (1 + g * g - 2 * g * mu) ** 1.5
    )

    dt = t_max / steps
    lum = np.zeros(3)
    trans = np.ones(3)
    for i in range(steps):
        p = o + d * (i + 0.5) * dt
        h = (np.linalg.norm(p) - RG) * 1e3
        rr, rm, _ = densities(h)
        #

        # sun transmittance by numeric integration along the sun ray
        t_sun = exit_t(p, to_sun, RA)
        # ground shadow
        bs = np.dot(p, to_sun)
        cs = np.dot(p, p) - RG * RG
        ds_ = bs * bs - cs
        if ds_ > 0 and -bs - np.sqrt(ds_) > 0:
            sun_t = np.zeros(3)
        else:
            od = np.zeros(3)
            dts = t_sun / sun_steps
            for j in range(sun_steps):
                od += extinction(p + to_sun * (j + 0.5) * dts) * dts
            sun_t = np.exp(-od)
        scat_r = rayleigh * rr
        scat_m = mie_s * rm
        ext = extinction(p)
        in_scat = (scat_r * ph_r + scat_m * ph_m) * sun_t
        step_t = np.exp(-ext * dt)
        lum += trans * in_scat * (1.0 - step_t) / np.maximum(ext, 1e-9)
        trans *= step_t
    return lum


def test_sky_single_scatter_vs_float64_oracle():
    sun_dir = np.array([0.3, -0.8, 0.2], np.float64)
    dirs = [
        [0.0, 1.0, 0.0],  # zenith
        [0.7, 0.3, 0.0],
        [-0.5, 0.2, 0.6],
        [0.0, 0.08, -1.0],  # near horizon
        [-0.3, 0.5, -0.4],
    ]
    dirs = [np.asarray(v) / np.linalg.norm(v) for v in dirs]
    prod = np.asarray(
        sky_ops.sky_radiance(
            jnp.asarray(np.stack(dirs), jnp.float32), jnp.asarray(sun_dir, jnp.float32),
            multiscatter=False,
        )
    )
    oracle = np.stack([_sky_oracle(v, sun_dir) for v in dirs])
    # The production march is 12 steps with an analytic (Chapman-style) sun
    # transmittance; the oracle integrates everything numerically in float64.
    # Gate: per-channel agreement within 35% where the signal is significant,
    # and near-perfect correlation across the direction set (catches unit,
    # density, and phase-function errors; tolerates quadrature differences).
    sig = oracle > oracle.max() * 0.02
    rel = np.abs(prod - oracle) / np.maximum(oracle, 1e-12)
    assert np.all(rel[sig] < 0.35), rel
    corr = np.corrcoef(prod.ravel(), oracle.ravel())[0, 1]
    assert corr > 0.995, corr
    # Physical structure: zenith is bluer (b/r ratio) than the horizon.
    assert prod[0, 2] / max(prod[0, 0], 1e-12) > prod[3, 2] / max(prod[3, 0], 1e-12)


# ------------------------------------------------- LPV propagation oracle


def _sh_eval(v):
    c0, c1 = 0.282094791, 0.488602511
    return np.array([c0, -c1 * v[1], c1 * v[2], -c1 * v[0]])


def _cos_lobe(v):
    c0, c1 = 0.886226925, 1.02332671
    return np.array([c0, -c1 * v[1], c1 * v[2], -c1 * v[0]])


def _lpv_oracle_step(rad, gv, occlusion):
    """One propagation step (lpv_propagate.comp.slang:36-140) in float64 with
    explicit per-cell loops. rad: (3, 4, R, R, R) grid order (z, y, x)."""
    r = rad.shape[-1]
    dirs = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        np.float64,
    )
    sa_direct, sa_side = 0.4006696846, 0.4234413544
    out = np.zeros_like(rad)
    for z in range(r):
        for y in range(r):
            for x in range(r):
                cell = np.array([x, y, z])
                for d_idx in range(6):
                    d = dirs[d_idx]
                    src = cell - d.astype(np.int64)
                    if np.any(src < 0) or np.any(src >= r):
                        continue
                    nrad = rad[:, :, src[2], src[1], src[0]]  # (3, 4)
                    if occlusion:
                        ngv = gv[:, src[2], src[1], src[0]]
                        e = _sh_eval(d)
                        amp = ngv[0] * e[0] + abs(np.dot(ngv[1:], e[1:]))
                        occ = 1.0 - np.clip(amp, 0.0, 1.0)
                    else:
                        occ = 1.0
                    # direct face + 4 side faces
                    faces = [(d, d, sa_direct)]
                    for s_idx in range(6):
                        sdir = dirs[s_idx]
                        if np.argmax(np.abs(sdir)) == np.argmax(np.abs(d)):
                            continue
                        ev = d + 0.5 * sdir
                        ev = ev / np.linalg.norm(ev)
                        faces.append((ev, sdir, sa_side))
                    for ev, reproj, sa in faces:
                        esh = _sh_eval(ev)
                        lobe = _cos_lobe(reproj)
                        for ch in range(3):
                            flux = max(np.dot(nrad[ch], esh), 0.0) * sa / np.pi
                            out[ch, :, z, y, x] += flux * occ * lobe
    return out


@pytest.mark.parametrize("occlusion", [False, True])
def test_lpv_propagation_vs_float64_oracle(occlusion):
    r = 8  # propagate's flat-roll edge masks require a power-of-two R
    rng = np.random.default_rng(0)
    rad = np.zeros((1, 3, 4, r, r, r), np.float32)
    # A cosine-lobe source pointing +x at the center, plus a weak random field.
    lobe = _cos_lobe([1.0, 0.0, 0.0]).astype(np.float32)
    rad[0, :, :, 3, 3, 2] = np.outer([1.0, 0.6, 0.3], lobe)
    rad[0] += rng.uniform(0, 0.01, rad[0].shape).astype(np.float32)
    gv = np.zeros((1, 4, r, r, r), np.float32)
    if occlusion:
        gv[0, :, 3, 3, 3] = _sh_eval([-1.0, 0.0, 0.0]) * 0.9

    steps = 2
    prod = np.asarray(
        lpv_ops.propagate(
            jnp.asarray(rad), jnp.asarray(gv), steps, occlusion=occlusion
        )
    )[0]

    acc = rad[0].astype(np.float64)
    delta = rad[0].astype(np.float64)
    for _ in range(steps):
        delta = _lpv_oracle_step(delta, gv[0].astype(np.float64), occlusion)
        acc = acc + delta
    np.testing.assert_allclose(prod, acc, rtol=2e-4, atol=1e-6)


# ----------------------------------------------------------- SSAO oracle


def test_ssao_vs_float64_oracle():
    from androidrenderer_tpu.ops.gbuffer import GBuffer
    from androidrenderer_tpu.ops.lighting import ssao

    h = w = 32
    rng = np.random.default_rng(1)
    wp = np.zeros((h, w, 3), np.float32)
    wp[..., 0] = np.arange(w)[None, :] * 0.05
    wp[..., 2] = np.arange(h)[:, None] * 0.05
    wp[..., 1] = rng.uniform(0, 0.3, (h, w)).astype(np.float32)  # bumpy floor
    nrm = np.zeros((h, w, 3), np.float32)
    nrm[..., 1] = 1.0
    valid = np.ones((h, w), bool)

    gbuf = GBuffer(
        base_color=jnp.zeros((h, w, 3)), normal=jnp.asarray(nrm),
        roughness=jnp.ones((h, w, 1)), metalness=jnp.zeros((h, w, 1)),
        emission=jnp.zeros((h, w, 3)), world_position=jnp.asarray(wp),
        depth=jnp.ones((h, w)), valid=jnp.asarray(valid),
    )
    prod = np.asarray(ssao(gbuf, jnp.zeros(3), 0.05))[..., 0]

    # Oracle: the Alchemy-style estimator with de-wrapped taps, live-tap
    # normalization, and the separable depth-aware bilateral blur — explicit
    # float64 loops over pixels and taps.
    radius, bias, intensity = 0.5, 0.02, 1.0
    occ = np.zeros((h, w))
    live = np.zeros((h, w))
    yy = np.arange(h)[:, None]
    xx = np.arange(w)[None, :]
    for rr in (2, 5, 9):
        for dy, dx in ((0, rr), (0, -rr), (rr, 0), (-rr, 0), (rr, rr),
                       (-rr, rr), (rr, -rr), (-rr, -rr)):
            q = np.roll(wp.astype(np.float64), (dy, dx), axis=(0, 1))
            inb = (yy - dy >= 0) & (yy - dy < h) & (xx - dx >= 0) & (xx - dx < w)
            v = q - wp
            d2 = np.sum(v * v, axis=-1)
            vn = np.sum(v * nrm, axis=-1)
            contrib = np.maximum(vn - bias, 0.0) / (d2 + 1e-4)
            w_r = np.clip(1.0 - d2 / (radius * radius), 0.0, 1.0)
            occ += np.where(inb, contrib * w_r * np.sqrt(d2), 0.0)
            live += inb
    oracle = np.clip(1.0 - intensity * occ / np.maximum(live, 1.0) * 8.0, 0.0, 1.0)
    dep = np.ones((h, w))
    for axis in (0, 1):
        num = oracle.copy()
        den = np.ones_like(oracle)
        for o in (-2, -1, 1, 2):
            sh = (o, 0) if axis == 0 else (0, o)
            a_s = np.roll(oracle, sh, axis=(0, 1))
            d_s = np.roll(dep, sh, axis=(0, 1))
            inb = (
                (yy - o >= 0) & (yy - o < h) if axis == 0
                else np.broadcast_to((xx - o >= 0) & (xx - o < w), oracle.shape)
            )
            rel = np.abs(d_s - dep) / (np.abs(dep) + 1e-6)
            wgt = np.where(inb, (0.9 if abs(o) == 1 else 0.6) / (1.0 + 64.0 * rel), 0.0)
            num = num + a_s * wgt
            den = den + wgt
        oracle = num / den
    np.testing.assert_allclose(prod, oracle, rtol=5e-4, atol=5e-5)
