"""Decompose sample_csm's 23.8 ms stubpcf delta (round-3 session-6 sweep).

Variants isolate: the packed 2x2 PCF gather, the per-cascade transform
select loop (+ normal offset), the pack (materialization vs fusion into the
gather), and a f16-packed 8-byte tap row (row-BYTES model: large operands
scale with row bytes — 16 B ~12 ms / 2M lookups, so 0.94M lookups should be
~6 ms; anything above that is NOT the gather).

Chained seeds keep every gather's indices data-dependent (constant-folding
lies otherwise — docs/ROADMAP.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops import shadow as shadow_ops
from androidrenderer_tpu.ops.shadow import CascadeData, _pack_pcf_taps

H, W = 736, 1280
C, R = 4, 1024

rng = np.random.default_rng(0)
wp = jnp.asarray(rng.uniform(-20, 20, (H, W, 3)), jnp.float32)
vd = jnp.asarray(rng.uniform(0.1, 60, (H, W)), jnp.float32)
ndl = jnp.asarray(rng.uniform(0, 1, (H, W, 1)), jnp.float32)
nrm = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
maps = jnp.asarray(rng.uniform(0, 1, (C, R, R)), jnp.float32)
mats = np.tile(np.eye(4, dtype=np.float32)[None], (C, 1, 1))
for k in range(C):
    mats[k, 0, 0] = 1.0 / (5.0 * (k + 1))
    mats[k, 1, 1] = 1.0 / (5.0 * (k + 1))
    mats[k, 2, 2] = 0.01
cascades = CascadeData(
    matrices=jnp.asarray(mats),
    splits=jnp.asarray([6.0, 14.0, 30.0, 64.0]),
    canonical=jnp.asarray(mats[-1]),
)


def variant_full(wp, vd, ndl, nrm, maps):
    return shadow_ops.sample_csm(wp, vd, ndl, cascades, maps, 5e-4, normal=nrm)


def variant_nonormal(wp, vd, ndl, nrm, maps):
    return shadow_ops.sample_csm(wp, vd, ndl, cascades, maps, 5e-4, normal=None)


def _common(wp, vd, maps):
    idx = jnp.sum(
        (vd[..., None] > cascades.splits[None, None, :]).astype(jnp.int32), axis=-1
    )
    ci = jnp.minimum(idx, C - 1)
    wx, wy, wz = (wp[..., k] for k in range(3))
    px_ = jnp.zeros_like(wx)
    py_ = jnp.zeros_like(wx)
    pz_ = jnp.zeros_like(wx)
    for k in range(C):
        mk = cascades.matrices[k]
        sel = ci == k
        px_ = jnp.where(sel, mk[0, 0] * wx + mk[0, 1] * wy + mk[0, 2] * wz + mk[0, 3], px_)
        py_ = jnp.where(sel, mk[1, 0] * wx + mk[1, 1] * wy + mk[1, 2] * wz + mk[1, 3], py_)
        pz_ = jnp.where(sel, mk[2, 0] * wx + mk[2, 1] * wy + mk[2, 2] * wz + mk[2, 3], pz_)
    u = px_ * 0.5 + 0.5
    v = 0.5 - py_ * 0.5
    x = u * R - 0.5
    y = v * R - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = jnp.clip(x0.astype(jnp.int32), 0, R - 1)
    yi = jnp.clip(y0.astype(jnp.int32), 0, R - 1)
    return ci, xi, yi, x - x0, y - y0, pz_


def variant_gather_only(wp, vd, ndl, nrm, maps):
    """Everything except tap fetch replaced: pack + ONE (N,4) gather + consume."""
    ci, xi, yi, fx, fy, z = _common(wp, vd, maps)
    packed = _pack_pcf_taps(maps)
    taps = packed[ci * (R * R) + yi * R + xi]
    return jnp.sum(taps, axis=-1, keepdims=True) + (fx + fy + z)[..., None]


def variant_transform_only(wp, vd, ndl, nrm, maps):
    """The cascade-select transform + index math, NO gather."""
    ci, xi, yi, fx, fy, z = _common(wp, vd, maps)
    return (
        (ci + xi + yi).astype(jnp.float32) + fx + fy + z + maps[0, 0, 0]
    )[..., None]


def variant_barrier(wp, vd, ndl, nrm, maps):
    """Full math, but the packed tap table is forced to materialize."""
    ci, xi, yi, fx, fy, z = _common(wp, vd, maps)
    packed = jax.lax.optimization_barrier(_pack_pcf_taps(maps))
    taps = packed[ci * (R * R) + yi * R + xi]
    zref = z + 2e-5
    lit4 = (zref[..., None] >= taps).astype(jnp.float32)
    lit = (
        lit4[..., 0] * (1 - fx) * (1 - fy)
        + lit4[..., 1] * fx * (1 - fy)
        + lit4[..., 2] * (1 - fx) * fy
        + lit4[..., 3] * fx * fy
    )
    return lit[..., None]


def variant_f16pack(wp, vd, ndl, nrm, maps):
    """Taps quantized to f16 and bitcast-packed 4 -> 2 f32 (8 B rows)."""
    ci, xi, yi, fx, fy, z = _common(wp, vd, maps)
    packed = _pack_pcf_taps(maps).astype(jnp.float16)  # (N, 4)
    p2 = jax.lax.bitcast_convert_type(
        packed.reshape(-1, 2, 2), jnp.float32
    ).reshape(-1, 2)
    taps2 = p2[ci * (R * R) + yi * R + xi]
    taps = jax.lax.bitcast_convert_type(taps2, jnp.float16).reshape(H, W, 4)
    zref = (z + 2e-5).astype(jnp.float16)
    lit4 = (zref[..., None] >= taps).astype(jnp.float32)
    lit = (
        lit4[..., 0] * (1 - fx) * (1 - fy)
        + lit4[..., 1] * fx * (1 - fy)
        + lit4[..., 2] * (1 - fx) * fy
        + lit4[..., 3] * fx * fy
    )
    return lit[..., None]


def bench(name, fn, chain=10):
    @jax.jit
    def chained(seed):
        s = seed
        for _ in range(chain):
            out = fn(wp + s * 1e-30, vd + s * 1e-30, ndl, nrm, maps + s * 1e-30)
            s = out[0, 0, 0]
        return s

    t0 = time.perf_counter()
    np.asarray(chained(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3 / chain)
    print(f"{name:18s} {min(ts):7.2f} ms/call (compile {c:.0f}s)")


if __name__ == "__main__":
    which = sys.argv[1:] or [
        "full", "nonormal", "gather_only", "transform_only", "barrier", "f16pack",
    ]
    for name in which:
        bench(name, globals()[f"variant_{name}"])
