"""RT traversal step statistics + timing on the bench scene (VERDICT r3 #4).

Reports per-ray PARK step (the traversal step at which each ray reached the
end index) for primary rays and probe-style rays, plus wall time per trace at
several max_steps caps.  The lockstep while_loop runs until ALL rays park, so
the p100 of this distribution — not the mean — is the frame cost driver.

    python tools/microbench_rt.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax


def park_steps(bvh, origins, directions, tmin, tmax, max_steps=1024):
    """(R,) i32 — step index at which each ray parked (skip-link walk done)."""
    from androidrenderer_tpu.ops.rt import traverse as T

    r = origins.shape[0]
    m = bvh.node_rows.shape[0]
    inv_d = 1.0 / jnp.where(directions == 0.0, 1e-30, directions)
    idx = jnp.zeros((r,), jnp.int32)
    best_t = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    parked = jnp.full((r,), max_steps, jnp.int32)

    def cond(s):
        step, idx, *_ = s
        return (step < max_steps) & jnp.any(idx < m)

    def body(s):
        step, idx, best_t, parked = s
        active = idx < m
        ni = jnp.minimum(idx, m - 1)
        row = bvh.node_rows[ni]
        nmin, nmax = row[:, 0:3], row[:, 3:6]
        miss = row[:, 6].astype(jnp.int32)
        first_f = row[:, 7]
        count = row[:, 8]
        t0 = (nmin - origins) * inv_d
        t1 = (nmax - origins) * inv_d
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = active & (tn <= tf) & (tf >= tmin) & (tn <= best_t)
        is_leaf = box_hit & (first_f >= 0.0)
        for k in range(T.LEAF_SIZE):
            live = is_leaf & (k < count)
            o = 9 + k * 9
            v0 = row[:, o : o + 3]
            e1 = row[:, o + 3 : o + 6]
            e2 = row[:, o + 6 : o + 9]
            pvec = jnp.cross(directions, e2)
            det = jnp.sum(e1 * pvec, axis=-1)
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            tvec = origins - v0
            u = jnp.sum(tvec * pvec, axis=-1) * inv_det
            qvec = jnp.cross(tvec, e1)
            v = jnp.sum(directions * qvec, axis=-1) * inv_det
            t = jnp.sum(e2 * qvec, axis=-1) * inv_det
            ok = (live & (jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1.0) & (t > tmin) & (t < best_t))
            best_t = jnp.where(ok, t, best_t)
        # Lookahead jump (round 5): mirror trace_rays' 2-level descend.
        t_slot_f = row[:, T.LOOK0:T.LOOK0 + 4]
        t_box = row[:, T.LOOK0 + 4:T.LOOK0 + 28].reshape(-1, 4, 2, 3)
        tb0 = (t_box[:, :, 0, :] - origins[:, None, :]) * inv_d[:, None, :]
        tb1 = (t_box[:, :, 1, :] - origins[:, None, :]) * inv_d[:, None, :]
        ttn = jnp.max(jnp.minimum(tb0, tb1), axis=-1)
        ttf = jnp.min(jnp.maximum(tb0, tb1), axis=-1)
        t_hit = (t_slot_f >= 0.0) & (ttn <= ttf) & (ttf >= tmin) & (
            ttn <= best_t[:, None]
        )
        k1 = jnp.argmax(t_hit, axis=-1)
        oh1 = jnp.arange(4)[None, :] == k1[:, None]
        jump = jnp.sum(jnp.where(oh1, t_slot_f, 0.0), axis=-1).astype(jnp.int32)
        descend = box_hit & (first_f < 0.0) & jnp.any(t_hit, axis=-1)
        nxt = jnp.where(descend, jump, miss)
        nxt = jnp.where(active, nxt, idx)
        parked = jnp.where(active & (nxt >= m), step + 1, parked)
        return step + 1, nxt, best_t, parked

    _, _, _, parked = lax.while_loop(
        cond, body, (jnp.int32(0), idx, best_t, parked)
    )
    return parked


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="1024,512,384,256",
                    help="comma-separated max_steps caps for the timing sweep")
    ap.add_argument("--skip-park", action="store_true")
    args = ap.parse_args()

    import jax as _jax
    try:
        _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.ops.rt.traverse import trace_rays
    from androidrenderer_tpu.ops.sky import view_ray_directions
    from androidrenderer_tpu.scene.procedural import courtyard_scene

    scene, stats = courtyard_scene(column_rings=4, detail=13).build()
    bvh = scene.bvh
    print(f"# scene: {stats['num_triangles']} tris, "
          f"{bvh.node_rows.shape[0]} BVH nodes")

    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(256, 256))
    cam.set_position([0.0, 1.7, 6.0])
    cam.pitch, cam.yaw = -0.05, np.pi
    vd = cam.view_data()
    dirs = np.asarray(view_ray_directions(
        jnp.asarray(vd.inverse_view), vd.projection[0, 0], vd.projection[1, 1],
        256, 256)).reshape(-1, 3)
    o = np.broadcast_to(np.asarray(cam.position, np.float32), dirs.shape).copy()

    if not args.skip_park:
        ps = np.asarray(jax.jit(park_steps, static_argnames=())(
            bvh, jnp.asarray(o), jnp.asarray(dirs), 0.01, 1e30))
        q = np.percentile(ps, [50, 90, 99, 100])
        print(f"primary rays (65k): park steps p50={q[0]:.0f} p90={q[1]:.0f} "
              f"p99={q[2]:.0f} max={q[3]:.0f}")

        # Diffuse-bounce-style rays: random directions from surface points.
        rng = np.random.default_rng(0)
        d2 = rng.normal(size=dirs.shape).astype(np.float32)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        o2 = o + dirs * 2.0
        ps2 = np.asarray(jax.jit(park_steps)(
            bvh, jnp.asarray(o2), jnp.asarray(d2), 0.01, 1e30))
        q2 = np.percentile(ps2, [50, 90, 99, 100])
        print(f"random bounce rays:  park steps p50={q2[0]:.0f} p90={q2[1]:.0f} "
              f"p99={q2[2]:.0f} max={q2[3]:.0f}")

    # Timing vs max_steps cap (chained, DCE-proof).
    for cap in tuple(int(x) for x in args.caps.split(",") if x):
        def run_once(cap=cap):
            def step_fn(carry, _):
                hits = trace_rays(bvh, jnp.asarray(o) + carry * 1e-30,
                                  jnp.asarray(dirs), 0.01, 1e30, max_steps=cap)
                return carry * 1e-30 + hits.t[0] + hits.t[32768], None

            @jax.jit
            def run():
                last, _ = lax.scan(step_fn, jnp.float32(0), None, length=5)
                return last
            return run

        run = run_once()
        t0 = time.perf_counter()
        np.asarray(run())
        c = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run())
            times.append((time.perf_counter() - t0) * 1e3 / 5)
        print(f"cap {cap:5d}: {float(np.median(times)):8.2f} ms/trace (65k rays, "
              f"compile {c:.0f}s)")


if __name__ == "__main__":
    main()
