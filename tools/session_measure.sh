#!/bin/bash
# One-shot measurement agenda (run when the TPU tunnel is back; keep the host
# otherwise QUIET — concurrent jobs poison compile times).
#
# DECISION TREE (apply after the numbers land):
# - If bitmask32/16/8 beats binned32 on the main raster AND the Mosaic compile
#   succeeds (risk: clz/while_loop in scalar core; if the compile fails try
#   CTZ_IMPL="popcount" then "select" in raster_bitmask.py):
#     * flip config.raster_bitmask default to True, set the winning win_h at
#       the three call sites (frame.py main/RSM, shadow.py cascades),
#     * rerun one golden file + bench.py, update ROADMAP/README numbers.
# - Else if pa4/pa8 beats pa1 (step 1 d1/full rows + step 2 parity_up_pa*):
#     * set config.raster_pa_unroll default to the winner.
# - CSM step 3: pa1-vs-bitmask delta decides the cascade kernel; the
#   range-windowing win is (old ~36.7 ms/cascade baseline) vs pa1 now.
# - Step 2 csm1/csm2/proxyall/lpv_steps8/lpv_c2 quantify the remaining CSM/LPV
#   quality-vs-time axes; do NOT change those defaults (parity constants) —
#   record the numbers in ROADMAP for round-4 planning.
# - Finally: python bench.py (quiet machine) and refresh the round history.
set -x
cd /root/repo

# 0. FAIL-FAST: does Mosaic compile the bitmask kernel (clz + while_loop on
# the scalar core)? If this fails, edit CTZ_IMPL in raster_bitmask.py
# ("popcount", then "select") and retry before burning time on steps 1-4.
timeout 900 python - <<'EOF' 2>&1 | grep -v WARNING
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
from androidrenderer_tpu.ops.raster.raster_bitmask import rasterize_bitmask
from androidrenderer_tpu.ops.raster.raster_binned import rasterize_binned
from androidrenderer_tpu.scene.procedural import courtyard_scene

h, w = 256, 256
scene, _ = courtyard_scene().build()
cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(w, h))
cam.set_position([0.0, 1.7, 6.0]); cam.pitch, cam.yaw = -0.05, np.pi
view = cam.view_data()
clip = transform_to_clip(scene.positions, jnp.asarray(view.view_proj))
su = triangle_setup(clip, scene.tri_indices, w, h,
                    double_sided=scene.tri_double_sided, tri_valid=scene.tri_valid)
d1, v1 = jax.jit(lambda s: rasterize_bitmask(s, h, w, num_slabs=2))(su)
d2, v2 = jax.jit(lambda s: rasterize_binned(s, h, w, num_slabs=2))(su)
print("bitmask compiles; equal to binned:",
      bool(jnp.array_equal(d1, d2)), bool(jnp.array_equal(v1, v2)))
EOF

# 1. Phase A structure probe: scan floor (d3) + pa_unroll amortization.
timeout 2400 python - <<'EOF' 2>&1 | grep -v WARNING
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
from androidrenderer_tpu.ops.raster.raster_binned import rasterize_binned, auto_slabs_binned
from androidrenderer_tpu.scene.procedural import courtyard_scene

h, w = 1088, 1920
scene, stats = courtyard_scene(column_rings=4, detail=13).build()
cam = Camera(fov_degrees=75.0, aspect=w/h, render_resolution=(w, h))
cam.set_position([0.0, 1.7, 6.0]); cam.pitch, cam.yaw = -0.05, np.pi
view = cam.view_data()
pos = scene.positions; tri = scene.tri_indices; valid = scene.tri_valid
vp = jnp.asarray(view.view_proj)

def make(dm=0, pu=1, wh=32):
    ns = auto_slabs_binned(h, w, win_h=wh)
    def run(seed):
        clip = transform_to_clip(pos + seed * 1e-30, vp)
        su = triangle_setup(clip, tri, w, h, double_sided=scene.tri_double_sided, tri_valid=valid)
        d, v = rasterize_binned(su, h, w, win_h=wh, cap=14, kb=8, unroll=2, num_slabs=ns, debug_mode=dm, pa_unroll=pu)
        return d[0, 0] + v[0, 0].astype(jnp.float32)
    @jax.jit
    def chain(x):
        for _ in range(10):
            x = run(x)
        return x
    return chain

for name, dm, pu, wh in [
    ("d3 scan floor", 3, 1, 32), ("d3 unroll4", 3, 4, 32),
    ("d1 PhaseA", 1, 1, 32), ("d1 unroll4", 1, 4, 32), ("d1 unroll8", 1, 8, 32),
    ("full unroll1", 0, 1, 32), ("full unroll4", 0, 4, 32),
    ("full win16", 0, 4, 16), ("full win64", 0, 4, 64),
]:
    fn = make(dm, pu, wh)
    t0 = time.perf_counter(); np.asarray(fn(jnp.float32(0.0))); c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(jnp.float32(0.0))); ts.append((time.perf_counter()-t0)*1e3/10)
    print(f"{name:14s} {min(ts):7.2f} ms/raster (compile {c:.0f}s)")
EOF

# 2. CSM + LPV decomposition of the upscaled parity frame.
timeout 4800 python tools/profile_toggles.py --configs parity_up,parity_up_pa4,parity_up_pa8,parity_up_csm1,parity_up_csm2,parity_up_proxyall,parity_up_lpv_steps8,parity_up_lpv_c2,parity_up_lpv_b1 2>&1 | grep -v WARNING

# 3. CSM standalone: live-range windowing effect (near cascade culls most of
# the scene; ranges skip dead chunks/prefixes at zero Phase-A cost).
timeout 2400 python - <<'EOF' 2>&1 | grep -v WARNING
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.ops import shadow as shadow_ops
from androidrenderer_tpu.scene.procedural import courtyard_scene

h, w = 1088, 1920
scene, stats = courtyard_scene(column_rings=4, detail=13).build()
cam = Camera(fov_degrees=75.0, aspect=w/h, render_resolution=(w, h))
cam.set_position([0.0, 1.7, 6.0]); cam.pitch, cam.yaw = -0.05, np.pi
view = cam.view_data()
sun = jnp.asarray([0.3, -0.8, 0.4]); sun = sun / jnp.linalg.norm(sun)

def make_csm(pa, bm=False):
    def csm(seed):
        cas = shadow_ops.fit_cascades(
            jnp.asarray(view.inverse_view),
            view.projection[0, 0], view.projection[1, 1], sun,
            4, 1024, 0.05, 128.0, 0.95)
        maps = shadow_ops.render_shadow_cascades(
            scene.positions + seed * 1e-30, scene.tri_indices, scene.tri_valid,
            cas, 1024, use_pallas=True, double_sided=scene.tri_double_sided,
            pa_unroll=pa, use_bitmask=bm)
        return maps[:, 0, 0]
    @jax.jit
    def chain(x):
        for i in range(10):
            x = csm(x.sum())[0]
        return x
    return chain

for name, pa, bm in [("pa1", 1, False), ("pa4", 4, False), ("pa8", 8, False),
                     ("bitmask", 1, True)]:
    fn = make_csm(pa, bm)
    t0 = time.perf_counter(); np.asarray(fn(jnp.float32(0.0))); c = time.perf_counter()-t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(jnp.float32(0.0))); ts.append((time.perf_counter()-t0)*1e3/10)
    print(f"CSM 4-cascade pass {name}: {min(ts):.2f} ms (compile {c:.0f}s)")
EOF

# 4. Bitmask-driven kernel vs binned: main raster + CSM-shaped depth-only.
timeout 2400 python - <<'PYEOF' 2>&1 | grep -v WARNING
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.ops.raster import transform_to_clip, triangle_setup
from androidrenderer_tpu.ops.raster.raster_binned import rasterize_binned, auto_slabs_binned
from androidrenderer_tpu.ops.raster.raster_bitmask import rasterize_bitmask
from androidrenderer_tpu.scene.procedural import courtyard_scene

h, w = 1088, 1920
scene, stats = courtyard_scene(column_rings=4, detail=13).build()
cam = Camera(fov_degrees=75.0, aspect=w/h, render_resolution=(w, h))
cam.set_position([0.0, 1.7, 6.0]); cam.pitch, cam.yaw = -0.05, np.pi
view = cam.view_data()
pos = scene.positions; tri = scene.tri_indices; valid = scene.tri_valid
vp = jnp.asarray(view.view_proj)
ns = auto_slabs_binned(h, w, win_h=32)

def make(kind, wh=32):
    def run(seed):
        clip = transform_to_clip(pos + seed * 1e-30, vp)
        su = triangle_setup(clip, tri, w, h, double_sided=scene.tri_double_sided, tri_valid=valid)
        if kind == "binned":
            d, v = rasterize_binned(su, h, w, win_h=wh, cap=14, kb=8, unroll=2, num_slabs=ns)
        else:
            d, v = rasterize_bitmask(su, h, w, win_h=wh, kb=8, unroll=2, num_slabs=ns)
        return d[0, 0] + v[0, 0].astype(jnp.float32)
    @jax.jit
    def chain(x):
        for _ in range(10):
            x = run(x)
        return x
    return chain

for name, kind, wh in [("binned32", "binned", 32), ("bitmask32", "bitmask", 32),
                       ("bitmask16", "bitmask", 16), ("bitmask8", "bitmask", 8)]:
    fn = make(kind, wh)
    t0 = time.perf_counter(); np.asarray(fn(jnp.float32(0.0))); c = time.perf_counter()-t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(jnp.float32(0.0))); ts.append((time.perf_counter()-t0)*1e3/10)
    print(f"main {name:10s} {min(ts):7.2f} ms/raster (compile {c:.0f}s)")
PYEOF
