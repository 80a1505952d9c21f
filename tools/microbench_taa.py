"""TAA stage decomposition on the real TPU (chained in-jit timings).

The parity frame's TAA toggle delta is ~52 ms (docs/ROADMAP.md) while its only
screen-sized random gather should cost ~27 ms — this isolates where the rest
goes: motion vectors, the packed history fetch, the 3x3 clamp, and the blend
are timed as chained variants (each output feeds the next iteration's input so
nothing is DCE'd; one device sync at the end, bench.py pattern).

    python tools/microbench_taa.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops import taa


H, W = 1088, 1920


def chain(fn, *args, n=10, reps=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x[0, 0]), out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = args[0]
        rest = args[1:]
        for _ in range(n):
            o = f(o, *rest)
        np.asarray(o[0, 0])
        times.append((time.perf_counter() - t0) * 1e3 / n)
    return float(np.median(times))


def main():
    rng = np.random.default_rng(0)
    cur = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    hist = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    wpos = jnp.asarray(rng.uniform(-10, 10, (H, W, 3)).astype(np.float32))
    valid = jnp.ones((H, W), bool)
    m0 = jnp.asarray(np.eye(4, dtype=np.float32) + 1e-3)
    m1 = jnp.asarray(np.eye(4, dtype=np.float32) + 2e-3)
    mv = jnp.asarray(rng.uniform(-0.01, 0.01, (H, W, 2)).astype(np.float32))

    t = chain(lambda c: c * 0.999 + 0.001, cur)
    print(f"noop elementwise        {t:7.2f} ms")

    t = chain(lambda w_: taa.motion_vectors(w_, valid, m0, m1)[..., :1] * w_, wpos)
    print(f"motion vectors          {t:7.2f} ms")

    def resolve_full(c):
        r, _ = taa.taa_resolve(c, hist, jnp.bool_(True), mv)
        return r

    t = chain(resolve_full, cur)
    print(f"taa_resolve (full)      {t:7.2f} ms")

    def resolve_nogather(c):
        # History read replaced with an unshifted history (no gather).
        mn_mx = c  # keep clamp costs
        mn, mx = taa._neighborhood_minmax(c)
        h2 = jnp.clip(hist, mn, mx)
        return h2 + (c - h2) * 0.1

    t = chain(resolve_nogather, cur)
    print(f"clamp+blend, no gather  {t:7.2f} ms")

    def gather_only(c):
        uv = jnp.stack(
            [
                jnp.broadcast_to((jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :] / W, (H, W)),
                jnp.broadcast_to((jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None] / H, (H, W)),
            ],
            axis=-1,
        ) - mv * c[..., :2].mean() * 0.0 - mv
        return taa._bilinear_sample(hist + c * 0.0, uv)

    t = chain(gather_only, cur)
    print(f"packed history gather   {t:7.2f} ms")


if __name__ == "__main__":
    main()
