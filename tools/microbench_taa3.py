"""TAA gather: distinguish real gather cost from producer-fusion pathology.

Indices are chain-DEPENDENT in every variant (no constant folding / hoisting);
the operand is (a) a jit constant, (b) freshly built + optimization_barrier,
(c) freshly built, no barrier (the current taa.py formulation).

    python tools/microbench_taa3.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

H, W = 1088, 1920
N = H * W


def chain(fn, x0, n=10, reps=3):
    f = jax.jit(fn)
    out = f(x0)
    np.asarray(out[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = x0
        for _ in range(n):
            o = f(o)
        np.asarray(o[0, 0])
        times.append((time.perf_counter() - t0) * 1e3 / n)
    return float(np.median(times))


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    packed12 = jnp.asarray(rng.uniform(0, 1, (N, 12)).astype(np.float32))
    off = jnp.asarray(rng.integers(-3 * W, 3 * W, N).astype(np.int32))
    base = jnp.arange(N, dtype=jnp.int32)

    def dyn_idx(c):
        # Chain-dependent but value-stable index perturbation.
        j = (c[0, 0, 0] * 0.0).astype(jnp.int32)
        return (base + off + j) % N

    def build_packed(c):
        right = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
        down = jnp.concatenate([c[1:], c[-1:]], axis=0)
        down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
        return jnp.concatenate([c, right, down, down_right], axis=-1)

    def g_const_op(c):
        taps = packed12[dyn_idx(c)]
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g_const_op, img)
    print(f"gather dynidx, const operand   {t:7.2f} ms")

    def g_barrier(c):
        p = jax.lax.optimization_barrier(build_packed(c).reshape(N, 12))
        taps = p[dyn_idx(c)]
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g_barrier, img)
    print(f"gather dynidx, barrier build   {t:7.2f} ms")

    def g_fused(c):
        p = build_packed(c).reshape(N, 12)
        taps = p[dyn_idx(c)]
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g_fused, img)
    print(f"gather dynidx, fused build     {t:7.2f} ms")


if __name__ == "__main__":
    main()
