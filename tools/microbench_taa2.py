"""Isolate the TAA history-gather cost: construction vs gather vs row width.

    python tools/microbench_taa2.py
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
    # Near-identity indices (TAA-like: small reprojection offsets).
    base_idx = np.arange(N, dtype=np.int64)
    off = rng.integers(-3 * W, 3 * W, N)
    idx_near = jnp.asarray(((base_idx + off) % N).astype(np.int32))
    idx_rand = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

    def build_packed(c):
        right = jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1)
        down = jnp.concatenate([c[1:], c[-1:]], axis=0)
        down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
        return jnp.concatenate([c, right, down, down_right], axis=-1)

    t = chain(lambda c: build_packed(c)[..., :3] * 0.999, img)
    print(f"build packed only             {t:7.2f} ms")

    def g_pre_near(c):
        taps = packed12[idx_near] + c.reshape(N, 3).sum() * 0.0
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g_pre_near, img)
    print(f"prebuilt gather near 12ch     {t:7.2f} ms")

    def g_pre_rand(c):
        taps = packed12[idx_rand] + c.reshape(N, 3).sum() * 0.0
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g_pre_rand, img)
    print(f"prebuilt gather rand 12ch     {t:7.2f} ms")

    def g_full(c):
        p = build_packed(c).reshape(N, 12)
        taps = p[idx_near]
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g_full, img)
    print(f"build + gather near 12ch      {t:7.2f} ms")

    def g_flat3(c):
        p = c.reshape(N, 3)
        taps = p[idx_near]
        return (taps * 0.999).reshape(H, W, 3)

    t = chain(g_flat3, img)
    print(f"no-pack gather near 3ch       {t:7.2f} ms")

    def g_flat3x4(c):
        p = c.reshape(N, 3)
        a = p[idx_near]
        b = p[jnp.minimum(idx_near + 1, N - 1)]
        d = p[jnp.minimum(idx_near + W, N - 1)]
        e = p[jnp.minimum(idx_near + W + 1, N - 1)]
        return ((a + b + d + e) * 0.25).reshape(H, W, 3)

    t = chain(g_flat3x4, img)
    print(f"no-pack 4x gather near 3ch    {t:7.2f} ms")


if __name__ == "__main__":
    main()
