"""Gather flags: indices_are_sorted / promise_in_bounds effect on TPU gathers.

    python tools/microbench_taa4.py
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
    packed12_b16 = packed12.astype(jnp.bfloat16)
    off = jnp.asarray(rng.integers(-3 * W, 3 * W, N).astype(np.int32))
    base = jnp.arange(N, dtype=jnp.int32)

    def dyn_idx(c):
        j = (c[0, 0, 0] * 0.0).astype(jnp.int32)
        return jnp.clip(base + off + j, 0, N - 1)

    def take(op, idx, sorted_, bounds):
        return jnp.take(
            op, idx, axis=0,
            indices_are_sorted=sorted_,
            mode="fill" if bounds else "clip",
        )

    for sorted_ in (False, True):
        for bounds in (False, True):
            def g(c, sorted_=sorted_, bounds=bounds):
                taps = take(packed12, dyn_idx(c), sorted_, bounds)
                return (taps[:, :3] * 0.999).reshape(H, W, 3)

            t = chain(g, img)
            print(f"f32 sorted={int(sorted_)} fill={int(bounds)}   {t:7.2f} ms")

    def g16(c):
        taps = take(packed12_b16, dyn_idx(c), True, True).astype(jnp.float32)
        return (taps[:, :3] * 0.999).reshape(H, W, 3)

    t = chain(g16, img)
    print(f"bf16 sorted=1 inbounds=1   {t:7.2f} ms")

    # Row-width sweep at sorted+inbounds.
    for wd in (4, 8, 16, 32):
        op = packed12[:, :wd] if wd <= 12 else jnp.tile(packed12, (1, -(-wd // 12)))[:, :wd]

        def gw(c, op=op):
            taps = take(op, dyn_idx(c), True, True)
            return (taps[:, :3] * 0.999).reshape(H, W, 3)

        t = chain(gw, img)
        print(f"width {wd:2d} f32 sorted=1     {t:7.2f} ms")


if __name__ == "__main__":
    main()
