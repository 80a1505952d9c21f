"""Large-operand gather row-bytes ladder incl. 8-byte rows (round 5).

The TAAU history fetch is a 2M-lookup gather over a 2M-row operand; round-3/4
measured 16 B ~12, 32 B ~29, 48 B ~47 ms (byte-bound, unlike small tables).
This checks whether 8-byte rows (the luma+chroma packed history,
taa._bilinear_sample_packed8) buy the projected ~2x.

    python tools/microbench_taa5.py
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
    off = jnp.asarray(rng.integers(-3 * W, 3 * W, N).astype(np.int32))
    base = jnp.arange(N, dtype=jnp.int32)
    ops = {
        "4B (1 i32)": jnp.asarray(rng.integers(0, 2**31, (N, 1)).astype(np.int32)),
        "8B (2 i32)": jnp.asarray(rng.integers(0, 2**31, (N, 2)).astype(np.int32)),
        "16B (4 i32)": jnp.asarray(rng.integers(0, 2**31, (N, 4)).astype(np.int32)),
    }
    for name, op in ops.items():
        def g(c, op=op):
            j = (c[0, 0] & 0).astype(jnp.int32)  # chain dependency
            idx = jnp.clip(base + off + j, 0, N - 1)
            taps = jnp.take(op, idx, axis=0)
            return taps ^ 1
        ms = chain(g, op)
        print(f"{name}: {ms:.2f} ms / 2M lookups")


if __name__ == "__main__":
    main()
