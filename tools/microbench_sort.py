"""Sort-middle feasibility microbench (real TPU).

The raster kernels are Phase-A bound: ~45-65 scalar cycles per (triangle,
window) touch for scan + SMEM binning (docs/ROADMAP.md round-3 findings). A
sort-middle design would expand touches XLA-side and sort them by window id —
the kernel then walks contiguous per-window runs and the scalar cost per touch
collapses to the fold's existing record read. Packing (window<<22 | local_id)
into ONE i32 makes the sort single-array AND preserves ascending-id order
within a window (bit-exact tie-break).

This measures the XLA building blocks at touch-list scale:
  - jax.lax.sort of K i32 keys (K = 0.5M..2M)
  - one-hot histogram + cumsum (counting-sort offsets; 256-4096 buckets)
  - jnp.repeat with static total_repeat_length (bbox-touch expansion)
  - 1-wide scatter (the known-bad baseline, for comparison)

    python tools/microbench_sort.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[0]), out)  # sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[0]), out)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:34s} {float(np.median(times)):8.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    for k in (1 << 19, 1 << 20, 1 << 21):
        keys = jnp.asarray(rng.integers(0, 1 << 30, size=k, dtype=np.int32))

        @jax.jit
        def sort1(x):
            return jax.lax.sort(x)

        timeit(f"lax.sort 1-array k={k}", sort1, keys)

        vals = jnp.asarray(rng.integers(0, 1 << 22, size=k, dtype=np.int32))

        @jax.jit
        def sort2(x, v):
            return jax.lax.sort((x, v), num_keys=1)

        timeit(f"lax.sort key+val k={k}", sort2, keys, vals)

    n = 310_000
    npad = 1 << 19
    ids = jnp.arange(npad, dtype=jnp.int32)
    counts = jnp.asarray(
        np.where(np.arange(npad) < n, rng.integers(1, 4, size=npad), 0),
        dtype=jnp.int32,
    )
    total = int(1 << 21)

    @jax.jit
    def rep(ids, counts):
        return jnp.repeat(ids, counts, total_repeat_length=total)

    timeit(f"jnp.repeat n={npad} -> {total}", rep, ids, counts)

    wins = jnp.asarray(rng.integers(0, 256, size=npad, dtype=np.int32))

    @jax.jit
    def hist256(w):
        oh = (w[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]) \
            .astype(jnp.float32)
        h = jnp.sum(oh, axis=0)
        return jnp.cumsum(h)

    timeit("one-hot hist+cumsum 512k x 256", hist256, wins)

    tgt = jnp.zeros((total,), jnp.int32)
    pos = jnp.asarray(
        rng.permutation(total)[:npad].astype(np.int32)
    )

    @jax.jit
    def scat(t, p, v):
        return t.at[p].set(v)

    timeit(f"1-wide scatter {npad} rows", scat, tgt, pos, wins)


if __name__ == "__main__":
    main()
