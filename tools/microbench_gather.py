"""Gather-layout microbench for the resolve plane table (real TPU).

The resolve's one big gather is `attr_planes[tid]` with attr_planes (N, 3, 29)
— a gather whose slice spans TWO dims. Stub profiling (flat_sr - flat_srr)
puts the whole resolve at ~225 ms, ~5x the expected cost of one flat-row
gather. This compares layouts head-to-head with a data-dependent index chain
(next indices derived from gathered values) so XLA cannot DCE or overlap
iterations.

    python tools/microbench_gather.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

P = 1920 * 1088  # pixel count
M = 1 << 18      # triangle-table rows (pow2 for masking)
CHAIN = 8


def make_bench(gather_fn):
    def step(carry, _):
        idx, acc = carry
        out = gather_fn(idx)  # (P, C) f32
        acc = acc + out[0, 0]
        idx = (idx + out[:, 0].astype(jnp.int32) + 104729) & (M - 1)
        return (idx, acc), ()

    @jax.jit
    def run(idx0):
        (idx, acc), _ = lax.scan(step, (idx0, jnp.float32(0.0)), None, length=CHAIN)
        return acc + idx[0].astype(jnp.float32)

    return run


def time_variant(name, gather_fn, idx0, reps=3):
    run = make_bench(gather_fn)
    t0 = time.perf_counter()
    np.asarray(run(idx0))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(idx0))
        times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
    print(f"{name:14s} {float(np.median(times)):8.2f} ms/gather  (compile {compile_s:.0f}s)")


def main():
    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (P,), 0, M, dtype=jnp.int32)
    tab3 = jax.random.uniform(key, (M, 3, 29), jnp.float32) * 8.0
    tab87 = tab3.reshape(M, 87)
    tab58 = tab87[:, :58]
    tab44 = tab87[:, :44]
    tab29 = tab87[:, :29]

    # Multi-dim slice (the current resolve layout).
    time_variant("slice_3x29", lambda i: tab3[i].reshape(P, 87), idx0)
    # One flat 87-wide row.
    time_variant("flat87", lambda i: tab87[i], idx0)
    # Two 44-wide gathers.
    time_variant(
        "flat44x2",
        lambda i: jnp.concatenate([tab44[i], tab44[i ^ 1]], axis=1),
        idx0,
    )
    # Three 29-wide gathers.
    time_variant(
        "flat29x3",
        lambda i: jnp.concatenate([tab29[i], tab29[i ^ 1], tab29[i ^ 2]], axis=1),
        idx0,
    )
    # Calibration: single 29-wide and 58-wide rows.
    time_variant("flat58", lambda i: tab58[i], idx0)
    time_variant("flat29", lambda i: tab29[i], idx0)
    # bf16 87-wide row (half the bytes).
    tab87h = tab87.astype(jnp.bfloat16)
    time_variant("flat87_bf16", lambda i: tab87h[i].astype(jnp.float32), idx0)


if __name__ == "__main__":
    main()
