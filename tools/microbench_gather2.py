"""Row-byte scaling of the RESOLVE-shaped gather (small table, ~940k lookups).

Round-4 question (VERDICT #1): the resolve plane gather (940k lookups into a
~310k-row, 87-f32 table) sits at 10.6-11.8 ms.  The round-3 model says small
tables are "width-free", but the in-frame per-lookup cost (11.7 ns) is ~2.6x
the TAAU 16-B-row cost (4.5 ns) — suggesting row BYTES do matter here and row
slimming could buy several ms.  Measure cost vs width at the real shapes with
a chain-dependent index stream (XLA cannot overlap or fold).

    python tools/microbench_gather2.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

P = 1280 * 736   # render-res lookup count (940k)
M = 1 << 18      # table rows (pow2 mask; real table 310k)
CHAIN = 8


def time_width(c, idx0, reps=3):
    table = jnp.asarray(np.random.rand(M, c).astype(np.float32))

    def step(carry, _):
        idx, acc = carry
        out = table[idx]
        acc = acc + out[0, 0]
        idx = (idx + out[:, 0].astype(jnp.int32) + 104729) & (M - 1)
        return (idx, acc), ()

    @jax.jit
    def run(i0):
        (idx, acc), _ = lax.scan(step, (i0, jnp.float32(0.0)), None, length=CHAIN)
        return acc + idx[0].astype(jnp.float32)

    t0 = time.perf_counter()
    np.asarray(run(idx0))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(idx0))
        times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
    ms = float(np.median(times))
    print(f"width {c:3d} f32 ({4*c:4d} B): {ms:7.2f} ms/gather "
          f"({ms * 1e6 / P:5.2f} ns/lookup, compile {compile_s:.0f}s)")


def main():
    idx0 = jnp.asarray(np.random.randint(0, M, P).astype(np.int32))
    for c in (87, 64, 54, 48, 40, 32, 24, 16, 8, 4, 1):
        time_width(c, idx0)


if __name__ == "__main__":
    main()
