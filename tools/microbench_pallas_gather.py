"""Pallas pipelined per-row DMA gather vs the XLA gather floor (VERDICT r3 #1).

The resolve/TAAU/PCF gathers sit at XLA's ~12-14 ns/lookup small-table floor
(tools/microbench_gather2.py: cost is WIDTH-FREE 4 B..348 B — row slimming
cannot help; only per-lookup issue cost matters).  The untried lever is a
Pallas kernel that keeps the table in HBM and pipelines per-row DMAs with a
K-deep ring of slots/semaphores, overlapping row-fetch latency.

This measures exactly that, decomposed:
  - dma+acc : full kernel (ring DMA + per-row VMEM accumulate)
  - dma     : ring DMA only (debug_mode=1; no accumulate)
  - acc     : accumulate only (debug_mode=2; slot 0 reused, no DMA)
against the XLA gather on identical shapes.  The verdict either beats the
floor or stands as the measured proof that XLA's gather issue rate IS the
hardware floor for random row access from HBM.

    python tools/microbench_pallas_gather.py [--rows 262144] [--width 32]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 1280 * 736  # lookups (resolve-shaped)
K = 8           # DMA ring depth
TILE = 2048     # indices per grid step


def pallas_gather(table, idx, debug_mode=0, interpret=False):
    """(P,) i32 indices into (M, C) f32 table -> (P//TILE, 8, C) partial sums.

    Accumulates gathered rows per tile (the consumer in the study — the real
    resolve would evaluate planes; a sum keeps every fetched byte live)."""
    m, c = table.shape
    p = idx.shape[0]
    assert p % TILE == 0
    grid = p // TILE

    def kernel(idx_ref, table_ref, out_ref, rows, sems):
        # Warm the ring: start K DMAs ahead.
        def start(i, slot):
            if debug_mode != 2:
                pltpu.make_async_copy(
                    table_ref.at[idx_ref[i]], rows.at[slot], sems.at[slot]
                ).start()

        for s in range(K):
            start(s, s)

        out_ref[...] = jnp.zeros((1, 8, c), jnp.float32)

        def body(i, acc):
            slot = lax.rem(i, K)
            if debug_mode != 2:
                pltpu.make_async_copy(
                    table_ref.at[idx_ref[i]], rows.at[slot], sems.at[slot]
                ).wait()
            if debug_mode != 1:
                acc = acc + rows[0 if debug_mode == 2 else slot]
            nxt = i + K

            @pl.when(nxt < TILE)
            def _():
                start(nxt, lax.rem(nxt, K))

            return acc

        acc = lax.fori_loop(0, TILE, body, jnp.zeros((c,), jnp.float32))
        out_ref[0, 0, :] = acc

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda g: (g,), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            ],
            out_specs=pl.BlockSpec((1, 8, c), lambda g: (g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((K, c), jnp.float32),
                pltpu.SemaphoreType.DMA((K,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((grid, 8, c), jnp.float32),
        interpret=interpret,
    )(idx, table)


def time_fn(name, fn, reps=3):
    t0 = time.perf_counter()
    out = fn()
    first = np.asarray(out[0]).ravel()[0]
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0]).ravel()[0]
        times.append((time.perf_counter() - t0) * 1e3)
    ms = float(np.median(times))
    print(f"{name:12s} {ms:8.2f} ms  ({ms * 1e6 / P:6.2f} ns/lookup, "
          f"compile {compile_s:.0f}s)")
    return first


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 18)
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--check", action="store_true", help="CPU interpret check")
    args = ap.parse_args()
    m, c = args.rows, args.width

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        tbl = jnp.asarray(np.random.rand(64, c).astype(np.float32))
        ix = jnp.asarray(np.random.randint(0, 64, TILE).astype(np.int32))
        got = np.asarray(pallas_gather(tbl, ix, interpret=True))[0, 0]
        want = np.asarray(tbl)[np.asarray(ix)].sum(0)
        np.testing.assert_allclose(got, want, rtol=2e-5)
        print("interpret check OK")
        return

    tbl = jnp.asarray(np.random.rand(m, c).astype(np.float32))
    ix = jnp.asarray(np.random.randint(0, m, P).astype(np.int32))

    @jax.jit
    def xla(ix):
        out = tbl[ix]
        return jnp.sum(out, axis=0, keepdims=True)

    time_fn("xla-gather", lambda: xla(ix))
    for dm, name in ((0, "dma+acc"), (1, "dma"), (2, "acc")):
        f = jax.jit(functools.partial(pallas_gather, debug_mode=dm))
        time_fn(name, lambda f=f: f(tbl, ix))


if __name__ == "__main__":
    main()
