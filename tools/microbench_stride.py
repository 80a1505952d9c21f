"""Half-rate subsample strategies: x[::2, ::2] strided slices cost 1.6-2.5 ms
EACH on (736,1280,3) f32 in the parity trace (~8 ms/frame across the half-rate
GI inputs). Variants measure alternatives that produce IDENTICAL values:

- sliced:   per-array x[::2, ::2] (the current code)
- fused:    concat channels -> ONE [::2, ::2] -> split
- gather:   pack rows flat (H*W, C) -> one even-grid flat gather
- lanes:    x[:, ::2] column-slice then [::2] row-slice as separate ops

Chained seeds keep everything data-dependent (docs/ROADMAP.md)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

H, W = 736, 1280
rng = np.random.default_rng(0)
WP = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
NRM = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
DEP = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)
VAL = jnp.asarray(rng.uniform(0, 1, (H, W)), jnp.float32)


def consume(*xs):
    return sum(jnp.sum(x[:4, :4]) for x in xs)


def variant_sliced(wp, nrm, dep, val):
    return consume(wp[::2, ::2], nrm[::2, ::2], dep[::2, ::2], val[::2, ::2])


def variant_fused(wp, nrm, dep, val):
    cat = jnp.concatenate([wp, nrm, dep[..., None], val[..., None]], axis=-1)
    s = cat[::2, ::2]
    return consume(s[..., 0:3], s[..., 3:6], s[..., 6], s[..., 7])


def variant_gather(wp, nrm, dep, val):
    cat = jnp.concatenate([wp, nrm, dep[..., None], val[..., None]], axis=-1)
    flat = cat.reshape(H * W, 8)
    yy = jnp.arange(H // 2, dtype=jnp.int32)[:, None] * (2 * W)
    xx = jnp.arange(W // 2, dtype=jnp.int32)[None, :] * 2
    s = flat[yy + xx]
    return consume(s[..., 0:3], s[..., 3:6], s[..., 6], s[..., 7])


def variant_rows_then_cols(wp, nrm, dep, val):
    outs = []
    for x in (wp, nrm, dep, val):
        outs.append(x[::2][:, ::2])
    return consume(*outs)


def bench(name, fn, chain=20):
    @jax.jit
    def chained(seed):
        s = seed
        for _ in range(chain):
            s = fn(WP + s * 1e-30, NRM + s * 1e-30, DEP + s * 1e-30, VAL + s * 1e-30)
        return s

    t0 = time.perf_counter()
    np.asarray(chained(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3 / chain)
    print(f"{name:18s} {min(ts):7.3f} ms/call (compile {c:.0f}s)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["sliced", "fused", "gather", "rows_then_cols"]
    for name in which:
        bench(name, globals()[f"variant_{name}"])
