"""TAAU stage decomposition on the real TPU (chained in-jit timings).

    python tools/microbench_taau.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops import taa

RH, RW = 736, 1280
OH, OW = 1088, 1920


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
    cur = jnp.asarray(rng.uniform(0, 1, (RH, RW, 3)).astype(np.float32))
    hist = jnp.asarray(rng.uniform(0, 1, (OH, OW, 3)).astype(np.float32))
    mv = jnp.asarray(rng.uniform(-0.01, 0.01, (RH, RW, 2)).astype(np.float32))
    jit2 = jnp.asarray(np.array([0.25, -0.4], np.float32))

    def full(c):
        out, _ = taa.taau_resolve(c[:RH, :RW], hist, jnp.bool_(True), mv, jit2, OH, OW)
        return out

    print(f"taau full              {chain(full, cur):7.2f} ms")

    scale = jnp.stack([jnp.float32(OH / RH), jnp.float32(OW / RW)])
    tr = jnp.stack([jnp.float32(0.1), jnp.float32(0.2)])

    def lanczos_only(c):
        return jax.image.scale_and_translate(
            c, (OH, OW, 3), (0, 1), scale, tr, method="lanczos3", antialias=False
        )

    print(f"lanczos3 3ch resample  {chain(lanczos_only, cur):7.2f} ms")

    def linear8(c):
        s = jnp.concatenate([c, c, c[..., :2]], axis=-1)
        return jax.image.scale_and_translate(
            s, (OH, OW, 8), (0, 1), scale, tr, method="linear", antialias=False
        )[..., :3]

    print(f"linear 8ch resample    {chain(linear8, cur):7.2f} ms")

    def lanczos_bf16(c):
        return jax.image.scale_and_translate(
            c.astype(jnp.bfloat16), (OH, OW, 3), (0, 1), scale, tr,
            method="lanczos3", antialias=False,
        ).astype(jnp.float32)

    print(f"lanczos3 bf16          {chain(lanczos_bf16, cur):7.2f} ms")

    def hist_fetch(c):
        uv = jnp.stack(
            [
                jnp.broadcast_to((jnp.arange(OW, dtype=jnp.float32) + 0.5)[None, :] / OW, (OH, OW)),
                jnp.broadcast_to((jnp.arange(OH, dtype=jnp.float32) + 0.5)[:, None] / OH, (OH, OW)),
            ],
            axis=-1,
        ) + c[0, 0, 0] * 0.0
        return taa._bilinear_sample_packed(hist, uv)[:RH]

    print(f"packed history fetch   {chain(hist_fetch, cur):7.2f} ms")

    def minmax_only(c):
        mn, mx = taa._neighborhood_minmax(c)
        return mn + mx

    print(f"3x3 minmax (render)    {chain(minmax_only, cur):7.2f} ms")


if __name__ == "__main__":
    main()
