"""Cross-band collectives for sharded rendering — the ICI traffic of the frame.

Everything here runs inside the shard_map of parallel/mesh.py. The design goal is
bit-identical output vs the single-device frame: halo exchanges reproduce the exact
row neighborhoods the full-frame operators see (wrap for roll-based taps, edge for
pad-based ones), and full-frame-global passes (TAA history fetch, bloom/upscale)
all_gather their inputs and run replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def row_halo(x: jnp.ndarray, halo: int, axis_name: str, wrap: bool) -> jnp.ndarray:
    """Extend a row-sharded (h, w, ...) band with ``halo`` rows from each neighbor.

    ``wrap=True`` reproduces jnp.roll semantics across the full frame (device 0's
    top halo comes from the last device); ``wrap=False`` reproduces edge-pad
    semantics (outermost devices replicate their own boundary row)."""
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        if wrap:
            return jnp.concatenate([x[-halo:], x, x[:halo]], axis=0)
        return jnp.concatenate(
            [jnp.repeat(x[:1], halo, 0), x, jnp.repeat(x[-1:], halo, 0)], axis=0
        )
    if halo > x.shape[0]:
        # The halo spans more than one neighbor band (tiny bands / half-rate
        # grids): assemble from the all_gathered frame instead — x[-halo:] of a
        # short band would silently under-fill a single-hop exchange.
        full = gather_rows(x, axis_name)
        h_full = full.shape[0]
        start = jax.lax.axis_index(axis_name) * x.shape[0]
        rows = start + jnp.arange(-halo, x.shape[0] + halo)
        rows = rows % h_full if wrap else jnp.clip(rows, 0, h_full - 1)
        return full[rows]
    fwd = [(i, (i + 1) % n) for i in range(n)]  # data moves to the next band
    bwd = [((i + 1) % n, i) for i in range(n)]
    top = jax.lax.ppermute(x[-halo:], axis_name, fwd)  # previous band's bottom rows
    bot = jax.lax.ppermute(x[:halo], axis_name, bwd)  # next band's top rows
    if not wrap:
        idx = jax.lax.axis_index(axis_name)
        top = jnp.where(idx == 0, jnp.repeat(x[:1], halo, 0), top)
        bot = jnp.where(idx == n - 1, jnp.repeat(x[-1:], halo, 0), bot)
    return jnp.concatenate([top, x, bot], axis=0)


def gather_rows(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """all_gather a row-sharded band into the full-frame array (over ICI)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def any_across(mask: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Elementwise OR of a boolean array across the mesh axis (psum over ICI)."""
    return jax.lax.psum(mask.astype(jnp.int32), axis_name) > 0
