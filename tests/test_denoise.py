"""A-trous reconstruction: smooths noise, preserves depth/normal edges."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.ops.denoise import atrous_filter


def test_atrous_smooths_but_keeps_edges():
    h, w = 64, 128
    rng = np.random.default_rng(0)
    # Two planes: left half depth 0.5 normal +z; right half depth 0.1 normal +x.
    left = np.zeros((h, w), bool)
    left[:, : w // 2] = True
    depth = np.where(left, 0.5, 0.1).astype(np.float32)
    normal = np.zeros((h, w, 3), np.float32)
    normal[left] = [0, 0, 1]
    normal[~left] = [1, 0, 0]
    clean = np.where(left[..., None], [2.0, 0.0, 0.0], [0.0, 2.0, 0.0]).astype(np.float32)
    noisy = clean + rng.normal(0, 0.5, clean.shape).astype(np.float32)
    valid = np.ones((h, w), bool)

    out = np.asarray(
        atrous_filter(
            jnp.asarray(noisy), jnp.asarray(depth), jnp.asarray(normal),
            jnp.asarray(valid),
        )
    )
    # Noise reduced on each side.
    err_in = np.abs(noisy - clean)[:, 8 : w // 2 - 8].mean()
    err_out = np.abs(out - clean)[:, 8 : w // 2 - 8].mean()
    assert err_out < 0.4 * err_in
    # The edge stays sharp: right side keeps green, left keeps red.
    assert out[:, w // 2 + 4, 1].mean() > 4 * out[:, w // 2 + 4, 0].mean()
    assert out[:, w // 2 - 5, 0].mean() > 4 * out[:, w // 2 - 5, 1].mean()
