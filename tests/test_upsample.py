"""Joint bilateral 2x upsample (half-rate GI/AO reconstruction) unit tests."""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.ops.upsample import bilateral_upsample_2x


def _flat_geometry(h, w):
    depth = jnp.full((h, w), 0.5, jnp.float32)
    normal = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    return depth, normal


def test_smooth_signal_reconstructs_bilinearly():
    h = w = 32
    depth, normal = _flat_geometry(h, w)
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    full = (0.3 * y + 0.1 * x)[..., None]
    half = full[::2, ::2]
    up = bilateral_upsample_2x(half, depth[::2, ::2], normal[::2, ::2], depth, normal)
    # Linear signals reconstruct exactly (away from the clamped last row/col).
    np.testing.assert_allclose(
        np.asarray(up[:-1, :-1]), np.asarray(full[:-1, :-1]), atol=1e-4
    )


def test_depth_edge_does_not_bleed():
    h = w = 32
    # Two depth regions; signal differs per region.
    depth = jnp.where(
        jnp.arange(w)[None, :] < w // 2,
        jnp.full((h, w), 0.9, jnp.float32),
        jnp.full((h, w), 0.1, jnp.float32),
    )
    normal = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    sig_full = jnp.where(
        (jnp.arange(w)[None, :] < w // 2)[..., None],
        jnp.ones((h, w, 1), jnp.float32),
        jnp.zeros((h, w, 1), jnp.float32),
    )
    half = sig_full[::2, ::2]
    up = np.asarray(
        bilateral_upsample_2x(
            half, depth[::2, ::2], normal[::2, ::2], depth, normal
        )
    )
    # Pixels well inside each region keep their value; the near side of the
    # edge must not average with the far side (bilinear would give 0.5).
    assert np.allclose(up[:, : w // 2 - 1], 1.0, atol=1e-3)
    assert np.allclose(up[:, w // 2 :], 0.0, atol=1e-3)


def test_halo_variant_matches_padded():
    h = w = 16
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.uniform(0.2, 0.9, (h, w)).astype(np.float32))
    normal = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    sig = jnp.asarray(rng.uniform(0, 1, (h // 2, w // 2, 3)).astype(np.float32))
    d_h, n_h = depth[::2, ::2], normal[::2, ::2]
    base = bilateral_upsample_2x(sig, d_h, n_h, depth, normal)
    # Edge-replicated halo of 1 row must reproduce the unhaloed result.
    def halo(a):
        return jnp.concatenate([a[:1], a, a[-1:]], axis=0)
    via_halo = bilateral_upsample_2x(
        halo(sig), halo(d_h), halo(n_h), depth, normal, row_halo=1
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(via_halo), atol=1e-6)
