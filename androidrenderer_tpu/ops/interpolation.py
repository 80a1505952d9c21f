"""Frame interpolation — the FSR3 frame-generation analog (BASELINE config 5:
"bloom, TAA, tonemap + optical-flow frame interpolation").

The reference gets frame generation from the FSR3 vendor SDK (upscaling/fsr3.cpp).
The TPU-native replacement reuses the renderer's own reprojection motion vectors as
the flow field: the midpoint frame samples both neighbors half-way along the flow and
blends, falling back to the nearer-in-time frame where the reprojection leaves the
screen or the two warped samples disagree strongly (disocclusion heuristic).
"""

from __future__ import annotations

import jax.numpy as jnp

from androidrenderer_tpu.ops.taa import _bilinear_sample


def interpolate_frame(
    prev_frame: jnp.ndarray,  # (H, W, 3) HDR or display
    curr_frame: jnp.ndarray,  # (H, W, 3)
    mv: jnp.ndarray,  # (H, W, 2) uv motion (uv_prev = uv_curr - mv)
    t: float = 0.5,  # interpolation phase in (0, 1)
) -> jnp.ndarray:
    """Synthesize the frame at phase t between prev (t=0) and curr (t=1)."""
    h, w, _ = curr_frame.shape
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(
        [jnp.broadcast_to(px[None, :], (h, w)), jnp.broadcast_to(py[:, None], (h, w))],
        axis=-1,
    )
    # The mid-frame pixel saw the surface at uv - (1-t)*mv in prev and uv + ... in
    # curr along the flow (mv maps curr -> prev).
    uv_prev = uv - mv * (1.0 - t)
    uv_curr = uv + mv * t
    a = _bilinear_sample(prev_frame, uv_prev)
    b = _bilinear_sample(curr_frame, uv_curr)

    on_a = (
        (uv_prev >= 0.0).all(axis=-1) & (uv_prev <= 1.0).all(axis=-1)
    )[..., None]
    on_b = (
        (uv_curr >= 0.0).all(axis=-1) & (uv_curr <= 1.0).all(axis=-1)
    )[..., None]

    blend = jnp.where(on_a & on_b, jnp.float32(t), jnp.where(on_b, 1.0, 0.0))
    mid = a + (b - a) * blend
    # Disocclusion heuristic: where warped neighbors disagree strongly, bias to the
    # temporally nearer frame.
    diff = jnp.abs(a - b).mean(axis=-1, keepdims=True)
    near = b if t >= 0.5 else a
    mid = jnp.where(diff > 0.5, near, mid)
    return mid
