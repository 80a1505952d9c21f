"""Frame interpolation — the FSR3 frame-generation analog (BASELINE config 5:
"bloom, TAA, tonemap + optical-flow frame interpolation").

The reference gets frame generation from the FSR3 vendor SDK (upscaling/fsr3.cpp).
The TPU-native replacement reuses the renderer's own reprojection motion vectors as
the flow field: the midpoint frame samples both neighbors half-way along the flow
and blends. Disocclusion handling (round 5, VERDICT r4 item 9): instead of a fixed
absolute-difference threshold, the blend confidence combines

- RELATIVE photometric disagreement of the two warped samples (scale-free —
  an absolute 0.5 threshold meant HDR highlights always "disoccluded" and
  dark scenes never did), and
- FLOW DIVERGENCE: the motion vector sampled at the current-frame tap is
  compared against the pixel's own flow; where they disagree by pixels, the
  two taps straddle an occlusion edge and the warp is not trustworthy.

Low confidence falls back smoothly to the temporally nearer frame (what FSR3's
disocclusion mask does), rather than hard-switching per pixel.
"""

from __future__ import annotations

import jax.numpy as jnp

from androidrenderer_tpu.ops.taa import _bilinear_sample


def interpolate_frame(
    prev_frame: jnp.ndarray,  # (H, W, 3) HDR or display
    curr_frame: jnp.ndarray,  # (H, W, 3)
    mv: jnp.ndarray,  # (H, W, 2) uv motion (uv_prev = uv_curr - mv)
    t: float = 0.5,  # interpolation phase in (0, 1)
    rel_sigma: float = 0.5,  # photometric confidence falloff (relative diff)
    flow_sigma_px: float = 2.0,  # flow-divergence confidence falloff (pixels)
) -> jnp.ndarray:
    """Synthesize the frame at phase t between prev (t=0) and curr (t=1)."""
    h, w, _ = curr_frame.shape
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    uv = jnp.stack(
        [jnp.broadcast_to(px[None, :], (h, w)), jnp.broadcast_to(py[:, None], (h, w))],
        axis=-1,
    )
    # The mid-frame pixel saw the surface at uv - (1-t)*mv in prev and uv + t*mv
    # in curr along the flow (mv maps curr -> prev).
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

    # Confidence 1: relative photometric disagreement of the warped taps
    # (scale-free; the round-4 fixed |a-b| > 0.5 threshold was HDR-scale
    # dependent).
    diff = jnp.abs(a - b).mean(axis=-1, keepdims=True)
    mag = 0.5 * (jnp.abs(a) + jnp.abs(b)).mean(axis=-1, keepdims=True) + 1e-3
    rel = diff / mag
    conf_photo = jnp.exp(-(rel / rel_sigma) ** 2)
    # Confidence 2: flow divergence — the motion stored at the current-frame
    # tap should agree with the flow used to get there; a mismatch of pixels
    # means the taps straddle an occlusion boundary.
    mv_b = _bilinear_sample(mv, uv_curr)
    flow_err = jnp.stack(
        [(mv_b[..., 0] - mv[..., 0]) * w, (mv_b[..., 1] - mv[..., 1]) * h],
        axis=-1,
    )
    err_px = jnp.sqrt(jnp.sum(flow_err * flow_err, axis=-1, keepdims=True))
    conf_flow = jnp.exp(-(err_px / flow_sigma_px) ** 2)
    conf = conf_photo * conf_flow

    # Low confidence falls back smoothly to the temporally nearer frame.
    near = b if t >= 0.5 else a
    return conf * mid + (1.0 - conf) * near
