"""Temporal state — the pytree that replaces the reference's ping-pong textures.

The reference carries cross-frame GPU state in persistent textures/buffers: TAA history
(upscaler accumulation), last-frame visibility list (depth_culling_phase.hpp:44-59),
LPV cascade volumes, probe caches. Under XLA the frame is a pure function, so all of it
rides in one NamedTuple threaded through ``render_frame(...) -> (image, next_state)``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from androidrenderer_tpu.ops.lpv import LPVVolumes, make_lpv_state
from androidrenderer_tpu.ops.probes import ProbeCascades, make_probe_state


class TemporalState(NamedTuple):
    taa_history: jnp.ndarray  # (H, W, 3) f32 HDR accumulation
    taa_valid: jnp.ndarray  # () bool — history usable
    frame_index: jnp.ndarray  # () i32
    # DDGI-style irradiance probe cascades (ops/probes.py).
    probes: ProbeCascades
    # Last-frame primitive visibility (depth_culling_phase.hpp:44-59 analog).
    prev_visible_prims: jnp.ndarray  # (max_primitives,) bool
    # RTGI pre-albedo irradiance accumulation (the vendor-denoiser slot —
    # ops/denoise.py::temporal_accumulate).
    rtgi_history: jnp.ndarray  # (H, W, 3) f32
    rtgi_valid: jnp.ndarray  # () bool
    # Cached LPV cascade volumes for round-robin updates
    # (config.lpv_update_budget > 0; ops/lpv.py::update_lpv_staggered).
    # Untouched (zeros) when staggering is off or GI != LPV.
    lpv: LPVVolumes


def initial_temporal_state(
    height: int, width: int,
    probe_cascades: int = 2, probe_grid: Tuple[int, int, int] = (16, 8, 16),
    probe_spacing: float = 1.0, max_primitives: int = 65536,
    out_height: int | None = None, out_width: int | None = None,
    lpv_cascades: int = 4, lpv_resolution: int = 32,
) -> TemporalState:
    """``height``/``width`` are the RENDER resolution. With temporal upscaling
    (TAA + render res != output res) the TAA history accumulates at OUTPUT
    resolution — pass ``out_height``/``out_width`` (taa_ops.taau_resolve)."""
    oh = out_height or height
    ow = out_width or width
    return TemporalState(
        taa_history=jnp.zeros((oh, ow, 3), jnp.float32),
        taa_valid=jnp.array(False),
        frame_index=jnp.int32(0),
        probes=make_probe_state(probe_cascades, probe_grid, probe_spacing),
        prev_visible_prims=jnp.ones((max_primitives,), bool),
        rtgi_history=jnp.zeros((height, width, 3), jnp.float32),
        rtgi_valid=jnp.array(False),
        lpv=make_lpv_state(lpv_cascades, lpv_resolution),
    )
