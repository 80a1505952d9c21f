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
    # Staggered-CSM cache (config.shadow_update_budget > 0): packed 2x2-PCF
    # atlas + the matrices each cascade was rastered with
    # (ops/shadow.py::render_shadow_cascades_staggered). Empty (0-cascade)
    # arrays when staggering is off — size with shadow_cascades/
    # shadow_resolution to enable.
    csm_packed: jnp.ndarray  # (C, R, R, 2) i32
    csm_matrices: jnp.ndarray  # (C, 4, 4) f32


def initial_temporal_state(
    height: int, width: int,
    probe_cascades: int = 2, probe_grid: Tuple[int, int, int] = (16, 8, 16),
    probe_spacing: float = 1.0, max_primitives: int = 65536,
    out_height: int | None = None, out_width: int | None = None,
    lpv_cascades: int = 4, lpv_resolution: int = 32,
    shadow_cascades: int = 0, shadow_resolution: int = 0,
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
        # Zero packed taps decode to depth 0 (reversed-Z farthest) => fully
        # lit, and the zero matrix projects to z = 0 (outside the z > 0
        # gate) => lit: stale cascades degrade to "no shadow" for the first
        # ceil((C-1)/budget) frames, never to garbage shadows.
        csm_packed=jnp.zeros(
            (shadow_cascades, shadow_resolution, shadow_resolution, 2),
            jnp.int32,
        ),
        csm_matrices=jnp.zeros((shadow_cascades, 4, 4), jnp.float32),
    )


def temporal_state_for(config) -> TemporalState:
    """Initial TemporalState sized for a RenderConfig (every cached-feature
    shape — probe grids, LPV volumes, staggered-CSM atlas — must match the
    config or render_frame raises)."""
    return initial_temporal_state(
        config.render_height, config.render_width,
        probe_cascades=config.probe_cascades, probe_grid=config.probe_grid,
        probe_spacing=config.probe_spacing,
        max_primitives=config.max_primitives,
        out_height=config.output_height, out_width=config.output_width,
        lpv_cascades=config.lpv_num_cascades,
        lpv_resolution=config.lpv_resolution,
        shadow_cascades=(
            config.num_shadow_cascades if config.shadow_update_budget else 0
        ),
        shadow_resolution=(
            config.shadow_cascade_resolution if config.shadow_update_budget else 0
        ),
    )
