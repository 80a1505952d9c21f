"""Frame orchestration — the SceneRenderer (scene_renderer.cpp:121-470) re-expressed
as one jitted pure function over scene/view/temporal pytrees."""

from androidrenderer_tpu.render.frame import FrameOutputs, make_renderer, render_frame
from androidrenderer_tpu.render.temporal import (
    TemporalState, initial_temporal_state, temporal_state_for,
)

__all__ = [
    "FrameOutputs",
    "make_renderer",
    "render_frame",
    "TemporalState",
    "initial_temporal_state",
    "temporal_state_for",
]
