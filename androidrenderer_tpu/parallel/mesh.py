"""Screen-band sharding: one frame over N chips via shard_map.

Design (SURVEY.md §2.6/§5.8 — the TPU-native replacement for the reference's absent
multi-device story): the screen splits into horizontal bands, one per device along the
``screen`` mesh axis. Scene arrays + camera are replicated; each device bins and
rasterizes only the triangles overlapping its band (triangle setup is replicated — it
is O(N_tris), tiny next to raster); gbuffer/lighting/post are pointwise and stay local.
The u8 image and all screen-shaped temporal state remain band-sharded end-to-end, so
the only cross-chip traffic is whatever the caller gathers for display — over ICI.

Per-frame temporal state is sharded with the same layout, so multi-chip rendering
steps with zero resharding between frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from androidrenderer_tpu.config import RenderConfig, RenderParams
from androidrenderer_tpu.render.frame import FrameOutputs, render_frame
from androidrenderer_tpu.render.temporal import TemporalState
from androidrenderer_tpu.scene.scene import SceneArrays


from androidrenderer_tpu.ops.gbuffer import GBuffer as _GBuffer


def _screen_sharded_spec(axis: str, has_csm: bool = False, has_motion: bool = False):
    """PartitionSpecs for (FrameOutputs, TemporalState): screen tensors sharded on
    their row axis, scalars/cascade data replicated. The None-ness of csm/motion
    must mirror render_frame's outputs exactly (shard_map matches structure)."""
    img = P(axis)  # (H, W, ...) -> rows sharded

    csm_spec = None
    if has_csm:
        from androidrenderer_tpu.ops.shadow import CascadeData

        csm_spec = CascadeData(*([P()] * len(CascadeData._fields)))
    out_spec = FrameOutputs(
        image=img, hdr=img, depth=img, visibility=img,
        gbuffer=_GBuffer(*([img] * len(_GBuffer._fields))),
        csm=csm_spec,
        motion=img if has_motion else None,
    )
    from androidrenderer_tpu.ops.lpv import LPVVolumes
    from androidrenderer_tpu.ops.probes import ProbeCascades

    temp_spec = TemporalState(
        taa_history=img,
        taa_valid=P(),
        frame_index=P(),
        probes=ProbeCascades(*([P()] * len(ProbeCascades._fields))),
        prev_visible_prims=P(),
        rtgi_history=img,
        rtgi_valid=P(),
        # LPV volumes are replicated (every band applies from the same cascade
        # set; the staggered update's inputs are replicated, so its output is).
        lpv=LPVVolumes(*([P()] * len(LPVVolumes._fields))),
        # Staggered-CSM cache: replicated like LPV (updates are deterministic
        # functions of replicated inputs, so every device carries the same
        # atlas; the sharded-cascade psum path re-replicates explicitly).
        csm_packed=P(),
        csm_matrices=P(),
    )
    return out_spec, temp_spec


def render_frame_sharded(
    scene: SceneArrays,
    view,
    params: RenderParams,
    temporal: TemporalState,
    config: RenderConfig,
    mesh: Mesh,
    axis: str = "screen",
):
    """Full-frame render over ``mesh``; returns (FrameOutputs, TemporalState) with
    screen tensors sharded by rows across ``axis``."""
    n = mesh.shape[axis]
    if config.render_height % (n * config.tile_height) != 0:
        raise ValueError(
            f"render_height {config.render_height} must divide into {n} bands of "
            f"whole {config.tile_height}-px tiles"
        )
    if config.output_height % n != 0:
        raise ValueError(
            f"output_height {config.output_height} must divide into {n} bands"
        )
    band_h = config.render_height // n

    def band_fn(scene_, view_, params_, temporal_):
        row0 = jax.lax.axis_index(axis) * band_h
        return render_frame(
            scene_, view_, params_, temporal_, config,
            band_height=band_h, row_offset=row0, axis_name=axis,
        )

    from androidrenderer_tpu.config import AAMode, ShadowMode

    out_spec, temp_spec = _screen_sharded_spec(
        axis,
        has_csm=config.shadow_mode == ShadowMode.CSM,
        has_motion=config.aa_mode == AAMode.TAA,
    )
    replicated = P()
    fn = jax.shard_map(
        band_fn,
        mesh=mesh,
        in_specs=(replicated, replicated, replicated, temp_spec),
        out_specs=(out_spec, temp_spec),
        check_vma=False,
    )
    return fn(scene, view, params, temporal)


def make_sharded_renderer(config: RenderConfig, mesh: Mesh, axis: str = "screen"):
    """jit(shard_map(frame)) with scene/view replicated and screen state sharded."""
    return jax.jit(
        partial(render_frame_sharded, config=config, mesh=mesh, axis=axis)
    )


def shard_temporal(temporal: TemporalState, mesh: Mesh, axis: str = "screen"):
    """Place an (unsharded) TemporalState onto the mesh with the band layout."""
    _, temp_spec = _screen_sharded_spec(axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), temporal, temp_spec
    )
