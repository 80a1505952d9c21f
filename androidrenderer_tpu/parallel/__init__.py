"""Multi-chip scaling — screen-space sharding over a jax.sharding.Mesh.

The reference is single-GPU; its only parallelism is intra-GPU (SURVEY.md §2.6). The
TPU-native scaling story: shard the screen across chips (gbuffer/lighting are
embarrassingly tile-parallel), replicate the scene, and let collectives ride ICI —
``all_gather`` only for assembling the final image; LPV propagation gets ``ppermute``
halos when sharded (SURVEY.md §5.8).
"""

from androidrenderer_tpu.parallel.mesh import make_sharded_renderer, render_frame_sharded

__all__ = ["make_sharded_renderer", "render_frame_sharded"]
