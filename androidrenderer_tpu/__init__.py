"""androidrenderer_tpu — a TPU-native real-time renderer built from scratch in JAX/XLA/Pallas.

Re-creates the capabilities of DethRaid/AndroidRenderer ("SAH Renderer"), a hybrid
deferred/forward GPU-driven Vulkan renderer, as an idiomatic TPU framework:

- The whole frame is ONE jitted pure function
  ``render_frame(scene, view, config, temporal) -> (image, temporal)`` — the reference's
  RenderGraph + ResourceAccessTracker (render_graph.hpp:24-106,
  resource_access_synchronizer.hpp:15-41) become plain XLA dataflow.
- Rasterization is clipless (homogeneous 2DH edge functions), expressed as two
  commutative reductions (max-depth, then triangle-id resolve at depth-EQUAL) plus a
  deferred visibility-buffer shading gather — there is no ordering hazard, so triangles
  map onto TPU vector lanes.
- Scene data lives in pooled device mega-arrays mirroring MeshStorage / MaterialStorage /
  PrimitiveDataGPU (mesh_storage.cpp:24-508, material_storage.cpp:6-82,
  shared/primitive_data.hpp:33-48).
- Multi-chip scaling shards the screen across a ``jax.sharding.Mesh`` (see
  ``androidrenderer_tpu.parallel``).
"""

__version__ = "0.1.0"

from androidrenderer_tpu.config import RenderConfig

__all__ = ["RenderConfig"]
