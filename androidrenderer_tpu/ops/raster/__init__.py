"""TPU raster engine.

The reference rasterizes with Vulkan fixed-function hardware (depth prepass -> HiZ
occlusion culling -> gbuffer with depth EQUAL, material_pipelines.cpp:105-111). TPUs
have no ROPs, so this package re-derives rasterization as data-parallel reductions:

1. ``setup``       — vertex transform + clipless homogeneous (2DH) triangle setup.
   Every triangle becomes 3 affine edge functions in pixel space; there is NO clipping
   stage (near-plane rejection falls out of the depth-range test).
2. ``raster_xla``  — depth pass: max-reduce ``z`` over covering triangles (reversed-Z,
   GREATER test == max, commutative => order-independent, TPU-friendly).
   Visibility pass: resolve the winning triangle id where z matches the depth buffer —
   the analog of the reference's depth-EQUAL gbuffer raster.
3. ``interpolate`` — visibility-buffer resolve: per-pixel gather of the winning
   triangle's vertices, perspective-correct barycentrics, attribute interpolation.
   (Deferred texturing: shading never runs on occluded fragments.)
"""

from androidrenderer_tpu.ops.raster.setup import (
    TriangleSetup,
    gather_corners,
    transform_to_clip,
    triangle_setup,
    triangle_setup_corners,
)
from androidrenderer_tpu.ops.raster.raster_xla import rasterize_depth, rasterize_visibility
from androidrenderer_tpu.ops.raster.interpolate import interpolate_attributes

__all__ = [
    "TriangleSetup",
    "triangle_setup",
    "triangle_setup_corners",
    "gather_corners",
    "transform_to_clip",
    "rasterize_depth",
    "rasterize_visibility",
    "interpolate_attributes",
]
