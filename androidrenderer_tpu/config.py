"""Render configuration — the TPU-native equivalent of the reference's cvar system.

The reference exposes ~40 live-editable cvars (console/cvars.hpp:23-129) read every frame
(e.g. ``r.GI.Mode``, ``r.Shadow.SunShadowMode``, ``r.AO``, ``r.AntiAliasing``,
``r.GI.LPV.*`` — scene_renderer.cpp:19-29, directional_light.cpp:22-44,
light_propagation_volume.cpp:23-81).  Under XLA, a "cvar change" is either a recompile
(structural flags — here: frozen dataclass fields used as static jit args) or a runtime
scalar (continuous parameters — carried in :class:`RenderParams`, a pytree leaf bundle).

``RenderConfig`` is hashable and immutable so it can be passed as a ``static_argnum`` to
``jax.jit``; changing any field triggers exactly one recompilation, mirroring how the
reference rebuilds pipelines when a mode cvar flips (scene_renderer.cpp:134-211).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple

import jax.numpy as jnp
from typing import NamedTuple


class GIMode(enum.Enum):
    """r.GI.Mode equivalent (scene_renderer.cpp:196-211)."""

    OFF = 0
    LPV = 1
    RT = 2
    PROBES = 3  # DDGI-style irradiance probe cache (gi/irradiance_cache.cpp)


class ShadowMode(enum.Enum):
    """r.Shadow.SunShadowMode equivalent (directional_light.cpp:22-44)."""

    OFF = 0
    CSM = 1
    RT = 2


class AOMode(enum.Enum):
    """r.AO equivalent (ambient_occlusion_phase.cpp:191-397)."""

    OFF = 0
    SSAO = 1  # CACAO-like screen-space compute path
    RT = 2  # RTAO via BVH traversal


class RasterBackend(enum.Enum):
    """Rasterizer implementation: the Pallas scalar-span kernel (TPU production path,
    ~8x the XLA reduction path) or the XLA path (CPU tests / fallback / oracle)."""

    PALLAS = 0
    XLA = 1


class AAMode(enum.Enum):
    """r.AntiAliasing equivalent. Vendor upscalers (FSR3/DLSS/XeSS) are not portable to
    TPU; the IUpscaler-shaped replacement is our own jittered TAA (upscaler.hpp:13-32).
    VRSAA = contrast-adaptive supersampling (sampling_rate_calculator.cpp analog):
    requires render resolution exactly 2x the output resolution."""

    OFF = 0
    TAA = 1
    VRSAA = 2


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) frame configuration.

    Resolutions and capacities must be static for XLA; every other structural toggle
    mirrors a reference cvar or build flag.
    """

    # Output & internal render resolution (render-res != output-res split, the
    # reference's upscaler contract — scene_renderer.cpp:31-43).
    render_width: int = 512
    render_height: int = 512
    output_width: int = 512
    output_height: int = 512

    # Camera (scene_renderer.cpp:111-116: z_near=0.05, fov=75deg).
    fov_degrees: float = 75.0
    z_near: float = 0.05

    # Feature toggles.
    gi_mode: GIMode = GIMode.OFF
    shadow_mode: ShadowMode = ShadowMode.CSM
    ao_mode: AOMode = AOMode.OFF
    aa_mode: AAMode = AAMode.OFF
    bloom: bool = True
    sky: bool = True
    # Static material-feature specialization — the TPU analog of the reference's
    # shader-variant defines (material_pipelines.cpp compiles ~20 uber-shader
    # variants): scenes without normal maps / MR textures / emission skip those
    # sampling paths entirely. Application auto-sets these from scene stats.
    use_base_textures: bool = True
    use_normal_maps: bool = True
    use_mr_textures: bool = True
    use_emission: bool = True
    occlusion_culling: bool = True  # two-phase HiZ occlusion (depth_culling_phase)
    # Half-rate GI/AO shading + joint bilateral 2x reconstruction — the VRS
    # coarse-rate / CACAO multi-res analog (sampling_rate_calculator.cpp:26-124).
    half_rate_gi: bool = True
    hiz_levels: int = 6
    alpha_masking: bool = True  # alpha-tested (MASK-mode) geometry via depth peeling
    alpha_peel_layers: int = 3
    # In-kernel alpha testing from baked 16x16 barycentric alpha bitmaps
    # (scene.tri_alpha_grid): masked geometry resolves in ONE raster pass with
    # no peel layers or per-layer texture gathers (the peel loop measured
    # ~700 ms/frame at Sponza-class masked loads). DIVERGENCE: alpha is
    # evaluated on a per-triangle lattice baked at texture LOD 0 rather than
    # per-pixel with screen derivatives — indistinguishable for foliage-scale
    # triangles; set False for the exact peeled path (always used off-TPU).
    alpha_bitmap: bool = True
    translucency: bool = True  # BLEND-mode geometry: peeled + back-to-front composite
    translucent_layers: int = 2
    raster_backend: RasterBackend = RasterBackend.PALLAS
    pallas_interpret: bool = False  # interpret-mode Pallas (hermetic CPU tests)
    raster_num_slabs: int = 4
    # Phase A triangles per Mosaic loop iteration in the binned kernel (power
    # of two; amortizes the ~97 cyc/iter scalar loop overhead).
    raster_pa_unroll: int = 1
    # Use the bitmask-driven kernel (ops/raster/raster_bitmask.py — XLA-side
    # window masks, no scalar Phase A) for main/CSM/RSM rasters. Output is
    # bit-identical to the binned kernel. Default ON since session 5: with the
    # baked corner-table setup and the butterfly bit transpose it wins every
    # pass (main 53 -> 28 ms, CSM 4x1024^2 20 -> 13 ms vs binned).
    raster_bitmask: bool = True

    # Shadow cascade config (directional_light.cpp:28-44: 4 cascades @ 4096^2,
    # lambda 0.95, max distance 128m). TPU default shrinks the cascade resolution; the
    # algorithm is resolution-independent.
    num_shadow_cascades: int = 4
    shadow_cascade_resolution: int = 1024
    # Cascades >= this index rasterize the vertex-clustered proxy mesh
    # (scene/proxy.py) instead of full geometry — far cascades cover 32-128 m
    # where sub-cell silhouette detail is below a shadow texel. Set >=
    # num_shadow_cascades to disable. Documented divergence (docs/PARITY.md).
    shadow_proxy_from_cascade: int = 2
    shadow_cascade_split_lambda: float = 0.95
    shadow_max_distance: float = 128.0
    # Far cascades re-rastered per frame (cascade 0 always updates): 0 = every
    # cascade every frame, exactly the reference's refit-and-render-all
    # (directional_light.cpp:84-230). 1 = budgeted round-robin over cascades
    # 1..C-1 against cached packed maps in TemporalState — the irradiance-cache
    # budget pattern (irradiance_cache.cpp:15-19) applied to CSM. Static
    # scene + static sun reaches the rebuild-all steady state BIT-exactly
    # after ceil((C-1)/budget) frames (tests/test_shadow.py); dynamic content
    # sees up to that many frames of far-shadow lag (docs/PARITY.md).
    # Production (Pallas) path only; ignored on the XLA fallback raster.
    shadow_update_budget: int = 0
    # Window height of the bitmask cascade rasters. Cascade triangles are
    # mostly far smaller than a window, so per-touch fold cost scales ~linearly
    # with win_h while the touch count barely grows (the main view keeps 32:
    # its triangles are tall, win_h=8 measured 4.75x the touches there).
    # Output is window-decomposition-independent (bit-identical either way).
    shadow_win_h: int = 32

    # LPV config (light_propagation_volume.cpp:23-81, hpp:57-62: 4 cascades x 32^3,
    # cell size 0.25m doubling per cascade, RSM 128^2, 32 propagation steps).
    lpv_num_cascades: int = 4
    lpv_resolution: int = 32
    lpv_cell_size: float = 0.25
    lpv_rsm_resolution: int = 128
    # RSM flux/normal/depth rasters use the proxy mesh: 128^2 texels are meters
    # wide, far coarser than the proxy's cell size. Documented divergence.
    rsm_proxy: bool = True
    lpv_num_propagation_steps: int = 32
    lpv_behind_camera_percent: float = 0.1
    # Cascades rebuilt per frame (RSM raster -> VPL -> inject -> propagate),
    # round-robin; the rest reuse last build's volumes from TemporalState.
    # 0 (or >= lpv_num_cascades) = every cascade every frame, exactly like the
    # reference's clear-and-rebuild (light_propagation_volume.cpp:839-926).
    # 1 = full staggering, the same budgeted-update pattern as the reference's
    # own irradiance cache (irradiance_cache.cpp:15-19); a static scene reaches
    # the every-frame steady state after C frames (tests/test_lpv_stagger.py).
    lpv_update_budget: int = 0

    # Irradiance probe cache — REFERENCE-scale structure as of round 4
    # (irradiance_cache.hpp:41-44, .cpp:22): 4 cascades of 32x8x32 probes,
    # budget 256/cascade = 1024 probe updates/frame (the reference's cvar
    # value; its budget is one shared list, ours is per-cascade round-robin).
    # Cascade 0 spans 16x16x4 m at 0.5 m spacing like the reference; outer
    # cascades follow the reference's extent ladder as of round 5
    # (irradiance_cache.cpp:15-18: 16x16x4 m / 64x64x16 / 512x512x128 /
    # 8x8x2 km => spacing multipliers 1x/4x/32x/500x, probes.cascade_spacings)
    # and probe_rays matches the reference's 20x20 dispatch_rays grid
    # (.cpp:637, 400 rays/probe).
    probe_cascades: int = 4
    probe_grid: Tuple[int, int, int] = (32, 8, 32)
    probe_spacing: float = 0.5
    probe_spacing_ladder: Tuple[float, ...] = (1.0, 4.0, 32.0, 500.0)
    probe_budget: int = 256
    probe_rays: int = 400

    # TAA/TAAU history fetch row width: True = 8-byte rows (4 x 11-bit luma +
    # shared 10+10-bit chroma, taa._bilinear_sample_packed8; zero-motion
    # steady state reconstructs exactly), False = 16-byte R11G11B10 x 4.
    # MEASURED NEGATIVE round 5 (default stays False): the halved gather row
    # saved ~0.25 ms (tools/microbench_taa5.py — reprojection indices are
    # spatially coherent, so the 2M-row fetch is only ~3 ms, not the 9 ms the
    # round-4 trace attributed to the fused op) while the YCoCg encode's
    # extra elementwise work cost ~+0.7 ms in-frame (profile_toggles
    # parity_up_csmb1 vs _p16). Kept as an option: quality is gated equal-or-
    # better on the convergence fixture (tests/test_taau.py).
    taa_pack8: bool = False

    # Bloom (bloomer.cpp:9: 6 mips).
    bloom_num_mips: int = 6

    # RT (rtao.comp.slang:55-90, rtgi.rt.slang:57-110).
    rtao_num_samples: int = 4
    rtao_max_distance: float = 8.0
    rtgi_num_bounces: int = 1

    # VRSAA (sampling_rate_calculator.cpp analog): static fine-quad budget as a
    # fraction of output pixels; quads past the budget keep their coarse shade.
    vrsaa_budget: float = 0.25

    # Profiling-only stubs (tools/profile_toggles.py): replace the raster or the
    # gbuffer resolve with shape-identical synthetic data so whole-frame toggle
    # deltas isolate each stage's in-frame cost (per-call timings are poisoned by
    # dispatch latency on this platform — docs/ROADMAP.md). Never set in production.
    debug_stub_raster: bool = False
    debug_stub_resolve: bool = False
    # Finer stage isolation (same caveats): keep the CSM rasters but skip the
    # PCF sampling; keep the plane gather but skip the per-pixel head math;
    # stub the RSM rasters inside LPV; keep the LPV volume build but skip the
    # screen-space apply/upsample.
    debug_stub_shadow_sample: bool = False
    debug_resolve_gather_only: bool = False
    debug_stub_rsm: bool = False
    debug_stub_lpv_apply: bool = False
    # Force the resolved GBuffer to materialize (optimization_barrier) instead
    # of letting XLA duplicate its producer chain (plane gather + texture
    # sampling) into every consumer fusion (shadow transform, lighting, SSAO,
    # LPV apply each re-running the 0.94M-row gathers).
    gbuffer_barrier: bool = False

    # Raster engine tiling (TPU-specific; lane-friendly 8x128 multiples).
    tile_height: int = 32
    tile_width: int = 128
    max_tris_per_tile: int = 2048

    # Capacity limits, mirroring the reference's pools (render_scene.cpp:12,
    # material_storage.cpp:11, mesh_storage.cpp:13-20).
    max_primitives: int = 65536
    max_materials: int = 65536

    def __post_init__(self) -> None:
        if self.render_height % self.tile_height != 0:
            raise ValueError(
                f"render_height {self.render_height} must be a multiple of tile_height "
                f"{self.tile_height}"
            )
        if self.render_width % self.tile_width != 0:
            raise ValueError(
                f"render_width {self.render_width} must be a multiple of tile_width "
                f"{self.tile_width}"
            )

    @property
    def render_resolution(self) -> Tuple[int, int]:
        return (self.render_height, self.render_width)

    @property
    def output_resolution(self) -> Tuple[int, int]:
        return (self.output_height, self.output_width)

    @property
    def tiles_y(self) -> int:
        return self.render_height // self.tile_height

    @property
    def tiles_x(self) -> int:
        return self.render_width // self.tile_width

    @property
    def num_tiles(self) -> int:
        return self.tiles_y * self.tiles_x

    def replace(self, **kwargs) -> "RenderConfig":
        return dataclasses.replace(self, **kwargs)


class RenderParams(NamedTuple):
    """Runtime (traced) scalar parameters — the "float cvar" half of the cvar system.

    All fields are 0-d (or tiny) jnp arrays; changing them does NOT recompile.
    Defaults mirror the reference's cvar defaults.
    """

    # Exposure fudge factors (§2.7 of SURVEY.md):
    #   sun direct light (directional_light.frag:141-149)
    sun_exposure: jnp.ndarray
    #   RTGI irradiance (rtgi.rt.slang:104-108)
    rtgi_exposure: jnp.ndarray
    #   LPV apply exposure, default pi*10 (light_propagation_volume.cpp:77-79)
    lpv_exposure: jnp.ndarray
    #   bloom add strength (scene_upsample.frag:61)
    bloom_strength: jnp.ndarray
    # CSM depth bias scale (directional_light.frag:88: 0.0005*sqrt(1-NoL^2)/NoL)
    shadow_bias: jnp.ndarray
    # RTAO ray max distance cvar (ambient_occlusion_phase.cpp / rtao.comp.slang)
    rtao_max_distance: jnp.ndarray
    # SSAO estimator knobs (the reference's CACAO radius/intensity cvars).
    ssao_radius: jnp.ndarray
    ssao_intensity: jnp.ndarray
    ssao_bias: jnp.ndarray
    # A-trous edge-stopping sigmas (RTGI denoiser).
    atrous_sigma_z: jnp.ndarray
    atrous_sigma_n: jnp.ndarray
    # Irradiance-probe history blend (irradiance_cache hysteresis cvar).
    probe_hysteresis: jnp.ndarray

    @staticmethod
    def default() -> "RenderParams":
        import math

        return RenderParams(
            sun_exposure=jnp.float32(0.00031415927),
            rtgi_exposure=jnp.float32(0.0031415927),
            lpv_exposure=jnp.float32(math.pi * 10.0),
            bloom_strength=jnp.float32(0.014159),
            shadow_bias=jnp.float32(0.0005),
            rtao_max_distance=jnp.float32(8.0),
            ssao_radius=jnp.float32(0.5),
            ssao_intensity=jnp.float32(1.0),
            ssao_bias=jnp.float32(0.02),
            atrous_sigma_z=jnp.float32(0.02),
            atrous_sigma_n=jnp.float32(16.0),
            probe_hysteresis=jnp.float32(0.9),
        )
