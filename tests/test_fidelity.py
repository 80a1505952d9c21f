"""Fidelity vs an INDEPENDENT oracle — the BASELINE.md SSIM >= 0.98 criterion.

The golden harness (test_goldens.py) compares the renderer to its own frozen
output — a refactor ratchet, not a fidelity measure. This test renders fixtures
through the production pipeline AND through tests/reference_shade.py — a float64
per-pixel numpy implementation written from the reference's shader spec (Filament
BRDF, CSM PCF, Reinhard tonemap; SURVEY.md §2.7) sharing no code with the
production ops — and gates SSIM >= 0.98.
"""

import numpy as np
import pytest

from androidrenderer_tpu.camera import Camera
from androidrenderer_tpu.config import RenderConfig, RenderParams, ShadowMode
from androidrenderer_tpu.render import initial_temporal_state, make_renderer
from androidrenderer_tpu.scene.procedural import cornell_scene, courtyard_scene
from androidrenderer_tpu.utils.image import ssim

from reference_shade import shade_reference

W = H = 128
SHADOW_RES = 512
CASCADES = 2


def _fixture(name):
    if name == "cornell":
        rs = cornell_scene()
        cam_pos, pitch, yaw = [0.0, 0.0, 2.2], 0.0, np.pi
    else:
        rs = courtyard_scene()
        cam_pos, pitch, yaw = [0.0, 1.7, 6.0], -0.05, np.pi
    cam = Camera(fov_degrees=75.0, aspect=W / H, render_resolution=(W, H))
    cam.set_position(cam_pos)
    cam.pitch, cam.yaw = pitch, yaw
    return rs, cam.view_data()


# (fixture, use_normal_maps, use_mr_textures, min_ssim). All four configs gate
# at the BASELINE.md 0.98 bar. Round 4 closed the composed-config gap (was
# 0.9784): the residual was the ORACLE's own divergence from the reference
# shader — it applied Filament's documented perceptual-roughness remap
# (alpha = roughness^2) where brdf.slangi:22-35 feeds surface.roughness into
# D/V unsquared (production matched the shader; measured 6.3x specular delta
# on grazing gold). Normal/MR sampling is also now trilinear on both sides
# (the reference's default sampler, gltf_model.cpp:497-534).
_CASES = [
    ("cornell", True, True, 0.98),
    ("courtyard", True, False, 0.98),
    ("courtyard", False, True, 0.98),
    ("courtyard", True, True, 0.98),
]


@pytest.mark.parametrize("fixture,nrm,mr,min_ssim", _CASES)
def test_ssim_vs_independent_oracle(fixture, nrm, mr, min_ssim):
    rs, view = _fixture(fixture)
    scene, _ = rs.build(with_bvh=False)

    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        # 128^2 = only 4 binning tiles; the cap must cover the whole fixture
        # (courtyard is ~11k tris) or the binner silently drops geometry.
        tile_height=32, tile_width=128, max_tris_per_tile=16384,
        shadow_mode=ShadowMode.CSM, num_shadow_cascades=CASCADES,
        shadow_cascade_resolution=SHADOW_RES,
        sky=False, bloom=False, occlusion_culling=False,
        alpha_masking=False, translucency=False,
        use_normal_maps=nrm, use_mr_textures=mr,
    )
    out, _ = make_renderer(cfg)(
        scene, view, RenderParams.default(), initial_temporal_state(H, W)
    )
    produced = np.asarray(out.image)

    # The oracle consumes the cascade GEOMETRY the frame actually used (the fit
    # is an implementation choice, not shading math — and fp32 texel snapping
    # makes an eager refit differ by a texel) and re-derives everything else
    # independently.
    oracle = shade_reference(
        rs, view, W, H,
        np.asarray(out.csm.matrices, np.float64),
        np.asarray(out.csm.splits, np.float64),
        SHADOW_RES,
        use_normal_maps=nrm, use_mr_textures=mr,
    )

    s = ssim(produced, oracle)
    assert s >= min_ssim, f"{fixture}: SSIM vs independent oracle = {s:.4f}"
