"""glTF importer tests against the reference's real AlphaTest asset."""

from pathlib import Path

import numpy as np
import pytest

ASSET = Path("/root/reference/RenderCore/assets/AlphaTest.glb")
needs_asset = pytest.mark.skipif(not ASSET.exists(), reason="reference asset absent")


@needs_asset
def test_alphatest_glb_imports():
    from androidrenderer_tpu.scene.gltf import load_gltf_scene

    scene = load_gltf_scene(str(ASSET))
    arrays, stats = scene.build()
    assert stats["num_primitives"] == 5
    assert stats["num_materials"] == 2
    assert stats["num_blend_triangles"] > 0
    modes = {m.alpha_mode for m in scene.materials.materials}
    assert 2 in modes  # BLEND present
    assert all(m.double_sided for m in scene.materials.materials)


@needs_asset
def test_alphatest_glb_renders():
    import jax.numpy as jnp

    from androidrenderer_tpu.app.application import Application
    from androidrenderer_tpu.config import RenderConfig, ShadowMode

    from androidrenderer_tpu.scene.gltf import load_gltf_scene

    W = H = 128
    cfg = RenderConfig(
        render_width=W, render_height=H, output_width=W, output_height=H,
        shadow_mode=ShadowMode.OFF, bloom=False, max_tris_per_tile=256,
        occlusion_culling=False,
    )
    app = Application(cfg, load_gltf_scene(str(ASSET)))
    # Blend geometry present -> translucency stays enabled.
    assert app.config.translucency
    app.camera.set_position([0.0, 1.0, 4.0])
    app.camera.pitch, app.camera.yaw = -0.2, np.pi
    img = app.tick()
    assert np.isfinite(np.asarray(app._last_outputs.hdr)).all()
    assert img.std() > 5.0  # visual structure (textured quad over ground)
