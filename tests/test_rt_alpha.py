"""RT alpha-mask tests: any-hit IgnoreHit emulation + textured hit shading.

Mirrors gltf_basic_pbr.slang:291-357 (masked any-hit: sample base color at the
hit UV, ignore when alpha <= cutoff) and :413-437 (closest-hit texture
sampling), using the procedural alpha-fence fixture (AlphaTest.gltf analog).
"""

import numpy as np
import jax.numpy as jnp

from androidrenderer_tpu.ops.rt.effects import (
    occlusion_masked,
    trace_rays_masked,
)
from androidrenderer_tpu.ops.rt.traverse import occlusion, trace_rays
from androidrenderer_tpu.scene.procedural import alpha_test_scene


def _scene():
    scene, stats = alpha_test_scene().build()
    assert stats["num_masked_triangles"] > 0
    return scene


def _fence_rays(n=24):
    # The fixture's fence and wall are coplanar at z=0; the fence alone covers
    # y in (0, 2]. Rays from z=-1 along +z through the fence-only region.
    xs = np.linspace(-1.5, 1.5, n)
    ys = np.linspace(0.3, 1.9, n)
    gx, gy = np.meshgrid(xs, ys)
    o = np.stack([gx, gy, np.full_like(gx, -1.0)], axis=-1).reshape(-1, 3)
    d = np.broadcast_to(np.array([0.0, 0.0, 1.0], np.float32), o.shape)
    return jnp.asarray(o, jnp.float32), jnp.asarray(np.ascontiguousarray(d))


import pytest


@pytest.mark.parametrize("use_bitmap", [True, False])
def test_masked_occlusion_has_holes(use_bitmap):
    # Both masked paths: the default in-traversal 16x16 alpha bitmaps and the
    # exact texture-sampling IgnoreHit re-trace loop (use_bitmap=False).
    scene = _scene()
    o, d = _fence_rays()
    # tmax=2: only the fence can occlude (wall is at t=3).
    occ_solid = np.asarray(occlusion(scene.bvh, o, d, 0.01, 2.0))
    occ_masked = np.asarray(
        occlusion_masked(scene.bvh, scene, o, d, 0.01, 2.0,
                         use_bitmap=use_bitmap)
    )
    # Solid treats every fence texel as an occluder; masked must open holes
    # where the foliage alpha fails the 0.5 cutoff — and keep real occluders.
    assert occ_solid.all()
    assert occ_masked.sum() > 0
    assert (~occ_masked).sum() > 0
    assert (occ_masked & ~occ_solid).sum() == 0


@pytest.mark.parametrize("use_bitmap", [True, False])
def test_masked_closest_hit_passes_through(use_bitmap):
    scene = _scene()
    o, d = _fence_rays()
    hits_solid = trace_rays(scene.bvh, o, d, 0.01, 1e30)
    hits = trace_rays_masked(scene.bvh, scene, o, d, 0.01, 1e30,
                             use_bitmap=use_bitmap)
    t_solid = np.asarray(hits_solid.t)
    t = np.asarray(hits.t)
    # Solid: every ray stops at the fence (t ~ 1).
    assert np.allclose(t_solid, 1.0, atol=1e-3)
    # Masked: alpha-failed texels pass through to a clean miss; passes stay.
    through = np.asarray(hits.slot) < 0
    assert through.sum() > 0 and (~through).sum() > 0
    assert np.allclose(t[~through], 1.0, atol=1e-3)
    # Consistency with the occlusion query's alpha decisions.
    occ = np.asarray(occlusion_masked(scene.bvh, scene, o, d, 0.01, 2.0,
                                      use_bitmap=use_bitmap))
    np.testing.assert_array_equal(~occ, through)


def test_rt_shadows_masked_end_to_end():
    """RT sun shadows through the alpha fence show leaf-shaped holes on the
    ground (VERDICT #4 "done" criterion). The alpha_test_scene fixture has no
    lit shadow receiver, so this builds one: a ground plane, a vertical foliage
    fence above it, and an oblique sun."""
    from androidrenderer_tpu.camera import Camera
    from androidrenderer_tpu.config import (
        AOMode, GIMode, RasterBackend, RenderConfig, RenderParams, ShadowMode,
    )
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.scene.procedural import (
        foliage_alpha_texture, plane_mesh, translate,
    )
    from androidrenderer_tpu.scene.material_storage import ALPHA_MASK, Material
    from androidrenderer_tpu.scene.scene import RenderScene

    rs = RenderScene()
    ms, mats = rs.meshes, rs.materials
    fence_tex = mats.add_texture(foliage_alpha_texture())
    ground_mat = mats.add_material(
        Material(np.array([0.8, 0.8, 0.8, 1.0], np.float32))
    )
    fence_mat = mats.add_material(
        Material(
            np.array([1, 1, 1, 1], np.float32),
            base_color_texture=fence_tex,
            alpha_mode=ALPHA_MASK, alpha_cutoff=0.5, double_sided=True,
        )
    )
    gp, gi_, gn, gu = plane_mesh(6.0, 6.0, subdiv=2)
    rs.add_primitive(ms.add_mesh(gp, gi_, gn, uvs=gu), ground_mat, np.eye(4, dtype=np.float32))
    fp, fi, fn, fu = plane_mesh(2.0, 2.0, subdiv=1)
    a = np.radians(90.0)
    rx = np.eye(4, dtype=np.float32)
    rx[1, 1], rx[1, 2], rx[2, 1], rx[2, 2] = np.cos(a), -np.sin(a), np.sin(a), np.cos(a)
    rs.add_primitive(
        ms.add_mesh(fp, fi, fn, uvs=fu), fence_mat,
        translate([0.0, 1.0, 0.0]) @ rx,
    )
    rs.set_sun([0.0, -0.7, -0.7], [1.0, 1.0, 1.0], 30000.0)
    scene, stats = rs.build()
    assert stats["num_masked_triangles"] > 0

    w = h = 128
    config = RenderConfig(
        render_width=w, render_height=h, output_width=w, output_height=h,
        shadow_mode=ShadowMode.RT, gi_mode=GIMode.OFF, ao_mode=AOMode.OFF,
        sky=False, bloom=False, occlusion_culling=False, translucency=False,
        use_normal_maps=False, use_mr_textures=False, use_emission=False,
        raster_backend=RasterBackend.XLA,
        tile_height=32, tile_width=128, max_tris_per_tile=256,
    )
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(w, h))
    cam.set_position([0.0, 2.5, 2.5])
    cam.pitch = -0.7
    cam.yaw = np.pi  # look down -z at the ground behind the fence
    view = cam.view_data()
    params = RenderParams.default()

    def shadow_of(cfg):
        renderer = make_renderer(cfg)
        out, _ = renderer(scene, view, params, initial_temporal_state(h, w))
        return np.asarray(out.hdr)

    img_masked = shadow_of(config)
    img_solid = shadow_of(config.replace(alpha_masking=False))
    lum_m = img_masked.sum(-1)
    lum_s = img_solid.sum(-1)
    # Shadow holes: the masked render is strictly brighter on many ground
    # pixels that the solid fence fully shadowed.
    assert (lum_m > lum_s + 1e-6).sum() > 50
