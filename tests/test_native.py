"""Native library parity: C++ BVH/sampling vs the pure-python reference."""

import numpy as np
import pytest

from androidrenderer_tpu import native
from androidrenderer_tpu.scene.bvh import build_bvh
from androidrenderer_tpu.scene.procedural import cornell_scene

needs_native = pytest.mark.skipif(
    not native.available(), reason="native library not built (tools/build_native.sh)"
)


@needs_native
def test_native_bvh_bit_identical():
    sc = cornell_scene()
    ms = sc.meshes
    tris = np.concatenate([ms.mesh_triangles(i) for i in range(len(ms.meshes))])
    pos = ms.positions
    b_py = build_bvh(pos, tris)
    b_c = native.build_bvh_native(pos, tris)
    for name in b_py._fields:
        a = np.nan_to_num(getattr(b_py, name), posinf=1e30, neginf=-1e30)
        b = np.nan_to_num(getattr(b_c, name), posinf=1e30, neginf=-1e30)
        np.testing.assert_array_equal(a, b, err_msg=name)


@needs_native
def test_native_bvh_respects_valid_mask():
    sc = cornell_scene()
    ms = sc.meshes
    tris = np.concatenate([ms.mesh_triangles(i) for i in range(len(ms.meshes))])
    valid = np.zeros(len(tris), bool)
    valid[:10] = True
    b = native.build_bvh_native(ms.positions, tris, valid)
    live = b.tri_order[b.tri_order >= 0]
    assert sorted(live.tolist()) == list(range(10))


@needs_native
def test_native_surface_sampling():
    sc = cornell_scene()
    ms = sc.meshes
    tris = ms.mesh_triangles(0)  # the 2x2 wall plane
    pts = native.sample_surface_native(ms.positions, tris, 0.1, 1000, seed=3)
    assert pts is not None and 38 <= len(pts) <= 41  # ~4 m^2 / 0.1 (fp area)
    # All points on the plane (y == 0 in object space), normals unit.
    assert np.abs(pts[:, 1]).max() < 1e-5
    assert np.allclose(np.linalg.norm(pts[:, 3:6], axis=1), 1.0, atol=1e-5)
