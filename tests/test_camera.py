"""Camera math unit tests — reversed-Z projection, lookAt, jitter, frustum."""

import math

import numpy as np

from androidrenderer_tpu.camera import (
    Camera,
    ViewData,
    flycam_basis,
    halton,
    inf_reverse_z_projection,
    look_at,
    taa_jitter,
)


def project(vp: np.ndarray, p):
    h = vp @ np.array([*p, 1.0], dtype=np.float64)
    return h[:3] / h[3], h[3]


def test_infinite_reversed_z_depth_range():
    p = inf_reverse_z_projection(math.radians(75.0), 1.0, 0.05)
    # Point exactly at the near plane (view z = -z_near) -> ndc depth 1.
    ndc, w = project(p, [0, 0, -0.05])
    assert abs(ndc[2] - 1.0) < 1e-6
    assert w > 0
    # Depth decreases monotonically with distance, towards 0.
    d_prev = 1.0
    for dist in [0.1, 1.0, 10.0, 1000.0]:
        ndc, _ = project(p, [0, 0, -dist])
        assert 0.0 < ndc[2] < d_prev
        d_prev = ndc[2]
    # clip.z is constant z_near (scene_view.cpp:13-27).
    assert p[2, 3] == np.float32(0.05) and p[2, 2] == 0.0 and p[3, 2] == -1.0


def test_look_at_center_projects_to_origin():
    view = look_at(np.array([1.0, 2.0, 3.0]), np.array([4.0, 2.0, 3.0]), np.array([0, 1, 0]))
    p = view @ np.array([4.0, 2.0, 3.0, 1.0])
    # Target is straight ahead: x=y=0, z negative (RH looks down -z).
    assert abs(p[0]) < 1e-5 and abs(p[1]) < 1e-5 and p[2] < 0


def test_camera_world_up_renders_up():
    cam = Camera(fov_degrees=90.0, aspect=1.0, render_resolution=(100, 100))
    cam.set_position([0, 0, 0])
    cam.yaw = 0.0  # forward = +z
    vd = cam.view_data()
    # A point above the view axis must land in the upper half (ndc y > 0 => py < H/2).
    h = vd.view_proj.astype(np.float64) @ np.array([0.0, 1.0, 5.0, 1.0])
    ndc = h[:3] / h[3]
    assert ndc[1] > 0


def test_jitter_shifts_ndc_subpixel():
    cam = Camera(fov_degrees=75.0, aspect=1.0, render_resolution=(512, 512))
    cam.set_position([0, 0, 0])
    vd0 = cam.view_data()
    cam.set_jitter([0.5, 0.0])
    vd1 = cam.view_data()
    p = np.array([0.3, -0.2, 4.0, 1.0])
    h0 = vd0.view_proj.astype(np.float64) @ p
    h1 = vd1.view_proj.astype(np.float64) @ p
    dx = h1[0] / h1[3] - h0[0] / h0[3]
    # scene_view.cpp:163-164: proj[0][2] += jx*2/W with w = -view.z => ndc shift of
    # -jx*2/W (view z is negative ahead).
    assert abs(dx - (-0.5 * 2.0 / 512.0)) < 1e-6


def test_halton_and_jitter_bounds():
    assert abs(halton(1, 2) - 0.5) < 1e-12
    assert abs(halton(2, 2) - 0.25) < 1e-12
    assert abs(halton(1, 3) - 1.0 / 3.0) < 1e-12
    for i in range(16):
        j = taa_jitter(i)
        assert np.all(j >= -0.5) and np.all(j <= 0.5)


def test_flycam_basis_orthonormal():
    fwd, right, up = flycam_basis(0.3, 1.1)
    for v in (fwd, right, up):
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert abs(fwd @ right) < 1e-6
    assert abs(np.cross(right, fwd) @ up - 1.0) < 1e-5


def test_frustum_culling_coefficients():
    # frustum = [fx.x, fx.z, fy.y, fy.z] with fx = normalize(proj_row3 + proj_row0)
    # (scene_view.cpp:168-184). The left-plane inequality in view space is
    # fx.x * x + fx.z * z >= 0 for points inside.
    cam = Camera(fov_degrees=90.0, aspect=1.0, render_resolution=(64, 64))
    vd = cam.view_data()
    fx_x, fx_z, fy_y, fy_z = (float(c) for c in vd.frustum)

    def inside_left(p):
        return fx_x * p[0] + fx_z * p[2] >= 0

    # 90 deg fov, aspect 1: the left plane is x = z (view looks down -z), so a point
    # with x > -z is inside the left plane, x < z is outside.
    assert inside_left(np.array([0.0, 0.0, -5.0]))
    assert inside_left(np.array([4.9, 0.0, -5.0]))
    assert not inside_left(np.array([-5.1, 0.0, -5.0]))
    # Symmetric projection: same coefficients apply mirrored for the right plane.
    assert abs(fx_x**2 + fx_z**2 - 1.0) < 1e-5
    assert abs(fy_y**2 + fy_z**2 - 1.0) < 1e-5
