"""Camera-model unit tests.

Behavioral port of the reference's embedded Camera::unitTest
(surround360_render/source/render/Camera.cpp:291-410): JSON round-trip,
pixel<->ray inverse consistency, fov get/set, distort/undistort inverse,
ray-midpoint triangulation incl. degenerate cases — plus vectorization and
jit/vmap coverage the reference doesn't have.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.geometry import (
    FTHETA,
    RECTILINEAR,
    Camera,
    camera_from_json,
    camera_to_json,
    create_rescaled_camera,
    make_camera,
    pixel_to_rig_direction,
    pixel_to_rig_near_infinity,
    ray_midpoint,
    rotation_from_angle_axis,
    angle_axis_from_rotation,
    sees,
    world_to_pixel,
)
from surround360_tpu.geometry import camera as cam_mod
from surround360_tpu.geometry.rig import make_ring_rig, load_rig, save_rig, stack_cameras


def random_ftheta_camera(seed=0, distortion=(0.0, 0.0)):
    rng = np.random.default_rng(seed)
    # random orthonormal frame via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    forward, up = q[:, 0], q[:, 1]
    return make_camera(
        FTHETA,
        position=rng.normal(size=3) * 10,
        forward=forward,
        up=up,
        resolution=[2448, 2048],
        focal=[1240.0, -1240.0],
        distortion=distortion,
    )


class TestProjectionInverse:
    def test_center_pixel_is_principal(self):
        cam = random_ftheta_camera(1)
        center = world_to_pixel(cam, np.asarray(cam.position) + np.asarray(cam.forward))
        np.testing.assert_allclose(center, [2448 / 2, 2048 / 2], atol=1e-9)

    @pytest.mark.parametrize("distortion", [(0.0, 0.0), (0.2, 0.02)])
    @pytest.mark.parametrize("lens", [FTHETA, RECTILINEAR])
    def test_rig_undoes_pixel(self, lens, distortion):
        rng = np.random.default_rng(2)
        if lens == RECTILINEAR:
            cam = make_camera(
                lens,
                position=[1.0, -2.0, 0.5],
                forward=[1, 0, 0],
                up=[0, 0, 1],
                resolution=[2048, 2048],
                focal=[1269.58, -1269.58],
                distortion=distortion,
            )
        else:
            cam = random_ftheta_camera(3, distortion)
        d = 3.1
        for _ in range(20):
            v = rng.normal(size=3)
            # keep within a moderate cone: Newton undistort (10 fixed steps,
            # same as the reference) converges for realistic |r|; huge
            # synthetic distortion at >60 deg off-axis would need more steps
            v[1:] *= 0.5
            v[0] = abs(v[0]) + 1.0
            direction = v / np.linalg.norm(v)
            if lens == FTHETA:
                direction = np.asarray(cam.forward) * 0.5 + 0.8 * direction
                direction /= np.linalg.norm(direction)
            expected = np.asarray(cam.position) + d * direction
            pix = world_to_pixel(cam, expected)
            actual = np.asarray(cam.position) + d * pixel_to_rig_direction(cam, pix)
            np.testing.assert_allclose(actual, expected, atol=1e-6)

    def test_distort_undistort_roundtrip(self):
        cam = random_ftheta_camera(4, distortion=(0.2, 0.02))
        r = 3.0
        d = cam_mod.distort(cam, r)
        assert abs(cam_mod.undistort(cam, d) - r) < 1e-6

    def test_vectorized_matches_scalar(self):
        cam = random_ftheta_camera(5, distortion=(0.05, 0.001))
        rng = np.random.default_rng(6)
        pts = rng.normal(size=(7, 11, 3)) * 100
        batch = world_to_pixel(cam, pts)
        for i in range(7):
            for j in range(0, 11, 3):
                single = world_to_pixel(cam, pts[i, j])
                np.testing.assert_allclose(batch[i, j], single, rtol=1e-12)


class TestFov:
    def test_fov_roundtrip(self):
        cam = random_ftheta_camera(7)
        for fov in [0.9 * np.pi, 0.1 * np.pi, np.pi / 3]:
            cam2 = cam_mod.set_fov(cam, fov)
            assert abs(cam_mod.get_fov(cam2) - fov) < 1e-10

    def test_fov_gates_visibility(self):
        cam = random_ftheta_camera(8)
        assert cam_mod.is_default_fov(cam)
        corner_pt = pixel_to_rig_near_infinity(cam, np.array([1.0, 1.0]))
        center_pt = pixel_to_rig_near_infinity(cam, np.array([1200.0, 1000.0]))
        assert bool(sees(cam, corner_pt))
        cam_narrow = cam_mod.set_fov(cam, 0.1 * np.pi)
        assert not bool(sees(cam_narrow, corner_pt))
        assert bool(sees(cam_narrow, center_pt))
        cam_default = cam_mod.set_default_fov(cam_narrow)
        assert bool(sees(cam_default, corner_pt))

    def test_rectilinear_default_sees_front_hemisphere_only(self):
        cam = make_camera(
            RECTILINEAR,
            position=[0, 0, 0],
            forward=[1, 0, 0],
            up=[0, 0, 1],
            resolution=[2048, 2048],
            focal=[1269.58, -1269.58],
        )
        assert bool(cam_mod.is_behind(cam, np.array([-5.0, 0.0, 0.0])))
        assert not bool(sees(cam, np.array([-5.0, 0.0, 0.0])))
        assert bool(sees(cam, np.array([5.0, 0.0, 0.0])))


class TestSerialization:
    def test_json_roundtrip(self, tmp_path):
        cam = random_ftheta_camera(9, distortion=(0.1, -0.01))
        cam = cam_mod.set_fov(cam, 1.61443)
        obj = camera_to_json(cam, "cam9", "side camera")
        cam2, cam_id, group = camera_from_json(obj)
        assert cam_id == "cam9" and group == "side camera"
        for f in Camera._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(cam, f)), np.asarray(getattr(cam2, f)), atol=1e-12
            )

    def test_rig_roundtrip(self, tmp_path):
        rig = make_ring_rig()
        path = tmp_path / "rig.json"
        save_rig(str(path), rig)
        rig2 = load_rig(str(path))
        assert rig2.ids == rig.ids
        assert rig2.side_camera_count == 14
        for c1, c2 in zip(rig.cameras, rig2.cameras):
            np.testing.assert_allclose(c1.rotation, c2.rotation, atol=1e-12)
            np.testing.assert_allclose(c1.fov_threshold, c2.fov_threshold, atol=1e-12)

    def test_defaults_match_reference_semantics(self):
        # principal defaults to resolution/2; missing distortion -> 0;
        # missing fov -> lens default (Camera.cpp:44-83)
        obj = {
            "version": 1,
            "type": "FTHETA",
            "origin": [0, 0, 13.1],
            "forward": [0, 0, 1],
            "up": [0, 1, 0],
            "right": [-1, 0, 0],
            "resolution": [2048, 2048],
            "focal": [483.76, -483.76],
            "id": "cam0",
        }
        cam, _, _ = camera_from_json(obj)
        np.testing.assert_allclose(cam.principal, [1024, 1024])
        np.testing.assert_allclose(cam.distortion, [0, 0])
        assert float(cam.fov_threshold) == -1.0


class TestRig:
    def test_ring_rig_selection(self):
        rig = make_ring_rig()
        assert len(rig.cameras) == 17
        assert rig.side_camera_count == 14
        assert rig.ids[rig.top_camera_index] == "cam0"
        assert rig.ids[rig.bottom_camera_index] == "cam15"
        assert rig.ids[rig.bottom_camera2_index] == "cam16"
        assert abs(rig.ring_radius - 21.8) < 1e-9

    def test_adjacent_side_cameras_overlap(self):
        rig = make_ring_rig()
        sides = rig.side_cameras
        ov = cam_mod.overlap(sides[0], sides[1])
        assert ov > 0.2, f"adjacent side cameras should overlap, got {ov}"
        ov_far = cam_mod.overlap(sides[0], sides[7])
        assert ov_far == 0.0

    def test_stacked_cameras_vmap(self):
        rig = make_ring_rig()
        stacked = stack_cameras(rig.side_cameras)
        pts = np.array([100.0, 30.0, 5.0])
        batched = jax.vmap(lambda c: world_to_pixel(c, jnp.asarray(pts)))(
            jax.tree.map(jnp.asarray, stacked)
        )
        for i, cam in enumerate(rig.side_cameras):
            np.testing.assert_allclose(
                np.asarray(batched[i]), world_to_pixel(cam, pts), rtol=1e-4, atol=1e-2
            )


class TestRotation:
    def test_angle_axis_roundtrip(self):
        rng = np.random.default_rng(10)
        for _ in range(10):
            aa = rng.normal(size=3)
            rot = rotation_from_angle_axis(aa, xp=np)
            aa2 = angle_axis_from_rotation(rot, xp=np)
            rot2 = rotation_from_angle_axis(aa2, xp=np)
            np.testing.assert_allclose(rot, rot2, atol=1e-10)

    def test_projection_survives_rotation_roundtrip(self):
        cam = random_ftheta_camera(11)
        aa = angle_axis_from_rotation(cam.rotation, xp=np)
        rot = rotation_from_angle_axis(aa, xp=np)
        cam2 = cam._replace(rotation=rot)
        pt = np.asarray(cam.position) + 3.1 * np.asarray(cam.forward) + np.array([0.5, -0.2, 0.1])
        np.testing.assert_allclose(
            world_to_pixel(cam, pt), world_to_pixel(cam2, pt), atol=1e-6
        )


class TestMidpoint:
    def test_intersecting(self):
        m = ray_midpoint([11, 12, -17], [-1, -1, 2], [-8, -4, 0], [3, 2, 1])
        np.testing.assert_allclose(m, [1, 2, 3], atol=1e-9)

    def test_skew(self):
        m = ray_midpoint([2, 2, 2], [-1, -1, 0], [0, 2, 0], [1, -1, 0])
        np.testing.assert_allclose(m, [1, 1, 1], atol=1e-9)

    def test_parallel(self):
        m = ray_midpoint([2, 2, 2], [1, 2, 3], [1, 2, 3], [-1, -2, -3])
        np.testing.assert_allclose(m, [1.5, 2, 2.5], atol=1e-6)


class TestRescale:
    def test_rescaled_projection_scales(self):
        cam = random_ftheta_camera(12)
        half = create_rescaled_camera(cam, 0.5)
        pt = np.asarray(cam.position) + np.asarray(cam.forward) * 2 + np.array([0.1, 0.2, -0.1])
        np.testing.assert_allclose(
            world_to_pixel(half, pt), world_to_pixel(cam, pt) * 0.5, rtol=1e-9
        )


class TestJit:
    def test_world_to_pixel_jits(self):
        cam = random_ftheta_camera(13, distortion=(0.05, 0.0))
        dcam = cam_mod.to_device(cam)
        rng = np.random.default_rng(14)
        # points in a forward cone (behind-camera points project to huge
        # off-sensor coords where f32 vs f64 comparison is meaningless)
        local = rng.normal(size=(64, 3)) * np.array([0.6, 0.6, 1.0])
        local[:, 2] = np.abs(local[:, 2]) + 0.5
        dirs = local / np.linalg.norm(local, axis=-1, keepdims=True)
        pts = (
            np.asarray(cam.position)
            + 50.0 * (dirs @ np.stack([np.asarray(cam.right), np.asarray(cam.up), np.asarray(cam.forward)]))
        )
        f = jax.jit(world_to_pixel)
        out = f(dcam, jnp.asarray(pts, jnp.float32))
        ref = world_to_pixel(cam, pts)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=0.5)
