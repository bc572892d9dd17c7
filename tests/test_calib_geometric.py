"""Geometric calibration tests using the synthetic-rig self-test pattern
(GeometricCalibration's generateArtificalPoints / perturbCameras /
RMSE-vs-ground-truth trio, GeometricCalibration.cpp:115-129, :235-268,
:613-689)."""

import numpy as np
import pytest

from surround360_tpu.calib import (
    CalibrationObservations,
    GeometricCalibrationConfig,
    calibrate_geometric,
    generate_artificial_points,
    perturb_rig,
    reprojection_report,
)
from surround360_tpu.calib.geometric import (
    reprojection_errors,
    triangulate_points,
)
from surround360_tpu.geometry.rig import make_ring_rig


@pytest.fixture(scope="module")
def small_rig():
    # 6 side cameras with wider fov keeps the test fast while preserving
    # overlap structure
    return make_ring_rig(num_side_cameras=6, side_fov_degrees=120.0)


class TestSyntheticObservations:
    def test_artificial_points_have_multiview_coverage(self, small_rig):
        obs, world = generate_artificial_points(small_rig, 300, seed=2)
        assert obs.num_points > 50
        counts = np.bincount(obs.pt_idx)
        assert counts.min() >= 2
        # observed pixels must lie in frame
        res = np.asarray(small_rig.cameras[0].resolution)
        assert (obs.pixels >= 0).all()
        assert (obs.pixels[:, 0] <= res[0]).all()

    def test_ground_truth_rig_has_zero_error(self, small_rig):
        obs, world = generate_artificial_points(small_rig, 200, seed=3)
        pts = triangulate_points(small_rig, obs)
        errors = reprojection_errors(small_rig, obs, pts)
        # triangulation from exact rays reprojects exactly
        assert np.median(errors) < 1e-3, np.median(errors)


class TestCalibration:
    def test_recovers_perturbed_rotations(self, small_rig):
        obs, _ = generate_artificial_points(small_rig, 400, seed=4)
        bad = perturb_rig(small_rig, rotation_amount=0.005, principal_amount=2.0)

        bad_errors = reprojection_errors(
            bad, obs, triangulate_points(bad, obs)
        )
        report_before = reprojection_report(bad_errors)

        cfg = GeometricCalibrationConfig(passes=3, lm_iterations=10)
        refined, report_after = calibrate_geometric(bad, obs, cfg)

        assert report_after["rmse"] < 0.15 * report_before["rmse"], (
            report_before,
            report_after,
        )
        # recovered orientations close to ground truth
        for cam_t, cam_r in zip(small_rig.cameras, refined.cameras):
            dot = float(
                np.dot(np.asarray(cam_t.forward), np.asarray(cam_r.forward))
            )
            assert dot > 0.99999, dot

    def test_noise_floor_respected(self, small_rig):
        # with 0.5 px observation noise, calibration should land near the
        # noise floor, not collapse to zero
        obs, _ = generate_artificial_points(
            small_rig, 400, seed=5, noise_px=0.5
        )
        bad = perturb_rig(small_rig, rotation_amount=0.003)
        cfg = GeometricCalibrationConfig(passes=2, lm_iterations=8)
        refined, report = calibrate_geometric(bad, obs, cfg)
        assert 0.2 < report["rmse"] < 1.5, report


class TestReport:
    def test_report_fields(self):
        errors = np.abs(np.random.default_rng(0).normal(size=500))
        rep = reprojection_report(errors)
        assert set(rep) == {"count", "rmse", "median", "p90", "p99", "worst"}
        assert rep["median"] <= rep["p90"] <= rep["p99"] <= rep["worst"]
