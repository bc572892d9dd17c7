"""Match-graph tests: keypoint matching, trace assembly, matches.json io,
and the end-to-end match->calibrate loop on simulator imagery."""

import json

import numpy as np
import pytest

from surround360_tpu.calib.matches import (
    assemble_traces,
    load_matches_json,
    match_keypoints,
)


class TestAssembleTraces:
    def test_union_find_chains_across_pairs(self):
        # A:0 ~ B:0 ~ C:0 forms one trace over three cameras
        keypoints = {
            "A": np.array([[10.0, 10.0]]),
            "B": np.array([[20.0, 10.0]]),
            "C": np.array([[30.0, 10.0]]),
        }
        matches = [
            ("A", "B", np.array([[0, 0]])),
            ("B", "C", np.array([[0, 0]])),
        ]
        obs = assemble_traces(keypoints, matches, {"A": 0, "B": 1, "C": 2})
        assert obs.num_points == 1
        assert len(obs.cam_idx) == 3
        assert set(obs.cam_idx.tolist()) == {0, 1, 2}

    def test_ambiguous_same_camera_trace_dropped(self):
        # trace would contain two keypoints of camera A -> dropped
        keypoints = {
            "A": np.array([[1.0, 1.0], [5.0, 5.0]]),
            "B": np.array([[2.0, 2.0]]),
        }
        matches = [
            ("A", "B", np.array([[0, 0], [1, 0]])),
        ]
        obs = assemble_traces(keypoints, matches, {"A": 0, "B": 1})
        assert obs.num_points == 0

    def test_single_view_dropped(self):
        keypoints = {"A": np.array([[1.0, 1.0]]), "B": np.array([[2.0, 2.0]])}
        obs = assemble_traces(keypoints, [], {"A": 0, "B": 1})
        assert obs.num_points == 0


class TestMatchesJson:
    def test_roundtrip_schema(self, tmp_path):
        data = {
            "images": {
                "cam1.png": [
                    {"x": "10.5", "y": "20.5", "scale": "1", "orientation": "0"}
                ],
                "cam2.png": [
                    {"x": "11.5", "y": "21.5", "scale": "1", "orientation": "0"}
                ],
            },
            "all_matches": [
                {
                    "image1": "cam1.png",
                    "image2": "cam2.png",
                    "matches": [{"idx1": "0", "idx2": "0"}],
                }
            ],
        }
        path = tmp_path / "matches.json"
        path.write_text(json.dumps(data))
        keypoints, matches = load_matches_json(str(path))
        assert keypoints["cam1.png"].shape == (1, 2)
        assert matches[0][0] == "cam1.png"
        np.testing.assert_array_equal(matches[0][2], [[0, 0]])


class TestKeypointMatching:
    def test_matches_shifted_texture(self):
        rng = np.random.default_rng(0)
        import cv2

        base = (
            cv2.GaussianBlur(rng.random((300, 400)).astype(np.float32), (0, 0), 1.5)
            * 255
        )
        base = (base - base.min()) / (base.max() - base.min())
        a = base[:, 20:320]
        b = base[:, 10:310]  # +10 px shift
        pts_a, pts_b = match_keypoints(a[None], b[None], algorithm="ORB")
        assert len(pts_a) > 20
        dx = pts_b[:, 0] - pts_a[:, 0]
        assert abs(np.median(dx) - 10.0) < 1.0


class TestEndToEndMatchCalibrate:
    def test_simulator_rig_recovery_via_matcher(self):
        """Full loop: simulator images -> ORB matches -> traces -> BA."""
        from surround360_tpu.calib.geometric import (
            GeometricCalibrationConfig,
            calibrate_geometric,
            perturb_rig,
            reprojection_report,
            reprojection_errors,
            triangulate_points,
        )
        from surround360_tpu.capture import render_camera_views
        from surround360_tpu.geometry.rig import make_ring_rig

        from surround360_tpu.capture import checker_sinusoid_environment

        rig = make_ring_rig(num_side_cameras=6, side_fov_degrees=120.0).rescaled(
            0.25
        )
        # ORB needs corner-rich content, and it must be APERIODIC: a single
        # high-frequency sinusoid aliases into consistent wrong matches
        # that survive outlier culling and bend the cameras
        def env(d):
            return (
                0.5 * checker_sinusoid_environment(d, sharpness=23.7)
                + 0.3 * checker_sinusoid_environment(d, sharpness=57.1)
                + 0.2 * checker_sinusoid_environment(d, sharpness=118.9)
            )

        views = render_camera_views(rig, env_fn=env)
        keypoints, matches = {}, []
        for i in range(1, 7):  # side cameras cam1..cam6 (ring adjacency)
            j = 1 + (i % 6)
            id_a, id_b = f"cam{i}", f"cam{j}"
            pts_a, pts_b = match_keypoints(
                views[rig.ids.index(id_a)][:3], views[rig.ids.index(id_b)][:3]
            )
            if len(pts_a) < 8:
                continue
            base_a = len(keypoints.setdefault(id_a, np.zeros((0, 2))))
            base_b = len(keypoints.setdefault(id_b, np.zeros((0, 2))))
            keypoints[id_a] = np.concatenate([keypoints[id_a], pts_a])
            keypoints[id_b] = np.concatenate([keypoints[id_b], pts_b])
            matches.append(
                (
                    id_a,
                    id_b,
                    np.stack(
                        [
                            base_a + np.arange(len(pts_a)),
                            base_b + np.arange(len(pts_b)),
                        ],
                        axis=1,
                    ),
                )
            )
        image_to_camera = {f"cam{i}": rig.ids.index(f"cam{i}") for i in range(1, 7)}
        obs = assemble_traces(keypoints, matches, image_to_camera)
        assert obs.num_points > 30, obs.num_points

        bad = perturb_rig(rig, rotation_amount=0.004, principal_amount=0.0)
        before = reprojection_report(
            reprojection_errors(bad, obs, triangulate_points(bad, obs))
        )
        # ring-only adjacency gives a sparse match graph: keep intrinsics
        # locked so they can't absorb rotation error (the perturbation is
        # rotation + principal only)
        cfg = GeometricCalibrationConfig(
            passes=4,
            lm_iterations=10,
            outlier_factor=3.0,
            lock_focal=True,
            lock_distortion=True,
            lock_principal=True,
        )
        refined, after = calibrate_geometric(bad, obs, cfg)
        # real ORB matches on repetitive synthetic texture carry heavy
        # outliers; require a solid improvement in the robust middle of the
        # distribution rather than near-zero residuals
        assert after["median"] < 0.7 * before["median"], (before, after)
        # refined orientations stay within ~1.5 deg of ground truth (match
        # noise bounds the attainable accuracy on this synthetic texture)
        dots_ref = [
            np.dot(np.asarray(ct.forward), np.asarray(cr.forward))
            for ct, cr in zip(rig.cameras, refined.cameras)
        ]
        assert min(dots_ref) > 0.999, dots_ref
