"""Optical-flow tests.

Covers the contracts of the reference PixFlow (PixFlow.h): translation
recovery, alpha gating, temporal regularization, hint-driven coarse search —
plus a synthetic Middlebury-style frame-interpolation RMSE harness standing
in for TestOpticalFlow --mode middlebury_interpolation_experiment
(TestOpticalFlow.cpp:165-226; the dataset itself isn't redistributable, so
we synthesize ground-truth pairs by warping textures).
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.flow import (
    HINT_RIGHT,
    compute_flow,
    make_flow_params,
)
from surround360_tpu.flow import pixflow as pf


def _texture(h, w, seed=0, sigma=2.0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (0, 0), sigma)


def _rgba(grey, alpha=None):
    a = np.ones_like(grey) if alpha is None else alpha
    return jnp.asarray(np.stack([grey, grey, grey, a], 0)[None])


class TestTranslation:
    @pytest.mark.parametrize("name", ["pixflow_tpu", "pixflow_low"])
    def test_recovers_horizontal_shift(self, name):
        base = _texture(96, 144, seed=1)
        i0 = base[:, 8:136]
        i1 = base[:, 4:132]  # content moves +4 px in x
        flow = np.asarray(compute_flow(_rgba(i0), _rgba(i1), make_flow_params(name)))
        interior = flow[0, :, 20:-20, 20:-20]
        assert abs(interior[0].mean() - 4.0) < 0.3
        assert abs(interior[1].mean()) < 0.3

    def test_recovers_diagonal_shift(self):
        base = _texture(112, 112, seed=2)
        i0 = base[8:104, 8:104]
        i1 = base[5:101, 11:107]  # moves (-3, +... check): I1(p)=I0(p+(dy,dx))
        flow = np.asarray(
            compute_flow(_rgba(i0), _rgba(i1), make_flow_params("pixflow_tpu"))
        )
        interior = flow[0, :, 24:-24, 24:-24]
        # I1 window starts 3 rows earlier/3 cols later than I0 window:
        # content moved by (dy,dx) = (+3, -3) in image coords
        assert abs(interior[0].mean() + 3.0) < 0.4
        assert abs(interior[1].mean() - 3.0) < 0.4


class TestAlphaSemantics:
    def test_zero_alpha_region_gets_diffused_flow(self):
        base = _texture(96, 128, seed=3)
        i0 = base[:, 8:120]
        i1 = base[:, 4:116]
        alpha = np.ones_like(i0)
        alpha[:, :30] = 0.0  # left strip invalid
        flow = np.asarray(
            compute_flow(
                _rgba(i0, alpha), _rgba(i1, alpha), make_flow_params("pixflow_tpu")
            )
        )
        # invalid region near the boundary inherits flow from the valid
        # side through lowAlphaFlowDiffusion's sigma=8 (ksize-15-truncated)
        # blur; deep inside it decays toward zero — same as the reference.
        assert flow[0, 0, 48, 25] > 1.5
        # smooth decay, no wild values
        assert np.all(np.abs(flow[0, 0, 48, :30]) < 6.0)
        # valid region unaffected
        assert abs(flow[0, 0, 48, 60] - 4.0) < 0.3

    def test_flow_is_finite_with_all_zero_alpha(self):
        base = _texture(64, 96, seed=4)
        zero_alpha = np.zeros_like(base)
        flow = np.asarray(
            compute_flow(
                _rgba(base, zero_alpha),
                _rgba(base, zero_alpha),
                make_flow_params("pixflow_tpu"),
            )
        )
        assert np.all(np.isfinite(flow))


class TestTemporalRegularization:
    def test_static_scene_follows_previous_flow(self):
        # motion map == 0 (identical frames) -> flow snaps to prev flow
        base = _texture(96, 128, seed=5)
        i0 = base[:, 8:120]
        i1 = base[:, 4:116]
        prev_flow = jnp.full((1, 2, 96, 112), 2.5)
        flow = np.asarray(
            compute_flow(
                _rgba(i0),
                _rgba(i1),
                make_flow_params("pixflow_tpu"),
                prev_flow=prev_flow,
                prev_img0=_rgba(i0),
                prev_img1=_rgba(i1),
                use_temporal=True,
            )
        )
        interior = flow[0, :, 20:-20, 20:-20]
        assert abs(interior[0].mean() - 2.5) < 0.3

    def test_motion_modulates_prior_weight(self):
        # the prior weight is w = 1 - motion (PixFlow.h:185-193): a scene
        # that differs from the previous frame must pull flow away from the
        # (zero) prior proportionally; an unchanged scene must not.
        rng = np.random.default_rng(6)
        base = (rng.random((96, 128)) > 0.5).astype(np.float32)
        base = cv2.GaussianBlur(base, (0, 0), 1.0)
        i0 = base[:, 8:120]
        i1 = base[:, 4:116]
        prev_flow = jnp.zeros((1, 2, 96, 112))

        def run(prev1):
            f = compute_flow(
                _rgba(i0),
                _rgba(i1),
                make_flow_params("pixflow_tpu"),
                prev_flow=prev_flow,
                prev_img0=_rgba(i0),
                prev_img1=_rgba(prev1),
                use_temporal=True,
            )
            return float(np.asarray(f)[0, 0, 20:-20, 20:-20].mean())

        static_fx = run(i1)  # unchanged scene: snaps to zero prior
        moving_fx = run(1.0 - i1)  # inverted scene: prior mostly ignored
        assert static_fx < 0.2
        assert moving_fx > static_fx + 0.5
        # and the un-regularized flow on this scene is ~the true 4 px
        f_free = compute_flow(_rgba(i0), _rgba(i1), make_flow_params("pixflow_tpu"))
        assert abs(float(np.asarray(f_free)[0, 0, 20:-20, 20:-20].mean()) - 4.0) < 0.4


class TestHintedSearch:
    def test_search20_with_hint_recovers_large_shift(self):
        # shift larger than the zero-init descent basin at the coarsest
        # level; pixflow_search_20's brute-force coarse search must find it
        base = _texture(128, 192, seed=7, sigma=1.2)
        i0 = base[:, 32 : 32 + 128]
        i1 = base[:, 12 : 12 + 128]  # content moves +20 px in x
        hint = jnp.asarray([HINT_RIGHT], jnp.int32)
        flow = np.asarray(
            compute_flow(
                _rgba(i0),
                _rgba(i1),
                make_flow_params("pixflow_search_20"),
                hint=hint,
            )
        )
        interior = flow[0, :, 32:-32, 32:-32]
        assert abs(interior[0].mean() - 20.0) < 3.0


class TestBatching:
    def test_batched_pairs_independent(self):
        base = _texture(64, 96, seed=8)
        i0 = base[:, 8:88]
        i1a = base[:, 4:84]  # +4
        i1b = base[:, 12:92]  # -4
        img0 = jnp.concatenate([_rgba(i0), _rgba(i0)], axis=0)
        img1 = jnp.concatenate([_rgba(i1a), _rgba(i1b)], axis=0)
        flow = np.asarray(
            compute_flow(img0, img1, make_flow_params("pixflow_tpu"))
        )
        assert flow[0, 0, 16:-16, 16:-16].mean() > 2.5
        assert flow[1, 0, 16:-16, 16:-16].mean() < -2.5


class TestMiddleburyStyleInterpolation:
    """Synthetic stand-in for the reference's Middlebury RMSE harness."""

    def _interpolation_rmse(self, i0, i1, midpoint_truth, name):
        # novel view at t from I0 samples I0 along the *reverse* flow, like
        # generateNovelViewSimpleCvRemap(imageL, flowRtoL, t)
        # (NovelView.cpp:27-45, :156-171)
        from surround360_tpu.ops import remap

        params = make_flow_params(name)
        f10 = compute_flow(_rgba(i1), _rgba(i0), params)
        H, W = i0.shape
        gy, gx = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
        coords = jnp.asarray(np.stack([gx, gy])[None]) + 0.5 * f10
        mid = remap(_rgba(i0)[:, :1], coords, interpolation="bicubic")
        err = np.asarray(mid)[0, 0, 8:-8, 8:-8] - midpoint_truth[8:-8, 8:-8]
        return float(np.sqrt(np.mean(err * err)))

    def test_interpolation_beats_no_flow_baseline(self):
        # scene: texture translating by 6 px; midpoint truth = 3 px shift
        base = _texture(96, 160, seed=9, sigma=1.5)
        i0 = base[:, 12:140]
        i1 = base[:, 6:134]
        mid = base[:, 9:137]
        rmse = self._interpolation_rmse(i0, i1, mid, "pixflow_tpu")
        baseline = float(
            np.sqrt(np.mean((0.5 * (i0 + i1) - mid)[8:-8, 8:-8] ** 2))
        )
        assert rmse < 0.35 * baseline, (rmse, baseline)
        # absolute quality: sub-2% RMSE on [0,1] textures
        assert rmse < 0.02, rmse


class TestPyramidSizes:
    def test_matches_reference_formula(self):
        params = make_flow_params("pixflow_low")
        sizes = pf._pyramid_sizes(100, 200, params)
        # replicate buildPyramid's int(x * 0.9 + 0.5) recursion
        want = [(100, 200)]
        while True:
            nh = int(want[-1][0] * 0.9 + 0.5)
            nw = int(want[-1][1] * 0.9 + 0.5)
            if nh <= 24 or nw <= 24:
                break
            want.append((nh, nw))
        assert sizes == want
        assert sizes[-1][0] > 24


class TestResidualRebase:
    def test_fast_preset_recovers_translation(self):
        """pixflow_tpu_fast (level-rebased residual sampling) must still
        recover a plain shift; the residual gate only engages on levels
        where the small window wins, so force a larger scene."""
        base = _texture(160, 240, seed=11)
        i0 = base[:, 16:224]
        i1 = base[:, 10:218]  # +6 px
        flow = np.asarray(
            compute_flow(
                _rgba(i0), _rgba(i1), make_flow_params("pixflow_tpu_fast")
            )
        )
        interior = flow[0, :, 30:-30, 30:-30]
        assert abs(interior[0].mean() - 6.0) < 0.5
        assert abs(interior[1].mean()) < 0.5
