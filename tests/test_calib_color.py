"""Color + vignetting calibration tests with synthetic ground truth."""

import numpy as np
import pytest

from surround360_tpu.calib.color import (
    LAB_MACBETH,
    _RGB2XYZ,
    _WHITE,
    delta_e_report,
    detect_color_chart,
    rgb_to_lab,
    solve_isp_color_params,
)
from surround360_tpu.calib.vignetting import fit_vignetting


def lab_to_rgb(lab, illuminant="D50"):
    """Test-side inverse of rgb_to_lab."""
    lab = np.asarray(lab, dtype=np.float64)
    y = (lab[..., 0] + 16.0) / 116.0
    x = lab[..., 1] / 500.0 + y
    z = y - lab[..., 2] / 200.0
    f = np.stack([x, y, z], axis=-1)
    t = np.where(f**3 > 0.008856, f**3, (f - 16.0 / 116.0) / 7.787)
    m = _RGB2XYZ[illuminant] / _WHITE[illuminant][:, None]
    return t @ np.linalg.inv(m).T


class TestLab:
    def test_white_point(self):
        lab = np.asarray(rgb_to_lab(np.array([1.0, 1.0, 1.0]), "D50"))
        assert abs(lab[0] - 100.0) < 0.5
        assert abs(lab[1]) < 1.0 and abs(lab[2]) < 1.0

    def test_black(self):
        lab = np.asarray(rgb_to_lab(np.array([0.0, 0.0, 0.0]), "D65"))
        assert abs(lab[0]) < 1e-5

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = rng.random((10, 3)) * 0.9 + 0.05
        lab = np.asarray(rgb_to_lab(rgb, "D50"))
        back = lab_to_rgb(lab, "D50")
        np.testing.assert_allclose(back, rgb, atol=1e-5)


class TestColorSolve:
    def _make_observations(self, illuminant="D50", seed=1):
        """Fabricate raw patch medians consistent with a known ground-truth
        correction: obs = bl + (1 - bl) * (M^-1 @ true_rgb) / s."""
        rng = np.random.default_rng(seed)
        true_rgb = lab_to_rgb(LAB_MACBETH[illuminant], illuminant)
        M_true = np.array(
            [
                [1.6, -0.3, -0.1],
                [-0.2, 1.5, -0.2],
                [-0.1, -0.4, 1.8],
            ]
        )
        bl_true = np.array([0.04, 0.05, 0.06])
        # raster 6x4 grid of centroids
        gx, gy = np.meshgrid(np.arange(6) * 100 + 50, np.arange(4) * 100 + 50)
        centroids = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1).astype(
            float
        )
        # mild illumination falloff across the chart
        u = (centroids[:, 0] - centroids[0, 0]) / 500.0
        v = (centroids[:, 1] - centroids[0, 1]) / 300.0
        s_true = 1.0 - 0.15 * u * u - 0.1 * v * v
        obs = (
            bl_true
            + (1.0 - bl_true)
            * (true_rgb @ np.linalg.inv(M_true).T)
            / s_true[:, None]
        )
        return obs, centroids, M_true, bl_true

    def test_recovers_color_params(self):
        obs, centroids, M_true, bl_true = self._make_observations()
        result = solve_isp_color_params(obs, centroids, "D50")
        # residual cost should be tiny (model can represent the truth)
        assert result.final_cost < 1.0, result.final_cost
        # WB x CCM should map a grey input to grey
        grey_in = np.linalg.inv(M_true) @ np.ones(3)
        corrected = result.ccm @ (result.white_balance * grey_in)
        corrected /= corrected.mean()
        np.testing.assert_allclose(corrected, 1.0, atol=0.02)
        # ccm rows sum to 1 (reference convention)
        np.testing.assert_allclose(result.ccm.sum(axis=1), 1.0, atol=1e-6)

    def test_black_level_recovery(self):
        obs, centroids, _, bl_true = self._make_observations(seed=2)
        result = solve_isp_color_params(obs, centroids, "D50")
        np.testing.assert_allclose(result.black_level, bl_true, atol=0.02)

    def test_locked_black_level(self):
        obs, centroids, _, bl_true = self._make_observations(seed=3)
        result = solve_isp_color_params(
            obs, centroids, "D50", black_level=bl_true
        )
        np.testing.assert_allclose(result.black_level, bl_true, atol=1e-9)
        assert result.final_cost < 1.0


class TestDeltaE:
    def test_perfect_patches_have_zero_error(self):
        rgb = lab_to_rgb(LAB_MACBETH["D65"], "D65")
        rep = delta_e_report(rgb, "D65")
        assert rep["max"] < 0.01

    def test_corrupted_patches_flagged(self):
        rgb = lab_to_rgb(LAB_MACBETH["D50"], "D50")
        rgb[:, 0] *= 1.3
        rep = delta_e_report(rgb, "D50")
        assert rep["mean"] > 3.0


class TestChartDetection:
    """Adversarial fixtures for the reference-structured detector
    (detectColorChart, ColorCalibration.cpp:504-672): the physical chart
    is a dark frame with dark separators; patches are its holes."""

    def _render_chart(
        self,
        rotation_deg=0.0,
        perspective=0.0,
        noise=0.0,
        vignette=False,
        seed=4,
    ):
        import cv2

        rng = np.random.default_rng(seed)
        H, W = 480, 640
        img = np.full((H, W, 3), 0.35, np.float32)
        colors = np.clip(lab_to_rgb(LAB_MACBETH["D50"], "D50"), 0.03, 1.0)
        pw, ph, gap = 36, 36, 10
        cw = 6 * pw + 7 * gap
        ch = 4 * ph + 5 * gap
        x0, y0 = (W - cw) // 2, (H - ch) // 2
        img[y0 : y0 + ch, x0 : x0 + cw] = 0.02  # chart body (dark frame)
        truth = []
        for r in range(4):
            for c in range(6):
                x = x0 + gap + c * (pw + gap)
                y = y0 + gap + r * (ph + gap)
                img[y : y + ph, x : x + pw] = colors[r * 6 + c]
                truth.append([x + pw / 2, y + ph / 2])
        truth = np.asarray(truth, np.float64)

        M = cv2.getRotationMatrix2D((W / 2, H / 2), rotation_deg, 1.0)
        if perspective:
            sq = np.float32([[0, 0], [W, 0], [W, H], [0, H]])
            dst = sq + np.float32(
                [[perspective * W, 0], [-perspective * W, perspective * H * 0.3],
                 [perspective * W, 0], [-perspective * W, 0]]
            )
            P = cv2.getPerspectiveTransform(sq, dst)
        else:
            P = None
        img = cv2.warpAffine(
            img, M, (W, H), flags=cv2.INTER_LINEAR,
            borderValue=(0.35, 0.35, 0.35),
        )
        ones = np.concatenate([truth, np.ones((24, 1))], axis=1)
        truth = ones @ M.T
        if P is not None:
            img = cv2.warpPerspective(
                img, P, (W, H), flags=cv2.INTER_LINEAR,
                borderValue=(0.35, 0.35, 0.35),
            )
            t = np.concatenate([truth, np.ones((24, 1))], axis=1) @ P.T
            truth = t[:, :2] / t[:, 2:]
        if vignette:
            yy, xx = np.mgrid[0:H, 0:W]
            rad = ((xx - W / 2) ** 2 + (yy - H / 2) ** 2) / (W / 2) ** 2
            img = img * (1.0 - 0.35 * rad)[..., None]
        if noise:
            img = np.clip(img + rng.normal(0, noise, img.shape), 0, 1)
        return np.moveaxis(img.astype(np.float32), -1, 0), truth, colors

    def _check(self, chw, truth, colors, cent_tol=3.0, color_tol=0.04):
        centroids, medians = detect_color_chart(chw)
        assert len(centroids) == 24
        np.testing.assert_allclose(centroids, truth, atol=cent_tol)
        np.testing.assert_allclose(medians, colors, atol=color_tol)

    def test_detects_axis_aligned_chart(self):
        self._check(*self._render_chart())

    def test_detects_rotated_chart(self):
        self._check(*self._render_chart(rotation_deg=7.0), cent_tol=4.0)

    def test_detects_perspective_chart(self):
        self._check(*self._render_chart(perspective=0.04), cent_tol=5.0)

    def test_detects_noisy_chart(self):
        self._check(*self._render_chart(noise=0.02), color_tol=0.05)

    def test_detects_vignetted_chart(self):
        chw, truth, colors = self._render_chart(vignette=True)
        centroids, medians = detect_color_chart(chw)
        assert len(centroids) == 24
        np.testing.assert_allclose(centroids, truth, atol=4.0)

    def test_combined_adversarial(self):
        chw, truth, colors = self._render_chart(
            rotation_deg=5.0, noise=0.015, vignette=True
        )
        centroids, _ = detect_color_chart(chw)
        assert len(centroids) == 24
        np.testing.assert_allclose(centroids, truth, atol=5.0)


class TestVignetting:
    def test_fit_recovers_surface(self):
        rng = np.random.default_rng(5)
        W, H = 640, 480
        max_dim = 640
        # ground truth separable quadratic-ish falloff
        locs = rng.random((120, 2)) * [W - 1, H - 1]
        u = locs[:, 0] / max_dim
        v = locs[:, 1] / max_dim
        surface = (1.0 - 0.5 * (u - 0.5) ** 2) * (1.0 - 0.4 * (v - 0.35) ** 2) * 0.7
        intensities = np.stack([surface] * 3, axis=1)
        fit = fit_vignetting(locs, intensities, (W, H))
        assert fit.rms_residual < 0.01, fit.rms_residual
        # the fitted gain curve must invert the surface: evaluate both and
        # check gain(t) * surface(t) ~ const over the used domain
        from surround360_tpu.utils.math_util import bezier_curve_batch

        ts = np.linspace(0.0, (W - 1) / max_dim, 33)
        gain = bezier_curve_batch(fit.rolloff_h[:, 0], ts, xp=np)
        surf = bezier_curve_batch(fit.bezier_x[0], ts, xp=np)
        product = gain * surf
        assert product.std() / product.mean() < 0.01, product


class TestColorAdjustmentModel:
    def test_recovers_affine_shift(self):
        from surround360_tpu.calib.color import build_color_adjustment_model

        rng = np.random.default_rng(7)
        base = rng.random((3, 64, 64)).astype(np.float32) * 0.8
        target = np.concatenate([base, np.ones((1, 64, 64), np.float32)])
        shifted = base + np.array([0.05, -0.03, 0.02], np.float32)[:, None, None]
        adjust = np.concatenate(
            [shifted, np.ones((1, 64, 64), np.float32)]
        )
        M = build_color_adjustment_model(target, adjust, sample_rate=4)
        feats = np.array([1.0, 0.5, 0.5, 0.5])
        corr = feats @ M
        np.testing.assert_allclose(corr, [-0.05, 0.03, -0.02], atol=0.01)
