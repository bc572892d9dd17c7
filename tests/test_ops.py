"""Ops-layer tests: remap/resize/filters/compositing vs OpenCV oracles.

OpenCV (cv2) is used test-only, as the ground-truth implementation the
reference was built on: our remap/resize must match cv::remap/cv::resize to
sub-1e-2 (in [0,1] units) for render parity.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.ops import (
    feather_alpha,
    flatten_layers_alpha_softmax,
    flatten_layers_deghost_prefer_base,
    gaussian_blur,
    iir_lowpass_2d,
    median_filter,
    offset_horizontal_wrap,
    remap,
    resize_area,
    resize_bilinear,
    sharpen_iir,
)
from surround360_tpu.ops import warp as warp_mod
from surround360_tpu.geometry.rig import make_ring_rig


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish image: random lowpassed so interpolation differences are
    # dominated by algorithmic mismatch, not bandlimit violations
    img = rng.random((h, w, c)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 1.5)
    if img.ndim == 2:
        img = img[..., None]
    return img


def _chw(img_hwc):
    return jnp.asarray(np.moveaxis(img_hwc, -1, 0))


def _hwc(img_chw):
    return np.moveaxis(np.asarray(img_chw), 0, -1)


class TestRemap:
    @pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
    def test_matches_opencv(self, interp):
        img = _rand_img(64, 96, 3)
        rng = np.random.default_rng(1)
        # smooth warp field (like real lens warps)
        mx = (
            np.fromfunction(lambda y, x: x + 5 * np.sin(y / 9.0), (60, 80))
        ).astype(np.float32)
        my = (
            np.fromfunction(lambda y, x: y + 3 * np.cos(x / 7.0), (60, 80))
        ).astype(np.float32)
        cv_interp = cv2.INTER_LINEAR if interp == "bilinear" else cv2.INTER_CUBIC
        want = cv2.remap(img, mx, my, cv_interp, borderMode=cv2.BORDER_CONSTANT)
        got = _hwc(
            remap(_chw(img), jnp.stack([jnp.asarray(mx), jnp.asarray(my)]), interpolation=interp)
        )
        # interior only: border handling of partial taps differs by design
        # (we renormalize nothing; cv clamps taps)
        np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4], atol=2e-3)

    def test_constant_border_transparent(self):
        img = np.ones((8, 8, 1), np.float32)
        coords = jnp.stack(
            [jnp.full((4, 4), -1.0), jnp.full((4, 4), -1.0)]
        )
        out = remap(_chw(img), coords, interpolation="bicubic")
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_wrap_border(self):
        img = _rand_img(16, 32, 1, seed=3)
        xs, ys = np.meshgrid(np.arange(32, dtype=np.float32) - 32, np.arange(16, dtype=np.float32), indexing="xy")
        out = remap(_chw(img), jnp.stack([jnp.asarray(xs), jnp.asarray(ys)]), interpolation="bilinear", border="wrap")
        np.testing.assert_allclose(_hwc(out), img, atol=1e-5)

    def test_batched(self):
        img = _rand_img(32, 32, 4)
        imgs = jnp.stack([_chw(img), _chw(img * 0.5)])
        xs, ys = np.meshgrid(np.arange(32, dtype=np.float32), np.arange(32, dtype=np.float32), indexing="xy")
        coords = jnp.stack([jnp.asarray(xs), jnp.asarray(ys)])
        out = remap(imgs, coords, interpolation="bilinear")
        assert out.shape == (2, 4, 32, 32)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(imgs[1]), atol=1e-5)


class TestResize:
    def test_bilinear_matches_opencv(self):
        img = _rand_img(64, 96, 3)
        want = cv2.resize(img, (48, 32), interpolation=cv2.INTER_LINEAR)
        got = _hwc(resize_bilinear(_chw(img), (32, 48)))
        np.testing.assert_allclose(got, want, atol=3e-3)

    def test_area_matches_opencv(self):
        img = _rand_img(64, 96, 3, seed=5)
        want = cv2.resize(img, (24, 16), interpolation=cv2.INTER_AREA)
        got = _hwc(resize_area(_chw(img), (16, 24)))
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_area_non_integer_ratio(self):
        img = _rand_img(45, 63, 1, seed=6)
        want = cv2.resize(img, (57, 40), interpolation=cv2.INTER_AREA)[..., None]
        got = _hwc(resize_area(_chw(img), (40, 57)))
        np.testing.assert_allclose(got, want, atol=5e-3)

    def test_gaussian_blur_matches_opencv(self):
        img = _rand_img(64, 64, 3, seed=7)
        sigma = 2.0
        want = cv2.GaussianBlur(img, (0, 0), sigma, borderType=cv2.BORDER_REFLECT_101)
        got = _hwc(gaussian_blur(_chw(img), sigma))
        np.testing.assert_allclose(got[3:-3, 3:-3], want[3:-3, 3:-3], atol=2e-3)


class TestFilters:
    def test_iir_lowpass_preserves_dc(self):
        img = jnp.full((32, 64), 0.7)
        out = iir_lowpass_2d(img, 0.5)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-4)

    def test_iir_lowpass_smooths(self):
        rng = np.random.default_rng(8)
        img = jnp.asarray(rng.random((64, 64)), jnp.float32)
        out = np.asarray(iir_lowpass_2d(img, 0.5))
        assert np.var(out) < 0.5 * np.var(np.asarray(img))
        # stronger amount -> smoother
        out2 = np.asarray(iir_lowpass_2d(img, 0.9))
        assert np.var(out2) < np.var(out)

    def test_iir_wrap_boundary_is_seamless(self):
        # a signal continuous under wrap: filtered result must also be
        # continuous at the seam (no edge darkening)
        xs = np.arange(128) / 128.0 * 2 * np.pi
        img = jnp.asarray(np.tile(0.5 + 0.4 * np.sin(xs), (16, 1)), jnp.float32)
        out = np.asarray(iir_lowpass_2d(img, 0.7, h_boundary="wrap"))
        seam_jump = abs(out[8, 0] - out[8, -1])
        interior_jump = abs(out[8, 64] - out[8, 63])
        assert seam_jump < 3 * interior_jump + 1e-4

    def test_sharpen_increases_contrast(self):
        img = np.zeros((32, 32), np.float32) + 0.5
        img[:, 16:] = 0.6
        out = np.asarray(sharpen_iir(jnp.asarray(img), amount=2.0))
        # edge overshoot
        assert out.max() > 0.605
        assert out.min() < 0.495

    def test_sharpen_renderer_kwargs_trace(self):
        # the staged output stage's exact call shape: iir_amount passed
        # as a keyword must be static under jit (it gates the band-matrix
        # construction and is asserted on in Python) — regression for the
        # TracerBoolConversionError that killed the 6k preset bench
        img = jnp.asarray(_rand_img(24, 48, 1, seed=3)[..., 0])
        out = np.asarray(
            sharpen_iir(
                img[None],
                amount=1.25,
                iir_amount=0.25,
                h_boundary="wrap",
                v_boundary="reflect",
            )
        )
        assert out.shape == (1, 24, 48)
        assert np.isfinite(out).all()

    def test_median_filter_matches_opencv(self):
        img = (_rand_img(32, 32, 1, seed=9)[..., 0] * 255).astype(np.uint8)
        want = cv2.medianBlur(img, 5).astype(np.float32) / 255.0
        got = np.asarray(median_filter(jnp.asarray(img, jnp.float32) / 255.0, 5))
        # interior only (cv replicates differently at borders)
        np.testing.assert_allclose(got[3:-3, 3:-3], want[3:-3, 3:-3], atol=2e-3)


class TestCompositing:
    def test_offset_horizontal_wrap_integer(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
        out = np.asarray(offset_horizontal_wrap(img, 1))
        np.testing.assert_allclose(out[0, 0], [3, 0, 1, 2])

    def test_feather_alpha_shrinks_and_smooths(self):
        img = np.zeros((4, 32, 32), np.float32)
        img[3, 8:24, 8:24] = 1.0
        out = np.asarray(feather_alpha(jnp.asarray(img), erode_size=3))
        assert out[3, 16, 16] > 0.95  # center stays opaque
        assert out[3, 9, 16] < 0.5  # boundary eroded
        assert out[3].max() <= 1.0 + 1e-5

    def test_deghost_prefer_base_identical_images(self):
        rgb = np.random.default_rng(10).random((3, 8, 8)).astype(np.float32)
        base = jnp.asarray(np.concatenate([rgb, np.ones((1, 8, 8), np.float32)]))
        top = jnp.asarray(np.concatenate([rgb, np.full((1, 8, 8), 0.5, np.float32)]))
        out = np.asarray(flatten_layers_deghost_prefer_base(base, top))
        # identical colors -> deghost=0 -> plain alpha lerp -> same color
        np.testing.assert_allclose(out[:3], rgb, atol=1e-5)
        np.testing.assert_allclose(out[3], 1.0, atol=1e-6)

    def test_deghost_prefers_base_on_conflict(self):
        base = np.zeros((4, 8, 8), np.float32)
        base[0] = 1.0  # red base
        base[3] = 1.0
        top = np.zeros((4, 8, 8), np.float32)
        top[1] = 1.0  # green top
        top[3] = 0.5
        out = np.asarray(
            flatten_layers_deghost_prefer_base(jnp.asarray(base), jnp.asarray(top))
        )
        # with equal alpha-lerp weights 0.5/0.5 the base-biased softmax must
        # pull toward base red
        assert out[0, 4, 4] > out[1, 4, 4]

    def test_alpha_softmax_flatten(self):
        l1 = np.zeros((4, 4, 4), np.float32)
        l1[2] = 1.0
        l1[3] = 1.0  # opaque blue
        l2 = np.zeros((4, 4, 4), np.float32)
        l2[0] = 1.0
        l2[3] = 0.0  # transparent red
        out = np.asarray(flatten_layers_alpha_softmax(jnp.stack([jnp.asarray(l1), jnp.asarray(l2)])))
        np.testing.assert_allclose(out[2], 1.0, atol=1e-5)
        np.testing.assert_allclose(out[0], 0.0, atol=1e-5)


class TestWarp:
    def test_side_warp_center_hits_principal(self):
        rig = make_ring_rig()
        cam = rig.side_cameras[0]
        h_rad = 2 * warp_mod.rig_fov(rig.side_cameras, False)
        v_rad = 2 * warp_mod.rig_fov(rig.side_cameras, True)
        warp, (sh, sw) = warp_mod.side_cam_spherical_warp(
            cam, 0, 14, (2048, 1024), h_rad, v_rad
        )
        assert warp.shape == (2, sh, sw)
        # strip center looks along camera forward -> principal point
        cx = warp[0, sh // 2, sw // 2]
        cy = warp[1, sh // 2, sw // 2]
        assert abs(cx - 1023.5) < 2.0
        assert abs(cy - 1023.5) < 2.0

    def test_equirect_to_cam_marks_unseen(self):
        rig = make_ring_rig()
        cam = rig.side_cameras[0]  # looks along +x
        coords = warp_mod.equirect_to_cam_warp(cam, (64, 128), 1e4)
        # behind the camera (theta ~ pi) must be (-1, -1)
        assert coords[0, 32, 64] == -1.0
        # in front (theta ~ 0 -> x=0 col) must be valid
        assert coords[0, 32, 0] >= 0.0

    def test_cubemap_warp_front_center(self):
        # the front face center looks along -y; equirect theta there is 3/2 pi
        w = warp_mod.equirect_to_cubemap_warp((128, 256), (64, 64), "front")
        cx = w[0, 32, 32] / 256.0 * 2 * np.pi
        assert abs(cx - 1.5 * np.pi) < 0.1
        cy = w[1, 32, 32] / 128.0 * np.pi
        assert abs(cy - np.pi / 2) < 0.1

    def test_cubemap_top_face_up(self):
        w = warp_mod.equirect_to_cubemap_warp((128, 256), (64, 64), "top")
        # top face center looks along +z -> phi ~ 0
        assert w[1, 32, 32] < 8.0


class TestRemapMatmulBackend:
    @pytest.mark.parametrize("interp", ["bilinear", "bicubic"])
    @pytest.mark.parametrize("border", ["constant", "wrap"])
    def test_matches_gather_backend(self, interp, border):
        # the TPU fast path (one-hot interpolation matmuls) must agree with
        # the gather path to f32 epsilon, including out-of-range coords
        rng = np.random.default_rng(42)
        img = jnp.asarray(rng.random((3, 40, 56)), jnp.float32)
        xs = jnp.asarray(rng.random((30, 44)) * 70 - 8, jnp.float32)
        ys = jnp.asarray(rng.random((30, 44)) * 52 - 6, jnp.float32)
        coords = jnp.stack([xs, ys])
        a = np.asarray(remap(img, coords, interp, border, method="gather"))
        b = np.asarray(remap(img, coords, interp, border, method="matmul"))
        np.testing.assert_allclose(a, b, atol=1e-5)
