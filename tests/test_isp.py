"""ISP tests: pipeline stages vs analytic expectations + format round trips."""

import json

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from surround360_tpu.isp import (
    BinaryFootageReader,
    IspConfig,
    convert_8bit_frame,
    convert_12bit_frame,
    isp_process,
    load_isp_config,
    pack_12bit_frame,
    write_footage_file,
)
from surround360_tpu.isp.pipeline import (
    bayer_masks,
    build_composite_ccm,
    build_tone_curve_lut,
    build_vignette_gains,
)


def mosaic(rgb, cfg):
    """(3, H, W) RGB -> (H, W) bayer mosaic per the config's pattern."""
    H, W = rgb.shape[-2:]
    red, green, blue, _ = bayer_masks(cfg, H, W)
    return np.where(red, rgb[0], np.where(green, rgb[1], rgb[2]))


def smooth_rgb(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3.0)
    return np.moveaxis(img, -1, 0)


class TestConfig:
    def test_defaults_match_reference(self):
        cfg = load_isp_config({"CameraIsp": {}})
        assert cfg.bits_per_pixel == 8
        assert cfg.bayer_pattern == "GBRG"
        assert cfg.white_balance_gain == (1.0, 1.0, 1.0)
        assert cfg.noise_core == 1000.0

    def test_json_roundtrip(self):
        cfg = IspConfig(
            black_level=(10.0, 12.0, 14.0),
            white_balance_gain=(1.2, 1.0, 1.6),
            bayer_pattern="RGGB",
            saturation=1.1,
        )
        cfg2 = load_isp_config(cfg.to_json())
        assert cfg2.black_level == cfg.black_level
        assert cfg2.white_balance_gain == cfg.white_balance_gain
        assert cfg2.bayer_pattern == "RGGB"

    def test_stuck_pixel_radius_doubled_on_parse(self):
        # CameraIsp.h:517 doubles the configured radius
        cfg = load_isp_config({"CameraIsp": {"stuckPixelRadius": 3}})
        assert cfg.stuck_pixel_radius == 6


class TestToneCurve:
    def test_identity_config_is_linear(self):
        lut = build_tone_curve_lut(IspConfig())
        x = np.linspace(0, 1, 4096)
        # gamma 1, no boosts, contrast 1 -> identity
        np.testing.assert_allclose(lut[:, 0], x, atol=2e-3)

    def test_gamma_applied(self):
        lut = build_tone_curve_lut(IspConfig(gamma=(0.4545, 0.4545, 0.4545)))
        x = np.linspace(0, 1, 4096)
        np.testing.assert_allclose(lut[:, 1], x**0.4545, atol=5e-3)

    def test_contrast_rotates_curve(self):
        lut = build_tone_curve_lut(IspConfig(contrast=1.5))
        # steeper slope through the middle, clipped at the ends
        assert lut[0, 0] == 0.0
        assert lut[-1, 0] == 1.0
        mid_slope = (lut[2300, 0] - lut[1796, 0]) / ((2300 - 1796) / 4095)
        assert mid_slope > 1.2


class TestCompositeCCM:
    def test_identity(self):
        ccm = build_composite_ccm(IspConfig())
        # the reference's yuv2rgb/rgb2yuv constants are not exact inverses
        np.testing.assert_allclose(ccm / 4095.0, np.eye(3), atol=1e-4)

    def test_saturation_zero_is_luma_only(self):
        ccm = build_composite_ccm(IspConfig(saturation=0.0)) / 4095.0
        # all rows collapse to the BT.601 luma weights
        for row in ccm:
            np.testing.assert_allclose(row, [0.299, 0.587, 0.114], atol=1e-4)


class TestVignette:
    def test_constant_rolloff_is_unit(self):
        vh, vv = build_vignette_gains(IspConfig(), 64, 128)
        np.testing.assert_allclose(vh, 1.0)
        np.testing.assert_allclose(vv, 1.0)

    def test_bezier_rolloff_monotone(self):
        cfg = IspConfig(
            vignette_rolloff_h=((1.5, 1.5, 1.5), (1.0, 1.0, 1.0), (1.5, 1.5, 1.5))
        )
        vh, _ = build_vignette_gains(cfg, 64, 128)
        # gain ~1.5 at x=0 decreasing toward the middle of the bezier span
        assert vh[0, 0] == pytest.approx(1.5, abs=1e-5)
        assert vh[64, 0] < vh[0, 0]


@pytest.mark.parametrize("pattern", ["RGGB", "GRBG", "GBRG", "BGGR"])
class TestDemosaic:
    def test_reconstructs_smooth_image(self, pattern):
        cfg = IspConfig(bayer_pattern=pattern)
        rgb = smooth_rgb(64, 64, seed=3)
        raw = mosaic(rgb, cfg)
        out = np.asarray(isp_process(jnp.asarray(raw), cfg))
        err = np.abs(out[:, 8:-8, 8:-8] - rgb[:, 8:-8, 8:-8])
        assert err.mean() < 0.01, f"{pattern}: mean err {err.mean():.4f}"

    def test_bilinear_reconstructs(self, pattern):
        cfg = IspConfig(bayer_pattern=pattern, demosaic_filter="bilinear")
        rgb = smooth_rgb(64, 64, seed=4)
        raw = mosaic(rgb, cfg)
        out = np.asarray(isp_process(jnp.asarray(raw), cfg))
        err = np.abs(out[:, 8:-8, 8:-8] - rgb[:, 8:-8, 8:-8])
        assert err.mean() < 0.01


class TestPipelineStages:
    def test_black_level_white_balance(self):
        cfg = IspConfig(
            bayer_pattern="RGGB",
            black_level=(25.5, 0.0, 0.0),  # 0.1 of 255
            white_balance_gain=(2.0, 1.0, 1.0),
        )
        # uniform gray mosaic
        rgb = np.full((3, 32, 32), 0.5, np.float32)
        raw = mosaic(rgb, cfg)
        out = np.asarray(isp_process(jnp.asarray(raw), cfg))
        # red: (0.5 - 0.1) / 0.9 * 2 = 0.888...; green/blue: 0.5
        assert abs(out[0, 16, 16] - 0.8888) < 0.01
        assert abs(out[1, 16, 16] - 0.5) < 0.01

    def test_clamp_stretch(self):
        cfg = IspConfig(clamp_min=(0.25, 0.25, 0.25), clamp_max=(0.75, 0.75, 0.75))
        rgb = np.full((3, 32, 32), 0.5, np.float32)
        raw = mosaic(rgb, cfg)
        out = np.asarray(isp_process(jnp.asarray(raw), cfg))
        np.testing.assert_allclose(out[:, 8:-8, 8:-8], 0.5, atol=0.01)

    def test_full_pipeline_with_vignette_correction(self):
        # apply a synthetic vignette to the raw, configure the inverse
        # rolloff, expect flat output
        cfg = IspConfig(
            bayer_pattern="GBRG",
            vignette_rolloff_h=((1.3, 1.3, 1.3), (1.0, 1.0, 1.0), (1.3, 1.3, 1.3)),
        )
        H, W = 48, 64
        vh, vv = build_vignette_gains(cfg, H, W)
        rgb = np.full((3, H, W), 0.6, np.float32)
        raw = mosaic(rgb, cfg)
        raw_vignetted = raw / (vh[None, :, 0] * vv[:, None, 0])
        out = np.asarray(isp_process(jnp.asarray(raw_vignetted), cfg))
        np.testing.assert_allclose(out[:, 6:-6, 6:-6], 0.6, atol=0.02)

    def test_batched(self):
        cfg = IspConfig()
        rgb = smooth_rgb(32, 32, seed=5)
        raw = mosaic(rgb, cfg)
        batch = jnp.stack([jnp.asarray(raw)] * 3)
        out = np.asarray(isp_process(batch, cfg))
        assert out.shape == (3, 3, 32, 32)
        np.testing.assert_allclose(out[0], out[2])

    def test_stuck_pixel_removal(self):
        cfg = IspConfig(
            stuck_pixel_threshold=1,
            stuck_pixel_darkness_threshold=0.25,
        )
        cfg = load_isp_config(
            {
                "CameraIsp": {
                    "stuckPixelThreshold": 1,
                    "stuckPixelDarknessThreshold": 0.25,
                    "stuckPixelRadius": 1,
                }
            }
        )
        raw = np.full((32, 32), 0.05, np.float32)
        raw[16, 16] = 0.9  # hot pixel in a dark region
        out = np.asarray(isp_process(jnp.asarray(raw), cfg))
        # after demosaic the hot pixel must be gone (replaced by median)
        assert out.max() < 0.2


class TestRawConversion:
    def test_8bit_replication(self):
        buf = bytes(range(8)) * 8
        out = convert_8bit_frame(buf, 8, 8)
        assert out[0, 1] == 0x101
        assert out[0, 7] == 7 * 0x101

    def test_12bit_roundtrip(self):
        rng = np.random.default_rng(6)
        vals = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
        packed = pack_12bit_frame(vals)
        out = convert_12bit_frame(packed, 32, 16)
        expect = (vals << 4) | (vals >> 8)
        np.testing.assert_array_equal(out, expect)


class TestFootage:
    def test_write_read_roundtrip(self, tmp_path):
        rng = np.random.default_rng(7)
        W = H = 16
        serials = [111, 222]
        frames = []
        for _ in range(3):
            frames.append(
                [pack_12bit_frame(rng.integers(0, 4096, (H, W), dtype=np.uint16)) for _ in serials]
            )
        path = str(tmp_path / "vid.bin")
        write_footage_file(path, frames, W, H, 12, serials)
        reader = BinaryFootageReader(path)
        assert reader.num_cameras == 2
        assert reader.num_frames == 3
        assert reader.metadata.width == W
        assert reader.get_serial(0, 0) == 111
        assert reader.get_serial(2, 1) == 222
        raw = reader.get_raw_uint16(1, 0)
        assert raw.shape == (H, W)

    def test_bad_magic_rejected(self, tmp_path):
        path = str(tmp_path / "bad.bin")
        with open(path, "wb") as f:
            f.write(b"\0" * 8192)
        with pytest.raises(ValueError, match="magic"):
            BinaryFootageReader(path)


class TestResizeInput:
    def test_binned_pipeline_preserves_colors(self):
        cfg = IspConfig(bayer_pattern="GBRG")
        # constant color scene: R=0.8, G=0.5, B=0.2
        rgb = np.zeros((3, 64, 64), np.float32)
        rgb[0], rgb[1], rgb[2] = 0.8, 0.5, 0.2
        raw = mosaic(rgb, cfg)
        import jax.numpy as jnp

        out = np.asarray(isp_process(jnp.asarray(raw), cfg, resize=2))
        assert out.shape == (3, 32, 32)
        np.testing.assert_allclose(out[0, 4:-4, 4:-4], 0.8, atol=0.02)
        np.testing.assert_allclose(out[1, 4:-4, 4:-4], 0.5, atol=0.02)
        np.testing.assert_allclose(out[2, 4:-4, 4:-4], 0.2, atol=0.02)

    def test_binned_matches_full_on_smooth_scene(self):
        import jax.numpy as jnp

        cfg = IspConfig()
        rgb = smooth_rgb(64, 64, seed=11)
        raw = mosaic(rgb, cfg)
        full = np.asarray(isp_process(jnp.asarray(raw), cfg))
        binned = np.asarray(isp_process(jnp.asarray(raw), cfg, resize=2))
        # downsample the full-res output for comparison
        ref = full.reshape(3, 32, 2, 32, 2).mean(axis=(2, 4))
        assert np.abs(binned[:, 4:-4, 4:-4] - ref[:, 4:-4, 4:-4]).mean() < 0.02


class TestCompanding:
    def test_piecewise_linearization(self):
        from surround360_tpu.isp.pipeline import apply_companding

        cfg = IspConfig(
            companding_lut=((0.0, 0.0, 0.0), (0.5, 0.25, 0.25), (1.0, 1.0, 1.0))
        )
        raw = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
        out = np.asarray(apply_companding(raw, cfg))
        np.testing.assert_allclose(out, [0.0, 0.125, 0.25, 0.625, 1.0], atol=1e-6)

    def test_identity_lut(self):
        from surround360_tpu.isp.pipeline import apply_companding

        raw = jnp.asarray(np.linspace(0, 1, 16), jnp.float32)
        out = np.asarray(apply_companding(raw, IspConfig()))
        np.testing.assert_allclose(out, np.asarray(raw), atol=1e-6)


class TestFrequencyDemosaic:
    def test_reconstructs_smooth_image(self):
        cfg = IspConfig(demosaic_filter="frequency")
        rgb = smooth_rgb(64, 64, seed=12)
        raw = mosaic(rgb, cfg)
        out = np.asarray(isp_process(jnp.asarray(raw), cfg))
        # the frequency path's fixed gains are tuned for real sensor data;
        # require structural reconstruction (high correlation), not parity
        inner = slice(8, -8)
        for c in range(3):
            corr = np.corrcoef(
                out[c, inner, inner].ravel(), rgb[c, inner, inner].ravel()
            )[0, 1]
            assert corr > 0.7, (c, corr)
