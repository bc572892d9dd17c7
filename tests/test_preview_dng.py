"""Preview renderer + DNG writer tests."""

import struct

import numpy as np

from surround360_tpu.capture import render_camera_views
from surround360_tpu.geometry.rig import make_ring_rig
from surround360_tpu.isp.dng import write_dng
from surround360_tpu.isp.pipeline import IspConfig, bayer_masks
from surround360_tpu.render.preview import PreviewRenderer, simple_demosaic


class TestSimpleDemosaic:
    def test_gbrg_block_layout(self):
        import jax.numpy as jnp

        raw = np.zeros((4, 4), np.float32)
        # GBRG 2x2 tile: (0,0)=G1 (0,1)=B (1,0)=R (1,1)=G2
        raw[0::2, 0::2] = 0.4  # G1
        raw[0::2, 1::2] = 0.2  # B
        raw[1::2, 0::2] = 0.6  # R
        raw[1::2, 1::2] = 0.8  # G2
        rgb = np.asarray(simple_demosaic(jnp.asarray(raw), gamma=1.0))
        assert rgb.shape == (3, 2, 2)
        np.testing.assert_allclose(rgb[0], 0.6, atol=1e-6)  # R
        np.testing.assert_allclose(rgb[1], 0.6, atol=1e-6)  # G avg
        np.testing.assert_allclose(rgb[2], 0.2, atol=1e-6)  # B

    def test_gamma(self):
        import jax.numpy as jnp

        raw = np.full((4, 4), 0.25, np.float32)
        rgb = np.asarray(simple_demosaic(jnp.asarray(raw), gamma=0.5))
        np.testing.assert_allclose(rgb, 0.5, atol=1e-6)


class TestPreviewRenderer:
    def test_renders_sphere_from_three_fisheyes(self):
        rig = make_ring_rig().rescaled(0.125)  # 256px cams
        views = render_camera_views(rig)
        cfg = IspConfig(bayer_pattern="GBRG")
        H, W = views[0].shape[-2:]
        red, green, blue, _ = bayer_masks(cfg, H, W)

        def mosaic(v):
            # inverse of gamma 0.4545 so the preview's gamma restores it
            lin = np.where(red, v[0], np.where(green, v[1], v[2])) ** (1 / 0.4545)
            return lin.astype(np.float32)

        pr = PreviewRenderer(rig, eqr_width=256, eqr_height=128)
        out = np.asarray(
            pr.render(
                mosaic(views[rig.top_camera_index]),
                mosaic(views[rig.bottom_camera_index]),
                mosaic(views[rig.bottom_camera2_index]),
            )
        )
        assert out.shape == (3, 128, 256)
        assert np.isfinite(out).all()
        # poles covered by top/bottom cameras: compare against environment
        from surround360_tpu.capture import checker_sinusoid_environment

        ys = [8, 120]
        for y in ys:
            phi = np.pi * (y + 0.5) / 128.0
            errs = []
            for x in range(0, 256, 16):
                theta = 2.0 * np.pi * (1.0 - (x + 0.5) / 256.0)
                d = np.array(
                    [
                        np.sin(phi) * np.cos(theta),
                        np.sin(phi) * np.sin(theta),
                        np.cos(phi),
                    ]
                )
                expect = checker_sinusoid_environment(d)
                errs.append(np.abs(out[:, y, x] - expect).mean())
            assert np.mean(errs) < 0.1, (y, np.mean(errs))


class TestDng:
    def test_structure_and_pixels(self, tmp_path):
        raw = np.random.default_rng(1).integers(0, 65535, (32, 48)).astype(
            np.uint16
        )
        path = str(tmp_path / "x.dng")
        write_dng(path, raw, "GBRG", ccm=np.eye(3), white_balance=(1.3, 1.0, 1.7))
        d = open(path, "rb").read()
        assert d[:4] == b"II*\0"
        (n,) = struct.unpack("<H", d[8:10])
        tags = {}
        off = 10
        for _ in range(n):
            tag, typ, cnt = struct.unpack("<HHI", d[off : off + 8])
            tags[tag] = (typ, cnt, d[off + 8 : off + 12])
            off += 12
        # required DNG tags present
        for required in (256, 257, 262, 33422, 50706, 50721, 50728):
            assert required in tags, required
        assert struct.unpack("<I", tags[256][2])[0] == 48
        assert struct.unpack("<I", tags[257][2])[0] == 32
        assert struct.unpack("<HH", tags[262][2])[0] == 32803  # CFA
        assert tags[33422][2] == bytes([1, 2, 0, 1])  # GBRG plane codes
        # pixel strip round trip
        strip_off = struct.unpack("<I", tags[273][2])[0]
        strip_len = struct.unpack("<I", tags[279][2])[0]
        pixels = np.frombuffer(
            d[strip_off : strip_off + strip_len], dtype="<u2"
        ).reshape(32, 48)
        np.testing.assert_array_equal(pixels, raw)
