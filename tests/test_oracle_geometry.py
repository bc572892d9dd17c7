"""Independent scalar oracles for the renderer geometry.

Transliterated loop-for-loop from the reference spec:
- bicubicRemapToSpherical's warp field (ImageWarper.cpp:143-174),
- projectSphericalCamImages' strip geometry + per-camera angles
  (TestRenderStereoPanorama.cpp:138-175),
- the lazy novel-view buffer (renderStereoPanoramaChunksThread,
  TestRenderStereoPanorama.cpp:259-292).

The camera projection itself (camera.pixel) is validated separately by
the ported reference unit test (tests/test_camera.py); these oracles pin
the ANGLE/OFFSET conventions built on top of it, which the round-1
simulator derived circularly from the renderer's own context."""

import numpy as np

from surround360_tpu.geometry import camera as cam_mod
from surround360_tpu.geometry.rig import make_ring_rig
from surround360_tpu.ops.warp import rig_fov, side_cam_spherical_warp
from surround360_tpu.views.novel_view import lazy_warp_columns


def _oracle_spherical_warp(cam, out_hw, left, right, top, bottom):
    """ImageWarper.cpp:152-167, scalar per-pixel."""
    H, W = out_hw
    warp = np.zeros((2, H, W), np.float64)
    for x in range(W):
        xfrac = (x + 0.5) / W
        xang = (1.0 - xfrac) * left + xfrac * right
        for y in range(H):
            yfrac = (y + 0.5) / H
            yang = (1.0 - yfrac) * top + yfrac * bottom
            unit = np.array(
                [
                    np.cos(yang) * np.cos(xang),
                    np.cos(yang) * np.sin(xang),
                    np.sin(yang),
                ]
            )
            pix = cam_mod.world_to_pixel(
                cam, unit * int(cam_mod.NEAR_INFINITY)
            )
            warp[0, y, x] = pix[0] - 0.5
            warp[1, y, x] = pix[1] - 0.5
    return warp


def test_side_warp_matches_scalar_oracle():
    rig = make_ring_rig().rescaled(0.0625)
    sides = rig.side_cameras
    n = rig.side_camera_count
    eqr_w, eqr_h = 140, 70
    h_rad = 2.0 * rig_fov(sides, False)
    v_rad = 2.0 * rig_fov(sides, True)
    # strip size per projectSphericalCamImages
    # (TestRenderStereoPanorama.cpp:151-153)
    strip_h = int(eqr_h * v_rad / np.pi)
    strip_w = int(eqr_w * h_rad / (2.0 * np.pi))

    for idx in (0, 3, n - 1):
        cam = sides[idx]
        warp, (sh, sw) = side_cam_spherical_warp(
            cam, idx, n, (eqr_w, eqr_h), h_rad, v_rad
        )
        assert (sh, sw) == (strip_h, strip_w)
        # camera i is centered at -i/n * 2pi; angles sweep +-hRad/2, +-vRad/2
        # (TestRenderStereoPanorama.cpp:155-170)
        direction = -float(idx) / n * 2.0 * np.pi
        ref = _oracle_spherical_warp(
            cam,
            (strip_h, strip_w),
            direction + h_rad / 2.0,
            direction - h_rad / 2.0,
            v_rad / 2.0,
            -v_rad / 2.0,
        )
        # valid (in-image) coords must agree to sub-millipixel; far
        # off-image sentinels may differ in magnitude only
        res = np.asarray(cam.resolution, np.float64)
        valid = (
            (ref[0] > -1) & (ref[0] < res[0]) & (ref[1] > -1) & (ref[1] < res[1])
        )
        assert valid.mean() > 0.3, "oracle warp sees too little of the image"
        np.testing.assert_allclose(
            warp[0][valid], ref[0][valid], atol=2e-3
        )
        np.testing.assert_allclose(
            warp[1][valid], ref[1][valid], atol=2e-3
        )


def test_lazy_warp_columns_match_reference_buffer():
    """renderStereoPanoramaChunksThread fills warpL/warpR with
    x = camW/2 - (numNovelViews - nv) +- verge and t = nv/numNovelViews
    (TestRenderStereoPanorama.cpp:273-285)."""
    chunk_w, cam_w, verge = 72, 217, 3.7
    for eye, sign in (("left", +1.0), ("right", -1.0)):
        warp_x, t = lazy_warp_columns(chunk_w, cam_w, verge, eye)
        for nv in range(chunk_w):
            shift = nv / chunk_w
            slab = cam_w * 0.5 - (chunk_w - nv)
            assert abs(warp_x[nv] - (slab + sign * verge)) < 1e-4, (eye, nv)
            assert abs(t[nv] - shift) < 1e-6, (eye, nv)
