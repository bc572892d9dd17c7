"""Independent scalar oracle for the ISP chain.

Transliterated per-pixel from the REFERENCE spec (CameraIsp.h), not from
the production JAX code, so a shared convention bug between the pipeline
and its tests cannot hide: executePipeline stage order (CameraIsp.h:
1262-1272), blackLevelAdjust (:1106-1126), antiVignette (:1145-1154) with
the direct De Casteljau BezierCurve (MathUtil.h:187-216) sampled at
coord/maxDimension (:709-715), whiteBalance (:1005-1021), clampAndStretch
(:1128-1143), demosaicBilinearFilter (:89-148), colorCorrect with the
composite CCM (:671-689) and buildToneCurveLut (:361-427).

Deliberately slow scalar loops; use tiny images.
"""

from __future__ import annotations

import numpy as np

TONE_LUT_SIZE = 4096


def _clamp(v, lo, hi):
    return min(max(v, lo), hi)


def _lerp(a, b, t):
    return a * (1.0 - t) + b * t


def _bezier_decasteljau(points, t):
    """MathUtil.h:208-215 recursive De Casteljau over any point count."""
    pts = [np.asarray(p, np.float64) for p in points]
    while len(pts) > 1:
        pts = [_lerp(pts[i], pts[i + 1], t) for i in range(len(pts) - 1)]
    return pts[0]


def _bezier4(a, b, c, d, t):
    """CameraIsp.h:361-373 four-point De Casteljau."""
    return _lerp(
        _lerp(_lerp(a, b, t), _lerp(b, c, t), t),
        _lerp(_lerp(b, c, t), _lerp(c, d, t), t),
        t,
    )


def _low_key(boost, x):
    a, b, c, d = 0.0, _clamp(0.1666 + boost, 0.0, 1.0), 0.3333, 0.5
    return _bezier4(a, b, c, d, x * 2.0) if x <= 0.5 else 0.0


def _high_key(boost, x):
    a, b, c, d = 0.5, 0.6666, _clamp(0.8333 + boost, 0.0, 1.0), 1.0
    return _bezier4(a, b, c, d, (x - 0.5) * 2.0) if x > 0.5 else 0.0


_RGB2YUV = np.array(
    [[0.299, 0.587, 0.114],
     [-0.14713, -0.28886, 0.436],
     [0.615, -0.51499, -0.10001]], np.float64,
)
_YUV2RGB = np.array(
    [[1.0, 0.0, 1.13983],
     [1.0, -0.39465, -0.58060],
     [1.0, 2.03211, 0.0]], np.float64,
)

_BAYER = {
    "RGGB": ([[1, 0], [0, 0]], [[0, 1], [1, 0]]),
    "GRBG": ([[0, 1], [0, 0]], [[1, 0], [0, 1]]),
    "GBRG": ([[0, 0], [1, 0]], [[1, 0], [0, 1]]),
    "BGGR": ([[0, 0], [0, 1]], [[0, 1], [1, 0]]),
}


def oracle_isp(raw, cfg):
    """raw (H, W) float in [0,1]; cfg: surround360_tpu IspConfig with
    demosaic_filter='bilinear', stuck_pixel_radius=0, sharpening=0.
    Returns (3, H, W) float32, matching CameraIsp.getImage / range."""
    H, W = raw.shape
    red_t, green_t = _BAYER[cfg.bayer_pattern]

    def red(i, j):
        return bool(red_t[i % 2][j % 2])

    def green(i, j):
        return bool(green_t[i % 2][j % 2])

    def channel(i, j):
        return 0 if red(i, j) else (1 if green(i, j) else 2)

    x = raw.astype(np.float64).copy()

    # blackLevelAdjust (CameraIsp.h:1106-1126)
    bl = [v / float(cfg.max_pixel_value) for v in cfg.black_level]
    sc = [1.0 / (1.0 - b) for b in bl]
    for i in range(H):
        for j in range(W):
            if x[i, j] < 1.0:
                c = channel(i, j)
                x[i, j] = (x[i, j] - bl[c]) * sc[c]

    # antiVignette (CameraIsp.h:1145-1154), curves at coord/maxDimension
    max_dim = max(H, W)
    vH = np.stack(
        [_bezier_decasteljau(cfg.vignette_rolloff_h, j / max_dim)
         for j in range(W)]
    )
    vV = np.stack(
        [_bezier_decasteljau(cfg.vignette_rolloff_v, i / max_dim)
         for i in range(H)]
    )
    for i in range(H):
        for j in range(W):
            c = channel(i, j)
            x[i, j] *= vH[j][c] * vV[i][c]

    # whiteBalance with clamp (CameraIsp.h:1005-1021)
    for i in range(H):
        for j in range(W):
            x[i, j] = _clamp(
                x[i, j] * cfg.white_balance_gain[channel(i, j)], 0.0, 1.0
            )

    # clampAndStretch (CameraIsp.h:1128-1143)
    for i in range(H):
        for j in range(W):
            c = channel(i, j)
            v = _clamp(x[i, j], cfg.clamp_min[c], cfg.clamp_max[c])
            x[i, j] = (v - cfg.clamp_min[c]) / (
                cfg.clamp_max[c] - cfg.clamp_min[c]
            )

    # demosaic: plane split + demosaicBilinearFilter (CameraIsp.h:89-148)
    r = np.zeros((H, W))
    g = np.zeros((H, W))
    b = np.zeros((H, W))
    for i in range(H):
        for j in range(W):
            c = channel(i, j)
            (r if c == 0 else g if c == 1 else b)[i, j] = x[i, j]

    def reflect(i, n):
        # util reflect(): mirror at borders
        if i < 0:
            return -i
        if i >= n:
            return 2 * n - i - 2
        return i

    ro, go, bo = r.copy(), g.copy(), b.copy()
    for i in range(H):
        i_1, i1 = reflect(i - 1, H), reflect(i + 1, H)
        red_green_row = (red(i, 0) and green(i, 1)) or (
            red(i, 1) and green(i, 0)
        )
        for j in range(W):
            j_1, j1 = reflect(j - 1, W), reflect(j + 1, W)
            if red(i, j):
                go[i, j] = (g[i_1, j] + g[i1, j] + g[i, j_1] + g[i, j1]) / 4.0
                bo[i, j] = (
                    b[i_1, j_1] + b[i1, j_1] + b[i_1, j1] + b[i1, j1]
                ) / 4.0
            elif green(i, j):
                if red_green_row:
                    bo[i, j] = (b[i_1, j] + b[i1, j]) / 2.0
                    ro[i, j] = (r[i, j_1] + r[i, j1]) / 2.0
                else:
                    ro[i, j] = (r[i_1, j] + r[i1, j]) / 2.0
                    bo[i, j] = (b[i, j_1] + b[i, j1]) / 2.0
            else:
                go[i, j] = (g[i_1, j] + g[i1, j] + g[i, j_1] + g[i, j1]) / 4.0
                ro[i, j] = (
                    r[i_1, j_1] + r[i1, j_1] + r[i_1, j1] + r[i1, j1]
                ) / 4.0

    # composite CCM (CameraIsp.h:671-689): ccm^T * (yuv2rgb*sat*rgb2yuv),
    # scaled by the LUT range
    sat = np.diag([1.0, cfg.saturation, cfg.saturation])
    sat_m = _YUV2RGB @ sat @ _RGB2YUV
    comp = np.asarray(cfg.ccm, np.float64).T @ sat_m
    comp = comp * (TONE_LUT_SIZE - 1)

    # buildToneCurveLut (CameraIsp.h:390-427), range collapses to 1.0
    slope = np.tan(np.pi * 0.25 * cfg.contrast)
    bias = 0.5 * (1.0 - slope)
    lut = np.zeros((TONE_LUT_SIZE, 3))
    for i in range(TONE_LUT_SIZE):
        t = i / (TONE_LUT_SIZE - 1.0)
        for c in range(3):
            v = t ** cfg.gamma[c]
            v = _low_key(cfg.low_key_boost[c], v) + _high_key(
                cfg.high_key_boost[c], v
            )
            lut[i, c] = _clamp(slope * v + bias, 0.0, 1.0)

    # colorCorrect (CameraIsp.h:1214-1242): integer LUT index
    out = np.zeros((3, H, W), np.float32)
    for i in range(H):
        for j in range(W):
            p = np.array([ro[i, j], go[i, j], bo[i, j]])
            for c in range(3):
                idx = int(
                    _clamp(float(comp[c] @ p), 0.0, TONE_LUT_SIZE - 1.0)
                )
                out[c, i, j] = lut[idx, c]
    return out
