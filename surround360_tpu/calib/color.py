"""Color calibration: MacBeth chart -> ISP parameters (black level, white
balance, CCM) + DeltaE quality report.

Rebuild of surround360_render/source/calibration/ColorCalibration.{h,cpp}
with the Ceres joint solve replaced by a dense JAX Levenberg-Marquardt (the
problem is tiny: <= 21 free parameters, 24 x 3 residuals):

  minimize sum_i || Lab_gt_i - Lab(M (s_i * RGB_i - BL) / (1 - BL)) ||^2

where the per-patch illumination s_i is a separable order-4 x order-4
Bezier surface over the chart (IspFunctor, ColorCalibration.cpp:78-165),
black level is boxed to [0, 1], and the first Bezier control points are
locked at 1 (ColorCalibration.cpp:1276-1286). The solved 3x3 M is
decomposed into whiteBalanceGain + row-normalized CCM exactly as the
reference does (ColorCalibration.cpp:1312-1340: WB from M^-1 * ones,
scaled to the most sensitive channel; CCM rows normalized to sum 1).

Chart *detection* is classic CV and runs host-side on OpenCV
(detect_color_chart), stage-for-stage after detectColorChart
(ColorCalibration.cpp:504-917): adaptive threshold, cross-element gap
closing, small-object removal, dilation, per-component contour
straightening, convex-quad filtering, nearest-neighbor outlier rejection
and top-line row sorting.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LAB_MACBETH",
    "rgb_to_lab",
    "solve_isp_color_params",
    "delta_e_report",
    "detect_color_chart",
]

# MacBeth ColorChecker Lab references (Danny Pascale / BabelColor 2006),
# as used in ColorCalibration.h:42-94
LAB_MACBETH = {
    "D50": np.array(
        [
            [37.99, 13.56, 14.06], [65.71, 18.13, 17.81],
            [49.93, -4.88, -21.93], [43.14, -13.10, 21.91],
            [55.11, 8.84, -25.40], [70.72, -33.40, -0.199],
            [62.66, 36.07, 57.10], [40.02, 10.41, -45.96],
            [51.12, 48.24, 16.25], [30.33, 22.98, -21.59],
            [72.53, -23.71, 57.26], [71.94, 19.36, 67.86],
            [28.78, 14.18, -50.30], [55.26, -38.34, 31.37],
            [42.10, 53.38, 28.19], [81.73, 4.04, 79.82],
            [51.94, 49.99, -14.57], [51.04, -28.63, -28.64],
            [96.54, -0.425, 1.186], [81.26, -0.638, -0.335],
            [66.77, -0.734, -0.504], [50.87, -0.153, -0.270],
            [35.66, -0.421, -1.231], [20.46, -0.079, -0.973],
        ]
    ),
    "D65": np.array(
        [
            [37.85, 12.72, 14.07], [65.43, 17.18, 17.21],
            [50.15, -1.91, -21.79], [43.17, -15.08, 22.44],
            [55.40, 11.58, -25.06], [70.92, -33.22, 0.29],
            [62.06, 33.37, 56.24], [40.59, 16.15, -45.14],
            [50.58, 47.55, 15.17], [30.51, 25.11, -21.74],
            [72.31, -27.84, 57.83], [71.43, 15.50, 67.80],
            [29.46, 20.74, -49.34], [55.26, -41.23, 32.03],
            [41.53, 52.67, 26.92], [81.08, -0.33, 80.10],
            [51.74, 51.26, -15.48], [52.41, -18.46, -26.64],
            [96.49, -0.35, 0.96], [81.17, -0.69, -0.24],
            [66.84, -0.71, -0.25], [50.86, 0.20, -0.55],
            [35.61, -0.36, -1.44], [20.40, 0.47, -1.27],
        ]
    ),
}

_WHITE = {
    "D50": np.array([0.96422, 1.00000, 0.82521]),
    "D65": np.array([0.95047, 1.00000, 1.08883]),
}
_RGB2XYZ = {
    "D50": np.array(
        [
            [0.4360747, 0.3850649, 0.1430804],
            [0.2225045, 0.7168786, 0.0606169],
            [0.0139322, 0.0971045, 0.7141733],
        ]
    ),
    "D65": np.array(
        [
            [0.4124564, 0.3575761, 0.1804375],
            [0.2126729, 0.7151522, 0.0721750],
            [0.0193339, 0.1191920, 0.9503041],
        ]
    ),
}


def rgb_to_lab(rgb, illuminant: str = "D50", xp=jnp):
    """Linear RGB (..., 3) -> CIELAB via the Bradford-adapted matrices
    (ColorspaceConversion.h:57-101)."""
    m = xp.asarray(_RGB2XYZ[illuminant] / _WHITE[illuminant][:, None])
    xyz = xp.stack(
        [xp.sum(m[i] * rgb, axis=-1) for i in range(3)], axis=-1
    )

    def p_curve(t):
        return xp.where(
            t > 0.008856, xp.cbrt(xp.maximum(t, 1e-12)), 7.787 * t + 16.0 / 116.0
        )

    f = p_curve(xyz)
    L = 116.0 * f[..., 1] - 16.0
    A = 500.0 * (f[..., 0] - f[..., 1])
    B = 200.0 * (f[..., 1] - f[..., 2])
    return xp.stack([L, A, B], axis=-1)


def _bezier_1d(ctrl, t):
    pts = [ctrl[i] for i in range(ctrl.shape[0])]
    while len(pts) > 1:
        pts = [pts[i] + t * (pts[i + 1] - pts[i]) for i in range(len(pts) - 1)]
    return pts[0]


@dataclass
class ColorCalibrationResult:
    black_level: np.ndarray  # (3,) in [0,1]
    white_balance: np.ndarray  # (3,)
    ccm: np.ndarray  # (3,3), rows sum to 1
    illumination_bezier_x: np.ndarray
    illumination_bezier_y: np.ndarray
    final_cost: float


def solve_isp_color_params(
    patch_rgbs: np.ndarray,  # (P, 3) medians in [0,1], raster order
    patch_centroids: np.ndarray,  # (P, 2) pixel coords
    illuminant: str = "D50",
    black_level=None,  # (3,) locks BL when given (isBlackLevelSet)
    iterations: int = 200,
) -> ColorCalibrationResult:
    lab_ref = jnp.asarray(LAB_MACBETH[illuminant][: len(patch_rgbs)])
    rgbs = jnp.asarray(patch_rgbs)

    c = np.asarray(patch_centroids, dtype=np.float64)
    tl = c[0]
    span = c.max(axis=0) - c.min(axis=0)
    uv = (c - tl) / np.maximum(span, 1e-9)
    uv = jnp.asarray(uv)

    lock_bl = black_level is not None
    bl0 = np.zeros(3) if black_level is None else np.asarray(black_level)

    # parameter vector: [bezierX[1:5](4), bezierY[1:5](4), bl(3), M(9)]
    theta0 = np.concatenate(
        [np.ones(4), np.ones(4), bl0, np.eye(3).reshape(-1)]
    )

    def unpack(theta):
        bx = jnp.concatenate([jnp.ones(1), theta[0:4]])
        by = jnp.concatenate([jnp.ones(1), theta[4:8]])
        bl = jnp.clip(theta[8:11], 0.0, 1.0)
        M = theta[11:20].reshape(3, 3)
        return bx, by, bl, M

    def residuals(theta):
        bx, by, bl, M = unpack(theta)
        s = _bezier_1d(bx, uv[:, 0]) * _bezier_1d(by, uv[:, 1])  # (P,)
        rgb_bl = (rgbs - bl) / (1.0 - bl + 1e-16) * s[:, None]
        rgb_m = jnp.einsum("ij,pj->pi", M, rgb_bl)
        lab = rgb_to_lab(rgb_m, illuminant)
        return (lab_ref - lab).reshape(-1)

    res_jit = jax.jit(residuals)
    jac_jit = jax.jit(jax.jacfwd(residuals))

    free = np.ones(20, dtype=bool)
    if lock_bl:
        free[8:11] = False

    theta = theta0.copy()
    lam = 1e-3
    r = np.asarray(res_jit(jnp.asarray(theta)))
    cost = float(0.5 * (r @ r))
    for _ in range(iterations):
        J = np.asarray(jac_jit(jnp.asarray(theta)))[:, free]
        g = J.T @ r
        H = J.T @ J
        improved = False
        for _try in range(8):
            Hd = H + lam * np.diag(np.maximum(np.diag(H), 1e-9))
            try:
                step = np.linalg.solve(Hd, -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            new_theta = theta.copy()
            new_theta[free] += step
            new_theta[8:11] = np.clip(new_theta[8:11], 0.0, 1.0)
            new_r = np.asarray(res_jit(jnp.asarray(new_theta)))
            new_cost = float(0.5 * (new_r @ new_r))
            if new_cost < cost:
                theta, r, cost = new_theta, new_r, new_cost
                lam = max(lam / 10, 1e-12)
                improved = True
                break
            lam *= 10
        if not improved:
            break

    bx, by, bl, M = (np.asarray(v) for v in unpack(jnp.asarray(theta)))

    # decompose M into WB + row-normalized CCM (ColorCalibration.cpp:1312+)
    balanced = np.linalg.inv(M) @ np.ones(3)
    wb = balanced.max() / balanced
    ccm = M.copy()
    row_sums = (M * (1.0 / wb)[None, :]).sum(axis=1)
    # reference: CCM = M * WB^-1 then rows normalized to sum 1
    ccm = M * (1.0 / wb)[None, :]
    ccm = ccm / ccm.sum(axis=1, keepdims=True)

    return ColorCalibrationResult(
        black_level=bl,
        white_balance=wb,
        ccm=ccm,
        illumination_bezier_x=bx,
        illumination_bezier_y=by,
        final_cost=cost,
    )


def delta_e_report(
    patch_rgbs: np.ndarray, illuminant: str = "D50"
) -> dict:
    """CIE76 DeltaE per patch of corrected RGB medians vs ground truth
    (computeColorPatchErrors, ColorCalibration.cpp:1410+)."""
    lab = np.asarray(rgb_to_lab(jnp.asarray(patch_rgbs), illuminant))
    ref = LAB_MACBETH[illuminant][: len(patch_rgbs)]
    de = np.linalg.norm(lab - ref, axis=1)
    return {
        "mean": float(de.mean()),
        "median": float(np.median(de)),
        "max": float(de.max()),
        "per_patch": de.tolist(),
    }


def build_color_adjustment_model(
    target_rgba: np.ndarray,  # (4, H, W) float [0,1]
    adjust_rgba: np.ndarray,
    sample_rate: int = 100,
    alpha_threshold: float = 250.0 / 255.0,
    seed: int = 0,
) -> np.ndarray:
    """Affine color-difference model between two overlapping images
    (buildColorAdjustmentModel, CvUtil.cpp:262-310): least-squares fit of
    [1, r, g, b] -> (target - adjust) over randomly sampled pixels where
    both alphas are (nearly) opaque. Returns (4, 3) coefficients; apply as
    adjusted = adjust + features @ M."""
    rng = np.random.default_rng(seed)
    t = np.moveaxis(np.asarray(target_rgba), 0, -1).reshape(-1, 4)
    a = np.moveaxis(np.asarray(adjust_rgba), 0, -1).reshape(-1, 4)
    opaque = (t[:, 3] > alpha_threshold) & (a[:, 3] > alpha_threshold)
    sampled = opaque & (rng.integers(0, sample_rate, len(t)) == 0)
    if sampled.sum() < 8:
        sampled = opaque
    feats = np.concatenate(
        [np.ones((sampled.sum(), 1)), a[sampled, :3]], axis=1
    )
    deltas = a[sampled, :3] - t[sampled, :3]
    coef, *_ = np.linalg.lstsq(feats, deltas, rcond=None)
    return -coef  # model predicts the correction toward the target


def detect_color_chart(
    image_rgb: np.ndarray,  # (3, H, W) float [0,1]
    num_cols: int = 6,
    num_rows: int = 4,
    min_area_chart_frac: float = 5e-4,
    max_area_chart_frac: float = 0.5,
):
    """Detect MacBeth-chart patches; returns (centroids (P,2) raster order,
    rgb medians (P,3)).

    Follows detectColorChart (ColorCalibration.cpp:504-672) stage for
    stage: scale + blur -> adaptive threshold -> morphological gap fill
    (MORPH_CLOSE, cross) -> small-object removal -> dilation -> connected
    components -> per-component contours straightened with approxPolyDP
    (0.08 * arcLength) -> 4-vertex convex aspect<=2 filtering ->
    min-distance outlier rejection (removeContourOutliers, :808-840) ->
    row-by-row sort against the top-left/top-right line (sortPatches,
    :842-917) -> per-patch median color inside the contour mask.
    """
    import cv2

    hwc = np.moveaxis(np.asarray(image_rgb), 0, -1).astype(np.float32)
    H, W = hwc.shape[:2]
    grey = cv2.cvtColor(hwc, cv2.COLOR_RGB2GRAY)

    # scale to brighten + blur (ColorCalibration.cpp:515-523)
    scaled = np.clip(2.0 * grey * 255.0, 0, 255).astype(np.uint8)
    blurred = cv2.GaussianBlur(scaled, (15, 15), 0)

    # adaptive threshold (mean, block 19, C=2, inverted; :530-544)
    bw = cv2.adaptiveThreshold(
        blurred, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY_INV,
        19, 2,
    )

    num_patches = num_cols * num_rows
    min_area_chart = min_area_chart_frac * H * W
    max_area_chart = max_area_chart_frac * H * W
    min_area_patch = min_area_chart / num_patches
    max_area_patch = max_area_chart / num_patches
    # morph element radius (createMorphElement, :714-726)
    elem_frac = 10.0 * min_area_patch / (H * W)
    radius = max(1, int(elem_frac * min(H, W)))

    # fillGaps: closing with a cross element (:674-692)
    cross = cv2.getStructuringElement(
        cv2.MORPH_CROSS, (2 * radius + 1, 2 * radius + 1)
    )
    bw = cv2.morphologyEx(bw, cv2.MORPH_CLOSE, cross)

    # removeSmallObjects (< 0.3 * minAreaPatch; :728-765)
    n_lbl, labels, stats, _ = cv2.connectedComponentsWithStats(bw)
    small = stats[:, cv2.CC_STAT_AREA] < 0.3 * min_area_patch
    bw = np.where(small[labels], 0, bw).astype(np.uint8)

    # dilateGaps: rect dilation so contours stay inside patches (:694-712)
    rect = cv2.getStructuringElement(
        cv2.MORPH_RECT, (2 * radius + 1, 2 * radius + 1)
    )
    bw = cv2.dilate(bw, rect)

    # per-component contour extraction (:570-608)
    n_lbl, labels, stats, _ = cv2.connectedComponentsWithStats(bw, 8)
    contours_all = []
    for lbl in range(1, n_lbl):
        area = stats[lbl, cv2.CC_STAT_AREA]
        w = stats[lbl, cv2.CC_STAT_WIDTH]
        h = stats[lbl, cv2.CC_STAT_HEIGHT]
        if area < min_area_chart or w * h > max_area_chart:
            continue
        comp = (labels == lbl).astype(np.uint8) * 255
        conts, _ = cv2.findContours(
            comp, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
        )
        conts = [
            cv2.approxPolyDP(c, 0.08 * cv2.arcLength(c, True), True)
            for c in conts
        ]
        # the chart body yields >= patches + 1 contours (+1 = border)
        if len(conts) >= num_patches + 1:
            contours_all.extend(conts)

    # contour filtering (:610-648): 4 vertices, convex, aspect <= 2
    patches = []
    for cont in contours_all:
        if len(cont) != 4 or not cv2.isContourConvex(cont):
            continue
        box = cv2.minAreaRect(cont)
        bw_, bh_ = box[1]
        if min(bw_, bh_) <= 0:
            continue
        area = cv2.moments(cont)["m00"]
        if not (min_area_patch <= area <= max_area_patch):
            continue
        if max(bw_, bh_) / min(bw_, bh_) > 2.0:
            continue
        patches.append((np.asarray(box[0], np.float64), cont))
    if len(patches) < num_patches:
        raise ValueError(
            f"found only {len(patches)} patch candidates, need {num_patches}"
        )

    # removeContourOutliers (:808-840): drop patches whose nearest
    # neighbor is > 2x the median nearest-neighbor distance
    cents = np.stack([p[0] for p in patches])
    d = np.linalg.norm(cents[:, None] - cents[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    min_d = d.min(axis=1)
    # the reference's "median" = sorted[len/2] (ColorCalibration.cpp:829)
    keep = min_d < 2.0 * np.sort(min_d)[len(min_d) // 2]
    patches = [p for p, k in zip(patches, keep) if k]

    # sortPatches (:842-917): repeatedly take the num_cols centroids
    # closest to the line through the current top-left / top-right
    # patches, sort each row by x
    remaining = list(range(len(patches)))
    cents = np.stack([p[0] for p in patches])
    order = []
    while remaining:
        pts = cents[remaining]
        tl = remaining[int(np.argmin(np.linalg.norm(pts - [0, 0], axis=1)))]
        tr = remaining[int(np.argmin(np.linalg.norm(pts - [W, 0], axis=1)))]
        p1, p2 = cents[tl], cents[tr]
        seg = p2 - p1
        nrm = np.linalg.norm(seg)
        if nrm < 1e-6:
            dists = np.abs(pts[:, 1] - p1[1])
        else:
            rel = pts - p1
            dists = np.abs(seg[0] * rel[:, 1] - seg[1] * rel[:, 0]) / nrm
        idx = np.argsort(dists, kind="stable")[: num_cols]
        row = sorted((remaining[i] for i in idx), key=lambda i: cents[i][0])
        order.extend(row)
        remaining = [i for i in remaining if i not in row]

    centroids, medians = [], []
    for i in order:
        c, cont = patches[i]
        mask = np.zeros((H, W), np.uint8)
        cv2.drawContours(mask, [cont], -1, 255, cv2.FILLED)
        # erode so the median ignores boundary mixing (getClosestPatchTo
        # samples inside the mask)
        mask = cv2.erode(mask, np.ones((3, 3), np.uint8))
        sel = mask > 0
        if sel.sum() < 4:
            sel = cv2.dilate(mask, np.ones((3, 3), np.uint8)) > 0
        centroids.append(c)
        medians.append(np.median(hwc[sel].reshape(-1, 3), axis=0))
    return np.asarray(centroids), np.asarray(medians)
