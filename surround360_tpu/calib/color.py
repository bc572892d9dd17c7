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
(detect_color_chart), a simplified but robust version of
detectColorChart (ColorCalibration.cpp:504-917).
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
    min_area_frac: float = 2e-5,
    max_area_frac: float = 2e-2,
):
    """Detect MacBeth-chart patches; returns (centroids (P,2) raster order,
    rgb medians (P,3)). Simplified detectColorChart
    (ColorCalibration.cpp:504-917): adaptive threshold -> contour
    extraction -> squarish-blob filtering -> size-consistency outlier
    rejection -> raster sort -> per-patch median."""
    import cv2

    hwc = np.moveaxis(np.asarray(image_rgb), 0, -1)
    grey = (cv2.cvtColor(hwc.astype(np.float32), cv2.COLOR_RGB2GRAY) * 255).astype(
        np.uint8
    )
    H, W = grey.shape
    # polarity-independent region extraction: patches are uniform regions
    # bounded by edges, whatever their brightness relative to the surround
    # (robustness goal of the reference's fillGaps/dilateGaps morphology,
    # ColorCalibration.cpp:504-917). Edge-detect each color channel so
    # iso-luminant chroma boundaries still separate patches.
    chans8 = (np.clip(hwc, 0, 1) * 255).astype(np.uint8)
    edges = np.zeros_like(grey)
    for c in range(3):
        edges = cv2.bitwise_or(edges, cv2.Canny(chans8[..., c], 12, 40))
    edges = cv2.dilate(edges, np.ones((3, 3), np.uint8))
    regions = cv2.bitwise_not(edges)
    n_labels, labels, stats, centroids_cc = cv2.connectedComponentsWithStats(
        regions, connectivity=4
    )
    cands = []
    for lbl in range(1, n_labels):
        x, y, w, h, area = stats[lbl]
        if not (min_area_frac * H * W <= area <= max_area_frac * H * W):
            continue
        if not (0.6 <= w / max(h, 1) <= 1.67):
            continue
        if area / (w * h) < 0.7:
            continue
        cx, cy = centroids_cc[lbl]
        cands.append((cx, cy, float(area), w, h))
    if len(cands) < num_cols * num_rows:
        raise ValueError(
            f"found only {len(cands)} patch candidates, need {num_cols * num_rows}"
        )

    # size-consistency: keep blobs near the median area
    areas = np.array([c[2] for c in cands])
    med = np.median(areas)
    cands = [c for c in cands if 0.5 * med <= c[2] <= 2.0 * med]

    # raster sort: cluster rows by y, sort each row by x
    cands.sort(key=lambda c: c[1])
    rows = []
    row = [cands[0]]
    tol = np.median([c[4] for c in cands]) * 0.8
    for c in cands[1:]:
        if abs(c[1] - row[-1][1]) < tol:
            row.append(c)
        else:
            rows.append(sorted(row, key=lambda c: c[0]))
            row = [c]
    rows.append(sorted(row, key=lambda c: c[0]))
    rows = [r for r in rows if len(r) == num_cols]
    if len(rows) < num_rows:
        raise ValueError(
            f"found {len(rows)} complete rows of {num_cols}, need {num_rows}"
        )
    rows = rows[:num_rows]

    centroids, medians = [], []
    for r in rows:
        for (cx, cy, area, w, h) in r:
            centroids.append([cx, cy])
            x0, x1 = int(cx - w * 0.3), int(cx + w * 0.3)
            y0, y1 = int(cy - h * 0.3), int(cy + h * 0.3)
            patch = hwc[y0:y1, x0:x1]
            medians.append(np.median(patch.reshape(-1, 3), axis=0))
    return np.asarray(centroids), np.asarray(medians)
