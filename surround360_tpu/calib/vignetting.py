"""Vignetting calibration: fit separable Bezier rolloff surfaces.

Rebuild of surround360_render/source/test/TestVignettingCalibration.cpp
(:44-106 BezierFunctor) + TestVignettingDataAcquisition: given samples of
(pixel location, observed RGB intensity) from a uniform grey target swept
across the frame, fit per-channel separable Bezier surfaces

    vx(x / maxDim) * vy(y / maxDim) ~= intensity

then invert the fitted rolloff into the ISP's vignetteRollOffH/V gain
control points (gain = max(surface) / surface). The Ceres solve becomes a
tiny dense JAX Gauss-Newton.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fit_vignetting", "acquire_vignetting_samples", "VignettingFit"]


def _bezier_1d(ctrl, t):
    pts = [ctrl[i] for i in range(ctrl.shape[0])]
    while len(pts) > 1:
        pts = [pts[i] + t * (pts[i + 1] - pts[i]) for i in range(len(pts) - 1)]
    return pts[0]


@dataclass
class VignettingFit:
    bezier_x: np.ndarray  # (3, order+1) per channel, intensity surface
    bezier_y: np.ndarray
    rolloff_h: np.ndarray  # (order+1, 3) ISP gain control points
    rolloff_v: np.ndarray
    rms_residual: float


def fit_vignetting(
    locations: np.ndarray,  # (S, 2) pixel coords
    intensities: np.ndarray,  # (S, 3) observed RGB of the grey target
    image_size: tuple[int, int],  # (W, H)
    order: int = 4,
    iterations: int = 100,
) -> VignettingFit:
    W, H = image_size
    max_dim = max(W, H)
    u = jnp.asarray(locations[:, 0] / max_dim)
    v = jnp.asarray(locations[:, 1] / max_dim)
    obs = jnp.asarray(intensities)

    n = order + 1

    def residuals(theta):
        bx = theta[: 3 * n].reshape(3, n)
        by = theta[3 * n :].reshape(3, n)
        out = []
        for c in range(3):
            s = _bezier_1d(bx[c], u) * _bezier_1d(by[c], v)
            out.append(obs[:, c] - s)
        return jnp.concatenate(out)

    res_jit = jax.jit(residuals)
    jac_jit = jax.jit(jax.jacfwd(residuals))

    mean0 = float(np.sqrt(np.maximum(np.mean(intensities), 1e-6)))
    theta = np.full(6 * n, mean0)
    lam = 1e-3
    r = np.asarray(res_jit(jnp.asarray(theta)))
    cost = float(0.5 * r @ r)
    for _ in range(iterations):
        J = np.asarray(jac_jit(jnp.asarray(theta)))
        H_mat = J.T @ J
        g = J.T @ r
        improved = False
        for _try in range(8):
            try:
                step = np.linalg.solve(
                    H_mat + lam * np.diag(np.maximum(np.diag(H_mat), 1e-9)),
                    -g,
                )
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            new_theta = theta + step
            new_r = np.asarray(res_jit(jnp.asarray(new_theta)))
            new_cost = float(0.5 * new_r @ new_r)
            if new_cost < cost:
                theta, r, cost = new_theta, new_r, new_cost
                lam = max(lam / 10, 1e-12)
                improved = True
                break
            lam *= 10
        if not improved:
            break

    bx = theta[: 3 * n].reshape(3, n)
    by = theta[3 * n :].reshape(3, n)

    # invert the intensity surface into ISP gains: the ISP multiplies by
    # curveH(x) * curveV(y); gain(t) = peak / surface(t). Bezier control
    # points are not interpolated, so fit the gain curve's control points
    # by least squares on the Bernstein basis over the used domain.
    from math import comb

    def to_gain(ctrl, extent):
        ts = np.linspace(0.0, extent / max_dim, 64)
        basis = np.stack(
            [
                comb(order, i) * ts**i * (1.0 - ts) ** (order - i)
                for i in range(n)
            ],
            axis=1,
        )  # (64, n)
        gains = []
        for c in range(3):
            vals = np.asarray(_bezier_1d(jnp.asarray(ctrl[c]), jnp.asarray(ts)))
            g = vals.max() / np.maximum(vals, 1e-6)
            coef, *_ = np.linalg.lstsq(basis, g, rcond=None)
            gains.append(coef)
        return np.stack(gains, axis=1)  # (n, 3)

    return VignettingFit(
        bezier_x=bx,
        bezier_y=by,
        rolloff_h=to_gain(bx, W),
        rolloff_v=to_gain(by, H),
        rms_residual=float(np.sqrt(np.mean(r**2))),
    )


def acquire_vignetting_samples(
    raw_images: list[np.ndarray],  # (H, W) demosaiced-grey or raw planes
    charts: list[tuple[float, float]] | None = None,
    patch_radius: int = 10,
):
    """Extract (location, median intensity) samples from a sweep of images
    of a grey chart (TestVignettingDataAcquisition's role). When chart
    locations aren't provided, each image's brightest blob centroid is
    used."""
    import cv2

    locations, intensities = [], []
    for idx, img in enumerate(raw_images):
        if charts is not None:
            cx, cy = charts[idx]
        else:
            blur = cv2.GaussianBlur(np.asarray(img, np.float32), (0, 0), 5.0)
            _, _, _, max_loc = cv2.minMaxLoc(blur)
            cx, cy = max_loc
        x0 = int(max(cx - patch_radius, 0))
        y0 = int(max(cy - patch_radius, 0))
        patch = np.asarray(img)[y0 : y0 + 2 * patch_radius, x0 : x0 + 2 * patch_radius]
        locations.append([cx, cy])
        med = float(np.median(patch))
        intensities.append([med, med, med])
    return np.asarray(locations), np.asarray(intensities)
