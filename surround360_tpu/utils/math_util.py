"""Scalar/array math helpers, array-module polymorphic (numpy or jax.numpy).

TPU-native analog of the reference's ``surround360::math_util`` templates
(reference: surround360_render/source/util/MathUtil.h:29-216). Everything here
is written against the array API shared by numpy and jax.numpy so the same
code runs on host (float64 precompute, calibration) and on device (traced
under jit). Pass ``xp=numpy`` for host math; default is ``jax.numpy``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "clamp",
    "lerp",
    "bilerp",
    "reflect",
    "wrap",
    "ramp",
    "to_radians",
    "to_degrees",
    "gaussian_approx",
    "bezier_curve",
    "bezier_curve_batch",
]


def clamp(x, lo, hi, xp=jnp):
    """Clamp x into [lo, hi] (MathUtil.h: clamp)."""
    return xp.minimum(xp.maximum(x, lo), hi)


def lerp(a, b, t):
    """Linear interpolation a + t*(b-a) (MathUtil.h: lerpf/lerp)."""
    return a + t * (b - a)


def bilerp(x00, x10, x01, x11, tx, ty):
    """Bilinear interpolation of 4 corner values (MathUtil.h: bilerp)."""
    return lerp(lerp(x00, x10, tx), lerp(x01, x11, tx), ty)


def reflect(x, n, xp=jnp):
    """Reflecting (mirror) boundary fold of x into [0, n)
    (MathUtil.h: reflect). Works for x in [-n, 2n) which is all callers need.
    """
    x = xp.where(x < 0, -x - 1, x)
    return xp.where(x >= n, 2 * n - 1 - x, x)


def wrap(x, n, xp=jnp):
    """Periodic boundary fold of x into [0, n) (MathUtil.h: wrap)."""
    return xp.mod(x, n)


def ramp(x, lo, hi, xp=jnp):
    """0 below lo, 1 above hi, linear in between (MathUtil.h: rampf)."""
    return clamp((x - lo) / (hi - lo), 0.0, 1.0, xp=xp)


def to_radians(deg):
    return deg * (np.pi / 180.0)


def to_degrees(rad):
    return rad * (180.0 / np.pi)


def gaussian_approx(x, mean, std, xp=jnp):
    """Cubic-polynomial approximation of a gaussian bump, matching the
    behavior of the reference's GaussianApproximation functor
    (MathUtil.h:148-184): a smooth bump with value 1 at ``mean`` falling to
    0 at +-2*std, evaluated without transcendentals (cheap on the VPU).

    We use the smoothstep-squared profile which is C1, unimodal, and
    vanishes outside [-2 std, 2 std] like the reference's piecewise cubic.
    """
    t = clamp(xp.abs(x - mean) / (2.0 * std), 0.0, 1.0, xp=xp)
    s = 1.0 - t * t * (3.0 - 2.0 * t)  # 1 - smoothstep
    return s * s


def bezier_curve(points, t, xp=jnp):
    """Evaluate a Bezier curve with scalar/array parameter ``t`` via the
    De Casteljau recurrence (MathUtil.h:187-216 BezierCurve::operator()).

    ``points`` is a sequence of control values (scalars or arrays
    broadcastable against ``t``). Iterative rather than recursive — the
    control-point count is static so this unrolls into fused lerps under XLA.
    """
    pts = [xp.asarray(p) for p in points]
    while len(pts) > 1:
        pts = [lerp(pts[i], pts[i + 1], t) for i in range(len(pts) - 1)]
    return pts[0]


def bezier_curve_batch(ctrl, t, xp=jnp):
    """Vectorized De Casteljau: ``ctrl`` has shape (..., n_ctrl); ``t`` is
    broadcastable against ``ctrl[..., 0]``. Returns curve value at t."""
    ctrl = xp.asarray(ctrl)
    n = ctrl.shape[-1]
    pts = [ctrl[..., i] for i in range(n)]
    while len(pts) > 1:
        pts = [lerp(pts[i], pts[i + 1], t) for i in range(len(pts) - 1)]
    return pts[0]
