"""IIR low-pass / unsharp sharpening / median filtering.

Rebuild of surround360_render/source/util/Filter.h. The reference's
``iirLowPass`` (Filter.h:40-94) runs a first-order exponential IIR causally
then anti-causally along rows, then columns, with wrap or reflect boundary
functors and alpha = amount^(1/4). A causal+anticausal exponential IIR is
exactly convolution with the two-sided kernel

    k = (1-a) a^n u[n]  *  (1-a) a^(-n) u[-n]

so on TPU we precompute that kernel (truncated where a^r < 1e-7), bake it
into a banded Toeplitz matrix per boundary mode, and apply it as two MXU
matmuls — sequential scans become systolic-array work, numerically matching
the reference up to its one-pixel phase convention.

``sharpen_iir`` is the unsharp mask with noise coring
(Filter.h:97-127): out = lp + hp * (1 - exp(-hp^2 * noiseCore)) * amount.
"""

from __future__ import annotations

from .precision import F32_PRECISION as _F32_PRECISION

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import resize
from .resize import conv_separable_1d

__all__ = [
    "iir_lowpass_2d",
    "sharpen_iir",
    "median_filter",
    "median_filter_5x5_separable",
]


@lru_cache(maxsize=128)
def _iir_band_matrix(n: int, alpha: float, boundary: str) -> np.ndarray:
    """(n, n) matrix equal to the causal*anticausal exponential IIR with the
    given boundary handling."""
    if alpha <= 0:
        return np.eye(n, dtype=np.float32)
    # capped at n - 1 so the truncated kernel + single-fold reflect is
    # representable by jnp.pad in the conv fast path (ADVICE r2: radii
    # beyond the axis made the two paths diverge on narrow strips)
    radius = int(min(n - 1, np.ceil(np.log(1e-7) / np.log(alpha))))
    xs = np.arange(-radius, radius + 1)
    # (1-a)a^n u[n] conv (1-a)a^-n u[-n] = (1-a)^2/(1-a^2) * a^|m|;
    # normalized to unit DC gain below, so the scale factor drops out
    k = alpha ** np.abs(xs)
    k = k / k.sum()
    m = np.zeros((n, n), dtype=np.float64)
    idx = np.arange(n)
    for off, w in zip(xs, k):
        j = idx + off
        if boundary == "wrap":
            j = np.mod(j, n)
        else:  # reflect
            j = np.abs(j)
            j = np.where(j >= n, np.clip(2 * (n - 1) - j, 0, n - 1), j)
        np.add.at(m, (idx, j), w)
    return m.astype(np.float32)


@partial(jax.jit, static_argnames=("amount", "h_boundary", "v_boundary"))
def iir_lowpass_2d(
    img,
    amount: float,
    h_boundary: str = "reflect",
    v_boundary: str = "reflect",
):
    """Two-direction exponential low-pass of (..., H, W).

    ``amount`` in [0,1) controls strength exactly like the reference:
    per-pass alpha = amount ** 0.25 (Filter.h:48).
    """
    alpha = float(amount) ** 0.25
    H, W = img.shape[-2:]
    img = jnp.asarray(img, jnp.float32)
    if max(H, W) >= resize.CONV_MIN_AXIS and alpha > 0:
        # large axes: the (n, n) band matrix is an O(n^2/4)-byte program
        # constant and O(n^2) FLOPs; the truncated two-sided kernel as a
        # depthwise conv is O(K n) with no constant (identical values).
        # The radius is capped PER AXIS at n - 1: beyond that jnp.pad's
        # repeated reflection diverges from the band matrix's single-fold
        # reflect (the conv and matrix paths must agree for any axis)
        def axis_kernel(n):
            radius = int(min(n - 1, np.ceil(np.log(1e-7) / np.log(alpha))))
            xs = np.arange(-radius, radius + 1)
            k = alpha ** np.abs(xs)
            return k / k.sum()

        out = conv_separable_1d(img, axis_kernel(H), v_boundary, -2)
        return conv_separable_1d(out, axis_kernel(W), h_boundary, -1)
    rm = jnp.asarray(_iir_band_matrix(H, alpha, v_boundary))
    cm = jnp.asarray(_iir_band_matrix(W, alpha, h_boundary))
    out = jnp.einsum("oh,...hw->...ow", rm, img, precision=_F32_PRECISION)
    out = jnp.einsum("pw,...ow->...op", cm, out, precision=_F32_PRECISION)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "amount",
        "noise_core",
        "h_boundary",
        "v_boundary",
        "iir_amount",
    ),
)
def sharpen_iir(
    img,
    amount: float,
    noise_core: float = 100.0,
    h_boundary: str = "reflect",
    v_boundary: str = "reflect",
    iir_amount: float = 0.25,
):
    """IIR unsharp mask with noise coring on (..., H, W) images in [0,1].

    ``iir_amount`` is the low-pass strength (the renderer always uses 0.25,
    TestRenderStereoPanorama.cpp:692-695) and must stay < 1 — it is a
    separate knob from the unsharp ``amount``.

    Matches sharpenWithIirLowPass (Filter.h:97-127) with maxVal=1:
    hp = img - lp; coring gain = 1 - exp(-hp^2 * noiseCore);
    out = clamp(lp + hp * gain * amount). The reference's noiseCore acts on
    0..255 residuals; we work in [0,1] so hp^2 is scaled by 255^2 and the
    reference's config values carry over unchanged.
    """
    assert 0.0 <= iir_amount < 1.0, "iir_amount must be in [0, 1)"
    img = jnp.asarray(img, jnp.float32)
    lp = iir_lowpass_2d(
        img,
        iir_amount,
        h_boundary=h_boundary,
        v_boundary=v_boundary,
    )
    hp = img - lp
    gain = 1.0 - jnp.exp(-(hp * hp) * (noise_core * 65025.0))
    return jnp.clip(lp + hp * gain * amount, 0.0, 1.0)


def _median5(a, b, c, d, e):
    """Exact median of 5 via a 7-op min/max network."""
    f = jnp.maximum(jnp.minimum(a, b), jnp.minimum(c, d))
    g = jnp.minimum(jnp.maximum(a, b), jnp.maximum(c, d))
    return jnp.maximum(jnp.minimum(jnp.maximum(f, g), e), jnp.minimum(f, g))


@partial(jax.jit, static_argnames=())
def median_filter_5x5_separable(img):
    """Separable approximation of the 5x5 median (median of row medians):
    two 5-tap median networks instead of a 25-element sort — the flow
    smoother's hot path on TPU. Edge replication like cv::medianBlur."""
    img = jnp.asarray(img, jnp.float32)

    def axis_median(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (2, 2)
        p = jnp.pad(x, pad, mode="edge")
        n = x.shape[axis]
        taps = [
            jax.lax.slice_in_dim(p, k, k + n, axis=axis) for k in range(5)
        ]
        return _median5(*taps)

    return axis_median(axis_median(img, -1), -2)


@partial(jax.jit, static_argnames=("size",))
def median_filter(img, size: int = 5):
    """size x size median of (..., H, W) with edge replication, via a
    stacked-shifts + sort reduction (no data-dependent control flow)."""
    assert size % 2 == 1
    r = size // 2
    img = jnp.asarray(img, jnp.float32)
    padded = jnp.pad(
        img,
        [(0, 0)] * (img.ndim - 2) + [(r, r), (r, r)],
        mode="edge",
    )
    H, W = img.shape[-2:]
    shifts = [
        padded[..., dy : dy + H, dx : dx + W]
        for dy in range(size)
        for dx in range(size)
    ]
    stack = jnp.stack(shifts, axis=0)
    return jnp.median(stack, axis=0)
