"""Separable resampling as MXU matmuls.

The reference leans on cv::resize (INTER_AREA for downscale, INTER_LINEAR /
INTER_CUBIC for upscale) throughout the flow pyramid (PixFlow.h:477-491) and
the ISP. Resize is separable, so on TPU we build the 1-D interpolation
matrices on host (cached per (in,out) size) and run two dense matmuls —
turning an irregular-gather problem into systolic-array work:

    out = R @ img @ C^T,   R: (Ho, H), C: (Wo, W)

For typical sizes (2048 -> 1024) the matrices are a few MB and the matmuls
are far below MXU peak, i.e. effectively free next to the gathers they
replace. Gaussian blur uses the same trick with banded Toeplitz matrices.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear",
    "resize_cubic",
    "resize_area",
    "gaussian_blur",
    "pyramid_down",
    "resize_matrix_bilinear",
    "resize_matrix_cubic",
    "resize_matrix_area",
]


@lru_cache(maxsize=256)
def resize_matrix_bilinear(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic bilinear sampling matrix using OpenCV's
    pixel-center convention: src = (dst + 0.5) * n_in/n_out - 0.5, clamped."""
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    src = np.clip(src, 0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    t = src - i0
    m = np.zeros((n_out, n_in), dtype=np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), (1.0 - t).astype(np.float32))
    np.add.at(m, (rows, i1), t.astype(np.float32))
    return m


@lru_cache(maxsize=256)
def resize_matrix_cubic(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bicubic (a=-0.75, OpenCV INTER_CUBIC) sampling matrix
    with clamped borders."""
    a = -0.75
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    m = np.zeros((n_out, n_in), dtype=np.float64)
    rows = np.arange(n_out)

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    weights = [k12(t + 1.0), k01(t), k01(1.0 - t), k12(2.0 - t)]
    for tap, w in enumerate(weights):
        j = np.clip(i0 - 1 + tap, 0, n_in - 1)
        np.add.at(m, (rows, j), w)
    return m.astype(np.float32)


@lru_cache(maxsize=256)
def resize_matrix_area(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) box-average (INTER_AREA) matrix: each output pixel
    averages the source interval it covers, with fractional edge weights."""
    scale = n_in / n_out
    m = np.zeros((n_out, n_in), dtype=np.float64)
    for o in range(n_out):
        lo = o * scale
        hi = (o + 1) * scale
        i_lo = int(np.floor(lo))
        i_hi = int(np.ceil(hi))
        for i in range(i_lo, min(i_hi, n_in)):
            cover = min(hi, i + 1) - max(lo, i)
            if cover > 0:
                m[o, i] = cover
        m[o] /= m[o].sum()
    return m.astype(np.float32)


@lru_cache(maxsize=256)
def _gaussian_band_matrix(
    n: int, sigma: float, boundary: str, ksize: int = 0
) -> np.ndarray:
    """(n, n) Toeplitz gaussian-blur matrix with reflect/wrap boundary.
    Kernel radius = ceil(3 sigma) when ksize=0 (cv::GaussianBlur auto),
    else (ksize-1)/2 — the reference passes explicit kernel sizes that
    truncate the gaussian (e.g. ksize 15 at sigma 8, PixFlow.h:48-49) and
    the truncation is behaviorally significant."""
    radius = (ksize - 1) // 2 if ksize else max(1, int(np.ceil(3.0 * sigma)))
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    m = np.zeros((n, n), dtype=np.float64)
    idx = np.arange(n)
    for off, w in zip(xs, k):
        j = idx + off
        if boundary == "wrap":
            j = np.mod(j, n)
        else:  # reflect (OpenCV BORDER_REFLECT_101-like fold)
            j = np.abs(j)
            j = np.where(j >= n, 2 * (n - 1) - j, j)
        np.add.at(m, (idx, j), w)
    return m.astype(np.float32)


def _apply_separable(img, row_mat, col_mat):
    """img (..., H, W) -> row_mat @ img @ col_mat^T, f32 MXU with full
    precision (geometry-bearing data; bf16 would cost visible px error)."""
    img = jnp.asarray(img, jnp.float32)
    rm = jnp.asarray(row_mat)
    cm = jnp.asarray(col_mat)
    out = jnp.einsum("oh,...hw->...ow", rm, img, precision="float32")
    out = jnp.einsum("pw,...ow->...op", cm, out, precision="float32")
    return out


@partial(jax.jit, static_argnames=("shape",))
def resize_bilinear(img, shape):
    """Resize (..., H, W) -> (..., *shape) with bilinear sampling."""
    H, W = img.shape[-2:]
    return _apply_separable(
        img, resize_matrix_bilinear(H, shape[0]), resize_matrix_bilinear(W, shape[1])
    )


@partial(jax.jit, static_argnames=("shape",))
def resize_cubic(img, shape):
    """Resize (..., H, W) -> (..., *shape) with bicubic sampling
    (INTER_CUBIC); the reference's choice for flow-field rescales."""
    H, W = img.shape[-2:]
    return _apply_separable(
        img, resize_matrix_cubic(H, shape[0]), resize_matrix_cubic(W, shape[1])
    )


@partial(jax.jit, static_argnames=("shape",))
def resize_area(img, shape):
    """Resize (..., H, W) -> (..., *shape) with box averaging (INTER_AREA);
    the reference's choice for downscales."""
    H, W = img.shape[-2:]
    return _apply_separable(
        img, resize_matrix_area(H, shape[0]), resize_matrix_area(W, shape[1])
    )


@partial(jax.jit, static_argnames=("sigma", "boundary", "ksize"))
def gaussian_blur(img, sigma: float, boundary: str = "reflect", ksize: int = 0):
    """Separable gaussian blur of (..., H, W); sigma in pixels. ``ksize``
    (odd) fixes the truncation width like cv::GaussianBlur's ksize arg."""
    if sigma <= 0:
        return jnp.asarray(img, jnp.float32)
    H, W = img.shape[-2:]
    return _apply_separable(
        img,
        _gaussian_band_matrix(H, sigma, boundary, ksize),
        _gaussian_band_matrix(W, sigma, boundary, ksize),
    )


def pyramid_down(img, factor: float = 0.5):
    """One pyramid level: area-downsample by ``factor``."""
    H, W = img.shape[-2:]
    return resize_area(img, (max(1, int(H * factor)), max(1, int(W * factor))))
