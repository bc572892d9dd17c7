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

from .precision import F32_PRECISION as _F32_PRECISION

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


# Axis length beyond which a banded operator runs as a depthwise conv
# instead of a dense (n, n) band matmul: the matmul embeds an n^2/4-byte
# constant in the program (229 MB at 6k pole widths — the compile tunnel
# rejects the proto) and costs O(n^2) FLOPs vs the conv's O(K n). Below
# the threshold the MXU matmul is measured FASTER than conv on TPU
# (bench-scale 1008 regressed 4.9 -> 3.9 fps with a 1024 threshold), so
# it sits above every bench-scale axis and below the preset scales.
CONV_MIN_AXIS = 2500


def conv_separable_1d(img, kernel_np, boundary: str, axis: int):
    """Depthwise 1-D convolution of (..., H, W) along `axis` with an odd
    host kernel; boundary "reflect" (BORDER_REFLECT_101 fold, matching the
    band matrices) or "wrap". All other dims fold into the conv batch."""
    img = jnp.asarray(img, jnp.float32)
    k = np.asarray(kernel_np, np.float32)
    r = (len(k) - 1) // 2
    moved = jnp.moveaxis(img, axis, -1)
    lead = moved.shape[:-1]
    n = moved.shape[-1]
    flat = moved.reshape((-1, 1, n))
    if r > 0:
        mode = "wrap" if boundary == "wrap" else "reflect"
        flat = jnp.pad(flat, [(0, 0), (0, 0), (r, r)], mode=mode)
    # lax conv is cross-correlation, which matches the band-matrix
    # convention out[i] = sum_off w[off] x[i+off]
    out = jax.lax.conv_general_dilated(
        flat,
        jnp.asarray(k).reshape(1, 1, -1),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_F32_PRECISION,
    )
    return jnp.moveaxis(out.reshape(lead + (n,)), -1, axis)


def _apply_separable_axis(img, mat, axis):
    """Apply one (n_out, n_in) interpolation matrix along `axis` (-2/-1)."""
    img = jnp.asarray(img, jnp.float32)
    m = jnp.asarray(mat)
    if axis in (-2, img.ndim - 2):
        return jnp.einsum("oh,...hw->...ow", m, img, precision=_F32_PRECISION)
    return jnp.einsum("pw,...hw->...hp", m, img, precision=_F32_PRECISION)


def _apply_separable(img, row_mat, col_mat):
    """img (..., H, W) -> row_mat @ img @ col_mat^T, f32 MXU with full
    precision (geometry-bearing data; bf16 would cost visible px error)."""
    img = jnp.asarray(img, jnp.float32)
    rm = jnp.asarray(row_mat)
    cm = jnp.asarray(col_mat)
    out = jnp.einsum("oh,...hw->...ow", rm, img, precision=_F32_PRECISION)
    out = jnp.einsum("pw,...ow->...op", cm, out, precision=_F32_PRECISION)
    return out


def _halve_axis_area(img, axis):
    """Exact INTER_AREA 2:1 box downsample along one (even) axis: each
    output pixel covers exactly two source pixels, so the (n/2, n) area
    matrix reduces to a pairwise mean — no constant, O(n) work."""
    moved = jnp.moveaxis(jnp.asarray(img, jnp.float32), axis, -1)
    n = moved.shape[-1]
    pair = moved.reshape(moved.shape[:-1] + (n // 2, 2))
    return jnp.moveaxis(pair.mean(axis=-1), -1, axis)


def _double_axis_cubic(img, axis):
    """Exact INTER_CUBIC 2x upsample along one axis as two 4-tap polyphase
    convolutions + interleave. Matches resize_matrix_cubic(n, 2n): output
    2j samples src j - 0.25 (phase t=0.75 at i0=j-1), output 2j+1 samples
    src j + 0.25 (phase t=0.25 at i0=j), clamped borders = edge pad."""
    a = -0.75

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    def taps(t):
        # weights for taps at i0-1, i0, i0+1, i0+2
        return np.array(
            [k12(t + 1.0), k01(t), k01(1.0 - t), k12(2.0 - t)], np.float32
        )

    moved = jnp.moveaxis(jnp.asarray(img, jnp.float32), axis, -1)
    lead = moved.shape[:-1]
    n = moved.shape[-1]
    flat = moved.reshape((-1, 1, n))
    padded = jnp.pad(flat, [(0, 0), (0, 0), (2, 2)], mode="edge")

    def phase(kernel, off):
        # taps at src indices i0-1..i0+2 with i0 = j + off
        return jax.lax.conv_general_dilated(
            padded[..., 1 + off : 1 + off + n + 3],
            jnp.asarray(kernel).reshape(1, 1, -1),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=_F32_PRECISION,
        )

    even = phase(taps(0.75), -1)  # i0 = j - 1, t = 0.75
    odd = phase(taps(0.25), 0)  # i0 = j,     t = 0.25
    inter = jnp.stack([even, odd], axis=-1).reshape((-1, 1, 2 * n))
    return jnp.moveaxis(inter.reshape(lead + (2 * n,)), -1, axis)


def _double_axis_bilinear(img, axis):
    """Exact INTER_LINEAR 2x upsample along one axis (polyphase, matching
    resize_matrix_bilinear(n, 2n)): out[2j] = 0.25 x[j-1] + 0.75 x[j],
    out[2j+1] = 0.75 x[j] + 0.25 x[j+1], clamped borders."""
    moved = jnp.moveaxis(jnp.asarray(img, jnp.float32), axis, -1)
    lead = moved.shape[:-1]
    n = moved.shape[-1]
    padded = jnp.pad(
        moved.reshape((-1, n)), [(0, 0), (1, 1)], mode="edge"
    )
    even = 0.25 * padded[:, :n] + 0.75 * padded[:, 1 : n + 1]
    odd = 0.75 * padded[:, 1 : n + 1] + 0.25 * padded[:, 2 : n + 2]
    inter = jnp.stack([even, odd], axis=-1).reshape((-1, 2 * n))
    return jnp.moveaxis(inter.reshape(lead + (2 * n,)), -1, axis)


@partial(jax.jit, static_argnames=("shape",))
def resize_bilinear(img, shape):
    """Resize (..., H, W) -> (..., *shape) with bilinear sampling. Exact
    2x upsamples of large axes run as polyphase shifted adds (the dense
    matrix is an O(n^2)-byte program constant)."""
    H, W = img.shape[-2:]
    out = img
    if shape[0] == 2 * H and 2 * H >= CONV_MIN_AXIS:
        out = _double_axis_bilinear(out, -2)
    elif shape[0] != H:
        out = _apply_separable_axis(
            out, resize_matrix_bilinear(H, shape[0]), -2
        )
    if shape[1] == 2 * W and 2 * W >= CONV_MIN_AXIS:
        out = _double_axis_bilinear(out, -1)
    elif shape[1] != W:
        out = _apply_separable_axis(
            out, resize_matrix_bilinear(W, shape[1]), -1
        )
    return jnp.asarray(out, jnp.float32)


@partial(jax.jit, static_argnames=("shape",))
def resize_cubic(img, shape):
    """Resize (..., H, W) -> (..., *shape) with bicubic sampling
    (INTER_CUBIC); the reference's choice for flow-field rescales.

    Exact 2x upsamples of large axes run as polyphase convs: the dense
    (2n, n) matrix is an O(n^2)-byte program constant and O(n^2) FLOPs
    (114 MB / 22 TFLOP for the 6k pole flow upsample alone)."""
    H, W = img.shape[-2:]
    out = img
    if shape[0] == 2 * H and 2 * H >= CONV_MIN_AXIS:
        out = _double_axis_cubic(out, -2)
    elif shape[0] != H:
        out = _apply_separable_axis(out, resize_matrix_cubic(H, shape[0]), -2)
    if shape[1] == 2 * W and 2 * W >= CONV_MIN_AXIS:
        out = _double_axis_cubic(out, -1)
    elif shape[1] != W:
        out = _apply_separable_axis(out, resize_matrix_cubic(W, shape[1]), -1)
    return jnp.asarray(out, jnp.float32)


@partial(jax.jit, static_argnames=("shape",))
def resize_area(img, shape):
    """Resize (..., H, W) -> (..., *shape) with box averaging (INTER_AREA);
    the reference's choice for downscales. Exact 2:1 halving of large
    axes reduces to a pairwise mean (no matrix constant)."""
    H, W = img.shape[-2:]
    out = img
    if H == 2 * shape[0] and H >= CONV_MIN_AXIS:
        out = _halve_axis_area(out, -2)
    elif shape[0] != H:
        out = _apply_separable_axis(out, resize_matrix_area(H, shape[0]), -2)
    if W == 2 * shape[1] and W >= CONV_MIN_AXIS:
        out = _halve_axis_area(out, -1)
    elif shape[1] != W:
        out = _apply_separable_axis(out, resize_matrix_area(W, shape[1]), -1)
    return jnp.asarray(out, jnp.float32)


@partial(jax.jit, static_argnames=("sigma", "boundary", "ksize"))
def gaussian_blur(img, sigma: float, boundary: str = "reflect", ksize: int = 0):
    """Separable gaussian blur of (..., H, W); sigma in pixels. ``ksize``
    (odd) fixes the truncation width like cv::GaussianBlur's ksize arg."""
    if sigma <= 0:
        return jnp.asarray(img, jnp.float32)
    H, W = img.shape[-2:]
    if max(H, W) < CONV_MIN_AXIS:
        return _apply_separable(
            img,
            _gaussian_band_matrix(H, sigma, boundary, ksize),
            _gaussian_band_matrix(W, sigma, boundary, ksize),
        )
    radius = (ksize - 1) // 2 if ksize else max(1, int(np.ceil(3.0 * sigma)))
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    out = conv_separable_1d(img, k, boundary, -2)
    return conv_separable_1d(out, k, boundary, -1)


def pyramid_down(img, factor: float = 0.5):
    """One pyramid level: area-downsample by ``factor``."""
    H, W = img.shape[-2:]
    return resize_area(img, (max(1, int(H * factor)), max(1, int(W * factor))))
