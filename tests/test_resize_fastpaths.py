"""Equivalence tests for the large-axis fast paths in ops/resize.py.

The polyphase 2x resizes, pairwise-mean area halving, and depthwise-conv
gaussian/IIR filters are gated on resize.CONV_MIN_AXIS = 2500 in
production, so ordinary unit tests never execute them. Here we call the
private helpers directly (and lower the threshold for the jitted
wrappers) and assert they match the dense-matrix paths at small sizes —
the paths must be interchangeable because the threshold is a pure
performance knob.
"""

import numpy as np
import pytest

import surround360_tpu.ops.filters as filters
import surround360_tpu.ops.resize as resize
from surround360_tpu.ops.resize import (
    _apply_separable_axis,
    _double_axis_bilinear,
    _double_axis_cubic,
    _gaussian_band_matrix,
    _halve_axis_area,
    conv_separable_1d,
    resize_matrix_area,
    resize_matrix_bilinear,
    resize_matrix_cubic,
)

RNG = np.random.default_rng(7)


def _img(h=12, w=18):
    return RNG.uniform(size=(2, 3, h, w)).astype(np.float32)


@pytest.mark.parametrize("axis", [-2, -1])
def test_double_axis_cubic_matches_matrix(axis):
    img = _img()
    n = img.shape[axis]
    fast = np.asarray(_double_axis_cubic(img, axis))
    ref = np.asarray(
        _apply_separable_axis(img, resize_matrix_cubic(n, 2 * n), axis)
    )
    np.testing.assert_allclose(fast, ref, atol=2e-6)


@pytest.mark.parametrize("axis", [-2, -1])
def test_double_axis_bilinear_matches_matrix(axis):
    img = _img()
    n = img.shape[axis]
    fast = np.asarray(_double_axis_bilinear(img, axis))
    ref = np.asarray(
        _apply_separable_axis(img, resize_matrix_bilinear(n, 2 * n), axis)
    )
    np.testing.assert_allclose(fast, ref, atol=2e-6)


@pytest.mark.parametrize("axis", [-2, -1])
def test_halve_axis_area_matches_matrix(axis):
    img = _img(16, 20)
    n = img.shape[axis]
    fast = np.asarray(_halve_axis_area(img, axis))
    ref = np.asarray(
        _apply_separable_axis(img, resize_matrix_area(n, n // 2), axis)
    )
    np.testing.assert_allclose(fast, ref, atol=2e-6)


@pytest.mark.parametrize("boundary", ["reflect", "wrap"])
@pytest.mark.parametrize("axis", [-2, -1])
def test_conv_separable_matches_gaussian_band_matrix(boundary, axis):
    img = _img(14, 17)
    n = img.shape[axis]
    sigma = 1.5
    radius = max(1, int(np.ceil(3.0 * sigma)))
    xs = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    fast = np.asarray(conv_separable_1d(img, k, boundary, axis))
    ref = np.asarray(
        _apply_separable_axis(
            img, _gaussian_band_matrix(n, sigma, boundary), axis
        )
    )
    np.testing.assert_allclose(fast, ref, atol=2e-6)


def test_iir_conv_path_matches_band_matrix_narrow_axis():
    """The advisor's trap case: a strip whose SHORT axis is much smaller
    than the kernel radius (n=16, alpha ~0.95 -> radius ~300). The conv
    path must cap the kernel per axis so repeated-reflection padding
    never diverges from the band matrix's single-fold reflect."""
    img = RNG.uniform(size=(1, 16, 64)).astype(np.float32)
    amount = 0.95**4  # per-pass alpha 0.95
    ref = np.asarray(filters.iir_lowpass_2d(img, amount))

    old = resize.CONV_MIN_AXIS
    resize.CONV_MIN_AXIS = 32  # force the conv path (W=64 >= 32)
    try:
        filters.iir_lowpass_2d.clear_cache()
        fast = np.asarray(filters.iir_lowpass_2d(img, amount))
    finally:
        resize.CONV_MIN_AXIS = old
        filters.iir_lowpass_2d.clear_cache()
    np.testing.assert_allclose(fast, ref, atol=2e-5)


def test_iir_conv_path_matches_band_matrix_wrap_reflect():
    img = RNG.uniform(size=(2, 24, 40)).astype(np.float32)
    amount = 0.25
    ref = np.asarray(
        filters.iir_lowpass_2d(img, amount, h_boundary="wrap")
    )
    old = resize.CONV_MIN_AXIS
    resize.CONV_MIN_AXIS = 24
    try:
        filters.iir_lowpass_2d.clear_cache()
        fast = np.asarray(
            filters.iir_lowpass_2d(img, amount, h_boundary="wrap")
        )
    finally:
        resize.CONV_MIN_AXIS = old
        filters.iir_lowpass_2d.clear_cache()
    np.testing.assert_allclose(fast, ref, atol=2e-5)
