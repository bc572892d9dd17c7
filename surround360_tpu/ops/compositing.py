"""Alpha compositing / deghosting / panorama assembly primitives.

Rebuild of the compositing half of surround360_render/source/util/CvUtil.cpp
as pure elementwise jnp (trivially XLA-fused). Images are channels-first
(..., 4, H, W) RGBA float32 in [0,1] unless noted; the reference's 0..255
constants are converted where they appear.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .resize import gaussian_blur

__all__ = [
    "stack_horizontal",
    "stack_vertical",
    "offset_horizontal_wrap",
    "feather_alpha",
    "circle_alpha_cut",
    "cut_mask_out_of_alpha",
    "radial_alpha_fade",
    "top_down_alpha_fade",
    "flatten_layers_deghost_prefer_base",
    "flatten_layers_alpha_softmax",
]


def stack_horizontal(images):
    """Concat along width (CvUtil.cpp:69-79)."""
    return jnp.concatenate(list(images), axis=-1)


def stack_vertical(images):
    """Concat along height (CvUtil.cpp:81-91)."""
    return jnp.concatenate(list(images), axis=-2)


def offset_horizontal_wrap(image, offset):
    """Shift horizontally with wrap-around (CvUtil.cpp:93-115). Positive
    offset moves content right, like the reference's x - offset indexing.
    Non-integer offsets take the reference's nearest-pixel behavior's linear
    generalization via two-tap blend."""
    offset = float(offset)
    i = int(np.floor(offset))
    frac = offset - i
    rolled = jnp.roll(image, i, axis=-1)
    if frac == 0.0:
        return rolled
    return rolled * (1.0 - frac) + jnp.roll(image, i + 1, axis=-1) * frac


def _min_filter_1d(x, radius: int, axis: int):
    """Running-min over a (2*radius+1) window via log-doubling: a width-w
    min composes from O(log w) shifted mins instead of w stacked slices
    (the 31-px feather would otherwise stack 63 slices per axis)."""
    # build a min over [0, radius] going forward, then backward, compose
    def directional(x, r, sign):
        out = x
        covered = 1
        while covered <= r:
            step = min(covered, r - covered + 1)
            pad = [(0, 0)] * x.ndim
            pad[axis] = (step, 0) if sign > 0 else (0, step)
            shifted = jnp.pad(out, pad, mode="edge")
            if sign > 0:
                shifted = jax.lax.slice_in_dim(
                    shifted, 0, x.shape[axis], axis=axis
                )
            else:
                shifted = jax.lax.slice_in_dim(
                    shifted, step, step + x.shape[axis], axis=axis
                )
            out = jnp.minimum(out, shifted)
            covered += step
        return out

    return jnp.minimum(directional(x, radius, 1), directional(x, radius, -1))


def _erode_cross(alpha, radius: int):
    """Morphological erosion by a cross structuring element of given radius
    (MORPH_CROSS in featherAlphaChannel, CvUtil.cpp:140-157): the min over
    the union of the horizontal and vertical 1-D windows (NOT their
    composition, which would be a square)."""
    return jnp.minimum(
        _min_filter_1d(alpha, radius, -1), _min_filter_1d(alpha, radius, -2)
    )


@partial(jax.jit, static_argnames=("erode_size",))
def feather_alpha(image, erode_size: int = 3):
    """Erode then blur the alpha channel (CvUtil.cpp:140-157); image is
    (..., 4, H, W)."""
    alpha = image[..., 3, :, :]
    alpha = _erode_cross(alpha, erode_size)
    alpha = gaussian_blur(alpha, erode_size / 2.0)
    return jnp.concatenate([image[..., :3, :, :], alpha[..., None, :, :]], axis=-3)


def circle_alpha_cut(image, radius: float):
    """Alpha = 1 inside a centered circle of ``radius`` px, 0 outside
    (CvUtil.cpp:201-211)."""
    H, W = image.shape[-2:]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - H / 2.0
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - W / 2.0
    inside = (ys * ys + xs * xs) < (radius * radius)
    alpha = inside.astype(image.dtype)
    alpha = jnp.broadcast_to(alpha, image[..., 3, :, :].shape)
    return jnp.concatenate([image[..., :3, :, :], alpha[..., None, :, :]], axis=-3)


def cut_mask_out_of_alpha(image, mask):
    """Zero alpha where ``mask`` (H, W) bool is set (the red-pole-mask cut,
    CvUtil.cpp:213-222)."""
    alpha = jnp.where(mask, 0.0, image[..., 3, :, :])
    return jnp.concatenate([image[..., :3, :, :], alpha[..., None, :, :]], axis=-3)


def radial_alpha_fade(image):
    """Multiply alpha by max(0, 1 - r/rmax) from the center
    (CvUtil.cpp:312-325)."""
    H, W = image.shape[-2:]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None] - H / 2.0
    xs = jnp.arange(W, dtype=jnp.float32)[None, :] - W / 2.0
    r = jnp.sqrt(ys * ys + xs * xs) / (min(H, W) / 2.0)
    fade = jnp.maximum(0.0, 1.0 - r)
    alpha = image[..., 3, :, :] * fade
    return jnp.concatenate([image[..., :3, :, :], alpha[..., None, :, :]], axis=-3)


def top_down_alpha_fade(image):
    """Multiply alpha by y/H (CvUtil.cpp:327-334)."""
    H = image.shape[-2]
    fade = (jnp.arange(H, dtype=jnp.float32) / H)[:, None]
    alpha = image[..., 3, :, :] * fade
    return jnp.concatenate([image[..., :3, :, :], alpha[..., None, :, :]], axis=-3)


@jax.jit
def flatten_layers_deghost_prefer_base(bottom, top):
    """Two-layer softmax deghost with base-layer bias
    (CvUtil.cpp:224-260): where layers agree in color, alpha-lerp normally;
    where they disagree, sharpen toward a winner with the base layer biased
    2x. Constants kColorDiffCoef=5, kSoftmaxSharpness=5, kBaseLayerBias=2.
    Inputs/outputs are (..., 4, H, W) RGBA in [0,1]."""
    k_color_diff_coef = 5.0
    k_sharpness = 5.0
    k_base_bias = 2.0

    base_rgb = bottom[..., :3, :, :]
    top_rgb = top[..., :3, :, :]
    color_diff = jnp.sum(jnp.abs(base_rgb - top_rgb), axis=-3)
    deghost = jnp.tanh(color_diff * k_color_diff_coef)

    alpha_r = top[..., 3, :, :]
    alpha_l = 1.0 - alpha_r
    exp_l = jnp.exp(k_sharpness * alpha_l * k_base_bias)
    exp_r = jnp.exp(k_sharpness * alpha_r)
    sum_exp = exp_l + exp_r + 1e-5
    softmax_l = exp_l / sum_exp
    softmax_r = 1.0 - softmax_l

    w_l = alpha_l + deghost * (softmax_l - alpha_l)
    w_r = alpha_r + deghost * (softmax_r - alpha_r)
    out_rgb = base_rgb * w_l[..., None, :, :] + top_rgb * w_r[..., None, :, :]
    out_a = jnp.maximum(top[..., 3, :, :], bottom[..., 3, :, :])
    return jnp.concatenate([out_rgb, out_a[..., None, :, :]], axis=-3)


@partial(jax.jit, static_argnames=("softmax_coef",))
def flatten_layers_alpha_softmax(layers, softmax_coef: float = 5.0):
    """Blend N RGBA layers with weights exp(coef * alpha) - 1
    (CvUtil.cpp:336-361). ``layers`` is (N, ..., 4, H, W); returns RGB
    (..., 3, H, W)."""
    layers = jnp.asarray(layers)
    w = jnp.exp(softmax_coef * layers[..., 3:4, :, :]) - 1.0
    num = jnp.sum(w * layers[..., :3, :, :], axis=0)
    den = jnp.sum(w, axis=0)
    return num / jnp.where(den == 0, 1.0, den)
