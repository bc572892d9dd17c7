"""Independent scalar oracle for the novel-view / chunk-composite chain.

Transliterated per-pixel from the REFERENCE spec (NovelView.cpp +
TestRenderStereoPanorama.cpp), not from the production JAX code, so a
shared convention bug between views/novel_view.py and its tests cannot
hide: the LazyNovelViewBuffer column warp
(renderStereoPanoramaChunksThread, TestRenderStereoPanorama.cpp:271-285),
renderLazyNovelView's remap composition + alpha/time packing
(NovelView.cpp:176-224), combineLazyViews' softmax deghost
(NovelView.cpp:101-154), and the eager combineNovelViews
(NovelView.cpp:47-99). Sampling is cv::remap INTER_CUBIC (a = -0.75
Catmull-Rom-like kernel) with BORDER_CONSTANT zero taps.

Value domain is float [0, 1] (the rebuild's working range) instead of the
reference's Vec4b uint8; every ratio in the math (alpha blends,
colorDiff / 255, flowMag / width) is scale-free, so the formulas carry
over unchanged.

Deliberately slow scalar loops; use tiny images.
"""

from __future__ import annotations

import math

import numpy as np

_A = -0.75  # cv INTER_CUBIC / BICUBIC kernel coefficient


def _cubic_weight(s: float) -> float:
    s = abs(float(s))
    if s < 1.0:
        return ((_A + 2.0) * s - (_A + 3.0)) * s * s + 1.0
    if s < 2.0:
        return ((_A * s - 5.0 * _A) * s + 8.0 * _A) * s - 4.0 * _A
    return 0.0


def sample_bicubic(img_chw: np.ndarray, x: float, y: float) -> np.ndarray:
    """Scalar bicubic sample with constant-zero border (cv::remap
    INTER_CUBIC + default BORDER_CONSTANT)."""
    C, H, W = img_chw.shape
    j0 = math.floor(x)
    i0 = math.floor(y)
    acc = np.zeros((C,), np.float64)
    for dy in range(-1, 3):
        yy = i0 + dy
        wy = _cubic_weight(y - yy)
        if wy == 0.0:
            continue
        for dx in range(-1, 3):
            xx = j0 + dx
            wx = _cubic_weight(x - xx)
            if wx == 0.0:
                continue
            if 0 <= yy < H and 0 <= xx < W:
                acc += wy * wx * img_chw[:, yy, xx]
    return acc


def lazy_warp_buffer(
    chunk_w: int, cam_w: int, verge: float, eye: str
) -> tuple[np.ndarray, np.ndarray]:
    """(warp_x, t) per chunk column — the LazyNovelViewBuffer fill loop
    (TestRenderStereoPanorama.cpp:271-285): column nvIdx warps to
    slabShift +- vergeAtInfinitySlabDisplacement at shift
    nvIdx / numNovelViews, where slabShift = camW/2 - (numNovelViews -
    nvIdx); warp y is the identity."""
    warp_x = np.empty(chunk_w, np.float64)
    t = np.empty(chunk_w, np.float64)
    sign = 1.0 if eye == "left" else -1.0
    for nv in range(chunk_w):
        slab = cam_w * 0.5 - (chunk_w - nv)
        warp_x[nv] = slab + sign * verge
        t[nv] = nv / chunk_w
    return warp_x, t


def render_lazy_novel_view(
    src: np.ndarray,
    flow: np.ndarray,
    warp_x: np.ndarray,
    t_cols: np.ndarray,
    invert_t: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """NovelView.cpp:176-224. src (4, H, W) RGBA; flow (2, H, W);
    warp_x/t_cols (chunk_w,). Returns (novel (4, H, chunk_w),
    flow_mag (H, chunk_w))."""
    C, H, W = src.shape
    Wc = len(warp_x)
    novel = np.zeros((C, H, Wc), np.float64)
    mag = np.zeros((H, Wc), np.float64)
    for yo in range(H):
        for xo in range(Wc):
            # remappedFlow = remap(flow, (lazyWarp.x, lazyWarp.y=y))
            fdir = sample_bicubic(flow, warp_x[xo], float(yo))
            t = (1.0 - t_cols[xo]) if invert_t else t_cols[xo]
            # warpComposition = lazyWarp + flowDir * t
            px = sample_bicubic(
                src, warp_x[xo] + fdir[0] * t, yo + fdir[1] * t
            )
            px[3] *= 1.0 - t  # pack (1 - t) into alpha
            novel[:, yo, xo] = px
            mag[yo, xo] = math.hypot(fdir[0], fdir[1])
    return novel, mag


def combine_lazy_views(
    novel_l: np.ndarray,
    novel_r: np.ndarray,
    mag_l: np.ndarray,
    mag_r: np.ndarray,
) -> np.ndarray:
    """combineLazyViews (NovelView.cpp:101-154): alpha-ratio blend pulled
    toward a flow-magnitude-weighted softmax by tanh(10 * colorDiff).
    Inputs (4, H, Wc) / (H, Wc); returns (4, H, Wc)."""
    k_color_diff_coef = 10.0
    k_sharpness = 10.0
    k_flow_mag_coef = 20.0
    C, H, Wc = novel_l.shape
    out = np.zeros((4, H, Wc), np.float64)
    for y in range(H):
        for x in range(Wc):
            a_l = novel_l[3, y, x]
            a_r = novel_r[3, y, x]
            # the reference binarizes via outAlpha in the three early
            # branches but writes alpha=255 unconditionally in the
            # blended branch (NovelView.cpp:147); with both alphas > 0.1
            # somewhere the two conventions agree — fixtures avoid pixels
            # where BOTH alphas sit in (0, 0.1]
            out_alpha = 1.0 if max(a_l, a_r) > 0.1 else 0.0
            if a_l == 0.0 and a_r == 0.0:
                rgb = np.zeros(3)
            elif a_l == 0.0:
                rgb = novel_r[:3, y, x]
            elif a_r == 0.0:
                rgb = novel_l[:3, y, x]
            else:
                out_alpha = 1.0
                m_l = mag_l[y, x] / Wc
                m_r = mag_r[y, x] / Wc
                norm = a_l + a_r
                blend_l = a_l / norm
                blend_r = a_r / norm
                color_diff = float(
                    np.sum(np.abs(novel_l[:3, y, x] - novel_r[:3, y, x]))
                )
                deghost = math.tanh(color_diff * k_color_diff_coef)
                exp_l = math.exp(
                    k_sharpness * blend_l * (1.0 + k_flow_mag_coef * m_l)
                )
                exp_r = math.exp(
                    k_sharpness * blend_r * (1.0 + k_flow_mag_coef * m_r)
                )
                sum_exp = exp_l + exp_r + 1e-5
                softmax_l = exp_l / sum_exp
                softmax_r = exp_r / sum_exp
                w_l = blend_l + deghost * (softmax_l - blend_l)
                w_r = blend_r + deghost * (softmax_r - blend_r)
                rgb = novel_l[:3, y, x] * w_l + novel_r[:3, y, x] * w_r
            out[:3, y, x] = rgb
            out[3, y, x] = out_alpha
    return out


def combine_lazy_novel_views(
    image_l: np.ndarray,
    image_r: np.ndarray,
    flow_l_to_r: np.ndarray,
    flow_r_to_l: np.ndarray,
    chunk_w: int,
    verge: float,
) -> tuple[np.ndarray, np.ndarray]:
    """combineLazyNovelViews (NovelView.cpp:229-268): four lazy renders
    (eye x source; from-L uses flowRtoL, from-R uses flowLtoR inverted)
    then two deghost blends. Returns (chunk_left_eye, chunk_right_eye)."""
    cam_w = image_l.shape[-1]
    warp_l, t_cols = lazy_warp_buffer(chunk_w, cam_w, verge, "left")
    warp_r, _ = lazy_warp_buffer(chunk_w, cam_w, verge, "right")
    le_l, mag_ll = render_lazy_novel_view(
        image_l, flow_r_to_l, warp_l, t_cols, invert_t=False
    )
    le_r, mag_lr = render_lazy_novel_view(
        image_r, flow_l_to_r, warp_l, t_cols, invert_t=True
    )
    re_l, mag_rl = render_lazy_novel_view(
        image_l, flow_r_to_l, warp_r, t_cols, invert_t=False
    )
    re_r, mag_rr = render_lazy_novel_view(
        image_r, flow_l_to_r, warp_r, t_cols, invert_t=True
    )
    chunk_l = combine_lazy_views(le_l, le_r, mag_ll, mag_lr)
    chunk_r = combine_lazy_views(re_l, re_r, mag_rl, mag_rr)
    return chunk_l, chunk_r


def combine_novel_views(
    view_l: np.ndarray,
    blend_l: float,
    view_r: np.ndarray,
    blend_r: float,
    flow_l_to_r: np.ndarray,
    flow_r_to_l: np.ndarray,
) -> np.ndarray:
    """Eager combineNovelViews (NovelView.cpp:47-99): kFlowMagCoef = 100
    and the exponent weights blend * alpha (vs the lazy variant's
    alpha-ratio); the cross-wiring is flowRtoL -> expL."""
    k_flow_mag_coef = 100.0
    k_sharpness = 10.0
    k_color_diff_coef = 10.0
    C, H, W = view_l.shape
    out = np.zeros((4, H, W), np.float64)
    for y in range(H):
        for x in range(W):
            a_l = view_l[3, y, x]
            a_r = view_r[3, y, x]
            if a_l == 0.0 and a_r == 0.0:
                continue
            if a_l > 0.0 and a_r == 0.0:
                out[:3, y, x] = view_l[:3, y, x]
                out[3, y, x] = 1.0
                continue
            if a_l == 0.0 and a_r > 0.0:
                out[:3, y, x] = view_r[:3, y, x]
                out[3, y, x] = 1.0
                continue
            m_lr = (
                math.hypot(flow_l_to_r[0, y, x], flow_l_to_r[1, y, x]) / W
            )
            m_rl = (
                math.hypot(flow_r_to_l[0, y, x], flow_r_to_l[1, y, x]) / W
            )
            color_diff = float(
                np.sum(np.abs(view_l[:3, y, x] - view_r[:3, y, x]))
            )
            deghost = math.tanh(color_diff * k_color_diff_coef)
            exp_l = math.exp(
                k_sharpness * blend_l * a_l * (1.0 + k_flow_mag_coef * m_rl)
            )
            exp_r = math.exp(
                k_sharpness * blend_r * a_r * (1.0 + k_flow_mag_coef * m_lr)
            )
            sum_exp = exp_l + exp_r + 1e-5
            softmax_l = exp_l / sum_exp
            softmax_r = exp_r / sum_exp
            w_l = blend_l + deghost * (softmax_l - blend_l)
            w_r = blend_r + deghost * (softmax_r - blend_r)
            out[:3, y, x] = view_l[:3, y, x] * w_l + view_r[:3, y, x] * w_r
            out[3, y, x] = 1.0
    return out
