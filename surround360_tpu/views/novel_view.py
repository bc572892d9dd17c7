"""Flow-based novel-view synthesis.

Rebuild of surround360_render/source/optical_flow/NovelView.{h,cpp}. The
reference's LazyNovelViewBuffer is a per-chunk (x, y, t) table whose x is an
affine function of the chunk column and whose y is the identity
(renderStereoPanoramaChunksThread, TestRenderStereoPanorama.cpp:259-292) —
so here it collapses to two closed-form per-column vectors (sample column +
shift t) and the whole "lazy render" becomes:

  1. a column resampling of the flow field (1-D bicubic in x: the warp's y
     is integral) — expressed as an MXU matmul with a precomputed
     column-sampling matrix;
  2. one true 2-D bicubic remap of the source image at
     (warp_x + t * flow_x, y + t * flow_y) (NovelView.cpp:174-224);
  3. the softmax/deghost blend of the from-L and from-R renders
     (combineLazyViews, NovelView.cpp:101-154).

Everything is batched over pairs: images (B, 4, H, W), flows (B, 2, H, W).
"""

from __future__ import annotations

from ..ops.precision import F32_PRECISION as _F32_PRECISION

import os as _os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..flow import HINT_LEFT, HINT_RIGHT, compute_flow
from ..ops.remap import remap
from ..ops.resize import resize_matrix_cubic  # noqa: F401  (same tap math)
from ..ops.window_sampler import sample_displaced, sample_displaced_residual

__all__ = [
    "lazy_warp_columns",
    "render_lazy_novel_view",
    "combine_lazy_views",
    "render_chunk_pair",
    "prepare_pair_flows",
    "generate_novel_view",
    "combine_novel_views",
]


# Halo sizes above which the lazy render switches to displacement-
# following residual windows (sample_displaced_residual): below them the
# static windows are small enough that following origins buys nothing.
# Module-level so tests can force the residual path at small scales.
RESIDUAL_MIN_HALO_Y = 64
RESIDUAL_MIN_HALO_X = 96

# Residual-window tiling of the lazy render, env-tunable for perf A/B
# (S360_NOVEL_TR/TC/RHY/RHX). The kernel pads window cols to a multiple
# of 128, so tc=64's (tc + 2*rhx + 3 = 147)-col window DMAs 256 cols —
# 42% wasted bytes; tc=128 fills the same padded window with 2x the
# output pixels. res halos must cover the within-tile displacement
# spread (t-ramp slope x tile cols + local flow texture): taps beyond
# them sample zero, so too-small halos show up directly in the
# preset-quality PSNR (BASELINE.md round-4 table re-run on change).
NOVEL_RESIDUAL_TR = int(_os.environ.get("S360_NOVEL_TR", "8"))
NOVEL_RESIDUAL_TC = int(_os.environ.get("S360_NOVEL_TC", "64"))
NOVEL_RESIDUAL_RHY = int(_os.environ.get("S360_NOVEL_RHY", "24"))
NOVEL_RESIDUAL_RHX = int(_os.environ.get("S360_NOVEL_RHX", "40"))


def lazy_warp_columns(
    chunk_width: int,
    cam_image_width: int,
    verge_displacement: float,
    eye: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-column (sample_x, t) for one eye's chunk
    (TestRenderStereoPanorama.cpp:271-285): column nv of the chunk samples
    source column camW/2 - (numNovelViews - nv) +- verge, at time
    t = nv / numNovelViews (+ for left eye, - for right)."""
    nv = np.arange(chunk_width, dtype=np.float64)
    shift = nv / chunk_width
    slab = cam_image_width * 0.5 - (chunk_width - nv)
    sign = 1.0 if eye == "left" else -1.0
    warp_x = slab + sign * verge_displacement
    return warp_x.astype(np.float32), shift.astype(np.float32)


@lru_cache(maxsize=64)
def _column_sample_matrix(src_width: int, warp_x_key: tuple) -> np.ndarray:
    """(chunk_w, src_w) bicubic column-sampling matrix S with clamped
    borders: sampled[:, c] = sum_w S[c, w] * field[:, w]."""
    a = -0.75
    warp_x = np.asarray(warp_x_key, dtype=np.float64)
    i0 = np.floor(warp_x).astype(np.int64)
    t = warp_x - i0
    m = np.zeros((len(warp_x), src_width), dtype=np.float64)
    rows = np.arange(len(warp_x))

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    for tap, w in enumerate([k12(t + 1.0), k01(t), k01(1.0 - t), k12(2.0 - t)]):
        j = np.clip(i0 - 1 + tap, 0, src_width - 1)
        np.add.at(m, (rows, j), w)
    return m.astype(np.float32)


def _lazy_warp_compose(flow, warp_x: np.ndarray, t_cols: np.ndarray,
                       invert_t: bool):
    """Flow resample + warp composition of one lazy render (the cheap
    half of NovelView.cpp:174-224): returns (warp_comp_x, warp_comp_y,
    t (Wc,), flow_mag (B, H, Wc))."""
    B, _, H, W = flow.shape
    # 1. resample flow at the lazy warp columns — 1-D bicubic as matmul
    S = jnp.asarray(_column_sample_matrix(W, tuple(np.round(warp_x, 6))))
    remapped_flow = jnp.einsum(
        "cw,bfhw->bfhc", S, flow, precision=_F32_PRECISION
    )  # (B, 2, H, Wc)
    t = jnp.asarray(1.0 - t_cols if invert_t else t_cols)  # (Wc,)
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    warp_comp_x = jnp.asarray(warp_x)[None, None, :] + remapped_flow[:, 0] * t
    warp_comp_y = gy[None] + remapped_flow[:, 1] * t
    flow_mag = jnp.sqrt(
        remapped_flow[:, 0] ** 2 + remapped_flow[:, 1] ** 2
    )
    return warp_comp_x, warp_comp_y, t, flow_mag


def render_lazy_novel_view(
    src,
    flow,
    warp_x: np.ndarray,
    t_cols: np.ndarray,
    invert_t: bool,
):
    """One of the four per-pair lazy renders (NovelView.cpp:174-224).

    src: (B, 4, H, W) RGBA; flow: (B, 2, H, W); warp_x/t_cols: (chunk_w,)
    per-column sample positions and shifts. Returns (novel (B, 4, H, Wc),
    flow_mag (B, H, Wc))."""
    B, C, H, W = src.shape
    Wc = len(warp_x)
    warp_comp_x, warp_comp_y, t, flow_mag = _lazy_warp_compose(
        flow, warp_x, t_cols, invert_t
    )
    # 2. sample the source. The lazy warp is identity + constant offset
    # (warp_x[c] = c + delta exactly, TestRenderStereoPanorama.cpp:
    # 278-279), so after slicing the source at floor(delta) the residual
    # displacement is frac(delta) + t*flow — bounded — and the
    # static-window banded sampler applies.
    # slice margin: bicubic taps reach 2 px left of a sample, so slicing
    # exactly at floor(warp_x[0]) silently dropped the left taps of the
    # chunk's first column (t=0 there, so the sample sits fixed at
    # frac(warp_x[0]) from the slice edge — a constant ~4e-2 error down
    # every chunk seam, caught by tests/test_oracle_novel_view.py)
    delta_i = int(np.floor(warp_x[0])) - 3
    if 0 < delta_i < W - Wc:
        src_al = src[..., delta_i:]
        halo_x = max(8, int(0.20 * src_al.shape[-1]))
        halo_y = max(8, int(0.10 * H))
        if halo_y > RESIDUAL_MIN_HALO_Y or halo_x > RESIDUAL_MIN_HALO_X:
            # preset-scale strips: the t*flow warp is smooth (t is a
            # static per-column ramp, flow is blurred disparity), so
            # displacement-following windows cover only the within-tile
            # spread (~ |flow| * tile_cols/chunk_w + local flow texture)
            # instead of the global 10-20% halos — the arithmetic that
            # made novel view 2.3-6.3 s/frame at 6k/8k (BASELINE.md)
            novel = sample_displaced_residual(
                src_al,
                warp_comp_x - delta_i,
                warp_comp_y,
                halo_y=halo_y,
                halo_x=halo_x,
                res_halo_y=min(halo_y, NOVEL_RESIDUAL_RHY),
                res_halo_x=min(halo_x, NOVEL_RESIDUAL_RHX),
                interpolation="bicubic",
                border="constant",
                tr=NOVEL_RESIDUAL_TR,
                tc=NOVEL_RESIDUAL_TC,
                group=32,
            )
        else:
            novel = sample_displaced(
                src_al,
                warp_comp_x - delta_i,
                warp_comp_y,
                halo_y=halo_y,
                halo_x=halo_x,
                interpolation="bicubic",
                border="constant",
                tr=8,
                tc=128,
                # bound window/one-hot memory at preset-scale chunk widths
                max_window_elems=64 * 1024 * 1024,
            )
    else:
        coords = jnp.stack([warp_comp_x, warp_comp_y], axis=1)
        novel = remap(src, coords, interpolation="bicubic", border="constant")
    # 3. pack (1 - t) into alpha; keep flow magnitude for the blend
    alpha = novel[:, 3] * (1.0 - t)[None, None, :]
    novel = jnp.concatenate([novel[:, :3], alpha[:, None]], axis=1)
    return novel, flow_mag


def combine_lazy_views(novel_l, novel_r, mag_l, mag_r):
    """Blend the from-L and from-R renders (combineLazyViews,
    NovelView.cpp:101-154). Inputs (B, 4, H, Wc) / (B, H, Wc); returns
    (B, 4, H, Wc) with binarized output alpha."""
    k_color_diff_coef = 10.0
    k_sharpness = 10.0
    k_flow_mag_coef = 20.0

    W_img = novel_l.shape[-1]
    a_l = novel_l[:, 3]
    a_r = novel_r[:, 3]
    out_alpha = (jnp.maximum(a_l, a_r) > 0.1).astype(novel_l.dtype)

    norm = a_l + a_r
    safe_norm = jnp.where(norm == 0, 1.0, norm)
    blend_l = a_l / safe_norm
    blend_r = a_r / safe_norm

    mag_ln = mag_l / W_img
    mag_rn = mag_r / W_img
    color_diff = jnp.sum(jnp.abs(novel_l[:, :3] - novel_r[:, :3]), axis=1)
    deghost = jnp.tanh(color_diff * k_color_diff_coef)
    exp_l = jnp.exp(k_sharpness * blend_l * (1.0 + k_flow_mag_coef * mag_ln))
    exp_r = jnp.exp(k_sharpness * blend_r * (1.0 + k_flow_mag_coef * mag_rn))
    sum_exp = exp_l + exp_r + 1e-5
    softmax_l = exp_l / sum_exp
    softmax_r = exp_r / sum_exp

    w_l = blend_l + deghost * (softmax_l - blend_l)
    w_r = blend_r + deghost * (softmax_r - blend_r)

    both = (a_l > 0) & (a_r > 0)
    only_l = (a_l > 0) & ~both
    only_r = (a_r > 0) & ~both
    rgb_blend = novel_l[:, :3] * w_l[:, None] + novel_r[:, :3] * w_r[:, None]
    rgb = jnp.where(
        both[:, None],
        rgb_blend,
        jnp.where(only_l[:, None], novel_l[:, :3],
                  jnp.where(only_r[:, None], novel_r[:, :3], 0.0)),
    )
    return jnp.concatenate([rgb, out_alpha[:, None]], axis=1)


def render_chunk_pair(
    image_l,
    image_r,
    flow_l_to_r,
    flow_r_to_l,
    warp_x_l,
    t_cols,
    warp_x_r,
):
    """Render one camera pair's left/right-eye panorama chunks
    (combineLazyNovelViews, NovelView.cpp:226-268): 4 lazy renders (eye x
    source) followed by 2 deghost blends. All inputs batched over pairs.

    warp_x_l / warp_x_r: (chunk_w,) HOST numpy column warps for left/right
    eye; t_cols: (chunk_w,) shifts. Not jitted itself — callers jit the
    surrounding pipeline and these fold in as compile-time constants.
    Returns (chunk_left_eye, chunk_right_eye): (B, 4, H, chunk_w).

    The four source samplings ride ONE batched residual-sampler launch
    (lead axis = render x pair) instead of four sequential ones: the
    stage was latency-bound on grid-step count at preset scale (688 ms,
    0.2 TF/s at 6k — BASELINE.md round-4 roofline), and one launch keeps
    the double-buffered window DMA pipeline warm across all 4 x B leads.
    The reference renders the 4 views independently
    (NovelView.cpp:229-268) — same math, different schedule."""
    B, C, H, W = image_l.shape
    Wc = len(warp_x_l)
    renders = (
        (image_l, flow_r_to_l, warp_x_l, False),
        (image_r, flow_l_to_r, warp_x_l, True),
        (image_l, flow_r_to_l, warp_x_r, False),
        (image_r, flow_l_to_r, warp_x_r, True),
    )
    comps = [
        _lazy_warp_compose(flow, wx, t_cols, inv)
        for (_, flow, wx, inv) in renders
    ]
    # common slice offset (bicubic taps reach 2 px left of a sample)
    delta_i = int(np.floor(min(warp_x_l[0], warp_x_r[0]))) - 3
    if 0 < delta_i < W - Wc:
        srcs = jnp.stack([img[..., delta_i:] for (img, *_ ) in renders])
        xs = jnp.stack([c[0] - delta_i for c in comps])  # (4, B, H, Wc)
        ys = jnp.stack([c[1] for c in comps])
        src_w = srcs.shape[-1]
        halo_x = max(8, int(0.20 * src_w))
        halo_y = max(8, int(0.10 * H))
        if halo_y > RESIDUAL_MIN_HALO_Y or halo_x > RESIDUAL_MIN_HALO_X:
            novel4 = sample_displaced_residual(
                srcs, xs, ys,
                halo_y=halo_y,
                halo_x=halo_x,
                res_halo_y=min(halo_y, NOVEL_RESIDUAL_RHY),
                res_halo_x=min(halo_x, NOVEL_RESIDUAL_RHX),
                interpolation="bicubic",
                border="constant",
                tr=NOVEL_RESIDUAL_TR,
                tc=NOVEL_RESIDUAL_TC,
                group=32,
            )
        else:
            novel4 = sample_displaced(
                srcs, xs, ys,
                halo_y=halo_y,
                halo_x=halo_x,
                interpolation="bicubic",
                border="constant",
                tr=8,
                tc=128,
                max_window_elems=64 * 1024 * 1024,
            )
        views = []
        for i, (c, (_, _, _, inv)) in enumerate(zip(comps, renders)):
            t = c[2]
            alpha = novel4[i, :, 3] * (1.0 - t)[None, None, :]
            views.append(
                jnp.concatenate([novel4[i, :, :3], alpha[:, None]], axis=1)
            )
        mags = [c[3] for c in comps]
    else:
        views, mags = [], []
        for (img, flow, wx, inv) in renders:
            v, m = render_lazy_novel_view(img, flow, wx, t_cols, inv)
            views.append(v)
            mags.append(m)
    chunk_l = combine_lazy_views(views[0], views[1], mags[0], mags[1])
    chunk_r = combine_lazy_views(views[2], views[3], mags[2], mags[3])
    return chunk_l, chunk_r


def prepare_pair_flows(
    overlap_l,
    overlap_r,
    params,
    prev_flow_l_to_r=None,
    prev_flow_r_to_l=None,
    prev_overlap_l=None,
    prev_overlap_r=None,
    use_temporal: bool = False,
):
    """Asymmetric pair flows (NovelViewGeneratorAsymmetricFlow::prepare,
    NovelView.cpp:270-299): L->R with hint LEFT, R->L with hint RIGHT,
    each with its own temporal prior. Batched over pairs (B, 4, H, W)."""
    B = overlap_l.shape[0]
    hint_l = jnp.full((B,), HINT_LEFT, jnp.int32)
    hint_r = jnp.full((B,), HINT_RIGHT, jnp.int32)
    flow_l_to_r = compute_flow(
        overlap_l,
        overlap_r,
        params,
        hint=hint_l,
        prev_flow=prev_flow_l_to_r,
        prev_img0=prev_overlap_l,
        prev_img1=prev_overlap_r,
        use_temporal=use_temporal,
    )
    flow_r_to_l = compute_flow(
        overlap_r,
        overlap_l,
        params,
        hint=hint_r,
        prev_flow=prev_flow_r_to_l,
        prev_img0=prev_overlap_r,
        prev_img1=prev_overlap_l,
        use_temporal=use_temporal,
    )
    return flow_l_to_r, flow_r_to_l


# ---------------------------------------------------------------------------
# eager novel-view path (TestOpticalFlow uses these; NovelView.cpp:27-99)
# ---------------------------------------------------------------------------


def generate_novel_view(src, reverse_flow, t: float):
    """Shifted view at time t: sample src at p + t * reverse_flow
    (generateNovelViewSimpleCvRemap, NovelView.cpp:27-45)."""
    B, C, H, W = src.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    coords = jnp.stack([gx[None] + reverse_flow[:, 0] * t,
                        gy[None] + reverse_flow[:, 1] * t], axis=1)
    return remap(src, coords, interpolation="bicubic", border="constant")


def combine_novel_views(view_l, blend_l, view_r, blend_r, flow_l_to_r, flow_r_to_l):
    """Eager blend (combineNovelViews, NovelView.cpp:47-99); constants
    kColorDiffCoef=10, kSoftmaxSharpness=10, kFlowMagCoef=100."""
    k_flow_mag_coef = 100.0
    k_sharpness = 10.0
    k_color_diff_coef = 10.0
    W_img = view_l.shape[-1]
    a_l = view_l[:, 3]
    a_r = view_r[:, 3]
    mag_lr = jnp.sqrt(flow_l_to_r[:, 0] ** 2 + flow_l_to_r[:, 1] ** 2) / W_img
    mag_rl = jnp.sqrt(flow_r_to_l[:, 0] ** 2 + flow_r_to_l[:, 1] ** 2) / W_img
    color_diff = jnp.sum(jnp.abs(view_l[:, :3] - view_r[:, :3]), axis=1)
    deghost = jnp.tanh(color_diff * k_color_diff_coef)
    exp_l = jnp.exp(k_sharpness * blend_l * a_l * (1.0 + k_flow_mag_coef * mag_rl))
    exp_r = jnp.exp(k_sharpness * blend_r * a_r * (1.0 + k_flow_mag_coef * mag_lr))
    sum_exp = exp_l + exp_r + 1e-5
    softmax_l = exp_l / sum_exp
    softmax_r = exp_r / sum_exp
    w_l = blend_l + deghost * (softmax_l - blend_l)
    w_r = blend_r + deghost * (softmax_r - blend_r)
    both = (a_l > 0) & (a_r > 0)
    only_l = (a_l > 0) & ~both
    only_r = (a_r > 0) & ~both
    rgb = jnp.where(
        both[:, None],
        view_l[:, :3] * w_l[:, None] + view_r[:, :3] * w_r[:, None],
        jnp.where(only_l[:, None], view_l[:, :3],
                  jnp.where(only_r[:, None], view_r[:, :3], 0.0)),
    )
    alpha = ((a_l > 0) | (a_r > 0)).astype(view_l.dtype)
    return jnp.concatenate([rgb, alpha[:, None]], axis=1)
