"""TPU-native pyramidal patch-match optical flow.

Rebuild of the reference's PixFlow estimator
(surround360_render/source/optical_flow/PixFlow.h) with the same inputs,
outputs, energy function, and pyramid/temporal contract — but a parallel
inner loop. The reference runs two *sequential* raster sweeps per pyramid
level, each pixel proposing its predecessor's flow then taking a numeric-
gradient descent step (PixFlow.h:388-410). That is unvectorizable by
construction, so here each level instead runs K data-parallel rounds of:

  1. jump-flooding neighbor propagation: every pixel evaluates its own flow
     against candidates shifted from 4 neighbors at offset d (d follows a
     [4,2,1,1,...] schedule, so information travels ~2^k pixels in k rounds,
     standing in for the raster sweep's unbounded reach — the pyramid
     provides the long-range transport in both designs);
  2. the same numeric-gradient descent step on the energy
     (PixFlow.h:195-217), eps=0.001, step=gradientStepSize;

with the reference's 5x5 median between "sweeps" (PixFlow.h:398,411),
low-alpha flow diffusion (PixFlow.h:437-454), optional coarse-level
direction-hinted brute-force search (PixFlow.h:298-342), and temporal
regularization toward the previous frame weighted by a motion map
(PixFlow.h:109-117,185-193).

The energy matches PixFlow.h:493-534: gradient-constancy data term
|grad I0(p) - grad I1(p + f)| (bilinear-extend sampling), smoothness
toward a sigma=8 blurred flow, and per-axis magnitude regularizers.

Everything is batched: images are (B, 4, H, W) RGBA in [0,1] and the flow
(B, 2, H, W), so all 14 ring pairs x 2 directions run as one XLA program.
All shapes are static per pyramid level; the level loop unrolls under jit.
"""

from __future__ import annotations

from ..ops.precision import F32_PRECISION as _F32_PRECISION

from functools import partial
from typing import NamedTuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import median_filter, median_filter_5x5_separable
from ..ops.resize import gaussian_blur, resize_bilinear, resize_cubic
from ..ops.window_sampler import (
    make_window_sampler,
    plan_windows_budgeted,
)

HINT_UNKNOWN = 0
HINT_LEFT = 1
HINT_RIGHT = 2
HINT_DOWN = 3
HINT_UP = 4

# constants mirrored from PixFlow.h:37-49
PYR_MIN_IMAGE_SIZE = 24
GRAD_EPSILON = 0.001
UPDATE_ALPHA_THRESHOLD = 0.9
MEDIAN_BLUR_SIZE = 5
PRE_BLUR_KSIZE = 5
PRE_BLUR_SIGMA = 0.25
FINAL_FLOW_BLUR_KSIZE = 3
FINAL_FLOW_BLUR_SIGMA = 1.0
GRADIENT_BLUR_KSIZE = 3
GRADIENT_BLUR_SIGMA = 0.5
BLURRED_FLOW_KSIZE = 15
BLURRED_FLOW_SIGMA = 8.0


class FlowParams(NamedTuple):
    """Hyperparameters (OpticalFlowFactory.h:25-61) plus the TPU-side
    propagation schedule."""

    pyr_scale_factor: float = 0.9
    smoothness_coef: float = 0.001
    vertical_regularization_coef: float = 0.01
    horizontal_regularization_coef: float = 0.01
    gradient_step_size: float = 0.5
    downscale_factor: float = 0.5
    directional_regularization_coef: float = 0.0
    use_directional_regularization: bool = False
    search_max_percentage: int = 0  # pixflow_search_20 -> 20
    # TPU reformulation knobs: two "sweeps", each = len(offsets) rounds
    prop_offsets: tuple = (4, 2, 1)
    # shorter schedule for the finest level (it holds most of the pixels
    # and its flow arrives mostly-correct from the coarser level); empty
    # tuple = use prop_offsets everywhere
    fine_prop_offsets: tuple = ()
    use_probe_candidates: bool = False
    # candidate-ranking sampler for the legacy gather backend ("bilinear"
    # or "nearest"); the production path ranks with the exact one-hot
    # matmul sampler on every level, so this only matters if the gather
    # backend is re-enabled
    rank_sampler: str = "bilinear"
    min_image_size: int = PYR_MIN_IMAGE_SIZE
    # static window-sampler halos as fractions of each pyramid level's
    # width/height: the max |flow| the banded sampler resolves per axis.
    # Flows beyond the halo read zero-weight taps (a high-energy
    # candidate), bounding the search like the reference's regularizers
    # bound it softly. Sized for side-pair disparity (x-dominant); the
    # pole call-site overrides with y-dominant halos.
    window_halo_x_frac: float = 0.25
    window_halo_y_frac: float = 0.12
    window_min_halo: int = 6
    # output tile width for the banded sampler; smaller tiles shrink the
    # per-tile window (tc + 2*halo) toward MXU-friendly sub-128 widths
    window_tile_cols: int = 16
    # rank candidates through the OFFSET formulation: every ranking
    # candidate's sample position equals base_warp + constant integer
    # offset (neighbor-shifted flows and +-d probes alike), so one
    # interpolation-matrix build serves all ~13 fields (lane-rolled
    # window slices on the TPU kernel; folded offset coords on the XLA
    # fallback). Unrolls the propagation rounds (d must be static).
    offset_ranking: bool = False
    # rebase the I1 gradient basis to the current flow once per round and
    # sample error fields at small residual displacements (see
    # _propagation_and_search); ~3-4x cheaper per field
    residual_rebase: bool = False
    # MXU precision for the error-field sampling contractions ONLY
    # (candidate ranking + descent gradients): "float32" = exact
    # multi-pass; "default" = single-pass bf16 MXU. Output warps always
    # sample at float32 regardless.
    error_sampler_precision: str = "float32"


def make_flow_params(name: str) -> FlowParams:
    """Name -> params, mirroring makeOpticalFlowByName
    (OpticalFlowFactory.h:23-64), plus a faster half-octave TPU preset."""
    if name == "pixflow_low":
        return FlowParams()
    if name == "pixflow_search_20":
        return FlowParams(search_max_percentage=20)
    if name == "pixflow_tpu":
        # half-octave pyramid: ~7x fewer levels than 0.9, with probe
        # candidates so coarse init can escape the descent basin; quality
        # validated by the Middlebury-style harness in tests/test_flow.py
        return FlowParams(
            pyr_scale_factor=0.5,
            prop_offsets=(8, 4, 2, 1),
            fine_prop_offsets=(2, 1),
            use_probe_candidates=True,
            rank_sampler="nearest",
            min_image_size=12,
            # single-pass bf16 MXU for error-field ranking: measured
            # equal-or-better interpolation RMSE on every harness scene
            # (2026-08-17 TPU run) and +16% full-frame fps at 2016
            error_sampler_precision="default",
        )
    if name == "pixflow_tpu_offsets":
        # pixflow_tpu + shared-build offset ranking (round-4 experiment):
        # candidate error fields source from ONE interpolation-matrix
        # build (ops/pallas_remap.py offsets mode). Quality-equal or
        # better on the harness (rotation RMSE 0.0031 -> 0.0025), but
        # measured only ~parity with the XLA einsum route on-chip
        # (side-L0 ranking 72 ms vs ~70 XLA) at multi-minute Mosaic
        # compile per kernel instance — kept opt-in until the kernel's
        # per-lead overhead (57 us vs ~12 modeled) is understood.
        return make_flow_params("pixflow_tpu")._replace(offset_ranking=True)
    if name == "pixflow_tpu_fast":
        # pixflow_tpu + level-rebased residual sampling on large levels:
        # ~2-3x cheaper error fields at the finest level for a measured
        # ~15% interpolation-RMSE cost where it engages (still well under
        # the no-flow baseline; see BASELINE.md)
        return make_flow_params("pixflow_tpu")._replace(residual_rebase=True)
    if name == "pixflow_tpu_bf16":
        # alias (bf16 error sampling became the pixflow_tpu default)
        return make_flow_params("pixflow_tpu")
    if name == "pixflow_tpu_f32":
        # exact multi-pass f32 error-field sampling (the pre-bf16 path)
        return make_flow_params("pixflow_tpu")._replace(
            error_sampler_precision="float32"
        )
    raise ValueError(f"unrecognized flow algorithm name: {name}")


# ---------------------------------------------------------------------------
# small dense helpers
# ---------------------------------------------------------------------------


def _gather_hw(img, iy, ix):
    """img (..., H, W), int indices (..., h, w); leading dims broadcast
    (e.g. a (B, H, W) image indexed by (K, B, h, w) candidate coords)."""
    H, W = img.shape[-2:]
    out_hw = iy.shape[-2:]
    lead = jnp.broadcast_shapes(img.shape[:-2], iy.shape[:-2])
    img_b = jnp.broadcast_to(img, lead + (H, W))
    iy = jnp.broadcast_to(iy, lead + out_hw)
    ix = jnp.broadcast_to(ix, lead + out_hw)
    flat_img = img_b.reshape(lead + (H * W,))
    idx = (iy * W + ix).reshape(lead + (-1,))
    out = jnp.take_along_axis(flat_img, idx, axis=-1)
    return out.reshape(lead + out_hw)


def _sample_bilinear_extend(img, x, y):
    """Bilinear sample with clamp-to-[0, size-2] semantics, exactly like
    getPixBilinear32FExtend (PixFlow.h:457-475). img (..., H, W); x/y same
    shape as output."""
    H, W = img.shape[-2:]
    x = jnp.clip(x, 0.0, W - 2.0)
    y = jnp.clip(y, 0.0, H - 2.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)
    f00 = _gather_hw(img, iy, ix)
    f10 = _gather_hw(img, iy, ix + 1)
    f01 = _gather_hw(img, iy + 1, ix)
    f11 = _gather_hw(img, iy + 1, ix + 1)
    return (
        f00
        + (f10 - f00) * tx
        + (f01 - f00) * ty
        + (f00 + f11 - f10 - f01) * tx * ty
    )


def _sample_nearest_extend(img, x, y):
    """Nearest-neighbor sample with edge clamp — 1 gather instead of 4.
    Used only to *rank* propagation candidates (TPU gathers dominate the
    flow runtime); the kept flow's error and the descent step still use
    the reference's bilinear sampling."""
    H, W = img.shape[-2:]
    ix = jnp.clip(jnp.round(x), 0, W - 1).astype(jnp.int32)
    iy = jnp.clip(jnp.round(y), 0, H - 1).astype(jnp.int32)
    return _gather_hw(img, iy, ix)


# Target elements for one chunk's (B, C, Pc, H) stage-A intermediate in the
# matmul sampler (chunked over output rows when a level exceeds it).
MATMUL_SAMPLER_MAX_ELEMS = 96 * 1024 * 1024

# Target elements for the window sampler's per-axis one-hot operands in one
# error-field contraction: bounds how many flow candidates ride a single
# batched sample (small levels take all ~13 at once; huge levels fall back
# to per-candidate eval with tile chunking).
ERROR_EVAL_MAX_ELEMS = 128 * 1024 * 1024

# Offset-ranking kernel tiling (pixflow_tpu_offsets preset), env-tunable
# for perf A/B: larger tiles amortize the kernel's measured ~57 us/step
# overhead (BASELINE.md round-4 offset-ranking experiment) over more
# output pixels per window DMA.
_OFFSET_RANK_TR = int(os.environ.get("S360_FLOW_OFFSET_TR", "8"))
_OFFSET_RANK_TC = int(os.environ.get("S360_FLOW_OFFSET_TC", "128"))

# Window-stack element budget for the flow samplers. Small tiles minimize
# matmul FLOPs (window area sets the contraction size) and are the
# measured-fast choice at bench scales, but overlapping windows duplicate
# the source by (bh*bw)/(tr*tc) — up to ~125x with the tuned tiles — so at
# preset-scale levels the stack must be re-planned with larger tiles to
# fit HBM. 256M elems (1 GB f32) keeps every bench-scale plan verbatim.
WINDOW_STACK_MAX_ELEMS = 256 * 1024 * 1024


def _sample_bilinear_matmul(img, x, y):
    """Exact bilinear-extend sampling as two MXU matmuls instead of
    gathers: out = OHy . (OHx . img) where OHx/OHy are per-pixel 2-hot
    interpolation matrices. XLA:TPU lowers arbitrary gathers to a ~80M
    elem/s scalar loop while the MXU runs these matmuls effectively for
    free at pyramid-level sizes. Output rows are chunked so the stage-A
    intermediate stays within MATMUL_SAMPLER_MAX_ELEMS.

    img (B, C, H, W); x, y (B, h_out, w_out) -> (B, C, h_out, w_out)."""
    B, C, H, W = img.shape
    out_shape = x.shape[1:]
    P = int(np.prod(out_shape))
    max_p = max(1, MATMUL_SAMPLER_MAX_ELEMS // max(B * C * H, 1))
    if P > max_p:
        # chunk the flattened output so the (B, C, Pc, H) intermediate
        # stays bounded
        n_chunks = -(-P // max_p)
        pc = -(-P // n_chunks)
        pad = n_chunks * pc - P
        xc = jnp.pad(x.reshape(B, P), [(0, 0), (0, pad)]).reshape(
            B, n_chunks, pc
        ).transpose(1, 0, 2)
        yc = jnp.pad(y.reshape(B, P), [(0, 0), (0, pad)]).reshape(
            B, n_chunks, pc
        ).transpose(1, 0, 2)
        out = jax.lax.map(
            lambda co: _sample_bilinear_matmul(
                img, co[0][:, :, None], co[1][:, :, None]
            ),
            jnp.stack([xc, yc], axis=1),
        )  # (n_chunks, B, C, pc, 1)
        out = out[..., 0].transpose(1, 2, 0, 3).reshape(B, C, n_chunks * pc)
        return out[:, :, :P].reshape((B, C) + out_shape)

    xf = jnp.clip(x.reshape(B, P), 0.0, W - 2.0)
    yf = jnp.clip(y.reshape(B, P), 0.0, H - 2.0)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    tx = (xf - x0)[..., None]
    ty = (yf - y0)[..., None]
    ix0 = x0.astype(jnp.int32)[..., None]
    iy0 = y0.astype(jnp.int32)[..., None]
    wgrid = jnp.arange(W, dtype=jnp.int32)
    hgrid = jnp.arange(H, dtype=jnp.int32)
    # full f32 matmuls: the numeric energy gradient differences values at
    # eps=1e-3, which bf16 sampling noise would swamp
    ohx = (
        (wgrid == ix0) * (1.0 - tx) + (wgrid == ix0 + 1) * tx
    ).astype(jnp.float32)  # (B, P, W)
    ohy = (
        (hgrid == iy0) * (1.0 - ty) + (hgrid == iy0 + 1) * ty
    ).astype(jnp.float32)  # (B, P, H)
    tmp = jnp.einsum(
        "bpw,bchw->bcph", ohx, img, precision=_F32_PRECISION
    )
    out = jnp.einsum("bph,bcph->bcp", ohy, tmp, precision=_F32_PRECISION)
    return out.reshape((B, C) + out_shape)


def _sobel_k1(img, axis):
    """Sobel with ksize=1 ([-1, 0, 1], border replicate), matching
    PixFlow.h:356-359."""
    shifted_p = jnp.roll(img, -1, axis=axis)
    shifted_m = jnp.roll(img, 1, axis=axis)
    # replicate border: derivative uses clamped neighbors
    if axis == -1:
        shifted_p = shifted_p.at[..., -1].set(img[..., -1])
        shifted_m = shifted_m.at[..., 0].set(img[..., 0])
    else:
        shifted_p = shifted_p.at[..., -1, :].set(img[..., -1, :])
        shifted_m = shifted_m.at[..., 0, :].set(img[..., 0, :])
    return shifted_p - shifted_m


def _box5(img):
    """5x5 box sum with zero padding (for patch SAD accumulations)."""
    out = img
    for axis in (-1, -2):
        acc = out
        for d in (1, 2):
            z = jnp.zeros_like(out)
            pos = jnp.roll(out, d, axis=axis)
            neg = jnp.roll(out, -d, axis=axis)
            if axis == -1:
                pos = pos.at[..., :d].set(0)
                neg = neg.at[..., -d:].set(0)
            else:
                pos = pos.at[..., :d, :].set(0)
                neg = neg.at[..., -d:, :].set(0)
            acc = acc + pos + neg
        out = acc
    return out


# ---------------------------------------------------------------------------
# energy function (PixFlow.h:493-534)
# ---------------------------------------------------------------------------


def _error_field(flow, ctx, params: FlowParams):
    """Energy at every pixel for candidate ``flow`` (..., 2, H, W).
    ``ctx`` holds I0x, I0y, sample_fn (bilinear-extend sampling of the
    stacked I1 gradient image), blurred_flow, gx, gy."""
    I0x, I0y, sample_fn, blurred_flow, gx, gy = ctx
    H, W = I0x.shape[-2:]
    # exact bilinear-extend sampling of the stacked I1 gradients
    mmx = jnp.clip(gx + flow[..., 0, :, :], 0.0, W - 2.0)
    mmy = jnp.clip(gy + flow[..., 1, :, :], 0.0, H - 2.0)
    g = sample_fn(mmx, mmy)
    return _error_from_samples(flow, g, ctx, params)


def _error_from_samples(flow, g, ctx, params: FlowParams):
    """Energy given already-sampled I1 gradients ``g`` (..., 2, H, W) for
    candidate ``flow`` — the data term of PixFlow.h:493-534 split from
    the sampling so the offset-ranking path can source samples from the
    shared-build offset fields."""
    I0x, I0y, _, blurred_flow, _, _ = ctx
    H, W = I0x.shape[-2:]
    i1x = g[..., 0, :, :]
    i1y = g[..., 1, :, :]
    data = jnp.sqrt((I0x - i1x) ** 2 + (I0y - i1y) ** 2)
    fdiff = blurred_flow - flow
    smooth = jnp.sqrt(fdiff[..., 0, :, :] ** 2 + fdiff[..., 1, :, :] ** 2)
    err = (
        data
        + smooth * params.smoothness_coef
        + params.vertical_regularization_coef * jnp.abs(flow[..., 1, :, :]) / W
        + params.horizontal_regularization_coef * jnp.abs(flow[..., 0, :, :]) / H
    )
    if params.use_directional_regularization:
        eps = 0.001
        bmag = jnp.sqrt(
            blurred_flow[..., 0, :, :] ** 2 + blurred_flow[..., 1, :, :] ** 2
        )
        fmag = jnp.sqrt(flow[..., 0, :, :] ** 2 + flow[..., 1, :, :] ** 2)
        dot = (
            blurred_flow[..., 0, :, :] * flow[..., 0, :, :]
            + blurred_flow[..., 1, :, :] * flow[..., 1, :, :]
        ) / ((bmag + eps) * (fmag + eps))
        err = err - params.directional_regularization_coef * dot
    return err


def _shift_traced(arr, dy, dx, fallback):
    """Shift (..., H, W) content by (dy, dx) pixels (traced scalars ok);
    positions whose source falls outside the frame take ``fallback``
    (out-of-range neighbor proposals become no-ops, like the reference
    sweep skipping nonexistent neighbors). roll + iota masks — no gather
    (XLA:TPU gathers are scalar loops)."""
    H, W = arr.shape[-2:]
    rolled = jnp.roll(arr, (dy, dx), axis=(-2, -1))
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    yv = (ys - dy >= 0) & (ys - dy < H)
    xv = (xs - dx >= 0) & (xs - dx < W)
    valid = yv[:, None] & xv[None, :]
    return jnp.where(valid, rolled, fallback)


def _shift_with_edge(arr, dy, dx):
    """Shift (..., H, W) content by (dy, dx) pixels with edge clamp: the
    value that lands at p came from p - (dy, dx)."""
    out = jnp.roll(arr, (dy, dx), axis=(-2, -1))
    if dy > 0:
        out = out.at[..., :dy, :].set(out[..., dy : dy + 1, :])
    elif dy < 0:
        out = out.at[..., dy:, :].set(out[..., dy - 1 : dy, :])
    if dx > 0:
        out = out.at[..., :, :dx].set(out[..., :, dx : dx + 1])
    elif dx < 0:
        out = out.at[..., :, dx:].set(out[..., :, dx - 1 : dx])
    return out


# ---------------------------------------------------------------------------
# per-level solver (replaces patchMatchPropagationAndSearch)
# ---------------------------------------------------------------------------


def _propagation_and_search(
    I0, I1, alpha0, alpha1, flow, params: FlowParams, is_finest: bool = False
):
    """One pyramid level. I0/I1/alpha0/alpha1: (B, H, W); flow (B, 2, H, W)."""
    B, H, W = I0.shape
    offsets = (
        params.fine_prop_offsets
        if (is_finest and params.fine_prop_offsets)
        else params.prop_offsets
    )

    I0x = _sobel_k1(I0, -1)
    I0y = _sobel_k1(I0, -2)
    I1x = _sobel_k1(I1, -1)
    I1y = _sobel_k1(I1, -2)
    blur = lambda a: gaussian_blur(
        a, GRADIENT_BLUR_SIGMA, ksize=GRADIENT_BLUR_KSIZE
    )
    I0x, I0y, I1x, I1y = blur(I0x), blur(I0y), blur(I1x), blur(I1y)
    # stacked gradient image: one gather fetches both channels
    I1g = jnp.stack([I1x, I1y], axis=-3)  # (B, 2, H, W)

    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    gate = (alpha0 > UPDATE_ALPHA_THRESHOLD) & (alpha1 > UPDATE_ALPHA_THRESHOLD)

    # Static-window banded sampling (ops/window_sampler.py): the I1
    # gradient windows are built ONCE per level and shared by every error
    # field (~15 per propagation round). Each output tile contracts only
    # its (bh x bw) window instead of the full (H x W) extent, so sampling
    # cost stays linear in pixel count as resolution grows. Flows beyond
    # the halos read zero weight — a high-energy candidate — bounding the
    # search the way the reference's magnitude regularizers do softly.
    halo_x = max(params.window_min_halo, int(params.window_halo_x_frac * W))
    halo_y = max(params.window_min_halo, int(params.window_halo_y_frac * H))
    _win_elems_per_px = int(np.prod(I1g.shape[:-2]))
    plan = plan_windows_budgeted(
        (H, W), (H, W), halo_y, halo_x, "bilinear", "clamp",
        tr=8, tc=params.window_tile_cols,
        elems_per_px=_win_elems_per_px,
        max_window_elems=WINDOW_STACK_MAX_ELEMS,
    )

    def _sampler_budget(pl):
        """(candidate group size, tile_chunk) so one contraction's one-hot
        operands stay near ERROR_EVAL_MAX_ELEMS."""
        cost = B * pl.nty * pl.tr * pl.ntx * pl.tc * (pl.bw + pl.bh)
        group = max(1, ERROR_EVAL_MAX_ELEMS // max(cost, 1))
        chunk = 0
        if cost > ERROR_EVAL_MAX_ELEMS:
            T = pl.nty * pl.ntx
            chunk = max(1, int(T * ERROR_EVAL_MAX_ELEMS / cost))
        return group, chunk

    cand_group, tile_chunk = _sampler_budget(plan)
    # Generic candidate sampling stays on the XLA einsum route: the fused
    # kernel's per-candidate interpolation-matrix builds measured SLOWER
    # than XLA's fused big einsums at 6k (side flow 595 -> 1118 ms,
    # round-4). The kernel wins only where the build is SHARED across
    # fields — the offset-ranking path below.
    base_sample_fn = make_window_sampler(
        I1g, (H, W), halo_y, halo_x, "bilinear", "clamp",
        tr=8, tc=128,
        precision=params.error_sampler_precision,
        xla_plan=plan, xla_tile_chunk=tile_chunk,
        backend="xla",
    )

    # Level rebasing (residual sampling): warp the I1 gradients ONCE by
    # the level's incoming flow — smooth and stable (it just passed the
    # coarser level's medians, diffusion, and cubic upsample) and snapped
    # to integer pixels so the warp copies exact gradient samples — then
    # evaluate every error field of the level at RESIDUAL displacements.
    # The level only refines flow by ~2*sum(offsets) px (the pyramid
    # contract), so the residual halo is small and per-field cost drops
    # ~2.5x at the finest level, which holds most of the pixels. Applied
    # only when the residual halo actually undercuts the full halos; the
    # approximation (sample-position error O(|r| * |grad f0|)) is
    # quality-gated by the flow tests and the BASELINE.md RMSE table.
    r_halo = 2 * sum(offsets) + 8
    tc_ = params.window_tile_cols
    residual_area = (tc_ + 2 * r_halo + 3) * (8 + 2 * r_halo + 3)
    full_area = plan.bw * plan.bh
    use_residual = (
        params.residual_rebase
        and residual_area < 0.75 * full_area
        and plan.ntx * plan.nty > 1
    )
    if use_residual:
        f0x = jnp.round(flow[..., 0, :, :])
        f0y = jnp.round(flow[..., 1, :, :])
        J = base_sample_fn(
            jnp.clip(gx + f0x, 0.0, W - 2.0),
            jnp.clip(gy + f0y, 0.0, H - 2.0),
        )  # (B, 2, H, W) = I1g warped by the level basis
        plan_r = plan_windows_budgeted(
            (H, W), (H, W), r_halo, r_halo, "bilinear", "clamp",
            tr=8, tc=params.window_tile_cols,
            elems_per_px=_win_elems_per_px,
            max_window_elems=WINDOW_STACK_MAX_ELEMS,
        )
        cand_group, tile_chunk_r = _sampler_budget(plan_r)
        res_sampler = make_window_sampler(
            J, (H, W), r_halo, r_halo, "bilinear", "clamp",
            tr=8, tc=128,
            precision=params.error_sampler_precision,
            xla_plan=plan_r, xla_tile_chunk=tile_chunk_r,
            backend="xla",
        )

        def sample_fn(mx, my):
            qx = jnp.clip(mx - f0x, 0.0, W - 2.0)
            qy = jnp.clip(my - f0y, 0.0, H - 2.0)
            return res_sampler(qx, qy)
    else:
        sample_fn = base_sample_fn

    use_offsets = params.offset_ranking and not use_residual
    off_samplers: dict = {}

    def sweep(flow):
        blurred_flow = gaussian_blur(
            flow, BLURRED_FLOW_SIGMA, ksize=BLURRED_FLOW_KSIZE
        )
        ctx = (I0x, I0y, sample_fn, blurred_flow, gx, gy)

        def select_and_descend(flow, cand, errs):
            """Pick the best candidate per pixel, then one numeric-gradient
            descent step (PixFlow.h:195-217). Shared by the traced-d scan
            round and the static-d offset-ranking round."""
            K = cand.shape[0]
            best = jnp.argmin(errs, axis=0)  # (B, H, W)
            # one-hot select instead of take_along_axis (scalar-loop gather)
            onehot = (
                best[None, :, None, :, :]
                == jnp.arange(K, dtype=best.dtype)[:, None, None, None, None]
            )
            flow_prop = jnp.sum(jnp.where(onehot, cand, 0.0), axis=0)
            curr_err = jnp.min(errs, axis=0)

            ex = jnp.zeros_like(flow_prop).at[..., 0, :, :].add(GRAD_EPSILON)
            ey = jnp.zeros_like(flow_prop).at[..., 1, :, :].add(GRAD_EPSILON)
            if cand_group >= 2:
                e2 = _error_field(
                    jnp.stack([flow_prop + ex, flow_prop + ey], axis=0),
                    ctx,
                    params,
                )
                err_x, err_y = e2[0], e2[1]
            else:
                err_x = _error_field(flow_prop + ex, ctx, params)
                err_y = _error_field(flow_prop + ey, ctx, params)
            gflow = (
                jnp.stack([err_x - curr_err, err_y - curr_err], axis=-3)
                / GRAD_EPSILON
            )
            flow_new = flow_prop - params.gradient_step_size * gflow
            return jnp.where(gate[:, None], flow_new, flow)

        _NEIGH = ((0, 1), (0, -1), (1, 0), (-1, 0))
        _PROBES = (
            (0, 1), (0, -1), (1, 0), (-1, 0),
            (1, 1), (1, -1), (-1, 1), (-1, -1),
        )

        def round_offsets(flow, d: int):
            """One propagation round with STATIC d: every candidate's
            sample position equals base_warp + constant integer offset
            (shift candidates: I1g(p + flow(p-v)) = W_v(p-v) for
            v = (dy d, dx d); probes: W_delta(p)), so all ~13 error fields
            source from ONE offset-sampler call that shares a single
            interpolation-matrix build (ops/pallas_remap.py offsets mode)."""
            probes = _PROBES if params.use_probe_candidates else ()
            offs = [(0, 0)] + [(py * d, px * d) for (py, px) in probes]
            for (dy, dx) in _NEIGH:
                if (dy * d, dx * d) not in offs:
                    offs.append((dy * d, dx * d))
            offs = tuple(offs)
            if (d, offs) not in off_samplers:
                # reproduce getPixBilinear32FExtend's clip-to-[0, n-2]
                # EXACTLY under the sampler's tap-clamp border: overwrite
                # the last column/row with column/row n-2, so every
                # position > n-2 reads the same value the clipped
                # coordinate would (positions <= n-2 never tap the last
                # column/row). Without this, offset taps lerp into the
                # gradient image's degenerate edge column — measured
                # rotation RMSE 0.0031 -> 0.0070.
                I1g_ext = I1g.at[..., :, W - 1].set(I1g[..., :, W - 2])
                I1g_ext = I1g_ext.at[..., H - 1, :].set(
                    I1g_ext[..., H - 2, :]
                )
                off_samplers[(d, offs)] = make_window_sampler(
                    I1g_ext, (H, W), halo_y, halo_x, "bilinear", "clamp",
                    tr=_OFFSET_RANK_TR, tc=_OFFSET_RANK_TC,
                    precision=params.error_sampler_precision,
                    offsets=offs,
                )
            smp = off_samplers[(d, offs)]
            bx = jnp.clip(gx + flow[..., 0, :, :], 0.0, W - 2.0)
            by = jnp.clip(gy + flow[..., 1, :, :], 0.0, H - 2.0)
            gofs = smp(bx, by)  # (O, B, 2, H, W)
            idx = {o: i for i, o in enumerate(offs)}
            cands = [flow]
            datas = [gofs[0]]
            for (dy, dx) in _NEIGH:
                v = (dy * d, dx * d)
                cands.append(_shift_traced(flow, *v, flow))
                datas.append(_shift_traced(gofs[idx[v]], *v, gofs[0]))
            zero = jnp.zeros_like(flow)
            for (py, px) in probes:
                delta = (
                    zero.at[..., 0, :, :].add(px * float(d))
                    .at[..., 1, :, :].add(py * float(d))
                )
                cands.append(flow + delta)
                datas.append(gofs[idx[(py * d, px * d)]])
            cand = jnp.stack(cands, axis=0)  # (K, B, 2, H, W)
            i1 = jnp.stack(datas, axis=0)
            # beyond-halo candidates must read ZERO samples (data term
            # |grad I0|, a high-energy candidate) exactly like the legacy
            # windowed sampler's dropped taps: that soft bound regularizes
            # the search (coarse levels probe at d=8 past the small halos)
            # and removing it measurably hurt (translation RMSE 0.0024 ->
            # 0.0062)
            beyond = (
                (jnp.abs(cand[..., 0, :, :]) > halo_x)
                | (jnp.abs(cand[..., 1, :, :]) > halo_y)
            )
            i1 = jnp.where(beyond[:, :, None], 0.0, i1)
            errs = _error_from_samples(cand, i1, ctx, params)
            return select_and_descend(flow, cand, errs)

        def round_fn(flow, d):
            # neighbor proposals at offset d in 4 directions, plus optional
            # absolute +-d probes (PatchMatch's random-search analog; the
            # reference's fine 0.9 pyramid makes them redundant there, but
            # they let coarser pyramids escape the ~1px descent basin).
            # d is traced so all rounds share one compiled body (lax.scan).
            candidates = [flow] + [
                _shift_traced(flow, dy * d, dx * d, flow)
                for (dy, dx) in ((0, 1), (0, -1), (1, 0), (-1, 0))
            ]
            if params.use_probe_candidates:
                df = d.astype(jnp.float32)
                zero = jnp.zeros_like(flow)
                for (py, px) in (
                    (0, 1), (0, -1), (1, 0), (-1, 0),
                    (1, 1), (1, -1), (-1, 1), (-1, -1),
                ):
                    delta = (
                        zero.at[..., 0, :, :].add(px * df)
                        .at[..., 1, :, :].add(py * df)
                    )
                    candidates.append(flow + delta)
            cand = jnp.stack(candidates, axis=0)  # (K, B, 2, H, W)
            # rank ALL candidates through as few contractions as the memory
            # budget allows: the window sampler folds the candidate dim into
            # the matmul's row axis against SHARED windows, so the ~13
            # sequential per-candidate error fields become 1-2 big MXU ops
            # (the flow inner loop is latency-bound at pyramid-level sizes)
            K = cand.shape[0]
            parts = [
                _error_field(cand[i : i + cand_group], ctx, params)
                for i in range(0, K, cand_group)
            ]
            errs = (
                jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            )
            return select_and_descend(flow, cand, errs), None

        if use_offsets:
            # static-d rounds, unrolled (the offset sampler's lane rolls
            # and window slices need compile-time d)
            for d in offsets:
                flow = round_offsets(flow, int(d))
            return flow
        ds = jnp.asarray(offsets, jnp.int32)
        flow, _ = jax.lax.scan(round_fn, flow, ds)
        return flow

    # two "sweeps" with a 5x5 median between and after (PixFlow.h:388-411);
    # the fast preset uses the separable 5-median (two 7-op networks vs a
    # 25-element sort)
    med = (
        median_filter_5x5_separable
        if params.rank_sampler == "nearest"
        else lambda f: median_filter(f, MEDIAN_BLUR_SIZE)
    )
    flow = sweep(flow)
    flow = med(flow)
    flow = sweep(flow)
    flow = med(flow)

    # low-alpha diffusion toward blurred flow (PixFlow.h:437-454)
    blurred_flow = gaussian_blur(flow, BLURRED_FLOW_SIGMA, ksize=BLURRED_FLOW_KSIZE)
    diffusion = (1.0 - alpha0 * alpha1)[:, None]
    flow = diffusion * blurred_flow + (1.0 - diffusion) * flow
    return flow


# ---------------------------------------------------------------------------
# coarse-level direction-hinted search (PixFlow.h:219-342)
# ---------------------------------------------------------------------------


def _search_distance(params: FlowParams) -> int:
    return (PYR_MIN_IMAGE_SIZE * params.search_max_percentage + 50) // 100


def _search_offsets(params: FlowParams):
    """Static union of the 4 hint boxes (computeSearchBox, PixFlow.h:279-296)
    as (dy, dx, hint_mask) triples; per-element hints select via masking."""
    dist = _search_distance(params)
    ratio = 8
    ortho = (dist + ratio // 2) // ratio
    offsets = []
    boxes = {
        HINT_RIGHT: (range(-ortho, ortho + 1), range(0, dist + 1)),
        HINT_LEFT: (range(-ortho, ortho + 1), range(-dist, 1)),
        HINT_DOWN: (range(0, dist + 1), range(-ortho, ortho + 1)),
        HINT_UP: (range(-dist, 1), range(-ortho, ortho + 1)),
    }
    union = {}
    for hint, (dys, dxs) in boxes.items():
        for dy in dys:
            for dx in dxs:
                union.setdefault((dy, dx), set()).add(hint)
    for (dy, dx), hints in sorted(union.items()):
        offsets.append((dy, dx, tuple(sorted(hints))))
    return offsets


def _adjust_initial_flow(I0, I1, alpha0, alpha1, flow, hint, params: FlowParams):
    """Brute-force 5x5-SAD search over the hint box at the coarsest level
    (adjustInitialFlow, PixFlow.h:298-342), vectorized over all offsets.
    ``hint`` is (B,) int32."""
    B, H, W = I0.shape
    # poor man's color correction (PixFlow.h:261-277)
    a = alpha0 * alpha1
    ratio = jnp.sum(a * I0, axis=(-1, -2)) / (
        jnp.sum(a * I1, axis=(-1, -2)) + 1e-12
    )
    I1eq = I1 * ratio[:, None, None]

    dist = _search_distance(params)

    def patch_error(dy, dx):
        shifted_I1 = _shift_with_edge(I1eq, -dy, -dx)  # I1eq at p + (dy,dx)
        shifted_a1 = _shift_with_edge(alpha1, -dy, -dx)
        sad = _box5(jnp.abs(I0 - shifted_I1))
        asum = _box5(alpha0 * shifted_a1)
        err = sad / jnp.maximum(asum, 1e-12)
        length = float(np.hypot(dx, dy))
        return err * (1.0 + length / max(dist, 1))

    err0 = 0.8 * patch_error(0, 0)
    best_err = err0
    best_dy = jnp.zeros((B, H, W), jnp.float32)
    best_dx = jnp.zeros((B, H, W), jnp.float32)
    for dy, dx, hints in _search_offsets(params):
        if (dy, dx) == (0, 0):
            continue
        err = patch_error(dy, dx)
        hint_ok = jnp.zeros((B,), bool)
        for h in hints:
            hint_ok = hint_ok | (hint == h)
        err = jnp.where(hint_ok[:, None, None], err, jnp.inf)
        better = err < best_err
        best_err = jnp.where(better, err, best_err)
        best_dy = jnp.where(better, float(dy), best_dy)
        best_dx = jnp.where(better, float(dx), best_dx)

    found = alpha0 > UPDATE_ALPHA_THRESHOLD
    new_flow = jnp.stack([best_dx, best_dy], axis=1)
    return jnp.where(found[:, None], new_flow, flow)


# ---------------------------------------------------------------------------
# pyramid + driver (computeOpticalFlow, PixFlow.h:81-183)
# ---------------------------------------------------------------------------


def _pyramid_sizes(h: int, w: int, params: FlowParams):
    """Level sizes, finest first (buildPyramid, PixFlow.h:477-491)."""
    sizes = [(h, w)]
    while True:
        nh = int(sizes[-1][0] * params.pyr_scale_factor + 0.5)
        nw = int(sizes[-1][1] * params.pyr_scale_factor + 0.5)
        if nh <= params.min_image_size or nw <= params.min_image_size:
            break
        sizes.append((nh, nw))
    return sizes


def _to_grey_alpha(rgba):
    """(B, 4, H, W) RGBA [0,1] -> grey (B, H, W), alpha (B, H, W) using the
    BT.601 weights of cvtColor(BGRA2GRAY)."""
    r, g, b, a = rgba[:, 0], rgba[:, 1], rgba[:, 2], rgba[:, 3]
    return 0.299 * r + 0.587 * g + 0.114 * b, a


@partial(jax.jit, static_argnames=("params", "use_temporal"))
def compute_flow(
    img0,
    img1,
    params: FlowParams,
    hint=None,
    prev_flow=None,
    prev_img0=None,
    prev_img1=None,
    use_temporal: bool = False,
):
    """Optical flow img0 -> img1.

    img0/img1: (B, 4, H, W) RGBA float32 in [0,1] (alpha marks valid px).
    hint: (B,) int32 direction hints (HINT_*), used only when
    params.search_max_percentage > 0.
    prev_*: previous frame's flow (B, 2, H, W) and images, enabling temporal
    regularization when use_temporal=True.

    Returns flow (B, 2, H, W) in pixels at full input resolution.
    """
    B, C, H, W = img0.shape
    assert C == 4, "expected RGBA input"
    if hint is None:
        hint = jnp.full((B,), HINT_UNKNOWN, jnp.int32)

    # pre-scale everything by downscaleFactor (PixFlow.h:92-118)
    dh, dw = int(H * params.downscale_factor), int(W * params.downscale_factor)
    img0d = resize_cubic(img0, (dh, dw))
    img1d = resize_cubic(img1, (dh, dw))

    if use_temporal:
        prev_flow_d = resize_cubic(prev_flow, (dh, dw)) * (dh / prev_flow.shape[-2])
        prev1d = resize_cubic(prev_img1, (dh, dw))
        motion = (
            jnp.sum(jnp.abs(img1d[:, :3] - prev1d[:, :3]), axis=1) / 3.0
        )
    else:
        prev_flow_d = jnp.zeros((B, 2, dh, dw), jnp.float32)
        motion = jnp.zeros((B, dh, dw), jnp.float32)

    I0, alpha0 = _to_grey_alpha(img0d)
    I1, alpha1 = _to_grey_alpha(img1d)
    I0 = gaussian_blur(I0, PRE_BLUR_SIGMA, ksize=PRE_BLUR_KSIZE)
    I1 = gaussian_blur(I1, PRE_BLUR_SIGMA, ksize=PRE_BLUR_KSIZE)

    sizes = _pyramid_sizes(dh, dw, params)

    flow = None
    for level in range(len(sizes) - 1, -1, -1):
        lh, lw = sizes[level]
        I0l = resize_bilinear(I0, (lh, lw)) if level else I0
        I1l = resize_bilinear(I1, (lh, lw)) if level else I1
        a0l = resize_bilinear(alpha0, (lh, lw)) if level else alpha0
        a1l = resize_bilinear(alpha1, (lh, lw)) if level else alpha1

        if flow is None:
            flow = jnp.zeros((B, 2, lh, lw), jnp.float32)
            if params.search_max_percentage > 0:
                flow = _adjust_initial_flow(
                    I0l, I1l, a0l, a1l, flow, hint, params
                )

        flow = _propagation_and_search(
            I0l, I1l, a0l, a1l, flow, params, is_finest=(level == 0)
        )

        if use_temporal:
            # adjustFlowTowardPrevious (PixFlow.h:185-193)
            prev_l = resize_cubic(prev_flow_d, (lh, lw)) * (lh / dh)
            motion_l = resize_bilinear(motion, (lh, lw))
            w = (1.0 - motion_l)[:, None]
            flow = flow * (1.0 - w) + prev_l * w

        if level > 0:
            nh, nw = sizes[level - 1]
            flow = resize_cubic(flow, (nh, nw)) * (1.0 / params.pyr_scale_factor)

    # back to full resolution (PixFlow.h:175-182)
    flow = resize_bilinear(flow, (H, W)) * (1.0 / params.downscale_factor)
    flow = gaussian_blur(
        flow, FINAL_FLOW_BLUR_SIGMA, ksize=FINAL_FLOW_BLUR_KSIZE
    )
    return flow
