"""The stereo panorama renderer — one compiled program per frame.

Rebuild of surround360_render/source/test/TestRenderStereoPanorama.cpp
(the reference's production renderer despite its test/ location). Where the
reference fans out pthreads per camera / pair / eye and hands 8-bit Mats
between stages, this renderer is a single jitted function over batched
float32 tensors:

  side images (N,4,H,W) --(batched remap, rig-static warps)--> strips
  ring of N pairs --(ONE batched flow call, 2N fields)--> chunk renders
  top/bottom fisheyes --(batched pole-to-side flow)--> deghost composite
  sharpen -> final equirect (+ cubemap)

Rig-dependent warp fields and chunk geometry are precomputed on host in
float64 (RenderContext); everything per-frame is traced.

The temporal-regularization state (pair flows + overlap images, pole
flows) is threaded through as an explicit pytree, replacing the
reference's flow/*.bin + debug PNG files handoff between frames
(TestRenderStereoPanorama.cpp:210-256). The CLI still serializes it for
resume parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache, partial
from typing import Any

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..flow import HINT_DOWN, compute_flow, make_flow_params
from ..geometry.camera import get_fov
from ..geometry.rig import Rig
from ..ops.compositing import (
    feather_alpha,
    flatten_layers_deghost_prefer_base,
    offset_horizontal_wrap,
    stack_horizontal,
)
from ..ops.filters import sharpen_iir
from ..ops.remap import remap
from ..ops.resize import resize_cubic
from ..ops.window_sampler import sample_displaced, sample_displaced_residual
from ..ops.warp import (
    CUBEMAP_FACE_ORDER,
    equirect_to_cubemap_warp,
    rig_fov,
    side_cam_spherical_warp,
    spherical_warp_for_camera,
)
from ..utils.math_util import ramp
from ..views.novel_view import lazy_warp_columns, prepare_pair_flows, render_chunk_pair

__all__ = ["RenderConfig", "RenderContext", "render_frame"]


@dataclass(frozen=True)
class RenderConfig:
    """Flags of the reference renderer (TestRenderStereoPanorama.cpp:44-70)."""

    eqr_width: int = 1024
    eqr_height: int = 512
    final_eqr_width: int = 0  # 0: no final resize
    final_eqr_height: int = 0
    interpupilary_dist: float = 6.4
    zero_parallax_dist: float = 10000.0
    side_alpha_feather_size: int = 100
    std_alpha_feather_size: int = 31
    sharpening: float = 0.0
    enable_top: bool = False
    enable_bottom: bool = False
    enable_pole_removal: bool = False
    side_flow_alg: str = "pixflow_low"
    polar_flow_alg: str = "pixflow_low"
    poleremoval_flow_alg: str = "pixflow_low"
    # compute the 28 side pair flows on overlaps downscaled by this factor
    # (mirrors polar_flow_scale): pair flows are smooth disparity fields
    # and the flow solver already works at downscale 0.5 internally, so
    # at preset scale a further 0.5 here quarters the dominant side-flow
    # stage. 1.0 = the reference's geometry
    # (TestRenderStereoPanorama.cpp:295-385); quality per preset recorded
    # in BASELINE.md.
    side_flow_scale: float = 1.0
    # compute the pole-to-side flow on inputs downscaled by this factor
    # (the field is smooth and gets blurred anyway). Measured on chip at
    # 1008/eye: 0.5 saves ~100 ms/frame over 1.0 with a 117 dB pole-band
    # difference (identical 46.5 dB vs the analytic scene) — i.e. free.
    # 1.0 = full res, the reference's geometry
    # (TestRenderStereoPanorama.cpp:388-561); it works since the banded
    # window sampler replaced the dense one-hot remap whose wide-shape
    # program faulted the round-1 TPU worker. Round 5: default 0.25 —
    # after the NaN-origin sanitize the 6k pole stage runs clean at 0.25
    # (pole_merged 2631 -> 1263 ms) at full-sphere quality parity
    # (49.9/49.8 dB vs 49.6/49.8 at 0.5; BASELINE.md round-5).
    polar_flow_scale: float = 0.25
    cubemap_width: int = 0
    cubemap_height: int = 0
    cubemap_format: str = "video"


@dataclass
class RenderContext:
    """Host-precomputed, rig- and config-static tensors."""

    rig: Rig
    config: RenderConfig
    # side projection
    side_warps: np.ndarray  # (N, 2, sh, sw)
    strip_h: int
    strip_w: int
    h_radians: float
    v_radians: float
    # ring / novel view geometry
    overlap_w: int
    chunk_w: int
    warp_cols_l: np.ndarray
    warp_cols_r: np.ndarray
    t_cols: np.ndarray
    zero_parallax_shift_px: float
    # top / bottom
    top_warp: np.ndarray | None = None
    top_h: int = 0
    bottom_warp: np.ndarray | None = None
    bottom_h: int = 0
    pole_ramp_geometry: dict = field(default_factory=dict)
    # pole removal
    bottom_usable_radius: float = 0.0
    bottom2_usable_radius: float = 0.0
    pole_flip180: bool = False

    @property
    def num_side_cams(self) -> int:
        return self.rig.side_camera_count


def build_render_context(rig: Rig, config: RenderConfig) -> RenderContext:
    """Precompute all rig-static warps and geometry
    (projectSphericalCamImages + generateRingOfNovelViews... setup,
    TestRenderStereoPanorama.cpp:138-175, :295-348)."""
    n = rig.side_camera_count
    if config.eqr_width % n != 0:
        raise ValueError(
            f"eqr_width must be divisible by the number of side cameras ({n})"
        )
    sides = rig.side_cameras
    h_rad = 2.0 * rig_fov(sides, False)
    v_rad = 2.0 * rig_fov(sides, True)

    warps = []
    strip_hw = None
    for i, cam in enumerate(sides):
        warp, strip_hw = side_cam_spherical_warp(
            cam, i, n, (config.eqr_width, config.eqr_height), h_rad, v_rad
        )
        warps.append(warp)
    side_warps = np.stack(warps)
    sh, sw = strip_hw

    # ring geometry (TestRenderStereoPanorama.cpp:304-316)
    h_fov_deg = np.degrees(h_rad)
    overlap_deg = (h_fov_deg * n - 360.0) / n
    overlap_w = int(sw * overlap_deg / h_fov_deg)
    chunk_w = config.eqr_width // n

    # lightfield math (TestRenderStereoPanorama.cpp:339-348)
    v = np.arctan(config.zero_parallax_dist / (config.interpupilary_dist / 2.0))
    psi = np.arcsin(
        np.sin(v) * (config.interpupilary_dist / 2.0) / rig.ring_radius
    )
    verge_px = psi * (sw / h_rad)
    theta = -np.pi / 2.0 + v + psi
    zero_shift_px = config.eqr_width * theta / (2.0 * np.pi)

    wl, t_cols = lazy_warp_columns(chunk_w, sw, verge_px, "left")
    wr, _ = lazy_warp_columns(chunk_w, sw, verge_px, "right")

    ctx = RenderContext(
        rig=rig,
        config=config,
        side_warps=side_warps,
        strip_h=sh,
        strip_w=sw,
        h_radians=h_rad,
        v_radians=v_rad,
        overlap_w=overlap_w,
        chunk_w=chunk_w,
        warp_cols_l=wl,
        warp_cols_r=wr,
        t_cols=t_cols,
        zero_parallax_shift_px=float(zero_shift_px),
    )

    if config.enable_top:
        cam = rig.cameras[rig.top_camera_index]
        fov = get_fov(cam)
        top_h = int(config.eqr_height * fov / np.pi)
        # reversed horizontal sweep (prepareTopImagesThread,
        # TestRenderStereoPanorama.cpp:660-667)
        ctx.top_warp = spherical_warp_for_camera(
            cam,
            (top_h, config.eqr_width),
            2.0 * np.pi,
            0.0,
            np.pi / 2.0,
            np.pi / 2.0 - fov,
        )
        ctx.top_h = top_h

    if config.enable_bottom:
        cam = rig.cameras[rig.bottom_camera_index]
        fov = get_fov(cam)
        bottom_h = int(config.eqr_height * fov / np.pi)
        ctx.bottom_warp = spherical_warp_for_camera(
            cam,
            (bottom_h, config.eqr_width),
            0.0,
            2.0 * np.pi,
            -np.pi / 2.0,
            -(np.pi / 2.0 - fov),
        )
        ctx.bottom_h = bottom_h
        if config.enable_pole_removal:
            from ..geometry.camera import approximate_usable_pixels_radius

            cam2 = rig.cameras[rig.bottom_camera2_index]
            ctx.bottom_usable_radius = approximate_usable_pixels_radius(cam)
            ctx.bottom2_usable_radius = approximate_usable_pixels_radius(cam2)
            ctx.pole_flip180 = bool(
                np.dot(np.asarray(cam.up), np.asarray(cam2.up)) < 0
            )

    if config.enable_top or config.enable_bottom:
        # pole-to-side ramp geometry (poleToSideFlowThread,
        # TestRenderStereoPanorama.cpp:454-481). NB the reference always
        # uses the *bottom* camera's fov for poleCameraRadius, even on the
        # top path (line 461) — replicated faithfully.
        pole_cam = rig.cameras[rig.bottom_camera_index]
        pole_radius = get_fov(pole_cam)
        side_radius = rig_fov(sides, True)
        crop_radius = 0.5 * (np.pi / 2 - side_radius) + 0.5 * min(
            np.pi / 2, pole_radius
        )
        pole_radius_deg = np.degrees(pole_radius)
        phi_from_pole = np.degrees(crop_radius)
        phi_from_side = 90.0 - np.degrees(side_radius)
        phi_mid = (phi_from_pole + phi_from_side) / 2.0
        phi_diff = abs(phi_from_pole - phi_from_side)
        ctx.pole_ramp_geometry = {
            "pole_radius_deg": float(pole_radius_deg),
            "phi_ramp_start": float(phi_mid - phi_diff / 2.0),
            "phi_mid": float(phi_mid),
            "phi_ramp_end": float(phi_mid + phi_diff / 2.0),
        }
    return ctx


# ---------------------------------------------------------------------------
# pipeline stages
# ---------------------------------------------------------------------------


# Output width at which dynamic warps switch from static-window sampling
# to displacement-following residual windows (sample_displaced_residual):
# below it the global halos are small enough that static windows win on
# simplicity and measured speed; above it the halo-area arithmetic
# dominates the frame (round-2 BASELINE.md 6k/8k stage tables).
RESIDUAL_SAMPLER_MIN_EQR_W = 3000

# Residual-window tiling of the pole composite warp, env-tunable for
# perf A/B (same padding-waste economics as views/novel_view.py's
# NOVEL_RESIDUAL_* knobs: window cols pad to a 128 multiple).
_POLE_WARP_TR = int(os.environ.get("S360_POLE_WARP_TR", "8"))
_POLE_WARP_TC = int(os.environ.get("S360_POLE_WARP_TC", "128"))
# residual-halo scale for the pole warp windows: the default halos
# (rows_f//32 in y, eqr_w//256 in x) cover the within-tile displacement
# spread at tr=8/tc=128; larger tiles see more of the phi-ramp slope and
# need proportionally more (quality gate: the 6k preset PSNR table)
_POLE_WARP_RHY_SCALE = float(os.environ.get("S360_POLE_WARP_RHY_SCALE", "1.0"))
_POLE_WARP_RHX_SCALE = float(os.environ.get("S360_POLE_WARP_RHX_SCALE", "1.0"))


def _banded_chunk_rows(h_out: int) -> int:
    """Row-chunk size for static banded remaps: measured-fast 16 at small
    outputs, growing with resolution to bound the emitted chunk count
    (~30) so preset-scale frames stay compilable."""
    return max(16, 8 * (-(-h_out // (30 * 8))))


def _banded_tile_cols(w_out: int) -> int:
    """Column-tile size for static banded remaps, bounding tiles to ~30."""
    return max(64, 32 * (-(-w_out // (30 * 32))))


def _project_side_cameras(ctx: RenderContext, side_images, warps_dev=None):
    """Feather source rows then remap each side camera into its spherical
    strip (projectSideToSpherical, TestRenderStereoPanorama.cpp:99-135).

    warps_dev: optional traced copy of ctx.side_warps so the table enters
    the program as a jit argument, not constant literals (see
    remap_static_banded_multi)."""
    feather = ctx.config.side_alpha_feather_size
    imgs = side_images
    if feather:
        H = imgs.shape[-2]
        y = jnp.arange(H, dtype=jnp.float32)
        ramp_top = jnp.minimum((y + 0.5) / feather, 1.0)
        ramp_full = jnp.minimum(ramp_top, ramp_top[::-1])[None, :, None]
        alpha = imgs[:, 3] * ramp_full
        imgs = jnp.concatenate([imgs[:, :3], alpha[:, None]], axis=1)
    if jax.default_backend() != "cpu":
        # static warps: banded matmul remap (source-row bands computed on
        # host) avoids the dense one-hot matmul's full-height stage A; all
        # N cameras ride one union-banded call (per-camera unrolling blew
        # up the HLO at preset-scale outputs)
        from ..ops.remap import remap_static_banded_multi

        return remap_static_banded_multi(
            imgs,
            ctx.side_warps,
            "bicubic",
            "constant",
            chunk_rows=_banded_chunk_rows(ctx.strip_h),
            tile_cols=_banded_tile_cols(ctx.strip_w),
            coords_dev=warps_dev,
        )
    coords = jnp.asarray(ctx.side_warps)
    return remap(imgs, coords, interpolation="bicubic", border="constant")


def _side_pair_flows(ctx: RenderContext, overlap_l, overlap_r, state, use_temporal):
    """The 28 pair flows + their temporal state, with optional
    side_flow_scale downscaling (flow inputs shrunk by resize_area, the
    field upsampled back and rescaled per axis).

    The temporal state is stored at the solver's WORKING resolution
    (input * downscale_factor): compute_flow's first act on every prev_*
    entry is a resize_cubic to exactly that size (pixflow.py:742-751), so
    storing the already-resized copies is mathematically identical (the
    next frame's resize becomes the identity) while shrinking the ring
    state 4x at scale 1.0 and 16x at 0.5 — the difference between a 6k
    frame chain fitting in 15.75 GB HBM or not. Flow values are stored in
    the units of their own stored resolution, matching compute_flow's
    `* (dh / prev_flow.shape[-2])` convention."""
    cfg = ctx.config
    flow_params = make_flow_params(cfg.side_flow_alg)
    scale = cfg.side_flow_scale
    sh, ov = overlap_l.shape[-2:]
    if scale != 1.0:
        from ..ops.resize import resize_area

        fh, fw = int(sh * scale), int(ov * scale)
        in_l = resize_area(overlap_l, (fh, fw))
        in_r = resize_area(overlap_r, (fh, fw))
    else:
        fh, fw = sh, ov
        in_l, in_r = overlap_l, overlap_r

    flow_ltr, flow_rtl = prepare_pair_flows(
        in_l,
        in_r,
        flow_params,
        prev_flow_l_to_r=state.get("pair_flow_ltr"),
        prev_flow_r_to_l=state.get("pair_flow_rtl"),
        prev_overlap_l=state.get("prev_overlap_l"),
        prev_overlap_r=state.get("prev_overlap_r"),
        use_temporal=use_temporal,
    )

    # state at the solver's working resolution (see docstring)
    dsf = flow_params.downscale_factor
    dh, dw = int(fh * dsf), int(fw * dsf)
    unit = dh / fh
    new_state = {
        "pair_flow_ltr": resize_cubic(flow_ltr, (dh, dw)) * unit,
        "pair_flow_rtl": resize_cubic(flow_rtl, (dh, dw)) * unit,
        "prev_overlap_l": resize_cubic(in_l, (dh, dw)),
        "prev_overlap_r": resize_cubic(in_r, (dh, dw)),
    }

    if scale != 1.0:
        from ..ops.resize import resize_bilinear

        axis_scale = jnp.asarray(
            [ov / fw, sh / fh], jnp.float32
        ).reshape(1, 2, 1, 1)
        flow_ltr = resize_bilinear(flow_ltr, (sh, ov)) * axis_scale
        flow_rtl = resize_bilinear(flow_rtl, (sh, ov)) * axis_scale
    return flow_ltr, flow_rtl, new_state


def _render_ring(ctx: RenderContext, projections, state, use_temporal):
    """Pair flows + chunk renders + ring concat
    (generateRingOfNovelViewsAndRenderStereoSpherical,
    TestRenderStereoPanorama.cpp:295-385)."""
    ov = ctx.overlap_w
    overlap_l = projections[..., ctx.strip_w - ov :]
    overlap_r = jnp.roll(projections, -1, axis=0)[..., :ov]

    flow_ltr, flow_rtl, ring_state = _side_pair_flows(
        ctx, overlap_l, overlap_r, state, use_temporal
    )

    chunks_l, chunks_r = render_chunk_pair(
        overlap_l,
        overlap_r,
        flow_ltr,
        flow_rtl,
        ctx.warp_cols_l,
        ctx.t_cols,
        ctx.warp_cols_r,
    )
    # (N, 4, sh, Wc) -> concat over pairs -> (4, sh, N * Wc)
    pano_l = stack_horizontal([chunks_l[i] for i in range(chunks_l.shape[0])])
    pano_r = stack_horizontal([chunks_r[i] for i in range(chunks_r.shape[0])])
    pano_l = offset_horizontal_wrap(pano_l, ctx.zero_parallax_shift_px)
    pano_r = offset_horizontal_wrap(pano_r, -ctx.zero_parallax_shift_px)
    return pano_l, pano_r, ring_state


def _pad_to_height(img, target_h: int):
    """Equal (+/-1) vertical zero padding (padToheight,
    TestRenderStereoPanorama.cpp:701-713)."""
    h = img.shape[-2]
    above = (target_h - h) // 2
    below = target_h - h - above
    pad = [(0, 0)] * (img.ndim - 2) + [(above, below), (0, 0)]
    return jnp.pad(img, pad)


def _prepare_fisheye_strip(
    ctx, warp, strip_h, image, feather_size, alpha_min=False, warp_dev=None
):
    """Remap a fisheye camera into its spherical strip and feather the
    bottom rows (prepareTop/BottomImagesThread,
    TestRenderStereoPanorama.cpp:606-685)."""
    if jax.default_backend() != "cpu":
        from ..ops.remap import remap_static_banded

        spherical = remap_static_banded(
            image,
            warp,
            "bicubic",
            "constant",
            chunk_rows=_banded_chunk_rows(strip_h),
            tile_cols=_banded_tile_cols(warp.shape[-1]),
            coords_dev=warp_dev,
        )
    else:
        spherical = remap(
            image, jnp.asarray(warp), interpolation="bicubic",
            border="constant",
        )
    y = jnp.arange(strip_h, dtype=jnp.float32)
    start = strip_h - 1 - feather_size
    fade = jnp.clip(1.0 - (y - start) / feather_size, 0.0, 1.0)[:, None]
    if alpha_min:
        alpha = jnp.minimum(spherical[3], fade)
    else:
        alpha = jnp.broadcast_to(fade, spherical[3].shape)
    return jnp.concatenate([spherical[:3], alpha[None]], axis=0)


def _pole_to_side_flow(ctx: RenderContext, side_pano_2, fisheye, state_key, state, use_temporal):
    """Flow the fisheye strip onto both eye panoramas and composite
    (poleToSideFlowThread, TestRenderStereoPanorama.cpp:388-561).

    side_pano_2: (2, 4, eqr_h, eqr_w) both eyes stacked (left, right);
    fisheye: (4, rows_f, eqr_w). Returns (2, 4, eqr_h, eqr_w) warped
    fisheye layers + new state entries.
    """
    fish = jnp.broadcast_to(fisheye[None], (2,) + fisheye.shape)
    prev = tuple(
        state.get(f"{state_key}_{k}")
        for k in ("flow", "prev_side", "prev_fish")
    )
    warped, st = _pole_flow_core(ctx, side_pano_2, fish, prev, use_temporal)
    new_state = {
        f"{state_key}_flow": st[0],
        f"{state_key}_prev_side": st[1],
        f"{state_key}_prev_fish": st[2],
    }
    return warped, new_state


def _pole_flow_core(ctx: RenderContext, side_pano, fish, prev, use_temporal):
    """Batch-generic pole flow/warp: side_pano (B, 4, eqr_h, eqr_w), fish
    (B, 4, rows_f, eqr_w), prev = (flow, prev_side, prev_fish) stacked
    (B, ...) temporal state or Nones. Returns (warped (B, 4, eqr_h,
    eqr_w), state tuple). B is eyes for one pole (2) or poles x eyes (4)
    for the merged top+bottom program (_poles_to_side_flow)."""
    cfg = ctx.config
    rows_f, eqr_w = fish.shape[-2:]
    B = side_pano.shape[0]
    ext_w = int(eqr_w * 1.2)
    max_blend_x = int(eqr_w * 0.2)
    g = ctx.pole_ramp_geometry
    prev_flow, prev_side, prev_fish = prev

    cropped = side_pano[..., :rows_f, :]
    cropped = feather_alpha(cropped, cfg.std_alpha_feather_size)

    # extend horizontally with wrap (both eyes + the fisheye). ext_w <
    # 2*eqr_w always (1.2x), so the wrap is a single concat — not an
    # index gather, which XLA:TPU lowers far worse
    ext = lambda a: jnp.concatenate([a, a[..., : ext_w - eqr_w]], axis=-1)
    ext_side = ext(cropped)
    ext_fish = ext(fish)

    # pole-to-side displacement is y-dominant (the fisheye is pulled toward
    # the sides along phi) — swap the banded sampler's halos accordingly
    flow_params = make_flow_params(cfg.polar_flow_alg)._replace(
        window_halo_y_frac=0.30, window_halo_x_frac=0.10
    )
    hints = jnp.full((B,), HINT_DOWN, jnp.int32)
    scale = cfg.polar_flow_scale
    small_side = small_fish = None
    if scale != 1.0:
        from ..ops.resize import resize_area, resize_bilinear

        fh, fw = int(rows_f * scale), int(ext_w * scale)
        small_side = resize_area(ext_side, (fh, fw))
        small_fish = resize_area(ext_fish, (fh, fw))
        flow_small = compute_flow(
            small_side,
            small_fish,
            flow_params,
            hint=hints,
            prev_flow=None
            if prev_flow is None
            else resize_area(prev_flow, (fh, fw)) * scale,
            prev_img0=None
            if prev_side is None
            else resize_area(prev_side, (fh, fw)),
            prev_img1=None
            if prev_fish is None
            else resize_area(prev_fish, (fh, fw)),
            use_temporal=use_temporal,
        )
        flow = resize_bilinear(flow_small, (rows_f, ext_w)) / scale
    else:
        flow = compute_flow(
            ext_side,
            ext_fish,
            flow_params,
            hint=hints,
            prev_flow=prev_flow,
            prev_img0=prev_side,
            prev_img1=prev_fish,
            use_temporal=use_temporal,
        )  # (B, 2, rows_f, ext_w)

    # phi-ramped warp of the fisheye toward the sides
    # (TestRenderStereoPanorama.cpp:483-503)
    phi = g["pole_radius_deg"] * (
        (jnp.arange(rows_f, dtype=jnp.float32) + 0.5) / rows_f
    )
    ramp_flow = 1.0 - ramp(phi, g["phi_ramp_start"], g["phi_mid"])  # (rows_f,)
    warp_scale = (1.0 - ramp_flow)[None, :, None]
    gy, gx = jnp.meshgrid(
        jnp.arange(rows_f, dtype=jnp.float32),
        jnp.arange(ext_w, dtype=jnp.float32),
        indexing="ij",
    )
    # banded remap: the warp displacement is a ramped, blurred flow, so
    # clamp it to physical halos and sample only static windows around
    # each output tile (ops/window_sampler.py) — the dense remap's
    # full-extent one-hot matmuls were the single most expensive op in
    # the round-1 frame at >=2016-wide
    halo_y = max(16, int(0.25 * rows_f))
    halo_x = max(16, int(0.02 * eqr_w))
    # only the ramp band needs resampling: warp_scale == 0 below
    # phi_ramp_start (the clipped displacement is exactly zero and
    # bicubic at integer coords is the identity — rows copy through),
    # and ramp_alpha == 0 at/beyond phi_ramp_end (the composite drops
    # those rows regardless of their rgb, up to the deghost blend's
    # ~5e-5 zero-alpha leak). At the 6k ring geometry the band is ~21%
    # of rows_f: the warp was ~60% of the pole composite's cost
    # (round-5 roofline pole_warp_blend 371 ms/pole).
    pr_deg = g["pole_radius_deg"]
    r0 = int(np.floor(rows_f * g["phi_ramp_start"] / pr_deg - 0.5))
    r0 = max(0, min(rows_f, r0))
    r1 = int(np.ceil(rows_f * g["phi_ramp_end"] / pr_deg + 0.5)) + 1
    r1 = max(min(rows_f, r1), min(rows_f, r0 + 8))
    band = slice(r0, r1)
    disp_x = jnp.clip(
        warp_scale[..., band, :] * flow[:, 0, band], -halo_x, halo_x
    )
    disp_y = jnp.clip(
        warp_scale[..., band, :] * flow[:, 1, band], -halo_y, halo_y
    )
    # Both samplers assume output row i maps near SOURCE row i (static
    # windows sit at t*tr; residual origins clamp their mean-displacement
    # follow to +-halo_y), so a band of outputs must come with a matching
    # band of source rows: slice the source to the band's tap reach
    # (clipped |disp_y| + bicubic margin) and rebase the y coords into the
    # slice. The constant rebase offset r0 - s0 <= halo_y + 3 rides on top
    # of the displacement bound, hence halo_y_eff. Real pixels are never
    # lost to the slice edge: taps reach at most pad_b beyond the band,
    # and where s0/s1 clamp, the slice edge IS the image edge.
    pad_b = halo_y + 3
    s0 = max(0, r0 - pad_b)
    s1 = min(rows_f, r1 + pad_b)
    src_band = ext_fish[..., s0:s1, :]
    halo_y_eff = halo_y + (r0 - s0)
    gx_b, gy_b = gx[band], gy[band] - float(s0)
    if eqr_w >= RESIDUAL_SAMPLER_MIN_EQR_W:
        # preset scale: displacement-following windows. The global halos
        # above reach 25% of the strip height, which the static sampler
        # pays as C*BH*BW arithmetic PER PIXEL (the round-2 8.9 s/pole 6k
        # stage); the warp field is smooth (sigma-8-blurred flow x a
        # monotone phi ramp), so per-tile window origins track it and the
        # residual halos cover only the within-tile spread (ramp slope
        # ~rows_f/ramp_rows * halo over 8 rows, plus local flow texture).
        warped_band = sample_displaced_residual(
            src_band,
            gx_b[None] + disp_x,
            gy_b[None] + disp_y,
            halo_y=halo_y_eff,
            halo_x=halo_x,
            res_halo_y=int(_POLE_WARP_RHY_SCALE * max(24, rows_f // 32)),
            res_halo_x=int(_POLE_WARP_RHX_SCALE * max(16, eqr_w // 256)),
            interpolation="bicubic",
            border="constant",
            tr=_POLE_WARP_TR,
            tc=_POLE_WARP_TC,
            group=64,
        )
    else:
        warped_band = sample_displaced(
            src_band,
            gx_b[None] + disp_x,
            gy_b[None] + disp_y,
            halo_y=halo_y_eff,
            halo_x=halo_x,
            interpolation="bicubic",
            border="constant",
            tr=16,
            tc=128,
            tile_chunk=8,
            # grow tiles + chunk so the window stack and one-hot
            # transients stay bounded (3k OOM'd at 34G without this)
            max_window_elems=64 * 1024 * 1024,
        )
    warped_ext = jnp.concatenate(
        [
            ext_fish[..., :r0, :],  # identity region: exact copy
            warped_band,
            jnp.zeros_like(ext_fish[..., r1:, :]),  # zero-alpha region
        ],
        axis=-2,
    )

    # fold the right extension back onto the left edge
    # (TestRenderStereoPanorama.cpp:505-524)
    main = warped_ext[..., :eqr_w]
    x = jnp.arange(max_blend_x, dtype=jnp.float32)
    blend = 1.0 - ramp(x, max_blend_x * 0.333, max_blend_x * 0.667)
    wrap_strip = warped_ext[..., eqr_w : eqr_w + max_blend_x]
    left_rgb = (
        wrap_strip[:, :3] * blend[None, None, None, :]
        + main[..., :3, :, :max_blend_x] * (1.0 - blend)[None, None, None, :]
    )
    rgb = jnp.concatenate([left_rgb, main[:, :3, :, max_blend_x:]], axis=-1)

    # alpha ramp for blending with the sides
    # (TestRenderStereoPanorama.cpp:526-536)
    ramp_alpha = 1.0 - ramp(phi, g["phi_mid"], g["phi_ramp_end"])
    alpha = main[:, 3] * ramp_alpha[None, :, None]
    warped = jnp.concatenate([rgb, alpha[:, None]], axis=1)

    # pad to full pano height (TestRenderStereoPanorama.cpp:538-546)
    target_h = side_pano.shape[-2]
    warped = jnp.pad(
        warped, [(0, 0), (0, 0), (0, target_h - rows_f), (0, 0)]
    )
    # temporal state is stored at FLOW resolution when the flow ran
    # downscaled: next frame's reader resizes to flow resolution anyway
    # (a no-op on the stored arrays), and at preset scale the full-res
    # copies are ~4 GB/pole — enough to OOM frame 2 on one chip. Flow is
    # stored in full-res pixel units at either resolution (the reader
    # multiplies by `scale` after its resize).
    if small_side is not None:
        st = (flow_small / scale, small_side, small_fish)
    else:
        st = (flow, ext_side, ext_fish)
    return warped, st


def _poles_to_side_flow(
    ctx: RenderContext, pano2, top_strip, bottom_strip, state, use_temporal
):
    """Both pole composites in ONE batched program (poles x eyes = B=4).

    The top and bottom flows read disjoint row bands of the side panorama
    (each pole band spans eqr_h*fov/pi rows from its own edge, and the
    composite's nonzero-alpha region ends at phi_ramp_end < 90 deg), so
    solving both from the PRE-composite panorama and compositing
    sequentially matches the reference's sequential poleToSideFlowThread
    order (TestRenderStereoPanorama.cpp:832-867) up to the deghost
    blend's ~5e-5 zero-alpha leak (flatten_layers_deghost_prefer_base).
    One batch-4 program instead of two batch-2 programs halves the
    dominant staged compile (~19 min/pole at 6k through the compile
    tunnel) and doubles the arithmetic batch of the bandwidth-bound
    flow/sampler stages. Requires ctx.top_h == ctx.bottom_h."""
    flipped0 = jnp.flip(pano2, axis=(-2, -1))
    side4 = jnp.concatenate([pano2, flipped0])  # (4, 4, H, W)
    fish4 = jnp.concatenate(
        [
            jnp.broadcast_to(top_strip[None], (2,) + top_strip.shape),
            jnp.broadcast_to(bottom_strip[None], (2,) + bottom_strip.shape),
        ]
    )

    def read(k):
        t, b = state.get(f"top_{k}"), state.get(f"bottom_{k}")
        if t is None or b is None:
            return None
        return jnp.concatenate([t, b])

    prev = tuple(read(k) for k in ("flow", "prev_side", "prev_fish"))
    warped4, st = _pole_flow_core(ctx, side4, fish4, prev, use_temporal)
    pano2 = flatten_layers_deghost_prefer_base(pano2, warped4[:2])
    flipped = jnp.flip(pano2, axis=(-2, -1))
    flipped = flatten_layers_deghost_prefer_base(flipped, warped4[2:])
    pano2 = jnp.flip(flipped, axis=(-2, -1))
    new_state = {}
    for i, k in enumerate(("flow", "prev_side", "prev_fish")):
        new_state[f"top_{k}"] = st[i][:2]
        new_state[f"bottom_{k}"] = st[i][2:]
    return pano2, new_state


# equatorial faces have compact per-tile source footprints once their x
# coords are unwrapped across the theta seam; polar faces sweep all
# longitudes near the pole, so only their y bands are useful
_CUBEMAP_EQ_FACES = ("right", "left", "back", "front")
_CUBEMAP_PO_FACES = ("top", "bottom")


@lru_cache(maxsize=8)
def _plan_cubemap(eqr_h: int, eqr_w: int, face_w: int, face_h: int):
    """Host plan for the banded cubemap remap: stacked face warps with
    BORDER_WRAP converted to an all-taps-in-bounds constant-border remap
    of a padded panorama (wrap-pad x, edge-pad y = the reference remap's
    wrap-x/clamp-y semantics, ImageWarper.cpp:137 + ops/remap._gather2d).
    Equatorial faces are unwrapped to continuous x (a 90-degree face
    straddles at most one of the two arctan branch cuts) so their per-tile
    windows stay narrow. Returns (eq (2,4fh,fw), po (2,2fh,fw), pad_l,
    pad_r) with coords already shifted into padded units."""
    pad_taps = 3  # bicubic reach
    eq_warps = []
    x_min, x_max = 0.0, float(eqr_w - 1)
    for face in _CUBEMAP_EQ_FACES:
        w = equirect_to_cubemap_warp(
            (eqr_h, eqr_w), (face_w, face_h), face, np.pi
        )
        x = w[0]
        if x.max() - x.min() > eqr_w / 2:  # straddles the theta=0 seam
            x = np.where(x > eqr_w / 2, x - eqr_w, x)
        x_min = min(x_min, float(x.min()))
        x_max = max(x_max, float(x.max()))
        eq_warps.append(np.stack([x, w[1]]))
    po_warps = [
        equirect_to_cubemap_warp((eqr_h, eqr_w), (face_w, face_h), f, np.pi)
        for f in _CUBEMAP_PO_FACES
    ]
    pad_l = int(np.ceil(max(0.0, -x_min))) + pad_taps
    pad_r = int(np.ceil(max(0.0, x_max - (eqr_w - 1)))) + pad_taps
    eq = np.concatenate(eq_warps, axis=-2).astype(np.float32)
    po = np.concatenate(po_warps, axis=-2).astype(np.float32)
    for w in (eq, po):
        w[0] += pad_l
        w[1] += pad_taps  # y edge-pad shift
    return eq, po, pad_l, pad_r


def _cubemap(ctx: RenderContext, pano_rgb, warps_dev: dict | None = None):
    """Equirect -> stacked cubemap faces (convertSphericalToCubemap...,
    ImageWarper.cpp:95-141 + stackOutputCubemapFaces, CvUtil.cpp:117-138).

    All six faces ride the banded static remap (Pallas fused windows for
    the equatorial stack on TPU; y-banded einsums for the polar stack) on
    one shared padded copy of the panorama instead of six dense full-width
    remaps. warps_dev: optional {"eq", "po"} traced warp copies so preset-
    scale programs don't embed the warps as constant literals."""
    from ..ops.remap import remap_static_banded

    cfg = ctx.config
    eqr_h, eqr_w = pano_rgb.shape[-2:]
    eq, po, pad_l, pad_r = _plan_cubemap(
        eqr_h, eqr_w, cfg.cubemap_width, cfg.cubemap_height
    )
    pad_taps = 3
    padded = jnp.concatenate(
        [pano_rgb[..., -pad_l:], pano_rgb, pano_rgb[..., :pad_r]], axis=-1
    )
    padded = jnp.pad(
        padded, [(0, 0), (pad_taps, pad_taps), (0, 0)], mode="edge"
    )
    dev = warps_dev or {}
    faces_eq = remap_static_banded(
        padded, eq, "bicubic", "constant", coords_dev=dev.get("eq")
    )
    faces_po = remap_static_banded(
        padded, po, "bicubic", "constant", coords_dev=dev.get("po")
    )
    fh = cfg.cubemap_height
    faces = {
        f: faces_eq[..., i * fh : (i + 1) * fh, :]
        for i, f in enumerate(_CUBEMAP_EQ_FACES)
    }
    faces.update(
        {
            f: faces_po[..., i * fh : (i + 1) * fh, :]
            for i, f in enumerate(_CUBEMAP_PO_FACES)
        }
    )
    if cfg.cubemap_format == "video":
        first3 = [jnp.flip(faces[f], axis=-1) for f in ("left", "right", "top")]
        second3 = [
            jnp.flip(faces[f], axis=-1) for f in ("bottom", "back", "front")
        ]
        return jnp.concatenate(
            [jnp.concatenate(first3, axis=-1), jnp.concatenate(second3, axis=-1)],
            axis=-2,
        )
    # photo: vertical stack in face order
    return jnp.concatenate([faces[f] for f in CUBEMAP_FACE_ORDER], axis=-2)


# ---------------------------------------------------------------------------
# the frame renderer
# ---------------------------------------------------------------------------


def _merge_poles(ctx: RenderContext) -> bool:
    """Whether top+bottom pole composites can run as one batched program
    (_poles_to_side_flow): both enabled and same strip geometry (the
    standard rig's two fisheyes share a lens model, so this is the common
    case)."""
    cfg = ctx.config
    return bool(
        cfg.enable_top and cfg.enable_bottom and ctx.top_h == ctx.bottom_h
    )


def render_frame(
    ctx: RenderContext,
    side_images,
    top_image=None,
    bottom_image=None,
    state: dict | None = None,
    use_temporal: bool = False,
    save_debug: bool = False,
    device_warps: dict | None = None,
):
    """Render one stereo frame (renderStereoPanorama,
    TestRenderStereoPanorama.cpp:716-972).

    device_warps: optional {"side", "top", "bottom"} traced copies of the
    context warp tables; when given they enter the compiled program as
    arguments instead of constant literals (required at preset scale —
    the warp tables alone exceed the compile service's proto limit).

    side_images: (N, 4, H, W) RGBA float32 in camera order;
    top_image/bottom_image: (4, H, W) (bottom_image should already be the
    pole-removal combine when enabled — see render.pole).
    state: temporal-regularization pytree from the previous frame (or {}).

    Returns (outputs dict, new_state). outputs: "equirect" (3, 2*h, w)
    RGB stereo stacked L over R (alpha is dropped at finalize, matching
    the reference's 3-channel eqr PNGs; h/w are the final resize target
    when configured); optional "cubemap".
    """
    cfg = ctx.config
    state = state or {}
    new_state: dict[str, Any] = {}
    debug: dict[str, Any] = {}

    dw = device_warps or {}
    projections = _project_side_cameras(
        ctx, side_images, warps_dev=dw.get("side")
    )
    pano_l, pano_r, ring_state = _render_ring(
        ctx, projections, state, use_temporal
    )
    new_state.update(ring_state)
    if save_debug:
        # the reference's --save_debug_images projections/ + sphericalImg
        # dumps (TestRenderStereoPanorama.cpp:177-185, :792-801)
        debug["projections"] = projections
        debug["spherical_l"] = pano_l
        debug["spherical_r"] = pano_r

    pano_l = _pad_to_height(pano_l, cfg.eqr_height)
    pano_r = _pad_to_height(pano_r, cfg.eqr_height)
    pano2 = jnp.stack([pano_l, pano_r])  # (2, 4, eqr_h, eqr_w)

    top_strip = bottom_strip = None
    if cfg.enable_top:
        top_strip = _prepare_fisheye_strip(
            ctx,
            ctx.top_warp,
            ctx.top_h,
            top_image,
            cfg.std_alpha_feather_size,
            warp_dev=dw.get("top"),
        )
        if save_debug:
            debug["top_strip"] = top_strip
    if cfg.enable_bottom:
        bottom_strip = _prepare_fisheye_strip(
            ctx,
            ctx.bottom_warp,
            ctx.bottom_h,
            bottom_image,
            cfg.std_alpha_feather_size,
            alpha_min=True,
            warp_dev=dw.get("bottom"),
        )
        if save_debug:
            debug["bottom_strip"] = bottom_strip

    if _merge_poles(ctx) and not save_debug:
        pano2, st = _poles_to_side_flow(
            ctx, pano2, top_strip, bottom_strip, state, use_temporal
        )
        new_state.update(st)
    else:
        if cfg.enable_top:
            warped, st = _pole_to_side_flow(
                ctx, pano2, top_strip, "top", state, use_temporal
            )
            new_state.update(st)
            if save_debug:
                debug["top_warped"] = warped
            pano2 = flatten_layers_deghost_prefer_base(pano2, warped)

        if cfg.enable_bottom:
            flipped = jnp.flip(pano2, axis=(-2, -1))
            warped, st = _pole_to_side_flow(
                ctx, flipped, bottom_strip, "bottom", state, use_temporal
            )
            new_state.update(st)
            if save_debug:
                debug["bottom_warped"] = warped
            flipped = flatten_layers_deghost_prefer_base(flipped, warped)
            pano2 = jnp.flip(flipped, axis=(-2, -1))

    outputs = _finalize_outputs(ctx, pano2, cubemap_warps=dw.get("cubemap"))
    if save_debug:
        outputs["debug"] = debug
    return outputs, new_state


def _final_resize_shape(cfg) -> "tuple[int, int] | None":
    """(rows, cols) of the final per-eye resize, or None when final ==
    render size (batch_process_video.py:176-199 geometry)."""
    if not (cfg.final_eqr_width and cfg.final_eqr_height):
        return None
    shape = (cfg.final_eqr_height // 2, cfg.final_eqr_width)
    if shape == (cfg.eqr_height, cfg.eqr_width):
        return None
    return shape


def _finalize_outputs(
    ctx: RenderContext, pano2, resize_mats=None, cubemap_warps=None
):
    """Sharpen, optional cubemap, optional final resize, stereo stack
    (TestRenderStereoPanorama.cpp:901-961).

    resize_mats: optional {"row": (Ho, H), "col": (Wo, W)} traced cubic
    interpolation matrices (only the axes that change size) so the final
    resize at 4k/8k doesn't embed an O(n^2)-byte constant (275 MB at 8k).
    cubemap_warps: optional {"eq", "po"} traced cubemap warp stacks, same
    rationale."""
    cfg = ctx.config
    rgb2 = pano2[:, :3]

    if cfg.sharpening > 0.0:
        rgb2 = sharpen_iir(
            rgb2,
            amount=1.0 + cfg.sharpening,
            iir_amount=0.25,
            h_boundary="wrap",
            v_boundary="reflect",
        )

    outputs = {}
    if cfg.cubemap_width > 0 and cfg.cubemap_height > 0:
        outputs["cubemap"] = jnp.concatenate(
            [
                _cubemap(ctx, rgb2[0], warps_dev=cubemap_warps),
                _cubemap(ctx, rgb2[1], warps_dev=cubemap_warps),
            ],
            axis=-2,
        )

    final = _final_resize_shape(cfg)
    if final is not None:
        if resize_mats:
            from ..ops.resize import _apply_separable_axis

            if "row" in resize_mats:
                rgb2 = _apply_separable_axis(rgb2, resize_mats["row"], -2)
            if "col" in resize_mats:
                rgb2 = _apply_separable_axis(rgb2, resize_mats["col"], -1)
        else:
            rgb2 = resize_cubic(rgb2, final)

    outputs["equirect"] = jnp.concatenate([rgb2[0], rgb2[1]], axis=-2)
    return outputs


# Above this equirect width the whole-frame program is rendered in
# sequential jitted stages: when the staging threshold was set (round 2)
# the fused 6k monolith exhausted HBM (stage window stacks + panorama
# buffers all live at once) while every stage fits alone. The sliced /
# windowed samplers have since shrunk the transients — the round-5
# profiler runs the 6k monolith fine — so the threshold is env-tunable
# for measurement (S360_STAGED_MIN_EQR_W). Mirrors the reference's own
# staged structure (renderStereoPanorama's thread phases).
STAGED_RENDER_MIN_EQR_W = int(os.environ.get("S360_STAGED_MIN_EQR_W", "4000"))


def make_jitted_renderer(
    ctx: RenderContext, use_temporal: bool = False, staged: bool | None = None
):
    """Close over the context and jit the frame pipeline; returns
    f(side, top, bottom, state) -> (outputs, new_state).

    The static warp tables are passed through the jit boundary as
    arguments (not closure constants): at preset scale they are hundreds
    of MB and constant-embedding them overflows the compile service.
    staged=None picks the monolithic single program below
    STAGED_RENDER_MIN_EQR_W and the sequential staged driver above it."""
    cfg = ctx.config
    if staged is None:
        staged = cfg.eqr_width >= STAGED_RENDER_MIN_EQR_W

    dw = {"side": jnp.asarray(ctx.side_warps, jnp.float32)}
    if ctx.top_warp is not None:
        dw["top"] = jnp.asarray(ctx.top_warp, jnp.float32)
    if ctx.bottom_warp is not None:
        dw["bottom"] = jnp.asarray(ctx.bottom_warp, jnp.float32)
    if cfg.cubemap_width > 0 and cfg.cubemap_height > 0:
        eq, po, _, _ = _plan_cubemap(
            cfg.eqr_height, cfg.eqr_width, cfg.cubemap_width,
            cfg.cubemap_height,
        )
        dw["cubemap"] = {"eq": jnp.asarray(eq), "po": jnp.asarray(po)}

    if not staged:

        @jax.jit
        def fn(side_images, top_image, bottom_image, state, device_warps):
            return render_frame(
                ctx,
                side_images,
                top_image,
                bottom_image,
                state,
                use_temporal=use_temporal,
                device_warps=device_warps,
            )

        return lambda side, top, bottom, state: fn(
            side, top, bottom, state, dw
        )

    shared, per_t = _staged_stage_jits(ctx, use_temporal)

    # serialize stage execution so only one stage's workspace is ever in
    # flight (async dispatch can otherwise enqueue the next stage while
    # the previous one still holds its multi-GB window transients)
    sync = os.environ.get("S360_STAGED_SYNC", "1") == "1"

    def _done(x):
        if sync:
            jax.block_until_ready(x)
        return x

    def fn(side_images, top_image, bottom_image, state):
        state = state or {}
        new_state: dict[str, Any] = {}
        projections = shared["proj"](side_images, dw["side"])
        _done(projections)
        ol, orr, fl, fr, st = per_t["flow"](projections, state)
        _done(fl)
        del projections
        pano2 = shared["chunk"](ol, orr, fl, fr)
        _done(pano2)
        new_state.update(st)
        if "poles" in per_t:
            strip_t = shared["top_strip"](top_image, dw["top"])
            _done(strip_t)
            strip_b = shared["bottom_strip"](bottom_image, dw["bottom"])
            _done(strip_b)
            pano2, st = per_t["poles"](pano2, strip_t, strip_b, state)
            _done(pano2)
            new_state.update(st)
        else:
            if cfg.enable_top:
                strip = shared["top_strip"](top_image, dw["top"])
                _done(strip)
                pano2, st = per_t["top"](pano2, strip, state)
                _done(pano2)
                new_state.update(st)
            if cfg.enable_bottom:
                strip = shared["bottom_strip"](bottom_image, dw["bottom"])
                _done(strip)
                pano2, st = per_t["bottom"](pano2, strip, state)
                _done(pano2)
                new_state.update(st)
        out = shared["output"](pano2, shared["resize_mats"], dw.get("cubemap"))
        return out, new_state

    return fn


def _staged_stage_jits(ctx: RenderContext, use_temporal: bool):
    """Build (or fetch) the staged renderer's jitted stage programs.

    Cached on the context so the priorless and temporal renderer variants
    of one video run share the temporal-INDEPENDENT stage compiles
    (projection / chunk render / output) — at 6k+ each staged compile is
    minutes through the compile tunnel and there is no persistent cache
    on the axon platform, so duplicate stage programs double the video
    pipeline's startup cost for nothing."""
    cache = getattr(ctx, "_stage_jit_cache", None)
    if cache is None:
        cache = {}
        ctx._stage_jit_cache = cache
    cfg = ctx.config

    shared = cache.get("shared")
    if shared is None:
        # the ring is itself three stages: the fused projection+flow+novel
        # program OOMs at 8k while each piece fits alone
        @jax.jit
        def proj_stage(side_images, warps):
            return _project_side_cameras(ctx, side_images, warps_dev=warps)

        @jax.jit
        def chunk_stage(overlap_l, overlap_r, flow_ltr, flow_rtl):
            chunks_l, chunks_r = render_chunk_pair(
                overlap_l,
                overlap_r,
                flow_ltr,
                flow_rtl,
                ctx.warp_cols_l,
                ctx.t_cols,
                ctx.warp_cols_r,
            )
            pano_l = stack_horizontal(
                [chunks_l[i] for i in range(chunks_l.shape[0])]
            )
            pano_r = stack_horizontal(
                [chunks_r[i] for i in range(chunks_r.shape[0])]
            )
            pano_l = offset_horizontal_wrap(pano_l, ctx.zero_parallax_shift_px)
            pano_r = offset_horizontal_wrap(
                pano_r, -ctx.zero_parallax_shift_px
            )
            return jnp.stack(
                [
                    _pad_to_height(pano_l, cfg.eqr_height),
                    _pad_to_height(pano_r, cfg.eqr_height),
                ]
            )

        final = _final_resize_shape(cfg)
        resize_mats = {}
        if final is not None:
            from ..ops.resize import resize_matrix_cubic

            if final[0] != cfg.eqr_height:
                resize_mats["row"] = jnp.asarray(
                    resize_matrix_cubic(cfg.eqr_height, final[0])
                )
            if final[1] != cfg.eqr_width:
                resize_mats["col"] = jnp.asarray(
                    resize_matrix_cubic(cfg.eqr_width, final[1])
                )

        @jax.jit
        def output_stage(pano2, mats, cub):
            return _finalize_outputs(
                ctx, pano2, resize_mats=mats, cubemap_warps=cub
            )

        # the fisheye strip preps are temporal-independent and their
        # banded polar remaps are among the largest staged HLOs — keep
        # them out of the per-temporal pole stages so they compile once
        @jax.jit
        def top_strip_stage(top_image, warp):
            return _prepare_fisheye_strip(
                ctx,
                ctx.top_warp,
                ctx.top_h,
                top_image,
                cfg.std_alpha_feather_size,
                warp_dev=warp,
            )

        @jax.jit
        def bottom_strip_stage(bottom_image, warp):
            return _prepare_fisheye_strip(
                ctx,
                ctx.bottom_warp,
                ctx.bottom_h,
                bottom_image,
                cfg.std_alpha_feather_size,
                alpha_min=True,
                warp_dev=warp,
            )

        shared = {
            "proj": proj_stage,
            "chunk": chunk_stage,
            "output": output_stage,
            "resize_mats": resize_mats,
            "top_strip": top_strip_stage,
            "bottom_strip": bottom_strip_stage,
        }
        cache["shared"] = shared

    per_t = cache.get(use_temporal)
    if per_t is None:

        @jax.jit
        def flow_stage(projections, state):
            ov = ctx.overlap_w
            overlap_l = projections[..., ctx.strip_w - ov :]
            overlap_r = jnp.roll(projections, -1, axis=0)[..., :ov]
            flow_ltr, flow_rtl, ring_state = _side_pair_flows(
                ctx, overlap_l, overlap_r, state, use_temporal
            )
            return overlap_l, overlap_r, flow_ltr, flow_rtl, ring_state

        per_t = {"flow": flow_stage}
        if _merge_poles(ctx):

            @jax.jit
            def poles_stage(pano2, strip_t, strip_b, state):
                return _poles_to_side_flow(
                    ctx, pano2, strip_t, strip_b, state, use_temporal
                )

            per_t["poles"] = poles_stage
        else:

            @jax.jit
            def top_stage(pano2, strip, state):
                warped, st = _pole_to_side_flow(
                    ctx, pano2, strip, "top", state, use_temporal
                )
                return flatten_layers_deghost_prefer_base(pano2, warped), st

            @jax.jit
            def bottom_stage(pano2, strip, state):
                flipped = jnp.flip(pano2, axis=(-2, -1))
                warped, st = _pole_to_side_flow(
                    ctx, flipped, strip, "bottom", state, use_temporal
                )
                flipped = flatten_layers_deghost_prefer_base(flipped, warped)
                return jnp.flip(flipped, axis=(-2, -1)), st

            per_t["top"] = top_stage
            per_t["bottom"] = bottom_stage
        cache[use_temporal] = per_t

    return shared, per_t
