"""Static-window tiled resampling — the banded sampler for DYNAMIC warps.

Every dynamic resample in the pipeline (flow error fields, the pole-path
flow warp, novel-view time-shifted remaps) samples an image at
``grid + displacement`` where the displacement field is smooth and
bounded (flows are median-filtered and sigma-8 blurred; warp ramps only
shrink them). The round-1 samplers exploited none of that: the one-hot
interpolation matmul (`flow/pixflow.py::_sample_bilinear_matmul`,
`ops/remap.py::_remap_matmul_single`) contracts the FULL source extent
per output pixel, so cost grows ~cubically with resolution — the judged
round-1 resolution wall.

Here the output is tiled into (TR x TC) tiles and each tile samples only
a statically-positioned window of (TR + 2*(halo_y+m)) x (TC + 2*(halo_x+m))
source pixels around its own footprint. Everything is static:

  * windows are extracted with strided basic slices of the padded image
    (no gathers — XLA:TPU lowers arbitrary gathers to a ~80M elem/s
    scalar loop; no `lax.dynamic_slice` / `lax.map` — per-iteration
    while-loop overhead lost to the dense path in round-1 measurements,
    see flow/pixflow.py round-1 note);
  * interpolation is two one-hot matmuls on the MXU per tile, batched
    over ALL tiles in a single einsum pair.

Cost per output pixel falls from C*H*W to C*BH*BW — constant in the
image size — making total sampling cost linear in pixel count as long as
displacements stay within the halo. Displacements beyond the halo read
zero weight (border="constant") or lose taps (border="clamp"), which the
flow solver sees as a high-energy candidate; halos are sized from the
physical displacement bounds at each call site.

Windows depend only on the source image, so callers that evaluate many
displacement fields against one image (the flow inner loop: ~15 error
fields per propagation round) build windows once via `build_windows` and
call `sample_windows` per field.

Reference provenance: replaces the sampling inside PixFlow.h:493-534
(getPixBilinear32FExtend) and cv::remap call sites (NovelView.cpp:174-224,
TestRenderStereoPanorama.cpp:483-503) with identical math inside the halo.
"""

from __future__ import annotations

from .precision import is_f32_class as _is_f32_class
from .precision import resolve as _resolve_precision

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "WindowPlan",
    "plan_windows",
    "plan_windows_budgeted",
    "build_windows",
    "sample_windows",
    "sample_windows_sliced",
    "sample_displaced",
    "sample_displaced_residual",
    "sampler_tile_chunk",
    "make_window_sampler",
]


class WindowPlan(NamedTuple):
    """Static tiling geometry for one (H, W) source / (Ho, Wo) output pair."""

    H: int
    W: int
    Ho: int
    Wo: int
    tr: int  # output tile rows
    tc: int  # output tile cols
    bh: int  # window height
    bw: int  # window width
    nty: int
    ntx: int
    pad_y: int  # top padding of the source image (= left offset of windows)
    pad_x: int
    interpolation: str
    border: str


def plan_windows(
    src_hw,
    out_hw,
    halo_y: int,
    halo_x: int,
    interpolation: str = "bilinear",
    border: str = "clamp",
    tr: int = 8,
    tc: int = 128,
) -> WindowPlan:
    """Choose static tile/window geometry.

    halo_y/halo_x bound |sample_coord - output_position| per axis (output
    position in source pixel units — callers with same-size warps pass the
    displacement bound directly). Falls back to one full-axis window when
    tiling that axis wouldn't shrink the contraction.
    """
    H, W = src_hw
    Ho, Wo = out_hw
    margin = 2 if interpolation == "bicubic" else 1
    ey = halo_y + margin
    ex = halo_x + margin

    def axis_plan(n_src, n_out, t, e):
        # window = t + 2e + 1; tile only if it beats the full axis
        if n_out < t or t + 2 * e + 1 >= n_src:
            return n_out, n_src, 1, 0  # single tile spanning everything
        nt = -(-n_out // t)
        b = t + 2 * e + 1
        return t, b, nt, e

    tr_, bh, nty, pad_y = axis_plan(H, Ho, tr, ey)
    tc_, bw, ntx, pad_x = axis_plan(W, Wo, tc, ex)
    return WindowPlan(
        H, W, Ho, Wo, tr_, tc_, bh, bw, nty, ntx, pad_y, pad_x,
        interpolation, border,
    )


def plan_windows_budgeted(
    src_hw,
    out_hw,
    halo_y: int,
    halo_x: int,
    interpolation: str = "bilinear",
    border: str = "clamp",
    tr: int = 8,
    tc: int = 128,
    elems_per_px: int = 1,
    max_window_elems: int = 64 * 1024 * 1024,
    max_tile_transient_elems: int = 384 * 1024 * 1024,
) -> WindowPlan:
    """plan_windows, but grow tiles until the window stack fits a budget.

    Overlapping windows duplicate the source by (bh*bw)/(tr*tc); with
    tiles much smaller than the halos (the measured-fast choice at bench
    scales) that factor reaches 50x+, which at preset-scale pole strips
    materializes multi-GB window stacks (observed 3k HBM OOM). Doubling
    the tile edge along the worse axis halves its duplication, so the
    small-scale tuned geometry is kept verbatim whenever it already fits.
    elems_per_px = product of lead/channel dims sharing the windows.

    Growth stops before any SINGLE tile's contraction transient
    (elems_per_px * tr * tc * min(bh, bw), the stage-A temp) exceeds
    max_tile_transient_elems: past that point tile_chunk=1 can no longer
    bound memory — an unconstrained collapse to one whole-source window
    produced a 114 GB stage-A temp at the 6k novel-view warp."""

    def transient(pl):
        return elems_per_px * pl.tr * pl.tc * min(pl.bh, pl.bw)

    while True:
        plan = plan_windows(
            src_hw, out_hw, halo_y, halo_x, interpolation, border, tr, tc
        )
        elems = plan.nty * plan.ntx * plan.bh * plan.bw * elems_per_px
        if elems <= max_window_elems:
            return plan
        dup_y = plan.bh / plan.tr if plan.nty > 1 else 1.0
        dup_x = plan.bw / plan.tc if plan.ntx > 1 else 1.0
        if dup_y <= 1.0 + 1e-9 and dup_x <= 1.0 + 1e-9:
            return plan  # windows already tight; nothing left to merge
        grew = False
        for axis in ("y", "x") if dup_y >= dup_x else ("x", "y"):
            if axis == "y" and plan.nty <= 1:
                continue  # single tile already; growing tr is a no-op
            if axis == "x" and plan.ntx <= 1:
                continue
            tr2, tc2 = (tr * 2, tc) if axis == "y" else (tr, tc * 2)
            plan2 = plan_windows(
                src_hw, out_hw, halo_y, halo_x, interpolation, border,
                tr2, tc2,
            )
            if transient(plan2) <= max_tile_transient_elems:
                tr, tc = tr2, tc2
                grew = True
                break
        if not grew:
            return plan  # further merging would blow per-tile transients


def sampler_tile_chunk(
    plan: WindowPlan,
    coord_lead_elems: int = 1,
    max_elems: int = 128 * 1024 * 1024,
    win_lead_elems: int = 0,
) -> int:
    """Tiles per lax.map group so one group's transients (one-hot operands
    and, when win_lead_elems — the windows' lead*channel product — is
    given, the stage-A contraction temp) stay near max_elems.
    coord_lead_elems = product of the coords' lead dims (including folded
    extra/candidate dims). Returns 0 for 'no chunking needed'."""
    per_tile = coord_lead_elems * plan.tr * plan.tc * (plan.bw + plan.bh)
    if win_lead_elems:
        per_tile = max(
            per_tile,
            win_lead_elems * plan.tr * plan.tc * min(plan.bw, plan.bh),
        )
    total = plan.nty * plan.ntx * per_tile
    if total <= max_elems:
        return 0
    return max(1, max_elems // max(per_tile, 1))


def build_windows(img, plan: WindowPlan):
    """img (..., C, H, W) -> (T, ..., C, BH, BW) overlapping window stack.

    Windows overlap by stride TR/TC, so window t is assembled from
    k = ceil(B/T) tile-aligned "phases": phase ph covers rows
    [t*TR + ph*TR, t*TR + (ph+1)*TR), which for ALL tiles at once is just
    the padded image sliced at [ph*TR, ph*TR + nty*TR) and reshaped to
    (nty, TR). Per-row/per-column slicing would instead create hundreds of
    (..., 1, W) operands that XLA:TPU layout-pads to (8, 128) tiles — an
    observed 180x HBM expansion. The zero padding never contributes
    because one-hot weights are validated against absolute source
    indices."""
    p = plan
    if p.nty == 1 and p.ntx == 1:
        # single window spanning the whole source (pad offsets are 0 by
        # construction); the phase padding below would widen it past
        # plan.bw when the output is smaller than the source
        return img[None]
    lead = img.shape[:-2]
    nl = len(lead)
    ky = -(-p.bh // p.tr)
    kx = -(-p.bw // p.tc)
    # bottom/right padding so the last tile's last phase exists
    pad_y_hi = max(0, (p.nty - 1 + ky) * p.tr - p.pad_y - p.H)
    pad_x_hi = max(0, (p.ntx - 1 + kx) * p.tc - p.pad_x - p.W)
    padded = jnp.pad(
        img,
        [(0, 0)] * nl + [(p.pad_y, pad_y_hi), (p.pad_x, pad_x_hi)],
    )
    Wp = padded.shape[-1]
    ys = [
        padded[..., ph * p.tr : (ph + p.nty) * p.tr, :].reshape(
            lead + (p.nty, p.tr, Wp)
        )
        for ph in range(ky)
    ]
    yw = jnp.concatenate(ys, axis=-2)[..., : p.bh, :]  # (..., nty, BH, Wp)
    xs = [
        yw[..., ph * p.tc : (ph + p.ntx) * p.tc].reshape(
            lead + (p.nty, p.bh, p.ntx, p.tc)
        )
        for ph in range(kx)
    ]
    xw = jnp.concatenate(xs, axis=-1)[..., : p.bw]  # (..., nty, BH, ntx, BW)
    # (..., nty, BH, ntx, BW) -> (nty, ntx, ..., BH, BW)
    perm = (nl, nl + 2) + tuple(range(nl)) + (nl + 1, nl + 3)
    xw = xw.transpose(perm)
    return xw.reshape((p.nty * p.ntx,) + lead + (p.bh, p.bw))


def _tile_coords(v, plan: WindowPlan):
    """(..., Ho, Wo) -> (T, ..., Pt) grouped by tile (edge-padded)."""
    p = plan
    pad_r = p.nty * p.tr - p.Ho
    pad_c = p.ntx * p.tc - p.Wo
    lead = v.shape[:-2]
    nl = len(lead)
    v = jnp.pad(
        v, [(0, 0)] * nl + [(0, pad_r), (0, pad_c)], mode="edge"
    )
    v = v.reshape(lead + (p.nty, p.tr, p.ntx, p.tc))
    perm = (nl, nl + 2) + tuple(range(nl)) + (nl + 1, nl + 3)
    v = v.transpose(perm)
    return v.reshape((p.nty * p.ntx,) + lead + (p.tr * p.tc,))


def _cubic_weights(t, a=-0.75):
    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    return k12(t + 1.0), k01(t), k01(1.0 - t), k12(2.0 - t)


def _onehot_axis(coord_t, tile_idx, n_src, b_axis, tile_stride, pad, plan):
    """One-hot interpolation matrix (T, ..., Pt, b_axis) for one axis.

    coord_t: (T, ..., Pt) absolute source coordinates grouped by tile;
    tile_idx: (T,) int32 tile index along this axis (window origin =
    tile_idx * tile_stride in padded coords)."""
    i0f = jnp.floor(coord_t)
    t = coord_t - i0f
    i0 = i0f.astype(jnp.int32)
    if plan.interpolation == "bicubic":
        w = _cubic_weights(t)
        taps = [(i0 - 1, w[0]), (i0, w[1]), (i0 + 1, w[2]), (i0 + 2, w[3])]
    else:
        taps = [(i0, 1.0 - t), (i0 + 1, t)]

    origin = (tile_idx * tile_stride).astype(jnp.int32)
    origin = origin.reshape((-1,) + (1,) * (coord_t.ndim - 1))
    grid = jnp.arange(b_axis, dtype=jnp.int32)
    out = None
    for idx, w in taps:
        if plan.border == "clamp":
            idx = jnp.clip(idx, 0, n_src - 1)
            wv = w
        elif plan.border == "constant":
            wv = jnp.where((idx >= 0) & (idx < n_src), w, 0.0)
        else:
            raise ValueError(f"unsupported border: {plan.border}")
        local = idx + pad - origin  # index into the window
        hit = (grid == local[..., None]).astype(jnp.float32) * wv[..., None]
        out = hit if out is None else out + hit
    return out


def sample_windows(
    windows,
    plan: WindowPlan,
    x,
    y,
    tile_chunk: int = 0,
    precision: str = "float32",
):
    """Sample prebuilt windows at absolute coords x, y (..., Ho, Wo).

    windows: (T, ..., C, BH, BW) from build_windows (leading batch dims of
    windows and coords must match). Returns (..., C, Ho, Wo). Exact
    bilinear/bicubic wherever |x - column|, |y - row| fit the plan halos;
    beyond them taps fall outside the window and read as weight 0.

    Coords may carry EXTRA leading dims beyond the windows' lead dims
    (e.g. K flow candidates sampling one (B, C, H, W) image: coords
    (K, B, Ho, Wo) against windows built with lead (B,)). The extra dims
    are folded into the per-tile pixel axis, so all K candidates ride ONE
    contraction against shared windows — the flow inner loop's K ~13
    sequential error-field samples become a single matmul pair with K x
    more rows (MXU-friendly; the windows operand is not replicated).
    Returns (K..., ..., C, Ho, Wo).

    tile_chunk > 0 bounds peak memory for large one-shot remaps by
    lax.map-ing over groups of ~tile_chunk tiles (the one-hot and stage-A
    intermediates scale with the number of tiles in flight)."""
    precision = _resolve_precision(precision)
    p = plan
    # windows are (T, lead..., C, BH, BW); coords carry lead but not C
    n_lead_w = windows.ndim - 4
    extra_shape = x.shape[: x.ndim - 2 - n_lead_w]
    ne = len(extra_shape)
    xt = _tile_coords(x, p)  # (T, extra..., lead..., Pt)
    yt = _tile_coords(y, p)
    if ne:
        E = int(np.prod(extra_shape))
        # (T, extra..., lead..., Pt) -> (T, lead..., E * Pt)
        perm = (
            (0,)
            + tuple(range(1 + ne, 1 + ne + n_lead_w))
            + tuple(range(1, 1 + ne))
            + (xt.ndim - 1,)
        )
        fold = lambda v: v.transpose(perm).reshape(
            v.shape[:1]
            + tuple(v.shape[1 + ne + i] for i in range(n_lead_w))
            + (E * p.tr * p.tc,)
        )
        xt = fold(xt)
        yt = fold(yt)
    tiles = np.arange(p.nty * p.ntx)
    ty = jnp.asarray(tiles // p.ntx, jnp.int32)
    tx = jnp.asarray(tiles % p.ntx, jnp.int32)

    def onehots(xt_, yt_, tx_, ty_):
        ohx = _onehot_axis(
            xt_, tx_, p.W, p.bw, p.tc if p.ntx > 1 else 0, p.pad_x, p
        )
        ohy = _onehot_axis(
            yt_, ty_, p.H, p.bh, p.tr if p.nty > 1 else 0, p.pad_y, p
        )
        return ohx, ohy

    def contract(ox, oy, win):
        # two one-hot matmuls per tile; at preset-scale bands eliminate
        # the LARGER band axis first so the stage-A temp carries only the
        # smaller band (memory); small bands keep the tuned w-first order
        # (measured faster at bench scales).
        # precision "float32" = exact (multi-pass f32 emulation on the
        # bf16 MXU); "default" = single-pass bf16 MXU (callers ranking
        # flow candidates tolerate the 8-bit mantissa; warps stay exact)
        if p.bh > p.bw and p.bh >= 512:
            tmp = jnp.einsum(
                "t...ph,t...chw->t...cpw", oy, win, precision=precision
            )
            return jnp.einsum(
                "t...pw,t...cpw->t...cp", ox, tmp, precision=precision
            )
        tmp = jnp.einsum(
            "t...pw,t...chw->t...cph", ox, win, precision=precision
        )
        return jnp.einsum(
            "t...ph,t...cph->t...cp", oy, tmp, precision=precision
        )

    T = p.nty * p.ntx
    if tile_chunk and T > tile_chunk:
        # nearest divisor of T at or below tile_chunk
        g = max(d for d in range(1, tile_chunk + 1) if T % d == 0)
        n = T // g
        grp = lambda a: a.reshape((n, g) + a.shape[1:])

        def body(args):
            xt_, yt_, tx_, ty_, win = args
            # one-hots are built INSIDE the mapped body: they are the
            # dominant transient (P x (bw+bh) floats per tile) and
            # materializing them for all tiles as map operands defeats
            # the chunking (observed 9 GB remat copies at 3k)
            ohx, ohy = onehots(xt_, yt_, tx_, ty_)
            return contract(ohx, ohy, win)

        out = jax.lax.map(
            body, (grp(xt), grp(yt), grp(tx), grp(ty), grp(windows))
        )
        out = out.reshape((T,) + out.shape[2:])
    else:
        ohx, ohy = onehots(xt, yt, tx, ty)
        out = contract(ohx, ohy, windows)
    if ne:
        # (T, lead..., C, E*Pt) -> (T, E, lead..., C, Pt): E rejoins as a
        # leading batch dim for the generic untile below
        E = int(np.prod(extra_shape))
        out = out.reshape(out.shape[:-1] + (E, p.tr * p.tc))
        axes = tuple(range(out.ndim))
        out = out.transpose((0, out.ndim - 2) + axes[1:-2] + (out.ndim - 1,))
    # (T, ..., C, Pt) -> (..., C, Ho, Wo)
    lead = out.shape[1:-1]
    nl = len(lead)
    out = out.reshape((p.nty, p.ntx) + lead + (p.tr, p.tc))
    perm = tuple(range(2, 2 + nl)) + (0, 2 + nl, 1, 3 + nl)
    out = out.transpose(perm)
    out = out.reshape(lead + (p.nty * p.tr, p.ntx * p.tc))
    out = out[..., : p.Ho, : p.Wo]
    if ne:
        out = out.reshape(extra_shape + out.shape[1:])
    return out


def _padded_source(img, plan: WindowPlan):
    """Pad img so every tile's window is a static-size in-bounds slice at
    (ty*tr, tx*tc) in padded coords (the same layout build_windows uses)."""
    p = plan
    nl = img.ndim - 2
    ky = -(-p.bh // p.tr)
    kx = -(-p.bw // p.tc)
    pad_y_hi = max(0, (p.nty - 1 + ky) * p.tr - p.pad_y - p.H)
    pad_x_hi = max(0, (p.ntx - 1 + kx) * p.tc - p.pad_x - p.W)
    return jnp.pad(
        img, [(0, 0)] * nl + [(p.pad_y, pad_y_hi), (p.pad_x, pad_x_hi)]
    )


def sample_windows_sliced(img, plan: WindowPlan, x, y, precision="float32"):
    """sample_windows without ever materializing the window stack: each
    lax.map iteration dynamic-slices ONE tile's window out of the padded
    source. Peak extra memory is a single (bh, bw) window + its one-hots
    instead of T overlapping windows (6.3 GB for the 8k novel-view warp).
    Same math as build_windows + sample_windows with tile_chunk=1."""
    precision = _resolve_precision(precision)
    p = plan
    padded = _padded_source(img, p)
    lead = img.shape[:-2]  # includes the channel dim
    nl = len(lead)
    n_lead_c = nl - 1  # coords carry the lead dims but not channels
    extra_shape = x.shape[: x.ndim - 2 - n_lead_c]
    ne = len(extra_shape)
    xt = _tile_coords(x, p)
    yt = _tile_coords(y, p)
    if ne:
        E = int(np.prod(extra_shape))
        perm = (
            (0,)
            + tuple(range(1 + ne, 1 + ne + n_lead_c))
            + tuple(range(1, 1 + ne))
            + (xt.ndim - 1,)
        )
        fold = lambda v: v.transpose(perm).reshape(
            v.shape[:1]
            + tuple(v.shape[1 + ne + i] for i in range(n_lead_c))
            + (E * p.tr * p.tc,)
        )
        xt = fold(xt)
        yt = fold(yt)
    T = p.nty * p.ntx
    tiles = np.arange(T)
    ty = jnp.asarray(tiles // p.ntx, jnp.int32)
    tx = jnp.asarray(tiles % p.ntx, jnp.int32)

    def body(args):
        xt_, yt_, ty_, tx_ = args
        win = jax.lax.dynamic_slice(
            padded,
            (0,) * nl + (ty_ * p.tr, tx_ * p.tc),
            lead + (p.bh, p.bw),
        )
        ohx = _onehot_axis(
            xt_[None], tx_[None], p.W, p.bw,
            p.tc if p.ntx > 1 else 0, p.pad_x, p,
        )
        ohy = _onehot_axis(
            yt_[None], ty_[None], p.H, p.bh,
            p.tr if p.nty > 1 else 0, p.pad_y, p,
        )
        # same order heuristic as sample_windows so the two memory
        # strategies differ only in window materialization
        if p.bh > p.bw and p.bh >= 512:
            tmp = jnp.einsum(
                "t...ph,t...chw->t...cpw", ohy, win[None],
                precision=precision,
            )
            out = jnp.einsum(
                "t...pw,t...cpw->t...cp", ohx, tmp, precision=precision
            )
        else:
            tmp = jnp.einsum(
                "t...pw,t...chw->t...cph", ohx, win[None],
                precision=precision,
            )
            out = jnp.einsum(
                "t...ph,t...cph->t...cp", ohy, tmp, precision=precision
            )
        return out[0]

    out = jax.lax.map(body, (xt, yt, ty, tx))
    # (T, ..., C, E*Pt or Pt) -> same untile as sample_windows
    if ne:
        E = int(np.prod(extra_shape))
        out = out.reshape(out.shape[:-1] + (E, p.tr * p.tc))
        axes = tuple(range(out.ndim))
        out = out.transpose((0, out.ndim - 2) + axes[1:-2] + (out.ndim - 1,))
    lead_o = out.shape[1:-1]
    nlo = len(lead_o)
    out = out.reshape((p.nty, p.ntx) + lead_o + (p.tr, p.tc))
    perm = tuple(range(2, 2 + nlo)) + (0, 2 + nlo, 1, 3 + nlo)
    out = out.transpose(perm)
    out = out.reshape(lead_o + (p.nty * p.tr, p.ntx * p.tc))
    out = out[..., : p.Ho, : p.Wo]
    if ne:
        out = out.reshape(extra_shape + out.shape[1:])
    return out


def sample_displaced_residual(
    img,
    x,
    y,
    halo_y: int,
    halo_x: int,
    res_halo_y: int,
    res_halo_x: int,
    interpolation: str = "bilinear",
    border: str = "clamp",
    tr: int = 8,
    tc: int = 128,
    group: int = 32,
    precision: str = "float32",
    backend: str = "auto",
):
    """Displacement-FOLLOWING windows: each tile's window origin tracks
    the tile's mean displacement (rounded, traced, applied with
    ``lax.dynamic_slice``), so the window only needs to cover the
    within-tile displacement SPREAD (``res_halo_*``) plus the
    interpolation margin — not the global displacement bound
    (``halo_*``), which only sizes the source padding.

    For the pipeline's smooth fields (sigma-8-blurred flows, ramped pole
    warps) the spread is tens of pixels while the bound is hundreds: the
    per-output-pixel contraction cost C*BH*BW drops by the window-area
    ratio (~10x at the 6k pole composite), and the whole sampler runs as
    a short ``lax.map`` over GROUPS of tiles with one batched einsum pair
    per group instead of per-tile programs.

    Contract: taps whose displacement deviates more than ``res_halo``
    from the tile mean fall outside the window — weight 0 under
    border="constant" / dropped taps under "clamp" — the same beyond-halo
    behavior as the static sampler. Callers size ``res_halo_*`` from the
    field's physical smoothness (flow blur sigma, warp-ramp slope x tile
    extent).

    img (..., C, H, W); x, y (..., Ho, Wo) absolute source coords sharing
    img's leading dims (no candidate extras). Returns (..., C, Ho, Wo).
    Reference provenance: same math as PixFlow.h:493-534 sampling /
    cv::remap call sites; this is purely an access-pattern change.
    """
    precision = _resolve_precision(precision)
    p = plan_windows(
        img.shape[-2:], x.shape[-2:], res_halo_y, res_halo_x,
        interpolation, border, tr, tc,
    )
    if p.nty == 1 and p.ntx == 1:
        # degenerate: one window spans the source; no origins to follow
        win = build_windows(img, p)
        return sample_windows(win, p, x, y, precision=precision)
    m = 2 if interpolation == "bicubic" else 1
    res_ey, res_ex = res_halo_y + m, res_halo_x + m
    P_y, P_x = halo_y + m, halo_x + m

    lead = img.shape[:-2]  # includes channels
    nl = len(lead)
    n_lead_c = nl - 1  # coord lead dims (no channel)
    if x.ndim - 2 != n_lead_c:
        raise ValueError(
            "sample_displaced_residual: coords must share img's lead dims"
        )
    L = int(np.prod(lead[:-1], dtype=np.int64)) if n_lead_c else 1
    C = lead[-1]
    H, W = img.shape[-2:]

    # pad by the GLOBAL halos; extra tail so the farthest clamped origin's
    # window stays in bounds
    s_max_y = (p.nty - 1) * p.tr + (P_y - res_ey) + halo_y
    s_max_x = (p.ntx - 1) * p.tc + (P_x - res_ex) + halo_x
    pad_y_hi = max(P_y, s_max_y + p.bh - (P_y + H))
    pad_x_hi = max(P_x, s_max_x + p.bw - (P_x + W))
    padded = jnp.pad(
        img.reshape((L, C, H, W)),
        [(0, 0), (0, 0), (P_y, pad_y_hi), (P_x, pad_x_hi)],
    )
    Hp, Wp = padded.shape[-2:]

    T = p.nty * p.ntx
    tiles = np.arange(T)
    ty = jnp.asarray(tiles // p.ntx, jnp.int32)
    tx = jnp.asarray(tiles % p.ntx, jnp.int32)

    xt = _tile_coords(x, p).reshape((T, L, p.tr * p.tc))
    yt = _tile_coords(y, p).reshape((T, L, p.tr * p.tc))

    # per-(tile, lead) mean displacement -> rounded window origin in
    # padded coords, clamped so the static-size dynamic slice stays in
    # bounds (at the edges the clamp only drops coverage that border
    # handling would clamp/zero anyway)
    base_y = (ty * p.tr).astype(jnp.float32) + (p.tr - 1) / 2.0
    base_x = (tx * p.tc).astype(jnp.float32) + (p.tc - 1) / 2.0
    d_y = jnp.round(yt.mean(axis=-1) - base_y[:, None])  # (T, L)
    d_x = jnp.round(xt.mean(axis=-1) - base_x[:, None])
    # traced origins feed DMA slice starts: a NaN anywhere in the
    # displacement field (degenerate alpha regions upstream) survives
    # jnp.clip and casts to garbage int32 -> out-of-bounds DMA -> TPU
    # worker fault. Sanitize before the clamp.
    d_y = jnp.nan_to_num(d_y)
    d_x = jnp.nan_to_num(d_x)
    d_y = jnp.clip(d_y, -halo_y, halo_y).astype(jnp.int32)
    d_x = jnp.clip(d_x, -halo_x, halo_x).astype(jnp.int32)
    s_y = jnp.clip(ty[:, None] * p.tr + (P_y - res_ey) + d_y, 0, Hp - p.bh)
    s_x = jnp.clip(tx[:, None] * p.tc + (P_x - res_ex) + d_x, 0, Wp - p.bw)
    # an axis whose single window already spans the whole source must NOT
    # follow displacement: any origin shift would slide real pixels out of
    # the source-sized window (plan_windows pins bh/bw = n_src there)
    if p.nty == 1:
        s_y = jnp.full_like(s_y, P_y)
    if p.ntx == 1:
        s_x = jnp.full_like(s_x, P_x)

    if backend != "xla" and _is_f32_class(precision):
        # fused Pallas kernel: window DMA + one-hots + both contractions
        # stay in VMEM (no HBM stage temps). Kernel windows are padded to
        # hardware tiling (bh mult 8, bw mult 128) with matching extra
        # source padding, so the same clamped origins stay in bounds.
        from .pallas_remap import fused_window_sample, pallas_window_supported

        # DMA slice starts must sit on the (8, 128) memref tiling:
        # quantize origins DOWN and grow windows by the quantization slack
        bh_k = -(-(p.bh + 7) // 8) * 8
        bw_k = -(-(p.bw + 127) // 128) * 128
        # smallest group splitting the tile's P coords into lane-aligned
        # VMEM-fitting compute chunks sharing one window DMA: large tiles
        # (fewer grid steps — the per-step transition overhead dominated
        # the 6k novel-view stage) stay on the fused route instead of
        # falling back to XLA the moment group=1 exceeds the budget
        Pt_k = p.tr * p.tc
        grp = 0
        for g_try in range(1, max(1, Pt_k // 128) + 1):
            if Pt_k % g_try or (Pt_k // g_try) % 128:
                continue
            if pallas_window_supported(
                C, Pt_k, bh_k, bw_k, L, g_try, tight_x=True
            ):
                grp = g_try
                break
        if backend == "pallas" or (
            grp > 0 and jax.default_backend() == "tpu"
        ):
            padded_k = jnp.pad(
                padded,
                [(0, 0), (0, 0), (0, bh_k - p.bh), (0, bw_k - p.bw)],
            )
            out = fused_window_sample(
                padded_k,
                (s_y // 8) * 8,
                s_x,  # ACTUAL x origins: the kernel quantizes for the
                # DMA and residual-rolls the window (tight-x mode), so
                # the interpolation-matrix build pays p.bw lanes instead
                # of the up-to-127-lane alignment slack
                xt + float(P_x),
                yt + float(P_y),
                bh=bh_k,
                bw=bw_k,
                pad_y=P_y,
                pad_x=P_x,
                n_y=H,
                n_x=W,
                interpolation=interpolation,
                border=border,
                group=max(grp, 1),
                precision=precision,
                base_bw=p.bw,
            )  # (T, L, C, P)
            out = out.reshape((p.nty, p.ntx, L * C, p.tr, p.tc))
            out = out.transpose((2, 0, 3, 1, 4))
            out = out.reshape((L * C, p.nty * p.tr, p.ntx * p.tc))
            out = out[..., : p.Ho, : p.Wo]
            return out.reshape(lead + (p.Ho, p.Wo))

    g = max(1, min(group, T))
    g = max(d for d in range(1, g + 1) if T % d == 0)
    n = T // g
    grp = lambda a: a.reshape((n, g) + a.shape[1:])

    def body(args):
        xt_, yt_, sy_, sx_ = args  # (g, L, Pt), (g, L)
        wins = []
        for i in range(g):
            per_lead = [
                jax.lax.dynamic_slice(
                    padded[l], (0, sy_[i, l], sx_[i, l]), (C, p.bh, p.bw)
                )
                for l in range(L)
            ]
            wins.append(jnp.stack(per_lead))
        win = jnp.stack(wins)  # (g, L, C, bh, bw)
        # one-hot origins are the traced per-(tile, lead) window starts in
        # padded coords: fold (g, L) into the sampler's tile axis so
        # tile_stride=1 turns each entry into a direct origin
        ohx = _onehot_axis(
            xt_.reshape((g * L, -1)), sx_.reshape(-1), p.W, p.bw, 1, P_x, p
        ).reshape((g, L, -1, p.bw))
        ohy = _onehot_axis(
            yt_.reshape((g * L, -1)), sy_.reshape(-1), p.H, p.bh, 1, P_y, p
        ).reshape((g, L, -1, p.bh))
        if p.bh > p.bw and p.bh >= 512:
            tmp = jnp.einsum(
                "tlph,tlchw->tlcpw", ohy, win, precision=precision
            )
            return jnp.einsum(
                "tlpw,tlcpw->tlcp", ohx, tmp, precision=precision
            )
        tmp = jnp.einsum(
            "tlpw,tlchw->tlcph", ohx, win, precision=precision
        )
        return jnp.einsum(
            "tlph,tlcph->tlcp", ohy, tmp, precision=precision
        )

    out = jax.lax.map(body, (grp(xt), grp(yt), grp(s_y), grp(s_x)))
    out = out.reshape((T, L * C, p.tr * p.tc))
    # untile (T, LC, Pt) -> (LC, Ho, Wo)
    out = out.reshape((p.nty, p.ntx, L * C, p.tr, p.tc))
    out = out.transpose((2, 0, 3, 1, 4))
    out = out.reshape((L * C, p.nty * p.tr, p.ntx * p.tc))
    out = out[..., : p.Ho, : p.Wo]
    return out.reshape(lead + (p.Ho, p.Wo))


# Window-stack elements above which sample_displaced switches to the
# sliced path (the stack would otherwise materialize in full even with
# tile chunking, since lax.map operands are whole arrays).
WINDOW_STACK_SLICED_ELEMS = 192 * 1024 * 1024


def sample_displaced(
    img,
    x,
    y,
    halo_y: int,
    halo_x: int,
    interpolation: str = "bilinear",
    border: str = "clamp",
    tr: int = 8,
    tc: int = 128,
    tile_chunk: int = 0,
    max_window_elems: int = 0,
    max_onehot_elems: int = 128 * 1024 * 1024,
    precision: str = "float32",
):
    """One-shot convenience: build windows + sample. img (..., C, H, W);
    x, y (..., Ho, Wo) absolute source coords with |x - col| <= halo_x,
    |y - row| <= halo_y (output pixel (row, col) maps to source (row, col)
    + displacement). Returns (..., C, Ho, Wo).

    max_window_elems > 0 switches to the budgeted plan (tiles grown until
    the window stack fits) and derives tile_chunk from max_onehot_elems —
    the memory-safe mode for preset-scale shapes."""
    lead_elems = int(np.prod(img.shape[:-2], dtype=np.int64))
    if max_window_elems:
        plan = plan_windows_budgeted(
            img.shape[-2:], x.shape[-2:], halo_y, halo_x, interpolation,
            border, tr, tc,
            elems_per_px=lead_elems,
            max_window_elems=max_window_elems,
        )
        tile_chunk = sampler_tile_chunk(
            plan,
            int(np.prod(x.shape[:-2], dtype=np.int64)),
            max_onehot_elems,
            win_lead_elems=lead_elems,
        )
    else:
        plan = plan_windows(
            img.shape[-2:], x.shape[-2:], halo_y, halo_x, interpolation,
            border, tr, tc,
        )
    stack_elems = plan.nty * plan.ntx * plan.bh * plan.bw * lead_elems
    if (
        max_window_elems
        and plan.nty * plan.ntx > 1
        and stack_elems > WINDOW_STACK_SLICED_ELEMS
    ):
        return sample_windows_sliced(img, plan, x, y, precision=precision)
    win = build_windows(img, plan)
    return sample_windows(
        win, plan, x, y, tile_chunk=tile_chunk, precision=precision
    )


def _pick_kernel_group(C, P, bh, bw, L, compute_dtype, n_off=1, n_ox=1):
    """Smallest G splitting P into lane-aligned VMEM-fitting groups
    (lead-folded kernel accounting — the static-plan samplers' mode)."""
    from .pallas_remap import pallas_window_supported

    if P % 128:
        return 0
    for G in range(1, P // 128 + 1):
        if P % G or (P // G) % 128:
            continue
        if pallas_window_supported(
            C, P, bh, bw, L, G, compute_dtype, n_off, n_ox,
            lead_folded=True,
        ):
            return G
    return 0


def make_window_sampler(
    img,
    out_hw,
    halo_y: int,
    halo_x: int,
    interpolation: str = "bilinear",
    border: str = "clamp",
    tr: int = 8,
    tc: int = 128,
    precision: str = "float32",
    xla_plan: WindowPlan | None = None,
    xla_tile_chunk: int = 0,
    backend: str = "auto",
    min_out_px: int = 16384,
    offsets: tuple | None = None,
):
    """Reusable sampler fn(x, y) over a fixed (B, C, H, W) source.

    Coords x/y: (E..., B, Ho, Wo) absolute source coordinates (extra
    leading dims = flow candidates sharing the source); returns
    (E..., B, C, Ho, Wo).

    offsets: optional static ((oy, ox), ...) integer displacements; the
    sampler then takes plain (B, Ho, Wo) coords and returns
    (O, B, C, Ho, Wo) where slot o samples at (x + ox, y + oy) with
    tap-clamp border semantics. On the Pallas route every offset field
    shares ONE interpolation-matrix build and window DMA (the flow
    ranking's 13 candidate fields are all base_warp + integer offset —
    pixflow round-4 restructure); the XLA fallback evaluates the
    offset coords as folded candidates (same values, no sharing).

    On TPU this routes through the fused Pallas window kernel with STATIC
    tile origins (ty*tr, aligned tx*tc): per-tile windows DMA into VMEM
    (double-buffered) and the one-hot operands / stage-A temps never
    touch HBM. The flow solver re-samples one gradient image ~60x per
    pyramid level, which made the XLA einsum route the renderer's top
    HBM consumer at preset scale (side flow 174 GiB/frame at 6k —
    BASELINE.md round-4 roofline). precision "default" = bf16 single-pass
    MXU contractions (the XLA samplers' meaning); "float32" = exact.

    Off TPU — or when the plan exceeds the kernel's VMEM budget, or the
    output is below min_out_px (tiny coarse pyramid levels, where dispatch
    latency dominates either way) — falls back to build_windows +
    sample_windows on ``xla_plan`` (callers pass their tuned/budgeted plan
    so non-TPU behavior is unchanged).
    """
    import jax

    B, C, H, W = img.shape
    Ho, Wo = out_hw

    # resolve the session policy once; everything downstream (the fused
    # kernel's contraction passes, the XLA fallback's einsums, the bf16
    # compute_dtype choice) derives from the SAME resolved string so the
    # two backends cannot diverge for identical arguments
    precision = _resolve_precision(precision)
    compute_dtype = "float32" if _is_f32_class(precision) else "bfloat16"

    use_pallas = backend == "pallas" or (
        backend != "xla" and jax.default_backend() == "tpu"
    )
    my = max((abs(o[0]) for o in offsets), default=0) if offsets else 0
    mx = max((abs(o[1]) for o in offsets), default=0) if offsets else 0
    n_off = len(offsets) if offsets else 1
    n_ox = len({o[1] for o in offsets}) if offsets else 1
    plan = None
    if use_pallas and (Ho * Wo >= min_out_px or backend == "pallas"):
        plan = plan_windows(
            (H, W), (Ho, Wo), halo_y, halo_x, interpolation, border, tr, tc
        )
        # origins must sit on the (8, 128) memref tiling: ty*tr is aligned
        # for tr multiple of 8; tx*tc quantizes down with window slack —
        # except in offsets mode, where the kernel's static window slices
        # assume zero x-slack (tc multiple of 128, or a single x-tile)
        if plan.tr % 8 or (
            offsets and plan.ntx > 1 and plan.tc % 128
        ):
            plan = None
    if plan is not None:
        p = plan
        bh_k = -(-(p.bh + 2 * my) // 8) * 8
        xq = 0 if p.ntx <= 1 else (p.tc % 128)
        bw_k = -(-(p.bw + 2 * mx + (127 if xq else 0)) // 128) * 128
        Pt = p.tr * p.tc
        group_probe = _pick_kernel_group(
            C, -(-Pt // 128) * 128, bh_k, bw_k, B, compute_dtype,
            n_off, n_ox,
        )
        if group_probe == 0:
            plan = None
    if plan is None:
        # XLA fallback: the pre-round-4 path (offset fields evaluated as
        # folded candidate coords — same values, no build sharing)
        if xla_plan is None:
            xla_plan = plan_windows(
                (H, W), (Ho, Wo), halo_y + my, halo_x + mx, interpolation,
                border, tr, tc,
            )
        windows = build_windows(img, xla_plan)

        if offsets is None:
            def fn_xla(x, y):
                return sample_windows(
                    windows, xla_plan, x, y,
                    tile_chunk=xla_tile_chunk, precision=precision,
                )
        else:
            off = np.asarray(offsets, np.float32)  # (O, 2) [oy, ox]

            def fn_xla(x, y):
                import jax.numpy as jnp

                xs = x[None] + jnp.asarray(off[:, 1])[:, None, None, None]
                ys = y[None] + jnp.asarray(off[:, 0])[:, None, None, None]
                return sample_windows(
                    windows, xla_plan, xs, ys,
                    tile_chunk=xla_tile_chunk, precision=precision,
                )

        fn_xla.backend = "xla"
        return fn_xla

    import jax.numpy as jnp

    from .pallas_remap import fused_window_sample

    p = plan
    # offsets mode reads the margin around the base window, so the source
    # padding must replicate edges for tap-clamp semantics (zeros for
    # "constant"); the base path never weights padded pixels
    pad_mode = "edge" if (offsets and border == "clamp") else "constant"
    pad_y_t = p.pad_y + my
    pad_x_t = p.pad_x + mx
    nl = img.ndim - 2
    ky = -(-bh_k // p.tr) if p.nty > 1 else 1
    pady2 = max(0, (p.nty - 1) * p.tr + bh_k - (H + pad_y_t))
    T = p.nty * p.ntx
    tiles = np.arange(T)
    sy = ((tiles // p.ntx) * p.tr).astype(np.int32)
    sx_raw = ((tiles % p.ntx) * p.tc).astype(np.int32)
    # tight-x (non-offsets, unaligned tile columns): hand the kernel the
    # ACTUAL origins — it quantizes for the DMA and residual-rolls the
    # window, so the interpolation-matrix build pays p.bw lanes instead
    # of the alignment slack baked into bw_k. Aligned tile columns have
    # no slack to shed; keep the plain path there.
    tight = offsets is None and bool(np.any(sx_raw % 128))
    sx = sx_raw if tight else (sx_raw // 128) * 128
    padx2 = max(
        0, int((sx // 128 * 128).max()) + bw_k - (W + pad_x_t)
    )
    padded = jnp.pad(
        img,
        [(0, 0)] * nl + [(pad_y_t, pady2), (pad_x_t, padx2)],
        mode=pad_mode,
    )
    sy = jnp.asarray(sy)  # (T,) — per-tile origins shared by every lead
    sx = jnp.asarray(sx)
    Pt = p.tr * p.tc
    groups: dict[int, int] = {}

    def fn(x, y):
        extra_shape = x.shape[: x.ndim - 3]
        if offsets is not None and extra_shape:
            raise ValueError("offsets mode takes plain (B, Ho, Wo) coords")
        E = int(np.prod(extra_shape, dtype=np.int64)) if extra_shape else 1
        xt = _tile_coords(x, p)  # (T, E..., B, Pt)
        yt = _tile_coords(y, p)
        if extra_shape:
            ne = len(extra_shape)
            perm = (0, 1 + ne) + tuple(range(1, 1 + ne)) + (xt.ndim - 1,)
            xt = xt.transpose(perm).reshape(T, B, E * Pt)
            yt = yt.transpose(perm).reshape(T, B, E * Pt)
        P0 = E * Pt
        P = -(-P0 // 128) * 128
        if P != P0:
            xt = jnp.pad(xt, [(0, 0), (0, 0), (0, P - P0)], mode="edge")
            yt = jnp.pad(yt, [(0, 0), (0, 0), (0, P - P0)], mode="edge")
        if P not in groups:
            groups[P] = _pick_kernel_group(
                C, P, bh_k, bw_k, B, compute_dtype, n_off, n_ox
            )
        G = groups[P]
        if G == 0:  # shouldn't happen (probed at factory time), be safe
            G = P // 128
        out = fused_window_sample(
            padded, sy, sx,
            xt + float(pad_x_t), yt + float(pad_y_t),
            bh=bh_k, bw=bw_k, pad_y=pad_y_t, pad_x=pad_x_t,
            n_y=H, n_x=W, interpolation=interpolation, border=border,
            group=G, compute_dtype=compute_dtype,
            offsets=offsets,
            base_bh=p.bh if offsets is not None else None,
            base_bw=p.bw if (offsets is not None or tight) else None,
            off_my=my, off_mx=mx, lead_folded=True,
            precision=precision if compute_dtype == "float32" else None,
        )  # (T, B, C, P) or (T, B, O, C, P)
        O = 1 if offsets is None else len(offsets)
        out = out[..., :P0]
        out = out.reshape(T, B, O * C, E, Pt)
        out = out.transpose(0, 3, 1, 2, 4)  # (T, E, B, O*C, Pt)
        out = out.reshape(p.nty, p.ntx, E, B, O * C, p.tr, p.tc)
        out = out.transpose(2, 3, 4, 0, 5, 1, 6)
        out = out.reshape(E, B, O * C, p.nty * p.tr, p.ntx * p.tc)
        out = out[..., : p.Ho, : p.Wo]
        if offsets is None:
            return out.reshape(extra_shape + (B, C, p.Ho, p.Wo))
        out = out.reshape(B, O, C, p.Ho, p.Wo)
        return out.transpose(1, 0, 2, 3, 4)  # (O, B, C, Ho, Wo)

    fn.backend = "pallas"
    return fn
