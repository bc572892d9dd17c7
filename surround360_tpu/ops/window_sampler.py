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
    "sampler_tile_chunk",
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
