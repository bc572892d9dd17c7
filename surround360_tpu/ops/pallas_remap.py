"""Pallas TPU kernel: fused windowed resampling.

The XLA window samplers (`ops/window_sampler.py`, `ops/remap.py`'s banded
static remap) express interpolation as two one-hot matmuls, which forces
the (C, P, band) stage-A intermediate and both one-hot operands through
HBM — historically 593 GiB of traffic for the 6k projection stage on the
superseded XLA route (~300x the image data; the number that motivated
this kernel). With the fusion below the same stage's measured traffic is
11.0 GiB (BASELINE.md round-4 roofline). The kernel fuses window
extraction, one-hot construction and both contractions in VMEM:

  per grid step (tile t, lead l, group g):
    DMA  padded[l, :, sy[t,l]:sy[t,l]+BH, sx[t,l]:sx[t,l]+BW] -> VMEM
         (double-buffered: step (t, l)'s window loads while (t, l)-1
         computes, so the copy rides under the MXU work)
    ohx  (Pg, BW), ohy (Pg, BH) built in-register from the group's coords
    out[t, l, c, g*Pg:(g+1)*Pg] = sum_h ohy * (ohx . win[c])

Window origins ``sy``/``sx`` ride the scalar-prefetch channel, so they
may be host-constant (static lens warps — the banded remap's per-tile
bounds) or traced (displacement-following residual windows computed from
the frame's own flow). Only the windows and the output touch HBM.

``group`` > 1 splits each (tile, lead)'s P sample coords into G
sequential compute steps sharing ONE window DMA — the flow solver folds
~13 candidate displacement fields into P, whose one-hot operands would
otherwise exceed VMEM (round-4; see flow/pixflow.py's ranking sampler).

``compute_dtype="bfloat16"`` casts the one-hots and window to bf16 for
single-pass MXU contractions (f32 accumulation) — the same semantics as
the XLA samplers' precision="default" mode that the flow candidate
RANKING already ships with; exact paths (output warps) stay float32.

Semantics match `ops/window_sampler.py`: exact bilinear/bicubic wherever
every tap lands inside the tile's window; beyond-window taps contribute
weight 0 ("constant") or are dropped ("clamp") — callers size windows
from physical displacement bounds. Reference provenance: the same
cv::remap / getPixBilinear32FExtend sampling contract
(ImageWarper.cpp:95-174, PixFlow.h:493-534) — this is an access-pattern
rewrite, not new math.
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np

from .precision import F32_PRECISION as _F32_PRECISION

__all__ = ["fused_window_sample", "pallas_window_supported"]

# VMEM accounting budget for one grid step's buffers (double-buffered
# window + one-hots + stage-A temp + coord/out blocks). Mosaic's actual
# stack allocation runs ~2x this model (elementwise-chain transients of
# the distance-kernel build at f32, plus its own block double-buffering),
# so pallas_call passes vmem_limit_bytes = _VMEM_HW_LIMIT: the v5e core
# has far more physical VMEM than the 16 MB default scoped limit — a
# measured 16.45M allocation at the 6k pole-flow geometry compiled out
# of the box once the limit was raised.
_VMEM_BUDGET = 28 * 1024 * 1024
_VMEM_HW_LIMIT = 110 * 1024 * 1024


def _step_vmem_bytes(
    C, P, bh, bw, L=1, group=1, compute_dtype="float32",
    n_offsets=1, n_ox=1, lead_folded=False, tight_x=False,
):
    Pg = -(-P // group)
    dt = 2 if compute_dtype == "bfloat16" else 4
    if lead_folded:
        win = L * C * bh * bw * 4  # one DMA per tile, single-buffered
        blocks = 2 * (2 * L * P * 4) + 2 * (L * n_offsets * C * P * 4)
    else:
        win = 2 * C * bh * bw * 4  # double-buffered, DMA'd at source dtype
        blocks = 2 * (2 * P * 4) + 2 * (n_offsets * C * P * 4)
    if tight_x:
        win += C * bh * bw * 4  # residual-rolled f32 window copy
    onehots = Pg * (bh + bw) * dt
    # f32 transient of the distance-kernel build before the cast
    onehots += Pg * max(bh, bw) * 4
    tmp = n_ox * Pg * C * bh * 4  # channel-folded stage-A per unique ox
    return win + onehots + tmp + blocks


def pallas_window_supported(
    C, P, bh, bw, L=1, group=1, compute_dtype="float32",
    n_offsets=1, n_ox=1, lead_folded=False, tight_x=False,
) -> bool:
    return (
        _step_vmem_bytes(
            C, P, bh, bw, L, group, compute_dtype, n_offsets, n_ox,
            lead_folded, tight_x,
        )
        <= _VMEM_BUDGET
    )


def _make_kernel(
    C, L, P, G, bh, bw, pad_y, pad_x, n_y, n_x, interpolation, border,
    compute_dtype, offsets=None, bhb=None, bwb=None, off_my=0, off_mx=0,
    precision=None,
):
    """offsets: optional static ((oy, ox), ...) integer displacements. In
    offsets mode the DMA'd window (bh, bw) is the base extent widened by
    the offset margins (off_my, off_mx) + alignment, ONE full-width
    tent/one-hot pair is built from the base coords, and every offset
    field reuses it against LANE-ROLLED operands:

      sample(x + ox, y + oy) = sum_h roll(ohy, oy)[h] (ohx . roll(win_c,
      -ox, lanes))[h]

    (tent(x + ox - j) = tent(x - (j - ox)) — an integer shift of the same
    matrix, realized as a hardware lane rotation of the other operand).
    The flow solver's candidate ranking (13 fields per round whose
    positions all equal base_warp + const integer offset) pays ONE
    interpolation-matrix build instead of 13 — the build was the measured
    VPU bottleneck (round-4: ~60% of kernel step time at 6k flow
    geometry). The tent support is masked off the outer margin bands so
    beyond-halo coords keep reading zero weight (the window contract)
    instead of circularly-wrapped pixels."""
    a = -0.75
    Pg = P // G
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    # tight-x (offsets is None, bwb = the EXACT logical window width):
    # sx_ref holds ACTUAL window origins; the kernel quantizes DOWN to
    # the 128-lane tiling for the DMA, lane-rolls the fetched window by
    # the residual, and builds the x interpolation matrix at the TIGHT
    # padded width anchored at the actual origin, with columns >= bwb
    # weight-masked (the roll wraps the fetch tail around — without the
    # mask a beyond-halo tap could read a wrapped pixel instead of the
    # contract's zero). The (Pg, b) matrix build is the kernel's VPU
    # bottleneck (round-5 measurement: step time scales linearly with
    # Pg*(bh+bw) across tile geometries), and the alignment slack alone
    # inflated b by up to 127 lanes — 384 vs a 149-wide logical window at
    # the 6k novel view. The roll costs C*bh*bw one-move ops per window,
    # ~25x less than the slack's matrix-build cost at Pg=512.
    tight_x = offsets is None and bwb is not None
    x_hi = 0
    if offsets is None:
        bhb = bh
        if tight_x:
            x_hi = bwb  # exact width: mask wrapped columns beyond it
            bwb = -(-bwb // 128) * 128
            if x_hi == bwb:
                x_hi = 0  # lane-aligned already; the mask is a no-op
        else:
            bwb = bw

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    # The interpolation matrix is built as a DISTANCE KERNEL of the
    # (coord - column) grid rather than a per-tap one-hot accumulation:
    # bilinear weight(j) = relu(1 - |x - j|) (the tent function), bicubic
    # = the Catmull-Rom-style polynomial of s = |x - j| on [0, 2). This
    # needs ~4 VPU ops per (row, column) instead of ~5 per TAP (8-20
    # total) — the one-hot build is the kernel's VPU bottleneck at flow
    # geometries (round-4 measurement: 23 us/step, ~10 of it here).
    #
    # Border semantics:
    #  * "constant": beyond-source taps must contribute zero — the padded
    #    source IS zero there, so the weight needs no validity mask.
    #  * "clamp" + bilinear: clamping the COORDINATE to [0, n-1] is
    #    exactly equivalent to clamping each tap index (both taps collapse
    #    onto the border pixel with total weight 1).
    #  * "clamp" + bicubic is NOT coordinate-clampable (taps stack on the
    #    border pixel with a different weight profile), so that combo
    #    keeps the per-tap masked build below.
    def onehot(xp, origin, pad, n, b, edge_mask=0, hi_mask=0):
        """(Pg, b) interpolation matrix in compute dtype. xp: (Pg,) coords
        in PADDED units; origin: scalar window start in padded coords.
        edge_mask > 0 zeroes the outer bands [0, edge_mask) and
        [b - edge_mask, b) — in offsets mode legitimate (within-halo)
        taps never land there, so the mask only drops beyond-halo weights
        that lane rolls would otherwise wrap around. hi_mask > 0 zeroes
        columns >= hi_mask (tight-x: the residual-rolled window wraps the
        fetch tail into [hi_mask, b), which must stay weightless)."""
        if border == "clamp" and interpolation == "bilinear":
            xp = jnp.clip(xp - pad, 0.0, n - 1.0) + pad
        local = xp - origin.astype(jnp.float32)
        grid = jax.lax.broadcasted_iota(jnp.int32, (Pg, b), 1)
        if interpolation != "bicubic" or border != "clamp":
            d = local[:, None] - grid.astype(jnp.float32)
            s = jnp.abs(d)
            if interpolation == "bicubic":
                w = jnp.where(s < 1.0, k01(s), jnp.where(s < 2.0, k12(s), 0.0))
            else:
                w = jnp.maximum(1.0 - s, 0.0)
            if edge_mask:
                w = w * ((grid >= edge_mask) & (grid < b - edge_mask))
            if hi_mask:
                w = w * (grid < hi_mask)
            return w.astype(cdt)
        # bicubic + clamp: per-tap masked accumulation (exact reference
        # semantics; not on any hot path)
        l0 = jnp.floor(local)
        t = local - l0
        i0 = l0.astype(jnp.int32)
        taps = [(-1, k12(t + 1.0)), (0, k01(t)), (1, k01(1.0 - t)),
                (2, k12(2.0 - t))]
        acc = jnp.zeros((Pg, b), cdt)
        for off, w in taps:
            idx = i0 + off
            idx_abs = idx + origin - pad
            idx = jnp.clip(idx_abs, 0, n - 1) + pad - origin
            acc = acc + ((grid == idx[:, None]) * w[:, None]).astype(cdt)
        if hi_mask:
            acc = acc * (grid < hi_mask).astype(cdt)
        return acc

    # f32 contraction passes: the caller's RESOLVED per-call precision
    # (threaded through fused_window_sample) wins; the module-global env
    # default is only the fallback — so an explicit
    # precision="bfloat16_3x" argument computes the same way on the
    # Pallas and XLA backends. Mosaic only lowers DEFAULT and HIGHEST
    # dots (Precision.HIGH raises NotImplementedError), so the 3-pass
    # class is emulated manually below: split each f32 operand into bf16
    # limbs hi + lo and accumulate hi*hi + lo*hi + hi*lo in f32 — three
    # native single-pass MXU dots, ~1e-7 relative on image-range data at
    # half HIGHEST's six passes (same arithmetic XLA emits for HIGH).
    prec = (
        None
        if compute_dtype == "bfloat16"
        else jax.lax.Precision(precision or _F32_PRECISION)
    )
    emul3 = prec == jax.lax.Precision.HIGH

    def _dot_rows(a, b, precision):
        """(P, K) x (M, K) -> (P, M), contracting dim 1 of both."""
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    def _dot3(a, b):
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh_ = b.astype(jnp.bfloat16)
        bl = (b - bh_.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            _dot_rows(ah, bh_, None)
            + _dot_rows(al, bh_, None)
            + _dot_rows(ah, bl, None)
        )

    def contract(a, b):
        """Precision-policy dot (P, K) x (M, K) -> (P, M)."""
        if emul3:
            return _dot3(a, b)
        return _dot_rows(a, b, prec)

    def compute_one(x, y, sy, sx, wl, write, rx=None):
        """One lead's samples: build the interpolation matrices, contract
        against this lead's window value wl (C, bh, bw), hand each output
        row to ``write(o_or_None, c, values)``. rx: tight-x lane residual
        (actual - quantized origin); sx is then the ACTUAL origin."""
        from jax.experimental.pallas import tpu as pltpu

        if offsets is None:
            ohx = onehot(x, sx, pad_x, n_x, bwb, hi_mask=x_hi)
            ohy = onehot(y, sy, pad_y, n_y, bh)
        else:
            # full-width matrices shared by every offset (see header)
            ohx = onehot(x, sx, pad_x, n_x, bw, edge_mask=off_mx)
            ohy = onehot(y, sy, pad_y, n_y, bh, edge_mask=off_my)
        ohy32 = ohy.astype(jnp.float32)
        if offsets is None:
            wm = wl.reshape(C * bh, bw)
            if rx is not None:
                # align the window to the actual origin: rolled[:, j] =
                # win[:, j + rx], then contract only the tight width —
                # both the matrix build above and the dot below shrink
                # from the fetch width to bwb
                wm = pltpu.roll(wm, (bw - rx) % bw, 1)[:, :bwb]
            if compute_dtype == "bfloat16":
                wm = wm.astype(jnp.bfloat16)
            # one dot for ALL channels: (Pg, bwb) x (C*bh, bwb)^T ->
            # (Pg, C*bh) (bigger MXU tiles than C sequential dots).
            # f32 mode must ask for multi-pass explicitly: Mosaic's
            # default lowers f32 matmuls to ONE bf16 MXU pass, which
            # round-4 measured as ~5e-3 sampling error on shipped
            # "exact" warps (projection / novel view)
            tmp = contract(ohx, wm)  # (Pg, C*bh)
            for c in range(C):
                write(
                    None, c,
                    jnp.sum(tmp[:, c * bh : (c + 1) * bh] * ohy32, axis=-1),
                )
            return
        # offsets mode: per unique x-offset, contract the shared ohx
        # against the lane-rolled window (rolled in f32 — Mosaic's lane
        # rotate is 32-bit only); per (oy, ox), reduce with rolled ohy
        tmps = {}
        for ox in sorted({o[1] for o in offsets}):
            per_c = []
            for c in range(C):
                wr = pltpu.roll(wl[c], (-ox) % bw, 1) if ox else wl[c]
                if compute_dtype == "bfloat16":
                    wr = wr.astype(jnp.bfloat16)
                per_c.append(contract(ohx, wr))  # (Pg, bh)
            tmps[ox] = per_c
        ohys = {
            oy: (pltpu.roll(ohy32, oy % bh, 1) if oy else ohy32)
            for oy in sorted({o[0] for o in offsets})
        }
        for o, (oy, ox) in enumerate(offsets):
            for c in range(C):
                write(o, c, jnp.sum(tmps[ox][c] * ohys[oy], axis=-1))

    def kernel_folded(sy_ref, sx_ref, padded_ref, xt_ref, yt_ref, out_ref,
                      win, sem):
        """Lead-folded variant: ONE window DMA per tile covers every lead
        (origins are per-tile — the static-plan samplers), and the lead
        loop unrolls INSIDE the grid step. Grid steps drop from T*L*G to
        T*G — the per-step transition overhead dominated the flow-geometry
        kernel (round-4: 61 us/step at side-L0). The DMA is synchronous at
        each tile's first group step: it moves ~2% of the step's compute
        time, so double-buffering (and its traced buffer-slot reads) isn't
        worth the complexity here."""
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        t = pl.program_id(0)
        g = pl.program_id(1)
        sy = pl.multiple_of(sy_ref[t], 8)
        sx = sx_ref[t]
        rx = None
        if tight_x:
            sxq = pl.multiple_of((sx // 128) * 128, 128)
            rx = sx - sxq
        else:
            sx = sxq = pl.multiple_of(sx, 128)

        @pl.when(g == 0)
        def _():
            copy = pltpu.make_async_copy(
                padded_ref.at[:, :, pl.ds(sy, bh), pl.ds(sxq, bw)],
                win,
                sem,
            )
            copy.start()
            copy.wait()

        # fori_loop (not a static unroll: L x offsets x channels bodies
        # blew Mosaic compile past 9 minutes per kernel instance)
        def body(l, _):
            x = xt_ref[0, l, pl.ds(g * Pg, Pg)]
            y = yt_ref[0, l, pl.ds(g * Pg, Pg)]

            def write(o, c, vals):
                if o is None:
                    out_ref[0, l, c, pl.ds(g * Pg, Pg)] = vals
                else:
                    out_ref[0, l, o, c, pl.ds(g * Pg, Pg)] = vals

            compute_one(x, y, sy, sx, win[l], write, rx=rx)
            return 0

        jax.lax.fori_loop(0, L, body, 0)

    def kernel(
        sy_ref, sx_ref, map_ref, padded_ref, xt_ref, yt_ref, out_ref, win,
        sem,
    ):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        t = pl.program_id(0)
        l = pl.program_id(1)
        g = pl.program_id(2)
        j = t * L + l
        n_wins = pl.num_programs(0) * L

        def dma(jj, slot):
            # origins are pre-quantized to the (8, 128) memref tiling
            # (tight-x: x quantized HERE from the actual origin) — the
            # hint lets Mosaic prove the DMA slice is tile-aligned. They
            # ride SMEM flattened to 1-D: 2-D SMEM operands are lane-padded
            # to 128 and (T, L) would blow the 1 MB SMEM budget.
            sy = pl.multiple_of(sy_ref[jj], 8)
            sxv = sx_ref[jj]
            if tight_x:
                sxv = (sxv // 128) * 128
            sx = pl.multiple_of(sxv, 128)
            lj = jj % L if L > 1 else 0
            return pltpu.make_async_copy(
                padded_ref.at[lj, :, pl.ds(sy, bh), pl.ds(sx, bw)],
                win.at[slot],
                sem.at[slot],
            )

        # double buffering: at each (t, l)'s first group step, kick off the
        # NEXT window's DMA so it overlaps this window's G compute steps
        @pl.when(g == 0)
        def _():
            @pl.when(j == 0)
            def _():
                dma(0, 0).start()

            @pl.when(j + 1 < n_wins)
            def _():
                dma(j + 1, (j + 1) % 2).start()

        sy = pl.multiple_of(sy_ref[j], 8)
        sx = sx_ref[j]
        rx = None
        if tight_x:
            rx = sx - (sx // 128) * 128
        else:
            sx = pl.multiple_of(sx, 128)
        # coords arrive in padded units; onehot localizes to the window
        # (base region starts at the offset margin in offsets mode). The
        # group's slice start g*Pg is lane-aligned (Pg multiple of 128).
        x = xt_ref[0, 0, pl.ds(g * Pg, Pg)]
        y = yt_ref[0, 0, pl.ds(g * Pg, Pg)]

        @pl.when(g == 0)
        def _():
            dma(j, j % 2).wait()

        def write(o, c, vals):
            if o is None:
                out_ref[0, 0, c, pl.ds(g * Pg, Pg)] = vals
            else:
                out_ref[0, 0, o, c, pl.ds(g * Pg, Pg)] = vals

        compute_one(x, y, sy, sx, win[j % 2], write, rx=rx)

    return kernel, kernel_folded


@partial(
    jax.jit,
    static_argnames=(
        "bh", "bw", "pad_y", "pad_x", "n_y", "n_x", "interpolation",
        "border", "group", "compute_dtype", "offsets", "base_bh",
        "base_bw", "off_my", "off_mx", "lead_folded", "vmem_limit",
        "tile_map", "precision",
    ),
)
def fused_window_sample(
    padded,
    sy,
    sx,
    xt,
    yt,
    *,
    bh: int,
    bw: int,
    pad_y: int,
    pad_x: int,
    n_y: int,
    n_x: int,
    interpolation: str = "bicubic",
    border: str = "constant",
    group: int = 1,
    compute_dtype: str = "float32",
    offsets: tuple | None = None,
    base_bh: int | None = None,
    base_bw: int | None = None,
    off_my: int = 0,
    off_mx: int = 0,
    lead_folded: bool = False,
    vmem_limit: int | None = None,
    tile_map: tuple | None = None,
    precision: str | None = None,
):
    """padded: (L, C, Hp, Wp) source, already padded by (pad_y, pad_x) on
    the low side (high-side padding must make every window slice
    in-bounds). sy/sx: (T, L) int32 window origins in padded coords,
    pre-clamped to [0, Hp - bh] / [0, Wp - bw] AND quantized to multiples
    of (8, 128) — the VMEM/HBM memref tiling; xt/yt: (T, L, P) float32
    sample coords in PADDED units (absolute + pad). Returns (T, L, C, P).

    tile_map: optional STATIC tuple of ints selecting a SUBSET of
    xt/yt's tiles to evaluate (sy/sx then have Tb rows and the output is
    (Tb, L, C, P) in tile_map order). The selection rides the
    scalar-prefetch channel into the BlockSpec index maps, so the full
    coord array is consumed directly — measured on this platform
    (2026-08-19): an XLA *gather* (coords[idx]) feeding a pallas_call
    operand inside a larger jitted program kernel-faults the TPU worker,
    while the same values via prefetched block indices (or static slices
    / elementwise producers) are fine. The bucketed static remap selects
    its row-extent buckets this way. Not supported with lead_folded.

    group: split each (tile, lead)'s P coords into this many sequential
    compute steps sharing one window DMA (P must divide into lane-aligned
    P/group chunks). compute_dtype: "float32" (exact) or "bfloat16"
    (single-pass MXU, f32 accumulation) for the contraction operands.

    offsets: optional static ((oy, ox), ...) integer displacements —
    returns (T, L, O, C, P) where slot o samples at coords + offsets[o]
    with tap-clamp/zero semantics read from the widened window. bh/bw are
    then the FETCHED window extents; base_bh/base_bw the one-hot extents
    and off_my/off_mx the margins (bh >= base_bh + 2*off_my etc.).

    Tight-x (offsets is None, base_bw < bw): sx holds ACTUAL (unaligned)
    per-(tile, lead) origins; the kernel quantizes them down to the
    128-lane tiling for the DMA, lane-rolls the fetched window by the
    residual, and builds the x interpolation matrix at width base_bw
    anchored at the actual origin. bw stays the fetch extent and must be
    >= pad128(base_bw + 127) so the rolled tight span is always covered.
    The matrix build is the measured per-step VPU bound, so shedding the
    alignment slack (up to 127 lanes) is the difference between a 384-
    and a 256-wide build at the 6k novel-view geometry.

    lead_folded: origins are PER-TILE (sy/sx of length T, shared by every
    lead) and the whole (L, C, bh, bw) window rides one DMA per tile with
    the lead loop unrolled inside the grid step — T*G steps instead of
    T*L*G (the step-transition overhead dominated flow geometries).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, C, Hp, Wp = padded.shape
    P = xt.shape[-1]
    assert P % group == 0 and (P // group) % 128 == 0, (P, group)
    assert offsets is not None or base_bw is None or base_bw + 127 <= bw, (
        "tight-x fetch must cover the rolled tight span", base_bw, bw
    )
    assert not (lead_folded and tile_map is not None), (
        "tile_map rides the non-folded grid's scalar-prefetch channel"
    )
    kernel, kernel_folded = _make_kernel(
        C, L, P, group, bh, bw, pad_y, pad_x, n_y, n_x, interpolation,
        border, compute_dtype, offsets, base_bh, base_bw, off_my, off_mx,
        precision,
    )
    T = xt.shape[0]
    O = None if offsets is None else len(offsets)
    if os.environ.get("S360_LOG_FUSED") == "1":
        # trace-time grid economics: per-step dot is (P/group, bw) x
        # (C*bh, bw) — log it so stage tuning can see step counts and
        # shapes without reading Mosaic dumps
        import sys as _sys
        import traceback as _tb

        caller = "?"
        for f in reversed(_tb.extract_stack()[:-1]):
            if "surround360_tpu" in f.filename and "/ops/" not in f.filename:
                caller = f"{f.filename.rsplit('/', 1)[-1]}:{f.lineno}"
                break
        print(
            f"# fused_window_sample T={T} L={L} G={group} "
            f"steps={T * group if lead_folded else T * L * group} "
            f"folded={lead_folded} C={C} bh={bh} bw={bw} "
            f"Pg={P // group} interp={interpolation} "
            f"dtype={compute_dtype} off={None if O is None else O} "
            f"from={caller}",
            file=_sys.stderr,
            flush=True,
        )
    if lead_folded:
        out_dims = (T, L, C, P) if O is None else (T, L, O, C, P)
        blk = (1, L, C, P) if O is None else (1, L, O, C, P)
        zeros = (0,) * (len(blk) - 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T, group),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(
                    (1, L, P), lambda t, g, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, L, P), lambda t, g, *_: (t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                blk, lambda t, g, *_, z=zeros: (t,) + z,
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((L, C, bh, bw), padded.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            kernel_folded,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(out_dims, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit or _VMEM_HW_LIMIT
            ),
            interpret=jax.default_backend() != "tpu",
        )(sy.reshape(-1), sx.reshape(-1), padded, xt, yt)
    # coords as (T*L, 1, P) so per-(t, l) blocks are legal (block (1,1,P):
    # the second-to-last dim spans its size-1 array dim) and small — a
    # (1, L, P) block would hold every lead's coords in VMEM per step
    xt2 = xt.reshape(T * L, 1, P)
    yt2 = yt.reshape(T * L, 1, P)
    if tile_map is None:
        tmap = np.arange(T, dtype=np.int32)
    else:
        tmap = np.asarray(tile_map, np.int32)
    Tg = tmap.shape[0]  # grid tiles (= T unless tile_map selects a subset)
    if offsets is None:
        out_shape = jax.ShapeDtypeStruct((Tg, L, C, P), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, 1, C, P), lambda t, l, g, *_: (t, l, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        out_shape = jax.ShapeDtypeStruct((Tg, L, O, C, P), jnp.float32)
        out_spec = pl.BlockSpec(
            (1, 1, O, C, P), lambda t, l, g, *_: (t, l, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def coord_idx(t, l, g, sy_ref, sx_ref, map_ref):
        return (map_ref[t] * L + l, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Tg, L, group),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 1, P), coord_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), coord_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, C, bh, bw), padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit or _VMEM_HW_LIMIT
        ),
        interpret=jax.default_backend() != "tpu",
    )(sy.reshape(-1), sx.reshape(-1), jnp.asarray(tmap), padded, xt2, yt2)
