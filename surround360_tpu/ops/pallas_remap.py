"""Pallas TPU kernel: fused windowed resampling.

The XLA window samplers (`ops/window_sampler.py`, `ops/remap.py`'s banded
static remap) express interpolation as two one-hot matmuls, which forces
the (C, P, band) stage-A intermediate and both one-hot operands through
HBM — measured 593 GiB of traffic for the 6k projection stage alone
(~300x the image data; BASELINE.md "Round-3 measured results"). This kernel fuses
window extraction, one-hot construction and both contractions in VMEM:

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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_window_sample", "pallas_window_supported"]

# VMEM accounting budget for one grid step's buffers (double-buffered
# window + one-hots + stage-A temp + coord/out blocks). Mosaic's actual
# stack allocation runs ~2x this model (elementwise-chain transients of
# the distance-kernel build at f32, plus its own block double-buffering),
# so pallas_call passes vmem_limit_bytes = _VMEM_HW_LIMIT: the v5e core
# has far more physical VMEM than the 16 MB default scoped limit — a
# measured 16.45M allocation at the 6k pole-flow geometry compiled out
# of the box once the limit was raised.
_VMEM_BUDGET = 16 * 1024 * 1024
_VMEM_HW_LIMIT = 64 * 1024 * 1024


def _step_vmem_bytes(C, P, bh, bw, L=1, group=1, compute_dtype="float32"):
    Pg = -(-P // group)
    dt = 2 if compute_dtype == "bfloat16" else 4
    win = 2 * C * bh * bw * 4  # double-buffered, DMA'd at source dtype
    onehots = Pg * (bh + bw) * dt
    # f32 transient of the distance-kernel build before the cast
    onehots += Pg * max(bh, bw) * 4
    tmp = Pg * C * bh * 4  # channel-folded stage-A + f32 ohy
    blocks = 2 * (2 * P * 4) + 2 * (C * P * 4)  # coords + out, dbuffered
    return win + onehots + tmp + blocks


def pallas_window_supported(
    C, P, bh, bw, L=1, group=1, compute_dtype="float32"
) -> bool:
    return (
        _step_vmem_bytes(C, P, bh, bw, L, group, compute_dtype)
        <= _VMEM_BUDGET
    )


def _make_kernel(
    C, L, P, G, bh, bw, pad_y, pad_x, n_y, n_x, interpolation, border,
    compute_dtype,
):
    a = -0.75
    Pg = P // G
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

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
    def onehot(xp, origin, pad, n, b):
        """(Pg, b) interpolation matrix in compute dtype. xp: (Pg,) coords
        in PADDED units; origin: scalar window start in padded coords."""
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
        return acc

    def kernel(sy_ref, sx_ref, padded_ref, xt_ref, yt_ref, out_ref, win, sem):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        t = pl.program_id(0)
        l = pl.program_id(1)
        g = pl.program_id(2)
        j = t * L + l
        n_wins = pl.num_programs(0) * L

        def dma(jj, slot):
            # origins are pre-quantized to the (8, 128) memref tiling — the
            # hint lets Mosaic prove the DMA slice is tile-aligned. They
            # ride SMEM flattened to 1-D: 2-D SMEM operands are lane-padded
            # to 128 and (T, L) would blow the 1 MB SMEM budget.
            sy = pl.multiple_of(sy_ref[jj], 8)
            sx = pl.multiple_of(sx_ref[jj], 128)
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
        sx = pl.multiple_of(sx_ref[j], 128)
        # coords arrive in padded units; onehot localizes to the window.
        # The group's slice start g*Pg is lane-aligned (Pg multiple of 128).
        x = xt_ref[0, 0, pl.ds(g * Pg, Pg)]
        y = yt_ref[0, 0, pl.ds(g * Pg, Pg)]
        ohx = onehot(x, sx, pad_x, n_x, bw)
        ohy = onehot(y, sy, pad_y, n_y, bh)

        @pl.when(g == 0)
        def _():
            dma(j, j % 2).wait()

        # one dot for ALL channels: (Pg, bw) x (C*bh, bw)^T -> (Pg, C*bh)
        # (bigger MXU tiles than C sequential (Pg, bh) dots)
        wm = win[j % 2].reshape(C * bh, bw)
        if compute_dtype == "bfloat16":
            wm = wm.astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            ohx,
            wm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # f32 mode must ask for multi-pass explicitly: Mosaic's
            # default lowers f32 matmuls to ONE bf16 MXU pass, which
            # round-4 measured as ~5e-3 sampling error on shipped
            # "exact" warps (projection / novel view)
            precision=(
                None
                if compute_dtype == "bfloat16"
                else jax.lax.Precision.HIGHEST
            ),
        )  # (Pg, C*bh)
        ohy32 = ohy.astype(jnp.float32)
        for c in range(C):
            out_ref[0, 0, c, pl.ds(g * Pg, Pg)] = jnp.sum(
                tmp[:, c * bh : (c + 1) * bh] * ohy32, axis=-1
            )

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "bh", "bw", "pad_y", "pad_x", "n_y", "n_x", "interpolation",
        "border", "group", "compute_dtype",
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
):
    """padded: (L, C, Hp, Wp) source, already padded by (pad_y, pad_x) on
    the low side (high-side padding must make every window slice
    in-bounds). sy/sx: (T, L) int32 window origins in padded coords,
    pre-clamped to [0, Hp - bh] / [0, Wp - bw] AND quantized to multiples
    of (8, 128) — the VMEM/HBM memref tiling; DMA slice starts must be
    tile-aligned. xt/yt: (T, L, P) float32 sample coords in PADDED units
    (absolute + pad). Returns (T, L, C, P).

    group: split each (tile, lead)'s P coords into this many sequential
    compute steps sharing one window DMA (P must divide into lane-aligned
    P/group chunks). compute_dtype: "float32" (exact) or "bfloat16"
    (single-pass MXU, f32 accumulation) for the contraction operands.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, C, Hp, Wp = padded.shape
    T = sy.shape[0] if sy.ndim > 1 else sy.reshape(-1).shape[0] // max(L, 1)
    P = xt.shape[-1]
    assert P % group == 0 and (P // group) % 128 == 0, (P, group)
    kernel = _make_kernel(
        C, L, P, group, bh, bw, pad_y, pad_x, n_y, n_x, interpolation,
        border, compute_dtype,
    )
    T = xt.shape[0]
    # coords as (T*L, 1, P) so per-(t, l) blocks are legal (block (1,1,P):
    # the second-to-last dim spans its size-1 array dim) and small — a
    # (1, L, P) block would hold every lead's coords in VMEM per step
    xt2 = xt.reshape(T * L, 1, P)
    yt2 = yt.reshape(T * L, 1, P)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, L, group),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 1, P), lambda t, l, g, *_: (t * L + l, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, P), lambda t, l, g, *_: (t * L + l, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, C, P), lambda t, l, g, *_: (t, l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, bh, bw), padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, L, C, P), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_HW_LIMIT
        ),
        interpret=jax.default_backend() != "tpu",
    )(sy.reshape(-1), sx.reshape(-1), padded, xt2, yt2)
