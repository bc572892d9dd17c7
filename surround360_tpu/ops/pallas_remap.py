"""Pallas TPU kernel: fused windowed resampling.

The XLA window samplers (`ops/window_sampler.py`, `ops/remap.py`'s banded
static remap) express interpolation as two one-hot matmuls, which forces
the (C, P, band) stage-A intermediate and both one-hot operands through
HBM — measured 593 GiB of traffic for the 6k projection stage alone
(~300x the image data; BASELINE.md round-3 roofline). This kernel fuses
window extraction, one-hot construction and both contractions in VMEM:

  per grid step (tile t, lead l):
    DMA  padded[l, :, sy[t,l]:sy[t,l]+BH, sx[t,l]:sx[t,l]+BW] -> VMEM
    ohx  (P, BW), ohy (P, BH) built in-register from the tile's coords
    out[t, l, c] = sum_h ohy * (ohx . win[c])      (MXU + VPU reduce)

Window origins ``sy``/``sx`` ride the scalar-prefetch channel, so they
may be host-constant (static lens warps — the banded remap's per-tile
bounds) or traced (displacement-following residual windows computed from
the frame's own flow). Only the windows and the output touch HBM.

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

# VMEM budget for one grid step's buffers (window + one-hots + stage-A
# temp + coord/out blocks), below the ~16 MB/core ceiling with headroom
# for Mosaic's own double-buffering of the small blocks.
_VMEM_BUDGET = 12 * 1024 * 1024


def _step_vmem_bytes(C, P, bh, bw, L=1):
    win = C * bh * bw * 4
    onehots = P * (bh + bw) * 4
    tmp = P * bh * 4
    blocks = 2 * L * P * 4 + C * P * 4
    return win + onehots + tmp + blocks


def pallas_window_supported(C, P, bh, bw, L=1) -> bool:
    return _step_vmem_bytes(C, P, bh, bw, L) <= _VMEM_BUDGET


def _make_kernel(
    C, L, P, bh, bw, pad_y, pad_x, n_y, n_x, interpolation, border
):
    a = -0.75

    def k01(s):
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    def onehot(local, origin, pad, n, b):
        """(P, b) interpolation matrix. local: (P,) coords relative to the
        window start; origin: scalar window start in PADDED coords (for
        absolute-index validity)."""
        l0 = jnp.floor(local)
        t = local - l0
        i0 = l0.astype(jnp.int32)
        if interpolation == "bicubic":
            taps = [(-1, k12(t + 1.0)), (0, k01(t)), (1, k01(1.0 - t)),
                    (2, k12(2.0 - t))]
        else:
            taps = [(0, 1.0 - t), (1, t)]
        grid = jax.lax.broadcasted_iota(jnp.int32, (P, b), 1)
        acc = jnp.zeros((P, b), jnp.float32)
        for off, w in taps:
            idx = i0 + off  # local index
            idx_abs = idx + origin - pad  # absolute source index
            if border == "constant":
                wv = jnp.where((idx_abs >= 0) & (idx_abs < n), w, 0.0)
            else:  # clamp: fold the absolute index, then relocalize
                idx = jnp.clip(idx_abs, 0, n - 1) + pad - origin
                wv = w
            acc = acc + (grid == idx[:, None]) * wv[:, None]
        return acc

    def kernel(sy_ref, sx_ref, padded_ref, xt_ref, yt_ref, out_ref, win, sem):
        from jax.experimental.pallas import tpu as pltpu
        import jax.experimental.pallas as pl

        t = pl.program_id(0)
        l = pl.program_id(1)
        # origins are pre-quantized to the (8, 128) memref tiling — the
        # hint lets Mosaic prove the DMA slice is tile-aligned. They ride
        # SMEM flattened to 1-D: 2-D SMEM operands are lane-padded to 128
        # and (T, L) would blow the 1 MB SMEM budget.
        sy = pl.multiple_of(sy_ref[t * L + l], 8)
        sx = pl.multiple_of(sx_ref[t * L + l], 128)
        copy = pltpu.make_async_copy(
            padded_ref.at[l, :, pl.ds(sy, bh), pl.ds(sx, bw)], win, sem
        )
        copy.start()
        # coords arrive in padded units; localize to this window (the
        # coord blocks span L — Mosaic requires the last-two block dims
        # to span or align — so select this step's lead row here)
        x = xt_ref[0, l] - sx.astype(jnp.float32)
        y = yt_ref[0, l] - sy.astype(jnp.float32)
        ohx = onehot(x, sx, pad_x, n_x, bw)
        ohy = onehot(y, sy, pad_y, n_y, bh)
        copy.wait()
        for c in range(C):
            tmp = jax.lax.dot_general(
                ohx,
                win[c],  # (bh, bw)
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P, bh)
            out_ref[0, 0, c] = jnp.sum(tmp * ohy, axis=-1)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "bh", "bw", "pad_y", "pad_x", "n_y", "n_x", "interpolation",
        "border",
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
):
    """padded: (L, C, Hp, Wp) source, already padded by (pad_y, pad_x) on
    the low side (high-side padding must make every window slice
    in-bounds). sy/sx: (T, L) int32 window origins in padded coords,
    pre-clamped to [0, Hp - bh] / [0, Wp - bw] AND quantized to multiples
    of (8, 128) — the VMEM/HBM memref tiling; DMA slice starts must be
    tile-aligned. xt/yt: (T, L, P) float32 sample coords in PADDED units
    (absolute + pad). Returns (T, L, C, P).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, C, Hp, Wp = padded.shape
    T = sy.shape[0]
    P = xt.shape[-1]
    kernel = _make_kernel(
        C, L, P, bh, bw, pad_y, pad_x, n_y, n_x, interpolation, border
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, L),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, L, P), lambda t, l, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, L, P), lambda t, l, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, C, P), lambda t, l, *_: (t, l, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((C, bh, bw), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, L, C, P), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(sy.reshape(-1), sx.reshape(-1), padded, xt, yt)
