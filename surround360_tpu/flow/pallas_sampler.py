"""Pallas TPU kernel: fused bilinear-extend sampling.

The flow inner loop samples the stacked gradient image at per-pixel
coordinates dozens of times per pyramid level. The XLA formulation
(flow/pixflow.py::_sample_bilinear_matmul) expresses it as two one-hot
matmuls but must materialize the (B, C, P, H) stage-A intermediate in HBM —
at fine levels that traffic dominates the whole flow. This kernel fuses
both contractions in VMEM: each grid step loads one batch row's full
(C, H, W) image (these pyramid levels are tens of KB) plus a tile of
coordinates, builds the 2-hot interpolation matrices in-register, and runs

    out = OHy . (OHx . img)

entirely on-chip. Falls back to the XLA path off-TPU or when the image
doesn't fit the VMEM budget.

STATUS: correct and Mosaic-compiles on v5e, but measured ~2.3x SLOWER than
the XLA matmul sampler at current pyramid-level shapes (0.6 vs 1.4 ms per
chained sampling at (28,2,108,72); the static batch unroll and small dots
underutilize the MXU, while XLA pipelines the two einsums well). Kept as a
tested alternative backend — it becomes the right tool once levels are
large enough that the XLA path's (B, C, P, H) HBM intermediate dominates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sample_bilinear_pallas", "pallas_sampler_supported"]

# per-instance VMEM we allow the image to occupy (bytes)
_IMG_VMEM_BUDGET = 4 * 1024 * 1024
_P_TILE = 512


def pallas_sampler_supported(img_shape) -> bool:
    B, C, H, W = img_shape
    if jax.default_backend() != "tpu":
        return False
    return _B_TILE * C * H * W * 4 <= _IMG_VMEM_BUDGET


# batch rows handled per kernel instance (Mosaic block rule: the
# second-to-last block dim must be a multiple of 8 or span the array)
_B_TILE = 8


def _kernel(img_ref, x_ref, y_ref, out_ref):
    C, H, W = img_ref.shape[1:]
    for i in range(_B_TILE):  # static unroll over the batch tile
        x = jnp.clip(x_ref[i], 0.0, W - 2.0)  # (P_T,)
        y = jnp.clip(y_ref[i], 0.0, H - 2.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = (x - x0)[:, None]
        ty = (y - y0)[:, None]
        ix0 = x0.astype(jnp.int32)[:, None]
        iy0 = y0.astype(jnp.int32)[:, None]

        wgrid = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], W), 1)
        hgrid = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], H), 1)
        ohx = (wgrid == ix0) * (1.0 - tx) + (wgrid == ix0 + 1) * tx
        ohy = (hgrid == iy0) * (1.0 - ty) + (hgrid == iy0 + 1) * ty

        # per channel (C static): stage A contracts W against the image's
        # minor dim directly (no transposes/reshapes — Mosaic dislikes
        # shape casts); stage B contracts H against the 2-hot rows
        for c in range(C):
            tmp = jax.lax.dot_general(
                ohx,
                img_ref[i, c],  # (H, W)
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (P_T, H)
            out_ref[i, c] = jnp.sum(tmp * ohy, axis=-1)  # (P_T,)


@partial(jax.jit, static_argnames=())
def sample_bilinear_pallas(img, x, y):
    """img (B, C, H, W); x, y (B, H, W) -> (B, C, H, W). Exact
    bilinear-extend sampling (same semantics as _sample_bilinear_extend)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, H, W = img.shape
    P = H * W
    n_tiles = -(-P // _P_TILE)
    p_pad = n_tiles * _P_TILE - P
    nb = -(-B // _B_TILE)
    b_pad = nb * _B_TILE - B
    img_p = jnp.pad(img, [(0, b_pad), (0, 0), (0, 0), (0, 0)])
    xf = jnp.pad(x.reshape(B, P), [(0, b_pad), (0, p_pad)])
    yf = jnp.pad(y.reshape(B, P), [(0, b_pad), (0, p_pad)])

    out = pl.pallas_call(
        _kernel,
        grid=(nb, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (_B_TILE, C, H, W), lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_B_TILE, _P_TILE), lambda b, t: (b, t),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_B_TILE, _P_TILE), lambda b, t: (b, t),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_B_TILE, C, _P_TILE), lambda b, t: (b, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nb * _B_TILE, C, n_tiles * _P_TILE), jnp.float32
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(img_p, xf, yf)
    return out[:B, :, :P].reshape(B, C, H, W)
