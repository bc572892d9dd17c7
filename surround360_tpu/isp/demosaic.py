"""Demosaic filters: bilinear, edge-aware (default), frequency-domain.

Rebuild of the three demosaic paths of the reference soft ISP
(surround360_render/source/camera_isp/CameraIsp.h:89-335). The per-pixel
reflect-indexed loops become masked shifted adds on whole planes, which XLA
fuses into a handful of vectorized passes — the same structure the
reference's Halide AOT generator produces for the CPU (CameraIspGen.cpp),
arrived at from the jnp side.

All functions take the mosaiced plane (H, W) plus boolean bayer masks
red/green/blue (H, W) and return (3, H, W) RGB.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["demosaic_bilinear", "demosaic_edge_aware", "demosaic_frequency"]


def _shift_reflect(x, dy: int, dx: int):
    """x[..., reflect(i+dy), reflect(j+dx)] with the reference's reflect()
    boundary (MathUtil.h:42-44: x < 0 -> -x, x >= n -> 2n - x - 2, i.e.
    mirror WITHOUT repeating the edge sample)."""
    H, W = x.shape[-2:]
    iy = np.arange(H) + dy
    iy = np.where(iy < 0, -iy, iy)
    iy = np.where(iy >= H, 2 * H - 2 - iy, iy)
    ix = np.arange(W) + dx
    ix = np.where(ix < 0, -ix, ix)
    ix = np.where(ix >= W, 2 * W - 2 - ix, ix)
    return x[..., iy[:, None], ix[None, :]]


def _avg(x, offsets):
    acc = None
    for dy, dx in offsets:
        s = _shift_reflect(x, dy, dx)
        acc = s if acc is None else acc + s
    return acc / len(offsets)


def demosaic_bilinear(raw, red_mask, green_mask, blue_mask, red_green_row):
    """Bilinear demosaic (CameraIsp.h:89-148). ``red_green_row`` is the
    (H, 1) bool mask of rows whose non-green color pixel is red."""
    r = jnp.where(red_mask, raw, 0.0)
    g = jnp.where(green_mask, raw, 0.0)
    b = jnp.where(blue_mask, raw, 0.0)

    cross = _avg(raw, [(-1, 0), (1, 0), (0, -1), (0, 1)])
    diag = _avg(raw, [(-1, -1), (1, -1), (-1, 1), (1, 1)])
    horiz = _avg(raw, [(0, -1), (0, 1)])
    vert = _avg(raw, [(-1, 0), (1, 0)])

    # green at non-green sites: cross average of green neighbors
    g_out = jnp.where(green_mask, g, cross)
    # at red sites: blue = diagonal average; at blue sites: red = diagonal
    r_out = jnp.where(
        red_mask,
        r,
        jnp.where(
            green_mask,
            jnp.where(red_green_row, horiz, vert),
            diag,
        ),
    )
    b_out = jnp.where(
        blue_mask,
        b,
        jnp.where(
            green_mask,
            jnp.where(red_green_row, vert, horiz),
            diag,
        ),
    )
    return jnp.stack([r_out, g_out, b_out])


def _box_sum(x, radius: int):
    """(2r+1)^2 box sum with reflect boundary, via separable shifted adds."""
    out = x
    for axis_off in ("y", "x"):
        acc = out
        for d in range(1, radius + 1):
            if axis_off == "y":
                acc = acc + _shift_reflect(out, -d, 0) + _shift_reflect(out, d, 0)
            else:
                acc = acc + _shift_reflect(out, 0, -d) + _shift_reflect(out, 0, d)
        out = acc
    return out


def demosaic_edge_aware(raw, red_mask, green_mask, blue_mask, red_green_row):
    """Edge-aware demosaic, the reference default (CameraIsp.h:181-335):
    H/V green estimates with 2nd-derivative correction, a 9x9 homogeneity
    vote between them, then constant-hue (R-G / B-G) interpolation."""
    green = jnp.where(green_mask, raw, 0.0)
    chroma = jnp.where(green_mask, 0.0, raw)  # red or blue value at site

    up1, dn1 = _shift_reflect(green, -1, 0), _shift_reflect(green, 1, 0)
    lf1, rt1 = _shift_reflect(green, 0, -1), _shift_reflect(green, 0, 1)
    up2g, dn2g = _shift_reflect(green, -2, 0), _shift_reflect(green, 2, 0)
    lf2g, rt2g = _shift_reflect(green, 0, -2), _shift_reflect(green, 0, 2)
    up2c, dn2c = _shift_reflect(chroma, -2, 0), _shift_reflect(chroma, 2, 0)
    lf2c, rt2c = _shift_reflect(chroma, 0, -2), _shift_reflect(chroma, 0, 2)

    # green sites keep their value; derivative = avg abs 2-step gradient
    gv_grn = green
    gh_grn = green
    dv_grn = (jnp.abs(dn2g - green) + jnp.abs(green - up2g)) / 2.0
    dh_grn = (jnp.abs(rt2g - green) + jnp.abs(green - lf2g)) / 2.0

    # chroma sites: interpolated green + 2nd-derivative correction from the
    # same-color channel
    gv_chr = (up1 + dn1) / 2.0 + (2.0 * chroma - up2c - dn2c) / 4.0
    gh_chr = (lf1 + rt1) / 2.0 + (2.0 * chroma - lf2c - rt2c) / 4.0
    dv_chr = jnp.abs(up1 - dn1) / 2.0 + jnp.abs(-2.0 * chroma + up2c + dn2c) / 2.0
    dh_chr = jnp.abs(lf1 - rt1) / 2.0 + jnp.abs(-2.0 * chroma + lf2c + rt2c) / 2.0

    gv = jnp.where(green_mask, gv_grn, gv_chr)
    gh = jnp.where(green_mask, gh_grn, gh_chr)
    dv = jnp.where(green_mask, dv_grn, dv_chr)
    dh = jnp.where(green_mask, dh_grn, dh_chr)

    # homogeneity vote over a 9x9 window (w=4)
    votes = _box_sum((dh <= dv).astype(jnp.float32), 4)
    g_full = jnp.where(votes < (9 * 9) / 2, gv, gh)

    # constant-hue chroma interpolation on R-G / B-G differences
    rmg = jnp.where(red_mask, raw - g_full, 0.0)
    bmg = jnp.where(blue_mask, raw - g_full, 0.0)

    def diag4(x):
        return _avg(x, [(-1, -1), (1, -1), (-1, 1), (1, 1)])

    def plus5(x):
        return (
            x
            + _shift_reflect(x, -2, 0)
            + _shift_reflect(x, 2, 0)
            + _shift_reflect(x, 0, -2)
            + _shift_reflect(x, 0, 2)
        ) / 5.0

    def row6(x):
        # green-site neighbors on adjacent rows (CameraIsp.h:281-292);
        # the reference's tap list repeats (i1, j2) — kept verbatim
        return (
            _shift_reflect(x, -1, -2)
            + _shift_reflect(x, -1, 0)
            + _shift_reflect(x, -1, 2)
            + _shift_reflect(x, 1, -2)
            + _shift_reflect(x, 1, 2)
            + _shift_reflect(x, 1, 2)
        ) / 6.0

    def col6(x):
        return (
            _shift_reflect(x, -2, -1)
            + _shift_reflect(x, 0, -1)
            + _shift_reflect(x, 2, -1)
            + _shift_reflect(x, -2, 1)
            + _shift_reflect(x, 0, 1)
            + _shift_reflect(x, 2, 1)
        ) / 6.0

    # red at: red sites -> plus5(rmg); green sites -> row/col 6-tap; blue
    # sites -> diag4(rmg). (blue symmetric)
    r_out = g_full + jnp.where(
        red_mask,
        plus5(rmg),
        jnp.where(
            green_mask,
            jnp.where(red_green_row, col6(rmg), row6(rmg)),
            diag4(rmg),
        ),
    )
    b_out = g_full + jnp.where(
        blue_mask,
        plus5(bmg),
        jnp.where(
            green_mask,
            jnp.where(red_green_row, row6(bmg), col6(bmg)),
            diag4(bmg),
        ),
    )
    r_out = jnp.where(red_mask, raw, r_out)
    b_out = jnp.where(blue_mask, raw, b_out)
    return jnp.stack([r_out, g_full, b_out])


def _butterworth(x, cutoff, n):
    """Butterworth low-pass response (MonotonicTable.h:164-186 style):
    1 / (1 + (x / cutoff)^(2 n))."""
    return 1.0 / (1.0 + (x / cutoff) ** (2 * n))


def demosaic_frequency(raw, red_mask, green_mask, blue_mask, red_green_row):
    """Frequency-domain demosaic (CameraIsp.h:150-178 + :1175-1211): DCT of
    each sparse color plane, radial Butterworth gains with green sharpening
    and a chroma crossover blend, inverse DCT."""
    from jax.scipy.fft import dctn, idctn

    H, W = raw.shape[-2:]
    r = jnp.where(red_mask, raw, 0.0)
    g = jnp.where(green_mask, raw, 0.0)
    b = jnp.where(blue_mask, raw, 0.0)

    R = dctn(r, norm="ortho")
    G = dctn(g, norm="ortho")
    B = dctn(b, norm="ortho")

    y = (jnp.arange(H, dtype=jnp.float32) / (H - 1))[:, None]
    x = (jnp.arange(W, dtype=jnp.float32) / (W - 1))[None, :]
    d = (x + y) * 1.2
    sharpen = d / 2.5 + 1.0
    # dFilter: 4th order, cutoff 1.0; dcFilter: order 2, cutoff 1.0
    g_gain = 2.0 * _butterworth(d, 1.0, 4) * sharpen
    rb_gain = 4.0 * _butterworth(d, 1.0, 4)
    alpha = _butterworth(d * 2.0 * 3.0, 1.0, 2)

    G2 = G * g_gain
    R2 = G2 + alpha * (R * rb_gain - G2)
    B2 = G2 + alpha * (B * rb_gain - G2)

    return jnp.stack(
        [
            idctn(R2, norm="ortho"),
            idctn(G2, norm="ortho"),
            idctn(B2, norm="ortho"),
        ]
    )
