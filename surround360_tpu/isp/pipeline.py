"""The software ISP: JSON-configured raw Bayer -> color-correct RGB.

Rebuild of surround360_render/source/camera_isp/CameraIsp.h (scalar
reference) and CameraIspGen.cpp (Halide AOT version). Halide's role —
fusing the per-pixel stages into vectorized passes — is played by XLA: the
whole pipeline below traces into one jitted program of masked elementwise
ops, two LUT gathers, and the demosaic stencil.

Stage order matches executePipeline (CameraIsp.h:1262-1272):
black level -> anti-vignette -> white balance -> clamp/stretch -> stuck
pixel removal -> demosaic -> CCM + tone LUT -> sharpen.

Host-side precompute (config time): tone-curve LUT (4096 x 3,
CameraIsp.h:390-426), composite CCM = ccm^T * saturation-in-YUV * lutScale
(CameraIsp.h:671-689), separable vignette gain vectors from the Bezier
rolloff control points, bayer masks.

Values are float32 in [0,1] end-to-end (the reference's outputBpp scaling
collapses to 1.0).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math_util import bezier_curve
from .demosaic import demosaic_bilinear, demosaic_edge_aware, demosaic_frequency

__all__ = ["IspConfig", "load_isp_config", "isp_process"]

TONE_CURVE_LUT_SIZE = 4096

RGB2YUV = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.14713, -0.28886, 0.436],
        [0.615, -0.51499, -0.10001],
    ],
    dtype=np.float64,
)
YUV2RGB = np.array(
    [
        [1.0, 0.0, 1.13983],
        [1.0, -0.39465, -0.58060],
        [1.0, 2.03211, 0.0],
    ],
    dtype=np.float64,
)

_BAYER_TABLES = {
    # pattern -> (red[2][2], green[2][2]) (CameraIsp.h setup :612-668)
    "RGGB": ([[1, 0], [0, 0]], [[0, 1], [1, 0]]),
    "GRBG": ([[0, 1], [0, 0]], [[1, 0], [0, 1]]),
    "GBRG": ([[0, 0], [1, 0]], [[1, 0], [0, 1]]),
    "BGGR": ([[0, 0], [0, 1]], [[0, 1], [1, 0]]),
}


@dataclass(frozen=True)
class IspConfig:
    """Parsed "CameraIsp" JSON block with reference defaults
    (CameraIsp.h:441-610)."""

    bits_per_pixel: int = 8
    companding_lut: tuple = ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    black_level: tuple = (0.0, 0.0, 0.0)
    clamp_min: tuple = (0.0, 0.0, 0.0)
    clamp_max: tuple = (1.0, 1.0, 1.0)
    stuck_pixel_threshold: int = 0
    stuck_pixel_darkness_threshold: float = 0.0
    stuck_pixel_radius: int = 0
    vignette_rolloff_h: tuple = ((1.0, 1.0, 1.0),)
    vignette_rolloff_v: tuple = ((1.0, 1.0, 1.0),)
    white_balance_gain: tuple = (1.0, 1.0, 1.0)
    ccm: tuple = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    saturation: float = 1.0
    gamma: tuple = (1.0, 1.0, 1.0)
    low_key_boost: tuple = (0.0, 0.0, 0.0)
    high_key_boost: tuple = (0.0, 0.0, 0.0)
    contrast: float = 1.0
    sharpening: tuple = (0.0, 0.0, 0.0)
    sharpening_support: float = 10.0 / 2048.0
    noise_core: float = 1000.0
    bayer_pattern: str = "GBRG"
    demosaic_filter: str = "edge_aware"  # bilinear | frequency | edge_aware
    disable_tone_curve: bool = False

    @property
    def max_pixel_value(self) -> int:
        return (1 << self.bits_per_pixel) - 1

    def to_json(self) -> dict:
        """Emit the reference's config schema (dumpConfigFile,
        CameraIsp.h:717-829)."""
        return {
            "CameraIsp": {
                "bitsPerPixel": self.bits_per_pixel,
                "compandingLut": [list(p) for p in self.companding_lut],
                "blackLevel": list(self.black_level),
                "clampMin": list(self.clamp_min),
                "clampMax": list(self.clamp_max),
                "stuckPixelThreshold": self.stuck_pixel_threshold,
                "stuckPixelDarknessThreshold": self.stuck_pixel_darkness_threshold,
                "stuckPixelRadius": self.stuck_pixel_radius,
                "vignetteRollOffH": [list(p) for p in self.vignette_rolloff_h],
                "vignetteRollOffV": [list(p) for p in self.vignette_rolloff_v],
                "whiteBalanceGain": list(self.white_balance_gain),
                "ccm": [list(r) for r in self.ccm],
                "saturation": self.saturation,
                "gamma": list(self.gamma),
                "lowKeyBoost": list(self.low_key_boost),
                "highKeyBoost": list(self.high_key_boost),
                "contrast": self.contrast,
                "sharpening": list(self.sharpening),
                "sharpeningSupport": self.sharpening_support,
                "noiseCore": self.noise_core,
                "bayerPattern": self.bayer_pattern,
            }
        }


def load_isp_config(source) -> IspConfig:
    """Parse an ISP JSON (file path, JSON string, or dict)."""
    if isinstance(source, dict):
        obj = source
    elif isinstance(source, str) and source.lstrip().startswith("{"):
        obj = json.loads(source)
    else:
        with open(source) as f:
            obj = json.load(f)
    c = obj.get("CameraIsp", {})

    def tup(key, default):
        return tuple(c.get(key, default))

    def coords(key, default):
        v = c.get(key)
        if v is None:
            return default
        return tuple(tuple(p) for p in v)

    return IspConfig(
        bits_per_pixel=int(c.get("bitsPerPixel", 8)),
        companding_lut=coords(
            "compandingLut", ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
        ),
        black_level=tup("blackLevel", (0.0, 0.0, 0.0)),
        clamp_min=tup("clampMin", (0.0, 0.0, 0.0)),
        clamp_max=tup("clampMax", (1.0, 1.0, 1.0)),
        stuck_pixel_threshold=int(c.get("stuckPixelThreshold", 0)),
        stuck_pixel_darkness_threshold=float(
            c.get("stuckPixelDarknessThreshold", 0.0)
        ),
        # the reference doubles the radius at parse time (CameraIsp.h:517)
        stuck_pixel_radius=2 * int(c.get("stuckPixelRadius", 0)),
        vignette_rolloff_h=coords("vignetteRollOffH", ((1.0, 1.0, 1.0),)),
        vignette_rolloff_v=coords("vignetteRollOffV", ((1.0, 1.0, 1.0),)),
        white_balance_gain=tup("whiteBalanceGain", (1.0, 1.0, 1.0)),
        ccm=coords(
            "ccm", ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
        ),
        saturation=float(c.get("saturation", 1.0)),
        gamma=tup("gamma", (1.0, 1.0, 1.0)),
        low_key_boost=tup("lowKeyBoost", (0.0, 0.0, 0.0)),
        high_key_boost=tup("highKeyBoost", (0.0, 0.0, 0.0)),
        contrast=float(c.get("contrast", 1.0)),
        sharpening=tup("sharpening", (0.0, 0.0, 0.0)),
        sharpening_support=float(c.get("sharpeningSupport", 10.0 / 2048.0)),
        noise_core=float(c.get("noiseCore", 1000.0)),
        bayer_pattern=str(c.get("bayerPattern", "GBRG")).upper()[:4],
    )


# ---------------------------------------------------------------------------
# host precompute
# ---------------------------------------------------------------------------


def _bezier4(a, b, c, d, t):
    return bezier_curve([a, b, c, d], t, xp=np)


def _low_key(boost, x):
    a, b, c, d = 0.0, np.clip(0.1666 + boost, 0.0, 1.0), 0.3333, 0.5
    return np.where(x <= 0.5, _bezier4(a, b, c, d, x * 2.0), 0.0)


def _high_key(boost, x):
    a, b, c, d = 0.5, 0.6666, np.clip(0.8333 + boost, 0.0, 1.0), 1.0
    return np.where(x > 0.5, _bezier4(a, b, c, d, (x - 0.5) * 2.0), 0.0)


def build_tone_curve_lut(cfg: IspConfig) -> np.ndarray:
    """(4096, 3) float32 LUT in [0, 1] (buildToneCurveLut,
    CameraIsp.h:390-426 with range normalized to 1)."""
    x = np.linspace(0.0, 1.0, TONE_CURVE_LUT_SIZE)
    if cfg.disable_tone_curve:
        return np.repeat(x[:, None], 3, axis=1).astype(np.float32)
    angle = np.pi * 0.25 * cfg.contrast
    slope = np.tan(angle)
    bias = 0.5 * (1.0 - slope)
    out = []
    for ch in range(3):
        v = np.power(x, cfg.gamma[ch])
        v = _low_key(cfg.low_key_boost[ch], v) + _high_key(
            cfg.high_key_boost[ch], v
        )
        v = np.clip(slope * v + bias, 0.0, 1.0)
        out.append(v)
    return np.stack(out, axis=1).astype(np.float32)


def build_composite_ccm(cfg: IspConfig) -> np.ndarray:
    """(3, 3) composite CCM: ccm^T x saturation-in-YUV, scaled to LUT index
    range (CameraIsp.h:671-689)."""
    sat = np.diag([1.0, cfg.saturation, cfg.saturation])
    sat_rgb = YUV2RGB @ sat @ RGB2YUV
    composite = np.asarray(cfg.ccm, dtype=np.float64).T @ sat_rgb
    return (composite * (TONE_CURVE_LUT_SIZE - 1)).astype(np.float32)


def build_vignette_gains(cfg: IspConfig, height: int, width: int):
    """Separable vignette gain vectors: (W, 3) horizontal and (H, 3)
    vertical, Bezier curves sampled at coord / maxDimension
    (CameraIsp.h:851-858, antiVignette :1145-1154)."""
    max_dim = max(height, width)

    def sample(points, n):
        t = np.arange(n, dtype=np.float64) / max_dim
        pts = [np.asarray(p, dtype=np.float64) for p in points]
        if len(pts) == 1:
            return np.tile(pts[0], (n, 1)).astype(np.float32)
        vals = bezier_curve([p[None, :] for p in pts], t[:, None], xp=np)
        return vals.astype(np.float32)

    return sample(cfg.vignette_rolloff_h, width), sample(
        cfg.vignette_rolloff_v, height
    )


def bayer_masks(cfg: IspConfig, height: int, width: int):
    """(H, W) bool red/green/blue masks + (H, 1) red-green-row mask."""
    red_t, green_t = _BAYER_TABLES[cfg.bayer_pattern]
    ii = np.arange(height) % 2
    jj = np.arange(width) % 2
    red = np.asarray(red_t, bool)[np.ix_(ii, jj)]
    green = np.asarray(green_t, bool)[np.ix_(ii, jj)]
    blue = ~(red | green)
    red_green_row = (red[:, 0] & green[:, 1]) | (red[:, 1] & green[:, 0])
    return red, green, blue, red_green_row[:, None]


# ---------------------------------------------------------------------------
# pipeline stages (traced)
# ---------------------------------------------------------------------------


def _per_site_value(vals3, red_mask, green_mask):
    """Select the per-channel scalar for each bayer site."""
    r, g, b = vals3
    return jnp.where(red_mask, r, jnp.where(green_mask, g, b))


def apply_companding(raw, cfg: IspConfig):
    """Linearize a companded sensor response with the piecewise-linear
    compandingLut (linearize(), CameraIsp.h:991-1002 via the Linear
    MonotonicTable). The reference's executePipeline does not invoke it
    (and its loop only touches red sites — an apparent bug we do not
    replicate); exposed for sensors that need it. Applies the first
    (x, y) channel of each control point to all sites."""
    pts = np.asarray(cfg.companding_lut, dtype=np.float64)
    xs = jnp.asarray(pts[:, 0], jnp.float32)
    ys = jnp.asarray(pts[:, 1], jnp.float32)
    return jnp.interp(jnp.asarray(raw, jnp.float32), xs, ys)


def _stuck_pixel_removal(raw, cfg: IspConfig, red_mask, green_mask):
    """Dense reformulation of removeStuckPixels (CameraIsp.h:1024-1103):
    within the same-color lattice neighborhood (radius in raw pixels, color
    step 2), a pixel in a dark region whose rank is within the top
    ``stuckPixelThreshold`` is replaced by the neighborhood median."""
    rad = cfg.stuck_pixel_radius
    if rad <= 0:
        return raw
    offsets = [
        (dy, dx)
        for dy in range(-rad, rad + 1, 2)
        for dx in range(-rad, rad + 1, 2)
    ]
    from .demosaic import _shift_reflect

    stack = jnp.stack([_shift_reflect(raw, dy, dx) for dy, dx in offsets])
    mean = jnp.mean(stack, axis=0)
    median = jnp.median(stack, axis=0)
    rank_from_top = jnp.sum(stack > raw[None], axis=0)
    dark = mean < cfg.stuck_pixel_darkness_threshold
    stuck = dark & (rank_from_top < cfg.stuck_pixel_threshold)
    return jnp.where(stuck, median, raw)


def resize_input_binned(raw, factor: int):
    """Bayer-phase-preserving box binning by 1/2/4/8 (resizeInput,
    CameraIsp.h:339-358): each output site averages factor^2 same-color
    sites on the stride-2 color lattice."""
    if factor == 1:
        return raw
    assert factor in (2, 4, 8), factor
    H, W = raw.shape[-2:]
    oh, ow = H // factor, W // factor
    acc = None
    ii = np.arange(oh)
    jj = np.arange(ow)
    for k in range(factor):
        ip = ii * factor + k * 2
        ipp = ip + (ii % 2)
        ipp = np.where(ipp >= H, 2 * H - 1 - ipp, ipp)
        for l in range(factor):
            jp = jj * factor + l * 2
            jpp = jp + (jj % 2)
            jpp = np.where(jpp >= W, 2 * W - 1 - jpp, jpp)
            s = raw[..., ipp[:, None], jpp[None, :]]
            acc = s if acc is None else acc + s
    return acc / (factor * factor)


@partial(jax.jit, static_argnames=("cfg", "skip_sharpen", "skip_tone_curve", "resize"))
def isp_process(
    raw,
    cfg: IspConfig,
    skip_sharpen: bool = False,
    skip_tone_curve: bool = False,
    resize: int = 1,
):
    """Run the ISP on raw mosaiced data.

    raw: (..., H, W) float32 in [0, 1] (normalized by max pixel value).
    resize: 1/2/4/8 bayer-preserving input binning (CameraIsp.h:339-358).
    Returns (..., 3, H, W) float32 RGB in [0, 1].
    """
    raw = resize_input_binned(raw, resize)
    H, W = raw.shape[-2:]
    red_np, green_np, blue_np, rgr_np = bayer_masks(cfg, H, W)
    red_mask = jnp.asarray(red_np)
    green_mask = jnp.asarray(green_np)
    blue_mask = jnp.asarray(blue_np)
    red_green_row = jnp.asarray(rgr_np)

    def single(raw1):
        x = raw1
        # black level (CameraIsp.h:1106-1126): only pixels < 1.0 adjusted
        bl = np.asarray(cfg.black_level, np.float32) / cfg.max_pixel_value
        scale = 1.0 / (1.0 - bl)
        site_b = _per_site_value(bl, red_mask, green_mask)
        site_s = _per_site_value(scale, red_mask, green_mask)
        x = jnp.where(x < 1.0, (x - site_b) * site_s, x)

        # anti-vignette (CameraIsp.h:1145-1154): separable per-channel
        # gain outer products, then per-site channel select
        vh, vv = build_vignette_gains(cfg, H, W)
        gains = tuple(
            jnp.asarray(vv[:, c])[:, None] * jnp.asarray(vh[:, c])[None, :]
            for c in range(3)
        )
        x = x * _per_site_value(gains, red_mask, green_mask)

        # white balance + clamp (CameraIsp.h:1005-1021)
        wb = _per_site_value(
            tuple(jnp.float32(v) for v in cfg.white_balance_gain),
            red_mask,
            green_mask,
        )
        x = jnp.clip(x * wb, 0.0, 1.0)

        # clamp & stretch (CameraIsp.h:1128-1143)
        cmin = _per_site_value(
            tuple(jnp.float32(v) for v in cfg.clamp_min), red_mask, green_mask
        )
        cmax = _per_site_value(
            tuple(jnp.float32(v) for v in cfg.clamp_max), red_mask, green_mask
        )
        x = (jnp.clip(x, cmin, cmax) - cmin) / (cmax - cmin)

        # stuck pixels
        x = _stuck_pixel_removal(x, cfg, red_mask, green_mask)

        # demosaic
        dm = {
            "bilinear": demosaic_bilinear,
            "edge_aware": demosaic_edge_aware,
            "frequency": demosaic_frequency,
        }[cfg.demosaic_filter]
        rgb = dm(x, red_mask, green_mask, blue_mask, red_green_row)

        # CCM + tone LUT (colorCorrect, CameraIsp.h:1214-1242)
        ccm = jnp.asarray(build_composite_ccm(cfg))
        idx = jnp.clip(
            jnp.tensordot(ccm, rgb, axes=[[1], [0]]),
            0.0,
            TONE_CURVE_LUT_SIZE - 1,
        ).astype(jnp.int32)
        if skip_tone_curve:
            out = idx.astype(jnp.float32) / (TONE_CURVE_LUT_SIZE - 1)
        else:
            lut = jnp.asarray(build_tone_curve_lut(cfg))
            out = jnp.stack(
                [jnp.take(lut[:, c], idx[c], axis=0) for c in range(3)]
            )

        # sharpen (CameraIsp.h:1244-1258)
        if not skip_sharpen and all(s != 0.0 for s in cfg.sharpening):
            from ..ops.filters import iir_lowpass_2d

            lp = iir_lowpass_2d(out, cfg.sharpening_support)
            hp = out - lp
            ng = 1.0 - jnp.exp(-(hp * hp) * cfg.noise_core * 65025.0)
            amount = 1.0 + jnp.asarray(cfg.sharpening, jnp.float32)[:, None, None]
            out = jnp.clip(lp + hp * ng * amount, 0.0, 1.0)
        return out

    batch = raw.shape[:-2]
    fn = single
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(raw)
