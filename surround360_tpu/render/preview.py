"""Fast live-preview renderer.

Rebuild of surround360_render/source/test/TestHyperPreview.cpp: the three
fisheye cameras (top, bottom, secondary bottom) are 2x2-block demosaiced at
half scale, gamma'd, alpha-faded (radial, plus top-down for the bottom
cameras), remapped through precomputed equirect warps, and composited with
the alpha-softmax blend — one cheap jitted program per frame.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import create_rescaled_camera
from ..geometry.rig import Rig
from ..ops.compositing import (
    flatten_layers_alpha_softmax,
    radial_alpha_fade,
    top_down_alpha_fade,
)
from ..ops.remap import remap
from ..ops.warp import equirect_to_cam_warp

__all__ = ["PreviewRenderer", "simple_demosaic"]


def simple_demosaic(raw, gamma: float = 0.4545, pattern: str = "GBRG"):
    """2x2-block demosaic at half scale (TestHyperPreview.cpp:163-184).
    raw: (..., H, W) float in [0,1] -> (..., 3, H/2, W/2)."""
    tl = raw[..., 0::2, 0::2]
    tr = raw[..., 0::2, 1::2]
    bl = raw[..., 1::2, 0::2]
    br = raw[..., 1::2, 1::2]
    if pattern == "GBRG":
        g = (tl + br) / 2.0
        b = tr
        r = bl
    elif pattern == "GRBG":
        g = (tl + br) / 2.0
        r = tr
        b = bl
    elif pattern == "RGGB":
        r = tl
        g = (tr + bl) / 2.0
        b = br
    elif pattern == "BGGR":
        b = tl
        g = (tr + bl) / 2.0
        r = br
    else:
        raise ValueError(pattern)
    rgb = jnp.stack([r, g, b], axis=-3)
    return jnp.power(jnp.maximum(rgb, 0.0), gamma)


@dataclass
class PreviewRenderer:
    rig: Rig
    eqr_width: int = 1024
    eqr_height: int = 512
    softmax_coef: float = 5.0
    gamma: float = 0.4545
    bayer_pattern: str = "GBRG"

    def __post_init__(self):
        # top, bottom, secondary bottom at half scale
        # (TestHyperPreview.cpp:83-96)
        idxs = [
            self.rig.top_camera_index,
            self.rig.bottom_camera_index,
            self.rig.bottom_camera2_index,
        ]
        self.cameras = [
            create_rescaled_camera(self.rig.cameras[i], 0.5) for i in idxs
        ]
        # equirect warp with theta = 2 pi (1 - x/W), phi = pi y/H
        # (precomputeProjectionWarp, TestHyperPreview.cpp:117-129) — that
        # is equirect_to_cam_warp's convention mirrored in x
        self.warps = np.stack(
            [
                equirect_to_cam_warp(
                    cam, (self.eqr_height, self.eqr_width), 1.0e6
                )[:, :, ::-1]
                for cam in self.cameras
            ]
        )
        self._render = jax.jit(self._render_impl)

    def _render_impl(self, raws):
        """raws: (3, H, W) raw mosaics of top/bottom/bottom2 in [0,1]."""
        rgb = simple_demosaic(raws, self.gamma, self.bayer_pattern)
        alpha = jnp.ones_like(rgb[:, :1])
        rgba = jnp.concatenate([rgb, alpha], axis=1)
        # bottom cameras get the top-down fade first, then all get radial
        faded = []
        for i in range(3):
            layer = rgba[i]
            if i > 0:
                layer = top_down_alpha_fade(layer)
            layer = radial_alpha_fade(layer)
            faded.append(layer)
        layers = jnp.stack(faded)
        projected = remap(
            layers, jnp.asarray(self.warps), interpolation="bicubic",
            border="constant",
        )
        return flatten_layers_alpha_softmax(projected, self.softmax_coef)

    def render(self, top_raw, bottom_raw, bottom2_raw):
        """Raw mosaics (H, W) in [0,1] -> (3, eqr_h, eqr_w) preview."""
        raws = jnp.stack(
            [jnp.asarray(top_raw), jnp.asarray(bottom_raw), jnp.asarray(bottom2_raw)]
        )
        return self._render(raws)
