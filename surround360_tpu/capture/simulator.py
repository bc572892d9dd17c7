"""Capture simulator: synthesize rig camera images from a virtual scene.

The reference is tested against shipped sample datasets (README.md:15-27);
those are not redistributable, so this simulator provides the hermetic
equivalent: an analytic environment (color as a function of view direction,
optionally with finite depth) rendered through the exact camera model, so
the full unpack->render pipeline can be validated end-to-end without
hardware or external data. Also used by the benchmark harness.
"""

from __future__ import annotations

import numpy as np

from ..geometry import camera as cam_mod
from ..geometry.rig import Rig


def checker_sinusoid_environment(direction, sharpness: float = 6.0):
    """Smooth, colorful, non-degenerate environment map: RGB as sinusoids
    of the view direction. direction (..., 3) unit vectors -> (..., 3)."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    r = 0.5 + 0.25 * np.sin(sharpness * x) + 0.25 * np.cos(sharpness * y * 0.7)
    g = 0.5 + 0.25 * np.sin(sharpness * 0.8 * y + 1.0) + 0.25 * np.sin(
        sharpness * 0.5 * z
    )
    b = 0.5 + 0.25 * np.cos(sharpness * 0.6 * x + 2.0) + 0.25 * np.sin(
        sharpness * 0.9 * z + 1.0
    )
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def render_camera_views(
    rig: Rig,
    env_fn=checker_sinusoid_environment,
    scene_distance: float = 1.0e6,
    image_size: int | None = None,
):
    """Render every rig camera's RGBA view of the environment.

    scene_distance: radius of the environment sphere in rig units (cm);
    kNearInfinity for a parallax-free scene, smaller values create real
    parallax between cameras.

    Returns list of (4, H, W) float32 RGBA numpy arrays in rig camera
    order; fisheye cameras get alpha=0 outside their fov circle.

    Full-resolution renders are cached on disk (S360_VIEW_CACHE, default
    ~/.cache/s360_views, empty to disable): the per-pixel float64 Newton
    undistort across 17 x 2048^2 cameras costs tens of single-core host
    minutes, which silently dominated every benchmark's startup.
    """
    import hashlib
    import os

    cache_dir = os.environ.get(
        "S360_VIEW_CACHE", os.path.expanduser("~/.cache/s360_views")
    )
    cache_path = None
    if cache_dir and env_fn is checker_sinusoid_environment:
        key_src = repr(
            (
                [
                    (
                        int(c.lens_type),
                        tuple(np.asarray(c.resolution).ravel()),
                        tuple(np.round(np.asarray(c.position), 9).ravel()),
                        tuple(np.round(np.asarray(c.rotation), 9).ravel()),
                        tuple(np.round(np.asarray(c.focal), 9).ravel()),
                        tuple(np.round(np.asarray(c.principal), 9).ravel()),
                        tuple(np.round(np.asarray(c.distortion), 9).ravel()),
                        float(np.asarray(c.fov_threshold)),
                    )
                    for c in rig.cameras
                ],
                float(scene_distance),
                image_size,
            )
        ).encode()
        key = hashlib.sha256(key_src).hexdigest()[:24]
        cache_path = os.path.join(cache_dir, f"views_{key}.npz")
        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                return [z[f"v{i}"] for i in range(len(rig.cameras))]

    views = []
    for cam in rig.cameras:
        res = np.asarray(cam.resolution, dtype=np.int64)
        W, H = int(res[0]), int(res[1])
        if image_size is not None:
            cam = cam_mod.create_rescaled_camera(cam, image_size / max(W, H))
            res = np.asarray(cam.resolution, dtype=np.int64)
            W, H = int(res[0]), int(res[1])
        xs = np.arange(W, dtype=np.float64)
        ys = np.arange(H, dtype=np.float64)
        gx, gy = np.meshgrid(xs, ys)
        pix = np.stack([gx, gy], axis=-1)
        direction = cam_mod.pixel_to_rig_direction(cam, pix)
        # intersect the environment sphere centered at the rig origin
        origin = np.asarray(cam.position, dtype=np.float64)
        b = np.sum(direction * origin, axis=-1)
        c = np.sum(origin * origin) - scene_distance**2
        t_hit = -b + np.sqrt(np.maximum(b * b - c, 0.0))
        hit = origin + t_hit[..., None] * direction
        hit_dir = hit / np.linalg.norm(hit, axis=-1, keepdims=True)
        rgb = env_fn(hit_dir)
        world = origin + direction * 10.0  # fov test point along the ray
        alpha = (~np.asarray(cam_mod.is_outside_fov(cam, world))).astype(
            np.float32
        )
        rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
        views.append(np.moveaxis(rgba, -1, 0).astype(np.float32))
    if cache_path is not None:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **{f"v{i}": v for i, v in enumerate(views)})
        os.replace(tmp, cache_path)
    return views


def render_equirect_reference(
    ctx,
    env_fn=checker_sinusoid_environment,
    after_wrap_shift: bool = True,
    full_sphere: bool = False,
):
    """Ground-truth mono equirect for an at-infinity environment, laid out
    in the renderer's output convention. The lazy warp samples the OVERLAP
    strip (strip-global column = sw - ovW + warp_x), so chunk geometry gives
    theta(x) = -2 pi i / N - ((sw - ovW - Wc) + nv + verge + 0.5) * h / sw;
    the zero-parallax wrap shift then moves content right by
    zero_parallax_shift_px; phi follows the side strip's vertical sweep,
    padded to eqr_height. Returns (3, eqr_h, eqr_w) float32."""
    cfg = ctx.config
    n = ctx.num_side_cams
    Wc = ctx.chunk_w
    eqr_w, eqr_h = cfg.eqr_width, cfg.eqr_height

    x = np.arange(eqr_w, dtype=np.float64)
    if after_wrap_shift:
        x = x - ctx.zero_parallax_shift_px
    i = np.floor(x / Wc)
    nv = x - i * Wc
    # recover the verge term from the stored left-eye warp columns
    verge = float(
        ctx.warp_cols_l[0] - (ctx.strip_w / 2.0 - Wc)
    )
    strip_offset = ctx.strip_w - ctx.overlap_w - Wc  # int-truncation excess
    theta = (
        -2.0 * np.pi * i / n
        - (strip_offset + nv + verge + 0.5) * ctx.h_radians / ctx.strip_w
    )

    pad_above = (eqr_h - ctx.strip_h) // 2
    y = np.arange(eqr_h, dtype=np.float64)
    phi = ctx.v_radians / 2.0 - (y - pad_above + 0.5) * (
        ctx.v_radians / ctx.strip_h
    )
    if full_sphere:
        # the same linear phi sweep continued into the polar caps (the
        # renderer pads the side band then composites the fisheyes on the
        # identical row->phi mapping); clamp at the mathematical poles
        phi = np.clip(phi, -np.pi / 2.0, np.pi / 2.0)

    ph, th = np.meshgrid(phi, theta, indexing="ij")
    unit = np.stack(
        [np.cos(ph) * np.cos(th), np.cos(ph) * np.sin(th), np.sin(ph)],
        axis=-1,
    )
    rgb = env_fn(unit)
    if not full_sphere:
        valid = (y >= pad_above) & (y < pad_above + ctx.strip_h)
        rgb = rgb * valid[:, None, None]
    return np.moveaxis(rgb, -1, 0).astype(np.float32)
