"""Per-stage device-time breakdown of the frame pipeline.

The reference logs a per-frame stage table (projection / side flow /
novel view / pole flow / sharpen — TestRenderStereoPanorama.cpp:963-971).
XLA fuses our whole frame into one program, so per-stage times can't be
read off the fused run; instead each stage is jitted and timed in
isolation on representative inputs, and the measured per-dispatch floor
of the platform is subtracted. Wired into cli/render_video via
--profile_stages and driven standalone by benchmarks/profile_stages.py.
"""

from __future__ import annotations

import time

import numpy as np


def _sync(x):
    """Reliable device sync on axon: force a tiny device->host transfer."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, reps=5):
    out = fn(*args)  # compile + warm
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.time() - t0) / reps, out


def stage_breakdown(ctx, side, top=None, bottom=None, reps: int = 5):
    """Time each pipeline stage in isolation on the given frame inputs.

    Returns {stage: seconds} including 'dispatch_floor' (subtract it for
    device time) and 'full_frame'. Stages log as they complete so a
    failing stage still leaves the earlier measurements on record."""
    import logging

    import jax
    import jax.numpy as jnp

    from ..flow import make_flow_params
    from ..views.novel_view import prepare_pair_flows, render_chunk_pair
    from .panorama import (
        _pad_to_height,
        _pole_to_side_flow,
        _prepare_fisheye_strip,
        _project_side_cameras,
        _render_ring,
        render_frame,
    )

    log = logging.getLogger(__name__)
    cfg = ctx.config
    results = {}

    def record(name, value):
        results[name] = value
        log.warning("stage %s: %.1f ms", name, value * 1e3)

    # warp tables enter every staged program as arguments, matching
    # make_jitted_renderer (constants overflow the compile service at 6k+)
    side_warps_dev = jnp.asarray(ctx.side_warps, jnp.float32)
    top_warp_dev = (
        None if ctx.top_warp is None else jnp.asarray(ctx.top_warp, jnp.float32)
    )
    bottom_warp_dev = (
        None
        if ctx.bottom_warp is None
        else jnp.asarray(ctx.bottom_warp, jnp.float32)
    )
    dw = {"side": side_warps_dev}
    if top_warp_dev is not None:
        dw["top"] = top_warp_dev
    if bottom_warp_dev is not None:
        dw["bottom"] = bottom_warp_dev

    floor_fn = jax.jit(lambda x: x + 1.0)
    t, _ = _time(floor_fn, jnp.zeros((8, 128), jnp.float32), reps=reps)
    record("dispatch_floor", t)

    proj_fn = jax.jit(
        lambda s, w: _project_side_cameras(ctx, s, warps_dev=w)
    )
    t, projections = _time(proj_fn, side, side_warps_dev, reps=reps)
    record("projection", t)

    ov = ctx.overlap_w
    flow_params = make_flow_params(cfg.side_flow_alg)
    overlap_l = projections[..., ctx.strip_w - ov:]
    overlap_r = jnp.roll(projections, -1, axis=0)[..., :ov]
    flows_fn = jax.jit(lambda l, r: prepare_pair_flows(l, r, flow_params))
    t, (flow_ltr, flow_rtl) = _time(
        flows_fn, overlap_l, overlap_r, reps=reps
    )
    record("side_flow", t)

    chunks_fn = jax.jit(
        lambda l, r, fl, fr: render_chunk_pair(
            l, r, fl, fr, ctx.warp_cols_l, ctx.t_cols, ctx.warp_cols_r
        )
    )
    t, _ = _time(
        chunks_fn, overlap_l, overlap_r, flow_ltr, flow_rtl, reps=reps
    )
    record("novel_view", t)

    ring_fn = jax.jit(
        lambda s, w: _render_ring(
            ctx, _project_side_cameras(ctx, s, warps_dev=w), {}, False
        )[:2]
    )
    t, (pano_l, pano_r) = _time(ring_fn, side, side_warps_dev, reps=reps)
    record("ring_total", t)

    if cfg.enable_top and top is not None:
        pano2 = jnp.stack([
            _pad_to_height(pano_l, cfg.eqr_height),
            _pad_to_height(pano_r, cfg.eqr_height),
        ])
        strip_fn = jax.jit(
            lambda im, w: _prepare_fisheye_strip(
                ctx, ctx.top_warp, ctx.top_h, im, cfg.std_alpha_feather_size,
                warp_dev=w,
            )
        )
        t, top_strip = _time(strip_fn, top, top_warp_dev, reps=reps)
        record("fisheye_strip", t)
        pole_fn = jax.jit(
            lambda p2, f: _pole_to_side_flow(ctx, p2, f, "top", {}, False)[0]
        )
        t, _ = _time(pole_fn, pano2, top_strip, reps=reps)
        record("pole_flow_composite_one", t)

    frame_fn = jax.jit(
        lambda s, t, b, w: render_frame(ctx, s, t, b, device_warps=w)[0][
            "equirect"
        ]
    )
    t, _ = _time(frame_fn, side, top, bottom, dw, reps=reps)
    record("full_frame", t)
    return results


def format_breakdown(results: dict) -> str:
    floor = results.get("dispatch_floor", 0.0)
    lines = ["stage breakdown (isolated jits; -floor = device time):"]
    for k, v in results.items():
        adj = v - floor if k != "dispatch_floor" else v
        lines.append(f"  {k:28s} {v * 1e3:9.1f} ms   (-floor {adj * 1e3:9.1f} ms)")
    return "\n".join(lines)
