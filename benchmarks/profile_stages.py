"""Per-stage device-time breakdown of the frame pipeline.

The reference logs a per-frame stage table (projection / side flow /
novel view / pole flow / sharpen / cubemap — TestRenderStereoPanorama.cpp:
963-971). XLA fuses our whole frame into one program, so per-stage times
can't be read off the fused run; instead each stage is jitted and timed
in isolation (its own inputs materialized first), and the measured
per-dispatch floor of the axon tunnel is subtracted.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_stages.py
Env: S360_PROF_EQR_WIDTH (1008), S360_PROF_CAM_SCALE (0.25),
     S360_PROF_REPS (5), S360_PROF_FULL_SPHERE (1).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _sync(x):
    """Reliable device sync on axon: force a tiny device->host transfer."""
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, reps=5):
    out = fn(*args)  # compile + warm
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        _sync(out)
    return (time.time() - t0) / reps, out


def main():
    global jax
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from surround360_tpu.capture import render_camera_views
    from surround360_tpu.flow import compute_flow, make_flow_params
    from surround360_tpu.geometry.rig import make_ring_rig
    from surround360_tpu.render.panorama import (
        RenderConfig,
        _pad_to_height,
        _pole_to_side_flow,
        _prepare_fisheye_strip,
        _project_side_cameras,
        _render_ring,
        build_render_context,
        make_jitted_renderer,
    )
    from surround360_tpu.views.novel_view import (
        prepare_pair_flows,
        render_chunk_pair,
    )

    eqr_w = int(os.environ.get("S360_PROF_EQR_WIDTH", "1008"))
    cam_scale = float(os.environ.get("S360_PROF_CAM_SCALE", "0.25"))
    reps = int(os.environ.get("S360_PROF_REPS", "5"))
    full_sphere = os.environ.get("S360_PROF_FULL_SPHERE", "1") == "1"
    eqr_h = eqr_w // 2

    rig = make_ring_rig().rescaled(cam_scale)
    cfg = RenderConfig(
        eqr_width=eqr_w,
        eqr_height=eqr_h,
        side_flow_alg="pixflow_tpu",
        polar_flow_alg="pixflow_tpu",
        enable_top=full_sphere,
        enable_bottom=full_sphere,
    )
    ctx = build_render_context(rig, cfg)
    views = render_camera_views(rig)
    side = jnp.asarray(
        np.stack([views[rig.ids.index(s)] for s in rig.side_ids])
    )
    top = jnp.asarray(views[rig.top_camera_index]) if full_sphere else None
    bottom = (
        jnp.asarray(views[rig.bottom_camera_index]) if full_sphere else None
    )

    results = {}

    # dispatch floor: trivial jit
    floor_fn = jax.jit(lambda x: x + 1.0)
    tiny = jnp.zeros((8, 128), jnp.float32)
    results["dispatch_floor"], _ = _time(floor_fn, tiny, reps=reps)

    # 1. side projection
    proj_fn = jax.jit(lambda s: _project_side_cameras(ctx, s))
    t, projections = _time(proj_fn, side, reps=reps)
    results["projection"] = t

    # 2. pair flows (the 28 batched side flows)
    ov = ctx.overlap_w
    flow_params = make_flow_params(cfg.side_flow_alg)
    overlap_l = projections[..., ctx.strip_w - ov:]
    overlap_r = jnp.roll(projections, -1, axis=0)[..., :ov]

    flows_fn = jax.jit(
        lambda l, r: prepare_pair_flows(l, r, flow_params)
    )
    t, (flow_ltr, flow_rtl) = _time(flows_fn, overlap_l, overlap_r, reps=reps)
    results["side_flow"] = t

    # 3. novel-view chunk render + ring concat
    chunks_fn = jax.jit(
        lambda l, r, fl, fr: render_chunk_pair(
            l, r, fl, fr, ctx.warp_cols_l, ctx.t_cols, ctx.warp_cols_r
        )
    )
    t, _ = _time(chunks_fn, overlap_l, overlap_r, flow_ltr, flow_rtl, reps=reps)
    results["novel_view"] = t

    # 4. full ring (proj + flows + chunks + concat) for cross-check
    ring_fn = jax.jit(
        lambda s: _render_ring(ctx, _project_side_cameras(ctx, s), {}, False)[:2]
    )
    t, (pano_l, pano_r) = _time(ring_fn, side, reps=reps)
    results["ring_total"] = t

    if full_sphere:
        pano2 = jnp.stack(
            [_pad_to_height(pano_l, eqr_h), _pad_to_height(pano_r, eqr_h)]
        )

        strip_fn = jax.jit(
            lambda im: _prepare_fisheye_strip(
                ctx, ctx.top_warp, ctx.top_h, im, cfg.std_alpha_feather_size
            )
        )
        t, top_strip = _time(strip_fn, top, reps=reps)
        results["fisheye_strip"] = t

        pole_fn = jax.jit(
            lambda p2, f: _pole_to_side_flow(ctx, p2, f, "top", {}, False)[0]
        )
        t, _ = _time(pole_fn, pano2, top_strip, reps=reps)
        results["pole_flow_composite_one"] = t

    # full frame for reference
    render = make_jitted_renderer(ctx)
    t, _ = _time(lambda s, tp, bt: render(s, tp, bt, None)[0]["equirect"],
                 side, top, bottom, reps=reps)
    results["full_frame"] = t

    floor = results["dispatch_floor"]
    print(f"\n== stage breakdown @ {eqr_w}x{eqr_h}/eye, cams x{cam_scale} ==")
    for k, v in results.items():
        adj = v - floor if k != "dispatch_floor" else v
        print(f"  {k:28s} {v * 1e3:9.1f} ms   (-floor {adj * 1e3:9.1f} ms)")
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
