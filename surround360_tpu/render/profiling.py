"""Per-stage device-time breakdown + roofline accounting of the frame
pipeline.

The reference logs a per-frame stage table (projection / side flow /
novel view / pole flow / sharpen — TestRenderStereoPanorama.cpp:963-971).
XLA fuses our whole frame into one program, so per-stage times can't be
read off the fused run; instead each stage is jitted and timed in
isolation on representative inputs, and the measured per-dispatch floor
of the platform is subtracted. Wired into cli/render_video via
--profile_stages and driven standalone by benchmarks/profile_stages.py.

Roofline: each stage's compiled program is asked for XLA's own cost
analysis (algorithmic FLOPs + bytes touched); dividing by measured device
time gives achieved TFLOP/s and GB/s, reported as fractions of the v5e
peaks. A stage near the HBM fraction is bandwidth-bound (fuse more /
shrink transients); one near the MXU fraction is compute-bound (the
formulation's arithmetic is the ceiling — e.g. the one-hot window
contraction pays bh*bw MACs per sampled pixel). f32 einsums emulated by
multi-pass bf16 show inflated apparent MXU fractions are NOT possible:
XLA counts algorithmic FLOPs once, so an exact-f32 stage at "33% of bf16
peak" is actually saturating the MXU's 3-pass f32 rate.
"""

from __future__ import annotations

import time

import numpy as np

# TPU v5e (1 chip) peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
V5E_PEAK_BF16_TFLOPS = 197.0
V5E_PEAK_HBM_GBS = 819.0


def _sync(x):
    """Reliable device sync on axon: force a tiny device->host transfer."""
    import jax

    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def _time(fn, *args, reps=5):
    """Trace + compile ONCE via the AOT path (the jit-call route would
    re-lower a second time for cost analysis — expensive on a 1-core
    host), then time the compiled executable. Returns
    (sec/rep, out, trace_s, compile_s, compiled|None)."""
    import jax

    try:
        t0 = time.time()
        lowered = fn.lower(*args)
        trace_s = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
        run = compiled
    except Exception:  # noqa: BLE001 - fall back to plain jit dispatch
        trace_s = compile_s = float("nan")
        compiled = None
        run = fn
    out = run(*args)  # warm
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(*args)
        _sync(out)
    return (time.time() - t0) / reps, out, trace_s, compile_s, compiled


def _cost(compiled):
    """XLA's cost analysis for a compiled program: (GFLOP, GiB) or None
    when the backend doesn't expose it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (
            float(ca.get("flops", 0.0)) / 1e9,
            float(ca.get("bytes accessed", 0.0)) / 2**30,
        )
    except Exception:  # noqa: BLE001 - experimental backends may lack it
        return None


def stage_breakdown(
    ctx, side, top=None, bottom=None, reps: int = 5, stages=None
):
    """Time each pipeline stage in isolation on the given frame inputs.

    Returns (times, costs, build): {stage: seconds} including
    'dispatch_floor' (subtract it for device time) and 'full_frame',
    {stage: (gflop, gib)} where XLA exposes cost analysis, and
    {stage: (trace_s, compile_s)} — the one-shot program-build costs,
    which on this platform (no persistent compile cache, 1-core host)
    dominate video-pipeline startup and are a first-class optimization
    target of their own. Stages log as they complete so a failing stage
    still leaves the earlier measurements on record.

    stages: optional set of stage names to measure (None = all). Stages
    another stage's INPUT depends on still execute (minimally) but are
    not re-jitted/timed; 'ring_total' and 'full_frame' re-trace fused
    copies of already-measured stages — at preset scale each is tens of
    host-minutes of duplicate compile, so select them only when the
    fusion delta is the question."""
    import logging

    import jax
    import jax.numpy as jnp

    from ..flow import HINT_DOWN, compute_flow, make_flow_params
    from ..ops.compositing import (
        feather_alpha,
        offset_horizontal_wrap,
        stack_horizontal,
    )
    from ..views.novel_view import render_chunk_pair
    from .panorama import (
        _merge_poles,
        _pad_to_height,
        _pole_to_side_flow,
        _prepare_fisheye_strip,
        _project_side_cameras,
        _render_ring,
        _side_pair_flows,
        render_frame,
    )

    log = logging.getLogger(__name__)
    cfg = ctx.config
    results = {}
    costs = {}
    build = {}

    def record(name, timed):
        value, out, trace_s, compile_s, compiled = timed
        results[name] = value
        build[name] = (trace_s, compile_s)
        c = _cost(compiled) if compiled is not None else None
        if c is not None:
            costs[name] = c
        log.warning(
            "stage %s: %.1f ms  [trace %.1fs compile %.1fs]%s",
            name,
            value * 1e3,
            trace_s,
            compile_s,
            ""
            if c is None
            else f"  ({c[0] / 1e3:.2f} TFLOP, {c[1]:.2f} GiB)",
        )
        return out

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

    # dependency closure: a selected stage pulls in the stages whose
    # outputs it consumes
    _DEPS = {
        "side_flow": {"projection"},
        "novel_view": {"side_flow"},
        "ring_total": set(),
        "fisheye_strip": set(),
        "pole_flow_solve": {"novel_view", "fisheye_strip"},
        "pole_flow_composite_one": {"novel_view", "fisheye_strip"},
        "pole_merged": {"novel_view", "fisheye_strip"},
        "output": set(),
        "full_frame": set(),
    }
    if stages is None:
        need = set(_DEPS) | {"projection"}
    else:
        need = set(stages)
        grew = True
        while grew:
            grew = False
            for s in list(need):
                for d in _DEPS.get(s, ()):  # noqa: B007
                    if d not in need:
                        need.add(d)
                        grew = True
    want = need.__contains__

    floor_fn = jax.jit(lambda x: x + 1.0)
    record(
        "dispatch_floor",
        _time(floor_fn, jnp.zeros((8, 128), jnp.float32), reps=reps),
    )

    pano2 = None
    if want("projection"):
        proj_fn = jax.jit(
            lambda s, w: _project_side_cameras(ctx, s, warps_dev=w)
        )
        projections = record(
            "projection", _time(proj_fn, side, side_warps_dev, reps=reps)
        )

        ov = ctx.overlap_w
        overlap_l = projections[..., ctx.strip_w - ov:]
        overlap_r = jnp.roll(projections, -1, axis=0)[..., :ov]
    if want("side_flow"):
        flows_fn = jax.jit(
            lambda l, r: _side_pair_flows(ctx, l, r, {}, False)[:2]
        )
        flow_ltr, flow_rtl = record(
            "side_flow", _time(flows_fn, overlap_l, overlap_r, reps=reps)
        )

    if want("novel_view"):
        # chunk render + panorama assembly (the stacking is negligible;
        # folding it here lets the pole stages run without ring_total's
        # duplicate fused re-compile of projection+flow+chunks)
        def chunks_and_pano(l, r, fl, fr):
            chunks_l, chunks_r = render_chunk_pair(
                l, r, fl, fr, ctx.warp_cols_l, ctx.t_cols, ctx.warp_cols_r
            )
            pano_l = stack_horizontal(
                [chunks_l[i] for i in range(chunks_l.shape[0])]
            )
            pano_r = stack_horizontal(
                [chunks_r[i] for i in range(chunks_r.shape[0])]
            )
            pano_l = offset_horizontal_wrap(pano_l, ctx.zero_parallax_shift_px)
            pano_r = offset_horizontal_wrap(
                pano_r, -ctx.zero_parallax_shift_px
            )
            return jnp.stack(
                [
                    _pad_to_height(pano_l, cfg.eqr_height),
                    _pad_to_height(pano_r, cfg.eqr_height),
                ]
            )

        chunks_fn = jax.jit(chunks_and_pano)
        pano2 = record(
            "novel_view",
            _time(
                chunks_fn, overlap_l, overlap_r, flow_ltr, flow_rtl, reps=reps
            ),
        )

    if want("ring_total"):
        ring_fn = jax.jit(
            lambda s, w: _render_ring(
                ctx, _project_side_cameras(ctx, s, warps_dev=w), {}, False
            )[:2]
        )
        record("ring_total", _time(ring_fn, side, side_warps_dev, reps=reps))

    if cfg.enable_top and top is not None and want("fisheye_strip"):
        strip_fn = jax.jit(
            lambda im, w: _prepare_fisheye_strip(
                ctx, ctx.top_warp, ctx.top_h, im, cfg.std_alpha_feather_size,
                warp_dev=w,
            )
        )
        top_strip = record(
            "fisheye_strip", _time(strip_fn, top, top_warp_dev, reps=reps)
        )

        if want("pole_flow_solve"):
            # pole sub-stage: just the pole-to-side flow solve (same input
            # prep as _pole_to_side_flow, panorama.py:391-454), so the
            # composite splits into flow vs warp+blend
            rows_f, eqr_w = top_strip.shape[-2:]
            ext_w = int(eqr_w * 1.2)
            xs_ext = np.arange(ext_w) % eqr_w
            flow_params = make_flow_params(cfg.polar_flow_alg)._replace(
                window_halo_y_frac=0.30, window_halo_x_frac=0.10
            )
            pscale = cfg.polar_flow_scale

            def pole_flow_only(p2, f):
                cropped = feather_alpha(
                    p2[..., :rows_f, :], cfg.std_alpha_feather_size
                )
                ext_side = cropped[..., xs_ext]
                ext_fish = jnp.broadcast_to(
                    f[None, ..., xs_ext], (2,) + f.shape[:-1] + (ext_w,)
                )
                hints = jnp.full((2,), HINT_DOWN, jnp.int32)
                if pscale != 1.0:
                    from ..ops.resize import resize_area

                    fh, fw = int(rows_f * pscale), int(ext_w * pscale)
                    ext_side = resize_area(ext_side, (fh, fw))
                    ext_fish = resize_area(ext_fish, (fh, fw))
                return compute_flow(
                    ext_side, ext_fish, flow_params, hint=hints
                )

            pole_flow_fn = jax.jit(pole_flow_only)
            record(
                "pole_flow_solve",
                _time(pole_flow_fn, pano2, top_strip, reps=reps),
            )

        if want("pole_flow_composite_one"):
            pole_fn = jax.jit(
                lambda p2, f: _pole_to_side_flow(ctx, p2, f, "top", {}, False)[
                    0
                ]
            )
            record(
                "pole_flow_composite_one",
                _time(pole_fn, pano2, top_strip, reps=reps),
            )
            if "pole_flow_solve" in results:
                results["pole_warp_blend"] = max(
                    0.0,
                    results["pole_flow_composite_one"]
                    - results["pole_flow_solve"],
                )

        if want("pole_merged") and _merge_poles(ctx):
            # both poles in one batch-4 program (_poles_to_side_flow):
            # compare against 2x pole_flow_composite_one
            from .panorama import _poles_to_side_flow

            merged_fn = jax.jit(
                lambda p2, ft, fb: _poles_to_side_flow(
                    ctx, p2, ft, fb, {}, False
                )[0]
            )
            record(
                "pole_merged",
                _time(merged_fn, pano2, top_strip, top_strip, reps=reps),
            )

    if want("output"):
        # sharpen + final resize + stereo stack (_finalize_outputs), fed
        # a synthetic pano2 — the frame-time remainder the stage table
        # otherwise can't attribute
        from .panorama import _final_resize_shape, _finalize_outputs

        final = _final_resize_shape(cfg)
        mats = {}
        if final is not None:
            from ..ops.resize import resize_matrix_cubic

            if final[0] != cfg.eqr_height:
                mats["row"] = jnp.asarray(
                    resize_matrix_cubic(cfg.eqr_height, final[0])
                )
            if final[1] != cfg.eqr_width:
                mats["col"] = jnp.asarray(
                    resize_matrix_cubic(cfg.eqr_width, final[1])
                )
        pano2_in = (
            pano2
            if pano2 is not None
            else jnp.zeros(
                (2, 4, cfg.eqr_height, cfg.eqr_width), jnp.float32
            )
        )
        # cubemap warps must ride as traced args when enabled: tracing
        # the cubemap branch with cubemap_warps=None captures the host
        # warp tables as constants — the large-constant compile blowup
        # make_jitted_renderer explicitly avoids at 6k+
        cub = None
        if cfg.cubemap_width > 0 and cfg.cubemap_height > 0:
            from .panorama import _plan_cubemap

            eq_w, po_w, _, _ = _plan_cubemap(
                cfg.eqr_height, cfg.eqr_width, cfg.cubemap_width,
                cfg.cubemap_height,
            )
            cub = {"eq": jnp.asarray(eq_w), "po": jnp.asarray(po_w)}
        out_fn = jax.jit(
            lambda p2, m, c: _finalize_outputs(
                ctx, p2, resize_mats=m, cubemap_warps=c
            )["equirect"]
        )
        record("output", _time(out_fn, pano2_in, mats, cub, reps=reps))

    if want("full_frame"):
        frame_fn = jax.jit(
            lambda s, t, b, w: render_frame(ctx, s, t, b, device_warps=w)[0][
                "equirect"
            ]
        )
        record(
            "full_frame", _time(frame_fn, side, top, bottom, dw, reps=reps)
        )
    return results, costs, build


def format_breakdown(
    results: dict, costs: dict | None = None, build: dict | None = None
) -> str:
    costs = costs or {}
    build = build or {}
    floor = results.get("dispatch_floor", 0.0)
    lines = [
        "stage breakdown (isolated jits; -floor = device time; roofline "
        f"vs v5e peaks {V5E_PEAK_BF16_TFLOPS:.0f} TF/s bf16, "
        f"{V5E_PEAK_HBM_GBS:.0f} GB/s HBM):"
    ]
    for k, v in results.items():
        adj = v - floor if k != "dispatch_floor" else v
        line = f"  {k:28s} {v * 1e3:9.1f} ms   (-floor {adj * 1e3:9.1f} ms)"
        if k in build and np.isfinite(build[k][0]):
            line += f"  [trace {build[k][0]:6.1f}s compile {build[k][1]:6.1f}s]"
        if k in costs and adj > 0:
            gflop, gib = costs[k]
            tflops = gflop / 1e3 / adj
            gbs = gib * 1.0737 / adj  # GiB -> GB
            fc = tflops / V5E_PEAK_BF16_TFLOPS
            fb = gbs / V5E_PEAK_HBM_GBS
            bound = "compute" if fc >= fb else "bandwidth"
            line += (
                f"  {gflop / 1e3:7.2f} TFLOP {tflops:6.1f} TF/s"
                f" ({fc * 100:4.1f}%mxu) {gbs:6.1f} GB/s"
                f" ({fb * 100:4.1f}%hbm) [{bound}-bound]"
            )
        lines.append(line)
    return "\n".join(lines)
