"""Per-stage device-time breakdown of the frame pipeline (standalone).

Thin driver over surround360_tpu.render.profiling.stage_breakdown — the
same table cli/render_video logs with --profile_stages, matching the
reference's per-frame stage log (TestRenderStereoPanorama.cpp:963-971).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_stages.py
Env: S360_PROF_EQR_WIDTH (1008), S360_PROF_CAM_SCALE (0.25),
     S360_PROF_REPS (5), S360_PROF_FULL_SPHERE (1),
     S360_PROF_STAGES (csv of stage names; default all — select to skip
     the expensive duplicate fused re-traces ring_total/full_frame at
     preset scale).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from surround360_tpu.capture import render_camera_views
    from surround360_tpu.geometry.rig import make_ring_rig
    from surround360_tpu.render.panorama import (
        RenderConfig,
        build_render_context,
    )
    from surround360_tpu.render.profiling import (
        format_breakdown,
        stage_breakdown,
    )

    eqr_w = int(os.environ.get("S360_PROF_EQR_WIDTH", "1008"))
    cam_scale = float(os.environ.get("S360_PROF_CAM_SCALE", "0.25"))
    reps = int(os.environ.get("S360_PROF_REPS", "5"))
    full_sphere = os.environ.get("S360_PROF_FULL_SPHERE", "1") == "1"
    side_flow_scale = float(os.environ.get("S360_PROF_SIDE_FLOW_SCALE", "1.0"))
    polar_flow_scale = float(
        os.environ.get("S360_PROF_POLAR_FLOW_SCALE", "0.25")
    )  # matches the shipping RenderConfig default (round 5)
    eqr_h = eqr_w // 2

    flow_alg = os.environ.get("S360_PROF_FLOW_ALG", "pixflow_tpu")

    rig = make_ring_rig().rescaled(cam_scale)
    cfg = RenderConfig(
        eqr_width=eqr_w,
        eqr_height=eqr_h,
        side_flow_alg=flow_alg,
        polar_flow_alg=flow_alg,
        side_flow_scale=side_flow_scale,
        polar_flow_scale=polar_flow_scale,
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

    stages = os.environ.get("S360_PROF_STAGES", "")
    stages = set(s.strip() for s in stages.split(",") if s.strip()) or None
    results, costs, build = stage_breakdown(
        ctx, side, top, bottom, reps=reps, stages=stages
    )
    print(f"\n== stage breakdown @ {eqr_w}x{eqr_h}/eye, cams x{cam_scale} ==")
    print(format_breakdown(results, costs, build))
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))
    print(json.dumps({k: [round(x, 2) for x in v] for k, v in costs.items()}))


if __name__ == "__main__":
    main()
