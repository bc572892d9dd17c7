"""Trace-time grid-economics dump for the preset frame (no execution).

jax.eval_shape's trace runs every fused_window_sample call site, so with
S360_LOG_FUSED=1 this prints one geometry line per kernel instance
(T/L/G/steps/bh/bw/Pg/caller) for the FULL frame at preset scale —
without compiling or running anything. Use it to see where grid steps
and window area actually go before burning a Mosaic compile on a tuning
guess.

Usage:
  S360_LOG_FUSED=1 PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/trace_grid_economics.py
Env: S360_PROF_EQR_WIDTH (6300), S360_PROF_CAM_SCALE (1.0), and the
usual S360_* tuning knobs being A/B'd.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("S360_LOG_FUSED", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from surround360_tpu.geometry.rig import make_ring_rig
    from surround360_tpu.render.panorama import (
        RenderConfig,
        build_render_context,
        render_frame,
    )

    eqr_w = int(os.environ.get("S360_PROF_EQR_WIDTH", "6300"))
    cam_scale = float(os.environ.get("S360_PROF_CAM_SCALE", "1.0"))
    eqr_h = eqr_w // 2
    flow_alg = os.environ.get("S360_PROF_FLOW_ALG", "pixflow_tpu")

    rig = make_ring_rig().rescaled(cam_scale)
    cfg = RenderConfig(
        eqr_width=eqr_w,
        eqr_height=eqr_h,
        side_flow_alg=flow_alg,
        polar_flow_alg=flow_alg,
        side_flow_scale=float(
            os.environ.get("S360_PROF_SIDE_FLOW_SCALE", "0.5")
        ),
        polar_flow_scale=float(
            os.environ.get("S360_PROF_POLAR_FLOW_SCALE", "0.25")
        ),
        enable_top=True,
        enable_bottom=True,
    )
    ctx = build_render_context(rig, cfg)
    cam = rig.cameras[rig.ids.index(rig.side_ids[0])]
    ch, cw = int(cam.resolution[1]), int(cam.resolution[0])
    side = jax.ShapeDtypeStruct((len(rig.side_ids), 4, ch, cw), jnp.float32)
    topcam = rig.cameras[rig.top_camera_index]
    th, tw = int(topcam.resolution[1]), int(topcam.resolution[0])
    top = jax.ShapeDtypeStruct((4, th, tw), jnp.float32)
    bot = jax.ShapeDtypeStruct((4, th, tw), jnp.float32)

    print(
        f"# tracing full frame @ {eqr_w}x{eqr_h}/eye cams x{cam_scale}",
        file=sys.stderr,
        flush=True,
    )
    out = jax.eval_shape(
        lambda s, t, b: render_frame(ctx, s, t, b, state={}), side, top, bot
    )
    print(f"# traced ok: {jax.tree.map(lambda a: a.shape, out)}")


if __name__ == "__main__":
    main()
