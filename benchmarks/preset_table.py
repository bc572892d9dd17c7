"""On-chip quality-preset benchmark: fps + peak HBM per preset.

Renders the synthetic capture through the full pipeline at the
reference's quality-preset geometries (batch_process_video.py:176-199,
mirrored in cli/render_video.py::QUALITY_PRESETS) with full-resolution
2048px cameras, and records ms/frame, fps, and peak device memory.
This is the evidence the presets actually compile and run on one chip
(the round-1 gap: presets declared but never exercised).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/preset_table.py
Env: S360_PRESETS (default "3k,6k"), S360_PRESET_REPS (default 3),
     S360_PRESET_CAM_SCALE (default 1.0 -> 2048px cameras),
     S360_PRESET_TEMPORAL=1 -> VIDEO semantics: frames chained through
     the temporal flow prior (the reference's frame chain,
     TestRenderStereoPanorama.cpp:210-256) — the state pytree is stored
     at flow resolution so a 6k/8k chain fits in the 15.75 GB HBM.
     S360_PRESET_CUBEMAP=1 -> also emit the stereo cubemap output
     (faces eqr_height/2 square, the banded-warp path; convertSpherical-
     ToCubemapBicubicRemap, ImageWarper.cpp:95-141).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from surround360_tpu.capture import render_camera_views
    from surround360_tpu.cli.render_video import (
        PRESET_SHARPENING,
        PRESET_SIDE_FLOW_SCALE,
        QUALITY_PRESETS,
    )
    from surround360_tpu.geometry.rig import make_ring_rig
    from surround360_tpu.render.panorama import (
        RenderConfig,
        build_render_context,
        make_jitted_renderer,
    )

    presets = os.environ.get("S360_PRESETS", "3k,6k").split(",")
    reps = int(os.environ.get("S360_PRESET_REPS", "3"))
    cam_scale = float(os.environ.get("S360_PRESET_CAM_SCALE", "1.0"))
    temporal = os.environ.get("S360_PRESET_TEMPORAL", "0") == "1"
    cubemap = os.environ.get("S360_PRESET_CUBEMAP", "0") == "1"

    rig = make_ring_rig().rescaled(cam_scale)
    views = render_camera_views(rig)
    side = jnp.asarray(
        np.stack([views[rig.ids.index(s)] for s in rig.side_ids])
    )
    top = jnp.asarray(views[rig.top_camera_index])
    bottom = jnp.asarray(views[rig.bottom_camera_index])
    dev = jax.devices()[0]

    def sync(out):
        np.asarray(out["equirect"][0, 0, 0])
        if "cubemap" in out:
            np.asarray(out["cubemap"][0, 0, 0])

    rows = []
    for name in presets:
        eqr_w, eqr_h, fin_w, fin_h = QUALITY_PRESETS[name.strip()]
        cfg = RenderConfig(
            eqr_width=eqr_w,
            eqr_height=eqr_h,
            final_eqr_width=fin_w,
            final_eqr_height=fin_h,
            sharpening=PRESET_SHARPENING,
            side_flow_alg="pixflow_tpu",
            polar_flow_alg="pixflow_tpu",
            side_flow_scale=PRESET_SIDE_FLOW_SCALE.get(name.strip(), 1.0),
            enable_top=True,
            enable_bottom=True,
            cubemap_width=(eqr_h // 2) if cubemap else 0,
            cubemap_height=(eqr_h // 2) if cubemap else 0,
        )
        ctx = build_render_context(rig, cfg)
        t0 = time.time()
        try:
            if temporal:
                # video semantics: frame 0 priorless, then a chain of
                # `reps` frames carrying the temporal state (stored at
                # flow resolution — full-res state OOM'd 6k at frame 2)
                render0 = make_jitted_renderer(ctx, use_temporal=False)
                render_t = make_jitted_renderer(ctx, use_temporal=True)
                out, state = render0(side, top, bottom, None)
                sync(out)
                out, state = render_t(side, top, bottom, state)  # warm
                sync(out)
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(reps):
                    out, state = render_t(side, top, bottom, state)
                    sync(out)
                ms = (time.time() - t0) / reps * 1e3
            else:
                render = make_jitted_renderer(ctx)
                # index [0] drops the state pytree immediately: keeping
                # frame k's FULL-Res state alive across frame k+1 used to
                # double ~8 GB and OOM the chip (priorless semantics)
                out = render(side, top, bottom, None)[0]
                sync(out)
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(reps):
                    out = render(side, top, bottom, None)[0]
                    sync(out)
                ms = (time.time() - t0) / reps * 1e3
        except Exception as e:  # noqa: BLE001 - record OOM/compile failures
            rows.append({"preset": name, "error": f"{type(e).__name__}: {e}"[:200]})
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
            continue
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:  # noqa: BLE001 - axon may not expose memory stats
            pass
        peak_gb = stats.get("peak_bytes_in_use", 0) / 2**30
        rows.append(
            {
                "preset": name,
                "mode": ("temporal" if temporal else "priorless")
                + ("+cubemap" if cubemap else ""),
                "eqr": f"{eqr_w}x{eqr_h}/eye",
                "ms_per_frame": round(ms, 1),
                "fps": round(1e3 / ms, 3),
                "compile_s": round(compile_s, 1),
                "peak_hbm_gb": round(peak_gb, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print("\n| preset | eqr/eye | ms/frame | fps | peak HBM (GB) |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['preset']} | — | FAILED: {r['error']} | | |")
        else:
            print(
                f"| {r['preset']} | {r['eqr']} | {r['ms_per_frame']} | "
                f"{r['fps']} | {r['peak_hbm_gb']} |"
            )


if __name__ == "__main__":
    main()
