"""Per-frame stereo render driver with temporal regularization + resume.

Rebuild of scripts/batch_process_video.py + the TestRenderStereoPanorama
invocation loop: renders frames [start, end], carrying the temporal flow
state across frames on-device (the reference serializes flow .bin files
between subprocess invocations, TestRenderStereoPanorama.cpp:210-256).
State is also serialized per frame (--save_state) for --resume parity.

Output is PIPELINED one frame deep: frame t's programs are dispatched
(JAX dispatch is asynchronous) before frame t-1's outputs are fetched,
and PNG encode/state pickling run on a writer thread — so host IO and
the ~35 ms/dispatch relay round-trip hide behind the TPU compute of the
next frame (BASELINE.md round-4 dispatch-pipelining probe). The
reference gets the same overlap from its prepare/join thread structure
(TestRenderStereoPanorama.cpp:742-761).
"""

from __future__ import annotations

import argparse
import os
import pickle
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..geometry.rig import load_rig
from ..render.panorama import (
    RenderConfig,
    build_render_context,
    make_jitted_renderer,
    render_frame,
)
from .common import log, read_image_rgba, setup_logging, write_image

QUALITY_PRESETS = {
    # name -> (eqr_width, eqr_height, final_width, final_height)
    # (batch_process_video.py:176-199; final height is per BOTH stacked
    # eyes, so 6k FINAL_EQR_HEIGHT 3072 -> 6144 stacked)
    "3k": (3080, 1540, 3080, 3080),
    "4k": (4200, 1024, 4096, 2048),
    "6k": (6300, 3072, 6144, 6144),
    "8k": (8400, 4096, 8192, 8192),
    "preview": (1008, 504, 1008, 1008),
}

# every reference quality preset runs the sharpen stage at 0.25
# (batch_process_video.py:177,183,189,195 "SHARPENNING": 0.25)
PRESET_SHARPENING = 0.25

# side pair flows computed on overlaps downscaled by this factor at the
# large presets (RenderConfig.side_flow_scale): the flow fields are smooth
# disparity and the solver already downsamples 0.5 internally; measured at
# 6k this takes the dominant side-flow stage 3.46 s -> 0.63 s with
# full-res-parity >30 dB (tests/test_render_e2e.py
# ::test_side_flow_scale_matches_full_res) and preset-scale PSNR recorded
# in BASELINE.md "Round-4 preset-quality table" (6k full-sphere 49.6 dB
# with this default engaged). 3k/4k keep the reference's full-res
# geometry.
PRESET_SIDE_FLOW_SCALE = {"6k": 0.5, "8k": 0.5}


def render_video(
    rig_json: str,
    imgs_dir: str,
    output_dir: str,
    start_frame: int,
    end_frame: int,
    config: RenderConfig,
    pole_masks_dir: str | None = None,
    save_state_dir: str | None = None,
    resume_state: str | None = None,
    save_debug_images: bool = False,
    profile_stages: bool = False,
):
    import jax.numpy as jnp

    from ..flow import make_flow_params
    from ..render.pole import combine_bottom_images_with_pole_removal

    rig = load_rig(rig_json)
    ctx = build_render_context(rig, config)
    os.makedirs(os.path.join(output_dir, "eqr_frames"), exist_ok=True)

    # jitted whole-frame renderers (staged automatically at preset scale,
    # warp tables as device args); the eager render_frame path is kept
    # only for --save_debug_images, which needs the intermediates
    renderers: dict[bool, object] = {}

    def jitted(use_temporal: bool):
        if use_temporal not in renderers:
            renderers[use_temporal] = make_jitted_renderer(
                ctx, use_temporal=use_temporal
            )
        return renderers[use_temporal]

    # the saved state pickle carries BOTH the ring temporal state and the
    # pole-removal temporal prior ("pole:"-prefixed keys): the reference
    # persists the pole flow per frame and re-reads it on the next
    # invocation (PoleRemoval.cpp:120-128), so a resumed render must
    # restore it or the prior silently resets
    state = None
    pole_state = {}
    if resume_state:
        with open(resume_state, "rb") as f:
            blob = pickle.load(f)
        pole_state = {
            k[len("pole:"):]: jnp.asarray(v)
            for k, v in blob.items()
            if k.startswith("pole:")
        }
        ring = {
            k: jnp.asarray(v)
            for k, v in blob.items()
            if not k.startswith("pole:")
        }
        state = ring or None
        log.info(
            "resumed temporal state from %s (%d ring keys, %d pole keys)",
            resume_state, len(ring), len(pole_state),
        )

    writer = ThreadPoolExecutor(max_workers=2)
    write_futs: list = []
    save_futs: dict[int, object] = {}  # frame -> its state-save future
    pending = None  # (frame_name, outputs, state, pole_state, t_dispatch)

    def _flush(pend):
        """Fetch a dispatched frame's outputs (blocks until the device
        finishes it) and hand PNG encode + state pickling to the writer
        thread. Called AFTER the next frame is dispatched."""
        frame_name, outputs, state_, pole_state_, t_disp = pend
        eqr = np.asarray(outputs["equirect"])
        eqr_path = os.path.join(
            output_dir, "eqr_frames", f"eqr_{frame_name}.png"
        )
        write_futs.append(writer.submit(write_image, eqr_path, eqr))
        if "cubemap" in outputs:
            cube = np.asarray(outputs["cubemap"])
            write_futs.append(
                writer.submit(
                    write_image,
                    os.path.join(
                        output_dir, "eqr_frames", f"cube_{frame_name}.png"
                    ),
                    cube,
                )
            )
        if save_state_dir:
            os.makedirs(save_state_dir, exist_ok=True)
            blob = {k: np.asarray(v) for k, v in (state_ or {}).items()}
            blob.update(
                {f"pole:{k}": np.asarray(v) for k, v in pole_state_.items()}
            )

            def _save_state(blob=blob, frame_name=frame_name):
                with open(
                    os.path.join(
                        save_state_dir, f"state_{frame_name}.pkl"
                    ),
                    "wb",
                ) as f:
                    pickle.dump(blob, f)

            fut = writer.submit(_save_state)
            write_futs.append(fut)
            frame_no = int(frame_name)
            save_futs[frame_no] = fut
            save_futs.pop(frame_no - 2, None)

            # GC state two frames back (batch_process_video.py:212-228) —
            # chained to THIS frame's save completing, so the "two most
            # recent state files on disk" resume guarantee holds at every
            # instant (deleting N-2 while N is still queued could leave a
            # crash with only stale state on disk)
            def _gc_stale(f, stale_frame=frame_no - 2):
                if f.exception() is not None:
                    return  # save failed; keep the older state
                stale = os.path.join(
                    save_state_dir, f"state_{stale_frame:06d}.pkl"
                )
                try:
                    os.remove(stale)
                except FileNotFoundError:
                    pass

            fut.add_done_callback(_gc_stale)
        log.info(
            "frame %s rendered in %.2fs", frame_name, time.time() - t_disp
        )

    def _read_frame_inputs(frame: int) -> dict:
        """Decode one frame's camera PNGs on the host (prefetchable)."""
        frame_name = f"{frame:06d}"
        ins = {
            "side": np.stack(
                [
                    read_image_rgba(
                        os.path.join(imgs_dir, cam_id, frame_name + ".png")
                    )
                    for cam_id in rig.side_ids
                ]
            )
        }
        if config.enable_top:
            ins["top"] = read_image_rgba(
                os.path.join(
                    imgs_dir,
                    rig.ids[rig.top_camera_index],
                    frame_name + ".png",
                )
            )
        if config.enable_bottom:
            bottom_id = rig.ids[rig.bottom_camera_index]
            ins["bottom"] = read_image_rgba(
                os.path.join(imgs_dir, bottom_id, frame_name + ".png")
            )
            if config.enable_pole_removal:
                bottom2_id = rig.ids[rig.bottom_camera2_index]
                ins["bottom2"] = read_image_rgba(
                    os.path.join(imgs_dir, bottom2_id, frame_name + ".png")
                )
        return ins

    def _surface_writer_errors():
        """Raise promptly if any completed writer task failed, so a disk
        or encode error aborts the run now instead of after every frame."""
        remaining = []
        for f in write_futs:
            if f.done():
                f.result()
            else:
                remaining.append(f)
        write_futs[:] = remaining

    try:
        read_fut = writer.submit(_read_frame_inputs, start_frame)
        for frame in range(start_frame, end_frame + 1):
            frame_name = f"{frame:06d}"
            t0 = time.time()
            ins = read_fut.result()
            if frame < end_frame:
                read_fut = writer.submit(_read_frame_inputs, frame + 1)
            side = jnp.asarray(ins["side"])
            top = bottom = None
            if config.enable_top:
                top = jnp.asarray(ins["top"])
            if config.enable_bottom:
                bottom_id = rig.ids[rig.bottom_camera_index]
                bottom = jnp.asarray(ins["bottom"])
                if config.enable_pole_removal:
                    bottom2_id = rig.ids[rig.bottom_camera2_index]
                    bottom2 = jnp.asarray(ins["bottom2"])
                    mask = _load_pole_mask(pole_masks_dir, bottom_id, bottom.shape[-2:])
                    mask2 = _load_pole_mask(pole_masks_dir, bottom2_id, bottom2.shape[-2:])
                    bottom, pole_flow = combine_bottom_images_with_pole_removal(
                        bottom,
                        bottom2,
                        mask,
                        mask2,
                        ctx.bottom_usable_radius,
                        ctx.bottom2_usable_radius,
                        ctx.pole_flip180,
                        make_flow_params(config.poleremoval_flow_alg),
                        config.std_alpha_feather_size,
                        prev_flow=pole_state.get("pole_flow"),
                        prev_bottom=pole_state.get("prev_bottom"),
                        prev_bottom2=pole_state.get("prev_bottom2"),
                        use_temporal="pole_flow" in pole_state,
                    )
                    pole_state = {
                        "pole_flow": pole_flow,
                        "prev_bottom": bottom,
                        "prev_bottom2": bottom2,
                    }

            if profile_stages and frame == start_frame:
                # per-stage device-time table, the analog of the reference's
                # per-frame stage log (TestRenderStereoPanorama.cpp:963-971)
                from ..render.profiling import format_breakdown, stage_breakdown

                log.info(
                    "%s", format_breakdown(*stage_breakdown(ctx, side, top, bottom))
                )

            if save_debug_images:
                outputs, state = render_frame(
                    ctx,
                    side,
                    top,
                    bottom,
                    state=state,
                    use_temporal=state is not None,
                    save_debug=True,
                )
            else:
                outputs, state = jitted(state is not None)(
                    side, top, bottom, state
                )
            if save_debug_images and "debug" in outputs:
                dbg_dir = os.path.join(output_dir, "debug", frame_name)
                os.makedirs(dbg_dir, exist_ok=True)
                dbg = outputs["debug"]
                for i in range(dbg["projections"].shape[0]):
                    write_image(
                        os.path.join(dbg_dir, f"crop_{rig.side_ids[i]}.png"),
                        np.asarray(dbg["projections"][i]),
                    )
                for key in (
                    "spherical_l", "spherical_r", "top_strip", "top_warped",
                    "bottom_strip", "bottom_warped",
                ):
                    if key in dbg:
                        arr = np.asarray(dbg[key])
                        if arr.ndim == 4:  # (2, 4, H, W) per-eye layers
                            for eye, name in enumerate(("left", "right")):
                                write_image(
                                    os.path.join(dbg_dir, f"{key}_{name}.png"),
                                    arr[eye],
                                )
                        else:
                            write_image(
                                os.path.join(dbg_dir, f"{key}.png"), arr
                            )
            # one-frame-deep pipeline: fetch/write the PREVIOUS frame only
            # after this frame's programs are in the device queue. The debug
            # path stays synchronous (it fetches intermediates eagerly).
            prev_pending = pending
            pending = (frame_name, outputs, state, pole_state, t0)
            if save_debug_images:
                _flush(pending)
                pending = None
            elif prev_pending is not None:
                _flush(prev_pending)
            _surface_writer_errors()
        if pending is not None:
            _flush(pending)
            pending = None
        for fut in write_futs:
            fut.result()  # surface writer-thread exceptions
        write_futs.clear()
    finally:
        # on abort (e.g. the prefetched read for frame N+1 failing), the
        # already-dispatched frame N must still be persisted, and the
        # executor must be shut down — otherwise its PNG + state pkl are
        # silently lost and the process can hang on daemon-less threads
        if pending is not None:
            try:
                _flush(pending)
            except Exception:
                log.exception("failed to flush the in-flight frame on abort")
        for fut in write_futs:
            try:
                fut.result()
            except Exception:
                log.exception("writer task failed during shutdown")
        writer.shutdown(wait=True)
    return state


def _load_pole_mask(masks_dir, cam_id, hw):
    """Red pole mask PNG -> (H, W) bool (True where pole)."""
    if masks_dir is None:
        return np.zeros(hw, dtype=bool)
    path = os.path.join(masks_dir, f"{cam_id}.png")
    if not os.path.exists(path):
        return np.zeros(hw, dtype=bool)
    rgba = read_image_rgba(path)
    return (rgba[0] > 0.99) & (rgba[1] < 0.01) & (rgba[2] < 0.01)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--rig_json_file", required=True)
    p.add_argument("--imgs_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--end_frame", type=int, default=0)
    p.add_argument("--quality", default="preview", choices=QUALITY_PRESETS)
    p.add_argument("--interpupilary_dist", type=float, default=6.4)
    p.add_argument("--zero_parallax_dist", type=float, default=10000.0)
    p.add_argument(
        "--sharpening", type=float, default=PRESET_SHARPENING,
        help="unsharp amount; the reference sets 0.25 for every quality "
        "preset (batch_process_video.py:176-199)",
    )
    p.add_argument("--enable_top", action="store_true")
    p.add_argument("--enable_bottom", action="store_true")
    p.add_argument("--enable_pole_removal", action="store_true")
    p.add_argument("--bottom_pole_masks_dir", default=None)
    p.add_argument("--side_flow_alg", default="pixflow_tpu")
    p.add_argument("--polar_flow_alg", default="pixflow_tpu")
    p.add_argument("--poleremoval_flow_alg", default="pixflow_tpu")
    p.add_argument("--cubemap_width", type=int, default=0)
    p.add_argument("--cubemap_height", type=int, default=0)
    p.add_argument("--cubemap_format", default="video")
    p.add_argument("--save_state_dir", default=None)
    p.add_argument("--resume_state", default=None)
    p.add_argument("--save_debug_images", action="store_true")
    p.add_argument("--profile_stages", action="store_true",
                   help="log a per-stage device-time table before rendering")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(args.verbose)

    eqr_w, eqr_h, fin_w, fin_h = QUALITY_PRESETS[args.quality]
    cfg = RenderConfig(
        eqr_width=eqr_w,
        eqr_height=eqr_h,
        final_eqr_width=fin_w,
        final_eqr_height=fin_h,
        interpupilary_dist=args.interpupilary_dist,
        zero_parallax_dist=args.zero_parallax_dist,
        sharpening=args.sharpening,
        side_flow_scale=PRESET_SIDE_FLOW_SCALE.get(args.quality, 1.0),
        enable_top=args.enable_top,
        enable_bottom=args.enable_bottom,
        enable_pole_removal=args.enable_pole_removal,
        side_flow_alg=args.side_flow_alg,
        polar_flow_alg=args.polar_flow_alg,
        poleremoval_flow_alg=args.poleremoval_flow_alg,
        cubemap_width=args.cubemap_width,
        cubemap_height=args.cubemap_height,
        cubemap_format=args.cubemap_format,
    )
    render_video(
        args.rig_json_file,
        args.imgs_dir,
        args.output_dir,
        args.start_frame,
        args.end_frame,
        cfg,
        pole_masks_dir=args.bottom_pole_masks_dir,
        save_state_dir=args.save_state_dir,
        resume_state=args.resume_state,
        save_debug_images=args.save_debug_images,
        profile_stages=args.profile_stages,
    )


if __name__ == "__main__":
    main()
