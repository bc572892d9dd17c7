"""Preview CLI: .bin footage -> fast preview frames (+ optional video).

Rebuild of scripts/preview.py driving the TestHyperPreview-equivalent
renderer (surround360_tpu.render.preview)."""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess

import numpy as np

from ..geometry.rig import load_rig
from ..isp import BinaryFootageReader
from ..render.preview import PreviewRenderer
from .common import log, setup_logging, write_image


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--binary_prefix", required=True)
    p.add_argument("--file_count", type=int, default=1)
    p.add_argument("--rig_json_file", required=True)
    p.add_argument("--preview_dest", required=True)
    p.add_argument("--eqr_width", type=int, default=1024)
    p.add_argument("--eqr_height", type=int, default=512)
    p.add_argument("--softmax_coef", type=float, default=5.0)
    p.add_argument("--gamma", type=float, default=0.4545)
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--frame_count", type=int, default=0)
    p.add_argument("--make_video", action="store_true")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(args.verbose)

    rig = load_rig(args.rig_json_file)
    readers = [
        BinaryFootageReader(os.path.join(args.binary_prefix, f"{i}.bin"))
        for i in range(args.file_count)
    ]

    # locate the three fisheye cameras by serial order convention:
    # capture writes serials sorted -> camN naming; the preview needs the
    # top/bottom/bottom2 indices within the rig
    serial_entries = []
    for r in readers:
        for cam in range(r.num_cameras):
            serial_entries.append((r, cam, r.get_serial(0, cam)))
    serial_entries.sort(key=lambda e: e[2])
    rig_order = {i: e for i, e in enumerate(serial_entries)}

    # rescale the preview renderer's cameras to the capture resolution
    md = readers[0].metadata
    native = float(np.asarray(rig.cameras[0].resolution)[0])
    scaled_rig = rig.rescaled(md.width / native)
    pr = PreviewRenderer(
        scaled_rig,
        eqr_width=args.eqr_width,
        eqr_height=args.eqr_height,
        softmax_coef=args.softmax_coef,
        gamma=args.gamma,
    )

    n_frames = readers[0].num_frames
    end = n_frames if args.frame_count == 0 else min(
        n_frames, args.start_frame + args.frame_count
    )
    os.makedirs(args.preview_dest, exist_ok=True)

    def read_raw(rig_index, frame):
        r, cam, _ = rig_order[rig_index]
        return r.get_raw_uint16(frame, cam).astype(np.float32) / 65535.0

    for frame in range(args.start_frame, end):
        out = pr.render(
            read_raw(rig.top_camera_index, frame),
            read_raw(rig.bottom_camera_index, frame),
            read_raw(rig.bottom_camera2_index, frame),
        )
        path = os.path.join(args.preview_dest, f"{frame:06d}.jpg")
        write_image(path, np.asarray(out))
        log.info("preview frame %06d -> %s", frame, path)

    if args.make_video:
        if shutil.which("ffmpeg") is None:
            log.warning("ffmpeg not found; skipping video encode")
        else:
            cmd = (
                f"ffmpeg -framerate 30 -start_number {args.start_frame} "
                f"-i {args.preview_dest}/%06d.jpg -pix_fmt yuv420p "
                f"-c:v libx264 -crf 20 -preset ultrafast "
                f"{args.preview_dest}/preview.mp4 -y"
            )
            subprocess.run(cmd.split(), check=True)


if __name__ == "__main__":
    main()
