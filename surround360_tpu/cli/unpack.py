"""Unpack: capture .bin files -> per-camera RGB image trees.

Rebuild of the reference Unpacker binary
(surround360_render/source/camera_isp/Unpacker.cpp): for each camera in
each footage file, decode raw frames, run the ISP with that serial's JSON,
and write <out>/camN/NNNNNN.png — with camera dirs named cam0..N sorted by
serial (Unpacker.cpp:208-221). The reference's std::async camera fan-out
(Unpacker.cpp:117-194) becomes a frame-batched jit (one device dispatch
per chunk of frames) with PNG writes overlapped on a host thread pool.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..isp import BinaryFootageReader, isp_process, load_isp_config
from .common import log, setup_logging, write_image


def unpack(
    bin_paths: list[str],
    output_dir: str,
    isp_dir: str,
    start_frame: int = 0,
    frame_count: int = 0,
    output_bpp: int = 8,
) -> list[str]:
    """Returns the list of camera directory names written (serial order)."""
    import jax.numpy as jnp

    readers = [BinaryFootageReader(p) for p in bin_paths]

    # discover serials: (reader, camera_index) -> serial
    entries = []
    for r in readers:
        for cam in range(r.num_cameras):
            entries.append((r, cam, r.get_serial(0, cam)))
    serial_sorted = sorted(entries, key=lambda e: e[2])
    cam_names = {
        serial: f"cam{i}" for i, (_, _, serial) in enumerate(serial_sorted)
    }
    log.info("serials: %s", {s: n for (_, _, s), n in zip(serial_sorted, cam_names.values())})

    # frame-batched on-device ISP (the reference unpacks cameras
    # concurrently with std::async, Unpacker.cpp:117-194; here the
    # concurrency is a batched jit over a frame chunk — one dispatch per
    # ISP_BATCH frames instead of per frame — with PNG encoding/writes
    # overlapped on a host thread pool). The tail chunk is padded to the
    # batch size so every camera shares one compiled program.
    from concurrent.futures import ThreadPoolExecutor

    ISP_BATCH = int(os.environ.get("S360_UNPACK_BATCH", "8"))
    with ThreadPoolExecutor(max_workers=8) as pool:
        futures = []
        for reader, cam, serial in serial_sorted:
            cam_dir = os.path.join(output_dir, cam_names[serial])
            os.makedirs(cam_dir, exist_ok=True)
            isp_json = os.path.join(isp_dir, f"{serial}.json")
            cfg = load_isp_config(isp_json)
            n_frames = reader.num_frames if frame_count == 0 else min(
                reader.num_frames, start_frame + frame_count
            )
            frames = list(range(start_frame, n_frames))
            for c0 in range(0, len(frames), ISP_BATCH):
                chunk = frames[c0 : c0 + ISP_BATCH]
                raws = np.stack(
                    [reader.get_raw_uint16(f, cam) for f in chunk]
                ).astype(np.float32) / 65535.0
                if len(chunk) < ISP_BATCH:  # pad tail: one program per cfg
                    raws = np.concatenate(
                        [raws, np.repeat(raws[-1:], ISP_BATCH - len(chunk), 0)]
                    )
                rgbs = np.asarray(isp_process(jnp.asarray(raws), cfg))
                for f, rgb in zip(chunk, rgbs):
                    futures.append(pool.submit(
                        write_image,
                        os.path.join(cam_dir, f"{f:06d}.png"),
                        rgb,
                        bit_depth=output_bpp,
                    ))
            log.info(
                "unpacked %s (%d frames)", cam_names[serial], len(frames)
            )
        for fut in futures:
            fut.result()
    return [cam_names[s] for (_, _, s) in serial_sorted]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--binary_prefix", required=True,
                   help="directory containing N.bin capture files")
    p.add_argument("--file_count", type=int, default=1)
    p.add_argument("--dest_path", required=True)
    p.add_argument("--isp_dir", required=True)
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--frame_count", type=int, default=0)
    p.add_argument("--output_bpp", type=int, default=8, choices=[8, 16])
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(args.verbose)
    bins = [
        os.path.join(args.binary_prefix, f"{i}.bin")
        for i in range(args.file_count)
    ]
    unpack(
        bins,
        args.dest_path,
        args.isp_dir,
        args.start_frame,
        args.frame_count,
        args.output_bpp,
    )


if __name__ == "__main__":
    main()
