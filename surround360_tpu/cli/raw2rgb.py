"""Single-image ISP tool: raw in, RGB out, optional DNG out.

Rebuild of surround360_render/source/camera_isp/Raw2Rgb.cpp: loads a raw
mosaic (16-bit PNG/TIFF or packed .raw), runs the configured ISP, writes
the RGB result, and optionally a DNG of the raw with the ISP's CCM/WB
baked into the metadata."""

from __future__ import annotations

import argparse

import numpy as np

from ..isp import isp_process, load_isp_config
from .common import log, setup_logging, write_image


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_image_path", required=True)
    p.add_argument("--output_image_path", required=True)
    p.add_argument("--isp_config_path", required=True)
    p.add_argument("--output_dng_path", default="")
    p.add_argument(
        "--demosaic_filter",
        default="",
        choices=["", "bilinear", "frequency", "edge_aware"],
    )
    p.add_argument("--disable_tone_curve", action="store_true")
    p.add_argument("--output_bpp", type=int, default=8, choices=[8, 16])
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    setup_logging(args.verbose)

    import cv2
    import dataclasses
    import time

    cfg = load_isp_config(args.isp_config_path)
    if args.demosaic_filter:
        cfg = dataclasses.replace(cfg, demosaic_filter=args.demosaic_filter)
    if args.disable_tone_curve:
        cfg = dataclasses.replace(cfg, disable_tone_curve=True)

    raw = cv2.imread(args.input_image_path, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(args.input_image_path)
    if raw.ndim == 3:
        raw = raw[..., 0]
    scale = 255.0 if raw.dtype == np.uint8 else 65535.0
    rawf = raw.astype(np.float32) / scale

    t0 = time.time()
    rgb = np.asarray(isp_process(rawf, cfg))
    log.info("ISP runtime: %.1f ms", (time.time() - t0) * 1000)

    write_image(args.output_image_path, rgb, bit_depth=args.output_bpp)
    log.info("wrote %s", args.output_image_path)

    if args.output_dng_path:
        from .dng_helper import save_isp_dng

        save_isp_dng(args.output_dng_path, raw, cfg)
        log.info("wrote %s", args.output_dng_path)


if __name__ == "__main__":
    main()
