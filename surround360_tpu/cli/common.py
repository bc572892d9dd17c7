"""Shared CLI helpers: image io, flow serialization, logging, timing.

Replaces the reference's glog + per-stage getCurrTimeSec bracketing
(util/SystemUtil.h:63-65, TestRenderStereoPanorama.cpp:963-971) and the
flow .bin (de)serialization (util/CvUtil.cpp:159-199, same layout: int32
rows, int32 cols, float32 x/y pairs).
"""

from __future__ import annotations

import logging
import struct
import time
from contextlib import contextmanager

import cv2
import numpy as np

log = logging.getLogger("surround360_tpu")


def setup_logging(verbose: bool = False):
    logging.basicConfig(
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s] %(message)s",
    )


class StageTimer:
    """Collects per-stage wall-clock times; prints the runtime-breakdown
    table like TestRenderStereoPanorama.cpp:963-971."""

    def __init__(self):
        self.stages: list[tuple[str, float]] = []
        self._t0 = time.time()

    @contextmanager
    def stage(self, name: str):
        t = time.time()
        yield
        self.stages.append((name, time.time() - t))

    def report(self) -> str:
        lines = ["--- Runtime breakdown (sec) ---"]
        lines.append(f"Total:\t{time.time() - self._t0:.3f}")
        for name, dt in self.stages:
            lines.append(f"{name}:\t{dt:.3f}")
        return "\n".join(lines)


def read_image_rgba(path: str) -> np.ndarray:
    """PNG/TIFF/JPEG -> (4, H, W) float32 RGBA in [0,1]."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 3:
        img = np.concatenate(
            [img, np.ones_like(img[..., :1])], axis=-1
        )
    # BGR(A) -> RGB(A)
    img = img[..., [2, 1, 0, 3]]
    return np.moveaxis(img, -1, 0)


def write_image(path: str, img, bit_depth: int = 8) -> None:
    """(3|4, H, W) float32 [0,1] -> PNG/JPEG on disk."""
    img = np.asarray(img)
    hwc = np.moveaxis(img, 0, -1)
    if hwc.shape[-1] >= 3:
        order = [2, 1, 0] + ([3] if hwc.shape[-1] == 4 else [])
        hwc = hwc[..., order]
    scale = 255.0 if bit_depth == 8 else 65535.0
    dtype = np.uint8 if bit_depth == 8 else np.uint16
    data = np.clip(hwc * scale + 0.5, 0, scale).astype(dtype)
    if not cv2.imwrite(path, data):
        raise IOError(f"could not write image: {path}")


def save_flow(path: str, flow) -> None:
    """(2, H, W) float32 -> reference flow .bin layout (rows, cols, then
    row-major float32 (x, y) pairs)."""
    flow = np.asarray(flow, dtype=np.float32)
    _, H, W = flow.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<2i", H, W))
        interleaved = np.stack([flow[0], flow[1]], axis=-1)
        f.write(interleaved.tobytes())


def load_flow(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        H, W = struct.unpack("<2i", f.read(8))
        data = np.frombuffer(f.read(H * W * 8), dtype=np.float32)
    interleaved = data.reshape(H, W, 2)
    return np.stack([interleaved[..., 0], interleaved[..., 1]], axis=0)
