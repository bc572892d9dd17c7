"""Capture daemon: producer/consumer recording pipeline.

Structural rebuild of the reference capture recorder
(surround360_camera_ctl_ui/source/CameraController.{hpp,cpp}): producer
threads pull frames from a source (hardware in the reference; any callable
here, e.g. the capture simulator), detect drops via embedded frame
counters, and push FramePackets through a native C++ SPSC ring buffer; a
consumer thread drains each ring into a .bin footage file through the
native writer (consumer ping-pong ``cid = i % consumerCount``,
CameraController.cpp:325). The FlyCapture2/GTK hardware layer itself is
out of software scope (SURVEY §7.8) — the frame-source callable is the
hardware seam.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

import numpy as np

from ..native import NativeFootageWriter, NativeRing

__all__ = ["CaptureDaemon", "CaptureStats"]


@dataclass
class CaptureStats:
    frames_produced: int = 0
    frames_written: int = 0
    frames_dropped: int = 0
    per_camera_written: dict = field(default_factory=dict)


class CaptureDaemon:
    """Records ``num_frames`` frames from ``frame_source`` into .bin files.

    frame_source(frame_idx, camera_idx) -> (payload: bytes,
    frame_counter: int). Frame counters emulate the camera's embedded
    counter; gaps are counted as drops (CameraController.cpp:336-341).
    """

    def __init__(
        self,
        dest_paths: list[str],  # one .bin per consumer
        width: int,
        height: int,
        bits_per_pixel: int,
        serials: list[int],
        ring_slots: int = 8,
    ):
        self.width = width
        self.height = height
        self.bpp = bits_per_pixel
        self.serials = serials
        self.frame_size = width * height * bits_per_pixel // 8
        self.n_consumers = len(dest_paths)
        self.dest_paths = dest_paths
        self.ring_slots = ring_slots
        self.stats = CaptureStats()
        # cameras are distributed over consumers round-robin like the
        # reference's cid = cameraIndex % consumerCount
        self._consumer_cams = {
            cid: [
                c for c in range(len(serials)) if c % self.n_consumers == cid
            ]
            for cid in range(self.n_consumers)
        }

    def record(self, frame_source, num_frames: int) -> CaptureStats:
        # +8 bytes: (camera_idx, pad) routing header inside the ring slot
        rings = [
            NativeRing(self.frame_size + 8, self.ring_slots)
            for _ in range(self.n_consumers)
        ]
        writers = [
            NativeFootageWriter(
                path,
                self.width,
                self.height,
                self.bpp,
                [self.serials[c] for c in self._consumer_cams[cid]],
                file_index=cid,
                file_count=self.n_consumers,
            )
            for cid, path in enumerate(self.dest_paths)
        ]
        errors = []

        def consumer(cid):
            ring = rings[cid]
            cams = self._consumer_cams[cid]
            local_index = {c: i for i, c in enumerate(cams)}
            try:
                while True:
                    packet = ring.pop()
                    if packet is None:
                        break
                    cam = int(np.frombuffer(packet[:8], dtype="<u4")[0])
                    writers[cid].write_frame(local_index[cam], packet[8:])
                    self.stats.frames_written += 1
                    self.stats.per_camera_written[cam] = (
                        self.stats.per_camera_written.get(cam, 0) + 1
                    )
            except Exception as e:  # surfaced after join
                errors.append(e)

        threads = [
            threading.Thread(target=consumer, args=(cid,), daemon=True)
            for cid in range(self.n_consumers)
        ]
        for t in threads:
            t.start()

        last_counter = {}
        header = np.zeros(2, dtype="<u4")
        for frame in range(num_frames):
            for cam in range(len(self.serials)):
                payload, counter = frame_source(frame, cam)
                prev = last_counter.get(cam)
                if prev is not None and counter != prev + 1:
                    self.stats.frames_dropped += counter - prev - 1
                last_counter[cam] = counter
                header[0] = cam
                cid = cam % self.n_consumers
                rings[cid].push(header.tobytes() + payload)
                self.stats.frames_produced += 1

        for ring in rings:
            ring.done()
        for t in threads:
            t.join()
        for w in writers:
            w.close()
        for ring in rings:
            ring.destroy()
        if errors:
            raise errors[0]
        return self.stats
