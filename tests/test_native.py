"""Native C++ component tests: converters, footage writer, ring buffer,
capture daemon round trip."""

import numpy as np
import pytest

from surround360_tpu import native
from surround360_tpu.isp import BinaryFootageReader
from surround360_tpu.isp.raw import (
    convert_12bit_frame,
    convert_8bit_frame,
    pack_12bit_frame,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


class TestNativeConverters:
    def test_convert12_matches_numpy(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 4096, size=(64, 96), dtype=np.uint16)
        packed = pack_12bit_frame(vals)
        nat = native.convert12_native(packed, 96, 64)
        expect = (vals << 4) | (vals >> 8)
        np.testing.assert_array_equal(nat, expect)

    def test_convert8_matches_numpy(self):
        buf = bytes(range(256)) * 4
        nat = native.convert8_native(buf, 32, 32)
        ref = np.frombuffer(buf, dtype=np.uint8).astype(np.uint16) * 0x101
        np.testing.assert_array_equal(nat.reshape(-1), ref)

    def test_pack12_roundtrip(self):
        rng = np.random.default_rng(1)
        vals = rng.integers(0, 4096, size=(16, 32), dtype=np.uint16)
        packed = native.pack12_native(vals)
        assert packed == pack_12bit_frame(vals)


class TestNativeRing:
    def test_fifo_order_and_shutdown(self):
        ring = native.NativeRing(slot_size=64, n_slots=4)
        try:
            for i in range(4):
                assert ring.push(bytes([i]) * 10)
            for i in range(4):
                out = ring.pop()
                assert out == bytes([i]) * 10
            ring.done()
            assert ring.pop() is None
        finally:
            ring.destroy()

    def test_threaded_producer_consumer(self):
        import threading

        ring = native.NativeRing(slot_size=1024, n_slots=4)
        received = []

        def consumer():
            while True:
                item = ring.pop()
                if item is None:
                    break
                received.append(item)

        t = threading.Thread(target=consumer)
        t.start()
        sent = [bytes([i % 256]) * 100 for i in range(50)]
        for s in sent:
            assert ring.push(s)  # blocks when full; consumer drains
        ring.done()
        t.join()
        ring.destroy()
        assert received == sent


class TestNativeFootageWriter:
    def test_reader_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        W = H = 16
        serials = [7, 9]
        path = str(tmp_path / "native.bin")
        w = native.NativeFootageWriter(path, W, H, 12, serials)
        frames = []
        for _ in range(3):
            per_cam = []
            for _ in serials:
                vals = rng.integers(0, 4096, (H, W), dtype=np.uint16)
                per_cam.append(pack_12bit_frame(vals))
            frames.append(per_cam)
            for cam, payload in enumerate(per_cam):
                w.write_frame(cam, payload)
        w.close()

        reader = BinaryFootageReader(path)
        assert reader.num_cameras == 2
        assert reader.num_frames == 3
        assert reader.get_serial(0, 0) == 7
        assert reader.get_serial(1, 1) == 9
        raw = reader.get_raw_uint16(2, 0)
        assert raw.shape == (H, W)


class TestCaptureDaemon:
    def test_record_and_read_back(self, tmp_path):
        from surround360_tpu.capture.daemon import CaptureDaemon

        rng = np.random.default_rng(3)
        W = H = 16
        serials = [100, 200, 300]
        frame_payloads = {
            (f, c): pack_12bit_frame(
                rng.integers(0, 4096, (H, W), dtype=np.uint16)
            )
            for f in range(4)
            for c in range(3)
        }

        def source(frame, cam):
            # camera 1 drops frame counter 2 (gap detection)
            counter = frame if not (cam == 1 and frame >= 2) else frame + 1
            return frame_payloads[(frame, cam)], counter

        paths = [str(tmp_path / "0.bin"), str(tmp_path / "1.bin")]
        daemon = CaptureDaemon(paths, W, H, 12, serials)
        stats = daemon.record(source, num_frames=4)
        assert stats.frames_produced == 12
        assert stats.frames_written == 12
        assert stats.frames_dropped == 1  # camera 1's counter gap

        r0 = BinaryFootageReader(paths[0])  # cameras 0, 2
        r1 = BinaryFootageReader(paths[1])  # camera 1
        assert r0.num_cameras == 2 and r0.num_frames == 4
        assert r1.num_cameras == 1 and r1.num_frames == 4
        assert r0.get_serial(0, 0) == 100
        assert r0.get_serial(0, 1) == 300
        assert r1.get_serial(3, 0) == 200
