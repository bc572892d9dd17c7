"""Native (C++) runtime components, bound via ctypes.

The library is compiled on first use with g++ and cached next to the
source; every entry point has a pure-numpy fallback so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "footage_io.cpp")
_lib = None
_lib_tried = False


def _build_and_load():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so_path = os.path.join(_DIR, f"_footage_io_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + ".tmp"
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-std=c++17",
                    "-shared",
                    "-fPIC",
                    "-march=native",
                    _SRC,
                    "-o",
                    tmp,
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.s360_convert8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.s360_convert12.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.s360_pack12.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.s360_footage_writer_open.restype = ctypes.c_void_p
        lib.s360_footage_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint32,
        ]
        lib.s360_footage_writer_write.restype = ctypes.c_int
        lib.s360_footage_writer_write.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p,
        ]
        lib.s360_footage_writer_close.restype = ctypes.c_int
        lib.s360_footage_writer_close.argtypes = [ctypes.c_void_p]
        lib.s360_ring_create.restype = ctypes.c_void_p
        lib.s360_ring_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.s360_ring_push.restype = ctypes.c_int
        lib.s360_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.s360_ring_pop.restype = ctypes.c_int64
        lib.s360_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.s360_ring_done.argtypes = [ctypes.c_void_p]
        lib.s360_ring_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _build_and_load() is not None


def convert12_native(buf, width: int, height: int):
    """Native 12-bit unswizzle; returns None when the library is absent."""
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.frombuffer(buf, dtype=np.uint8, count=width * height * 3 // 2)
    src = np.ascontiguousarray(src)
    out = np.empty((height, width), dtype=np.uint16)
    lib.s360_convert12(
        src.ctypes.data, out.ctypes.data, width, height
    )
    return out


def convert8_native(buf, width: int, height: int):
    lib = _build_and_load()
    if lib is None:
        return None
    src = np.ascontiguousarray(
        np.frombuffer(buf, dtype=np.uint8, count=width * height)
    )
    out = np.empty((height, width), dtype=np.uint16)
    lib.s360_convert8(src.ctypes.data, out.ctypes.data, width * height)
    return out


def pack12_native(values: np.ndarray):
    lib = _build_and_load()
    if lib is None:
        return None
    v = np.ascontiguousarray(values, dtype=np.uint16)
    h, w = v.shape
    out = np.empty(h * w * 3 // 2, dtype=np.uint8)
    lib.s360_pack12(v.ctypes.data, out.ctypes.data, w, h)
    return out.tobytes()


class NativeFootageWriter:
    """Streaming .bin writer backed by the C++ implementation."""

    def __init__(
        self,
        path: str,
        width: int,
        height: int,
        bits_per_pixel: int,
        serials,
        timestamp: int = 0,
        file_index: int = 0,
        file_count: int = 1,
    ):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native footage library unavailable")
        self._lib = lib
        s = np.ascontiguousarray(np.asarray(serials, dtype=np.uint32))
        self._handle = lib.s360_footage_writer_open(
            path.encode(), timestamp, file_index, file_count,
            width, height, bits_per_pixel, s.ctypes.data, len(s),
        )
        if not self._handle:
            raise IOError(f"could not open footage file: {path}")
        self.frame_size = width * height * bits_per_pixel // 8

    def write_frame(self, camera: int, payload: bytes):
        assert len(payload) == self.frame_size
        buf = np.frombuffer(payload, dtype=np.uint8)
        rc = self._lib.s360_footage_writer_write(
            self._handle, camera, np.ascontiguousarray(buf).ctypes.data
        )
        if rc != 0:
            raise IOError("footage write failed")

    def close(self):
        if self._handle:
            self._lib.s360_footage_writer_close(self._handle)
            self._handle = None


class NativeRing:
    """SPSC ring buffer (capture producer/consumer decoupling)."""

    def __init__(self, slot_size: int, n_slots: int):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError("native footage library unavailable")
        self._lib = lib
        self._handle = lib.s360_ring_create(slot_size, n_slots)
        self.slot_size = slot_size

    def push(self, data: bytes) -> bool:
        buf = np.frombuffer(data, dtype=np.uint8)
        rc = self._lib.s360_ring_push(
            self._handle, np.ascontiguousarray(buf).ctypes.data, len(data)
        )
        return rc == 0

    def pop(self) -> bytes | None:
        out = np.empty(self.slot_size, dtype=np.uint8)
        n = self._lib.s360_ring_pop(self._handle, out.ctypes.data)
        if n == 0:
            return None
        return out[:n].tobytes()

    def done(self):
        self._lib.s360_ring_done(self._handle)

    def destroy(self):
        if self._handle:
            self._lib.s360_ring_destroy(self._handle)
            self._handle = None
