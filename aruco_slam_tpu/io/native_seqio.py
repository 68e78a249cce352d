"""ctypes bindings for the native seqio library (native/seqio/seqio.cpp).

Builds on first use (g++ via cmake or directly) into ``native/build``;
``is_available()`` gates callers so pure-Python environments keep working.
This is the framework's native data-loader path — mmap'd container +
threaded prefetch — replacing the reference's cv_bridge/image_transport
C++ plumbing (reference src/aruco_slam_node.cpp:93-101).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..")
_SRC = os.path.abspath(os.path.join(_ROOT, "native", "seqio"))
_BUILD = os.path.abspath(os.path.join(_ROOT, "native", "build"))
_LIB_PATH = os.path.join(_BUILD, "libseqio.so")

_lib = None
_lock = threading.Lock()


def _build() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    src = os.path.join(_SRC, "seqio.cpp")
    try:
        subprocess.run(
            [
                "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
                src, "-o", _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.seq_write.restype = ctypes.c_int
        lib.seq_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_uint32,
        ]
        lib.seq_open.restype = ctypes.c_void_p
        lib.seq_open.argtypes = [ctypes.c_char_p]
        lib.seq_info.restype = ctypes.c_int
        lib.seq_info.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_uint32)
        ] * 3
        lib.seq_verify.restype = ctypes.c_int
        lib.seq_verify.argtypes = [ctypes.c_void_p]
        lib.seq_read_frame.restype = ctypes.c_int
        lib.seq_read_frame.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p
        ]
        lib.seq_close.argtypes = [ctypes.c_void_p]
        lib.seq_prefetch_start.restype = ctypes.c_void_p
        lib.seq_prefetch_start.argtypes = [
            ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.c_uint32, ctypes.c_int,
        ]
        lib.seq_prefetch_next.restype = ctypes.c_long
        lib.seq_prefetch_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.seq_prefetch_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def write_frames(path: str, frames: np.ndarray) -> None:
    """frames: [N, H, W] uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native seqio unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w = frames.shape
    rc = lib.seq_write(
        path.encode(), frames.ctypes.data_as(ctypes.c_void_p), n, h, w
    )
    if rc != 0:
        raise IOError(f"seq_write failed: {rc}")


class NativeSequenceReader:
    """mmap-backed reader with optional threaded prefetch iteration."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native seqio unavailable")
        self._lib = lib
        self._h = lib.seq_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        n = ctypes.c_uint32()
        hh = ctypes.c_uint32()
        ww = ctypes.c_uint32()
        lib.seq_info(self._h, ctypes.byref(n), ctypes.byref(hh), ctypes.byref(ww))
        self.n_frames = n.value
        self.height = hh.value
        self.width = ww.value

    def verify(self) -> bool:
        return self._lib.seq_verify(self._h) == 0

    def read(self, idx: int) -> np.ndarray:
        out = np.empty((self.height, self.width), np.uint8)
        rc = self._lib.seq_read_frame(
            self._h, idx, out.ctypes.data_as(ctypes.c_void_p)
        )
        if rc != 0:
            raise IndexError(idx)
        return out

    def iter_prefetched(self, start: int = 0, end: int | None = None,
                        queue: int = 8, threads: int = 2):
        """Yield (idx, frame) in order with background prefetch."""
        end = self.n_frames if end is None else end
        pf = self._lib.seq_prefetch_start(self._h, start, end, queue, threads)
        if not pf:
            raise RuntimeError("prefetch_start failed")
        try:
            out = np.empty((self.height, self.width), np.uint8)
            while True:
                idx = self._lib.seq_prefetch_next(
                    pf, out.ctypes.data_as(ctypes.c_void_p)
                )
                if idx < 0:
                    break
                yield int(idx), out.copy()
        finally:
            self._lib.seq_prefetch_stop(pf)

    def close(self):
        if self._h:
            self._lib.seq_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
