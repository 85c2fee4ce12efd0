"""Frame input: native threaded prefetch loader + format helpers.

The reference decodes each camera's video on its own pthread every frame
(grabReadFrame, SL_CoSLAM.cpp:114-133, OpenCV-backed SL_AVIReader). Here
the native C++ loader (native/frameloader.cpp, built on demand with g++,
bound via ctypes) prefetches and resizes frames on one worker thread per
camera into a ring buffer, so host decode overlaps device compute.

Sources: CSRW raw grayscale files (written by ``write_raw_sequence``) or
binary PGM file patterns. ``VideoFileSource`` converts arbitrary videos
to CSRW via cv2 when available (gated import).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libframeloader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "frameloader.cpp")
_build_lock = threading.Lock()
_lib = None


def _build_native() -> str | None:
    with _build_lock:
        if os.path.exists(_SO_PATH) and \
                os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH):
            return _SO_PATH
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC_PATH,
                 "-o", _SO_PATH], check=True, capture_output=True)
            return _SO_PATH
        except (OSError, subprocess.CalledProcessError):
            return None


def native_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _build_native()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.fl_open.restype = ctypes.c_void_p
    lib.fl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.c_int]
    lib.fl_open_at.restype = ctypes.c_void_p
    lib.fl_open_at.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                               ctypes.POINTER(ctypes.c_long), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.fl_src_size.restype = ctypes.c_int
    lib.fl_src_size.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.POINTER(ctypes.c_int),
                                ctypes.POINTER(ctypes.c_int)]
    lib.fl_frame_count.restype = ctypes.c_long
    lib.fl_frame_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.fl_close.restype = None
    lib.fl_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


MODE_RAW = 0
MODE_PGM = 1


def write_raw_sequence(path: str, frames: np.ndarray):
    """frames: [F, H, W] u8 -> CSRW file."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    F, H, W = frames.shape
    with open(path, "wb") as f:
        f.write(b"CSRW")
        f.write(np.array([W, H, F], np.uint32).tobytes())
        f.write(frames.tobytes())


class FrameLoader:
    """Threaded multi-camera loader. Yields [C, H, W] float32 frames."""

    def __init__(self, paths: list[str], mode: int = MODE_RAW,
                 out_hw: tuple[int, int] | None = None, ring: int = 4,
                 start_frames: list[int] | None = None):
        self.paths = paths
        self.n_cams = len(paths)
        lib = native_lib()
        self._native = lib is not None
        out_h, out_w = out_hw if out_hw else (0, 0)
        starts = start_frames or [0] * self.n_cams
        if self._native:
            arr = (ctypes.c_char_p * self.n_cams)(
                *[p.encode() for p in paths])
            sarr = (ctypes.c_long * self.n_cams)(*starts)
            self._h = lib.fl_open_at(arr, sarr, self.n_cams, mode, out_w,
                                     out_h, ring)
            if not self._h:
                raise IOError(f"native loader failed to open {paths}")
            w = ctypes.c_int()
            h = ctypes.c_int()
            lib.fl_src_size(self._h, 0, ctypes.byref(w), ctypes.byref(h))
            self.hw = (out_h, out_w) if out_hw else (h.value, w.value)
            self._lib = lib
        else:
            # pure-python fallback (no prefetch): CSRW only
            assert mode == MODE_RAW, "python fallback supports raw files only"
            self._files = []
            for p in paths:
                with open(p, "rb") as f:
                    hdr = f.read(16)
                    assert hdr[:4] == b"CSRW"
                    w, h, n = np.frombuffer(hdr[4:], np.uint32)
                data = np.memmap(p, np.uint8, "r", offset=16,
                                 shape=(int(n), int(h), int(w)))
                self._files.append(data)
            self.hw = out_hw or self._files[0].shape[1:]
            self._idx = 0
            self._starts = starts

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        h, w = self.hw
        if self._native:
            out = np.empty((self.n_cams, h, w), np.uint8)
            ok = self._lib.fl_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            if not ok:
                raise StopIteration
            return out.astype(np.float32)
        frames = []
        for c, data in enumerate(self._files):
            src = self._idx + self._starts[c]
            if src >= data.shape[0]:
                raise StopIteration
            fr = np.asarray(data[src], np.float32)
            if fr.shape != (h, w):
                ys = (np.arange(h) * fr.shape[0] // h)
                xs = (np.arange(w) * fr.shape[1] // w)
                fr = fr[ys][:, xs]
            frames.append(fr)
        self._idx += 1
        return np.stack(frames)

    def close(self):
        if self._native and self._h:
            self._lib.fl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def convert_video_to_raw(video_path: str, out_path: str,
                         max_frames: int | None = None) -> int:
    """Decode an arbitrary video to CSRW grayscale via cv2 (gated)."""
    try:
        import cv2
    except ImportError as e:
        raise RuntimeError("cv2 not available for video decoding") from e
    cap = cv2.VideoCapture(video_path)
    frames = []
    while True:
        ok, img = cap.read()
        if not ok or (max_frames and len(frames) >= max_frames):
            break
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        frames.append(gray)
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {video_path}")
    write_raw_sequence(out_path, np.stack(frames))
    return len(frames)
