"""Real-codec video IO: H.264 MP4 writing + any-format decode, via a thin C
shim (cpp/h264mux.c) over the system FFmpeg libraries (libavformat/libavcodec/
libx264), bound with ctypes.

This is the codec path the reference gets from OpenCV's ``VideoWriter``
(reference synthesize.py:1202-1280). The dependency-free MJPEG muxers
(io/mp4.py, io/avi.py) remain as fallbacks when the native shim or FFmpeg
libraries are unavailable; ``synthesize.generate_scene_video_from_events``
prefers H.264 automatically.

The reader side decodes anything libavformat can open (including our own
MJPEG-AVI/MP4) back to RGB24 arrays — used by the tests to round-trip encoded
video without OpenCV.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Iterable, Iterator, Tuple, Union

import numpy as np

from audiblelight_tpu.utils import logger

_LIB = None
_LIB_FAILED = False
_SRC = Path(__file__).resolve().parents[2] / "cpp" / "h264mux.c"
_SO = Path(__file__).resolve().parents[2] / "cpp" / "libh264mux.so"
_BUILD = [
    "gcc", "-O2", "-shared", "-fPIC", "-o", str(_SO), str(_SRC),
    "-lavformat", "-lavcodec", "-lavutil",
]


def _load():
    """Compile (if needed) and load the shim; None when unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    try:
        # Content-hash staleness + WARNING on a stale prebuilt fallback
        from audiblelight_tpu.utils import ensure_native_lib

        ensure_native_lib(_SRC, _SO, _BUILD)
        lib = ctypes.CDLL(str(_SO))
        lib.h264_writer_open.restype = ctypes.c_void_p
        lib.h264_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.h264_writer_write.restype = ctypes.c_int
        lib.h264_writer_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.h264_writer_close.restype = ctypes.c_int
        lib.h264_writer_close.argtypes = [ctypes.c_void_p]
        lib.video_reader_open.restype = ctypes.c_void_p
        lib.video_reader_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
        ]
        lib.video_reader_next.restype = ctypes.c_int
        lib.video_reader_next.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.video_reader_close.restype = None
        lib.video_reader_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib
    except Exception as exc:  # missing libav, no gcc, ...
        _LIB_FAILED = True
        logger.warning(f"H.264 shim unavailable ({exc}); MJPEG fallback in use")
        return None


def h264_available() -> bool:
    """True when the native H.264 encoder shim can be built and loaded."""
    return _load() is not None


def _as_rgb_array(frame) -> np.ndarray:
    if isinstance(frame, np.ndarray):
        arr = frame
    else:  # PIL Image
        if frame.mode != "RGB":
            frame = frame.convert("RGB")
        arr = np.asarray(frame)
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB frame, got {arr.shape}")
    return arr


def write_h264_mp4(
    path: Union[str, Path],
    frames: Iterable,
    fps: int,
    crf: int = 20,
) -> Path:
    """Write RGB frames (PIL Images or HxWx3 uint8 arrays) as an H.264 MP4.

    Odd frame dimensions are padded by one edge-replicated row/column (4:2:0
    chroma needs even sizes). Raises RuntimeError when the native shim is
    unavailable — callers (synthesize) fall back to ``write_mjpeg_mp4``.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("H.264 encoder shim unavailable")
    path = Path(path)
    wr = None
    w = h = None
    try:
        for frame in frames:
            arr = _as_rgb_array(frame)
            if arr.shape[0] % 2:
                arr = np.concatenate([arr, arr[-1:]], axis=0)
            if arr.shape[1] % 2:
                arr = np.concatenate([arr, arr[:, -1:]], axis=1)
            if wr is None:
                h, w = arr.shape[:2]
                wr = lib.h264_writer_open(
                    str(path).encode(), w, h, int(fps), 1, int(crf)
                )
                if not wr:
                    raise RuntimeError("h264_writer_open failed")
            elif arr.shape[:2] != (h, w):
                raise ValueError(
                    f"Frame size {arr.shape[:2]} != first frame {(h, w)}"
                )
            if lib.h264_writer_write(wr, arr.tobytes()) < 0:
                raise RuntimeError("h264_writer_write failed")
        if wr is None:
            raise ValueError("No frames to write")
    except Exception:
        if wr is not None:
            lib.h264_writer_close(wr)
            wr = None
        raise
    if lib.h264_writer_close(wr) < 0:
        raise RuntimeError("h264_writer_close failed")
    return path


def read_video_frames(
    path: Union[str, Path],
) -> Tuple[Iterator[np.ndarray], int, int, float]:
    """Open a video and return (frame_iterator, width, height, fps).

    Decodes any container/codec the system libavformat understands (H.264 MP4,
    our MJPEG MP4/AVI, ...) to HxWx3 uint8 RGB arrays.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("video decoder shim unavailable")
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    fps = ctypes.c_double(0.0)
    rd = lib.video_reader_open(str(Path(path)).encode(), w, h, fps)
    if not rd:
        raise RuntimeError(f"could not open video {path}")

    width, height = int(w.value), int(h.value)
    # The generator's finally only runs once iteration STARTS; callers that
    # open a file just for metadata would otherwise leak the demuxer/decoder
    # contexts and the fd. The finalizer closes on garbage collection too,
    # and is idempotent with the generator's own close.
    import weakref

    closed = {"done": False}

    def _close():
        if not closed["done"]:
            closed["done"] = True
            lib.video_reader_close(rd)

    def _iter():
        buf = ctypes.create_string_buffer(width * height * 3)
        try:
            while True:
                ret = lib.video_reader_next(rd, buf)
                if ret == 0:
                    return
                if ret < 0:
                    raise RuntimeError(f"decode error {ret} in {path}")
                yield np.frombuffer(
                    buf.raw, dtype=np.uint8
                ).reshape(height, width, 3).copy()
        finally:
            _close()

    it = _iter()
    weakref.finalize(it, _close)
    return it, width, height, float(fps.value)


__all__ = ["h264_available", "write_h264_mp4", "read_video_frames"]
