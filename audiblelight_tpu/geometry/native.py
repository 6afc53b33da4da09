"""ctypes bindings for the native BVH geometry library (cpp/geomlib.cpp).

Builds the shared library on first use (g++ -O3) and exposes the same query
surface as the JAX kernels for host-side callers. The placement rejection loop
issues many tiny batches, where a BVH on the host beats a device round-trip;
bulk batched queries stay on device.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from audiblelight_tpu.utils import logger

_LIB = None
_LIB_FAILED = False
_SRC = Path(__file__).resolve().parents[2] / "cpp" / "geomlib.cpp"
_SO = Path(__file__).resolve().parents[2] / "cpp" / "libgeom.so"


def _load() -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load the native library; None when unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None:
        return _LIB
    if _LIB_FAILED:
        return None
    try:
        # Content-hash staleness + WARNING on a stale prebuilt fallback
        from audiblelight_tpu.utils import ensure_native_lib

        ensure_native_lib(
            _SRC, _SO, ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)]
        )
        lib = ctypes.CDLL(str(_SO))
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.geom_build.argtypes = [f32p, ctypes.c_int32]
        lib.geom_build.restype = ctypes.c_int32
        lib.geom_free.argtypes = [ctypes.c_int32]
        lib.geom_contains.argtypes = [ctypes.c_int32, f32p, ctypes.c_int32, u8p]
        lib.geom_nearest.argtypes = [ctypes.c_int32, f32p, ctypes.c_int32, f32p]
        lib.geom_raycast.argtypes = [ctypes.c_int32, f32p, f32p, ctypes.c_int32, f32p, i32p]
        lib.geom_occluded.argtypes = [
            ctypes.c_int32, f32p, f32p, ctypes.c_int32, ctypes.c_float, u8p,
        ]
        _LIB = lib
        return _LIB
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError) as e:
        logger.warning(f"Native geometry library unavailable ({e}); using device kernels only")
        _LIB_FAILED = True
        return None


def native_available() -> bool:
    """True when the native library can be built/loaded."""
    return _load() is not None


def _f32(a: np.ndarray):
    a = np.ascontiguousarray(a, dtype=np.float32)
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeBVH:
    """BVH over a triangle soup with batched host-side queries."""

    def __init__(self, triangles: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("Native geometry library is unavailable")
        self._lib = lib
        tris, ptr = _f32(triangles.reshape(-1, 9))
        self._keepalive = tris
        self.n_tris = len(tris)
        self.handle = lib.geom_build(ptr, self.n_tris)
        if self.handle < 0:
            raise RuntimeError("BVH build failed")

    def contains(self, points: np.ndarray) -> np.ndarray:
        """(N,) bool: ray-parity inside test."""
        pts, ptr = _f32(np.atleast_2d(points))
        out = np.zeros(len(pts), dtype=np.uint8)
        self._lib.geom_contains(
            self.handle, ptr, len(pts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        return out.astype(bool)

    def nearest_surface_distance(self, points: np.ndarray) -> np.ndarray:
        """(N,) float: distance to the nearest surface point."""
        pts, ptr = _f32(np.atleast_2d(points))
        out = np.zeros(len(pts), dtype=np.float32)
        self._lib.geom_nearest(
            self.handle, ptr, len(pts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    def ray_first_hit(self, origins: np.ndarray, dirs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(N,) t (inf = miss) and (N,) triangle ids (-1 = miss)."""
        o, optr = _f32(np.atleast_2d(origins))
        d, dptr = _f32(np.atleast_2d(dirs))
        t = np.zeros(len(o), dtype=np.float32)
        ids = np.zeros(len(o), dtype=np.int32)
        self._lib.geom_raycast(
            self.handle, optr, dptr, len(o),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return t, ids

    def segments_occluded(
        self, starts: np.ndarray, ends: np.ndarray, margin: float = 1e-4
    ) -> np.ndarray:
        """(N,) bool: open segment blocked by the mesh."""
        s, sptr = _f32(np.atleast_2d(starts))
        e, eptr = _f32(np.atleast_2d(ends))
        out = np.zeros(len(s), dtype=np.uint8)
        self._lib.geom_occluded(
            self.handle, sptr, eptr, len(s), ctypes.c_float(margin),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out.astype(bool)

    def __del__(self):  # pragma: no cover - interpreter-shutdown safe
        try:
            self._lib.geom_free(self.handle)
        except Exception:
            pass
