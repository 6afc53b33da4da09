"""SOFA (Spatially Oriented Format for Acoustics) file I/O via h5py.

SOFA files are netCDF-4 containers (HDF5 underneath), so h5py reads them directly —
replacing the reference's pysofaconventions dependency (reference worldstate.py:20,
:2522-2538). Provides the variable surface the SOFA backend needs (Data.IR,
SourcePosition, ListenerPosition, ReceiverPosition, Data.SamplingRate, global
attributes) plus a writer used to build test fixtures and convert measured-RIR
datasets.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def _require_h5py():
    if h5py is None:  # pragma: no cover
        raise ImportError("h5py is required for SOFA file support")


class SOFAFile:
    """Read-only view of a SOFA file's variables and attributes."""

    def __init__(self, path: Union[str, Path]):
        _require_h5py()
        self.path = Path(path)
        self._f = h5py.File(self.path, "r")

    # -- context manager ----------------------------------------------------
    def __enter__(self) -> "SOFAFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def close(self) -> None:
        self._f.close()

    # -- accessors ----------------------------------------------------------
    def is_valid(self) -> bool:
        """Minimal validity: conventions attribute + IR data present."""
        try:
            return "Data.IR" in self._f and "SourcePosition" in self._f
        except Exception:  # pragma: no cover
            return False

    def get_global_attributes(self) -> dict:
        """All root-level global attributes as str->str."""
        out = {}
        for k, v in self._f.attrs.items():
            if isinstance(v, bytes):
                v = v.decode("utf-8", errors="replace")
            elif isinstance(v, np.ndarray) and v.dtype.kind in ("S", "U"):
                v = str(v.item()) if v.size == 1 else [str(x) for x in v]
            out[str(k)] = v
        return out

    def get_variable(self, name: str) -> np.ndarray:
        if name not in self._f:
            raise KeyError(f"Variable '{name}' not found in SOFA file {self.path}")
        return np.asarray(self._f[name])

    @property
    def data_ir(self) -> np.ndarray:
        """(M, R, N) IR data: measurements x receivers x samples."""
        return self.get_variable("Data.IR")

    @property
    def sampling_rate(self) -> float:
        sr = self.get_variable("Data.SamplingRate")
        return float(np.asarray(sr).reshape(-1)[0])

    @property
    def source_positions(self) -> np.ndarray:
        """(M, 3) source positions."""
        return self.get_variable("SourcePosition")[:, :3]

    @property
    def listener_positions(self) -> np.ndarray:
        """(M, 3) listener positions (may be constant rows)."""
        lp = self.get_variable("ListenerPosition")
        if lp.ndim == 1:
            lp = lp[None, :]
        # Broadcast a single listener row to M measurements
        m = self.data_shape[0]
        if lp.shape[0] == 1 and m > 1:
            lp = np.repeat(lp, m, axis=0)
        return lp[:, :3]

    @property
    def receiver_positions(self) -> np.ndarray:
        """(R, 3) receiver (capsule) positions relative to the listener."""
        rp = self.get_variable("ReceiverPosition")
        rp = np.asarray(rp)
        # SOFA stores (R, C, I) or (R, C); squeeze trailing singleton
        if rp.ndim == 3:
            rp = rp[:, :, 0]
        return rp[:, :3]

    @property
    def data_shape(self) -> tuple:
        return tuple(self._f["Data.IR"].shape)


def write_sofa(
    path: Union[str, Path],
    irs: np.ndarray,
    source_positions: np.ndarray,
    listener_position: np.ndarray,
    receiver_positions: np.ndarray,
    sample_rate: float,
    listener_short_name: str = "mic",
    conventions: str = "SingleRoomSRIR",
    extra_attrs: Optional[dict] = None,
) -> Path:
    """Write a minimal SingleRoomSRIR-style SOFA file.

    Arguments:
        irs: (M, R, N) array of IRs (measurements x receivers x samples).
        source_positions: (M, 3) cartesian source positions.
        listener_position: (3,) or (M, 3) listener position(s).
        receiver_positions: (R, 3) capsule offsets relative to the listener.
    """
    _require_h5py()
    path = Path(path)
    irs = np.asarray(irs, dtype=np.float64)
    m, r, n = irs.shape
    listener_position = np.atleast_2d(np.asarray(listener_position, dtype=np.float64))

    with h5py.File(path, "w") as f:
        f.attrs["Conventions"] = "SOFA"
        f.attrs["SOFAConventions"] = conventions
        f.attrs["SOFAConventionsVersion"] = "1.0"
        f.attrs["DataType"] = "FIR"
        f.attrs["ListenerShortName"] = listener_short_name
        f.attrs["Title"] = f"audiblelight_tpu {conventions}"
        for k, v in (extra_attrs or {}).items():
            f.attrs[k] = v

        f.create_dataset("Data.IR", data=irs)
        f.create_dataset("Data.SamplingRate", data=np.array([float(sample_rate)]))
        f.create_dataset("Data.Delay", data=np.zeros((1, r)))
        f.create_dataset(
            "SourcePosition", data=np.asarray(source_positions, dtype=np.float64)
        )
        f.create_dataset(
            "ListenerPosition",
            data=np.broadcast_to(listener_position, (m, 3)).copy(),
        )
        f.create_dataset(
            "ReceiverPosition",
            data=np.asarray(receiver_positions, dtype=np.float64)[:, :, None],
        )
        f.create_dataset("ListenerUp", data=np.tile([[0.0, 0.0, 1.0]], (m, 1)))
        f.create_dataset("ListenerView", data=np.tile([[1.0, 0.0, 0.0]], (m, 1)))
    return path
