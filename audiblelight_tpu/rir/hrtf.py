"""Measured-HRTF binaural rendering (SimpleFreeFieldHRIR SOFA sets).

The reference renders its Binaural ChannelLayout through the rlr engine's
measured HRTFs (reference micarrays.py:68-86, :349); this module closes that
capability for the TPU tracer: a SOFA HRIR set (SimpleFreeFieldHRIR — the
standard convention for measured head-related impulse responses) is loaded
once, resampled to the engine rate, and used two ways, mirroring the rlr
direct/indirect split:

- **direct path**: the full HRIR interpolated at the arrival direction is
  applied in the frequency domain at the head-centre delay
  (rir.raytracer._binaural_direct_ir). The measured HRIR carries the true
  ITD, ILD and pinna spectral cues; no analytic head model is involved.
- **stochastic tail**: per-direction, per-band HRTF POWER (|H_ear|^2 averaged
  over each synthesis band) weights the energy histogram deposits — the same
  place the analytic Brown-Duda shadow applied `spherical_head_gains**2`.

Direction interpolation is inverse-angle weighting over the 3 nearest
measured directions (snapping to exact grid points); plain HRIR-domain
blending, which is standard for dense measurement grids and exact on-grid.
The analytic spherical-head model (rir.sh) remains the no-file fallback.

`HRTFSet` is a registered pytree, so it passes straight through `jax.jit`
boundaries (the tracer's `_lazy_jit` wrappers) as a pair of array leaves.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from audiblelight_tpu import config


@jax.tree_util.register_pytree_node_class
class HRTFSet:
    """A measured HRIR set resampled to the engine sample rate.

    Attributes:
        dirs: (M, 3) float32 unit source directions in the listener frame
            (+x front, +y left, +z up — the utils.polar_to_cartesian frame,
            which coincides with the SOFA spherical convention).
        hrirs: (M, 2, N) float32 head-related impulse responses, channel
            order [left, right], at sample rate `sr`.
        sr: engine sample rate the HRIRs are stored at (pytree aux data).
    """

    def __init__(self, dirs, hrirs, sr: int):
        self.dirs = jnp.asarray(dirs, dtype=jnp.float32)
        self.hrirs = jnp.asarray(hrirs, dtype=jnp.float32)
        self.sr = int(sr)

    # -- pytree protocol -----------------------------------------------------
    def tree_flatten(self):
        return (self.dirs, self.hrirs), self.sr

    @classmethod
    def tree_unflatten(cls, sr, children):
        obj = cls.__new__(cls)
        obj.dirs, obj.hrirs = children
        obj.sr = sr
        return obj

    # -- queries (traceable) -------------------------------------------------
    def interp_weights(self, query_dirs: jnp.ndarray, k: int = 3):
        """Inverse-angle weights over the k nearest measured directions.

        Arguments:
            query_dirs: (..., 3) unit receiver->source vectors.

        Returns:
            (idx, w): (..., k) int32 indices into the set and (..., k)
            float32 weights summing to 1. An exact grid match concentrates
            ~all weight on that row (angle floored at ~0.06 deg).
        """
        k = min(int(k), int(self.dirs.shape[0]))
        dots = query_dirs @ self.dirs.T  # (..., M)
        top, idx = jax.lax.top_k(dots, k)
        ang = jnp.arccos(jnp.clip(top, -1.0, 1.0))
        # Inverse-distance-squared weights: an exact grid hit (angle floored
        # at ~0.06 deg) carries >0.9999 of the mass vs typical 5-15 deg grids.
        w = 1.0 / jnp.maximum(ang, 1e-3) ** 2
        return idx, w / jnp.sum(w, axis=-1, keepdims=True)

    def hrirs_at(self, query_dirs: jnp.ndarray) -> jnp.ndarray:
        """HRIRs interpolated at arrival directions: (..., 3) -> (..., 2, N)."""
        idx, w = self.interp_weights(query_dirs)
        return jnp.einsum("...k,...kcn->...cn", w, self.hrirs[idx])

    def band_powers(self, band_freqs: jnp.ndarray) -> jnp.ndarray:
        """Per-direction band-averaged HRTF power: (M, 2, B).

        Each band's power is the mean |H(f)|^2 over the rfft grid under the
        same log-triangular band weighting the tail synthesis filterbank uses
        (rir.raytracer.synthesize_ir_from_histogram), so tail deposits
        weighted by these powers land in the bands that re-synthesise them.
        """
        n = self.hrirs.shape[-1]
        n_freq = n // 2 + 1
        power = jnp.abs(jnp.fft.rfft(self.hrirs, axis=-1)) ** 2  # (M, 2, F)
        w = _band_weights(
            jnp.asarray(band_freqs, dtype=jnp.float32), n_freq, n, self.sr
        )  # (B, F), rows sum to 1
        return jnp.einsum("mcf,bf->mcb", power, w)

    def band_power_at(
        self, query_dirs: jnp.ndarray, band_powers_table: jnp.ndarray
    ) -> jnp.ndarray:
        """Gather+blend a precomputed band_powers() table at arrival
        directions: (..., 3) x (M, 2, B) -> (..., 2, B)."""
        idx, w = self.interp_weights(query_dirs)
        return jnp.einsum("...k,...kcb->...cb", w, band_powers_table[idx])


def _band_weights(band_freqs, n_freq, n_fft, sr):
    """(B, F) normalised log-triangular band weights on the rfft grid —
    the power-complementary interpolation synthesize_ir_from_histogram uses,
    transposed into per-band averaging weights."""
    freqs = jnp.arange(n_freq) * (sr / n_fft)
    n_bands = band_freqs.shape[0]
    if n_bands == 1:
        w = jnp.ones((1, n_freq))
    else:
        logf = jnp.log(jnp.maximum(freqs, 1.0))
        logb = jnp.log(band_freqs)
        idx_hi = jnp.clip(jnp.searchsorted(logb, logf), 1, n_bands - 1)
        idx_lo = idx_hi - 1
        w_hi = jnp.clip(
            (logf - logb[idx_lo]) / jnp.maximum(logb[idx_hi] - logb[idx_lo], 1e-9),
            0.0,
            1.0,
        )
        w = jnp.zeros((n_bands, n_freq))
        w = w.at[idx_lo, jnp.arange(n_freq)].add(1.0 - w_hi)
        w = w.at[idx_hi, jnp.arange(n_freq)].add(w_hi)
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)


# ---------------------------------------------------------------------------
# SOFA I/O
# ---------------------------------------------------------------------------


def sofa_source_dirs(positions: np.ndarray, units: str, pos_type: str) -> np.ndarray:
    """SOFA SourcePosition rows -> (M, 3) unit direction vectors.

    SOFA spherical positions are [azimuth, elevation, radius] with azimuth
    CCW from +x toward +y and elevation up — the same frame as
    utils.polar_to_cartesian. Cartesian rows are normalised directly.
    """
    positions = np.asarray(positions, dtype=np.float64)[:, :3]
    if pos_type.lower().startswith("cart"):
        vecs = positions
    else:
        az, el = positions[:, 0], positions[:, 1]
        if "degree" in units.lower() or not units:
            az, el = np.deg2rad(az), np.deg2rad(el)
        cos_el = np.cos(el)
        vecs = np.stack([cos_el * np.cos(az), cos_el * np.sin(az), np.sin(el)], axis=-1)
    norm = np.linalg.norm(vecs, axis=-1, keepdims=True)
    return (vecs / np.maximum(norm, 1e-12)).astype(np.float32)


@lru_cache(maxsize=8)
def load_hrtf_sofa(path: Union[str, Path], sr: int = config.SAMPLE_RATE) -> HRTFSet:
    """Load a SimpleFreeFieldHRIR SOFA file as an HRTFSet at sample rate `sr`.

    Accepts any SOFA FIR set with 2 receivers (M, 2, N); HRIRs are polyphase
    resampled host-side to the engine rate. Cached per (path, sr) so repeated
    scene renders share one device copy.
    """
    import h5py

    path = Path(path)
    with h5py.File(path, "r") as f:
        ir = np.asarray(f["Data.IR"], dtype=np.float64)  # (M, R, N)
        file_sr = float(np.asarray(f["Data.SamplingRate"]).reshape(-1)[0])
        sp = f["SourcePosition"]

        def _attr_str(value) -> str:
            # Real SOFA files store attrs as bytes/np.bytes_; str(b'...') would
            # yield "b'...'" and silently break the startswith('cart') check.
            if isinstance(value, bytes):
                return value.decode("utf-8", "replace")
            return str(value)

        units = _attr_str(sp.attrs.get("Units", b"degree, degree, metre"))
        pos_type = _attr_str(sp.attrs.get("Type", b"spherical"))
        dirs = sofa_source_dirs(np.asarray(sp), units, pos_type)
    if ir.ndim != 3 or ir.shape[1] != 2:
        raise ValueError(
            f"HRTF SOFA must hold (M, 2, N) FIR data (2 ears); {path} has "
            f"shape {ir.shape}"
        )
    if int(round(file_sr)) != int(sr):
        from audiblelight_tpu.io.audio import resample

        ir = resample(ir, int(round(file_sr)), int(sr))
    return HRTFSet(dirs, ir.astype(np.float32), int(sr))


def write_hrtf_sofa(
    path: Union[str, Path],
    hrirs: np.ndarray,
    azimuths_deg: np.ndarray,
    elevations_deg: np.ndarray,
    sample_rate: float,
    radius_m: float = 1.5,
) -> Path:
    """Write a minimal SimpleFreeFieldHRIR SOFA file (fixture/converter tool).

    Arguments:
        hrirs: (M, 2, N) measured pairs [left, right].
        azimuths_deg / elevations_deg: (M,) SOFA spherical angles (azimuth
            CCW from front toward the left ear, elevation up).
    """
    import h5py

    path = Path(path)
    hrirs = np.asarray(hrirs, dtype=np.float64)
    m, r, n = hrirs.shape
    src = np.stack(
        [
            np.asarray(azimuths_deg, dtype=np.float64),
            np.asarray(elevations_deg, dtype=np.float64),
            np.full(m, float(radius_m)),
        ],
        axis=-1,
    )
    with h5py.File(path, "w") as f:
        f.attrs["Conventions"] = "SOFA"
        f.attrs["SOFAConventions"] = "SimpleFreeFieldHRIR"
        f.attrs["SOFAConventionsVersion"] = "1.0"
        f.attrs["DataType"] = "FIR"
        f.attrs["Title"] = "audiblelight_tpu SimpleFreeFieldHRIR"
        f.create_dataset("Data.IR", data=hrirs)
        f.create_dataset("Data.SamplingRate", data=np.array([float(sample_rate)]))
        f.create_dataset("Data.Delay", data=np.zeros((1, r)))
        ds = f.create_dataset("SourcePosition", data=src)
        ds.attrs["Type"] = "spherical"
        ds.attrs["Units"] = "degree, degree, metre"
        f.create_dataset("ListenerPosition", data=np.zeros((1, 3)))
        f.create_dataset(
            "ReceiverPosition",
            data=np.array([[[0.0], [0.09], [0.0]], [[0.0], [-0.09], [0.0]]]),
        )
        f.create_dataset("ListenerUp", data=np.array([[0.0, 0.0, 1.0]]))
        f.create_dataset("ListenerView", data=np.array([[1.0, 0.0, 0.0]]))
    return path


__all__ = ["HRTFSet", "load_hrtf_sofa", "write_hrtf_sofa", "sofa_source_dirs"]
