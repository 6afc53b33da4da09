"""Acoustic material database: per-band absorption / scattering / transmission.

Covers the same material-name surface as the reference's mp3d material config
(reference worldstate.py:918-940 validates names against
resources/mp3d_material_config.json). Coefficients here are standard published
octave-band absorption values (e.g. Vorlander, "Auralization", appendix tables;
Cox & D'Antonio), not copied from the reference's data file. Values are defined at
the six octave centres 125..4000 Hz and interpolated (log-frequency, linear-alpha,
edge-held) to whatever band centres an engine requests.
"""

from __future__ import annotations

from typing import Union

import numpy as np

# Octave band centres the table below is defined at.
TABLE_FREQS = np.array([125.0, 250.0, 500.0, 1000.0, 2000.0, 4000.0])

# name -> (absorption[6], scattering scalar)
# Absorption: standard random-incidence coefficients per octave band.
# Scattering: single broadband estimate of surface roughness.
_TABLE: dict[str, tuple[list[float], float]] = {
    "Default": ([0.10, 0.10, 0.10, 0.10, 0.10, 0.10], 0.5),
    "Acoustic Tile": ([0.50, 0.70, 0.60, 0.70, 0.70, 0.50], 0.2),
    "Brick": ([0.03, 0.03, 0.03, 0.04, 0.05, 0.07], 0.3),
    "Brick, Painted": ([0.01, 0.01, 0.02, 0.02, 0.02, 0.03], 0.2),
    "Carpet": ([0.01, 0.02, 0.06, 0.15, 0.25, 0.45], 0.1),
    "Carpet, Heavy": ([0.02, 0.06, 0.14, 0.37, 0.60, 0.65], 0.15),
    "Carpet, Heavy Padded": ([0.08, 0.24, 0.57, 0.69, 0.71, 0.73], 0.15),
    "Tile, Ceramic": ([0.01, 0.01, 0.01, 0.01, 0.02, 0.02], 0.1),
    "Concrete": ([0.01, 0.01, 0.02, 0.02, 0.02, 0.02], 0.1),
    "Concrete, Rough": ([0.01, 0.02, 0.04, 0.06, 0.08, 0.10], 0.4),
    "Concrete Block": ([0.36, 0.44, 0.31, 0.29, 0.39, 0.25], 0.3),
    "Concrete Block, Painted": ([0.10, 0.05, 0.06, 0.07, 0.09, 0.08], 0.2),
    "Curtain": ([0.07, 0.31, 0.49, 0.75, 0.70, 0.60], 0.3),
    "Foliage": ([0.03, 0.06, 0.11, 0.17, 0.27, 0.31], 0.6),
    "Glass": ([0.35, 0.25, 0.18, 0.12, 0.07, 0.04], 0.05),
    "Glass, Heavy": ([0.18, 0.06, 0.04, 0.03, 0.02, 0.02], 0.05),
    "Grass": ([0.11, 0.26, 0.60, 0.69, 0.92, 0.99], 0.5),
    "Gravel": ([0.25, 0.60, 0.65, 0.70, 0.75, 0.80], 0.6),
    "Gypsum Board": ([0.29, 0.10, 0.05, 0.04, 0.07, 0.09], 0.1),
    "Plaster on Brick": ([0.01, 0.02, 0.02, 0.03, 0.04, 0.05], 0.2),
    "Plaster on Concrete Block": ([0.12, 0.09, 0.07, 0.05, 0.05, 0.04], 0.2),
    "Soil": ([0.15, 0.25, 0.40, 0.55, 0.60, 0.60], 0.5),
    "Sound Proof": ([0.99, 0.99, 0.99, 0.99, 0.99, 0.99], 0.1),
    "Snow": ([0.45, 0.75, 0.90, 0.95, 0.95, 0.95], 0.5),
    "Steel": ([0.05, 0.10, 0.10, 0.10, 0.07, 0.02], 0.1),
    "Water": ([0.01, 0.01, 0.01, 0.02, 0.02, 0.03], 0.1),
    "wood, Thin": ([0.42, 0.21, 0.10, 0.08, 0.06, 0.06], 0.1),
    "wood, Thick": ([0.19, 0.14, 0.09, 0.06, 0.06, 0.05], 0.1),
    "Wood Floor": ([0.15, 0.11, 0.10, 0.07, 0.06, 0.07], 0.1),
    "Wood On Concrete": ([0.04, 0.04, 0.07, 0.06, 0.06, 0.07], 0.1),
}

MATERIALS = {
    name: dict(absorption=np.asarray(alpha), scattering=scatter)
    for name, (alpha, scatter) in _TABLE.items()
}


def material_names() -> list[str]:
    """All valid material names."""
    return list(MATERIALS.keys())


def validate_material(material: Union[str, None]) -> str:
    """Validate a material name, defaulting to "Default" (reference :918-940)."""
    if not material:
        material = "Default"
    if material not in MATERIALS:
        raise ValueError(f"Material {material} is not a valid material.")
    return material


def get_material_absorption(material: Union[str, None], band_freqs: np.ndarray) -> np.ndarray:
    """Absorption coefficients for a material at the requested band centres.

    Log-frequency linear interpolation between table points; clamped at the edges.

    Returns:
        (n_bands,) absorption coefficients in [0, 1].
    """
    material = validate_material(material)
    alpha = MATERIALS[material]["absorption"]
    return np.interp(np.log(np.asarray(band_freqs, dtype=float)), np.log(TABLE_FREQS), alpha)


def get_material_scattering(material: Union[str, None]) -> float:
    """Broadband scattering coefficient for a material."""
    material = validate_material(material)
    return float(MATERIALS[material]["scattering"])


def octave_band_centers(n_bands: int, fmin: float = 125.0, fmax: float = 8000.0) -> np.ndarray:
    """`n_bands` log-spaced band centres spanning [fmin, fmax].

    With n_bands=4 (the engine default, matching the reference rlr config's
    frequency_bands=4) this gives centres near 125 / 500 / 2000 / 8000 Hz.
    """
    return np.geomspace(fmin, fmax, n_bands)
