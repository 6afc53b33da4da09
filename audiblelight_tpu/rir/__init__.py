"""RIR engines: analytic shoebox image-source + stochastic mesh ray tracer (JAX).

TPU-native replacements for the reference's C++ `rlr-audio-propagation` engine
(reference worldstate.py:942-973, :2148-2255) and for the pyroomacoustics shoebox
the reference stubs out (worldstate.py:3105-3110). Both engines emit IR banks shaped
(n_channels, n_emitters, ir_len) directly as device arrays.
"""

from audiblelight_tpu.rir.image_source import shoebox_rirs
from audiblelight_tpu.rir.materials import (
    MATERIALS,
    get_material_absorption,
    material_names,
)
from audiblelight_tpu.rir.sh import foa_encoding_gains, sh_real

__all__ = [
    "shoebox_rirs",
    "sh_real",
    "foa_encoding_gains",
    "MATERIALS",
    "material_names",
    "get_material_absorption",
]
