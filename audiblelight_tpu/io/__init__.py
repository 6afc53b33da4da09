"""Host-side I/O: audio files (WAV), mesh files (GLB/OBJ/PLY), SOFA (HDF5) RIRs.

All I/O stays on the host CPU; arrays are handed to the JAX device path as numpy.
"""

from audiblelight_tpu.io.audio import (
    get_duration,
    load_audio,
    valid_audio,
    wav_read,
    wav_write,
)

__all__ = [
    "wav_read",
    "wav_write",
    "get_duration",
    "load_audio",
    "valid_audio",
]
