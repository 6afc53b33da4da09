"""audiblelight_tpu: TPU-native spatial soundscape synthesis.

A from-scratch JAX/XLA framework with the capabilities of AudibleLight: place
static and moving sound events and microphone arrays inside 3D acoustic
environments (ray-traced meshes, parametric shoebox rooms, or measured SOFA
RIRs), render multichannel spatial audio with time-varying convolution on TPU,
and emit DCASE-format SELD annotations, acoustic images, and video.
"""

__version__ = "0.1.0"

from audiblelight_tpu.ambience import Ambience
from audiblelight_tpu.core import Scene
from audiblelight_tpu.event import Event
from audiblelight_tpu.micarrays import MicArray
from audiblelight_tpu.worldstate import WorldState

__all__ = ["Scene", "Event", "Ambience", "MicArray", "WorldState", "__version__"]
