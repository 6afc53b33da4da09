"""World-state backends: ray-traced mesh, measured SOFA RIRs, parametric shoebox.

Mirrors the reference registry surface (reference worldstate.py:3113-3131): the
same class names and `name` keys ("RLR", "SOFA", "SHOEBOX") resolve via
get_worldstate_from_string, so serialized scenes are interchangeable. Unlike the
reference, the SHOEBOX backend is fully implemented (JAX image-source engine).
"""

from typing import Type, TypeVar

from audiblelight_tpu.worldstate.base import Emitter, WorldState
from audiblelight_tpu.worldstate.mesh_backend import WorldStateRLR
from audiblelight_tpu.worldstate.shoebox_backend import WorldStateShoebox
from audiblelight_tpu.worldstate.sofa_backend import WorldStateSOFA

WORLDSTATE_LIST = [WorldStateRLR, WorldStateSOFA, WorldStateShoebox]

TWorldState = TypeVar("TWorldState", bound="WorldState")

VALID_MOVING_EVENT_TRAJECTORIES = [
    "linear",
    "semicircular",
    "sine",
    "sawtooth",
    "random",
]


def get_worldstate_from_string(worldstate_name: str) -> Type[TWorldState]:
    """Resolve "rlr" / "sofa" / "shoebox" (case-insensitive) to a WorldState type."""
    acceptable = [ws.name for ws in WORLDSTATE_LIST]
    if worldstate_name.upper() not in acceptable:
        raise ValueError(
            f"Cannot find backend {worldstate_name}: expected one of {', '.join(acceptable)}"
        )
    return next(ws for ws in WORLDSTATE_LIST if ws.name == worldstate_name.upper())


__all__ = [
    "Emitter",
    "WorldState",
    "WorldStateRLR",
    "WorldStateSOFA",
    "WorldStateShoebox",
    "WORLDSTATE_LIST",
    "VALID_MOVING_EVENT_TRAJECTORIES",
    "get_worldstate_from_string",
]
