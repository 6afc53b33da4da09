"""Parametric shoebox backend (`WorldStateShoebox`): analytic image-source rooms.

The reference declares this backend but never implements it (reference
worldstate.py:3105-3110 is an empty stub; pyroomacoustics was the intended engine,
pyproject.toml:41). Here it is a full backend: a rectangular room with per-wall
(optionally per-band) absorption, placement/trajectory logic shared with the mesh
backend, and RIR generation via the JAX frequency-domain image-source engine
(audiblelight_tpu.rir.image_source).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Optional, Union

import jax.numpy as jnp
import numpy as np

from audiblelight_tpu import config, custom_types, utils
from audiblelight_tpu.geometry import box_mesh
from audiblelight_tpu.micarrays import MicArray
from audiblelight_tpu.rir.image_source import shoebox_rirs
from audiblelight_tpu.rir.materials import get_material_absorption, octave_band_centers
from audiblelight_tpu.worldstate.base import WorldState
from audiblelight_tpu.worldstate.placement import PlacementMixin

WALL_ORDER = ["x0", "xL", "y0", "yL", "z0", "zL"]


class WorldStateShoebox(PlacementMixin, WorldState):
    """A WorldState simulating a parametric rectangular ("shoebox") room."""

    name = "SHOEBOX"

    def __init__(
        self,
        dimensions: Union[list, np.ndarray] = (6.0, 4.0, 3.0),
        sample_rate: Optional[custom_types.Numeric] = config.SAMPLE_RATE,
        absorption: Union[float, dict, list, np.ndarray, str] = 0.3,
        max_order: int = 12,
        max_ir_length: Optional[float] = config.MAX_IR_SECONDS,
        frequency_bands: int = config.RAY_TRACER_FREQUENCY_BANDS,
        empty_space_around_mic: Optional[custom_types.Numeric] = config.EMPTY_SPACE_AROUND_MIC,
        empty_space_around_emitter: Optional[
            custom_types.Numeric
        ] = config.EMPTY_SPACE_AROUND_EMITTER,
        empty_space_around_surface: Optional[
            custom_types.Numeric
        ] = config.EMPTY_SPACE_AROUND_SURFACE,
        empty_space_around_capsule: Optional[
            custom_types.Numeric
        ] = config.EMPTY_SPACE_AROUND_CAPSULE,
        add_to_context: Optional[bool] = True,
        seed: Optional[int] = None,
    ):
        """Initialise the shoebox room.

        Arguments:
            dimensions: (Lx, Ly, Lz) in metres; the room spans [0, L] per axis.
            absorption: scalar alpha for all walls; a material name (str); a (6,)
                per-wall array (order x0,xL,y0,yL,z0,zL); a (6, B) per-wall-per-band
                array; or a dict {wall_name: alpha | material_name}.
            max_order: image-source reflection order per axis.
        """
        super().__init__()
        self.add_to_state = add_to_context
        self.sample_rate = utils.sanitise_positive_number(sample_rate, cast_to=int)
        self.rng = np.random.default_rng(seed)

        self.dimensions = np.asarray(dimensions, dtype=float)
        if self.dimensions.shape != (3,) or np.any(self.dimensions <= 0):
            raise ValueError(f"Expected 3 positive room dimensions, got {dimensions}")

        self.max_order = int(max_order)
        self.max_ir_length = float(max_ir_length)
        self.frequency_bands = int(frequency_bands)
        self.band_freqs = octave_band_centers(self.frequency_bands)
        self.absorption_input = absorption
        self.absorption = self._parse_absorption(absorption)  # (6, B)

        self.empty_space_around_mic = utils.sanitise_positive_number(empty_space_around_mic)
        self.empty_space_around_surface = utils.sanitise_positive_number(
            empty_space_around_surface
        )
        self.empty_space_around_emitter = utils.sanitise_positive_number(
            empty_space_around_emitter
        )
        self.empty_space_around_capsule = utils.sanitise_positive_number(
            empty_space_around_capsule
        )

        # A generated mesh keeps the viz/serialisation surface consistent with the
        # mesh backend.
        self.mesh = box_mesh(extents=self.dimensions, center=self.dimensions / 2)
        self.waypoints = []
        self.ctx = None

    def _parse_absorption(self, absorption) -> np.ndarray:
        """Coerce any accepted absorption spec into a (6, B) array."""
        b = self.frequency_bands
        if isinstance(absorption, str):
            alpha_b = get_material_absorption(absorption, self.band_freqs)
            return np.tile(alpha_b[None, :], (6, 1))
        if isinstance(absorption, dict):
            rows = []
            for wall in WALL_ORDER:
                v = absorption.get(wall, 0.3)
                if isinstance(v, str):
                    rows.append(get_material_absorption(v, self.band_freqs))
                else:
                    rows.append(np.full(b, float(v)))
            return np.stack(rows)
        arr = np.asarray(absorption, dtype=float)
        if arr.ndim == 0:
            return np.full((6, b), float(arr))
        if arr.ndim == 1:
            if arr.shape[0] != 6:
                raise ValueError("Per-wall absorption must have 6 entries")
            return np.tile(arr[:, None], (1, b))
        if arr.shape[0] != 6:
            raise ValueError("Per-wall-per-band absorption must be (6, B)")
        return arr

    # ------------------------------------------------------------------
    # Geometry (analytic — the room is a box)
    # ------------------------------------------------------------------

    @property
    def bounds(self) -> np.ndarray:
        return np.stack([np.zeros(3), self.dimensions])

    def _get_valid_positions_mask(self, pos_abs: np.ndarray) -> np.ndarray:
        positions = utils.coerce2d(np.asarray(pos_abs, dtype=np.float64))
        if positions.shape[1] != 3:
            raise ValueError("Expected input to have shape (N, 3) for XYZ coordinates")
        valid = self._distance_mask(positions)
        # Inside the room with surface margin, computed in closed form
        margin = self.empty_space_around_surface
        valid &= np.all(positions >= margin, axis=1)
        valid &= np.all(positions <= self.dimensions - margin, axis=1)
        return valid

    def path_exists_between_points(self, point_a, point_b) -> bool:
        """A shoebox is convex: any two interior points see each other."""
        a = np.asarray(point_a, dtype=float)
        bb = np.asarray(point_b, dtype=float)
        inside = all(np.all(p >= 0) and np.all(p <= self.dimensions) for p in (a, bb))
        return bool(inside)

    def _update(self) -> None:
        self._update_relative_coordinates()

    # ------------------------------------------------------------------
    # Simulation
    # ------------------------------------------------------------------

    def _simulation_sanity_check(self) -> None:
        assert self.num_emitters > 0, "Must have added valid emitters before calling `simulate`!"
        assert len(self.microphones) > 0, "Must have added microphones before calling `simulate`!"

    def simulate(self) -> None:
        """Compute image-source RIRs for all (microphone, emitter) pairs."""
        self._update()
        self._simulation_sanity_check()
        self._irs = self.get_irs()

    def _emitter_positions(self) -> np.ndarray:
        coords = [e.coordinates_absolute for lst in self.emitters.values() for e in lst]
        return np.stack(coords) if coords else np.zeros((0, 3))

    def get_irs(self) -> OrderedDict[str, np.ndarray]:
        """{mic_alias: (n_capsules, n_emitters, n_samples)} via the ISM engine."""
        beta = np.sqrt(np.clip(1.0 - self.absorption, 1e-6, 1.0))
        log_beta = jnp.asarray(np.log(beta), dtype=jnp.float32)
        band_freqs = jnp.asarray(self.band_freqs, dtype=jnp.float32)
        sources = jnp.asarray(self._emitter_positions(), dtype=jnp.float32)
        n_samples = int(round(self.max_ir_length * self.sample_rate))

        out = OrderedDict()
        for alias, mic in self.microphones.items():
            if mic.channel_layout_type == "mic":
                listeners = jnp.asarray(
                    utils.coerce2d(mic.coordinates_absolute), dtype=jnp.float32
                )
                encoding = "omni"
            else:
                listeners = jnp.asarray(
                    utils.coerce2d(mic.coordinates_center), dtype=jnp.float32
                )
                encoding = {
                    "foa": "foa", "hoa2": "sh2", "hoa3": "sh3",
                }.get(mic.channel_layout_type, "binaural")

            # Measured-HRTF binaural (micarrays.Binaural.hrtf_sofa; rir.hrtf)
            hrtf = None
            if encoding == "binaural" and getattr(mic, "hrtf_sofa", None):
                hrtf = mic.load_hrtf(self.sample_rate)

            irs = shoebox_rirs(
                jnp.asarray(self.dimensions, dtype=jnp.float32),
                sources,
                listeners,
                log_beta,
                band_freqs,
                n_samples=n_samples,
                max_order=self.max_order,
                sr=self.sample_rate,
                encoding=encoding,
                hrtf=hrtf,
            )
            arr = np.asarray(irs)
            mic.irs = arr
            out[alias] = arr
        return out

    # ------------------------------------------------------------------
    # Serialisation
    # ------------------------------------------------------------------

    def to_dict(self) -> dict:
        return dict(
            backend=self.name,
            sample_rate=self.sample_rate,
            dimensions=self.dimensions.tolist(),
            absorption=utils.coerce_nested_inputs(self.absorption),
            max_order=self.max_order,
            max_ir_length=self.max_ir_length,
            frequency_bands=self.frequency_bands,
            emitters={
                alias: [utils.coerce_nested_inputs(e.coordinates_absolute) for e in lst]
                for alias, lst in self.emitters.items()
            },
            microphones={a: m.to_dict() for a, m in self.microphones.items()},
            empty_space_around_mic=self.empty_space_around_mic,
            empty_space_around_emitter=self.empty_space_around_emitter,
            empty_space_around_surface=self.empty_space_around_surface,
            empty_space_around_capsule=self.empty_space_around_capsule,
        )

    @classmethod
    def from_dict(cls, input_dict: dict[str, Any]) -> "WorldStateShoebox":
        for k in ["dimensions", "emitters", "microphones", "sample_rate"]:
            if k not in input_dict:
                raise KeyError(f"Missing key: '{k}'")
        state = cls(
            dimensions=input_dict["dimensions"],
            sample_rate=input_dict["sample_rate"],
            absorption=np.asarray(input_dict["absorption"]),
            max_order=input_dict.get("max_order", 12),
            max_ir_length=input_dict.get("max_ir_length", config.MAX_IR_SECONDS),
            frequency_bands=input_dict.get("frequency_bands", config.RAY_TRACER_FREQUENCY_BANDS),
            empty_space_around_mic=input_dict.get(
                "empty_space_around_mic", config.EMPTY_SPACE_AROUND_MIC
            ),
            empty_space_around_emitter=input_dict.get(
                "empty_space_around_emitter", config.EMPTY_SPACE_AROUND_EMITTER
            ),
            empty_space_around_surface=input_dict.get(
                "empty_space_around_surface", config.EMPTY_SPACE_AROUND_SURFACE
            ),
            empty_space_around_capsule=input_dict.get(
                "empty_space_around_capsule", config.EMPTY_SPACE_AROUND_CAPSULE
            ),
        )
        from audiblelight_tpu.worldstate.base import Emitter

        state.microphones = OrderedDict(
            {a: MicArray.from_dict(v) for a, v in input_dict["microphones"].items()}
        )
        state.emitters = OrderedDict(
            {
                a: [Emitter(alias=a, coordinates_absolute=v_) for v_ in v]
                for a, v in input_dict["emitters"].items()
            }
        )
        state._update()
        return state

    def __str__(self) -> str:
        return (
            f"'{self.__class__.__name__}' with dimensions {self.dimensions.tolist()} and "
            f"{len(self)} objects ({len(self.microphones)} microphones, {self.num_emitters} emitters)"
        )
