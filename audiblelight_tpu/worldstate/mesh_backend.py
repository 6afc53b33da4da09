"""Ray-traced mesh backend (`WorldStateRLR`): 3D-scanned rooms + stochastic tracer.

API parity with the reference's WorldStateRLR (reference worldstate.py:663-2424),
but the C++ rlr-audio-propagation engine is replaced by the JAX wavefront ray
tracer (audiblelight_tpu.rir.raytracer) and trimesh geometry queries by the batched
device kernels (audiblelight_tpu.geometry.queries). The `rlr_kwargs` config surface
accepts the reference engine's field names (sample_rate, indirect_ray_count,
indirect_ray_depth, max_ir_length, frequency_bands, ...) and maps them onto the
JAX engine; unknown-but-valid rlr fields are stored for serialisation parity and
otherwise ignored with a debug log.
"""

from __future__ import annotations

from collections import OrderedDict
from pathlib import Path
from typing import Any, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from audiblelight_tpu import config, custom_types, utils
from audiblelight_tpu.geometry import TriMesh, load_mesh
from audiblelight_tpu.geometry.queries import (
    nearest_surface_distance,
    points_inside_mesh,
    ray_mesh_first_hit,
    segments_occluded,
)
from audiblelight_tpu.micarrays import MicArray
from audiblelight_tpu.rir.materials import (
    get_material_absorption,
    get_material_scattering,
    get_material_transmission,
    octave_band_centers,
    validate_material,
)
from audiblelight_tpu.rir.raytracer import trace_rirs_multi
from audiblelight_tpu.utils import logger
from audiblelight_tpu.worldstate.base import WorldState
from audiblelight_tpu.worldstate.placement import PlacementMixin

# Engine-config fields understood by the JAX tracer, keyed by the reference rlr
# config names (reference tests/test_worldstate_rlr.py:810-835 lists the surface).
_ENGINE_FIELD_DEFAULTS = {
    "sample_rate": config.SAMPLE_RATE,
    "direct_ray_count": config.RAY_TRACER_DIRECT_RAY_COUNT,
    "indirect_ray_count": config.RAY_TRACER_INDIRECT_RAY_COUNT,
    "indirect_ray_depth": config.RAY_TRACER_INDIRECT_RAY_DEPTH,
    "max_ir_length": config.MAX_IR_SECONDS,
    "frequency_bands": config.RAY_TRACER_FREQUENCY_BANDS,
    "direct_sh_order": config.RAY_TRACER_DIRECT_SH_ORDER,
    "indirect_sh_order": config.RAY_TRACER_INDIRECT_SH_ORDER,
    "unit_scale": 1.0,
    "speed_of_sound": config.SPEED_OF_SOUND,
    "thread_count": 1,
    # Knife-edge diffraction for occluded direct paths. The reference rlr
    # engine serialises diffraction=1 with max_diffraction_order=10 (reference
    # tests/test_worldstate_rlr.py:811,824) — match those defaults. Bend count
    # is capped at 4 inside the tracer (a fifth knife edge costs > 40 dB).
    "diffraction": True,
    "max_diffraction_order": 10,
    "transmission": False,
    # Acoustic LOD for the stochastic tail (the reference rlr config's
    # `mesh_simplification` field): False = trace the full mesh; True = decimate
    # to config.MESH_SIMPLIFICATION_TARGET_FACES by vertex clustering; an int =
    # explicit face budget; a float = explicit clustering voxel size in metres.
    # The exact direct path ALWAYS uses the full mesh (geometry.mesh.TriMesh
    # .simplified documents the acoustics argument).
    "mesh_simplification": False,
    "temporal_coherence": False,
    "dmin": 1.0,
    "hist_bin_dt": 0.002,
    # Diffuse-rain visibility mode: "exact" = per-hit-point ray queries (the
    # reference rlr shadow-ray behaviour); "face" = precomputed per-face
    # centroid visibility, one gather per bounce (exact up to the within-face
    # penumbra); "auto" = "face" whenever mesh_simplification is active (the
    # fast acoustic-LOD mode), "exact" otherwise.
    "rain_visibility": "auto",
    # Pad the traced source count to the next power of two so dataset runs with
    # varying event counts reuse ONE compiled trace program per bucket instead
    # of recompiling per scene (XLA compiles per shape; through a remote-compile
    # link each new shape costs minutes). Dummy sources are sliced away after
    # tracing; results only differ by the stochastic tail's PRNG realisation.
    "source_bucketing": True,
    # TPU-specific: one diffuse-rain visibility query per hit point against the
    # array centroid instead of per capsule (see rir.raytracer
    # trace_energy_histogram's shared_visibility doc). False = exact
    # per-capsule queries, the reference rlr per-listener behaviour.
    "shared_visibility": True,
    # TPU-specific: progressive wavefront decimation for deep traces — rays
    # halve (with unbiased Russian-roulette energy reweighting) at depth/3 and
    # 2*depth/3, cutting the bounce loop's first-hit cost ~40% for per-bin
    # tail noise measured under 10% on a -40 dB region (see
    # rir.raytracer.decimation_phases). Default False = trace every ray to
    # full depth, the reference rlr behaviour; opt in for throughput runs
    # (bench.py and the SELD script's --fast profile enable it explicitly).
    "ray_decimation": False,
}


class _EngineConfig:
    """Attribute-style engine configuration (the reference's rlr Config analog)."""

    def __init__(self, **overrides):
        for k, v in _ENGINE_FIELD_DEFAULTS.items():
            setattr(self, k, v)
        for k, v in overrides.items():
            if not hasattr(self, k):
                raise AttributeError(f"Ray-tracing engine has no attribute {k}")
            setattr(self, k, v)

    def to_dict(self) -> dict:
        return {k: getattr(self, k) for k in _ENGINE_FIELD_DEFAULTS}


class _EngineContext:
    """Lightweight context handle tracking listeners/sources/objects.

    Mirrors the count-query surface of the reference's C++ Context
    (get_listener_count / get_source_count / get_object_count used in
    reference synthesize.py:714-739 validation) without owning compute —
    simulation is a pure function over device arrays.
    """

    def __init__(self, cfg: _EngineConfig):
        self.config = cfg
        self.listeners: list = []
        self.sources: list = []
        self.object_count = 0
        self.indirect_ray_efficiency = None

    def get_listener_count(self) -> int:
        return len(self.listeners)

    def get_source_count(self) -> int:
        return len(self.sources)

    def get_object_count(self) -> int:
        return self.object_count

    def get_indirect_ray_efficiency(self) -> float:
        return self.indirect_ray_efficiency if self.indirect_ray_efficiency is not None else 0.0


class WorldStateRLR(PlacementMixin, WorldState):
    """A WorldState where audio propagation is ray-traced inside a 3D mesh."""

    name = "RLR"

    def __init__(
        self,
        mesh: Union[str, Path, TriMesh],
        sample_rate: Optional[custom_types.Numeric] = config.SAMPLE_RATE,
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
        ensure_minimum_weighted_average_ray_length: Optional[bool] = False,
        minimum_weighted_average_ray_length: Optional[
            custom_types.Numeric
        ] = config.MIN_AVG_RAY_LENGTH,
        repair_threshold: Optional[custom_types.Numeric] = None,
        waypoints_json: Optional[Union[str, Path]] = None,
        material: Optional[str] = None,
        rlr_kwargs: Optional[dict] = None,
        seed: Optional[int] = None,
    ):
        super().__init__()
        self.add_to_state = add_to_context
        self.sample_rate = utils.sanitise_positive_number(sample_rate, cast_to=int)
        self.rng = np.random.default_rng(seed)
        # Key bookkeeping lives on the CPU backend: PRNGKey creation and the
        # per-render splits are tiny ops, but on a remote accelerator each one
        # is a full RPC round trip (dataset runs build one WorldState per
        # scene). The subkey ships to the device together with the other
        # per-scene inputs; threefry streams are identical on every backend.
        # device_put COMMITS the key to the CPU backend. An uncommitted key
        # (merely created under default_device) makes every later
        # jax.random.split dispatch on the DEFAULT accelerator — queued behind
        # all in-flight render batches, so the tiny np.asarray(subkey) pull
        # measured ~0.65 s/scene of head-of-line blocking on the production
        # pipeline. Committed, the walk stays host-local and free.
        cpu0 = jax.local_devices(backend="cpu")[0]
        self._key = jax.device_put(
            jax.random.PRNGKey(seed if seed is not None else utils.SEED), cpu0
        )
        self._cpu_device = cpu0

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

        self.ensure_minimum_weighted_average_ray_length = (
            ensure_minimum_weighted_average_ray_length
        )
        self.minimum_weighted_average_ray_length = utils.sanitise_positive_number(
            minimum_weighted_average_ray_length
        )

        # Mesh ingestion (host) + cached device triangle soup
        self.mesh = mesh if isinstance(mesh, TriMesh) else load_mesh(mesh)
        self.waypoints = self.load_mesh_navigation_waypoints(waypoints_json)

        self.repair_threshold = repair_threshold
        if self.repair_threshold is not None and not self.mesh.is_watertight:
            broken = self.mesh.broken_faces()
            if len(broken) / max(len(self.mesh.faces), 1) < repair_threshold:
                self.mesh.repair()

        self.material = validate_material(material)
        self.cfg = self._parse_rlr_config(rlr_kwargs)
        self.ctx = None
        if self.add_to_state:
            self._setup_audio_context()

    def split_key(self):
        """Advance the PRNG walk and return the subkey, HOST-LOCALLY.

        Split outputs are uncommitted, so without the explicit CPU default a
        second split would drift back to the accelerator queue (see the
        commit note in __init__). Threefry streams are identical on every
        backend, so the values match a device-side walk exactly.
        """
        cpu0 = getattr(self, "_cpu_device", None)
        if cpu0 is None:
            cpu0 = self._cpu_device = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu0):
            self._key, sub = jax.random.split(self._key)
        # Return NUMPY, never the committed-CPU jax array: one committed-cpu
        # operand among a jit call's inputs silently pins the WHOLE program to
        # the CPU backend (where the Pallas tracer kernels cannot lower) —
        # this is exactly how trace_irs_device broke on accelerator hosts.
        return np.asarray(sub)

    # ------------------------------------------------------------------
    # Engine config / context
    # ------------------------------------------------------------------

    def _parse_rlr_config(self, rlr_kwargs: Optional[dict]) -> _EngineConfig:
        """Build the engine config, enforcing sample-rate consistency."""
        rlr_kwargs = dict(rlr_kwargs or {})
        if "sample_rate" not in rlr_kwargs:
            rlr_kwargs["sample_rate"] = self.sample_rate
        elif rlr_kwargs["sample_rate"] != self.sample_rate:
            raise ValueError(
                f"Mismatching sample rate (expected {self.sample_rate}, "
                f"got {rlr_kwargs['sample_rate']})"
            )
        # Fields accepted for reference-config parity but WITHOUT effect in
        # this engine must fail loudly rather than silently (a user porting a
        # reference config should know their knob is inert here).
        for field, default in (("temporal_coherence", False), ("dmin", 1.0)):
            if field in rlr_kwargs and rlr_kwargs[field] != default:
                logger.warning(
                    f"rlr config field '{field}'={rlr_kwargs[field]!r} is accepted "
                    "for serialisation parity but has NO effect in the TPU tracer."
                )
        return _EngineConfig(**rlr_kwargs)

    @property
    def native_bvh(self):
        """Host-side BVH (cpp/geomlib.cpp) for low-latency placement queries.

        Falls back to None (device kernels used instead) when the native library
        cannot be built. Rebuilt when the face count changes (mesh repair).
        """
        if getattr(self, "_native_bvh_failed", False):
            return None
        bvh = getattr(self, "_native_bvh", None)
        if bvh is not None and bvh.n_tris == len(self.mesh.faces):
            return bvh
        # Dataset runs build many WorldStates over ONE shared mesh object; the
        # BVH is a pure function of the triangles, so cache it on the mesh
        # (~60 ms/scene of rebuild avoided on a 110k-face room). Keyed by face
        # count: mesh repair replaces the faces array.
        fp = self._mesh_fingerprint()
        cached = getattr(self.mesh, "_native_bvh_cache", None)
        if cached is not None and cached[0] == fp:
            self._native_bvh = cached[1]
            return cached[1]
        try:
            from audiblelight_tpu.geometry.native import NativeBVH, native_available

            if not native_available():
                self._native_bvh_failed = True
                return None
            self._native_bvh = NativeBVH(self.mesh.triangles.astype(np.float32))
            try:
                self.mesh._native_bvh_cache = (fp, self._native_bvh)
            except AttributeError:  # pragma: no cover - exotic mesh types
                pass
            return self._native_bvh
        except Exception:
            self._native_bvh_failed = True
            return None

    def _mesh_fingerprint(self) -> tuple:
        """Cheap identity for the current mesh geometry: face count + bounds +
        vertex-sum hash. Any accel structure derived from the triangles keys on
        this, so a mutated/replaced mesh can never trace against stale
        grid/star/tile caches."""
        v = self.mesh.vertices
        return (
            len(self.mesh.faces),
            tuple(np.round(self.mesh.bounds.ravel(), 6).tolist()),
            float(np.sum(v, dtype=np.float64)),
        )

    def _shared_cache(self) -> dict:
        """Accel/device caches scoped to the MESH object, not this WorldState.

        Dataset runs build one WorldState per scene over ONE shared mesh; when
        these caches lived on the WorldState, every scene re-paid the mesh
        simplification (~0.3 s host), grid/tile/star builds, device triangle
        uploads (~4 MB), and rain-occlusion tables — measured ~0.7 s/scene of
        the production pipeline (the single largest host cost). Everything in
        here is a pure function of (mesh geometry, key), so it lives on the
        mesh keyed by the geometry fingerprint: a mutated/replaced mesh gets a
        fresh dict and can never serve stale structures. Entries whose inputs
        go beyond the triangles (material, engine config, listener positions)
        carry those inputs in their keys.
        """
        fp = self._mesh_fingerprint()
        cache = getattr(self.mesh, "_al_accel_cache", None)
        if cache is None or cache.get("fp") != fp:
            cache = {"fp": fp}
            try:
                self.mesh._al_accel_cache = cache
            except AttributeError:  # pragma: no cover — slotted mesh types
                own = getattr(self, "_own_accel_cache", None)
                if own is not None and own.get("fp") == fp:
                    cache = own
                self._own_accel_cache = cache
        # Per-instance RESULTS (simulated IRs) are stale when the mesh mutates
        if getattr(self, "_tris_fp", None) != fp:
            self._tris_fp = fp
            self._irs_device_cache = None
            self._irs = None
        return cache

    def _ms_key(self):
        """Hashable mesh-simplification setting (part of acoustic-mesh keys)."""
        ms = self.cfg.mesh_simplification
        return ms if isinstance(ms, (bool, int, float)) else str(ms)

    @property
    def tris_device(self) -> jnp.ndarray:
        """(F, 3, 3) float32 triangle array on device (cached, fingerprint-keyed)."""
        cache = self._shared_cache()
        if "tris_device" not in cache:
            cache["tris_device"] = jnp.asarray(self.mesh.triangles.astype(np.float32))
        return cache["tris_device"]

    @property
    def grid_accel(self):
        """Uniform-grid acceleration structure for large scanned meshes.

        Built once per mesh above config.GRID_ACCEL_MIN_FACES faces (the regime
        the dense kernels stop being viable in); None for small meshes, where
        the Pallas dense kernels win. Rebuilt if the face count changes.
        """
        if len(self.mesh.faces) < config.GRID_ACCEL_MIN_FACES:
            return None
        cache = self._shared_cache()
        if "grid" not in cache:
            from audiblelight_tpu.geometry.grid import build_grid

            cache["grid"] = build_grid(self.mesh.triangles.astype(np.float32))
            logger.info(f"Built ray-acceleration structure: {cache['grid']}")
        return cache["grid"]

    @property
    def mesh_tiles(self):
        """Morton-tiled face layout for reachability-culled first hits
        (large meshes on TPU backends only; None elsewhere)."""
        if not getattr(config, "USE_TILED_FIRST_HIT", True):
            return None
        if len(self.mesh.faces) < config.GRID_ACCEL_MIN_FACES:
            return None
        from audiblelight_tpu.ops.pallas_kernels import pallas_supported

        if not pallas_supported():
            return None
        cache = self._shared_cache()
        if "tiles" not in cache:
            from audiblelight_tpu.ops.tiled_first_hit import build_mesh_tiles

            cache["tiles"] = build_mesh_tiles(self.mesh.triangles.astype(np.float32))
            logger.info(f"Built first-hit tile structure: {cache['tiles']}")
        return cache["tiles"]

    @property
    def acoustic_mesh(self) -> TriMesh:
        """The mesh the stochastic energy tail traces against.

        With cfg.mesh_simplification active this is a vertex-clustered
        decimation of the full mesh (see TriMesh.simplified for the acoustics
        rationale); otherwise the full mesh itself. Placement queries and the
        exact direct path always use the full mesh.
        """
        ms = self.cfg.mesh_simplification
        if not ms:
            return self.mesh
        cache = self._shared_cache()
        ck = ("amesh", self._ms_key())
        if ck not in cache:
            if ms is True:
                simplified = self.mesh.simplified(
                    target_faces=config.MESH_SIMPLIFICATION_TARGET_FACES
                )
            elif isinstance(ms, bool):  # pragma: no cover — ms is True above
                simplified = self.mesh
            elif isinstance(ms, int):
                simplified = self.mesh.simplified(target_faces=int(ms))
            elif isinstance(ms, float):
                simplified = self.mesh.simplified(voxel=float(ms))
            else:
                raise ValueError(
                    f"mesh_simplification must be a bool, int face budget or "
                    f"float voxel size, got {ms!r}"
                )
            logger.info(
                f"Acoustic mesh: {len(self.mesh.faces)} -> {len(simplified.faces)} "
                f"faces (voxel {simplified.metadata.get('simplified_voxel', 0):.3f} m)"
            )
            cache[ck] = simplified
        return cache[ck]

    @property
    def acoustic_tris_device(self) -> jnp.ndarray:
        """(F', 3, 3) float32 acoustic-mesh triangles on device (cached)."""
        amesh = self.acoustic_mesh
        if amesh is self.mesh:
            return self.tris_device
        cache = self._shared_cache()
        ck = ("atris", self._ms_key())
        if ck not in cache:
            cache[ck] = jnp.asarray(amesh.triangles.astype(np.float32))
        return cache[ck]

    @property
    def diffraction_graph_tris(self) -> Optional[jnp.ndarray]:
        """(F', 3, 3) triangles the MULTI-BEND diffraction graph checks its
        candidate legs against, or None to use the full mesh + grid accel.

        Big scanned meshes get a vertex-clustered LOD: the graph issues ~40k
        lattice segments per source, which cost seconds through the grid DDA
        at 10^5 faces, while multi-edge diffraction physically concerns LARGE
        blockers (walls, partitions) that clustering preserves. Reuses the
        acoustic mesh when simplification is active; builds a dedicated LOD
        (cached on the mesh) otherwise. Small meshes return None — the dense
        kernels handle them exactly and cheaply.
        """
        if len(self.mesh.faces) < config.GRID_ACCEL_MIN_FACES:
            return None
        if self.acoustic_mesh is not self.mesh:
            return self.acoustic_tris_device
        cache = self._shared_cache()
        if "diffraction_lod" not in cache:
            lod = self.mesh.simplified(
                target_faces=config.MESH_SIMPLIFICATION_TARGET_FACES
            )
            cache["diffraction_lod"] = jnp.asarray(lod.triangles.astype(np.float32))
        return cache["diffraction_lod"]

    def rain_occlusion_for(self, listener_points: np.ndarray) -> jnp.ndarray:
        """Cached (C_occ, F') per-face rain-occlusion table for the acoustic
        mesh (see rir.raytracer.face_rain_occlusion)."""
        from audiblelight_tpu.rir.raytracer import face_rain_occlusion

        listener_points = np.atleast_2d(np.asarray(listener_points, dtype=np.float64))
        cache = self._shared_cache()
        ck = (
            "rain",
            self._ms_key(),
            tuple(np.round(listener_points, 4).ravel().tolist()),
        )
        if ck not in cache:
            amesh = self.acoustic_mesh
            tris = self.acoustic_tris_device
            ck_n = ("anormals", self._ms_key())
            if ck_n not in cache:
                cache[ck_n] = jnp.asarray(amesh.face_normals.astype(np.float32))
            cache[ck] = face_rain_occlusion(
                tris, cache[ck_n], jnp.asarray(listener_points, dtype=jnp.float32)
            )
        return cache[ck]

    def star_accel_for(self, center: np.ndarray, r_pad: float):
        """Azimuth-culled occlusion layout for one listener centre (cached).

        Only pays on large nonconvex meshes (the scanned-room regime); None
        otherwise, and callers fall back to the dense kernels.
        """
        if not getattr(config, "USE_STAR_OCCLUSION", True):
            return None
        # The star layout serves the tracer's rain occlusion, which runs on the
        # ACOUSTIC mesh; below the threshold the dense kernels win.
        amesh = self.acoustic_mesh
        if len(amesh.faces) < config.GRID_ACCEL_MIN_FACES or self.mesh.is_convex:
            return None
        from audiblelight_tpu.ops.pallas_kernels import pallas_supported

        if not pallas_supported():
            return None  # non-TPU backends run the chunked XLA occlusion path
        cache = self._shared_cache()
        ck = (
            "star",
            self._ms_key(),
            tuple(np.round(np.asarray(center, float), 4)),
            round(float(r_pad), 4),
        )
        if ck not in cache:
            from audiblelight_tpu.ops.star_occlusion import build_star_accel

            cache[ck] = build_star_accel(
                amesh.triangles.astype(np.float32), np.asarray(center), r_pad
            )
            if cache[ck] is not None:
                logger.info(f"Built occlusion structure: {cache[ck]}")
        return cache[ck]

    @property
    def face_props_device(self) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Per-face (absorption (F, B), scattering (F,), transmission (F, B))
        device arrays, sized to the ACOUSTIC mesh (the one the tail traces)."""
        cache = self._shared_cache()
        ck = (
            "face_props",
            self._ms_key(),
            str(self.material),
            int(self.cfg.frequency_bands),
        )
        if ck not in cache:
            amesh = self.acoustic_mesh
            n_faces = len(amesh.faces)
            bands = octave_band_centers(int(self.cfg.frequency_bands))
            alpha = get_material_absorption(self.material, bands)
            scat = get_material_scattering(self.material)
            tau = get_material_transmission(self.material, bands)
            if amesh is not self.mesh and amesh.area > 0:
                # Sabine-consistent decimation: clustering shrinks total surface
                # area, which would lengthen the energy decay. Scaling the
                # absorption coefficient by the area ratio preserves the total
                # absorbing power (sum area_f * alpha_f) and hence RT60.
                alpha = np.clip(
                    np.asarray(alpha, dtype=np.float32)
                    * float(self.mesh.area / amesh.area),
                    0.0,
                    1.0,
                )
            # Diffraction is a real first-order knife-edge term on occluded
            # direct paths (rir.raytracer.diffracted_path_ir, wired in
            # get_irs); the earlier scattering-floor surrogate is gone.
            cache[ck] = (
                jnp.broadcast_to(
                    jnp.asarray(alpha, dtype=jnp.float32), (n_faces, len(bands))
                ),
                jnp.full((n_faces,), scat, dtype=jnp.float32),
                jnp.broadcast_to(
                    jnp.asarray(tau, dtype=jnp.float32), (n_faces, len(bands))
                ),
            )
        return cache[ck]

    def _setup_audio_context(self) -> None:
        """(Re)build the context handle for the current configuration."""
        self.ctx = _EngineContext(self.cfg)
        self.ctx.object_count = 1  # the mesh

    def _update(self) -> None:
        """Refresh the context counters + every emitter's relative coordinates."""
        self._setup_audio_context()
        for mic in self.microphones.values():
            for _ in range(mic.n_listeners):
                self.ctx.listeners.append(mic.channel_layout)
        for emitter_list in self.emitters.values():
            for emitter in emitter_list:
                self.ctx.sources.append(emitter.coordinates_absolute)
        self._update_relative_coordinates()

    # ------------------------------------------------------------------
    # Geometry
    # ------------------------------------------------------------------

    @property
    def bounds(self) -> np.ndarray:
        return self.mesh.bounds

    def _is_point_inside_mesh(self, point) -> bool:
        bvh = self.native_bvh
        if bvh is not None:
            return bool(bvh.contains(utils.coerce2d(point))[0])
        mask = points_inside_mesh(
            jnp.asarray(utils.coerce2d(point), dtype=jnp.float32), self.tris_device
        )
        return bool(np.asarray(mask)[0])

    def _get_valid_positions_mask(self, pos_abs: np.ndarray) -> np.ndarray:
        """Batched position validation (distance + surface + inside tests)."""
        positions = utils.coerce2d(np.asarray(pos_abs, dtype=np.float64))
        if positions.shape[1] != 3:
            raise ValueError("Expected input to have shape (N, 3) for XYZ coordinates")

        valid = self._distance_mask(positions)

        bvh = self.native_bvh
        if bvh is not None:
            # Host BVH path: placement issues many small batches where a device
            # round-trip per call would dominate.
            surface_d = bvh.nearest_surface_distance(positions)
            valid &= surface_d >= self.empty_space_around_surface
            valid &= bvh.contains(positions)
            return valid

        pts = jnp.asarray(positions, dtype=jnp.float32)
        surface_d = np.asarray(nearest_surface_distance(pts, self.tris_device))
        valid &= surface_d >= self.empty_space_around_surface
        inside = np.asarray(points_inside_mesh(pts, self.tris_device))
        valid &= inside
        return valid

    def path_exists_between_points(self, point_a: np.ndarray, point_b: np.ndarray) -> bool:
        """True when an unobstructed line exists between two in-mesh points."""
        point_a = np.asarray(point_a, dtype=np.float64)
        point_b = np.asarray(point_b, dtype=np.float64)
        for point in (point_a, point_b):
            if point.shape != (3,):
                raise ValueError(f"Expected an array with shape (3,) but got {point.shape}")
        bvh = self.native_bvh
        if bvh is not None:
            if not bvh.contains(np.stack([point_a, point_b])).all():
                return False
            return not bool(bvh.segments_occluded(point_a[None], point_b[None])[0])

        inside = np.asarray(
            points_inside_mesh(
                jnp.asarray(np.stack([point_a, point_b]), dtype=jnp.float32),
                self.tris_device,
            )
        )
        if not inside.all():
            return False
        occluded = np.asarray(
            segments_occluded(
                jnp.asarray(point_a[None], dtype=jnp.float32),
                jnp.asarray(point_b[None], dtype=jnp.float32),
                self.tris_device,
            )
        )[0]
        return not bool(occluded)

    def calculate_weighted_average_ray_length(
        self, point: np.ndarray, num_rays: Optional[custom_types.Numeric] = config.NUM_RAYS
    ) -> float:
        """Openness heuristic: distance-squared-weighted mean ray length from a point."""
        num_rays = utils.sanitise_positive_number(num_rays, cast_to=int)
        point = utils.sanitise_coordinates(point)

        angles = self.rng.uniform(0, 2 * np.pi, num_rays)
        elevations = self.rng.uniform(-np.pi / 2, np.pi / 2, num_rays)
        cos_el = np.cos(elevations)
        directions = np.stack(
            [cos_el * np.cos(angles), cos_el * np.sin(angles), np.sin(elevations)], axis=-1
        )
        origins = np.broadcast_to(point, (num_rays, 3))

        bvh = self.native_bvh
        if bvh is not None:
            distances, _ = bvh.ray_first_hit(origins, directions)
            distances = np.where(np.isfinite(distances), distances, np.inf)
        else:
            t, _ = ray_mesh_first_hit(
                jnp.asarray(origins, dtype=jnp.float32),
                jnp.asarray(directions, dtype=jnp.float32),
                self.tris_device,
            )
            distances = np.asarray(t)
        if np.isinf(distances).any():
            logger.warning(
                f"Some rays cast from point {point} have infinite distances: is the mesh watertight?"
            )
            distances = distances[np.isfinite(distances)]
        weights = distances**2
        return float(np.sum(distances * weights) / np.sum(weights))

    def load_mesh_navigation_waypoints(
        self, waypoints_json: Optional[Union[Path, str]] = None
    ) -> list[np.ndarray]:
        """Load navigation waypoints for this mesh from a JSON file, if present."""
        import json

        if waypoints_json is None:
            mesh_fname = self.mesh.metadata.get("fname", "")
            # Procedurally generated meshes (box_mesh / scanned_like_room) have
            # no file on disk and therefore never have checked-in waypoints —
            # warning for them would spam every synthetic-bench scene. The
            # reference only ever constructs from real files, where the
            # warning stays (reference worldstate.py:1883-1888).
            ftype = self.mesh.metadata.get("ftype", "")
            fpath = str(self.mesh.metadata.get("fpath", ""))
            procedural = ftype == "generated" or fpath.startswith("synthetic://")
            default_loc = utils.get_project_root() / "resources/waypoints/gibson"
            candidate = (default_loc / mesh_fname).with_suffix(".json")
            if not candidate.is_file():
                log = logger.debug if procedural else logger.warning
                log(
                    f"Cannot find waypoints for mesh {mesh_fname} inside default location "
                    f"({default_loc}). No navigation waypoints will be loaded."
                )
                return []
            waypoints_json = candidate
        else:
            waypoints_json = utils.sanitise_filepath(waypoints_json)

        with open(waypoints_json) as js_in:
            js_out = json.load(js_in)
        if not isinstance(js_out, list):
            raise ValueError(
                f"Expected waypoints JSON to be a list of dictionaries, got {type(js_out)}"
            )
        if not all("waypoints" in wp for wp in js_out):
            raise KeyError(
                "Waypoints JSON must be a list of dictionaries, each containing the key 'waypoints'."
            )
        waypoints = [
            np.array(wp["waypoints"])
            for wp in js_out
            if self._validate_position(wp["waypoints"])
        ]
        if len(waypoints) == 0:
            logger.warning("No valid navigation waypoints found!")
        return waypoints

    # ------------------------------------------------------------------
    # Simulation
    # ------------------------------------------------------------------

    def _simulation_sanity_check(self) -> None:
        assert self.num_emitters > 0, "Must have added valid emitters before calling `simulate`!"
        assert len(self.microphones) > 0, "Must have added microphones before calling `simulate`!"
        assert all(
            issubclass(type(m), MicArray) for m in self.microphones.values()
        ), "Non-microphone objects in microphone attribute"
        assert self.ctx.get_listener_count() > 0
        assert self.ctx.get_source_count() > 0
        assert self.ctx.get_object_count() == 1
        assert sum(len(em) for em in self.emitters.values()) == self.ctx.get_source_count()
        assert (
            sum(m.n_listeners for m in self.microphones.values())
            == self.ctx.get_listener_count()
        )

    def simulate(self) -> None:
        """Trace RIRs for all (microphone, emitter) pairs on device."""
        self._update()
        self._simulation_sanity_check()
        self._irs = None

        logger.info(
            f"Starting simulation with {self.num_emitters} emitters, "
            f"{len(self.microphones)} microphones"
        )
        self._irs = self.get_irs()

        # Ray efficiency diagnostic: fraction of rays still alive at the end of
        # tracing is expensive to recover exactly; approximate from watertightness.
        escaped = len(self.mesh.broken_faces()) / max(len(self.mesh.faces), 1)
        efficiency = float(np.clip(1.0 - escaped, 0.0, 1.0))
        self.ctx.indirect_ray_efficiency = efficiency
        if efficiency < config.WARN_WHEN_RAY_EFFICIENCY_BELOW:
            logger.warning(
                f"Ray efficiency is below {config.WARN_WHEN_RAY_EFFICIENCY_BELOW:.0%}. "
                f"The mesh may have holes; consider a lower `repair_threshold` or repairing it."
            )

    def _emitter_positions(self) -> np.ndarray:
        """All emitter coordinates, flattened in registration order: (E, 3)."""
        coords = [
            e.coordinates_absolute for lst in self.emitters.values() for e in lst
        ]
        return np.stack(coords) if coords else np.zeros((0, 3))

    def _rain_mode(self) -> str:
        """Resolve cfg.rain_visibility ("auto" follows mesh_simplification)."""
        mode = str(self.cfg.rain_visibility)
        if mode == "auto":
            return "face" if bool(self.cfg.mesh_simplification) else "exact"
        if mode not in ("exact", "face"):
            raise ValueError(f"rain_visibility must be exact|face|auto, got {mode!r}")
        return mode

    def get_irs(self) -> OrderedDict[str, np.ndarray]:
        """Trace and return {mic_alias: (n_capsules, n_emitters, n_samples)}
        as host numpy arrays (also cached on each mic as `mic.irs`)."""
        out = OrderedDict()
        for alias, irs_dev in self.trace_irs_device().items():
            arr = np.asarray(irs_dev)
            self.microphones[alias].irs = arr
            out[alias] = arr
        return out

    @property
    def irs(self) -> OrderedDict[str, np.ndarray]:
        """Simulated IRs; lazily materialised from the device-resident trace
        when only the compiled pipeline has run (it never pulls IR banks to the
        host on its own — see trace_irs_device)."""
        if self._irs is None and getattr(self, "_irs_device_cache", None) is not None:
            self._irs = OrderedDict(
                (a, np.asarray(v)) for a, v in self._irs_device_cache[1].items()
            )
            for a, arr in self._irs.items():
                self.microphones[a].irs = arr
        return super().irs

    def trace_irs_device(self) -> OrderedDict[str, jnp.ndarray]:
        """Trace RIRs, returning DEVICE arrays {mic_alias: (C, E, S)}.

        The compiled render pipeline (audiblelight_tpu.pipeline) consumes these
        directly so IR banks never round-trip through the host between tracing
        and convolution — on a production PCIe link that saves a copy; through
        a development tunnel it saves seconds per scene. `get_irs` is the
        host-materialised view of the same trace.
        """
        self._update()
        self._simulation_sanity_check()
        # One trace per (emitters, microphones) configuration: simulate()
        # followed by a compiled-plan build must not trace twice.
        cache_key = (
            # Geometry identity: a mutated/replaced mesh must never serve IRs
            # traced against the old one (same defence as the accel caches) —
            # and the engine config + material are part of the physics, so
            # mutating cfg between simulate() calls must retrace too.
            self._mesh_fingerprint(),
            tuple(sorted((k, str(v)) for k, v in self.cfg.to_dict().items())),
            str(getattr(self, "material", None)),
            tuple(np.round(self._emitter_positions().ravel(), 6).tolist()),
            tuple(
                (
                    a,
                    m.name,
                    tuple(np.round(np.ravel(m.coordinates_absolute), 6).tolist()),
                    # Measured-HRTF binaural: a changed SOFA path must retrace
                    str(getattr(m, "hrtf_sofa", None)),
                )
                for a, m in self.microphones.items()
            ),
        )
        cached = getattr(self, "_irs_device_cache", None)
        if cached is not None and cached[0] == cache_key:
            return cached[1]
        absorption, scattering, face_tau = self.face_props_device
        src_np = self._emitter_positions().astype(np.float32)
        n_src = len(src_np)
        if bool(getattr(self.cfg, "source_bucketing", True)) and n_src > 0:
            bucket = 1
            while bucket < n_src:
                bucket *= 2
            if bucket > n_src:
                # Dummy sources repeat the first real one (guaranteed interior)
                src_np = np.concatenate(
                    [src_np, np.tile(src_np[:1], (bucket - n_src, 1))]
                )
        sources = jnp.asarray(src_np, dtype=jnp.float32)
        n_samples = int(round(float(self.cfg.max_ir_length) * self.sample_rate))

        # The stochastic tail traces the acoustic mesh (possibly a decimated
        # LOD, see acoustic_mesh); the exact direct path always uses the full
        # mesh. Tiles are keyed to the full mesh, so they only ride along when
        # the two coincide.
        atris = self.acoustic_tris_device
        simplified = atris is not self.tris_device
        rain_mode = self._rain_mode()

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

            # Measured-HRTF binaural (micarrays.Binaural.hrtf_sofa): loads
            # once per (path, rate) and rides the trace as a pytree arg
            hrtf = None
            if encoding == "binaural" and getattr(mic, "hrtf_sofa", None):
                hrtf = mic.load_hrtf(self.sample_rate)

            caps = np.atleast_2d(np.asarray(
                utils.coerce2d(mic.coordinates_absolute), dtype=np.float64
            ))
            center = caps.mean(axis=0)

            star = None
            face_occ = None
            if not self.mesh.is_convex:
                if rain_mode == "face":
                    # Per-face rain-visibility table: one precomputed query per
                    # acoustic face, then a gather per bounce.
                    pts = center[None] if bool(self.cfg.shared_visibility) else np.asarray(listeners)
                    face_occ = self.rain_occlusion_for(pts)
                elif bool(self.cfg.shared_visibility):
                    star = self.star_accel_for(center, r_pad=0.02)
                else:
                    r_pad = float(np.linalg.norm(caps - center, axis=1).max()) + 0.02
                    star = self.star_accel_for(center, r_pad=r_pad)

            sub = self.split_key()
            irs = trace_rirs_multi(
                sub,
                atris,
                absorption,
                scattering,
                sources,
                listeners,
                n_samples=n_samples,
                sr=self.sample_rate,
                n_rays=int(self.cfg.indirect_ray_count),
                max_depth=min(int(self.cfg.indirect_ray_depth), 200),
                bin_dt=float(self.cfg.hist_bin_dt),
                c=float(self.cfg.speed_of_sound),
                encoding=encoding,
                # Convex rooms have no interior occlusion: skip the per-bounce
                # visibility queries exactly (the tracer's dominant cost).
                occlusion=not self.mesh.is_convex,
                face_transmission=face_tau,
                transmission=bool(self.cfg.transmission),
                shared_visibility=bool(self.cfg.shared_visibility),
                star=star,
                face_occlusion=face_occ,
                mesh_tiles=None if simplified else self.mesh_tiles,
                tris_direct=self.tris_device if simplified else None,
                # rlr config SH-order semantics: the direct path and the
                # stochastic tail encode at their configured orders, clipped
                # to the listener layout's order inside the tracer.
                sh_order_direct=int(self.cfg.direct_sh_order),
                sh_order_indirect=int(self.cfg.indirect_sh_order),
                # Knife-edge term for occluded direct paths (rlr's
                # `diffraction` + `max_diffraction_order` fields; see
                # rir.raytracer.diffracted_path_ir). Convex rooms have no
                # occluded pairs, so the search is skipped exactly.
                diffraction=bool(self.cfg.diffraction) and not self.mesh.is_convex,
                diffraction_order=max(
                    1, int(getattr(self.cfg, "max_diffraction_order", 1))
                ),
                tris_diffraction_graph=self.diffraction_graph_tris,
                # Bounce-loop queries run the dense streamed Pallas kernels at
                # any face count: rays leaving SURFACES graze face-dense cells,
                # where the uniform-grid DDA degenerates to hundreds of
                # lockstep scattered-gather steps (~7-10x slower measured on a
                # 110k-face scanned room). The grid accelerates the
                # interior-origin regime instead: placement queries and
                # create_scene raycasts.
                accel=None,
                # ... which is exactly the regime of the few direct/diffraction
                # occlusion segments (listener->source, interior origins):
                # batched through the full-mesh placement grid they cost ~2 ms
                # where per-source dense dispatches cost ~220 ms.
                accel_direct=self.grid_accel if not self.mesh.is_convex else None,
                # Progressive wavefront decimation for deep traces (see
                # rir.raytracer.decimation_phases): unbiased ray thinning at
                # static bounce breakpoints
                decimate=bool(self.cfg.ray_decimation),
                hrtf=hrtf,
            )
            out[alias] = irs[:, :n_src, :]  # drop bucketing dummies (on device)
        self._irs_device_cache = (cache_key, out)
        return out

    # ------------------------------------------------------------------
    # Visualisation (host-side, matplotlib)
    # ------------------------------------------------------------------

    def create_scene(self) -> dict:
        """A composite 3D scene of the room with marker geometry for every
        microphone capsule (red boxes) and emitter (blue boxes).

        The reference returns a trimesh.Scene (reference worldstate.py:2257-2294);
        here the same content is a dict of named TriMesh parts, which plots with
        create_plot, exports via each part's vertices/faces, and needs no
        scene-graph dependency.
        """
        from audiblelight_tpu.geometry.mesh import box_mesh

        parts = {"mesh": self.mesh}
        marker = [0.12, 0.12, 0.12]
        for alias, mic in self.microphones.items():
            for ci, cap in enumerate(np.atleast_2d(mic.coordinates_absolute)):
                parts[f"{alias}_capsule{ci:03d}"] = box_mesh(
                    extents=marker, center=cap, inward_normals=False
                )
        for alias, emitters in self.emitters.items():
            for ei, em in enumerate(emitters):
                parts[f"{alias}_{ei:03d}"] = box_mesh(
                    extents=marker, center=em.coordinates_absolute, inward_normals=False
                )
        return parts

    def create_plot(self):
        """Top-down and side-view scatter figure of mesh, mics and emitters."""
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(1, 2, figsize=(20, 10))
        vertices = self.mesh.vertices
        mic_positions = np.vstack(
            [np.atleast_2d(m.coordinates_absolute) for m in self.microphones.values()]
        )
        emitter_positions = np.vstack(
            [x.coordinates_absolute for xs in self.emitters.values() for x in xs]
        )
        for ax_, idx, ylab, title in zip(ax.flatten(), [1, 2], ["Y", "Z"], ["Top", "Side"]):
            ax_.scatter(vertices[:, 0], vertices[:, idx], c="gray", alpha=0.1, s=1)
            ax_.scatter(mic_positions[:, 0], mic_positions[:, idx], c="red", s=100, label="Microphone")
            ax_.scatter(
                emitter_positions[:, 0],
                emitter_positions[:, idx],
                c="blue",
                s=25,
                alpha=0.5,
                label="Emitters",
            )
            ax_.set_xlabel("X")
            ax_.set_ylabel(ylab)
            ax_.set_title(f"{title} view of {self.mesh.metadata.get('fpath', 'mesh')}")
            ax_.legend()
            ax_.axis("equal")
            ax_.grid(True)
        fig.tight_layout()
        return fig

    # ------------------------------------------------------------------
    # Serialisation
    # ------------------------------------------------------------------

    def to_dict(self) -> dict:
        if self.ctx is None:
            self._setup_audio_context()
            self._update()
        return dict(
            backend=self.name,
            sample_rate=self.sample_rate,
            emitters={
                alias: [utils.coerce_nested_inputs(e.coordinates_absolute) for e in lst]
                for alias, lst in self.emitters.items()
            },
            microphones={a: m.to_dict() for a, m in self.microphones.items()},
            mesh=dict(
                **self.mesh.metadata,
                bounds=self.mesh.bounds.tolist(),
                centroid=self.mesh.centroid.tolist(),
            ),
            rlr_config=self.cfg.to_dict(),
            empty_space_around_mic=self.empty_space_around_mic,
            empty_space_around_emitter=self.empty_space_around_emitter,
            empty_space_around_surface=self.empty_space_around_surface,
            empty_space_around_capsule=self.empty_space_around_capsule,
            repair_threshold=self.repair_threshold,
            material=self.material,
        )

    @classmethod
    def from_dict(cls, input_dict: dict[str, Any]) -> "WorldStateRLR":
        for k in ["emitters", "microphones", "mesh", "rlr_config", "sample_rate"]:
            if k not in input_dict:
                raise KeyError(f"Missing key: '{k}'")

        state = cls(
            mesh=input_dict["mesh"]["fpath"],
            sample_rate=input_dict["sample_rate"],
            empty_space_around_mic=input_dict["empty_space_around_mic"],
            empty_space_around_emitter=input_dict["empty_space_around_emitter"],
            empty_space_around_surface=input_dict["empty_space_around_surface"],
            empty_space_around_capsule=input_dict["empty_space_around_capsule"],
            repair_threshold=input_dict["repair_threshold"],
            rlr_kwargs=input_dict["rlr_config"],
            material=input_dict.get("material", None),
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
            f"'{self.__class__.__name__}' with mesh '{self.mesh.metadata.get('fpath', '?')}' and "
            f"{len(self)} objects ({len(self.microphones)} microphones, {self.num_emitters} emitters)"
        )
