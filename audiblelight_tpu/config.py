"""Default configuration constants for the whole package.

Mirrors the reference constants surface (reference: audiblelight/config.py:1-100) so
that scenes built against the reference defaults render identically, while adding
TPU-specific knobs (padding sizes, precision, device-mesh axis names) that the
reference — a CPU library — has no analog for.
"""

# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------
SAMPLE_RATE = 44100
BUFFER_SIZE = 8192
FFT_SIZE = 512
WIN_SIZE = 256
HOP_SIZE = 128

# ---------------------------------------------------------------------------
# Video (kept for API parity; video rendering is an optional host-side module)
# ---------------------------------------------------------------------------
VIDEO_RESOLUTION = (1920, 960)  # width, height
VIDEO_FPS = 10
VIDEO_TEXTURE_DECIMATE = (536, 536)
VIDEO_OVERLAY_DISTANCE_SCALE_FACTOR = 1.0
VIDEO_OVERLAY_BASE_SIZE = 0.5

# ---------------------------------------------------------------------------
# Scene
# ---------------------------------------------------------------------------
SCENE_DURATION = 60
DEFAULT_REF_DB = -65
MIN_REF_DB, MAX_REF_DB = -80, -50
MAX_OVERLAP = 2
WARN_WHEN_SCENE_DURATION_BELOW = 5

# ---------------------------------------------------------------------------
# Event
# ---------------------------------------------------------------------------
MIN_EVENT_VELOCITY, MAX_EVENT_VELOCITY = 0.5, 2.0
MIN_EVENT_RESOLUTION, MAX_EVENT_RESOLUTION = 1.0, 4.0
MIN_EVENT_DURATION, MAX_EVENT_DURATION = 2.0, 10.0
MIN_EVENT_SNR, MAX_EVENT_SNR = 5.0, 30.0
DEFAULT_EVENT_VELOCITY = (MAX_EVENT_VELOCITY - MIN_EVENT_VELOCITY) / 2
DEFAULT_EVENT_RESOLUTION = (MAX_EVENT_RESOLUTION - MIN_EVENT_RESOLUTION) / 2
DEFAULT_EVENT_DURATION = (MAX_EVENT_DURATION - MIN_EVENT_DURATION) / 2
DEFAULT_EVENT_SNR = (MAX_EVENT_SNR - MIN_EVENT_SNR) / 2

# ---------------------------------------------------------------------------
# WorldState
# ---------------------------------------------------------------------------
DEFAULT_BACKEND = "rlr"
MESH_UNITS = "meters"
MIN_AVG_RAY_LENGTH = 3.0
NUM_RAYS = 100
POINT_BATCH_SIZE = 10
EMPTY_SPACE_AROUND_EMITTER = 0.2
EMPTY_SPACE_AROUND_MIC = 0.1
EMPTY_SPACE_AROUND_SURFACE = 0.2
EMPTY_SPACE_AROUND_CAPSULE = 0.05
WARN_WHEN_RAY_EFFICIENCY_BELOW = 0.5
MAX_PLACE_ATTEMPTS = 1000

# ---------------------------------------------------------------------------
# Benchmarking settings
# ---------------------------------------------------------------------------
MIN_STATIC_EVENTS, MAX_STATIC_EVENTS = 1, 10
MIN_MOVING_EVENTS, MAX_MOVING_EVENTS = 0, 6
MOVING_EVENT_SHAPES = ["random", "linear", "semicircular"]
DEFAULT_STATIC_EVENTS = 4
DEFAULT_MOVING_EVENTS = 1
MIC_ARRAY_TYPE = "ambeovr"
DEFAULT_CHANNEL_LAYOUT = "mic"
N_SCENES = 1000

# ---------------------------------------------------------------------------
# Acoustic imaging (APGD)
# ---------------------------------------------------------------------------
AIMG_FMIN, AIMG_FMAX = 1500, 4500
AIMG_NBANDS = 9
AIMG_SCALE = "linear"
AIMG_BANDWIDTH = 50.0
AIMG_TSTI = 10e-3
AIMG_FRAME_CAP = None
AIMG_SH_ORDER = 10
AIMG_CIRCLE_RADIUS_DEG = 20
AIMG_POLYGON_MASK_THRESHOLD = 4e-5
AIMG_RESOLUTION = 360, 180
AIMG_N_JOBS = -1
AIMG_VERBOSITY = 50
# Amplitude distribution of the real STARSS23 training data; used to standardise
# amplitude values for synthetic data. Must not be changed (reference config.py:97-100).
AIMG_STARSS23_MU, AIMG_STARSS23_SIGMA = 0.0006131814582534336, 0.00048684798377322537

# ---------------------------------------------------------------------------
# TPU-specific configuration (no reference analog)
# ---------------------------------------------------------------------------
# Padded tensor sizes used when compiling a Scene into a fixed-shape render plan.
# XLA traces one program per unique shape; keeping these padded keeps recompiles rare.
MAX_EVENTS_PER_SCENE = 16
MAX_EMITTERS_PER_EVENT = 64  # trajectory points for moving events
MAX_IR_SECONDS = 1.0  # default simulated IR length kept on device
# Ray tracer defaults (mirrors the semantics of the reference's rlr config surface,
# reference tests/test_worldstate_rlr.py:810-835; values re-tuned for the JAX engine).
RAY_TRACER_DIRECT_RAY_COUNT = 500
RAY_TRACER_INDIRECT_RAY_COUNT = 5000
RAY_TRACER_INDIRECT_RAY_DEPTH = 200
RAY_TRACER_DIRECT_SH_ORDER = 3
RAY_TRACER_INDIRECT_SH_ORDER = 1
RAY_TRACER_FREQUENCY_BANDS = 4
RAY_TRACER_MAX_IR_LENGTH = 4.0
SPEED_OF_SOUND = 343.0
# Use the Pallas raycast kernels on TPU backends at any face count (VMEM-sized
# face tiles stream for large meshes); the chunked XLA path is the exact-match
# fallback on other backends
USE_PALLAS_RAYCAST = True
# Culled raycast kernels for the scanned-mesh tracer (big nonconvex meshes on
# TPU). Star occlusion measures 2-4x over dense (strong ~90% azimuth cull).
# The reachability/distance-ordered first-hit kernel is exact but measures AT
# PAR with the dense kernel on real workloads — its 512-lane ops lose the VPU
# efficiency of the 4096-lane dense tiles, and the early exit is governed by
# each block's worst (grazing) ray — so it stays off by default.
USE_STAR_OCCLUSION = True
USE_TILED_FIRST_HIT = False
# MXU-formulated first hit (ops/mxu_first_hit.py): Moller-Trumbore rewritten
# as (rays, 16) x (16, faces) matmuls. Ships DEFAULT-OFF as a documented
# negative result for the scanned-LOD regime: the matmul's bf16 input rounding
# noise is amplified by ~(room radius / face size) on the cancellation-prone
# barycentric numerators, and the min over thousands of noisy window tests
# selects the extreme noise — false hits teleport rays and collapse RT60
# (650 -> 407 ms measured on chip) despite self-face masking and exact plane-t
# re-evaluation. Precision fixes don't pay: Pallas supports only DEFAULT /
# HIGHEST dots, and HIGHEST (854 ms) or a 3-dot bf16x3 emulation costs the
# entire ~2.3 ms/bounce the MXU saved (581 vs 720 ms per 60-bounce scan).
# The kernel + tests remain for large-face meshes, where the amplification
# ratio is ~1 and bf16 selection is sound.
USE_MXU_FIRST_HIT = False
# Above this face count WorldStateRLR builds a uniform-grid acceleration
# structure (geometry.grid) — O(cells crossed) per ray instead of O(F) — the
# scanned-mesh regime; below it the dense VMEM-tiled Pallas kernels win.
GRID_ACCEL_MIN_FACES = 16384
# Face budget when the engine config's `mesh_simplification` field is True:
# the stochastic energy tail traces a vertex-clustered acoustic LOD of the
# room (geometry.mesh.TriMesh.simplified; ~30 cm cells on a 200 m^2 scan).
# Planar surfaces cluster losslessly (the walls/floor that carry the specular
# structure stay exact planes), sub-cell clutter is the statistical-scattering
# regime, and the Sabine area correction (worldstate.mesh_backend
# .face_props_device) preserves total absorbing power, i.e. RT60. The exact
# direct path always uses the full mesh. Measured IR energy stays within
# ~1 dB of the full-resolution trace (tests/test_simplification.py). Pass an
# int to `mesh_simplification` for an explicit budget or a float for an
# explicit voxel size.
MESH_SIMPLIFICATION_TARGET_FACES = 4096
# Device-mesh axis names used by audiblelight_tpu.parallel
MESH_AXIS_SCENE = "scene"  # data-parallel axis over scenes
MESH_AXIS_TIME = "time"  # within-scene axis (time blocks / capsule groups)
