"""Utility functions shared across the package.

Provides the same helper surface as the reference (audiblelight/utils.py): coordinate
transforms, sanitisers, trajectory generators, alias helpers, kwargs validation and
parallel-run helpers — implemented fresh for a JAX-first stack (explicit RNG plumbing,
no torch dependency; seeding covers numpy + python + JAX keys).
"""

from __future__ import annotations

import inspect
import json
import logging
import os
import random
from contextlib import contextmanager
from importlib import import_module, resources
from pathlib import Path
from time import time
from typing import Any, Callable, Generator, Optional, Union

import numpy as np

from audiblelight_tpu.custom_types import (
    NUMERIC_DTYPES,
    DistributionLike,
    DistributionWrapper,
    Numeric,
)

logger = logging.getLogger("audiblelight_tpu")
if not logger.handlers:  # pragma: no cover - configured once per process
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s | %(levelname)s | %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("AUDIBLELIGHT_TPU_LOGLEVEL", "WARNING"))

# Seed used for randomisation
SEED = 42
# Tolerance constant for approximate comparisons (reference utils.py:37)
SMALL = 1e-4


@contextmanager
def timer(name: str) -> Generator[None, Any, None]:  # pragma: no cover
    """Log how long it takes to execute the wrapped block."""
    start = time()
    try:
        yield
    except Exception as e:
        logger.warning(f"Took {time() - start:.2f} seconds to {name} and raised {e}.")
        raise
    else:
        logger.debug(f"Took {time() - start:.2f} seconds to {name}.")


def ensure_native_lib(src: Path, so: Path, build_cmd: list[str]) -> None:
    """Build a native shared library from ``src`` into ``so`` when stale.

    Staleness is judged by a CONTENT HASH of the source recorded in a sidecar
    file at build time (``<so>.srchash``), not mtimes — archive extraction and
    checkouts freshen mtimes routinely, and a silently-served stale prebuilt
    must at least be visible. On a rebuild failure with a prebuilt ``so``
    present, logs at WARNING (the caller then loads the possibly-stale
    binary); with no prebuilt, re-raises.
    """
    import hashlib
    import subprocess

    sidecar = so.with_suffix(so.suffix + ".srchash")
    try:
        src_hash = hashlib.sha256(src.read_bytes()).hexdigest()
    except OSError:  # source missing (binary-only deployment): use the .so as-is
        if not so.is_file():
            raise
        return
    recorded = None
    try:
        recorded = sidecar.read_text().strip()
    except OSError:
        pass
    if so.is_file() and recorded == src_hash:
        return
    try:
        subprocess.run(build_cmd, check=True, capture_output=True, timeout=120)
        try:
            sidecar.write_text(src_hash)
        except OSError:  # read-only checkout: hash check re-runs next load
            pass
    except Exception as build_exc:
        if not so.is_file():
            raise
        logger.warning(
            f"Native rebuild of {so.name} failed ({build_exc}); loading the "
            f"prebuilt binary, which does NOT match the current source "
            f"({src.name} hash {src_hash[:12]} vs recorded {str(recorded)[:12]})"
            if recorded != src_hash
            else f"Native rebuild of {so.name} failed ({build_exc}); loading the prebuilt binary"
        )


def coerce2d(array: Union[list, np.ndarray]) -> np.ndarray:
    """Coerces an input to a 2D numpy array (a 1D input becomes a single row)."""
    if isinstance(array, list):
        array = np.array(array)
    if array.ndim == 1:
        array = array[None, :]
    if array.ndim != 2:
        raise ValueError(f"Expected a 1- or 2D array, but got {array.ndim}D array")
    return array


def seed_everything(seed: int = SEED) -> None:
    """Seed python, numpy (and torch if importable) global RNG state."""
    random.seed(seed)
    np.random.seed(seed)
    try:  # pragma: no cover - torch is optional in this stack
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def rng_key(seed: int = SEED):
    """Return a JAX PRNG key for the given seed (the JAX-first analog of seeding)."""
    import jax

    return jax.random.PRNGKey(seed)


def get_project_root() -> Path:  # pragma: no cover
    """Returns the root directory of the project."""
    return Path(str(resources.files("audiblelight_tpu"))).parent


# ---------------------------------------------------------------------------
# Coordinate transforms
#
# Conventions (identical to reference utils.py:94-150):
#   Azimuth: degrees, increasing counter-clockwise from the front (+x axis);
#            azimuth=90 == left (+y).
#   Elevation: degrees in [-90, 90]; 0 = horizontal, 90 = up (+z), -90 = down.
#   Radius: metres, unbounded.
# ---------------------------------------------------------------------------


def polar_to_cartesian(spherical_array: np.ndarray) -> np.ndarray:
    """Convert (azimuth°, elevation°, radius) rows to Cartesian (XYZ) rows."""
    spherical_array = coerce2d(np.asarray(spherical_array, dtype=float))
    if not np.all(np.abs(spherical_array[:, 1]) <= 90):
        raise ValueError("Invalid elevation angle: expected values in [-90, 90]")

    az = np.deg2rad(spherical_array[:, 0])
    el = np.deg2rad(spherical_array[:, 1])
    r = spherical_array[:, 2]

    cos_el = np.cos(el)
    return np.column_stack((r * cos_el * np.cos(az), r * cos_el * np.sin(az), r * np.sin(el)))


def cartesian_to_polar(cartesian_array: np.ndarray) -> np.ndarray:
    """Convert Cartesian (XYZ) rows to (azimuth°, elevation°, radius) rows."""
    cartesian_array = coerce2d(np.asarray(cartesian_array, dtype=float))
    x, y, z = cartesian_array[:, 0], cartesian_array[:, 1], cartesian_array[:, 2]
    r = np.sqrt(x**2 + y**2 + z**2)
    if not np.all(r > 0):
        raise ValueError(f"Expected radius > 0, but got radius = {r}")
    az = np.rad2deg(np.arctan2(y, x))
    el = np.rad2deg(np.arcsin(z / r))
    return np.column_stack((az, el, r))


def center_coordinates(cartesian_array: np.ndarray) -> np.ndarray:
    """Subtract the centroid so coordinates are centred around the origin."""
    return cartesian_array - np.mean(cartesian_array, axis=0)


def check_all_lens_equal(*iterables) -> bool:
    """True if all iterables share the same length."""
    return len({len(i) for i in iterables}) == 1


# ---------------------------------------------------------------------------
# Sanitisers
# ---------------------------------------------------------------------------


def sanitise_filepath(filepath: Any) -> Path:
    """Validate that a filepath exists on disk and coerce to Path."""
    if isinstance(filepath, (str, Path)):
        filepath = Path(filepath)
        if not filepath.is_file():
            raise FileNotFoundError(f"Cannot find file at {filepath}, does it exist?")
        return filepath
    raise TypeError(
        f"Expected filepath to be either a string or Path object, but got {type(filepath)}"
    )


def sanitise_filepaths(filepaths: list[Any]) -> list[Path]:
    """Equivalent to [sanitise_filepath(fp) for fp in filepaths]."""
    return [sanitise_filepath(fp) for fp in filepaths]


def sanitise_directory(directory: Any, create_if_missing: bool = False) -> Path:
    """Validate that a directory exists (optionally creating it) and coerce to Path."""
    if isinstance(directory, (str, Path)):
        directory = Path(directory)
        if not directory.is_dir():
            if create_if_missing:
                directory.mkdir(parents=True, exist_ok=True)
                return directory
            raise FileNotFoundError(f"Cannot find directory at {directory}, does it exist?")
        if not any(directory.iterdir()):
            logger.warning(f"Directory {directory} does not contain any files!")
        return directory
    raise TypeError(
        f"Expected directory to be either a string or Path object, but got {type(directory)}"
    )


def sanitise_directories(directories: list[Any], create_if_missing: bool = False) -> list[Path]:
    """Equivalent to [sanitise_directory(d) for d in directories]."""
    return [sanitise_directory(d, create_if_missing) for d in directories]


def sanitise_positive_number(x: Any, cast_to: type = float) -> Optional[Numeric]:
    """Validate that `x` is a non-negative numeric input; coerce to `cast_to`."""
    if isinstance(x, NUMERIC_DTYPES) and not isinstance(x, bool):
        if x >= 0.0:
            return cast_to(x)
        raise ValueError(f"Expected a positive numeric input, but got {x}")
    raise TypeError(f"Expected a positive numeric input, but got {type(x)}")


def sanitise_coordinates(x: Any) -> Optional[np.ndarray]:
    """Validate that `x` is an (3,) XYZ coordinate array."""
    if isinstance(x, (np.ndarray, list, tuple)):
        x = np.asarray(x, dtype=float)
        if x.shape != (3,):
            raise ValueError(f"Expected a shape of (3,), but got {x.shape}")
        return x
    raise TypeError(f"Expected a list or array input, but got {type(x)}")


def sanitise_distribution(x: Any) -> Optional[Union[DistributionLike, DistributionWrapper]]:
    """Validate that `x` is scipy-distribution-like, a numeric callable, or None."""
    if x is None:
        return x
    if hasattr(x, "rvs") and callable(x.rvs):
        return DistributionWrapper(x.rvs)
    if callable(x):
        try:
            test_sample = x()
        except Exception as e:
            raise TypeError("Callable could not be evaluated during distribution validation") from e
        if isinstance(test_sample, NUMERIC_DTYPES):
            return DistributionWrapper(x)
        raise TypeError("Callable must return a numeric value to be used as a distribution")
    raise TypeError(
        f"Expected a distribution-like object or a callable returning floats, but got: {type(x)}"
    )


def get_default_alias(prefix: str, objects: dict[str, Any], zfill_ints: int = 3) -> str:
    """Return a default alias "{prefix}{idx:0{zfill}}" based on how many objects exist."""
    test_alias = f"{prefix}{str(len(objects)).zfill(zfill_ints)}"
    if test_alias in objects:
        raise KeyError(f"Alias {test_alias} already exists in dictionary!")
    return test_alias


def repr_as_json(cls: object) -> str:
    """Dump `cls.to_dict()` to a formatted JSON string (used by `__repr__`s)."""
    if hasattr(cls, "to_dict") and callable(cls.to_dict):
        return json.dumps(cls.to_dict(), indent=4, ensure_ascii=False, sort_keys=False)
    raise AttributeError(f"Class {cls.__class__.__name__} has no attribute 'to_dict'")


def list_all_directories(root_dir: Union[str, Path]) -> list[str]:
    """Recursively return all directory paths under root_dir."""
    root_path = Path(root_dir)
    if not root_path.exists():
        raise FileNotFoundError(f"Directory '{root_dir}' does not exist")
    if not root_path.is_dir():
        raise ValueError(f"'{root_dir}' is not a directory")
    return [str(p.resolve()) for p in root_path.rglob("*") if p.is_dir()]


def list_deepest_directories(root_dir: Union[str, Path]) -> list[str]:
    """Return only the deepest (leaf) directories under root_dir."""
    all_dirs = sorted([Path(p) for p in list_all_directories(root_dir)], key=lambda p: len(str(p)))
    deepest = []
    for d in all_dirs:
        if not any(other != d and str(other).startswith(str(d) + os.sep) for other in all_dirs):
            deepest.append(str(d.resolve()))
    return deepest


def list_innermost_directory_names(root_dir: Union[str, Path]) -> list[str]:
    """Names (not paths) of the deepest directories under root_dir."""
    return [Path(p).name for p in list_deepest_directories(root_dir)]


def list_innermost_directory_names_unique(root_dir: Union[str, Path]) -> set:
    """Unique names of the deepest directories under root_dir."""
    return {Path(p).name for p in list_deepest_directories(root_dir)}


def sample_distribution(
    distribution: Union[DistributionLike, Callable, None] = None,
    override: Union[Numeric, None] = None,
) -> float:
    """Sample from a probability distribution, or return the provided override."""
    distribution = sanitise_distribution(distribution)
    if distribution is None and override is None:
        raise ValueError("Must provide either a probability distribution to sample from or an override")
    if override is None:
        return distribution.rvs()
    if isinstance(override, NUMERIC_DTYPES):
        return override
    raise TypeError(f"Expected a numeric input for `override` but got {type(override)}")


def get_valid_kwargs(func: Callable) -> set[str]:
    """Names of all valid keyword arguments for `func` (empty set if it takes **kwargs)."""
    if not callable(func):
        raise TypeError("`func` must be a callable")
    params = inspect.signature(func).parameters
    if any(p.kind == p.VAR_KEYWORD for p in params.values()):
        return set()
    return {
        name
        for name, param in params.items()
        if param.kind in (param.KEYWORD_ONLY, param.POSITIONAL_OR_KEYWORD)
    }


def validate_kwargs(func: Callable, **kwargs) -> None:
    """Validate that the given kwargs are acceptable keyword arguments for `func`."""
    valid_kwargs = get_valid_kwargs(func)
    if not valid_kwargs:
        raise ValueError("`func` must have at least one named keyword argument")
    for kwarg in kwargs:
        if kwarg not in valid_kwargs:
            raise AttributeError(f"`{kwarg}` is not a valid keyword argument for `{func.__name__}`")


def validate_shape(shape_a: tuple, shape_b: tuple) -> None:
    """Validate two shapes are compatible; `None` entries match anything."""
    max_len = max(len(shape_a), len(shape_b))
    padded_a = tuple(shape_a) + (None,) * (max_len - len(shape_a))
    padded_b = tuple(shape_b) + (None,) * (max_len - len(shape_b))
    for i, (a, b) in enumerate(zip(padded_a, padded_b)):
        if a is not None and b is not None and a != b:
            raise ValueError(
                f"Incompatible shapes at index {i}: {a} != {b} (full shapes: {padded_a} vs {padded_b})"
            )


# ---------------------------------------------------------------------------
# Trajectory generators (reference utils.py:506-664 semantics)
# ---------------------------------------------------------------------------


def generate_linear_trajectory(
    xyz_start: np.ndarray, xyz_end: np.ndarray, n_points: int
) -> np.ndarray:
    """Linear trajectory between a start and end coordinate with `n_points` points."""
    return np.linspace(np.asarray(xyz_start, float), np.asarray(xyz_end, float), n_points)


def generate_semicircular_trajectory(
    xyz_start: np.ndarray, xyz_end: np.ndarray, n_points: int
) -> np.ndarray:
    """Semicircular arc between start and end, in a plane containing both."""
    xyz_start = np.asarray(xyz_start, float)
    xyz_end = np.asarray(xyz_end, float)
    chord = xyz_end - xyz_start
    midpoint = xyz_start + chord / 2
    radius = np.linalg.norm(chord) / 2

    if np.allclose(chord, 0.0):
        normal = np.array([1.0, 0.0, 0.0])
    else:
        guess = np.array([1.0, 0.0, 0.0])
        if np.cross(guess, chord).any():
            normal = np.cross(chord, guess)
        else:
            normal = np.cross(chord, np.array([0.0, 1.0, 0.0]))
        normal = normal / np.linalg.norm(normal)

    if radius == 0:
        return np.tile(xyz_start, (n_points, 1))

    vec1 = chord / (2 * radius)
    vec2 = np.cross(normal, vec1)
    angles = np.linspace(np.pi, 0, n_points)
    return midpoint + radius * (np.cos(angles)[:, None] * vec1 + np.sin(angles)[:, None] * vec2)


def generate_random_trajectory(
    xyz_start: np.ndarray,
    max_step: Numeric,
    n_points: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """3D random walk from `xyz_start` with `n_points` points, each step <= `max_step`."""
    if max_step <= 0.0:
        raise ValueError(f"Maximum step must be greater than 0 but got {max_step}")
    rand = rng if rng is not None else np.random
    directions = rand.normal(size=(n_points - 1, 3))
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    step_lengths = rand.uniform(0, max_step, size=(n_points - 1, 1))
    walk = np.asarray(xyz_start, float) + np.cumsum(directions * step_lengths, axis=0)
    return np.vstack([xyz_start, walk])


def generate_sinusoidal_trajectory(
    xyz_start: np.ndarray,
    xyz_end: np.ndarray,
    n_points: int,
    amplitude: float = None,
    frequency: int = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Sinusoidal trajectory between start and end; amplitude/frequency sampled if None."""
    rand = rng if rng is not None else np.random
    if amplitude is None:
        amplitude = rand.uniform(0.01, 0.5)
    if frequency is None:
        frequency = int(rand.integers(1, 4)) if rng is not None else np.random.randint(1, 4)

    xyz_start = np.asarray(xyz_start, float)
    xyz_end = np.asarray(xyz_end, float)
    baseline = xyz_end - xyz_start
    length = np.linalg.norm(baseline)
    direction = baseline / length

    if np.allclose(direction, [0, 0, 1]):
        perp1 = np.array([1.0, 0.0, 0.0])
    else:
        perp1 = np.cross(direction, [0.0, 0.0, 1.0])
        perp1 /= np.linalg.norm(perp1)
    perp2 = np.cross(direction, perp1)

    t = np.linspace(0, 1, n_points)
    points = xyz_start + np.outer(t, baseline)
    sine_wave = np.sin(2 * np.pi * frequency * t)
    points = points + amplitude * (np.outer(sine_wave, perp1) + np.outer(sine_wave, perp2))
    return points


def generate_sawtooth_trajectory(
    xyz_start: np.ndarray,
    xyz_end: np.ndarray,
    n_points: int,
    amplitude: float = None,
    frequency: int = None,
    plane: Optional[str] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Sawtooth (zigzag) trajectory between start and end points."""
    rand = rng if rng is not None else np.random
    if amplitude is None:
        amplitude = rand.uniform(0.01, 0.5)
    if frequency is None:
        frequency = int(rand.integers(1, 4)) if rng is not None else np.random.randint(1, 4)
    if plane is None:
        plane = rand.choice(["xy", "xz", "yz"])

    xyz_start = np.asarray(xyz_start, float)
    xyz_end = np.asarray(xyz_end, float)
    t = np.linspace(0, 1, n_points)
    trajectory = (1 - t)[:, None] * xyz_start + t[:, None] * xyz_end
    zigzag = amplitude * np.sign(np.sin(2 * np.pi * frequency * t))

    if plane in ("xy", "xz"):
        trajectory[:, 0] += zigzag
    elif plane == "yz":
        trajectory[:, 1] += zigzag
    else:
        raise ValueError(f"Invalid plane: {plane}. Must be 'xy', 'xz', or 'yz'.")
    return trajectory


TRAJECTORY_SHAPES = ("linear", "semicircular", "random", "sinusoidal", "sawtooth")


def pad_or_truncate_audio(
    audio: np.ndarray, desired_samples: Numeric, pad_mode: str = "constant"
) -> np.ndarray:
    """Pad or truncate a (channels, samples) array to the desired number of samples."""
    desired_samples = int(desired_samples)
    if audio.shape[1] < desired_samples:
        return np.pad(audio, ((0, 0), (0, desired_samples - audio.shape[1])), mode=pad_mode)
    if audio.shape[1] > desired_samples:
        return audio[:, :desired_samples]
    return audio


def tiny(x: Union[float, np.ndarray]) -> Numeric:
    """Tiny-value for an input's dtype; prevents underflow / divide-by-zero."""
    x = np.asarray(x)
    if np.issubdtype(x.dtype, np.floating) or np.issubdtype(x.dtype, np.complexfloating):
        dtype = x.dtype
    else:
        dtype = np.dtype(np.float32)
    return np.finfo(dtype).tiny


def coerce_nested_inputs(inp: Any) -> Any:
    """Coerce nested numpy values to JSON-serialisable python types."""
    if isinstance(inp, dict):
        return {k: coerce_nested_inputs(v) for k, v in inp.items()} if inp else None
    if isinstance(inp, np.ndarray):
        return inp.tolist()
    if isinstance(inp, (np.floating, np.integer)):
        return inp.item()
    return inp


def safe_import(module_name: str, message: str = None) -> Any:
    """Safe import for an optional dependency, with custom error message support."""
    try:
        return import_module(module_name)
    except (ImportError, ModuleNotFoundError):
        if message is None:
            message = f"Cannot import module '{module_name}': try running 'pip install {module_name}'"
        raise ImportError(message)


def dynamic_parallel_run(
    func: Callable,
    args_list: Optional[list[tuple]] = None,
    kwargs_list: Optional[list[dict]] = None,
    n_jobs: Optional[Numeric] = None,
    verbosity: Optional[Numeric] = None,
):
    """Run `func` over argument tuples in parallel, degrading worker count on failure.

    Mirrors the behaviour of reference utils.py:735-796 (joblib with worker halving on
    TerminatedWorkerError, serial fallback). Primarily used by host-side code; the
    device path uses vmap/pjit batching instead of process pools.
    """
    if args_list is None:
        args_list = []
    if kwargs_list is None:
        kwargs_list = [{} for _ in args_list]

    if n_jobs is None:
        from audiblelight_tpu.config import AIMG_N_JOBS

        n_jobs = AIMG_N_JOBS
    if n_jobs == -1:
        n_jobs = os.cpu_count() or 1

    current_jobs = sanitise_positive_number(n_jobs, cast_to=int)
    verbosity = sanitise_positive_number(verbosity or 0, cast_to=int)

    try:
        from joblib import Parallel, delayed
        from joblib.externals.loky.process_executor import TerminatedWorkerError
    except ImportError:  # pragma: no cover
        current_jobs = 1
        TerminatedWorkerError = Exception

    while current_jobs > 1:
        try:
            logger.info(f"Trying with n_jobs={current_jobs}...")
            return Parallel(n_jobs=current_jobs, verbose=verbosity)(
                delayed(func)(*args_, **kwargs_)
                for args_, kwargs_ in zip(args_list, kwargs_list)
            )
        except TerminatedWorkerError:
            current_jobs = max(1, current_jobs // 2)
            logger.error(f"Workers terminated; reducing workers to {current_jobs}...")
            if current_jobs == 1:
                break

    logger.info("Falling back to serial execution...")
    return [func(*args_, **kwargs_) for args_, kwargs_ in zip(args_list, kwargs_list)]
