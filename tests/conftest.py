"""Test configuration: force an 8-device virtual CPU mesh before JAX initialises.

Tests validate numerics and multi-chip sharding on host CPU; real-TPU execution is
exercised by bench.py / __graft_entry__.py which do not import this module.
"""

import os

# The ambient environment pins JAX_PLATFORMS to the real TPU tunnel and a
# sitecustomize pre-imports jax at interpreter startup, so env vars alone are too
# late — jax.config.update is required as well (it is effective until the first
# backend initialisation).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

# Opt-in line coverage (AL_COVERAGE=1): register the sys.monitoring collector
# BEFORE audiblelight_tpu is imported so module-level lines count. See
# tools/al_coverage.py; report with tools/coverage_report.py.
if os.environ.get("AL_COVERAGE"):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from al_coverage import start_coverage  # noqa: E402

    start_coverage()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA:CPU compilation cache: the multi-device sharding tests spend
# most of their wall time compiling the same programs every run (~15 of the
# suite's ~29 minutes on a 1-core host). The cache is keyed by program + flags
# and kept CPU-only and machine-local (never shared with TPU processes — CPU
# AOT artifacts are machine-specific).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cpu_cache")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - cache is an optimisation only
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def sine_wav(tmp_path_factory):
    """A 1-second 440 Hz mono sine WAV at 44.1 kHz."""
    from audiblelight_tpu.io import wav_write

    path = tmp_path_factory.mktemp("audio") / "sine.wav"
    sr = 44100
    t = np.arange(sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    wav_write(path, audio, sr)
    return path


@pytest.fixture(scope="session")
def noise_wav(tmp_path_factory):
    """A 2-second stereo noise WAV at 22.05 kHz."""
    from audiblelight_tpu.io import wav_write

    path = tmp_path_factory.mktemp("audio") / "noise.wav"
    sr = 22050
    rng_ = np.random.default_rng(0)
    audio = (0.3 * rng_.standard_normal((2, 2 * sr))).astype(np.float32)
    wav_write(path, audio, sr, subtype="int16")
    return path
