"""Tests for the profiling/observability utilities."""

import json

import numpy as np

import jax.numpy as jnp

from audiblelight_tpu.profiling import Profiler, annotate, device_memory_stats


def test_profiler_stages():
    prof = Profiler(sync=False)
    with prof.stage("alpha"):
        sum(range(1000))
    with prof.stage("alpha"):
        sum(range(1000))
    with prof.stage("beta"):
        pass
    assert prof.stages["alpha"].calls == 2
    assert prof.stages["beta"].calls == 1
    assert prof.stages["alpha"].total_seconds >= 0
    report = prof.report()
    assert "alpha" in report and "beta" in report


def test_profiler_sync_with_device():
    prof = Profiler(sync=True)
    with prof.stage("matmul"):
        x = jnp.ones((256, 256))
        y = x @ x
        prof.block(y)
    assert prof.stages["matmul"].calls == 1
    assert prof.stages["matmul"].total_seconds > 0


def test_profiler_dump(tmp_path):
    prof = Profiler(sync=False)
    with prof.stage("s"):
        pass
    p = tmp_path / "prof.json"
    prof.dump(p)
    loaded = json.loads(p.read_text())
    assert "s" in loaded
    prof.reset()
    assert len(prof.stages) == 0


def test_annotate_context():
    with annotate("test-region"):
        _ = jnp.ones(8) * 2


def test_device_memory_stats():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
    assert len(stats) >= 1
