"""Smoke-execute every example script (reference analog: the reference's
nbmake-tested notebooks, reference Makefile:25-27 — its tutorials run in CI, so
ours do too). Each example runs as a CPU subprocess into a temp dir; the test
asserts a clean exit and, where the example writes artifacts, that they exist.

Marked e2e: the `make tests` iteration tier skips these; `make tests-all` runs
them (pyproject.toml markers).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((REPO / "examples").glob("*.py"))

pytestmark = pytest.mark.e2e


def run_example(path: Path, tmp: Path, timeout: int = 900):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/al_jax_cache",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
        # Drop the axon sitecustomize: it force-selects the TPU tunnel and
        # ignores JAX_PLATFORMS=cpu (same rationale as test_scripts.run_script)
        PYTHONPATH=os.pathsep.join(
            p
            for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        )
        or str(REPO),
    )
    return subprocess.run(
        [sys.executable, str(path), str(tmp)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=str(REPO),
    )


def test_examples_exist():
    names = [p.name for p in EXAMPLES]
    assert len(names) >= 7, names


@pytest.mark.parametrize("path", EXAMPLES, ids=[p.stem for p in EXAMPLES])
def test_example_runs(path, tmp_path):
    res = run_example(path, tmp_path)
    assert res.returncode == 0, (
        f"{path.name} failed\n--- stdout ---\n{res.stdout[-4000:]}\n"
        f"--- stderr ---\n{res.stderr[-4000:]}"
    )
    # Examples that take an output dir should leave something behind
    produced = list(tmp_path.rglob("*"))
    if "sharded" not in path.stem and "augmentations" not in path.stem:
        assert produced, f"{path.name} wrote nothing into its output dir"
