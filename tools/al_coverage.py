"""Line-coverage collector on sys.monitoring (PEP 669, Python >= 3.12).

The environment ships no coverage.py, and the reference gates merges on
coverage (reference codecov.yml:14-24, Makefile:21-23) — so the framework
carries its own collector. sys.monitoring LINE events cost one callback per
(code object, line) FIRST hit only: the callback records the line and returns
DISABLE for that location, so steady-state overhead is ~zero (unlike
sys.settrace, which fires on every line forever).

Usage (wired in tests/conftest.py):
    AL_COVERAGE=1 python -m pytest tests/ ...
Each process appends a JSON file of hit lines under .coverage_al/; merge and
report with tools/coverage_report.py. Parallel/batched pytest runs compose —
every process writes its own file keyed by pid+timestamp.
"""

from __future__ import annotations

import atexit
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG_ROOT = str(REPO / "audiblelight_tpu")
OUT_DIR = Path(os.environ.get("AL_COVERAGE_DIR", REPO / ".coverage_al"))

_TOOL_ID = sys.monitoring.COVERAGE_ID
_hits: dict[str, set[int]] = {}
_started = False


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG_ROOT):
        _hits.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE  # one event per location is enough


def start_coverage() -> None:
    """Begin collecting; idempotent. Call before the package is imported so
    module-level lines (defs, constants) are counted."""
    global _started
    if _started:
        return
    _started = True
    mon = sys.monitoring
    mon.use_tool_id(_TOOL_ID, "al_coverage")
    mon.register_callback(_TOOL_ID, mon.events.LINE, _on_line)
    mon.set_events(_TOOL_ID, mon.events.LINE)
    atexit.register(dump_coverage)


def dump_coverage() -> Path | None:
    """Write this process's hit lines as one JSON file; returns the path."""
    if not _hits:
        return None
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    out = OUT_DIR / f"cov-{os.getpid()}-{int(time.time() * 1000)}.json"
    payload = {fn: sorted(lines) for fn, lines in _hits.items()}
    out.write_text(json.dumps(payload))
    return out


def executable_lines(path: str | Path) -> set[int]:
    """All line numbers the compiler can attribute code to, found by walking
    every code object (functions, lambdas, comprehensions) reachable from the
    module's compiled form — the denominator for coverage%."""
    src = Path(path).read_text()
    try:
        top = compile(src, str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, line in code.co_lines():
            if line is not None and line > 0:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # Docstring-only and def/class header lines are reported by co_lines, so
    # they count; that matches coverage.py's default behaviour closely enough.
    return lines
