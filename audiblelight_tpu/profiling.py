"""Tracing / profiling utilities: stage timers + jax.profiler integration.

The reference's observability is a wall-clock context manager and render-time log
lines (reference utils.py:40-62, synthesize.py:652-677). This module extends that
with per-stage device-time accounting (synchronised around device work so stage
attribution is real), cumulative counters for pipeline stages (trace / convolve /
mix / transfer / io), and optional XLA trace capture via jax.profiler for
TensorBoard inspection.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Generator, Optional, Union

from audiblelight_tpu.utils import logger


@dataclass
class StageStats:
    """Cumulative statistics for one pipeline stage."""

    calls: int = 0
    total_seconds: float = 0.0
    max_seconds: float = 0.0

    @property
    def mean_seconds(self) -> float:
        return self.total_seconds / self.calls if self.calls else 0.0


@dataclass
class Profiler:
    """Per-stage timing accumulator for the render pipeline.

    Usage:
        prof = Profiler(sync=True)
        with prof.stage("trace"):
            irs = trace_rirs_multi(...)
        with prof.stage("render"):
            out = render_scene_arrays(...)
        print(prof.report())

    With `sync=True` (default) each stage block ends with a
    jax.block_until_ready-style device sync so device work is attributed to the
    stage that launched it rather than wherever the host next blocks.
    """

    sync: bool = True
    stages: Dict[str, StageStats] = field(default_factory=lambda: defaultdict(StageStats))
    _last_result: Any = None

    @contextlib.contextmanager
    def stage(self, name: str) -> Generator[None, None, None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    import jax

                    # Enqueue a trivial op and block on it: device streams are
                    # in-order, so this drains all work launched in this stage.
                    jax.device_put(0.0).block_until_ready()
                except Exception:
                    pass
            elapsed = time.perf_counter() - start
            s = self.stages[name]
            s.calls += 1
            s.total_seconds += elapsed
            s.max_seconds = max(s.max_seconds, elapsed)

    def block(self, value: Any) -> Any:
        """Block on a jax value inside a stage to attribute its device time."""
        try:
            import jax

            jax.block_until_ready(value)
        except Exception:
            pass
        return value

    def report(self) -> str:
        """Human-readable per-stage summary, longest total first."""
        rows = sorted(self.stages.items(), key=lambda kv: -kv[1].total_seconds)
        lines = [f"{'stage':<16}{'calls':>7}{'total_s':>10}{'mean_s':>10}{'max_s':>10}"]
        for name, s in rows:
            lines.append(
                f"{name:<16}{s.calls:>7}{s.total_seconds:>10.3f}{s.mean_seconds:>10.4f}"
                f"{s.max_seconds:>10.4f}"
            )
        return "\n".join(lines)

    def to_dict(self) -> dict:
        """JSON-serialisable stage statistics."""
        return {
            name: dict(calls=s.calls, total_seconds=s.total_seconds, mean_seconds=s.mean_seconds)
            for name, s in self.stages.items()
        }

    def dump(self, path: Union[str, Path]) -> None:
        """Write stage statistics as JSON."""
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    def reset(self) -> None:
        self.stages.clear()


@contextlib.contextmanager
def xla_trace(log_dir: Union[str, Path], host_trace: bool = True):
    """Capture an XLA/TPU profile for the enclosed block (TensorBoard format).

    Wraps jax.profiler.trace; traces land under `log_dir` and can be inspected
    with TensorBoard's profile plugin or xprof.
    """
    import jax

    logger.warning(f"Capturing XLA trace to {log_dir}")
    with jax.profiler.trace(str(log_dir), create_perfetto_link=False):
        yield


def annotate(name: str):
    """jax.profiler.TraceAnnotation context for labelling regions in traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Optional[dict]:
    """Per-device memory statistics, when the backend exposes them."""
    import jax

    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
