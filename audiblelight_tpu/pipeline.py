"""The production render pipeline: Scene -> compiled device stems -> host mix.

ONE code path, used by `Scene.generate(compiled=True)`, the dataset scripts
(scripts/seld, scripts/ssseg) and bench.py — mirroring the reference's single
render path (reference synthesize.py:613-677) while keeping every FLOP on
device:

  1. `render.build_scene_plan` compiles the Scene into fixed-shape tensors
     (running the backend's RIR simulation if needed);
  2. `render.render_event_stems_arrays` renders every event's wet spatial stem
     in one jitted program (TI + TV convolution, IR normalisation, level chain)
     and `render.quantize_stems` packs them as int16 + per-stem scales — ~2x
     fewer host-link bytes than a mixed timeline;
  3. `render.mix_stems_host` places the stems additively into the scene
     timeline on the host (which must touch the samples anyway to write them).

`render_scenes_pipelined` overlaps host work with device work dispatch-ahead
style for dataset generation; `render_scene_audio_compiled` is the single-scene
entry that `Scene.generate(compiled=True)` uses.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Iterable, Iterator, Optional

import numpy as np

from audiblelight_tpu.render import (
    ScenePlan,
    build_scene_plan,
    mix_stems_host,
    quantize_stems,
    render_event_stems_arrays,
)

__all__ = [
    "mic_channel_spans",
    "stems_from_plan",
    "mix_plan_host",
    "render_scene_audio_compiled",
    "render_scenes_pipelined",
]


def mic_channel_spans(scene) -> list[tuple[str, int, int]]:
    """Per-mic (alias, start, end) spans into the plan's concatenated channel
    axis, in microphone registration order (the order build_scene_plan stacks)."""
    spans = []
    off = 0
    for alias, mic in scene.state.microphones.items():
        n = int(mic.n_channels)
        spans.append((alias, off, off + n))
        off += n
    return spans


def stems_from_plan(plan: ScenePlan):
    """Device stems for one plan: (int16 stems (E, C, S), float32 scales (E,)).

    Dispatches ONE jitted program; the result stays on device until the caller
    pulls it (dispatch-ahead pipelines rely on this)."""
    stems = render_event_stems_arrays(
        plan.static_audio,
        plan.static_irs,
        plan.static_mask,
        plan.static_snr,
        plan.static_len,
        plan.static_place_len,
        plan.moving_audio,
        plan.moving_irs,
        plan.moving_w,
        plan.moving_mask,
        plan.moving_snr,
        plan.moving_len,
        plan.moving_place_len,
        plan.ref_db,
    )
    return quantize_stems(stems)


def mix_plan_host(plan: ScenePlan, q, scales) -> np.ndarray:
    """Host completion for one plan: pull stems, additively mix with the
    pre-scaled ambience bed. Returns the (C_total, T) scene mix."""
    starts = np.concatenate(
        [np.asarray(plan.static_start), np.asarray(plan.moving_start)]
    )
    return mix_stems_host(
        np.asarray(q),
        np.asarray(scales),
        starts,
        plan.n_scene_samples,
        ambience=np.asarray(plan.ambience),
    )


def render_scene_audio_compiled(
    scene, plan: Optional[ScenePlan] = None, plan_kwargs: Optional[dict] = None
) -> "OrderedDict[str, np.ndarray]":
    """Render a Scene's per-mic audio through the compiled stem pipeline.

    Numerically matches the classic per-event path (render_scene_plan parity is
    asserted in tests/test_render_parallel.py) up to int16 stem quantisation
    (~1e-4 of each stem's peak, below the 16-bit WAV floor the files are
    written at).
    """
    if plan is None:
        plan = build_scene_plan(scene, **(plan_kwargs or {}))
    q, scales = stems_from_plan(plan)
    mixed = mix_plan_host(plan, q, scales)
    return OrderedDict(
        (alias, mixed[a:b]) for alias, a, b in mic_channel_spans(scene)
    )


def render_scenes_pipelined(
    scene_factory: Iterable,
    complete: Callable,
    max_in_flight: int = 4,
    plan_kwargs: Optional[dict] = None,
) -> int:
    """Dispatch-ahead dataset pipeline.

    `scene_factory` yields Scene objects (placement/audio loading happens in
    the iterator, on the host). Each scene is compiled to a plan (pass fixed
    bucket sizes via `plan_kwargs` — max_static/max_moving/max_traj/
    pad_audio_seconds — so every scene reuses ONE compiled stem program) and
    its stem program dispatched immediately (async); `complete(scene, audio_dict)` is
    called in order with the mixed per-mic audio once results are pulled. Up to
    `max_in_flight` scenes' device programs are queued ahead of the host, so
    placement/mix/IO for scene i overlap tracing/rendering for scenes i+1..N.

    Returns the number of scenes completed.
    """
    pending: list = []
    done = 0

    def _drain_one():
        nonlocal done
        scene, plan, q, scales = pending.pop(0)
        mixed = mix_plan_host(plan, q, scales)
        audio = OrderedDict(
            (alias, mixed[a:b]) for alias, a, b in mic_channel_spans(scene)
        )
        complete(scene, audio)
        done += 1

    it: Iterator = iter(scene_factory)
    while True:
        scene = next(it, None)
        if scene is None:
            break
        plan = build_scene_plan(scene, **(plan_kwargs or {}))
        q, scales = stems_from_plan(plan)
        for arr in (q, scales):
            try:
                arr.copy_to_host_async()
            except (AttributeError, NotImplementedError):  # pragma: no cover
                pass
        pending.append((scene, plan, q, scales))
        while len(pending) >= max_in_flight:
            _drain_one()
    while pending:
        _drain_one()
    return done
