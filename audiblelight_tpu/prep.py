"""Multiprocess scene-preparation pool — the production placement engine.

The dataset pipeline's host half (placement rejection sampling on the native
BVH, event audio load + augmentation, DCASE metadata + scene JSON
serialisation, fused-program input packing) is pure CPU work that the
reference runs inline in its serial per-scene loop
(reference scripts/seld/generate_dataset.py:330-376). Here it fans out over
worker PROCESSES so a multi-core host feeds the chip at the chip's rate; the
main process keeps only what must touch the accelerator (the rain-visibility
table, program dispatch) plus file writes of already-final bytes.

Workers run with `JAX_PLATFORMS=cpu` and the axon sitecustomize stripped from
PYTHONPATH, so they can never grab (or wedge) the TPU tunnel. Scene payloads
cross the pipe as numpy + strings only (a few MB/scene); Scene objects
themselves never pickle.

`workers=0` runs everything inline (no processes) — the degenerate case used
to measure the cores->throughput curve bench.py publishes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

__all__ = ["PreppedScene", "ScenePrepPool", "prep_scene", "render_prepped_scenes"]

# Plan-field order must match FusedSceneRenderer.plan_args
_PLAN_FIELDS = (
    "static_audio", "static_mask", "static_snr", "static_len",
    "static_place_len", "moving_audio", "moving_w", "moving_mask",
    "moving_snr", "moving_len", "moving_place_len", "ref_db",
)


@dataclass
class PreppedScene:
    """Everything the device + writer need for one scene: numpy and strings
    only (picklable, no Scene/WorldState/jax objects)."""

    index: int
    inputs: tuple  # (key u32[2], src, caps, s_idx, m_idx) numpy
    mic_pts: np.ndarray  # rain-table query points (1|C, 3)
    plan_fields: tuple  # numpy arrays in _PLAN_FIELDS order
    starts: np.ndarray  # (Es+Em,) int32 — device-mix placement offsets
    amb: tuple  # (on, beta, ref_db) float32 scalars
    n_scene_samples: int
    mic_alias: str
    csv_texts: dict  # {mic_alias: csv string}
    scene_json: str
    bucket_sources: int = 0  # padded source count this payload was packed for
    # Worker-computed (C_occ, F') rain-occlusion table (numpy bool), or None.
    # Computing it worker-side keeps the per-scene face_rain_occlusion
    # dispatch (a cache miss for every random mic position) off the main
    # process's device link; the driver falls back to computing it there
    # whenever the shape doesn't match its renderer's acoustic mesh.
    face_occ: Optional[np.ndarray] = None


def prep_scene(scene, index: int, plan_kwargs: dict, buckets: Optional[tuple] = None,
               bucket_sources: Optional[int] = None) -> PreppedScene:
    """Compile one placed Scene into its prepped payload (host work only).

    bucket_sources=None buckets the traced source count to its own next
    power of two — dataset runs with varying event layouts then group into a
    few compiled programs (16/32/64 sources) instead of one worst-case
    bucket; the driver keeps one renderer per bucket.
    """
    import json

    from audiblelight_tpu.pipeline import FusedSceneRenderer, fused_inputs_host
    from audiblelight_tpu.render import build_scene_plan
    from audiblelight_tpu.synthesize import generate_dcase2024_metadata

    if bucket_sources is None:
        n_src = len(scene.state._emitter_positions())
        bucket_sources = 1
        while bucket_sources < n_src:
            bucket_sources *= 2
    plan = build_scene_plan(
        scene, trace=False, device=False, build_ambience=False, **plan_kwargs
    )
    if buckets is None:  # derive (es, em, j, S) from the plan's own shapes
        buckets = (
            plan.static_irs.shape[0],
            plan.moving_irs.shape[0],
            plan.moving_irs.shape[2],
            int(plan.static_audio.shape[1]),
        )
    inputs, mic_pts = fused_inputs_host(scene, buckets, bucket_sources)
    starts, amb_on, amb_beta, amb_db = FusedSceneRenderer.mix_args(scene, plan)
    # Deferred-context scenes (add_to_context=False, the dataset-script mode)
    # fill emitter relative coordinates lazily at trace time; the DCASE
    # metadata needs them NOW — refresh explicitly (pure host bookkeeping).
    if hasattr(scene.state, "_update"):
        scene.state._update()
    csvs = {
        alias: df.to_csv(header=None)
        for alias, df in generate_dcase2024_metadata(scene).items()
    }
    # Rain-occlusion table for nonconvex rooms, computed HERE (worker CPU)
    # rather than on the driver's accelerator: the table depends only on the
    # acoustic mesh + mic position, both of which this process already has.
    face_occ = None
    ws = scene.state
    if (
        not getattr(ws.mesh, "is_convex", True)
        and hasattr(ws, "rain_occlusion_for")
        and ws._rain_mode() == "face"
    ):
        face_occ = np.asarray(ws.rain_occlusion_for(mic_pts))
    return PreppedScene(
        index=index,
        inputs=inputs,
        mic_pts=mic_pts,
        plan_fields=tuple(
            np.asarray(getattr(plan, f)) for f in _PLAN_FIELDS
        ),
        starts=starts,
        amb=(amb_on, amb_beta, amb_db),
        n_scene_samples=plan.n_scene_samples,
        mic_alias=next(iter(scene.state.microphones)),
        csv_texts=csvs,
        scene_json=json.dumps(scene.to_dict()),
        bucket_sources=int(bucket_sources),
        face_occ=face_occ,
    )


# ---------------------------------------------------------------------------
# Worker side
# ---------------------------------------------------------------------------

_WORKER_PREP = None


def _worker_init(builder_spec: str, builder_kwargs: dict):
    """Per-process initialiser: resolve "module:callable" and build the prep
    closure once (mesh load, fg-pool scan, ... amortised over the worker's
    lifetime)."""
    global _WORKER_PREP
    import importlib

    mod_name, fn_name = builder_spec.rsplit(":", 1)
    builder = getattr(importlib.import_module(mod_name), fn_name)
    _WORKER_PREP = builder(**builder_kwargs)


def _worker_task(args):
    index, seed = args
    return _WORKER_PREP(index, seed)


def _cpu_only_env() -> dict:
    """Environment for worker processes: CPU-only JAX, tunnel-free."""
    env = {}
    pythonpath = os.environ.get("PYTHONPATH", "")
    parts = [p for p in pythonpath.split(os.pathsep) if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    return env


class ScenePrepPool:
    """Ordered multiprocess map: (index, seed) -> PreppedScene.

    builder_spec: "module:callable"; the callable is invoked once per worker
    with **builder_kwargs and must return `prep(index, seed) -> PreppedScene`.
    With workers=0 the builder runs in-process and no pool is created.
    """

    def __init__(self, builder_spec: str, builder_kwargs: dict, workers: int = 0,
                 prefetch: int = 2):
        self.workers = int(workers)
        self.prefetch = max(int(prefetch), 1)
        self._pool = None
        if self.workers <= 0:
            _worker_init(builder_spec, builder_kwargs)
            return
        import multiprocessing as mp

        saved = {k: os.environ.get(k) for k in ("PYTHONPATH", "JAX_PLATFORMS")}
        os.environ.update(_cpu_only_env())
        try:
            ctx = mp.get_context("spawn")  # fork is unsafe after jax init
            self._pool = ctx.Pool(
                self.workers,
                initializer=_worker_init,
                initargs=(builder_spec, builder_kwargs),
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    def imap(self, tasks) -> Iterator[PreppedScene]:
        """Yield PreppedScenes in task order; tasks = iterable of (index, seed)."""
        if self._pool is None:
            for t in tasks:
                yield _worker_task(t)
            return
        # chunksize=1: scenes are coarse (~0.5 s each); latency matters more
        # than pickling overhead
        yield from self._pool.imap(_worker_task, tasks, chunksize=1)

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Main-process driver
# ---------------------------------------------------------------------------


def render_prepped_scenes(
    renderer,
    prepped_iter,
    complete,
    fused_batch: int = 4,
    max_in_flight: int = 8,
    sr: Optional[int] = None,
    mesh=None,
    mesh_axis: str = "scene",
    stats: Optional[dict] = None,
) -> int:
    """Drive the fused whole-scene-to-WAV program over a stream of
    PreppedScenes (typically a ScenePrepPool.imap).

    `renderer` is a FusedSceneRenderer built from a template scene sharing the
    mesh/mic rig/buckets. Each K-scene group dispatches ONE vmapped device
    program (trace -> stems -> timeline -> ambience -> int16); a completion
    thread pulls the (B, C, T) int16 payloads and calls
    `complete(prepped, wav_int16)` in order (WAV/CSV/JSON writes — all bytes
    are final, no float math left on the host).

    `renderer` may also be a CALLABLE `renderer_for(bucket_sources) ->
    FusedSceneRenderer`: payloads then group by their source bucket
    (PreppedScene.bucket_sources) and each bucket renders through its own
    compiled program — the variable-event-layout dataset regime.

    With `mesh` (a jax.sharding.Mesh) each group dispatches SHARDED over the
    mesh's `mesh_axis` — the multi-chip dataset path; fused_batch should be a
    multiple of the axis size (a trailing partial group falls back to
    single-device dispatch).

    `stats` (optional dict) receives a wall-clock decomposition, filled in
    place: prep_wait_s (time the dispatch thread starved waiting on the prep
    pool), dispatch_s (input staging + program dispatch), pull_s (device ->
    host payload waits on the completion thread), complete_s (file writes),
    n_scenes. The stage sums OVERLAP (three threads), so they do not add up
    to the wall time — the point is seeing which stage saturates.
    """
    import queue as _queue
    import threading
    import time as _time

    done = 0
    errors: list = []
    work: _queue.Queue = _queue.Queue(maxsize=max_in_flight)

    from audiblelight_tpu.pipeline import FusedSceneRenderer

    # A FusedSceneRenderer is itself callable (__call__ renders a scene), so
    # "factory" detection must be by type, not callable()
    if isinstance(renderer, FusedSceneRenderer):
        fixed = renderer
        renderer_for = lambda bucket: fixed  # noqa: E731
    else:
        renderer_for = renderer

    def _worker():
        nonlocal done
        while True:
            item = work.get()
            if item is None:
                return
            try:
                group, q = item
                t0 = _time.time()
                qn = np.asarray(q)  # one pull for the group
                _stats["pull_s"] += _time.time() - t0
                t0 = _time.time()
                for i, prepped in enumerate(group):
                    complete(prepped, qn[i])
                    done += 1
                _stats["complete_s"] += _time.time() - t0
            except Exception as exc:
                errors.append(exc)
            finally:
                work.task_done()

    thread = threading.Thread(target=_worker, daemon=True)
    thread.start()

    group: list = []
    group_bucket: Optional[int] = None

    def _dispatch(group, bucket):
        r = renderer_for(bucket)
        ws = r._ws
        n_faces = None
        inputs = []
        for p in group:
            if not r._occl:
                face_occ = _zero_occ(r)
            elif (
                getattr(p, "face_occ", None) is not None
                and p.face_occ.shape[-1]
                == (n_faces := n_faces or int(ws.acoustic_tris_device.shape[0]))
            ):
                # worker-computed table (numpy): rides the group's single
                # batched device_put in render_mix_batch
                face_occ = p.face_occ
            else:
                face_occ = ws.rain_occlusion_for(p.mic_pts)
            inputs.append(p.inputs[:3] + (face_occ,) + p.inputs[3:])
        extras = [(p.starts,) + p.amb for p in group]
        plans = [_PlanView(p.plan_fields) for p in group]
        if mesh is not None and len(group) % mesh.shape[mesh_axis] == 0:
            return r.render_mix_batch_sharded(inputs, plans, extras, mesh, mesh_axis)
        return r.render_mix_batch(inputs, plans, extras)

    def _emit(group, bucket):
        t0 = _time.time()
        q = _dispatch(group, bucket)
        try:
            q.copy_to_host_async()
        except (AttributeError, NotImplementedError):  # pragma: no cover
            pass
        _stats["dispatch_s"] += _time.time() - t0
        work.put((group, q))
        if errors:
            raise errors[0]

    _stats = {
        "prep_wait_s": 0.0, "dispatch_s": 0.0, "pull_s": 0.0,
        "complete_s": 0.0, "n_scenes": 0,
    }
    try:
        it = iter(prepped_iter)
        while True:
            t0 = _time.time()
            prepped = next(it, None)
            _stats["prep_wait_s"] += _time.time() - t0
            if prepped is None:
                break
            _stats["n_scenes"] += 1
            bucket = getattr(prepped, "bucket_sources", 0)
            if group and bucket != group_bucket:
                _emit(group, group_bucket)
                group = []
            group_bucket = bucket
            group.append(prepped)
            if len(group) == fused_batch:
                _emit(group, group_bucket)
                group = []
        if group:  # trailing partial group (one extra compile at that size)
            _emit(group, group_bucket)
        work.join()
        if errors:
            raise errors[0]
    finally:
        work.put(None)
        thread.join()
        if stats is not None:
            stats.update(_stats)
    return done


class _PlanView:
    """Duck-typed ScenePlan exposing exactly the fields plan_args reads."""

    def __init__(self, fields):
        for name, arr in zip(_PLAN_FIELDS, fields):
            setattr(self, name, arr)


def _zero_occ(renderer):
    """All-visible occlusion placeholder (convex rooms), cached per renderer
    — allocating it fresh per scene cost one device RPC each."""
    cached = getattr(renderer, "_zero_occ_cache", None)
    if cached is None:
        import jax.numpy as jnp

        ws = renderer._ws
        cached = renderer._zero_occ_cache = jnp.zeros(
            (1, ws.acoustic_tris_device.shape[0]), bool
        )
    return cached
