"""The production render pipeline: Scene -> compiled device stems -> host mix.

ONE code path, used by `Scene.generate(compiled=True)`, the dataset scripts
(scripts/seld; scripts/ssseg keeps the classic per-event path because its
dry-stem outputs are event-level artifacts) and bench.py — mirroring the reference's single
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
    "FusedSceneRenderer",
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


class FusedSceneRenderer:
    """ONE device program rendering a whole scene: RIR trace -> event gather ->
    stems -> int16 quantise.

    The plan pipeline issues ~20 separate device calls per scene (the trace,
    the eager IR packing slices, the stem program, the quantise); through a
    high-latency host link the dispatch issue time alone caps throughput. Here
    everything runs as ONE jitted program whose per-scene quantities are
    *inputs*: the PRNG key, padded source positions, listener capsules, the
    event->emitter gather maps (so variable
    event counts and trajectory lengths within the bucket work), and the
    plan's audio/weight/level tensors. Scene geometry, materials, and the rlr
    config are captured as constants — every scene rendered through one
    instance must share the template scene's mesh, mic rig, and bucket shapes
    (`compatible()` checks; the dataset-run bucketing contract).

    Restrictions: single microphone, RLR backend, and (for nonconvex meshes)
    per-face rain visibility — `rain_visibility="face"` or "auto" with
    mesh_simplification on. Numerics: the trace is driven by the same
    worldstate PRNG-key walk as `trace_irs_device`, but XLA fuses the whole
    pipeline into one program, so float accumulation order differs from the
    plan path — stems match to ~1e-3 of peak (asserted in
    tests/test_pipeline.py), not bitwise.
    """

    def __init__(self, scene, plan: ScenePlan):
        import jax
        import jax.numpy as jnp

        ws = scene.state
        if len(ws.microphones) != 1 or not hasattr(ws, "acoustic_tris_device"):
            raise ValueError("fused renderer requires a single-mic RLR scene")
        mic = next(iter(ws.microphones.values()))
        occl = not ws.mesh.is_convex
        if occl and ws._rain_mode() != "face":
            raise ValueError(
                "fused renderer on a nonconvex mesh needs per-face rain "
                'visibility (rain_visibility="face", or "auto" with '
                "mesh_simplification on)"
            )
        self._ws = ws
        self._mic_layout = mic.channel_layout_type
        if mic.channel_layout_type == "mic":
            encoding = "omni"
        else:
            encoding = {"foa": "foa", "hoa2": "sh2", "hoa3": "sh3"}.get(
                mic.channel_layout_type, "binaural"
            )

        atris = ws.acoustic_tris_device
        amesh = ws.acoustic_mesh
        # Normals precomputed OUTSIDE the fused program — computing them
        # inside a larger fused jit miscompiles on the axon backend (see
        # rir.raytracer module note).
        normals = jnp.asarray(amesh.face_normals.astype(np.float32))
        absorption, scattering, face_tau = ws.face_props_device
        full_tris = ws.tris_device
        simplified = atris is not full_tris
        cfg = ws.cfg
        sr = int(ws.sample_rate)
        n_samples = int(round(float(cfg.max_ir_length) * sr))
        mesh_tiles = None if simplified else ws.mesh_tiles
        # Full-mesh placement grid for the direct/diffraction occlusion
        # segments (interior-origin regime; see trace_rirs_multi.accel_direct)
        accel_direct = ws.grid_accel if occl else None

        n_src = len(ws._emitter_positions())
        bucket = 1
        while bucket < n_src:
            bucket *= 2
        self._bucket = bucket
        self._mesh_id = id(ws.mesh)
        self._n_faces = int(ws.mesh.faces.shape[0])
        self._occl = occl
        self._shared_vis = bool(cfg.shared_visibility)
        # Acoustic identity beyond the mesh object: the engine config,
        # material and sample rate are all baked into the compiled program as
        # constants — compatible() must reject scenes that vary any of them.
        self._cfg_dict = dict(cfg.to_dict())
        self._material = getattr(ws, "material", None)
        self._sr = sr
        self._buckets = (
            plan.static_irs.shape[0],
            plan.moving_irs.shape[0],
            plan.moving_irs.shape[2],
            int(plan.static_audio.shape[1]),
        )
        es, em, j, _ = self._buckets

        from audiblelight_tpu.render import render_event_stems_arrays

        shared_vis = bool(cfg.shared_visibility)

        def render(key, sources, listeners, face_occ, s_idx, m_idx,
                   static_audio, static_mask, static_snr, static_len,
                   static_place_len, moving_audio, moving_w, moving_mask,
                   moving_snr, moving_len, moving_place_len, ref_db):
            from audiblelight_tpu.rir.raytracer import trace_rirs_multi

            irs = trace_rirs_multi(
                key, atris, absorption, scattering, sources, listeners,
                n_samples=n_samples, sr=sr,
                n_rays=int(cfg.indirect_ray_count),
                max_depth=min(int(cfg.indirect_ray_depth), 200),
                bin_dt=float(cfg.hist_bin_dt),
                c=float(cfg.speed_of_sound),
                encoding=encoding,
                occlusion=occl,
                tri_normals=normals,
                face_transmission=face_tau,
                transmission=bool(cfg.transmission),
                shared_visibility=bool(cfg.shared_visibility),
                face_occlusion=face_occ if occl else None,
                mesh_tiles=mesh_tiles,
                tris_direct=full_tris if simplified else None,
                sh_order_direct=int(cfg.direct_sh_order),
                sh_order_indirect=int(cfg.indirect_sh_order),
                diffraction=bool(cfg.diffraction),
                accel_direct=accel_direct,
                decimate=bool(getattr(cfg, "ray_decimation", False)),
            )  # (C, bucket, S)
            # Event->emitter gathers: -1 marks an empty slot (padded events /
            # trajectory tails), zeroed after a clamped gather.
            s_irs = jnp.take(irs, jnp.clip(s_idx, 0), axis=1)  # (C, es, S)
            s_irs = jnp.where((s_idx >= 0)[None, :, None], s_irs, 0.0)
            s_irs = s_irs.transpose(1, 0, 2)  # (es, C, S)
            m_flat = jnp.take(irs, jnp.clip(m_idx, 0).reshape(-1), axis=1)
            m_irs = m_flat.reshape(irs.shape[0], em, j, irs.shape[-1])
            m_irs = jnp.where((m_idx >= 0)[None, :, :, None], m_irs, 0.0)
            m_irs = m_irs.transpose(1, 0, 2, 3)  # (em, C, j, S)

            stems = render_event_stems_arrays(
                static_audio, s_irs, static_mask, static_snr,
                static_len, static_place_len,
                moving_audio, m_irs, moving_w, moving_mask, moving_snr,
                moving_len, moving_place_len, ref_db,
            )
            return quantize_stems(stems)

        self._body = render  # unjitted whole-scene program (shard_map/vmap composable)
        self._render = jax.jit(render)

    def compatible(self, scene, plan: ScenePlan) -> bool:
        """Can `scene` render through this compiled program? Same mesh object,
        material, engine config and sample rate (all captured as compiled
        constants), same mic rig + bucket shapes, and a source count within
        the bucket."""
        ws = scene.state
        if len(ws.microphones) != 1 or not hasattr(ws, "acoustic_tris_device"):
            return False
        mic = next(iter(ws.microphones.values()))
        buckets = (
            plan.static_irs.shape[0],
            plan.moving_irs.shape[0],
            plan.moving_irs.shape[2],
            int(plan.static_audio.shape[1]),
        )
        # The plan may have been built with pinned buckets SMALLER than the
        # scene's event layout (build_scene_plan truncates with a warning);
        # rendering it fused would silently drop events, so reject — the
        # pipeline's fallback then rebuilds the plan with auto-sized buckets.
        es, em, j, _ = self._buckets
        n_static = sum(1 for e in scene.events.values() if not e.is_moving)
        n_moving = sum(1 for e in scene.events.values() if e.is_moving)
        max_j = max((len(e) for e in scene.events.values() if e.is_moving), default=0)
        if n_static > es or n_moving > em or max_j > j:
            return False
        return (
            id(ws.mesh) == self._mesh_id
            and mic.channel_layout_type == self._mic_layout
            and buckets == self._buckets
            and len(ws._emitter_positions()) <= self._bucket
            and (not self._occl or ws._rain_mode() == "face")
            # captured-constant acoustics must match the template scene
            and int(ws.sample_rate) == self._sr
            and getattr(ws, "material", None) == self._material
            and dict(ws.cfg.to_dict()) == self._cfg_dict
        )

    def scene_inputs(self, scene, device: bool = True):
        """Per-scene tracer inputs: (key, padded sources, listeners,
        face_occ, s_idx, m_idx). Advances the worldstate PRNG key exactly like
        `trace_irs_device` so a fused render consumes the same key stream.

        `device=False` returns host (numpy) arrays — batch renderers stack a
        group's inputs on host and ship them in one upload instead of one
        RPC per scene."""
        import jax
        import jax.numpy as jnp

        ws = scene.state
        mic = next(iter(ws.microphones.values()))
        src = ws._emitter_positions().astype(np.float32)
        n_src = len(src)
        if n_src > self._bucket:
            raise ValueError(
                f"scene has {n_src} emitters; this program buckets {self._bucket}"
            )
        if n_src < self._bucket:
            src = np.concatenate([src, np.tile(src[:1], (self._bucket - n_src, 1))])

        from audiblelight_tpu import utils

        if mic.channel_layout_type == "mic":
            caps = np.atleast_2d(
                np.asarray(utils.coerce2d(mic.coordinates_absolute), np.float64)
            )
        else:
            caps = np.atleast_2d(
                np.asarray(utils.coerce2d(mic.coordinates_center), np.float64)
            )

        es, em, j, _ = self._buckets
        s_idx = np.full(es, -1, dtype=np.int32)
        m_idx = np.full((em, j), -1, dtype=np.int32)
        si = mi = counter = 0
        for event in scene.events.values():
            n_em = len(event)
            if event.is_moving:
                if mi < em:
                    n_j = min(n_em, j)
                    m_idx[mi, :n_j] = np.arange(counter, counter + n_j)
                mi += 1
            else:
                if si < es:
                    s_idx[si] = counter
                si += 1
            counter += n_em

        # Per-face rain visibility: a DEVICE-resident table cached by rounded
        # listener position (ws.rain_occlusion_for) — fixed-mic dataset runs
        # compute it once per room; random-mic scenes pay one extra ASYNC
        # dispatch that the pipeline hides. (Computing it in-program instead
        # was measured round-trip-neutral but recomputed the table per scene
        # — and per vmapped batch LANE — even for repeated positions.)
        # The query points replicate trace_irs_device EXACTLY (shared: mean of
        # the physical capsule positions) so the two paths agree and share the
        # position-keyed cache.
        if self._occl:
            if self._shared_vis:
                caps_abs = np.atleast_2d(
                    np.asarray(utils.coerce2d(mic.coordinates_absolute), np.float64)
                )
                pts = caps_abs.mean(axis=0, keepdims=True)
            else:
                pts = caps
            face_occ = ws.rain_occlusion_for(pts)
        else:
            face_occ = jnp.zeros((1, ws.acoustic_tris_device.shape[0]), bool)

        ws._key, sub = jax.random.split(ws._key)
        host = (
            np.asarray(sub), src.astype(np.float32),
            caps.astype(np.float32), s_idx, m_idx,
        )
        if not device:
            return host[:3] + (face_occ,) + host[3:]
        # One batched upload: per-transfer RPC latency dominates on remote
        # links, so the key and the four host arrays ship together (see
        # build_scene_plan); the rain table is already device-resident. The
        # worldstate key lives on the CPU backend, so the split above costs
        # no device round trip.
        sub_d, src_d, caps_d, s_d, m_d = jax.device_put(host)
        return (sub_d, src_d, caps_d, face_occ, s_d, m_d)

    @staticmethod
    def plan_args(plan: ScenePlan) -> tuple:
        """The fused program's plan-derived positional inputs."""
        return (
            plan.static_audio, plan.static_mask, plan.static_snr,
            plan.static_len, plan.static_place_len,
            plan.moving_audio, plan.moving_w, plan.moving_mask,
            plan.moving_snr, plan.moving_len, plan.moving_place_len,
            plan.ref_db,
        )

    def __call__(self, scene, plan: ScenePlan):
        """Render one scene: (int16 stems (E, C, S), float32 scales (E,)).
        The plan may be built with `build_scene_plan(..., trace=False)` —
        its IR banks are ignored; the fused program traces."""
        args = self.scene_inputs(scene)
        return self._render(*args, *self.plan_args(plan))

    def render_batch(self, inputs, plans):
        """Render B scenes in ONE single-device dispatch (vmapped fused body).

        Micro-batching amortises the per-dispatch link cost — on remote-chip
        hosts each dispatch/upload/download is an RPC whose latency, not
        bytes, dominates, so K scenes per program cut the per-scene link
        overhead K-fold. Device compute is the same work vmap-batched.

        Returns (q (B, E, C, S) int16, scales (B, E) float32). One program
        compiles per batch size B.
        """
        import jax
        import jax.numpy as jnp

        if len(inputs) != len(plans):
            raise ValueError("one plan per scene required")
        leaves = [tuple(i) + self.plan_args(p) for i, p in zip(inputs, plans)]
        # Host (numpy) leaves — per-scene inputs collected with
        # scene_inputs(device=False) — stack on host and ship in ONE upload;
        # device leaves (the plans' tensors) stack with async device ops.
        host_stacked, dev_stacked = {}, {}
        for k in range(len(leaves[0])):
            xs = [l[k] for l in leaves]
            if all(isinstance(x, np.ndarray) for x in xs):
                host_stacked[k] = np.stack(xs)
            else:
                dev_stacked[k] = jnp.stack([jnp.asarray(x) for x in xs])
        if host_stacked:
            ks = list(host_stacked)
            for k, v in zip(ks, jax.device_put(tuple(host_stacked[k] for k in ks))):
                host_stacked[k] = v
        stacked = tuple(
            host_stacked[k] if k in host_stacked else dev_stacked[k]
            for k in range(len(leaves[0]))
        )
        cache = getattr(self, "_batch_programs", None)
        if cache is None:
            cache = self._batch_programs = {}
        fn = cache.get(len(inputs))
        if fn is None:
            fn = cache[len(inputs)] = jax.jit(jax.vmap(self._body))
        return fn(*stacked)

    def render_batch_sharded(self, inputs, plans, mesh, axis: str = "scene"):
        """Render B scenes' fused programs with the batch SHARDED over a
        device mesh — the multi-chip dataset-generation path.

        Each chip runs the complete per-scene program (trace -> gather ->
        stems -> int16) on its local slice of the batch: scenes are the
        data-parallel axis, geometry/materials replicate as compiled
        constants, and no collectives are needed on the hot path (the exact
        regime jax.sharding is free at). `inputs` are per-scene tuples from
        `scene_inputs` (captured BEFORE the call so the PRNG walk matches the
        single-scene path), `plans` the matching trace=False plans; every plan
        must share this renderer's bucket shapes.

        Returns (q (B, E, C, S) int16, scales (B, E) float32), sharded over
        `axis`. B must divide by the mesh's `axis` size.
        """
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        b = len(inputs)
        if b != len(plans):
            raise ValueError("one plan per scene required")
        n_dev = mesh.shape[axis]
        if b % n_dev != 0:
            raise ValueError(f"batch size {b} must divide by mesh '{axis}' size {n_dev}")

        leaves = [tuple(i) + self.plan_args(p) for i, p in zip(inputs, plans)]
        stacked = tuple(
            jnp.stack([jnp.asarray(l[k]) for l in leaves])
            for k in range(len(leaves[0]))
        )

        cache = getattr(self, "_sharded_programs", None)
        if cache is None:
            cache = self._sharded_programs = {}
        fn = cache.get((id(mesh), axis))
        if fn is None:
            fn = cache[(id(mesh), axis)] = jax.jit(
                jax.shard_map(
                    jax.vmap(self._body),
                    mesh=mesh,
                    in_specs=P(axis),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
        return fn(*stacked)


def render_scenes_pipelined(
    scene_factory: Iterable,
    complete: Callable,
    max_in_flight: int = 4,
    plan_kwargs: Optional[dict] = None,
    overlap_io: bool = True,
    fused: bool = False,
    fused_batch: int = 1,
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

    With `overlap_io=True` (default) the completion half — stem pull, mix,
    `complete` (typically WAV/CSV writes) — runs on ONE worker thread while the
    main thread keeps placing/dispatching the next scenes, so disk and
    host-link waits overlap device compute; order is preserved by the queue.

    With `fused=True` scenes render through ONE compiled device program
    (`FusedSceneRenderer`, built from the first scene): trace + stems in a
    single dispatch, the dataset-run fast path. Scenes whose layout falls
    outside the first scene's buckets fall back to the plan path
    transparently. Requires `plan_kwargs` to pin the buckets (max_static /
    max_moving / max_traj / pad_audio_seconds) so every scene compiles to the
    same program — the same contract `parallel.bucket_plans` serves.

    `fused_batch=K` (with fused=True) micro-batches K scenes per device
    dispatch through the vmapped fused program (FusedSceneRenderer
    .render_batch): on remote-chip hosts every dispatch/upload/download is an
    RPC whose LATENCY dominates, so batching cuts the per-scene link overhead
    K-fold. Scenes still complete in order; a trailing partial group (or
    scenes ahead of an incompatible one) renders per-scene through the
    already-compiled single-scene program.

    Returns the number of scenes completed.
    """
    import queue as _queue
    import threading

    done = 0
    errors: list = []

    def _finish(item):
        nonlocal done
        scenes, plans, q, scales, is_batch = item
        if is_batch:
            qn, sn = np.asarray(q), np.asarray(scales)  # ONE pull for K scenes
        for i, (scene, plan) in enumerate(zip(scenes, plans)):
            mixed = mix_plan_host(
                plan,
                qn[i] if is_batch else q,
                sn[i] if is_batch else scales,
            )
            audio = OrderedDict(
                (alias, mixed[a:b]) for alias, a, b in mic_channel_spans(scene)
            )
            complete(scene, audio)
            done += 1

    if overlap_io:
        work: _queue.Queue = _queue.Queue(maxsize=max_in_flight)

        def _worker():
            while True:
                item = work.get()
                if item is None:
                    return
                try:
                    _finish(item)
                except Exception as exc:  # surfaced after join
                    errors.append(exc)
                finally:
                    work.task_done()

        thread = threading.Thread(target=_worker, daemon=True)
        thread.start()

    pending: list = []

    def _emit(item):
        for arr in (item[2], item[3]):
            try:
                arr.copy_to_host_async()
            except (AttributeError, NotImplementedError):  # pragma: no cover
                pass
        if overlap_io:
            work.put(item)
            if errors:
                raise errors[0]
        else:
            pending.append(item)
            while len(pending) >= max_in_flight:
                _finish(pending.pop(0))

    # One fused program per mesh seen, LRU-bounded: each renderer pins its
    # template worldstate (device triangle/rain/IR caches + compiled
    # programs), so an unbounded dict would hold every room of a long
    # dataset run live in HBM/host RAM.
    renderers: OrderedDict = OrderedDict()
    max_renderers = 4
    group: list = []  # (scene, plan) pairs awaiting a full micro-batch

    def _flush_group(renderer):
        # Partial groups render per-scene: the single-scene program is already
        # compiled, while each distinct partial batch size would compile anew.
        for scene, plan in group:
            q, scales = renderer(scene, plan)
            _emit(([scene], [plan], q, scales, False))
        group.clear()

    it: Iterator = iter(scene_factory)
    try:
        last_renderer = None
        while True:
            scene = next(it, None)
            if scene is None:
                break
            if fused:
                # Plan tensors upload per scene (one batched async device_put
                # at build): measured FASTER than deferring the whole group's
                # tensors to one synchronous upload at dispatch, which parks
                # ~12 MB on the critical path (33 vs 24 scene-sec/s median on
                # the dev tunnel). Per-scene INPUTS do defer (tiny arrays,
                # latency-dominated — see render_batch).
                plan = build_scene_plan(scene, trace=False, **(plan_kwargs or {}))
                # Key by the mesh OBJECT (kept alive by the renderer itself,
                # so the id cannot be recycled while the entry lives)
                mesh_key = id(getattr(scene.state, "mesh", scene.state))
                renderer = renderers.get(mesh_key)
                if renderer is not None:
                    renderers.move_to_end(mesh_key)
                else:
                    try:
                        renderer = renderers[mesh_key] = FusedSceneRenderer(scene, plan)
                        while len(renderers) > max_renderers:
                            renderers.popitem(last=False)
                    except ValueError:
                        renderer = None
                if renderer is not None and renderer.compatible(scene, plan):
                    if fused_batch > 1:
                        if group and renderer is not last_renderer:
                            _flush_group(last_renderer)
                        last_renderer = renderer
                        group.append((scene, plan))
                        if len(group) == fused_batch:
                            inputs = [
                                renderer.scene_inputs(s, device=False)
                                for s, _ in group
                            ]
                            q, scales = renderer.render_batch(
                                inputs, [p for _, p in group]
                            )
                            item = ([s for s, _ in group], [p for _, p in group],
                                    q, scales, True)
                            group.clear()
                            _emit(item)
                        continue
                    q, scales = renderer(scene, plan)
                else:  # layout outside the template's buckets: plan path
                    if group:
                        _flush_group(last_renderer)
                    # Auto-size the buckets the pinned plan_kwargs would
                    # truncate, so the fallback renders EVERY event (one
                    # bespoke compile for the outlier scene, no lost audio).
                    pk = dict(plan_kwargs or {})
                    n_static = sum(1 for e in scene.events.values() if not e.is_moving)
                    n_moving = sum(1 for e in scene.events.values() if e.is_moving)
                    max_j = max(
                        (len(e) for e in scene.events.values() if e.is_moving),
                        default=0,
                    )
                    if pk.get("max_static") is not None and n_static > pk["max_static"]:
                        pk.pop("max_static")
                    if pk.get("max_moving") is not None and n_moving > pk["max_moving"]:
                        pk.pop("max_moving")
                    if pk.get("max_traj") is not None and max_j > pk["max_traj"]:
                        pk.pop("max_traj")
                    plan = build_scene_plan(scene, **pk)
                    q, scales = stems_from_plan(plan)
            else:
                plan = build_scene_plan(scene, **(plan_kwargs or {}))
                q, scales = stems_from_plan(plan)
            _emit(([scene], [plan], q, scales, False))
        if group:
            _flush_group(last_renderer)
        if overlap_io:
            work.join()
            if errors:
                raise errors[0]
        else:
            while pending:
                _finish(pending.pop(0))
    finally:
        if overlap_io:
            work.put(None)
            thread.join()
    return done
