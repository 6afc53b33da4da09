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


def fused_inputs_host(scene, buckets: tuple, bucket_sources: int):
    """Host half of FusedSceneRenderer.scene_inputs: (key, src, caps, s_idx,
    m_idx) numpy arrays + the rain-table query points. Pure host work (the
    PRNG split runs on the committed CPU key), so scene-prep WORKER PROCESSES
    can run it without touching the accelerator; the main process only adds
    the device-resident rain table.

    `buckets` = (es, em, j, S) as in FusedSceneRenderer._buckets;
    `bucket_sources` = the renderer's padded source count.
    """
    from audiblelight_tpu import utils

    ws = scene.state
    mic = next(iter(ws.microphones.values()))
    src = ws._emitter_positions().astype(np.float32)
    n_src = len(src)
    if n_src > bucket_sources:
        raise ValueError(
            f"scene has {n_src} emitters; this program buckets {bucket_sources}"
        )
    if n_src < bucket_sources:
        src = np.concatenate([src, np.tile(src[:1], (bucket_sources - n_src, 1))])

    caps_abs = np.atleast_2d(
        np.asarray(utils.coerce2d(mic.coordinates_absolute), np.float64)
    )
    if mic.channel_layout_type == "mic":
        caps = caps_abs
    else:
        caps = np.atleast_2d(
            np.asarray(utils.coerce2d(mic.coordinates_center), np.float64)
        )

    es, em, j, _ = buckets
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

    # Rain-table query points replicate trace_irs_device EXACTLY (shared
    # visibility: mean of the physical capsule positions)
    shared_vis = bool(ws.cfg.shared_visibility) if hasattr(ws, "cfg") else True
    mic_pts = caps_abs.mean(axis=0, keepdims=True) if shared_vis else caps

    sub = np.asarray(ws.split_key())
    return (
        (sub, src.astype(np.float32), caps.astype(np.float32), s_idx, m_idx),
        mic_pts,
    )


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
        ambience=None if plan.ambience is None else np.asarray(plan.ambience),
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

    def __init__(self, scene, plan: ScenePlan, bucket_sources: Optional[int] = None):
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
        self._n_capsules = int(mic.n_capsules)
        self._n_channels = int(mic.n_channels)
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
        # Measured-HRTF binaural (micarrays.Binaural.hrtf_sofa): the HRTFSet is
        # a registered pytree, captured as a compiled constant of the fused
        # program — matches the classic Scene.generate path
        # (worldstate/mesh_backend.py) so the fused pipeline renders the same
        # measured-HRIR acoustics, not the analytic spherical-head fallback.
        self._hrtf_sofa = (
            str(mic.hrtf_sofa)
            if (encoding == "binaural" and getattr(mic, "hrtf_sofa", None))
            else None
        )
        hrtf = mic.load_hrtf(sr) if self._hrtf_sofa else None
        mesh_tiles = None if simplified else ws.mesh_tiles
        # Full-mesh placement grid for the direct/diffraction occlusion
        # segments (interior-origin regime; see trace_rirs_multi.accel_direct)
        accel_direct = ws.grid_accel if occl else None
        # Multi-bend diffraction graph legs check against an acoustic LOD on
        # big meshes (see WorldStateRLR.diffraction_graph_tris)
        diffr_graph_tris = (
            ws.diffraction_graph_tris
            if (occl and bool(cfg.diffraction))
            else None
        )

        # Padded source count: defaults to the template scene's next
        # power-of-two; callers rendering a MIX of scene layouts (the pooled
        # SELD driver) override it so one renderer per bucket serves scenes
        # the template itself doesn't match.
        if bucket_sources is not None:
            bucket = int(bucket_sources)
        else:
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

        def stems_body(key, sources, listeners, face_occ, s_idx, m_idx,
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
                diffraction=bool(cfg.diffraction) and occl,
                diffraction_order=max(
                    1, int(getattr(cfg, "max_diffraction_order", 1))
                ),
                tris_diffraction_graph=diffr_graph_tris,
                accel_direct=accel_direct,
                decimate=bool(getattr(cfg, "ray_decimation", False)),
                hrtf=hrtf,
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

            return render_event_stems_arrays(
                static_audio, s_irs, static_mask, static_snr,
                static_len, static_place_len,
                moving_audio, m_irs, moving_w, moving_mask, moving_snr,
                moving_len, moving_place_len, ref_db,
            )

        def render(*args):
            return quantize_stems(stems_body(*args))

        # Whole-scene-to-WAV program: stems placed into the scene timeline,
        # ambience generated + scaled on device, int16 WAV payload out — the
        # host's only remaining per-scene sample work is a file write. The
        # ambience key derives from the trace key by a constant fold so the
        # worldstate PRNG walk stays IDENTICAL to the stems path.
        t_scene = int(round(float(scene.duration) * sr))
        self._t_scene = t_scene
        c_total = int(mic.n_channels)

        def render_mix(key, sources, listeners, face_occ, s_idx, m_idx,
                       static_audio, static_mask, static_snr, static_len,
                       static_place_len, moving_audio, moving_w, moving_mask,
                       moving_snr, moving_len, moving_place_len, ref_db,
                       starts, amb_on, amb_beta, amb_db):
            from audiblelight_tpu.render import (
                ambience_bed_device,
                place_stems_device,
                quantize_mix_wav,
            )

            stems = stems_body(
                key, sources, listeners, face_occ, s_idx, m_idx,
                static_audio, static_mask, static_snr, static_len,
                static_place_len, moving_audio, moving_w, moving_mask,
                moving_snr, moving_len, moving_place_len, ref_db,
            )
            mix = place_stems_device(stems, starts, t_scene)
            amb_key = jax.random.fold_in(key, 0xA3B)
            bed = ambience_bed_device(amb_key, amb_beta, amb_db, c_total, t_scene)
            mix = mix + amb_on * bed
            return quantize_mix_wav(mix)

        self._body = render  # unjitted whole-scene program (shard_map/vmap composable)
        self._body_mix = render_mix
        self._render = jax.jit(render)
        self._render_mix = jax.jit(render_mix)

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
            # Same layout TYPE does not imply the same rig: two "mic"-layout
            # arrays with different capsule counts would silently render the
            # template's channel count (c_total is a compiled constant in the
            # mix program), so the rig's shape must match too.
            and int(mic.n_capsules) == self._n_capsules
            and int(mic.n_channels) == self._n_channels
            and buckets == self._buckets
            and len(ws._emitter_positions()) <= self._bucket
            and (not self._occl or ws._rain_mode() == "face")
            # captured-constant acoustics must match the template scene
            and int(ws.sample_rate) == self._sr
            and getattr(ws, "material", None) == self._material
            and dict(ws.cfg.to_dict()) == self._cfg_dict
            # measured-HRTF set is a compiled constant too
            and (
                str(mic.hrtf_sofa)
                if (
                    self._mic_layout == "binaural"
                    and getattr(mic, "hrtf_sofa", None)
                )
                else None
            )
            == self._hrtf_sofa
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
        host, mic_pts = fused_inputs_host(scene, self._buckets, self._bucket)

        # Per-face rain visibility: a DEVICE-resident table cached by rounded
        # listener position (ws.rain_occlusion_for) — fixed-mic dataset runs
        # compute it once per room; random-mic scenes pay one extra ASYNC
        # dispatch that the pipeline hides. (Computing it in-program instead
        # was measured round-trip-neutral but recomputed the table per scene
        # — and per vmapped batch LANE — even for repeated positions.)
        if self._occl:
            face_occ = ws.rain_occlusion_for(mic_pts)
        else:
            face_occ = jnp.zeros((1, ws.acoustic_tris_device.shape[0]), bool)

        if not device:
            return host[:3] + (face_occ,) + host[3:]
        # One batched upload: per-transfer RPC latency dominates on remote
        # links, so the key and the four host arrays ship together (see
        # build_scene_plan); the rain table is already device-resident. The
        # worldstate key lives on the CPU backend, so the split above costs
        # no device round trip.
        sub_d, src_d, caps_d, s_d, m_d = jax.device_put(host)
        return (sub_d, src_d, caps_d, face_occ, s_d, m_d)

    def mix_eligible(self, scene) -> bool:
        """Can `scene` render through the whole-scene-to-WAV mix program?
        Requires the template's scene length and at most ONE colored-noise
        ambience whose channel count matches the mic rig (file-based or
        multiple ambiences keep the stems + host-mix path)."""
        ws = scene.state
        if int(round(float(scene.duration) * self._sr)) != self._t_scene:
            return False
        ambs = list(scene.ambience.values())
        if len(ambs) > 1:
            return False
        if ambs:
            amb = ambs[0]
            if amb.beta is None:  # file-based
                return False
            mic = next(iter(ws.microphones.values()))
            if int(amb.channels) != int(mic.n_channels):
                return False
        return True

    @staticmethod
    def mix_args(scene, plan: ScenePlan) -> tuple:
        """The mix program's extra inputs: per-event start offsets and the
        ambience (on, beta, ref_db) scalars. "gaussian" ambience maps to
        beta=0 (spectrally flat == white); realisations come from the device
        PRNG, so they differ from the host bed draw-for-draw but match in
        color, per-channel peak normalisation, and ref_db level."""
        starts = np.concatenate(
            [np.asarray(plan.static_start), np.asarray(plan.moving_start)]
        ).astype(np.int32)
        ambs = list(scene.ambience.values())
        if ambs:
            amb = ambs[0]
            beta = 0.0 if amb.beta == "gaussian" else float(amb.beta)
            return (
                starts,
                np.float32(1.0),
                np.float32(beta),
                np.float32(amb.ref_db),
            )
        return (starts, np.float32(0.0), np.float32(0.0), np.float32(-65.0))

    def render_mix(self, scene, plan: ScenePlan):
        """Render one scene to its (C, T) int16 WAV samples in ONE dispatch."""
        args = self.scene_inputs(scene)
        return self._render_mix(*args, *self.plan_args(plan), *self.mix_args(scene, plan))

    def render_mix_batch(self, inputs, plans, extras):
        """Render B scenes to WAV samples in one vmapped dispatch: returns
        (B, C, T) int16. Same micro-batching rationale as render_batch."""
        import jax
        import jax.numpy as jnp

        if not (len(inputs) == len(plans) == len(extras)):
            raise ValueError("one plan + extras tuple per scene required")
        leaves = [
            tuple(i) + self.plan_args(p) + tuple(e)
            for i, p, e in zip(inputs, plans, extras)
        ]
        host_stacked, dev_stacked = {}, {}
        for k in range(len(leaves[0])):
            xs = [l[k] for l in leaves]
            if all(isinstance(x, (np.ndarray, np.generic)) for x in xs):
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
        cache = getattr(self, "_mix_batch_programs", None)
        if cache is None:
            cache = self._mix_batch_programs = {}
        fn = cache.get(len(inputs))
        if fn is None:
            fn = cache[len(inputs)] = jax.jit(jax.vmap(self._body_mix))
        return fn(*stacked)

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

    def render_mix_batch_sharded(self, inputs, plans, extras, mesh,
                                 axis: str = "scene"):
        """Render B scenes to (B, C, T) int16 WAV samples with the batch
        SHARDED over a device mesh — the multi-chip dataset CLI path
        (scripts/seld --mesh-devices). Same data-parallel regime as
        render_batch_sharded: each chip runs the complete whole-scene-to-WAV
        program on its local slice, geometry replicates as compiled
        constants, no collectives on the hot path. B must divide by the
        mesh's `axis` size."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        b = len(inputs)
        if not (b == len(plans) == len(extras)):
            raise ValueError("one plan + extras tuple per scene required")
        n_dev = mesh.shape[axis]
        if b % n_dev != 0:
            raise ValueError(f"batch size {b} must divide by mesh '{axis}' size {n_dev}")

        leaves = [
            tuple(i) + self.plan_args(p) + tuple(e)
            for i, p, e in zip(inputs, plans, extras)
        ]
        stacked = tuple(
            jnp.stack([jnp.asarray(l[k]) for l in leaves])
            for k in range(len(leaves[0]))
        )
        cache = getattr(self, "_mix_sharded_programs", None)
        if cache is None:
            cache = self._mix_sharded_programs = {}
        fn = cache.get((id(mesh), axis, b))
        if fn is None:
            fn = cache[(id(mesh), axis, b)] = jax.jit(
                jax.shard_map(
                    jax.vmap(self._body_mix),
                    mesh=mesh,
                    in_specs=P(axis),
                    out_specs=P(axis),
                    check_vma=False,
                )
            )
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


# Module-wide renderer LRU for render_scenes_pipelined (see the comment at its
# use site). Keys are (id(mesh), mic layout, plan bucket shapes, sample rate);
# the mesh object is kept alive by its renderer, so the id cannot be recycled
# while the entry lives.
_PIPELINE_RENDERERS: "OrderedDict" = OrderedDict()


def render_scenes_pipelined(
    scene_factory: Iterable,
    complete: Callable,
    max_in_flight: int = 4,
    plan_kwargs: Optional[dict] = None,
    overlap_io: bool = True,
    fused: bool = False,
    fused_batch: int = 1,
    device_mix: bool = False,
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

    `device_mix=True` (with fused=True) extends the fused program to the
    complete WAV payload: stems place into the scene timeline ON DEVICE, the
    ambience bed generates + scales ON DEVICE (a different PRNG realisation
    than the host bed — same color/level), and the (C, T) int16 samples come
    back ready to write. `complete` then receives int16 (C, T)
    arrays instead of float mixes, and the host's per-scene sample work drops
    to a file write. Scenes with file-based or multiple ambiences (or
    off-template durations) transparently keep the stems + host-mix path.

    Returns the number of scenes completed.
    """
    import queue as _queue
    import threading

    done = 0
    errors: list = []

    def _finish(item):
        nonlocal done
        scenes, plans, q, scales, is_batch, kind = item
        if kind == "mix":
            # q: (B, C, T) or (C, T) int16 WAV samples — the device already
            # placed, ambience-mixed, and quantised; the host hands them to
            # complete() as-is (wav_write interleaves int16 directly, no
            # float conversion).
            qn = np.asarray(q)
            for i, scene in enumerate(scenes):
                arr = qn[i] if is_batch else qn
                alias = next(iter(scene.state.microphones))
                complete(scene, OrderedDict([(alias, arr)]))
                done += 1
            return
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
            except (AttributeError, NotImplementedError):
                pass  # numpy arrays / None (mix items): nothing to prefetch
        if overlap_io:
            work.put(item)
            if errors:
                raise errors[0]
        else:
            pending.append(item)
            while len(pending) >= max_in_flight:
                _finish(pending.pop(0))

    # One fused program per mesh seen, LRU-bounded MODULE-WIDE: each renderer
    # pins its template worldstate (device triangle/rain/IR caches + compiled
    # programs), so an unbounded dict would hold every room of a long dataset
    # run live in HBM/host RAM. The cache outlives this call on purpose —
    # dataset drivers invoke render_scenes_pipelined in chunks (resume/retry
    # loops, bench runs) over the same mesh object, and rebuilding the
    # renderer cost a ~7 s program cache-load per chunk on a remote link.
    # Reuse stays safe: entries key by the live mesh OBJECT and every scene
    # re-passes renderer.compatible() (mic rig, buckets, sample rate,
    # material, engine config) before rendering through a cached program.
    renderers = _PIPELINE_RENDERERS
    max_renderers = 4
    group: list = []  # (scene, plan) pairs awaiting a full micro-batch
    group_kind = "stems"

    def _mix_precheck(scene) -> bool:
        """device_mix eligibility knowable BEFORE the renderer exists (the
        renderer's mix_eligible() re-checks duration against its template)."""
        ambs = list(scene.ambience.values())
        if len(ambs) > 1:
            return False
        if ambs and ambs[0].beta is None:
            return False
        if len(scene.state.microphones) != 1:
            return False
        if ambs:
            mic = next(iter(scene.state.microphones.values()))
            if int(ambs[0].channels) != int(mic.n_channels):
                return False
        return True

    def _flush_group(renderer):
        # Partial groups render per-scene: the single-scene program is already
        # compiled, while each distinct partial batch size would compile anew.
        for scene, plan in group:
            if group_kind == "mix":
                q = renderer.render_mix(scene, plan)
                _emit(([scene], [plan], q, None, False, "mix"))
            else:
                q, scales = renderer(scene, plan)
                _emit(([scene], [plan], q, scales, False, "stems"))
        group.clear()

    it: Iterator = iter(scene_factory)
    try:
        last_renderer = None
        while True:
            scene = next(it, None)
            if scene is None:
                break
            if fused:
                use_mix = device_mix and _mix_precheck(scene)
                # Plan tensors upload per scene (one batched async device_put
                # at build): measured FASTER than deferring the whole group's
                # tensors to one synchronous upload at dispatch, which parks
                # ~12 MB on the critical path (33 vs 24 scene-sec/s median on
                # the dev tunnel). Per-scene INPUTS do defer (tiny arrays,
                # latency-dominated — see render_batch).
                plan = build_scene_plan(
                    scene, trace=False, build_ambience=not use_mix,
                    **(plan_kwargs or {}),
                )
                # Key by the mesh OBJECT plus the template-defining shapes
                # (mic layout, plan buckets, sample rate). The shape fields
                # keep the module-wide cache sound across calls: a later run
                # over the same room with a different rig or scene duration
                # gets its own entry instead of forever shadowing the mesh
                # with an incompatible template, and mixed-duration runs keep
                # one fused program per duration bucket.
                ws0 = scene.state
                mic0 = next(iter(ws0.microphones.values()), None)
                mesh_key = (
                    id(getattr(ws0, "mesh", ws0)),
                    getattr(mic0, "channel_layout_type", None),
                    getattr(mic0, "n_capsules", None),
                    plan.static_irs.shape[0],
                    plan.moving_irs.shape[0],
                    plan.moving_irs.shape[2],
                    int(plan.static_audio.shape[1]),
                    int(ws0.sample_rate),
                    str(getattr(mic0, "hrtf_sofa", None) or None),
                )
                renderer = renderers.get(mesh_key)
                if renderer is not None:
                    renderers.move_to_end(mesh_key)
                    if not renderer.compatible(scene, plan):
                        # Either a within-run outlier (events/emitters
                        # overflow the template's pinned buckets — rebuilding
                        # from this scene's truncated plan would silently drop
                        # events, so leave the entry and take the fallback) or
                        # a stale template (acoustic config / material / rain
                        # mode changed on this mesh since a previous call
                        # cached it — rebuild and replace).
                        es, em, jmax, _ = renderer._buckets
                        n_s = sum(
                            1 for e in scene.events.values() if not e.is_moving
                        )
                        n_m = sum(1 for e in scene.events.values() if e.is_moving)
                        mj = max(
                            (len(e) for e in scene.events.values() if e.is_moving),
                            default=0,
                        )
                        overflow = (
                            n_s > es
                            or n_m > em
                            or mj > jmax
                            or len(ws0._emitter_positions()) > renderer._bucket
                        )
                        if not overflow:
                            try:
                                renderer = renderers[mesh_key] = FusedSceneRenderer(
                                    scene, plan
                                )
                            except ValueError:
                                renderer = None
                else:
                    try:
                        renderer = renderers[mesh_key] = FusedSceneRenderer(scene, plan)
                        while len(renderers) > max_renderers:
                            renderers.popitem(last=False)
                    except ValueError:
                        renderer = None
                if renderer is not None and renderer.compatible(scene, plan):
                    use_mix = use_mix and renderer.mix_eligible(scene)
                    if use_mix or plan.ambience is not None:
                        pass
                    else:
                        # Mix precheck passed but the renderer disqualified
                        # the scene (template duration mismatch): the plan was
                        # built without its ambience bed, which the stems path
                        # needs — rebuild (rare).
                        plan = build_scene_plan(
                            scene, trace=False, **(plan_kwargs or {})
                        )
                    kind = "mix" if use_mix else "stems"
                    if fused_batch > 1:
                        if group and (renderer is not last_renderer or kind != group_kind):
                            _flush_group(last_renderer)
                        last_renderer = renderer
                        group_kind = kind
                        group.append((scene, plan))
                        if len(group) == fused_batch:
                            inputs = [
                                renderer.scene_inputs(s, device=False)
                                for s, _ in group
                            ]
                            plans_g = [p for _, p in group]
                            scenes_g = [s for s, _ in group]
                            if kind == "mix":
                                extras = [
                                    renderer.mix_args(s, p) for s, p in group
                                ]
                                q = renderer.render_mix_batch(inputs, plans_g, extras)
                                item = (scenes_g, plans_g, q, None, True, "mix")
                            else:
                                q, scales = renderer.render_batch(inputs, plans_g)
                                item = (scenes_g, plans_g, q, scales, True, "stems")
                            group.clear()
                            _emit(item)
                        continue
                    if use_mix:
                        q = renderer.render_mix(scene, plan)
                        _emit(([scene], [plan], q, None, False, "mix"))
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
            _emit(([scene], [plan], q, scales, False, "stems"))
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
