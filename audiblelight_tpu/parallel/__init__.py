"""Multi-chip scale-out: device meshes + sharded scene-batch rendering.

The reference scales dataset generation with a serial per-scene Python loop
(reference scripts/seld/generate_dataset.py:330-376). Here the scale-out unit is
a *batch of compiled scene plans*: vmap renders B scenes in one program, and
`shard_render` partitions that batch over a jax.sharding.Mesh — scenes across the
"scene" axis (data parallel) and output channels across the "chan" axis (the
tensor-parallel analog for this workload), with XLA inserting any collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from audiblelight_tpu.render import ScenePlan, render_scene_arrays

_PLAN_FIELDS = [
    "static_audio",
    "static_irs",
    "static_mask",
    "static_snr",
    "static_start",
    "static_len",
    "static_place_len",
    "moving_audio",
    "moving_irs",
    "moving_w",
    "moving_mask",
    "moving_snr",
    "moving_start",
    "moving_len",
    "moving_place_len",
    "ambience",
    "ref_db",
]


# Compiled shard_map program caches (see shard_render / shard_trace_rirs)
_SHARD_RENDER_PROGRAMS: dict = {}
_SHARD_TRACE_PROGRAMS: dict = {}


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Join a multi-host JAX cluster (the NCCL/MPI-rendezvous analog).

    Wraps `jax.distributed.initialize`: after it returns, `jax.devices()` spans
    EVERY host's chips, `make_mesh()` builds cross-host meshes, and the pjit /
    shard_map programs in this module run with XLA collectives riding ICI
    within a slice and DCN across slices — no application-level communication
    code. On TPU pods the three arguments auto-detect from the environment;
    on CPU/GPU clusters pass them explicitly (tests drive a 2-process CPU
    cluster this way). Returns the global device count.

    Idempotent: re-initialising an already-initialised runtime is a no-op.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as exc:  # already initialised
        if "already" not in str(exc).lower():
            raise
    return len(jax.devices())


def make_mesh(
    n_scene: Optional[int] = None, n_chan: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """A (scene, chan) device mesh. Defaults to all devices on the scene axis."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_scene is None:
        n_scene = len(devices) // n_chan
    dev_array = np.asarray(devices[: n_scene * n_chan]).reshape(n_scene, n_chan)
    return Mesh(dev_array, ("scene", "chan"))


def pad_plans(plans: Sequence[ScenePlan]) -> list[ScenePlan]:
    """Zero-pad ragged ScenePlans to shared bucket shapes so they batch.

    Real dataset runs produce scenes with different event counts, audio
    lengths, trajectory resolutions and durations; this pads every raggable
    axis (static/moving event slots, event samples, IR length, trajectory
    points, STFT frames, scene samples) up to the batch maximum. Padding is
    exact by construction: extra event slots carry mask=0, extra audio/IR/
    weight samples are zeros, and a longer scene axis only appends silence
    (callers trim to each scene's true duration). Channel counts must match —
    scenes recorded with different mic rigs don't share a program.
    """
    from audiblelight_tpu.ops.stft import n_stft_frames

    c = plans[0].static_irs.shape[1]
    for p in plans[1:]:
        if p.static_irs.shape[1] != c:
            raise ValueError(
                f"Cannot batch plans with different channel counts "
                f"({p.static_irs.shape[1]} vs {c}); use equal mic configurations."
            )

    es = max(p.static_audio.shape[0] for p in plans)
    em = max(p.moving_audio.shape[0] for p in plans)
    s = max(max(p.static_audio.shape[1], p.moving_audio.shape[1]) for p in plans)
    l = max(max(p.static_irs.shape[2], p.moving_irs.shape[3]) for p in plans)
    j = max(p.moving_irs.shape[2] for p in plans)
    fr = n_stft_frames(s)
    t = max(p.n_scene_samples for p in plans)

    targets = dict(
        static_audio=(es, s),
        static_irs=(es, c, l),
        static_mask=(es,),
        static_snr=(es,),
        static_start=(es,),
        static_len=(es,),
        static_place_len=(es,),
        moving_audio=(em, s),
        moving_irs=(em, c, j, l),
        moving_w=(em, fr, j),
        moving_mask=(em,),
        moving_snr=(em,),
        moving_start=(em,),
        moving_len=(em,),
        moving_place_len=(em,),
        ambience=(c, t),
        ref_db=(),
    )
    # Unfilled event slots keep length 1 (the builder's convention) so the
    # level chain's per-length statistics never divide by zero.
    pad_value = dict(static_len=1, moving_len=1)

    out = []
    for p in plans:
        kwargs = {}
        for f, tgt in targets.items():
            arr = getattr(p, f)
            if arr.shape == tgt:
                kwargs[f] = arr
                continue
            pad = [(0, want - have) for have, want in zip(arr.shape, tgt)]
            kwargs[f] = jnp.pad(arr, pad, constant_values=pad_value.get(f, 0))
        kwargs["n_scene_samples"] = t
        out.append(ScenePlan(**kwargs))
    return out


def bucket_plans(
    plans: Sequence[ScenePlan], max_overhead: float = 0.3
) -> list[list[int]]:
    """Group ragged plans into few-compiled-program buckets with bounded padding.

    Padding every plan to the GLOBAL maximum is wasteful when one 60 s scene
    rides with a batch of 10 s scenes (6x padding on every short scene). This
    groups plans so that, within each bucket, the padded compute volume exceeds
    the true volume by at most `max_overhead` (cost proxy: scene samples +
    event-slot samples, the two axes stems/mix scale with). Channel counts
    partition buckets outright — different mic rigs never share a program.

    Returns bucket membership as lists of indices into `plans` (callers keep
    their own ordering/metadata). Feed each bucket through
    stack_plans(pad=True) -> shard_render / render_batch.
    """

    def cost(p: ScenePlan) -> float:
        s = max(p.static_audio.shape[1], p.moving_audio.shape[1])
        slots = p.static_audio.shape[0] + p.moving_audio.shape[0]
        return float(p.n_scene_samples + slots * s)

    by_chan: dict[int, list[int]] = {}
    for i, p in enumerate(plans):
        by_chan.setdefault(int(p.static_irs.shape[1]), []).append(i)

    buckets: list[list[int]] = []
    for idxs in by_chan.values():
        idxs = sorted(idxs, key=lambda i: cost(plans[i]))
        cur: list[int] = []
        cur_sum = 0.0
        for i in idxs:
            c = cost(plans[i])
            if cur:
                # every member pads to the bucket max = c (sorted ascending)
                padded = c * (len(cur) + 1)
                if padded > (1.0 + max_overhead) * (cur_sum + c):
                    buckets.append(cur)
                    cur, cur_sum = [], 0.0
            cur.append(i)
            cur_sum += c
        if cur:
            buckets.append(cur)
    return buckets


def stack_plans(plans: Sequence[ScenePlan], pad: bool = False) -> dict:
    """Stack ScenePlans into batched arrays (leading scene axis).

    With `pad=True`, ragged plans are first padded to shared bucket shapes via
    pad_plans; otherwise shapes must already match exactly.
    """
    if pad:
        plans = pad_plans(plans)
    shapes = {f: getattr(plans[0], f).shape for f in _PLAN_FIELDS}
    for p in plans[1:]:
        for f in _PLAN_FIELDS:
            if getattr(p, f).shape != shapes[f]:
                raise ValueError(
                    f"Plan field {f} has mismatched shape {getattr(p, f).shape} vs {shapes[f]}; "
                    f"build plans with identical bucket sizes (or pass pad=True) to batch them."
                )
        if p.n_scene_samples != plans[0].n_scene_samples:
            raise ValueError(
                f"Plan n_scene_samples mismatch ({p.n_scene_samples} vs "
                f"{plans[0].n_scene_samples}); pass pad=True to batch ragged scenes."
            )
    batched = {f: jnp.stack([getattr(p, f) for p in plans]) for f in _PLAN_FIELDS}
    batched["n_scene_samples"] = plans[0].n_scene_samples
    return batched


def render_batch(batched: dict) -> jnp.ndarray:
    """Render a stacked batch of plans: returns (B, C, T)."""
    n_t = batched["n_scene_samples"]
    args = [batched[f] for f in _PLAN_FIELDS]
    return jax.vmap(lambda *a: render_scene_arrays(*a, n_scene_samples=n_t))(*args)


def shard_render(batched: dict, mesh: Mesh, normalize: bool = False) -> jnp.ndarray:
    """Render a batch with scenes sharded over the mesh's "scene" axis (SPMD via
    shard_map: each device renders its local slice of the scene batch with the
    single-scene compiled program).

    With `normalize=True` the whole batch is scaled by its global peak — a
    `pmax` collective across both mesh axes (used by the multi-chip dry run to
    exercise real cross-chip communication).

    Returns (B, C, T) device output, sharded over "scene".
    """
    n_t = batched["n_scene_samples"]
    total_devices = mesh.shape["scene"] * mesh.shape["chan"]
    b = batched["static_audio"].shape[0]
    if b % total_devices != 0:
        raise ValueError(f"Batch size {b} must be divisible by mesh size {total_devices}")

    in_specs = tuple(P(("scene", "chan")) for _ in _PLAN_FIELDS)
    out_specs = P(("scene", "chan"))

    # Program cache: rebuilding jit(shard_map(closure)) per call would retrace
    # and recompile every invocation (the jit cache hangs off the throwaway
    # wrapper object). One closure per (mesh, n_t, normalize); jit's own cache
    # handles argument shapes. Bounded FIFO; entries keep their mesh alive so
    # id() keys cannot be recycled while cached.
    cache_key = (id(mesh), int(n_t), bool(normalize))
    fn = _SHARD_RENDER_PROGRAMS.get(cache_key)
    if fn is None:
        def _render_local(*args):
            out = jax.vmap(lambda *a: render_scene_arrays(*a, n_scene_samples=n_t))(*args)
            if normalize:
                # Cross-chip all-reduce of the batch peak over both mesh axes.
                global_peak = jax.lax.pmax(jnp.max(jnp.abs(out)), ("scene", "chan"))
                out = out / jnp.maximum(global_peak, 1e-9)
            return out

        # check_vma=False: the placement loop inits its accumulator from a
        # constant, which the replication checker would flag against the
        # device-varying adds.
        fn = jax.jit(
            jax.shard_map(
                _render_local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )
        fn._mesh = mesh  # pin: the cache key is id(mesh)
        _SHARD_RENDER_PROGRAMS[cache_key] = fn
        while len(_SHARD_RENDER_PROGRAMS) > 8:
            _SHARD_RENDER_PROGRAMS.pop(next(iter(_SHARD_RENDER_PROGRAMS)))
    args = [batched[f] for f in _PLAN_FIELDS]
    return fn(*args)


def shard_trace_rirs(
    mesh: Mesh,
    key,
    tris,
    face_absorption,
    face_scattering,
    source_positions,
    listener_pos,
    n_samples: int,
    **trace_kwargs,
) -> jnp.ndarray:
    """RIR tracing with the SOURCE axis sharded over the mesh's "scene" axis.

    Ray tracing is embarrassingly parallel over sources, so each device runs
    the wavefront tracer (rir.raytracer.trace_rirs_multi) on its local slice of
    the source batch against replicated geometry — no collectives on the hot
    path. Each shard derives its own PRNG stream by folding in its axis index,
    so results are deterministic for a fixed (key, mesh shape).

    source_positions: (E, 3) with E divisible by the "scene" axis size.
    Returns (C_out, E, n_samples), sharded over the source axis.
    """
    from audiblelight_tpu.rir.raytracer import trace_rirs_multi

    n_shards = mesh.shape["scene"]
    e = source_positions.shape[0]
    if e % n_shards != 0:
        raise ValueError(f"Source count {e} must be divisible by mesh 'scene' size {n_shards}")

    # Precompute triangle normals OUTSIDE the shard_map body: inlining the
    # cross+normalize into the larger traced region miscompiles on the axon TPU
    # backend (normals blow up ~1e13; see the note in rir.raytracer).
    tn = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    tri_normals = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-12)

    # Cached program: everything array-valued rides as a shard_map ARGUMENT
    # (replicated P() specs) instead of a closure constant, so one compiled
    # program serves every (key, geometry, materials, listener) of the same
    # shapes — per-call closures retraced and recompiled every invocation.
    # Only hashable primitives key the cache directly; every other kwarg
    # (arrays, accel/star/mesh_tiles objects holding jnp arrays, lists, dicts)
    # keys by id() below — hashing those objects raises TypeError.
    static_kwargs = tuple(sorted(
        (k, v) for k, v in trace_kwargs.items()
        if isinstance(v, (int, float, bool, str, bytes, type(None)))
    ))
    static_keys = {k for k, _ in static_kwargs}
    array_kwargs = {k: v for k, v in trace_kwargs.items() if k not in static_keys}
    cache_key = (
        id(mesh), int(n_samples), static_kwargs,
        tuple(sorted((k, id(v)) for k, v in array_kwargs.items())),
    )
    fn = _SHARD_TRACE_PROGRAMS.get(cache_key)
    if fn is None:
        def _trace_local(k_in, tris_in, absorb_in, scatter_in, src_local, lis_in, normals):
            shard_key = jax.random.fold_in(k_in, jax.lax.axis_index("scene"))
            return trace_rirs_multi(
                shard_key,
                tris_in,
                absorb_in,
                scatter_in,
                src_local,
                lis_in,
                n_samples=n_samples,
                tri_normals=normals,
                **trace_kwargs,
            )

        fn = jax.jit(
            jax.shard_map(
                _trace_local,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P("scene"), P(), P()),
                out_specs=P(None, "scene", None),
                check_vma=False,
            )
        )
        fn._pins = (mesh, array_kwargs)  # keep id()-keyed objects alive
        _SHARD_TRACE_PROGRAMS[cache_key] = fn
        while len(_SHARD_TRACE_PROGRAMS) > 8:
            _SHARD_TRACE_PROGRAMS.pop(next(iter(_SHARD_TRACE_PROGRAMS)))
    return fn(
        key, tris, face_absorption, face_scattering, source_positions,
        listener_pos, tri_normals,
    )




def shard_convolve_time(
    audio: jnp.ndarray, irs: jnp.ndarray, mesh: Mesh, axis: str = "scene"
) -> jnp.ndarray:
    """Time-axis-sharded convolution — this workload's context-parallel analog.

    Long scenes convolve as overlap-save blocks (SURVEY §5's long-context
    analog); here those TIME BLOCKS shard across chips: every device convolves
    its own span of the dry signal after receiving an (ir_len - 1)-sample HALO
    from its left neighbour over ICI (`jax.lax.ppermute` — the halo exchange a
    context-parallel transformer would do for its attention window). Device d
    then keeps exactly its span of the full linear convolution, so the
    concatenated result equals fft_convolve on the unsharded signal.

    Arguments:
        audio: (n_samples,) dry signal; n_samples must divide by the mesh axis.
        irs: (n_channels, ir_len) IR bank applied to the whole signal.
        mesh: device mesh; `axis` names the mesh axis to shard time over.

    Returns:
        (n_channels, n_samples + ir_len - 1): full linear convolution, with the
        tail (ir_len - 1 samples past the last block) included.
    """
    n = int(np.prod([mesh.shape[a] for a in (axis,)]))
    t = audio.shape[-1]
    if t % n:
        raise ValueError(f"n_samples {t} must divide the '{axis}' axis size {n}")
    ir_len = irs.shape[-1]
    halo = ir_len - 1
    if t // n < halo:
        raise ValueError(
            f"time blocks of {t // n} samples are shorter than the "
            f"{halo}-sample halo; use fewer devices or longer audio"
        )

    def local(x_blk, h):
        # x_blk: (1, t // n) this device's span; h: (C, ir_len) replicated
        x_blk = x_blk[0]
        left = jax.lax.ppermute(
            x_blk[-halo:] if halo else x_blk[:0],
            axis,
            perm=[(i, i + 1) for i in range(n - 1)],
        )  # device 0 receives zeros (no source) — correct leading boundary
        from audiblelight_tpu.ops.convolve import fft_convolve

        ext = jnp.concatenate([left, x_blk])
        y = fft_convolve(ext, h)  # (C, halo + t//n + ir_len - 1)
        keep = y[:, halo : halo + x_blk.shape[0]]  # this device's output span
        # Tail beyond the span: the final device's overhang plus every
        # device's contribution dying inside the next span is already covered
        # by the neighbour's halo EXCEPT after the last device; gather it.
        tail_local = y[:, halo + x_blk.shape[0] :]  # (C, ir_len - 1)
        idx = jax.lax.axis_index(axis)
        tail = jnp.where(idx == n - 1, tail_local, jnp.zeros_like(tail_local))
        tail = jax.lax.psum(tail, axis)
        return keep, tail

    keep, tail = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None)),
        out_specs=(P(None, axis), P(None, None)),
        check_vma=False,
    )(audio.reshape(1, -1), irs)
    return jnp.concatenate([keep, tail], axis=-1)


__all__ = ["init_distributed", "make_mesh", "pad_plans", "bucket_plans", "stack_plans", "render_batch", "shard_render", "shard_trace_rirs", "shard_convolve_time"]
