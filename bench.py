"""Benchmark: DCASE2023-style 60 s SELD scene throughput on one chip.

HEADLINE metric ("value"): PER-CHIP render throughput in the reference's
flagship regime — 60 s SELD scenes inside a **110k-face nonconvex scanned
room with occlusion ON**: 13-source RIR ray tracing (5000 indirect rays x 60
bounces, AmbeoVR 4-capsule rig, 4 frequency bands, 1.0 s IRs), per-event
stems, int16 quantisation, all as ONE fused device program
(`pipeline.FusedSceneRenderer` — the SAME program the production pipeline
dispatches), measured steady-state with a scalar-digest sync. This is the
metric BASELINE.json's target names ("render 60 s DCASE2023 scenes at >=100x
real-time per v5e chip"). The tracer runs the production scanned-room
configuration: `mesh_simplification=True` (energy tail on a vertex-clustered
~4k-face acoustic LOD with a Sabine area correction; exact direct path on the
full mesh), per-face rain-visibility tables, progressive wavefront
decimation.

"pipeline_value": the SAME scenes through the full production pipeline —
placement through the Scene API, `pipeline.render_scenes_pipelined` (the code
`scripts/seld/generate_dataset.py` runs, not a bench-private path), host mix,
real WAV + DCASE CSV + JSON outputs. On THIS dev host (1 CPU core, dev-tunnel
link whose bulk rate swings run to run) the Python/IO half bounds it well
below the chip number; a multi-core PCIe host tracks the chip number.

Reference comparison: the reference pushes this workload through the rlr C++
BVH on CPU (reference worldstate.py:2148-2181); its serial generator measures
seconds per scene (reference scripts/generate/benchmark.py:80-82).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}: value is
scene-seconds rendered per wall-clock second per chip, the MEDIAN over
measurement runs; per-run values for both metrics are included.
"easy_box_value" is the pipeline on a 12-face convex box (occlusion skipped —
round 1/2's headline regime, kept for continuity).
"""

import json
import statistics
import tempfile
import time
from pathlib import Path

import numpy as np

SCENE_SECONDS = 60.0
SR = 24000  # DCASE2023 SELD dataset sample rate
N_STATIC = 4
N_MOVING = 1
EVENT_SECONDS = 5.0
IR_SECONDS = 1.0  # repo default MAX_IR_SECONDS (rlr ships 4.0; see README)
N_RAYS = 5000
MAX_DEPTH = 60
ROOM = np.array([7.0, 5.0, 3.0])
N_WARMUP = 4  # >= the pipeline's fused_batch, so the batch program compiles in warmup
N_MEASURE = 8
N_RUNS = 3

# Fixed plan buckets: every scene compiles to the same stem program
PLAN_KWARGS = dict(max_static=4, max_moving=1, max_traj=16, pad_audio_seconds=EVENT_SECONDS)


def make_fg_pool(root: Path, n_files: int = 8):
    """Synthesised dry event WAVs (tones + noise bursts) in a class directory."""
    from audiblelight_tpu.io.audio import wav_write

    rng = np.random.default_rng(0)
    d = root / "maleSpeech"
    d.mkdir(parents=True)
    t = np.arange(int(EVENT_SECONDS * SR)) / SR
    for i in range(n_files):
        freq = 200.0 * (i + 1)
        sig = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * 0.4)
        sig += 0.05 * rng.standard_normal(len(t))
        wav_write(d / f"event_{i}.wav", sig.astype(np.float32), SR)
    return root


def scene_factory(mesh, fg_root, n_scenes, seed0, simplify,
                  ir_seconds=None, max_depth=None, decimate=True,
                  augmentations=None, material=None, rain=None,
                  transmission=None):
    """Yield DCASE2023-shaped scenes: 4 static + 1 moving event, AmbeoVR rig.

    Event/trajectory parameters are pinned so the traced source count lands in
    one power-of-two bucket (4 + 11 = 15 -> 16) and the stem program shape is
    constant — production dataset runs rely on the same bucketing.
    """
    from audiblelight_tpu.core import Scene

    rlr = dict(
        indirect_ray_count=N_RAYS,
        indirect_ray_depth=MAX_DEPTH if max_depth is None else max_depth,
        max_ir_length=IR_SECONDS if ir_seconds is None else ir_seconds,
        mesh_simplification=simplify,
        # Opt-in TPU fast path (defaults to the reference rlr
        # behaviour, False): Russian-roulette wavefront decimation
        ray_decimation=decimate,
    )
    if rain is not None:
        rlr["rain_visibility"] = rain
    if transmission is not None:
        rlr["transmission"] = transmission
    for i in range(n_scenes):
        scene = Scene(
            duration=SCENE_SECONDS,
            sample_rate=SR,
            backend="rlr",
            backend_kwargs=dict(
                mesh=mesh,
                seed=seed0 + i,
                material=material,
                rlr_kwargs=dict(rlr),
            ),
            fg_path=fg_root,
            max_overlap=2,
            class_mapping="DCASE2023Task3",
            event_augmentations=augmentations,
        )
        scene.add_microphone(microphone_type="ambeovr", alias="mic000")
        n_aug = 1 if augmentations else None
        for _ in range(N_STATIC):
            scene.add_event(
                event_type="static", duration=EVENT_SECONDS, event_start=0.0,
                max_place_attempts=200, augmentations=n_aug,
            )
        scene.add_event(
            event_type="moving", duration=EVENT_SECONDS, event_start=0.0,
            spatial_resolution=2.0, max_place_attempts=200, augmentations=n_aug,
        )
        scene.add_ambience(noise="gaussian")
        yield scene


def run_production(mesh, fg_root, out_dir: Path, n_scenes, seed0, simplify=True,
                   augmentations=None):
    """Render n_scenes through the production pipeline; returns elapsed secs.

    Outputs per scene: one multichannel WAV per mic, the DCASE2024 metadata
    CSV (synthesize.generate_dcase2024_metadata — the real generator) and the
    scene JSON, matching scripts/seld/generate_dataset.py.
    """
    from audiblelight_tpu.io.audio import wav_write
    from audiblelight_tpu.pipeline import render_scenes_pipelined
    from audiblelight_tpu.synthesize import generate_dcase2024_metadata

    counter = {"i": 0}

    def complete(scene, audio):
        i = counter["i"]
        counter["i"] += 1
        scene.audio = audio
        for alias, mix in audio.items():
            # 16-bit PCM — the reference's sf.write WAV default (PCM_16)
            wav_write(out_dir / f"scene{seed0}_{i}_{alias}.wav", mix, SR, subtype="int16")
        for alias, df in generate_dcase2024_metadata(scene).items():
            df.to_csv(out_dir / f"scene{seed0}_{i}_{alias}.csv", header=None)
        with open(out_dir / f"scene{seed0}_{i}.json", "w") as f:
            json.dump(scene.to_dict(), f)

    t0 = time.time()
    n = render_scenes_pipelined(
        scene_factory(mesh, fg_root, n_scenes, seed0, simplify,
                      augmentations=augmentations),
        complete,
        max_in_flight=4,
        plan_kwargs=PLAN_KWARGS,
        fused=True,  # trace + stems fused into one device program
        fused_batch=4,  # 4 scenes per dispatch: amortises the tunnel's RPC latency
    )
    elapsed = time.time() - t0
    assert n == n_scenes
    return elapsed


def heavy_fx_set():
    """The bench's heavy per-event FX chain (one sampled per event)."""
    from audiblelight_tpu.augmentation import (
        Compressor, MultibandEqualizer, PitchShift,
    )

    return [
        (PitchShift, dict(sample_rate=SR)),
        (MultibandEqualizer, dict(sample_rate=SR)),
        (Compressor, dict(sample_rate=SR)),
    ]


def make_prep(fg_root, simplify, plan_kwargs, buckets, bucket_sources,
              augmentations=False):
    """Worker-side builder for the scene-prep pool (prep.ScenePrepPool).

    Runs once per worker process: rebuilds the bench room deterministically
    (scanned_like_room is seed-pure) and returns the per-scene prep closure —
    placement, audio load/FX, metadata serialisation, plan packing, all on a
    CPU-only JAX with no tunnel access. `augmentations=True` applies the
    heavy FX set in the WORKER, overlapping the dispatch thread.
    """
    from audiblelight_tpu.geometry.mesh import scanned_like_room
    from audiblelight_tpu.prep import prep_scene

    mesh = scanned_like_room(extents=tuple(ROOM), seed=0)
    augs = heavy_fx_set() if augmentations else None

    def prep(index, seed):
        # Unlucky seeds can exhaust placement/overlap sampling (the SELD
        # script retries the same way); bump the seed and try again.
        last_exc = None
        for attempt in range(8):
            try:
                scene = next(iter(scene_factory(
                    mesh, Path(fg_root), 1, seed + 100003 * attempt, simplify,
                    augmentations=augs,
                )))
                return prep_scene(scene, index, plan_kwargs, buckets, bucket_sources)
            except ValueError as exc:
                last_exc = exc
        raise last_exc

    return prep


def run_production_pooled(mesh, fg_root, out_dir: Path, n_scenes, seed0, workers,
                          device_mesh=None, augmentations=False):
    """The pooled production pipeline: worker processes place + pack scenes,
    the device runs the whole-scene-to-WAV program (trace + stems + timeline
    + ambience + int16), the main process writes final bytes. workers=0 runs
    the prep inline (the 1-core baseline of the cores->throughput curve)."""
    from audiblelight_tpu.io.audio import wav_write
    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.prep import ScenePrepPool, render_prepped_scenes
    from audiblelight_tpu.render import build_scene_plan

    template = next(iter(scene_factory(mesh, fg_root, 1, seed0 - 1, True)))
    tplan = build_scene_plan(
        template, trace=False, build_ambience=False, **PLAN_KWARGS
    )
    renderer = FusedSceneRenderer(template, tplan)

    def complete(prepped, wav):
        i = prepped.index
        wav_write(
            out_dir / f"scene{seed0}_{i}_{prepped.mic_alias}.wav",
            wav, SR, subtype="int16",
        )
        for alias, text in prepped.csv_texts.items():
            (out_dir / f"scene{seed0}_{i}_{alias}.csv").write_text(text)
        (out_dir / f"scene{seed0}_{i}.json").write_text(prepped.scene_json)

    stats: dict = {}
    fb = 4
    if device_mesh is not None:
        n_dev = int(device_mesh.shape["scene"])
        fb = max(fb, n_dev)
        fb -= fb % n_dev
    with ScenePrepPool(
        "bench:make_prep",
        dict(
            fg_root=str(fg_root), simplify=True, plan_kwargs=PLAN_KWARGS,
            buckets=renderer._buckets, bucket_sources=renderer._bucket,
            augmentations=augmentations,
        ),
        workers=workers,
    ) as pool:
        # Warmup OUTSIDE the timed window: worker spawn/init (jax import,
        # mesh rebuild, BVH) AND this fresh renderer's batch program
        # (compile or persistent-cache load, ~7 s on the tunnel) — both are
        # one-time costs a long dataset run amortises away. A full throwaway
        # GROUP renders end to end so the first timed dispatch is warm;
        # without it the cache-load landed inside the timed window and
        # halved the reported pipeline throughput.
        n_warm = max(fb, workers, 1)
        render_prepped_scenes(
            renderer,
            pool.imap([(-1 - k, seed0 - 100 - k) for k in range(n_warm)]),
            lambda p, w: None,
            fused_batch=fb,
            mesh=device_mesh,
        )
        t0 = time.time()
        n = render_prepped_scenes(
            renderer,
            pool.imap([(i, seed0 + i) for i in range(n_scenes)]),
            complete,
            fused_batch=fb,
            max_in_flight=8,
            mesh=device_mesh,
            stats=stats,
        )
        elapsed = time.time() - t0
    assert n == n_scenes
    return elapsed, stats


def run_chip_only(mesh, fg_root, n_scenes, seed0, simplify=True, **factory_kwargs):
    """Device-side throughput: ONE scene re-rendered per iteration with a
    fresh PRNG key through the fused single-dispatch program (trace + stems),
    synced with a scalar digest — host placement/IO/bulk transfers out of the
    loop (the ceiling a multi-core PCIe host tracks).

    Returns (steady_elapsed, warmup_elapsed): warmup covers the first call of
    the compiled program (compile/cache-load + one cold execution), reported
    separately so the steady number never mixes in compile time."""
    import jax

    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.render import build_scene_plan

    scene = next(iter(scene_factory(mesh, fg_root, 1, seed0, simplify, **factory_kwargs)))
    plan = build_scene_plan(scene, trace=False, **PLAN_KWARGS)
    renderer = FusedSceneRenderer(scene, plan)
    key0, *rest = renderer.scene_inputs(scene)
    plan_args = (
        plan.static_audio, plan.static_mask, plan.static_snr,
        plan.static_len, plan.static_place_len,
        plan.moving_audio, plan.moving_w, plan.moving_mask,
        plan.moving_snr, plan.moving_len, plan.moving_place_len,
        plan.ref_db,
    )
    t_w = time.time()
    _, ss = renderer._render(key0, *rest, *plan_args)  # warm (compile + run)
    float(np.asarray(ss[0]))
    warmup = time.time() - t_w

    pend = []
    t0 = time.time()
    for i in range(n_scenes):
        key = jax.random.fold_in(key0, i)
        qq, ss = renderer._render(key, *rest, *plan_args)
        pend.append(ss)
        while len(pend) > 2:
            float(np.asarray(pend.pop(0)[0]))
    for ss in pend:
        float(np.asarray(ss[0]))
    return time.time() - t0, warmup


def measure_fx_chip(n_clips: int = 8, reps: int = 3) -> dict:
    """The heavy FX chain (pitch shift + 8-band EQ + compressor) per 5 s event
    clip, with AUDIBLELIGHT_FX_BACKEND forced to `jax` (on-chip) and `numpy`
    (the host oracle). Returns clip-seconds/sec for both plus the ratio.

    The jax numbers include the per-call upload/download this host's link
    charges — the production regime they stand for is a PCIe-attached chip
    where those are microseconds.
    """
    import os as _os

    from audiblelight_tpu.ops import fx_dsp

    rng = np.random.default_rng(3)
    clips = [
        rng.standard_normal(int(EVENT_SECONDS * SR)).astype(np.float32) * 0.1
        for _ in range(n_clips)
    ]

    def chain(x):
        y = fx_dsp.pitch_shift(x, SR, 3.0)
        for i in range(8):
            freq = min(150.0 * (2.0 ** i), 0.42 * SR)  # clamp under Nyquist
            y = fx_dsp.biquad(y, "peak", SR, freq, gain_db=2.5)
        return fx_dsp.compress(y, SR, threshold_db=-18.0, ratio=3.0,
                               attack_ms=5.0, release_ms=80.0)

    out = {}
    old = _os.environ.get("AUDIBLELIGHT_FX_BACKEND")
    try:
        for backend in ("jax", "numpy"):
            _os.environ["AUDIBLELIGHT_FX_BACKEND"] = backend
            fx_dsp._AUTO_ACCEL.clear()
            chain(clips[0])  # warm (compile on the jax path)
            ts = []
            for _ in range(reps):
                t0 = time.time()
                for c in clips:
                    chain(c)
                ts.append(time.time() - t0)
            out[backend] = n_clips * EVENT_SECONDS / min(ts)
    finally:
        if old is None:
            _os.environ.pop("AUDIBLELIGHT_FX_BACKEND", None)
        else:
            _os.environ["AUDIBLELIGHT_FX_BACKEND"] = old
        fx_dsp._AUTO_ACCEL.clear()
    return {
        "fx_chip_clip_sec_per_s": round(out["jax"], 2),
        "fx_host_clip_sec_per_s": round(out["numpy"], 2),
        "fx_chip_vs_host": round(out["jax"] / max(out["numpy"], 1e-9), 2),
    }


def measure_d2h_link(fused_batch: int = 4, reps: int = 3) -> float:
    """Median device->host bulk rate (MB/s) for one pipeline group's payload
    (fused_batch scenes x 4ch x 60 s int16 — the exact pull the production
    pipeline cannot avoid: those bytes ARE the WAV output).

    Published so pipeline_value is interpretable: on this dev tunnel the
    pull is the pipeline's hard floor (pipeline_link_bound), and the rate
    swings 2-3x minute to minute. Fresh values each rep defeat caching."""
    import jax.numpy as jnp

    shape = (fused_batch, 4, int(SCENE_SECONDS * SR))
    nbytes = float(np.prod(shape) * 2)
    base = jnp.ones(shape, jnp.int16)
    np.asarray(base + jnp.int16(100))  # warm the transfer program/path
    rates = []
    for i in range(reps):
        x = base + jnp.int16(i)
        x.block_until_ready()
        t0 = time.time()
        np.asarray(x)
        rates.append(nbytes / 1e6 / (time.time() - t0))
    return statistics.median(rates)


def measure_rt60(mesh, fg_root, seed0, simplify=True, material=None, rain=None):
    """Schroeder-integral T30-extrapolated RT60 of the bench room, from a
    full-length traced IR (reference rlr default 4 s ceiling) — the
    quantitative justification for the production config's 1 s IR window,
    and (run with simplify True vs False) for the acoustic-LOD fidelity."""
    import jax

    scene = next(iter(scene_factory(
        mesh, fg_root, 1, seed0, simplify, ir_seconds=4.0, max_depth=200,
        decimate=False, material=material, rain=rain,
    )))
    ws = scene.state
    irs = ws.trace_irs_device()
    ir = np.asarray(next(iter(irs.values())))[0, 0]  # first capsule x source
    energy = ir.astype(np.float64) ** 2
    sch = np.cumsum(energy[::-1])[::-1]
    sch_db = 10 * np.log10(np.maximum(sch / sch[0], 1e-30))
    t = np.arange(len(sch_db)) / SR
    m = (sch_db <= -5) & (sch_db >= -35)
    if m.sum() < 10:
        return float("nan")
    slope = np.polyfit(t[m], sch_db[m], 1)[0]  # dB/s
    return float(-60.0 / slope)


def measure_stages(mesh, fg_root, seed0):
    """Device-time attribution for one production-config scene: RIR trace
    (incl. IR synthesis + direct paths) vs stems (convolution + level chain +
    int16), each digest-synced; plus an estimated-op VPU-utilisation proxy for
    the trace's dominant kernel (the dense ray x face first hit).

    The proxy counts first-hit pair-ops only — bounces * total_rays * F_lod *
    ~25 VPU ops — against an assumed v5e VPU peak of 3.8e12 f32 op/s, so it is
    a LOWER bound on utilisation (deposit/reflection ops excluded). Published
    so round-over-round perf deltas are attributable to a stage, as the
    driver's MFU mandate asks; the MXU is idle by design in the tracer (the
    arithmetic is element-wise), so classic matmul MFU would read ~0.
    """
    import time as _time

    import jax

    from audiblelight_tpu.pipeline import stems_from_plan
    from audiblelight_tpu.render import build_scene_plan

    scene = next(iter(scene_factory(mesh, fg_root, 1, seed0, True)))
    ws = scene.state

    def trace_once():
        ws._irs_device_cache = None
        out = ws.trace_irs_device()
        return float(np.asarray(next(iter(out.values()))[0, 0, :8]).sum())

    trace_once()  # warm
    t0 = _time.time(); trace_once(); trace_s = _time.time() - t0

    plan = build_scene_plan(scene, trace=True, **PLAN_KWARGS)
    q, s = stems_from_plan(plan)
    float(np.asarray(s[0]))  # warm
    t0 = _time.time()
    q, s = stems_from_plan(plan)
    float(np.asarray(s[0]))
    stems_s = _time.time() - t0

    cfg = ws.cfg
    f_lod = int(ws.acoustic_tris_device.shape[0])
    alpha = 0.10  # bench room Default material
    bounces = min(
        int(cfg.indirect_ray_depth),
        int(np.ceil(6 * np.log(10) / -np.log(1 - alpha))),
    )
    total_rays = 16 * int(cfg.indirect_ray_count)  # bucketed source count
    pair_ops = bounces * total_rays * f_lod * 25.0
    vpu_util = 100.0 * pair_ops / (trace_s * 3.8e12)
    return {
        "trace_s": round(trace_s, 3),
        "stems_s": round(stems_s, 3),
        "first_hit_pair_ops": pair_ops,
        "vpu_util_proxy_pct": round(vpu_util, 1),
    }


def main():
    import argparse
    import os

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--mesh-devices", type=int, default=1,
        help="shard the production pipeline's scene batches over this many "
        "accelerator devices (jax.sharding.Mesh data parallelism); the "
        "headline per-chip metric always measures one chip",
    )
    parser.add_argument(
        "--coordinator", type=str, default=None,
        help="host:port of the jax.distributed coordinator (multi-host runs; "
        "use with --num-processes/--process-id)",
    )
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    cli = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    if cli.coordinator is not None:
        from audiblelight_tpu.parallel import init_distributed

        init_distributed(
            coordinator_address=cli.coordinator,
            num_processes=cli.num_processes,
            process_id=cli.process_id,
        )
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from audiblelight_tpu.geometry.mesh import box_mesh, scanned_like_room

    tmp = Path(tempfile.mkdtemp(prefix="al_bench_"))
    fg_root = make_fg_pool(tmp / "fg")
    out_dir = tmp / "out"
    out_dir.mkdir()

    scan = scanned_like_room(extents=tuple(ROOM), seed=0)
    box = box_mesh(extents=ROOM.tolist(), center=(ROOM / 2).tolist())

    # ---- warmup: compile every program (trace bucket, stems, occlusion
    # table, and the pooled driver's whole-scene-to-WAV mix program)
    run_production(scan, fg_root, out_dir, N_WARMUP, seed0=9000)
    run_production_pooled(scan, fg_root, out_dir, N_WARMUP, seed0=9500, workers=0)

    # ---- full production pipeline: scanned room, occlusion on --------------
    # Pooled path (prep.ScenePrepPool + whole-scene-to-WAV device program):
    # worker count auto-sizes to the host (cores - 1, so the dispatch thread
    # keeps a core). On THIS 1-core dev host that is 0 workers (inline prep) —
    # the measured curve below shows the 1-core wall directly.
    cores = os.cpu_count() or 1
    # At least ONE prep worker even on a 1-core host: the dispatch thread
    # spends most of its time blocked on the device link, and a single
    # worker process fills those waits (measured +23%: 38.2 vs 31.4
    # scene-sec/s on this host; the curve below publishes the evidence).
    auto_workers = max(1, min(cores - 1, 8))
    device_mesh = None
    if cli.mesh_devices > 1:
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < cli.mesh_devices:
            raise SystemExit(
                f"--mesh-devices {cli.mesh_devices} but only {len(devs)} devices"
            )
        device_mesh = Mesh(np.array(devs[: cli.mesh_devices]), ("scene",))
    rates = []
    link_probes = []
    pipe_stats = []
    for r in range(N_RUNS):
        # Probe the link adjacent to each run: its rate swings 2-3x on this
        # tunnel, so the bound must reflect the state the run actually saw
        link_probes.append(measure_d2h_link())
        elapsed, pstats = run_production_pooled(
            scan, fg_root, out_dir, N_MEASURE, seed0=1000 + 100 * r,
            workers=auto_workers, device_mesh=device_mesh,
        )
        rates.append(N_MEASURE * SCENE_SECONDS / elapsed)
        pipe_stats.append(pstats)
    pipeline_value = statistics.median(rates)
    peak = max(rates)
    d2h_mbps = statistics.median(link_probes)
    # The pipeline's payload floor: every 60 s scene MUST pull 4ch x T x
    # int16 (those bytes are the WAV artifact). At the probed rate that
    # transfer alone bounds throughput at this many scene-seconds/sec.
    scene_payload_mb = 4 * SCENE_SECONDS * SR * 2 / 1e6
    pipeline_link_bound = SCENE_SECONDS * d2h_mbps / scene_payload_mb
    pipeline_link_eff = 100.0 * pipeline_value / max(pipeline_link_bound, 1e-9)

    # ---- cores -> throughput curve (the host-scaling evidence) -------------
    worker_curve = {}
    for w in sorted({0, 1, 2, auto_workers}):
        el, _ = run_production_pooled(
            scan, fg_root, out_dir, N_MEASURE, seed0=4000 + 37 * w, workers=w
        )
        worker_curve[str(w)] = round(N_MEASURE * SCENE_SECONDS / el, 2)

    # ---- HEADLINE: per-chip render throughput, scanned + occlusion on ------
    # The BASELINE.json target is "render 60 s DCASE2023 scenes at >=100x
    # real-time PER CHIP": this measures the chip's production render program
    # (RIR trace + stems + int16, the same fused program the pipeline
    # dispatches) in steady state; warmup (compile/cache-load + first cold
    # execution) is timed separately and never mixed into the steady number.
    chip_rates = []
    warmups = []
    for r in range(N_RUNS):
        chip_elapsed, warm = run_chip_only(scan, fg_root, N_MEASURE, seed0=5000 + r)
        chip_rates.append(N_MEASURE * SCENE_SECONDS / chip_elapsed)
        warmups.append(warm)
    value = statistics.median(chip_rates)

    # ---- reference-default acoustics rows -----------------------------------
    # The config the reference rlr engine serialises (reference
    # tests/test_worldstate_rlr.py:810-835): IR ceiling 4 s, indirect depth
    # 200, 5000 rays, 4 bands, diffraction ON (the engine default now matches)
    # — with the TPU-only ray decimation OFF.
    #
    # TWO rows, honestly split:
    #  - ref_config_value: mesh_simplification OFF (the reference's serialized
    #    mesh_simplification=0) — the stochastic tail traces the FULL 110k-face
    #    mesh (rain visibility precomputed per-face, exact up to the within-
    #    face penumbra at cm-scale faces). The dense ray x face kernels pay
    #    O(F) where the reference's C++ BVH pays O(log F): this row is the
    #    honest apples-to-apples number.
    #  - ref_config_lod_value: the engine's acoustic-LOD acceleration
    #    (mesh_simplification on: Sabine-corrected vertex clustering;
    #    lod_rt60_delta_pct quantifies its fidelity on this room).
    ref_elapsed, ref_warm = run_chip_only(
        scan, fg_root, 2, seed0=6000,
        ir_seconds=4.0, max_depth=200, decimate=False, simplify=False,
        rain="face", transmission=True,
    )
    ref_config_value = 2 * SCENE_SECONDS / ref_elapsed
    ref_lod_elapsed, ref_lod_warm = run_chip_only(
        scan, fg_root, N_MEASURE, seed0=6100,
        ir_seconds=4.0, max_depth=200, decimate=False, transmission=True,
    )
    ref_config_lod_value = N_MEASURE * SCENE_SECONDS / ref_lod_elapsed
    rt60 = measure_rt60(scan, fg_root, seed0=6500)
    rt60_full = measure_rt60(scan, fg_root, seed0=6500, simplify=False, rain="face")
    lod_rt60_delta_pct = (
        100.0 * abs(rt60 - rt60_full) / rt60_full if rt60_full == rt60_full else float("nan")
    )

    # ---- reverberant-room row ----------------------------------------------
    # Low-absorption material (RT60 >= 2 s) with a matching 4 s IR window: the
    # honest long-tail cost the 0.84 s bench room never exercises (the energy
    # kill then runs the full depth-200 bounce budget).
    rev_elapsed, _ = run_chip_only(
        scan, fg_root, 4, seed0=6900, ir_seconds=4.0, max_depth=200,
        material="Concrete, Rough",
    )
    reverb_value = 4 * SCENE_SECONDS / rev_elapsed
    reverb_rt60 = measure_rt60(scan, fg_root, seed0=6950, material="Concrete, Rough")

    # ---- stage attribution / utilisation proxy ------------------------------
    stages = measure_stages(scan, fg_root, seed0=6400)

    # ---- augmentation-on throughput (the heavy-FX path) --------------------
    # Heavy per-event DSP: phase-vocoder pitch shift + 8-band EQ + compressor,
    # one sampled augmentation per event, rendered through the POOLED pipeline
    # so the FX runs in the prep worker process and overlaps the device
    # dispatch thread (the reference pays pedalboard serially on its render
    # thread). Median of 3 runs per row — the tunnel's run-to-run variance
    # swamped single-run ratios in earlier rounds.
    from audiblelight_tpu.augmentation import (
        Compressor, MultibandEqualizer, PitchShift,
    )

    augs = [
        (PitchShift, dict(sample_rate=SR)),
        (MultibandEqualizer, dict(sample_rate=SR)),
        (Compressor, dict(sample_rate=SR)),
    ]
    run_production(scan, fg_root, out_dir, N_WARMUP, seed0=7600,
                   augmentations=augs)  # warm aug programs
    aug_on_runs, aug_off_runs = [], []
    for r in range(3):
        el, _ = run_production_pooled(
            scan, fg_root, out_dir, N_MEASURE, seed0=7700 + 10 * r,
            workers=auto_workers, augmentations=True,
        )
        aug_on_runs.append(N_MEASURE * SCENE_SECONDS / el)
        el, _ = run_production_pooled(
            scan, fg_root, out_dir, N_MEASURE, seed0=7800 + 10 * r,
            workers=auto_workers,
        )
        aug_off_runs.append(N_MEASURE * SCENE_SECONDS / el)
    aug_on_value = statistics.median(aug_on_runs)
    aug_off_value = statistics.median(aug_off_runs)

    # ---- on-chip FX throughput (AUDIBLELIGHT_FX_BACKEND=jax) ---------------
    # The heavy chain straight through ops.fx_jax on the device, batch of
    # event clips, digest-synced: proves the production value of the JAX FX
    # backend independent of this host's slow dev link (which keeps the
    # auto policy on host numpy — see ops.fx_dsp).
    fx_chip_value = measure_fx_chip()

    # ---- continuity metric: 12-face convex box (occlusion skipped) ---------
    run_production(box, fg_root, out_dir, N_WARMUP, seed0=7000, simplify=False)  # warm
    box_elapsed = run_production(box, fg_root, out_dir, N_MEASURE, seed0=7100, simplify=False)
    box_value = N_MEASURE * SCENE_SECONDS / box_elapsed

    print(
        json.dumps(
            {
                "metric": (
                    "60s SELD scenes rendered per chip, 110k-face scanned room, "
                    "occlusion on (production fused render program: RIR trace + "
                    "event stems + int16)"
                ),
                "value": round(value, 2),
                "unit": "scene-seconds/sec/chip",
                "vs_baseline": round(value / 100.0, 3),
                "chip_run_values": [round(v, 2) for v in chip_rates],
                "chip_warmup_seconds": [round(w, 2) for w in warmups],
                "ref_config_value": round(ref_config_value, 2),
                "ref_config_lod_value": round(ref_config_lod_value, 2),
                "ref_config": {
                    "ir_seconds": 4.0, "n_rays": N_RAYS, "max_depth": 200,
                    "ray_decimation": False, "mesh_simplification": False,
                    "transmission": True,
                    "diffraction": True, "max_diffraction_order": 10,
                    "warmup_seconds": round(ref_warm, 2),
                    "lod_warmup_seconds": round(ref_lod_warm, 2),
                },
                "lod_rt60_delta_pct": round(lod_rt60_delta_pct, 2),
                "reverb_value": round(reverb_value, 2),
                "reverb_rt60_seconds": round(reverb_rt60, 3),
                "stages": stages,
                "bench_room_rt60_seconds": round(rt60, 3),
                "pipeline_value": round(pipeline_value, 2),
                "pipeline_peak": round(peak, 2),
                "pipeline_run_values": [round(v, 2) for v in rates],
                "pipeline_worker_curve": worker_curve,
                "d2h_mbps": round(d2h_mbps, 1),
                "d2h_probe_values": [round(v, 1) for v in link_probes],
                "pipeline_link_bound": round(pipeline_link_bound, 2),
                "pipeline_link_efficiency_pct": round(pipeline_link_eff, 1),
                # per-scene wall decomposition of the MEDIAN run's threads
                # (stages overlap across 3 threads; see prep.render_prepped_scenes)
                "pipeline_stage_s_per_scene": {
                    k: round(v / max(ps.get("n_scenes", 1), 1), 3)
                    for ps in [pipe_stats[rates.index(pipeline_value)]
                               if pipeline_value in rates else pipe_stats[0]]
                    for k, v in ps.items() if k != "n_scenes"
                },
                "aug_on_value": round(aug_on_value, 2),
                "aug_off_value": round(aug_off_value, 2),
                "aug_on_runs": [round(v, 2) for v in aug_on_runs],
                "aug_off_runs": [round(v, 2) for v in aug_off_runs],
                "aug_overhead_pct": round(
                    100.0 * (aug_off_value / max(aug_on_value, 1e-9) - 1.0), 1
                ),
                **fx_chip_value,
                "easy_box_value": round(box_value, 2),
                "host_cpu_cores": cores,
                "note": (
                    "value = the per-chip render target BASELINE.json names "
                    "(steady-state device program: trace + stems + int16, same "
                    "fused program the pipeline dispatches; warmup reported "
                    "separately). pipeline_value = the full production pipeline "
                    "(worker-pool placement, whole-scene-to-WAV device program "
                    "incl. on-device ambience + mix + int16, file writes) with "
                    "workers auto-sized to cores-1. pipeline_worker_curve = "
                    "throughput vs prep-worker count; even on this 1-core dev "
                    "host one worker wins (it fills the dispatch thread's "
                    "link waits) and more workers plateau — the 1-core wall. "
                    "pipeline_link_bound = the D2H transfer floor at the "
                    "probed link rate (every scene must pull its 11.5 MB of "
                    "int16 WAV payload; d2h_mbps swings 2-3x on this tunnel); "
                    "pipeline_link_efficiency_pct says how close the pipeline "
                    "runs to that floor. On a PCIe host (GB/s) the floor "
                    "vanishes and the pipeline tracks the chip number. "
                    "ref_config_value = the reference rlr SERIALIZED defaults "
                    "(4 s IR, depth 200, 5000 rays, diffraction on, "
                    "mesh_simplification OFF — the stochastic tail traces the "
                    "full 110k-face mesh; the dense TPU ray x face kernels pay "
                    "O(F) where the reference's C++ BVH pays O(log F)). "
                    "ref_config_lod_value = same acoustics with the engine's "
                    "acoustic-LOD acceleration (Sabine-corrected vertex "
                    "clustering; lod_rt60_delta_pct quantifies its fidelity "
                    "on this room). bench_room_rt60_seconds quantifies why "
                    "the production row's 1 s IR window is lossless here; "
                    "reverb_value tracks the honest long-tail cost on a "
                    "low-absorption variant (reverb_rt60_seconds) with a "
                    "matching 4 s window. stages = device-time attribution "
                    "(trace vs stems) + a first-hit VPU-utilisation proxy "
                    "(the tracer is element-wise by design: matmul MFU would "
                    "read ~0, so utilisation reports against the VPU). "
                    "aug_on/off_value = the POOLED pipeline with heavy "
                    "per-event FX (phase-vocoder pitch shift + 8-band EQ + "
                    "compressor) applied in the prep workers vs without, "
                    "medians of 3; fx_chip_* = the same chain forced through "
                    "ops.fx_jax on the device vs host numpy (the auto policy "
                    "keeps numpy behind this dev tunnel's ~0.5 s roundtrip)."
                ),
                "config": {
                    "ir_seconds": IR_SECONDS,
                    "n_rays": N_RAYS,
                    "max_depth": MAX_DEPTH,
                    "events": f"{N_STATIC} static + {N_MOVING} moving",
                    "mesh_simplification": True,
                    "ray_decimation": True,
                    "pipeline_workers": auto_workers,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
