#!/usr/bin/env python
"""Generate a DCASE2023-Task3-style SELD dataset (TPU-accelerated).

Produces the same dataset surface as the reference generator
(reference scripts/seld/generate_dataset.py:1-460):
  - N one-minute spatial recordings at 24 kHz
  - FOA ("foalistener") or tetrahedral MIC ("ambeovr") formats
  - scenes spatialised in shoebox / ray-traced mesh / measured-SOFA rooms
  - polyphony cap (max_overlap), static + moving events
  - optional per-event augmentation sampled from pitch-shift / speed-up /
    reverse / invert / distortion
  - DCASE folder layout: <fmt>_dev/dev-<split>-alight/fold<k>_scene<i>_<j>.wav
    + metadata_dev/...csv
  - resume support (outputs that already exist are skipped) and recursive
    retry when a scene ends up with zero placed events

Unlike the reference's serial per-scene loop, RIR synthesis and convolution run
on the TPU through the compiled kernels; the host only places events and
performs IO.
"""

import argparse
import sys
from collections import OrderedDict
from pathlib import Path

import numpy as np
from scipy import stats

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu import config, utils
from audiblelight_tpu.augmentation import Distortion, Invert, PitchShift, Reverse, SpeedUp
from audiblelight_tpu.core import Scene
from audiblelight_tpu.utils import logger

DURATION = 60
SAMPLE_RATE = 24000

AUGMENTATIONS = {
    # Replicated VERBATIM from the reference recipe (reference
    # scripts/seld/generate_dataset.py:66): stats.uniform(loc=-7, scale=0),
    # a degenerate distribution that always draws -7 semitones. Almost
    # certainly an upstream bug ([-7, 0] via scale=7 was probably intended),
    # but dataset-recipe parity wins — same policy as the Clipping
    # loc/scale quirk documented in augmentation.py.
    "pitchshift": (PitchShift, dict(semitones=stats.uniform(-7, 0))),
    "speedup": (SpeedUp, dict(stretch_factor=stats.uniform(0.9, 0.2))),
    "reverse": Reverse,
    "invert": Invert,
    "distortion": (Distortion, dict(drive_db=stats.uniform(0.0, 10.0))),
}


def get_augmentations(names):
    """Resolve augmentation names into (cls, kwargs) entries."""
    out = []
    for name in names:
        if name not in AUGMENTATIONS:
            raise ValueError(f"Augmentation {name} is not a valid parameter for this script!")
        entry = AUGMENTATIONS[name]
        if isinstance(entry, tuple):
            cls, kws = entry
            out.append((cls, dict(kws, sample_rate=SAMPLE_RATE)))
        else:
            out.append((entry, dict(sample_rate=SAMPLE_RATE)))
    return out


_MESH_CACHE = {}


def _load_mesh_cached(mesh):
    """Load a mesh once per path: consecutive scapes in the same room share the
    TriMesh object (and with it the cached acoustic LOD / accel structures)."""
    from audiblelight_tpu.geometry.mesh import TriMesh, load_mesh

    if isinstance(mesh, TriMesh):
        return mesh
    key = str(mesh)
    if key not in _MESH_CACHE:
        _MESH_CACHE[key] = load_mesh(mesh)
    return _MESH_CACHE[key]


def build_backend_kwargs(args, rng, room=None):
    """Backend-specific constructor kwargs for this scene.

    `room` is a room-table entry (see seld_dataset_assets) when generating from
    an asset split; None means the single-room CLI path (--mesh/--sofa).
    """
    if args.backend == "shoebox":
        dims = rng.uniform([5.0, 4.0, 2.6], [10.0, 8.0, 3.5])
        return dict(
            dimensions=dims.tolist(),
            absorption=args.material if args.materials else 0.3,
            max_order=args.ism_order,
            max_ir_length=args.ir_seconds,
            seed=int(rng.integers(2**31)),
        )
    if args.backend == "rlr":
        if room is not None:
            from seld_dataset_assets import resolve_room

            mesh = resolve_room(room, args.mesh_dir)
        elif args.mesh is not None:
            mesh = args.mesh
        else:
            raise ValueError("--mesh or --assets is required for the rlr backend")
        rlr_kwargs = dict(
            max_ir_length=args.ir_seconds,
            # Acoustic LOD: the energy tail traces a decimated mesh (exact
            # direct path keeps full resolution) — the production default for
            # scanned rooms; disable with --no-mesh-simplification.
            mesh_simplification=args.mesh_simplification,
            # Opt-in (--ray-decimation) TPU fast path; default False = the
            # reference rlr behaviour (every ray traced to full depth).
            ray_decimation=args.ray_decimation,
            # Knife-edge diffraction for occluded pairs (reference rlr parity
            # default: on, order 10); disable with --no-diffraction.
            diffraction=args.diffraction,
        )
        if args.rays is not None:
            rlr_kwargs["indirect_ray_count"] = args.rays
        if args.ray_depth is not None:
            rlr_kwargs["indirect_ray_depth"] = args.ray_depth
        return dict(
            mesh=_load_mesh_cached(mesh),
            material=args.material if args.materials else None,
            add_to_context=False,
            rlr_kwargs=rlr_kwargs,
            seed=int(rng.integers(2**31)),
        )
    if args.backend == "sofa":
        if room is not None:
            if args.sofa_dir is None:
                raise SystemExit("--sofa-dir is required with --assets on the sofa backend")
            # Accept both the repo converter's layout (download_rirs.py
            # convert-tau writes tau_{room}_{fmt}.sofa) and the bare name
            cands = [
                Path(args.sofa_dir) / f"tau_{room}_{args.channel_layout}.sofa",
                Path(args.sofa_dir) / f"{room}_{args.channel_layout}.sofa",
            ]
            sofa = next((c for c in cands if c.is_file()), cands[0])
        elif args.sofa is not None:
            sofa = args.sofa
        else:
            raise ValueError("--sofa or --assets is required for the sofa backend")
        return dict(sofa=sofa)
    raise ValueError(f"Unknown backend {args.backend}")


def build_scene(
    args,
    split: str,
    scene_num: int,
    scape_num: int,
    rng: np.random.Generator,
    depth: int = 0,
    room: str = None,
):
    """Construct + place one scene; returns (scene, audio_path, metadata_path)
    or None when the outputs already exist (resume). Retries recursively when
    zero events place."""
    fold = 1 if split == "train" else 2
    common = f"dev-{split}-alight/fold{fold}_scene{scene_num}_{str(scape_num).zfill(3)}"
    audio_path = Path(args.output_dir) / f"{args.channel_layout}_dev/{common}"
    metadata_path = Path(args.output_dir) / f"metadata_dev/{common}"

    # Resume: skip scenes whose outputs already exist
    wav_out = audio_path.parent / f"{audio_path.name}_mic000.wav"
    csv_out = metadata_path.parent / f"{metadata_path.name}_mic000.csv"
    if wav_out.is_file() and csv_out.is_file():
        logger.warning(f"Skipping existing scene {common}")
        return None

    audio_path.parent.mkdir(parents=True, exist_ok=True)
    metadata_path.parent.mkdir(parents=True, exist_ok=True)

    scene = Scene(
        duration=args.duration,
        sample_rate=SAMPLE_RATE,
        backend=args.backend,
        backend_kwargs=build_backend_kwargs(args, rng, room=room),
        fg_path=args.fg_dir,
        max_overlap=args.max_overlap,
        event_augmentations=(
            get_augmentations(args.augmentations) if args.augmentations else None
        ),
        class_mapping="DCASE2023Task3",
    )

    mic_type = "foalistener" if args.channel_layout == "foa" else "ambeovr"
    scene.add_microphone(microphone_type=mic_type)

    n_static = int(rng.integers(args.min_events_static, args.max_events_static + 1))
    n_moving = int(rng.integers(args.min_events_moving, args.max_events_moving + 1))

    placed = 0
    for _ in range(n_static):
        try:
            scene.add_event(
                event_type="static",
                augmentations=1 if args.augmentations else None,
                max_place_attempts=100,
            )
            placed += 1
        except (ValueError, FileNotFoundError) as e:
            logger.warning(f"Could not place static event: {e}")
    for _ in range(n_moving):
        try:
            scene.add_event(
                event_type="moving",
                augmentations=1 if args.augmentations else None,
                max_place_attempts=100,
            )
            placed += 1
        except (ValueError, FileNotFoundError) as e:
            logger.warning(f"Could not place moving event: {e}")

    # A scene with zero events is useless: retry recursively (bounded)
    if placed == 0:
        if depth >= 5:
            raise RuntimeError(f"Could not place any events for scene {common}")
        logger.warning(f"No events placed for {common}; retrying...")
        return build_scene(args, split, scene_num, scape_num, rng, depth + 1, room=room)

    scene.add_ambience(noise="gaussian")
    return scene, audio_path, metadata_path


def write_outputs(scene, audio_path: Path, metadata_path: Path) -> None:
    """Write the DCASE outputs for an already-rendered scene (scene.audio set):
    per-mic WAVs next to audio_path, metadata JSON + DCASE CSVs under
    metadata_path. Matches Scene.generate's file layout."""
    import json

    from audiblelight_tpu.io.audio import wav_write
    from audiblelight_tpu.synthesize import generate_dcase2024_metadata

    for mic_alias, mic_audio in scene.audio.items():
        # 16-bit PCM: the reference's sf.write WAV default (PCM_16), and the
        # DCASE distribution format — also half the write bytes of float32.
        wav_write(
            audio_path.parent / f"{audio_path.name}_{mic_alias}.wav",
            mic_audio,
            int(scene.sample_rate),
            subtype="int16",
        )
    with open(metadata_path.with_suffix(".json"), "w") as f:
        json.dump(scene.to_dict(), f, indent=4, ensure_ascii=False)
    for mic, df in generate_dcase2024_metadata(scene).items():
        df.to_csv(
            metadata_path.parent / f"{metadata_path.name}_{mic}.csv",
            sep=",", encoding="utf-8", header=None,
        )


def generate(
    args,
    split: str,
    scene_num: int,
    scape_num: int,
    rng: np.random.Generator,
    depth: int = 0,
    room: str = None,
) -> None:
    """Generate one complete scene (audio + DCASE csv + JSON), with resume/retry."""
    built = build_scene(args, split, scene_num, scape_num, rng, depth, room=room)
    if built is None:
        return
    scene, audio_path, metadata_path = built
    scene.generate(
        output_dir=audio_path.parent,
        audio=True,
        metadata_json=True,
        metadata_dcase=True,
        audio_fname=audio_path.name,
        metadata_fname=audio_path.name,
        # The production path: whole-scene device stems + host mix — the same
        # code bench.py measures (audiblelight_tpu.pipeline).
        compiled=(args.pipeline == "compiled"),
    )
    # Move metadata files into metadata_dev (generate writes next to audio)
    for produced in audio_path.parent.glob(f"{audio_path.name}*.csv"):
        produced.rename(metadata_path.parent / produced.name)
    for produced in audio_path.parent.glob(f"{audio_path.name}.json"):
        produced.rename(metadata_path.parent / produced.name)


def generate_fused(args, jobs, rng: np.random.Generator) -> None:
    """Render every job through ONE compiled device program
    (pipeline.render_scenes_pipelined(fused=True)): trace + stems in a single
    dispatch per scene, placement/IO overlapped with device compute — the
    dataset-scale fast path bench.py's headline measures. Scenes whose layout
    exceeds the bucket shapes fall back to the plan path transparently.
    """
    from audiblelight_tpu.pipeline import render_scenes_pipelined

    paths = {}

    def factory():
        for idx, (split, scene_num, room, scape) in enumerate(jobs):
            logger.warning(f"[{idx + 1}/{len(jobs)}] {split} scene {scene_num} scape {scape}")
            built = build_scene(args, split, scene_num, scape, rng, room=room)
            if built is None:
                continue
            scene, audio_path, metadata_path = built
            paths[id(scene)] = (audio_path, metadata_path)
            yield scene

    def complete(scene, audio):
        scene.audio = audio
        audio_path, metadata_path = paths.pop(id(scene))
        write_outputs(scene, audio_path, metadata_path)

    def bucket(n):
        p = 1
        while p < n:
            p *= 2
        return p

    render_scenes_pipelined(
        factory(),
        complete,
        max_in_flight=4,
        plan_kwargs=dict(
            max_static=bucket(max(args.max_events_static, 1)),
            max_moving=bucket(max(args.max_events_moving, 1)),
            max_traj=32,
            pad_audio_seconds=config.MAX_EVENT_DURATION,
        ),
        fused=True,
        fused_batch=args.fused_batch,
        # Whole-scene-to-WAV device program (stems placed + ambience + int16
        # on device); scenes it cannot serve fall back transparently.
        device_mix=args.device_mix,
    )


def _pooled_plan_kwargs(args):
    def bucket(n):
        p = 1
        while p < n:
            p *= 2
        return p

    return dict(
        max_static=bucket(max(args.max_events_static, 1)),
        max_moving=bucket(max(args.max_events_moving, 1)),
        max_traj=32,
        pad_audio_seconds=config.MAX_EVENT_DURATION,
    )


def make_pooled_prep(args_dict, jobs, plan_kwargs):
    """Worker-side builder for the scene-prep pool (prep.ScenePrepPool).

    Each worker resolves the job table once; per task it places + packs one
    scene with its OWN per-job rng seed — pooled runs are therefore
    reproducible independent of worker count (the serial path's shared rng
    stream is order-dependent by construction).
    """
    import argparse as _argparse

    from audiblelight_tpu.prep import prep_scene

    args = _argparse.Namespace(**args_dict)

    def prep(index, seed):
        split, scene_num, room, scape = jobs[index]
        # Per-JOB seeding of the global streams too: the Scene's scipy
        # placement distributions draw from numpy's global RNG, so without
        # this every run (and every worker interleaving) places differently.
        utils.seed_everything(int(seed) % (2**31))
        rng = np.random.default_rng(seed)
        built = build_scene(args, split, scene_num, scape, rng, room=room)
        if built is None:  # outputs appeared since the main-process scan
            return None
        scene, _, _ = built
        return prep_scene(scene, index, plan_kwargs)

    return prep


def generate_pooled(args, jobs, rng: np.random.Generator) -> None:
    """Scale-out dataset driver: worker-pool placement (--placement-workers)
    feeding the whole-scene-to-WAV device program, optionally SHARDED over a
    device mesh (--mesh-devices N; --coordinator for multi-host clusters).
    Replaces the reference's serial per-scene loop
    (reference scripts/seld/generate_dataset.py:330-376). rlr backend only.
    """
    import json

    from audiblelight_tpu.io.audio import wav_write
    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.prep import (
        ScenePrepPool,
        render_prepped_scenes,
    )
    from audiblelight_tpu.render import build_scene_plan

    if args.backend != "rlr":
        raise SystemExit("--placement-workers/--mesh-devices require --backend rlr")

    plan_kwargs = _pooled_plan_kwargs(args)

    # Resume filter + per-job paths (the workers skip this bookkeeping)
    live_jobs, paths, seeds = [], {}, {}
    for job in jobs:
        split, scene_num, room, scape = job
        fold = 1 if split == "train" else 2
        common = f"dev-{split}-alight/fold{fold}_scene{scene_num}_{str(scape).zfill(3)}"
        audio_path = Path(args.output_dir) / f"{args.channel_layout}_dev/{common}"
        metadata_path = Path(args.output_dir) / f"metadata_dev/{common}"
        wav_out = audio_path.parent / f"{audio_path.name}_mic000.wav"
        csv_out = metadata_path.parent / f"{metadata_path.name}_mic000.csv"
        seed = int(rng.integers(2**31))  # drawn per job, even for skipped ones
        if wav_out.is_file() and csv_out.is_file():
            logger.warning(f"Skipping existing scene {common}")
            continue
        audio_path.parent.mkdir(parents=True, exist_ok=True)
        metadata_path.parent.mkdir(parents=True, exist_ok=True)
        idx = len(live_jobs)
        live_jobs.append(job)
        paths[idx] = (audio_path, metadata_path)
        seeds[idx] = seed

    if not live_jobs:
        return

    mesh = None
    if args.mesh_devices > 1:
        import jax
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.mesh_devices:
            raise SystemExit(
                f"--mesh-devices {args.mesh_devices} but only {len(devs)} devices"
            )
        mesh = Mesh(np.array(devs[: args.mesh_devices]), ("scene",))

    def complete(prepped, wav):
        audio_path, metadata_path = paths[prepped.index]
        wav_write(
            audio_path.parent / f"{audio_path.name}_{prepped.mic_alias}.wav",
            wav, SAMPLE_RATE, subtype="int16",
        )
        for mic, text in prepped.csv_texts.items():
            (metadata_path.parent / f"{metadata_path.name}_{mic}.csv").write_text(text)
        (metadata_path.with_suffix(".json")).write_text(prepped.scene_json)

    args_dict = dict(vars(args))
    fused_batch = args.fused_batch
    if mesh is not None:  # group size must divide the mesh axis
        n_dev = int(mesh.shape["scene"])
        fused_batch = max(fused_batch, n_dev)
        fused_batch -= fused_batch % n_dev

    # Room groups: each FusedSceneRenderer bakes ONE room's geometry into its
    # compiled program, so jobs are driven room by room (workers handle any
    # room — the job table tells them which mesh to build per task).
    room_groups: "OrderedDict" = OrderedDict()
    for idx, job in enumerate(live_jobs):
        room_groups.setdefault(job[2], []).append(idx)

    total = 0
    with ScenePrepPool(
        "generate_dataset:make_pooled_prep",
        dict(args_dict=args_dict, jobs=live_jobs, plan_kwargs=plan_kwargs),
        workers=args.placement_workers,
    ) as pool:
        for room, indices in room_groups.items():
            # Template scene pins this room's mesh/mic/engine identity; one
            # renderer per source bucket shares it.
            t_split, t_scene_num, t_room, t_scape = live_jobs[indices[0]]
            utils.seed_everything(int(seeds[indices[0]]) % (2**31))
            t_rng = np.random.default_rng(seeds[indices[0]])
            built = build_scene(
                args, t_split, t_scene_num, t_scape, t_rng, room=t_room
            )
            if built is None:
                raise RuntimeError(f"template scene build failed for room {room}")
            template_scene, _, _ = built
            template_plan = build_scene_plan(
                template_scene, trace=False, build_ambience=False, **plan_kwargs
            )
            renderers = {}

            def renderer_for(bucket, _s=template_scene, _p=template_plan, _r=renderers):
                r = _r.get(bucket)
                if r is None:
                    r = _r[bucket] = FusedSceneRenderer(_s, _p, bucket_sources=bucket)
                return r

            prepped = (
                p for p in pool.imap([(i, seeds[i]) for i in indices])
                if p is not None
            )
            total += render_prepped_scenes(
                renderer_for, prepped, complete,
                fused_batch=fused_batch, mesh=mesh,
            )
    logger.warning(f"Pooled driver rendered {total} scenes")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fg-dir", type=str, required=True, help="foreground audio root")
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--backend", choices=["shoebox", "rlr", "sofa"], default="shoebox")
    parser.add_argument("--mesh", type=str, default=None, help="mesh file (rlr backend)")
    parser.add_argument("--sofa", type=str, default=None, help="SOFA file (sofa backend)")
    parser.add_argument(
        "--assets",
        type=str,
        default=None,
        help="room split from seld_dataset_assets (e.g. 9A, 12, 144): iterate "
        "train/test rooms x scapes-per-room for the full 1200-scene DCASE2023 "
        "layout. Missing Gibson meshes get deterministic synthetic stand-ins.",
    )
    parser.add_argument(
        "--mesh-dir", type=str, default=None,
        help="directory holding Gibson .glb meshes (used with --assets)",
    )
    parser.add_argument(
        "--sofa-dir", type=str, default=None,
        help="directory holding TAU-SRIR .sofa files (used with --assets)",
    )
    parser.add_argument(
        "--scapes-per-room", type=int, default=None,
        help="override the asset table's per-room scape counts (smoke tests)",
    )
    parser.add_argument("--channel-layout", choices=["foa", "mic"], default="mic")
    parser.add_argument("--n-scenes", type=int, default=10, help="scenes per split")
    parser.add_argument("--train-frac", type=float, default=0.75)
    parser.add_argument("--max-overlap", type=int, default=config.MAX_OVERLAP)
    parser.add_argument("--min-events-static", type=int, default=config.MIN_STATIC_EVENTS)
    parser.add_argument("--max-events-static", type=int, default=config.MAX_STATIC_EVENTS)
    parser.add_argument("--min-events-moving", type=int, default=config.MIN_MOVING_EVENTS)
    parser.add_argument("--max-events-moving", type=int, default=config.MAX_MOVING_EVENTS)
    parser.add_argument(
        "--augmentations",
        nargs="*",
        default=[],
        choices=list(AUGMENTATIONS.keys()),
        help="augmentation pool; one random augmentation per event",
    )
    parser.add_argument("--materials", action="store_true", help="use acoustic materials")
    parser.add_argument("--material", type=str, default="Default")
    parser.add_argument("--ism-order", type=int, default=12, help="shoebox image order")
    parser.add_argument("--rays", type=int, default=None, help="indirect ray count (rlr)")
    parser.add_argument("--ray-depth", type=int, default=None, help="indirect ray depth (rlr)")
    parser.add_argument("--ir-seconds", type=float, default=config.MAX_IR_SECONDS)
    parser.add_argument(
        "--fused-batch", type=int, default=4,
        help="scenes per fused device dispatch (amortises link RPC latency; "
        "only applies to --pipeline fused)",
    )
    parser.add_argument("--duration", type=float, default=DURATION)
    parser.add_argument("--seed", type=int, default=utils.SEED)
    parser.add_argument(
        "--pipeline", choices=["fused", "compiled", "classic"], default=None,
        help="fused = ONE device dispatch per scene (trace + stems in a single "
        "compiled program, dispatch-ahead, IO overlapped — bench.py's headline "
        "path; rlr backend, the rlr default); compiled = whole-scene device "
        "stem programs + host mix (default elsewhere); classic = "
        "reference-style per-event loop",
    )
    parser.add_argument(
        "--mesh-simplification", action=argparse.BooleanOptionalAction, default=True,
        help="trace the energy tail against a decimated acoustic LOD of the "
        "room (exact direct path keeps the full mesh); rlr backend only",
    )
    parser.add_argument(
        "--ray-decimation", action=argparse.BooleanOptionalAction, default=False,
        help="progressive Russian-roulette wavefront decimation for deep "
        "traces (~40%% faster bounce loop, adds bounded late-tail Monte-Carlo "
        "noise); default off = the reference rlr behaviour",
    )
    parser.add_argument(
        "--diffraction", action=argparse.BooleanOptionalAction, default=True,
        help="knife-edge diffraction for occluded direct paths (reference rlr "
        "parity default: on, max order 10)",
    )
    parser.add_argument(
        "--device-mix", action=argparse.BooleanOptionalAction, default=True,
        help="render the COMPLETE WAV on device (stem placement + ambience "
        "bed + int16) in the fused pipeline; scenes with file-based or "
        "multiple ambiences fall back to the host-mix path automatically",
    )
    parser.add_argument(
        "--placement-workers", type=int, default=0,
        help="scene-prep worker PROCESSES (placement, audio load, metadata) "
        "feeding the device; 0 = inline. >0 selects the pooled driver "
        "(rlr backend only), whose per-job rng seeding is reproducible "
        "independent of worker count",
    )
    parser.add_argument(
        "--mesh-devices", type=int, default=1,
        help="shard each scene batch over this many accelerator devices "
        "(jax.sharding.Mesh data parallelism); 1 = single device",
    )
    parser.add_argument(
        "--coordinator", type=str, default=None,
        help="host:port of the jax.distributed coordinator for multi-host "
        "runs (use with --num-processes/--process-id)",
    )
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()
    if args.pipeline is None:
        args.pipeline = "fused" if args.backend == "rlr" else "compiled"

    if args.coordinator is not None:
        # Multi-host cluster: rendezvous BEFORE any backend touch, then
        # jax.devices() spans every host's chips and --mesh-devices may
        # address the global device count.
        from audiblelight_tpu.parallel import init_distributed

        init_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    # Seed the GLOBAL streams as well: the Scene's scipy placement
    # distributions draw from numpy's global RNG (same discipline as the
    # reference's utils.seed_everything at reference utils.py:80).
    utils.seed_everything(args.seed)
    rng = np.random.default_rng(args.seed)

    if args.assets is not None:
        # Full dataset layout: iterate rooms x splits from the asset table
        # (reference generate_dataset.py:330-376 — but rooms here may resolve
        # to deterministic synthetic stand-ins when Gibson meshes are absent).
        from seld_dataset_assets import get_assets

        chosen = get_assets(args.backend, args.assets)
        jobs = []
        for split in ("train", "test"):
            per_room = (
                args.scapes_per_room
                if args.scapes_per_room is not None
                else chosen[f"scapes_per_{split}_mesh"]
            )
            for room_idx, room in enumerate(chosen[split]):
                for scape in range(per_room):
                    jobs.append((split, room_idx, room, scape))
    else:
        n_train = round(args.n_scenes * args.train_frac)
        jobs = [("train", 1, None, i) for i in range(n_train)] + [
            ("test", 1, None, i) for i in range(args.n_scenes - n_train)
        ]

    if args.placement_workers > 0 or args.mesh_devices > 1:
        # Scale-out driver: worker-pool placement + (optionally) a device
        # mesh. Replaces the serial loop AND the single-device fused path.
        generate_pooled(args, jobs, rng)
        return

    if args.pipeline == "fused":
        if args.backend != "rlr":
            raise SystemExit("--pipeline fused requires the rlr backend")
        generate_fused(args, jobs, rng)
        return

    for idx, (split, scene_num, room, scape) in enumerate(jobs):
        logger.warning(f"[{idx + 1}/{len(jobs)}] {split} scene {scene_num} scape {scape}")
        generate(args, split, scene_num=scene_num, scape_num=scape, rng=rng, room=room)


if __name__ == "__main__":
    main()
