"""Importable builder for ScenePrepPool worker-process tests.

Worker processes resolve this module by name ("prep_support:build_prep"), so
it must live on sys.path (pytest puts tests/ there; the spawn context
propagates it). Everything here is CPU-only.
"""

from pathlib import Path

import numpy as np


def make_scene(fg_root, seed):
    """A small scanned-room scene matching tests/test_pipeline.py's layout."""
    from audiblelight_tpu import Scene
    from audiblelight_tpu.geometry.mesh import scanned_like_room

    fg_root = Path(fg_root)
    scan = scanned_like_room(extents=(6.0, 4.0, 3.0), seed=0)
    scene = Scene(
        duration=6.0, sample_rate=24000, backend="rlr",
        fg_path=fg_root,
        backend_kwargs=dict(
            mesh=scan, seed=seed,
            rlr_kwargs=dict(
                indirect_ray_count=200, indirect_ray_depth=6,
                max_ir_length=0.15, mesh_simplification=True,
                diffraction=False,  # parity default ON; pinned off for CPU test speed
            ),
        ),
    )
    scene.add_microphone(microphone_type="ambeovr", alias="m")
    scene.add_event(
        event_type="static", alias="s0",
        scene_start=1.0, event_start=0.0, duration=2.0, snr=10.0,
        filepath=fg_root / "maleSpeech" / "maleSpeech.wav",
        max_place_attempts=200,
    )
    scene.add_event(
        event_type="moving", alias="m0", shape="linear",
        scene_start=3.0, event_start=0.0, duration=2.0, snr=8.0,
        spatial_velocity=1.0, spatial_resolution=2.0,
        filepath=fg_root / "music" / "music.wav",
        max_place_attempts=200,
    )
    scene.add_ambience(noise="gaussian")
    return scene


PLAN_KW = dict(max_static=2, max_moving=1, max_traj=8, pad_audio_seconds=2.0)


def build_prep(fg_root, buckets, bucket_sources):
    """Builder run once per worker: returns prep(index, seed) -> PreppedScene."""
    from audiblelight_tpu.prep import prep_scene

    def prep(index, seed):
        scene = make_scene(fg_root, seed)
        return prep_scene(scene, index, PLAN_KW, tuple(buckets), int(bucket_sources))

    return prep
