"""The multiprocess scene-prep pool (audiblelight_tpu.prep).

Validates the production placement engine the SELD script and bench use:
prepped payloads are numpy/string-only, the pooled driver's audio matches the
in-process device-mix pipeline exactly (same PRNG walk, same fused program),
and real worker processes (spawn, CPU-only) produce the same payloads as
inline prep.
"""

import os
import pickle
from pathlib import Path

import numpy as np
import pytest

from audiblelight_tpu.io.audio import wav_write

import prep_support

SR = 44100


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    rng = np.random.default_rng(1)
    root = tmp_path_factory.mktemp("fg")
    for cls, freq in [("maleSpeech", 220.0), ("music", 660.0)]:
        d = root / cls
        d.mkdir()
        t = np.arange(SR * 3) / SR
        sig = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * 0.5)
        sig += 0.01 * rng.standard_normal(len(t))
        wav_write(d / f"{cls}.wav", sig.astype(np.float32), SR)
    return root


def _renderer(fg_dir):
    from audiblelight_tpu.pipeline import FusedSceneRenderer
    from audiblelight_tpu.render import build_scene_plan

    template = prep_support.make_scene(fg_dir, seed=999)
    plan = build_scene_plan(
        template, trace=False, build_ambience=False, **prep_support.PLAN_KW
    )
    return FusedSceneRenderer(template, plan)


def test_prepped_scene_is_plain_data(fg_dir):
    """PreppedScene crosses process boundaries: numpy + strings only, and
    pickles without dragging Scene/WorldState/jax objects along."""
    from audiblelight_tpu.prep import prep_scene

    renderer = _renderer(fg_dir)
    scene = prep_support.make_scene(fg_dir, seed=5)
    p = prep_scene(scene, 0, prep_support.PLAN_KW, renderer._buckets, renderer._bucket)

    blob = pickle.dumps(p)
    assert len(blob) < 16 * 1024 * 1024  # a few MB of plan tensors, no bed
    p2 = pickle.loads(blob)
    for a, b in zip(p.inputs, p2.inputs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert p2.scene_json and p2.csv_texts
    for f in p2.plan_fields:
        assert isinstance(f, (np.ndarray, np.generic))


def test_pooled_driver_matches_pipeline_device_mix(fg_dir):
    """render_prepped_scenes (the pooled production driver) produces the SAME
    int16 WAV samples as render_scenes_pipelined(device_mix=True) for
    identical scene seeds — same PRNG walk, same fused program."""
    import jax

    from audiblelight_tpu.pipeline import render_scenes_pipelined
    from audiblelight_tpu.prep import prep_scene, render_prepped_scenes

    seeds = [11, 12]

    # In-process reference: the device-mix pipeline
    ref = {}
    scenes = [prep_support.make_scene(fg_dir, s) for s in seeds]
    for i, s in enumerate(scenes):
        s.state._key = jax.device_put(
            jax.random.PRNGKey(100 + i), jax.local_devices(backend="cpu")[0]
        )
    n = render_scenes_pipelined(
        iter(scenes), lambda s, a: ref.update({id(s): a["m"]}),
        plan_kwargs=prep_support.PLAN_KW, fused=True, fused_batch=2,
        device_mix=True,
    )
    assert n == 2
    ref_wavs = [ref[id(s)] for s in scenes]
    assert all(w.dtype == np.int16 for w in ref_wavs)

    # Pooled driver (inline prep), same seeds + keys
    renderer = _renderer(fg_dir)
    prepped = []
    for i, seed in enumerate(seeds):
        scene = prep_support.make_scene(fg_dir, seed)
        scene.state._key = jax.device_put(
            jax.random.PRNGKey(100 + i), jax.local_devices(backend="cpu")[0]
        )
        prepped.append(
            prep_scene(scene, i, prep_support.PLAN_KW, renderer._buckets, renderer._bucket)
        )
    got = {}
    n = render_prepped_scenes(
        renderer, iter(prepped), lambda p, wav: got.update({p.index: wav}),
        fused_batch=2,
    )
    assert n == 2
    for i, rw in enumerate(ref_wavs):
        assert got[i].dtype == np.int16
        assert got[i].shape == rw.shape
        # same program, same keys -> identical samples
        diff = np.abs(got[i].astype(np.int32) - rw.astype(np.int32)).max()
        assert diff <= 1, f"pooled driver diverges from pipeline: {diff} LSBs"


def test_worker_processes_produce_identical_payloads(fg_dir):
    """Real spawn workers (CPU-only JAX) return the same PreppedScene payload
    as inline prep for the same (index, seed)."""
    from audiblelight_tpu.prep import ScenePrepPool, _worker_init, _worker_task

    renderer = _renderer(fg_dir)
    kwargs = dict(
        fg_root=str(fg_dir),
        buckets=tuple(renderer._buckets),
        bucket_sources=int(renderer._bucket),
    )

    _worker_init("prep_support:build_prep", kwargs)
    inline = _worker_task((0, 21))

    with ScenePrepPool("prep_support:build_prep", kwargs, workers=1) as pool:
        (pooled,) = list(pool.imap([(0, 21)]))

    assert pooled.index == inline.index
    np.testing.assert_array_equal(pooled.inputs[0], inline.inputs[0])  # PRNG key
    np.testing.assert_array_equal(pooled.inputs[1], inline.inputs[1])  # sources
    np.testing.assert_array_equal(pooled.starts, inline.starts)
    for a, b in zip(pooled.plan_fields, inline.plan_fields):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    import json

    def _no_times(blob):
        d = json.loads(blob)
        for k in list(d):
            if "time" in k.lower() or "date" in k.lower():
                d.pop(k)
        return d

    assert _no_times(pooled.scene_json) == _no_times(inline.scene_json)
    assert pooled.csv_texts == inline.csv_texts


def test_worker_face_occlusion_matches_driver(fg_dir):
    """prep_scene computes the nonconvex rain-occlusion table worker-side
    (numpy), and it equals what the driver would compute from its own
    worldstate for the same mic points — so the pooled driver's fast path
    (shipping the worker table straight into the batched device_put) renders
    through the same visibility the fallback path does."""
    from audiblelight_tpu.prep import prep_scene

    renderer = _renderer(fg_dir)
    scene = prep_support.make_scene(fg_dir, seed=31)
    p = prep_scene(scene, 0, prep_support.PLAN_KW, renderer._buckets, renderer._bucket)

    assert p.face_occ is not None, "nonconvex scene should carry a worker table"
    assert isinstance(p.face_occ, np.ndarray)
    assert p.face_occ.shape[-1] == int(renderer._ws.acoustic_tris_device.shape[0])
    driver_side = np.asarray(renderer._ws.rain_occlusion_for(p.mic_pts))
    np.testing.assert_array_equal(p.face_occ, driver_side)
