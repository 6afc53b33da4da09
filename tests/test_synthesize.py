"""Tests for the synthesis engine against a full numpy oracle of the reference
render math (the deterministic SOFA/convolution parity path from BASELINE.md)."""

import numpy as np
import pytest
from scipy import signal as ssignal

from audiblelight_tpu import Scene
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.io.sofa import write_sofa
from audiblelight_tpu.synthesize import (
    apply_snr,
    db_to_multiplier,
    generate_dcase2024_metadata,
    normalize_irs,
    render_event_audio,
    time_invariant_convolution,
    validate_scene,
)

SR = 44100


# ---------------------------------------------------------------------------
# Level math
# ---------------------------------------------------------------------------


def test_apply_snr_peak():
    x = np.array([0.2, -0.8, 0.4])
    out = apply_snr(x, 12.0)
    assert np.isclose(np.abs(out).max(), 12.0)


def test_db_to_multiplier_definition():
    m = db_to_multiplier(-30.0, 0.25)
    assert np.isclose(20 * np.log10(m * 0.25), -30.0, atol=1e-3)


def test_normalize_irs_oracle(rng):
    irs = rng.standard_normal((5, 4, 128)).astype(np.float32)
    ours = normalize_irs(irs)
    e = np.sqrt(np.sum(np.abs(irs) ** 2, axis=-1, keepdims=True))
    e = e + np.finfo(np.float32).tiny
    oracle = irs / np.mean(e, axis=-2, keepdims=True)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_time_invariant_convolution_matches_scipy(rng):
    audio = rng.standard_normal(5000).astype(np.float32)
    ir = rng.standard_normal((300, 4)).astype(np.float32)
    ours = time_invariant_convolution(audio, ir)
    oracle = ssignal.fftconvolve(audio[:, None], ir, mode="full", axes=0).T
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-3)
    with pytest.raises(ValueError):
        time_invariant_convolution(np.zeros((2, 100)), ir)
    with pytest.raises(ValueError):
        time_invariant_convolution(audio, np.zeros(100))


# ---------------------------------------------------------------------------
# Full render oracle (deterministic SOFA path)
# ---------------------------------------------------------------------------


def np_render_event_oracle(audio, irs, snr, ref_db):
    """Pure-numpy implementation of the reference's static render chain
    (load+normalise -> energy-normalise IRs -> fftconvolve -> trim -> peak-snr
    -> mean->ref_db+snr), straight from the documented algorithm."""
    audio = audio / np.max(np.abs(audio) + np.finfo(np.float32).tiny)
    e = np.sqrt(np.sum(np.abs(irs.transpose(1, 0, 2)) ** 2, axis=-1, keepdims=True))
    e = e + np.finfo(np.float32).tiny
    irs_n = (irs.transpose(1, 0, 2) / np.mean(e, axis=-2, keepdims=True)).transpose(1, 0, 2)
    wet = ssignal.fftconvolve(audio[:, None], irs_n[:, 0].T, mode="full", axes=0).T
    wet = wet[:, : len(audio)]
    wet = wet * snr / np.abs(wet).max(initial=1e-15)
    scale = 10 ** ((ref_db + snr) / 20) / (
        np.mean(np.abs(wet)) + np.finfo(np.float32).tiny
    )
    return scale * wet


@pytest.fixture
def sofa_scene(tmp_path):
    """A Scene on a synthetic SOFA room with one static event (deterministic)."""
    rng = np.random.default_rng(5)
    # SOFA grid of 8 positions, 4 capsules, realistic-ish IRs
    grid = rng.uniform([1, 1, 1], [4, 3, 2], (8, 3))
    irs = np.zeros((8, 4, 4096))
    for m in range(8):
        for c in range(4):
            d = int(np.linalg.norm(grid[m] - [2.5, 2.0, 1.5]) / 343 * SR)
            irs[m, c, d] = 1.0 / (1 + d / 100)
            irs[m, c, d + 50 :] = rng.standard_normal(4096 - d - 50) * 0.01 * np.exp(
                -np.linspace(0, 6, 4096 - d - 50)
            )
    sofa_path = write_sofa(
        tmp_path / "room_mic.sofa", irs, grid, [2.5, 2.0, 1.5],
        rng.uniform(-0.02, 0.02, (4, 3)), SR,
    )

    fg = tmp_path / "fg" / "music"
    fg.mkdir(parents=True)
    t = np.arange(SR * 2) / SR
    dry = (0.6 * np.sin(2 * np.pi * 440 * t) * np.exp(-t)).astype(np.float32)
    wav_write(fg / "tone.wav", dry, SR)

    scene = Scene(
        duration=5.0,
        backend="sofa",
        backend_kwargs=dict(sofa=sofa_path),
        fg_path=tmp_path / "fg",
    )
    scene.add_event(
        event_type="static",
        position=grid[3],
        alias="ev",
        scene_start=1.0,
        event_start=0.0,
        duration=2.0,
        snr=10.0,
    )
    return scene, irs, dry


def test_render_event_audio_matches_oracle(sofa_scene):
    scene, all_irs, dry = sofa_scene
    scene.state.simulate()
    mic_irs = scene.state.irs[scene.state.mic_alias]  # (4, 1, S)
    event = scene.get_event("ev")

    render_event_audio(event, mic_irs, mic_alias=scene.state.mic_alias, ref_db=scene.ref_db)
    ours = event.spatial_audio[scene.state.mic_alias]

    oracle = np_render_event_oracle(dry, np.array(mic_irs), 10.0, scene.ref_db)
    assert ours.shape == oracle.shape
    # BASELINE parity bar: <= 1e-4 max-abs deviation on the deterministic path
    assert np.abs(ours - oracle).max() <= 1e-4


def test_render_no_emitter_tiling(sofa_scene):
    scene, _, _ = sofa_scene
    scene.state.simulate()
    event = scene.get_event("ev")
    empty_irs = np.zeros((4, 0, 128))
    render_event_audio(event, empty_irs, mic_alias="m", ref_db=-65)
    assert event.spatial_audio["m"].shape[0] == 4  # audio tiled across channels


def test_validate_scene_errors(sofa_scene):
    scene, _, _ = sofa_scene
    validate_scene(scene)  # valid as constructed
    events = scene.events
    scene.events = {}
    with pytest.raises(ValueError):
        validate_scene(scene)
    scene.events = events


def test_dcase_metadata_static(sofa_scene):
    scene, _, _ = sofa_scene
    meta = generate_dcase2024_metadata(scene)[scene.state.mic_alias]
    # Event spans 1.0 - 3.0 s -> frames 10..30
    assert meta.index.min() == 10
    assert meta.index.max() == 30
    assert (meta["active_class_index"] == 8).all()  # "music"
    # Static event: constant azimuth/elevation/distance
    assert meta["azimuth"].nunique() == 1
    assert meta["distance"].nunique() == 1


def test_dcase_metadata_source_ids(tmp_path):
    """Repeated audio files share a source ID; new files increment per class."""
    rng = np.random.default_rng(0)
    fg = tmp_path / "fg" / "music"
    fg.mkdir(parents=True)
    t = np.arange(SR) / SR
    for name in ["a", "b"]:
        wav_write(fg / f"{name}.wav", (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), SR)

    scene = Scene(
        duration=20.0,
        backend="shoebox",
        backend_kwargs=dict(dimensions=[6, 4, 3], max_order=2, max_ir_length=0.1, seed=0),
        fg_path=tmp_path / "fg",
    )
    scene.add_microphone(microphone_type="monocapsule", position=[3, 2, 1.5])
    scene.add_event(event_type="static", filepath=fg / "a.wav", alias="e1",
                    scene_start=0.0, event_start=0.0, duration=1.0, snr=5.0)
    scene.add_event(event_type="static", filepath=fg / "b.wav", alias="e2",
                    scene_start=5.0, event_start=0.0, duration=1.0, snr=5.0)
    scene.add_event(event_type="static", filepath=fg / "a.wav", alias="e3",
                    scene_start=10.0, event_start=0.0, duration=1.0, snr=5.0)

    meta = generate_dcase2024_metadata(scene)["mic000"]
    by_frame = {f: set(g["source_number_index"]) for f, g in meta.groupby(level=0)}
    assert by_frame[0] == {0}  # file a -> id 0
    assert by_frame[50] == {1}  # file b -> new id 1
    assert by_frame[100] == {0}  # file a again -> same id 0
