"""Real-world asset fixtures (tests/resources + resources/waypoints).

The synthetic fixtures elsewhere validate numerics; these validate the loaders
against REAL files — FSD50K PCM16 clips, Gibson navigation waypoints, class
JPEGs — the way the reference tests on its checked-in `tests/test_resources`
(reference tests/utils_tests.py:14-24, conftest.py:20-32).
"""

from pathlib import Path

import numpy as np
import pytest

RES = Path(__file__).parent / "resources"
WAYPOINTS = (
    Path(__file__).resolve().parents[1] / "resources" / "waypoints" / "gibson" / "Oyens.json"
)


def test_real_fsd50k_clips_decode():
    """Every checked-in FSD50K clip decodes: mono, 44.1 kHz, nonzero, in-range."""
    from audiblelight_tpu.io.audio import wav_read

    wavs = sorted(RES.glob("soundevents/*/*.wav"))
    assert len(wavs) >= 7
    for w in wavs:
        audio, sr = wav_read(w)
        assert sr == 44100
        assert audio.shape[0] == 1  # (channels, samples), mono
        assert audio.shape[1] > 10000
        assert np.abs(audio).max() <= 1.0
        assert np.abs(audio).max() > 1e-3  # real content, not digital silence


def test_real_clip_resamples_to_dataset_rate():
    """Event.load_audio resamples a real 44.1 kHz clip to the 24 kHz SELD rate."""
    from audiblelight_tpu.event import Event

    clip = RES / "soundevents" / "femaleSpeech" / "236385.wav"
    ev = Event(
        filepath=clip, alias="ev", sample_rate=24000,
        scene_start=0.0, event_start=0.0,
    )
    audio = ev.load_audio(normalize=True)
    assert audio.ndim == 1
    # 17300 frames @ 44.1k -> ~9415 @ 24k
    assert abs(len(audio) - round(17300 * 24000 / 44100)) <= 2
    assert np.isclose(np.abs(audio).max(), 1.0, atol=1e-3)


def test_real_waypoints_load_via_default_location():
    """The real Gibson Oyens waypoints load from the DEFAULT resources path
    (fixes the round-3 'default waypoints dir points nowhere' gap): a mesh
    whose fname is Oyens picks resources/waypoints/gibson/Oyens.json up
    automatically, and real entries survive in-mesh validation."""
    import json

    from audiblelight_tpu.geometry.mesh import box_mesh
    from audiblelight_tpu.worldstate.mesh_backend import WorldStateRLR

    assert WAYPOINTS.is_file()
    raw = json.load(open(WAYPOINTS))
    assert isinstance(raw, list) and all("waypoints" in e for e in raw)

    # Box spanning the real waypoints' bounding box (the Oyens GLB itself is
    # not redistributable at test-asset size; the loader + validation path is
    # what this exercises)
    pts = np.concatenate([np.asarray(e["waypoints"], dtype=float) for e in raw])
    lo, hi = pts.min(0) - 1.0, pts.max(0) + 1.0
    hi[2] = pts[:, 2].max() + 2.0  # headroom: waypoints are floor-level
    mesh = box_mesh(
        extents=(hi - lo).tolist(), center=((hi + lo) / 2).tolist()
    )
    mesh.metadata["fname"] = "Oyens"
    ws = WorldStateRLR(mesh=mesh, add_to_context=False, seed=0)
    assert len(ws.waypoints) > 0
    for wp in ws.waypoints[:5]:
        assert wp.ndim == 2 and wp.shape[1] == 3


def test_real_waypoints_drive_a_predefined_event():
    """add_event(event_type="predefined") consumes the real Gibson nav paths
    (reference core.py:1514: trajectories default to state.waypoints)."""
    import json

    from audiblelight_tpu import Scene
    from audiblelight_tpu.geometry.mesh import box_mesh

    raw = json.load(open(WAYPOINTS))
    pts = np.concatenate([np.asarray(e["waypoints"], dtype=float) for e in raw])
    lo, hi = pts.min(0) - 1.0, pts.max(0) + 1.0
    hi[2] = pts[:, 2].max() + 2.0
    mesh = box_mesh(extents=(hi - lo).tolist(), center=((hi + lo) / 2).tolist())
    mesh.metadata["fname"] = "Oyens"

    scene = Scene(
        duration=12.0, sample_rate=24000, backend="rlr",
        fg_path=RES / "soundevents",
        backend_kwargs=dict(
            mesh=mesh, add_to_context=False, seed=1,
            rlr_kwargs=dict(
                indirect_ray_count=128, indirect_ray_depth=4, max_ir_length=0.05
            ),
        ),
    )
    assert scene.state.waypoints, "real waypoints must have loaded"
    scene.add_microphone(
        microphone_type="monocapsule", position=((hi + lo) / 2).tolist(), alias="m"
    )
    # A clip long enough (7.1 s) that the pinned 5 s duration is not clamped
    # to the file length: every real nav path's implied velocity
    # (path extent / duration) then lands inside the default 0.5-2 m/s band
    ev = scene.add_event(
        event_type="predefined", duration=5.0, scene_start=0.0, event_start=0.0,
        snr=5.0, max_place_attempts=50,
        filepath=RES / "soundevents" / "musicInstrument" / "8391.wav",
    )
    assert ev.is_moving
    traj = np.stack([e.coordinates_absolute for e in ev.emitters]).reshape(-1, 3)
    # The trajectory's points all come from one real waypoint path
    flat = {tuple(np.round(p, 3)) for p in pts}
    hits = sum(tuple(np.round(p, 3)) in flat for p in traj)
    assert hits >= 2, "predefined trajectory should reuse real waypoint vertices"


def test_real_class_images_load():
    from audiblelight_tpu.event import Event

    for img in sorted(RES.glob("images/*/*.jpg")):
        ev = Event(
            filepath=RES / "soundevents" / "femaleSpeech" / "236385.wav",
            alias="ev", image_filepath=img,
            scene_start=0.0, event_start=0.0,
        )
        arr = ev.load_image()
        assert arr.dtype == np.uint8
        assert arr.ndim == 3 and arr.shape[2] == 3
        assert arr.shape[0] > 10 and arr.shape[1] > 10


def test_scene_e2e_on_real_clips(tmp_path):
    """Scene end-to-end on the real FSD50K pool: placement draws real files,
    DCASE labels infer from the class directories, audio renders non-silent."""
    from audiblelight_tpu import Scene

    scene = Scene(
        duration=4.0,
        sample_rate=24000,
        backend="shoebox",
        fg_path=RES / "soundevents",
        backend_kwargs=dict(
            dimensions=[6.0, 4.0, 3.0], max_order=3, max_ir_length=0.1,
            frequency_bands=1, seed=0,
        ),
        class_mapping="DCASE2023Task3",
    )
    scene.add_microphone(microphone_type="ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    scene.add_event(
        event_type="static", scene_start=0.5, event_start=0.0, duration=1.5,
        snr=10.0, filepath=RES / "soundevents" / "femaleSpeech" / "236657.wav",
    )
    scene.add_event(
        event_type="static", scene_start=2.0, event_start=0.0, duration=1.5,
        snr=10.0, filepath=RES / "soundevents" / "telephone" / "411581.wav",
    )
    scene.generate(
        output_dir=tmp_path, audio=True, metadata_json=True, metadata_dcase=True
    )

    wavs = list(tmp_path.glob("*.wav"))
    assert wavs, "generate must write the mic WAV"
    from audiblelight_tpu.io.audio import wav_read

    audio, sr = wav_read(wavs[0])
    assert sr == 24000
    assert np.abs(audio).max() > 1e-4

    csvs = list(tmp_path.glob("*.csv"))
    assert csvs
    import pandas as pd

    df = pd.read_csv(csvs[0], header=None)
    # DCASE2023Task3: femaleSpeech = 0, telephone = 3 — label inference from
    # the real class-directory layout
    classes = set(df[1].astype(int))
    assert 0 in classes
    assert 3 in classes


def test_real_fma_mp3_decodes():
    """A real FMA music MP3 (the reference's music event source format)
    decodes through the libmpg123 ctypes path: correct duration from the
    header scan, resampled mono audio, sane amplitude."""
    from audiblelight_tpu.io.audio import get_duration, load_audio

    mp3 = RES / "soundevents" / "music" / "000010.mp3"
    dur = get_duration(mp3)
    assert 25.0 < dur < 35.0
    audio, sr = load_audio(mp3, sr=24000, mono=True, duration=3.0)
    assert sr == 24000
    a = np.ravel(np.asarray(audio))
    assert a.shape[0] == 3 * 24000
    assert 1e-3 < np.abs(a).max() < 2.0


def test_real_mp3_event_in_scene(tmp_path):
    """The real MP3 drives an Event end-to-end (load -> normalise -> spatial
    cache), the way scripts/ssseg consumes FMA music stems."""
    from audiblelight_tpu.event import Event

    ev = Event(
        filepath=RES / "soundevents" / "music" / "000010.mp3",
        alias="music0",
        scene_start=0.0, event_start=0.0, duration=2.0,
        sample_rate=24000,
    )
    audio = ev.load_audio()
    a = np.ravel(np.asarray(audio))
    assert a.shape[0] == 2 * 24000
    assert np.isfinite(a).all()
