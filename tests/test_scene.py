"""End-to-end tests for the Scene orchestrator + synthesis engine."""

import json

import numpy as np
import pytest

from audiblelight_tpu import Scene
from audiblelight_tpu.augmentation import Gain, LowpassFilter
from audiblelight_tpu.io.audio import wav_read, wav_write

SR = 44100
C = 343.0


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    """A foreground audio dir with class-labelled subdirectories."""
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("fg")
    for cls, freq in [("maleSpeech", 220.0), ("femaleSpeech", 440.0), ("music", 660.0)]:
        d = root / cls
        d.mkdir()
        for i in range(2):
            t = np.arange(SR * 3) / SR
            sig = 0.5 * np.sin(2 * np.pi * freq * t) * np.exp(-t * 0.5)
            sig += 0.01 * rng.standard_normal(len(t))
            wav_write(d / f"{cls}_{i}.wav", sig.astype(np.float32), SR)
    return root


def shoebox_kwargs():
    return dict(
        dimensions=[6.0, 4.0, 3.0],
        max_order=4,
        max_ir_length=0.15,
        frequency_bands=1,
        seed=0,
    )


@pytest.fixture
def scene(fg_dir):
    return Scene(
        duration=10.0,
        backend="shoebox",
        fg_path=fg_dir,
        backend_kwargs=shoebox_kwargs(),
        ref_db=-50,
    )


def test_scene_construction(scene):
    assert scene.duration == 10.0
    assert scene.sample_rate == SR
    assert scene.state.name == "SHOEBOX"
    assert len(scene.fg_audios) == 6
    assert scene.class_mapping is not None


def test_scene_backend_from_instance(fg_dir):
    from audiblelight_tpu.worldstate import WorldStateShoebox

    ws = WorldStateShoebox(**shoebox_kwargs())
    s = Scene(duration=10.0, backend=ws)
    assert s.state is ws
    with pytest.raises(ValueError):
        ws2 = WorldStateShoebox(sample_rate=22050, **{k: v for k, v in shoebox_kwargs().items()})
        Scene(duration=10.0, backend=ws2)  # sample rate mismatch


def test_add_static_event_and_generate(scene, tmp_path):
    scene.add_microphone(microphone_type="ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    ev = scene.add_event(
        event_type="static",
        position=[1.0, 1.0, 1.0],
        alias="e0",
        scene_start=2.0,
        event_start=0.0,
        duration=2.0,
        snr=10.0,
    )
    assert not ev.is_moving
    assert len(ev) == 1
    assert ev.class_label in ("maleSpeech", "femaleSpeech", "music")

    scene.add_ambience(noise="pink")
    scene.generate(output_dir=tmp_path, audio=True, metadata_json=True, metadata_dcase=True)

    # Audio written per mic with the right shape
    audio, sr = wav_read(tmp_path / "audio_out_m.wav")
    assert sr == SR
    assert audio.shape == (4, 10 * SR)
    # Event is audible in its time slot and absent before it
    assert np.abs(audio[:, int(2.2 * SR) : int(3.8 * SR)]).max() > np.abs(
        audio[:, : int(1.8 * SR)]
    ).max()

    # Metadata JSON round-trips
    meta = json.loads((tmp_path / "metadata_out.json").read_text())
    assert meta["backend"] == "SHOEBOX"
    assert "e0" in meta["events"]

    # DCASE CSV exists with frames 20..40 (2.0s-4.0s at 100ms)
    csv = (tmp_path / "metadata_out_m.csv").read_text().strip().splitlines()
    first = csv[0].split(",")
    assert int(first[0]) == 20
    last = csv[-1].split(",")
    assert int(last[0]) == 40


def test_add_moving_event(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5], alias="m")
    ev = scene.add_event(
        event_type="moving",
        alias="mover",
        shape="linear",
        scene_start=1.0,
        event_start=0.0,
        duration=2.5,
        snr=5.0,
        spatial_velocity=1.0,
        spatial_resolution=2.0,
    )
    assert ev.is_moving
    assert len(ev) == round(2.5 * 2.0) + 1  # duration * resolution + 1
    assert ev.shape == "linear"

    from audiblelight_tpu.synthesize import (
        generate_scene_audio_from_events,
        render_audio_for_all_scene_events,
    )

    render_audio_for_all_scene_events(scene)
    generate_scene_audio_from_events(scene)
    assert scene.audio["m"].shape == (1, 10 * SR)
    assert np.abs(scene.audio["m"]).max() > 0


def test_event_overlap_rejection(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    # max_overlap=2: two overlapping events fine, third raises
    for i in range(2):
        scene.add_event(
            event_type="static",
            alias=f"ev{i}",
            scene_start=1.0,
            event_start=0.0,
            duration=3.0,
            snr=10.0,
        )
    with pytest.raises(ValueError):
        scene.add_event(
            event_type="static",
            alias="ev2",
            scene_start=1.5,
            event_start=0.0,
            duration=2.0,
            snr=10.0,
        )


def test_event_beyond_scene_end_rejected(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    with pytest.raises(ValueError):
        scene.add_event(
            event_type="static",
            scene_start=9.5,
            event_start=0.0,
            duration=3.0,  # would end at 12.5 > 10
            snr=10.0,
        )


def test_polar_event_position(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5], alias="m")
    ev = scene.add_event(
        event_type="static",
        position=[0.0, 0.0, 1.5],  # 1.5 m in front (az=0, el=0)
        polar=True,
        scene_start=0.0,
        event_start=0.0,
        duration=1.0,
        snr=10.0,
    )
    np.testing.assert_allclose(ev.emitters[0].coordinates_absolute, [4.5, 2.0, 1.5], atol=1e-6)


def test_event_augmentations_applied(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    ev = scene.add_event(
        event_type="static",
        alias="aug_ev",
        augmentations=[LowpassFilter(sample_rate=SR, cutoff_frequency_hz=1000), Gain],
        scene_start=0.0,
        event_start=0.0,
        duration=1.0,
        snr=10.0,
    )
    assert len(ev.get_augmentations()) == 2
    # numeric request samples N random augmentations
    ev2 = scene.add_event(
        event_type="static",
        alias="aug_ev2",
        augmentations=2,
        scene_start=5.0,
        event_start=0.0,
        duration=1.0,
        snr=10.0,
    )
    assert len(ev2.get_augmentations()) == 2


def test_predefined_trajectory_event(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    traj = np.stack(
        [np.linspace([1.0, 1.0, 1.0], [3.0, 1.0, 1.0], 5)[i] for i in range(5)]
    )
    ev = scene.add_event(
        event_type="predefined",
        trajectory=traj,
        alias="pre",
        scene_start=1.0,
        event_start=0.0,
        duration=2.0,
        snr=10.0,
    )
    assert ev.is_moving
    assert len(ev) == 5
    assert ev.shape == "predefined"
    assert ev.spatial_velocity == pytest.approx(1.0, abs=0.01)


def test_scene_serialisation_roundtrip(scene, tmp_path):
    scene.add_microphone(microphone_type="ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    scene.add_event(
        event_type="static",
        position=[1.0, 1.0, 1.0],
        alias="e0",
        scene_start=2.0,
        event_start=0.0,
        duration=2.0,
        snr=10.0,
    )
    scene.add_ambience(noise="white")
    d = scene.to_dict()
    rebuilt = Scene.from_dict(d)
    assert rebuilt == scene
    assert len(rebuilt.events) == 1
    assert rebuilt.get_event("e0").class_id == scene.get_event("e0").class_id
    assert len(rebuilt.ambience) == 1

    # from_json too
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(d))
    rebuilt2 = Scene.from_json(p)
    assert rebuilt2 == scene


def test_duplicate_audio_policy(fg_dir):
    s = Scene(
        duration=10.0,
        backend="shoebox",
        fg_path=fg_dir,
        backend_kwargs=shoebox_kwargs(),
        allow_duplicate_audios=False,
    )
    s.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    f = s.fg_audios[0]
    s.add_event(event_type="static", filepath=f, scene_start=0.0, event_start=0.0, duration=1.0, snr=5.0)
    with pytest.raises(ValueError):
        s.add_event(event_type="static", filepath=f, scene_start=5.0, event_start=0.0, duration=1.0, snr=5.0)


def test_same_class_policy(fg_dir):
    s = Scene(
        duration=10.0,
        backend="shoebox",
        fg_path=fg_dir,
        backend_kwargs=shoebox_kwargs(),
        allow_same_class_events=False,
    )
    s.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    files = sorted(s.fg_audios)
    male = [f for f in files if "maleSpeech" in str(f) and "female" not in str(f)]
    s.add_event(event_type="static", filepath=male[0], scene_start=0.0, event_start=0.0, duration=1.0, snr=5.0)
    with pytest.raises(ValueError):
        s.add_event(event_type="static", filepath=male[1], scene_start=5.0, event_start=0.0, duration=1.0, snr=5.0)


def test_clear_event_removes_emitters(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    scene.add_event(
        event_type="static", alias="e0", scene_start=0.0, event_start=0.0, duration=1.0, snr=5.0
    )
    assert scene.state.num_emitters == 1
    scene.clear_event("e0")
    assert scene.state.num_emitters == 0
    assert len(scene.events) == 0
    with pytest.raises(KeyError):
        scene.clear_event("nonexistent")


def test_getters(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5], alias="m")
    scene.add_event(
        event_type="static", alias="e0", scene_start=0.0, event_start=0.0, duration=1.0, snr=5.0
    )
    assert scene.get_event(0) is scene.get_event("e0")
    assert scene["e0"] is scene.get_event("e0")
    assert len(list(iter(scene))) == 1
    assert scene.get_microphone("m").name == "monocapsule"
    assert len(scene.get_emitters("e0")) == 1
    with pytest.raises(KeyError):
        scene.get_event("missing")
    with pytest.raises(IndexError):
        scene.get_event(10)


def test_dcase_metadata_moving_interpolation(scene):
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5], alias="m")
    traj = np.linspace([1.0, 2.0, 1.0], [5.0, 2.0, 1.0], 5)  # passes 0.5 m below the mic
    scene.add_event(
        event_type="predefined",
        trajectory=traj,
        alias="mover",
        scene_start=0.0,
        event_start=0.0,
        duration=3.0,
        snr=10.0,
    )
    from audiblelight_tpu.synthesize import generate_dcase2024_metadata

    meta = generate_dcase2024_metadata(scene)["m"]
    # Event lasts 3 s -> frames 0..30
    assert meta.index.min() == 0
    assert meta.index.max() == 30
    az = meta["azimuth"].to_numpy()
    # Moving from -x side (az 180) to +x side (az 0) of the mic
    assert abs(az[0]) == 180
    assert az[-1] == 0
    dist = meta["distance"].to_numpy()
    expected_cm = round(np.sqrt(2.0**2 + 0.5**2) * 100)  # ~206 cm at both ends
    assert dist[0] == expected_cm and dist[-1] == expected_cm


def test_scene_video_generation(scene, tmp_path):
    pytest.importorskip("PIL")
    # video only supported on RLR backend: shoebox should raise
    scene.add_microphone(microphone_type="monocapsule", position=[3.0, 2.0, 1.5])
    scene.add_event(
        event_type="static", alias="e0", scene_start=0.0, event_start=0.0, duration=1.0, snr=5.0
    )
    from audiblelight_tpu.synthesize import generate_scene_video_from_events

    with pytest.raises(ValueError):
        generate_scene_video_from_events(scene, tmp_path / "vid")


def test_scene_from_json_file_roundtrip(scene, tmp_path):
    scene.add_microphone(microphone_type="ambeovr", position=[3, 2, 1.5])
    scene.add_event(event_type="static", scene_start=1.0, event_start=0.0,
                    duration=2.0, snr=5.0)
    scene.add_ambience(noise="pink")
    out = tmp_path / "meta.json"
    import json

    with open(out, "w") as f:
        json.dump(scene.to_dict(), f)
    rebuilt = Scene.from_json(out)
    assert rebuilt == scene
    assert len(rebuilt.get_events()) == 1
    assert len(rebuilt.get_ambiences()) == 1


def test_scene_ambience_accessors(scene):
    scene.add_microphone(microphone_type="ambeovr", position=[3, 2, 1.5])
    scene.add_ambience(noise="pink", alias="amb0")
    scene.add_ambience(noise="white", alias="amb1")
    assert len(scene.get_ambiences()) == 2
    assert scene.get_ambience("amb0").beta == 1
    scene.clear_ambience()
    assert scene.get_ambiences() == []
    with pytest.raises(KeyError):
        scene.get_ambience("amb0")


def test_scene_add_microphone_and_emitter(scene):
    # Emitter 1 m in front of the sampled mic position (polar offset)
    scene.add_microphone_and_emitter(position=[0.0, 0.0, 1.0],
                                     microphone_type="monocapsule")
    mic = scene.get_microphones()[0]
    em = scene.state.get_emitter("src000")
    offset = em.coordinates_absolute - np.asarray(mic.coordinates_center)
    np.testing.assert_allclose(offset, [1.0, 0.0, 0.0], atol=1e-9)


def test_scene_generate_requires_existing_dir(scene, tmp_path):
    scene.add_microphone(microphone_type="monocapsule", position=[3, 2, 1.5])
    scene.add_event(event_type="static", scene_start=1.0, event_start=0.0,
                    duration=2.0, snr=5.0)
    with pytest.raises(FileNotFoundError):
        scene.generate(output_dir=tmp_path / "missing" / "nested")
