"""Unit tests for the Event model (mirroring reference test_event.py coverage)."""

import numpy as np
import pytest

from audiblelight_tpu.augmentation import Gain, LowpassFilter
from audiblelight_tpu.event import Event
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.worldstate import Emitter

SR = 44100


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    path = tmp_path_factory.mktemp("audio") / "maleSpeech_test.wav"
    t = np.arange(SR * 3) / SR
    wav_write(path, (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), SR)
    return path


def em(xyz=(1.0, 2.0, 3.0), alias="e"):
    return Emitter(alias=alias, coordinates_absolute=np.asarray(xyz))


def test_event_timing_fields(wav):
    ev = Event(filepath=wav, alias="e", scene_start=2.0, event_start=0.5, duration=1.5)
    assert ev.scene_start == 2.0
    assert ev.event_start == 0.5
    assert ev.duration == 1.5
    assert ev.event_end == 2.0
    assert ev.scene_end == 3.5
    assert np.isclose(ev.audio_full_duration, 3.0, atol=1e-3)


def test_event_duration_caps_to_audio(wav):
    # duration beyond the file falls back to available audio
    ev = Event(filepath=wav, alias="e", event_start=1.0, duration=10.0)
    assert np.isclose(ev.duration, 2.0, atol=1e-3)
    # event_start beyond the file resets to 0 with a warning
    ev2 = Event(filepath=wav, alias="e", event_start=99.0)
    assert ev2.event_start == 0.0


def test_event_register_emitters_moving_flag(wav):
    ev = Event(filepath=wav, alias="e")
    assert ev.emitters is None
    ev.register_emitters(em())
    assert not ev.is_moving
    assert len(ev) == 1
    ev.register_emitters([em((0, 0, 1)), em((0, 0, 2)), em((0, 0, 3))])
    assert ev.is_moving
    assert len(ev) == 3
    np.testing.assert_allclose(ev.start_coordinates_absolute, [0, 0, 1])
    np.testing.assert_allclose(ev.end_coordinates_absolute, [0, 0, 3])


def test_event_emitters_from_coordinates(wav):
    ev = Event(filepath=wav, alias="e", emitters=[[1.0, 1.0, 1.0], [2.0, 2.0, 2.0]])
    assert ev.is_moving
    assert all(isinstance(e, Emitter) for e in ev.emitters)
    with pytest.raises(ValueError):
        Event(filepath=wav, alias="e", emitters=[])
    with pytest.raises(TypeError):
        Event(filepath=wav, alias="e", emitters=["nope"])


def test_event_load_audio_caching_and_normalise(wav):
    ev = Event(filepath=wav, alias="e", duration=1.0)
    audio = ev.load_audio()
    assert np.isclose(np.abs(audio).max(), 1.0, atol=1e-5)  # peak-normalised
    assert len(audio) == SR
    assert ev.is_audio_loaded
    assert ev.load_audio() is audio  # cached
    assert ev.load_audio(ignore_cache=True) is not audio


def test_event_augmentations_invalidate_cache(wav):
    ev = Event(filepath=wav, alias="e", duration=1.0)
    _ = ev.load_audio()
    ev.register_augmentations(LowpassFilter(sample_rate=SR, cutoff_frequency_hz=500))
    assert not ev.is_audio_loaded  # cache cleared
    assert len(ev.get_augmentations()) == 1
    out = ev.load_audio()
    assert out.shape == (SR,)
    # class (not instance) gets constructed with the event's sample rate
    ev.register_augmentations(Gain)
    assert ev.get_augmentation(1).sample_rate == SR
    # mismatched sample rate rejected
    with pytest.raises(ValueError):
        ev.register_augmentations(Gain(sample_rate=22050))
    ev.clear_augmentation(0)
    assert len(ev.augmentations) == 1
    ev.clear_augmentations()
    assert len(ev.augmentations) == 0
    with pytest.raises(IndexError):
        ev.get_augmentation(5)


def test_event_class_inference_from_filepath(wav):
    ev = Event(filepath=wav, alias="e", class_mapping="DCASE2023Task3")
    # filepath contains no class part ("maleSpeech_test.wav" is not a dir part)
    assert ev.class_id is None
    # explicit values trusted
    ev2 = Event(filepath=wav, alias="e", class_id=1, class_label="maleSpeech")
    assert ev2.class_id == 1


def test_event_dict_roundtrip(wav):
    ev = Event(
        filepath=wav,
        alias="e",
        emitters=[em((1, 1, 1))],
        scene_start=1.0,
        event_start=0.0,
        duration=2.0,
        snr=8.0,
        class_id=1,
        class_label="maleSpeech",
        augmentations=[Gain(sample_rate=SR, gain_db=3.0)],
    )
    d = ev.to_dict()
    rebuilt = Event.from_dict(d)
    assert rebuilt == ev
    assert rebuilt.snr == 8.0
    assert len(rebuilt.get_augmentations()) == 1
    assert rebuilt.get_augmentation(0).gain_db == 3.0


def test_event_dict_requires_emitters(wav):
    ev = Event(filepath=wav, alias="e")
    with pytest.raises(ValueError):
        ev.to_dict()


def test_event_dry_source_params(wav):
    ev = Event(filepath=wav, alias="e", ref_ir_channel=0, direct_path_time_ms=(5, 50))
    assert ev.ref_ir_channel == 0
    assert ev.direct_path_time_ms == [5, 50]
    with pytest.raises(ValueError):
        Event(filepath=wav, alias="e", direct_path_time_ms=(5, 50, 100))
    with pytest.raises(TypeError):
        Event(filepath=wav, alias="e", direct_path_time_ms=5)


def test_event_clear_emitters(wav):
    ev = Event(filepath=wav, alias="e", emitters=[em((1, 1, 1)), em((2, 2, 2))])
    ev.clear_emitter(0)
    assert len(ev) == 1
    ev.clear_emitters()
    assert ev.emitters is None
    with pytest.raises(ValueError):
        len(ev)
    with pytest.raises(IndexError):
        ev.get_emitter(0)
