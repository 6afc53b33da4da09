"""Tests for host-side audio I/O (WAV codec, load_audio semantics)."""

import numpy as np
import pytest

from audiblelight_tpu.io import get_duration, load_audio, valid_audio, wav_read, wav_write


def test_wav_roundtrip_float32(tmp_path, rng):
    audio = rng.standard_normal((2, 1000)).astype(np.float32) * 0.5
    path = tmp_path / "t.wav"
    wav_write(path, audio, 44100)
    loaded, sr = wav_read(path)
    assert sr == 44100
    np.testing.assert_allclose(loaded, audio, atol=1e-7)


@pytest.mark.parametrize("subtype,atol", [("int16", 1e-4), ("int24", 1e-6)])
def test_wav_roundtrip_pcm(tmp_path, rng, subtype, atol):
    audio = (rng.uniform(-0.9, 0.9, (1, 500))).astype(np.float32)
    path = tmp_path / "t.wav"
    wav_write(path, audio, 22050, subtype=subtype)
    loaded, sr = wav_read(path)
    assert sr == 22050
    np.testing.assert_allclose(loaded, audio, atol=atol)


def test_wav_mono_write_from_1d(tmp_path):
    audio = np.linspace(-0.5, 0.5, 100).astype(np.float32)
    path = tmp_path / "m.wav"
    wav_write(path, audio, 8000)
    loaded, sr = wav_read(path)
    assert loaded.shape == (1, 100)


def test_get_duration(sine_wav):
    assert np.isclose(get_duration(sine_wav), 1.0, atol=1e-4)


def test_wav_read_offset_duration(sine_wav):
    full, sr = wav_read(sine_wav)
    part, _ = wav_read(sine_wav, offset=0.25, duration=0.5)
    assert part.shape[1] == sr // 2
    np.testing.assert_allclose(part, full[:, sr // 4 : sr // 4 + sr // 2], atol=1e-7)


def test_load_audio_mono_resample(noise_wav):
    audio, sr = load_audio(noise_wav, sr=44100, mono=True)
    assert sr == 44100
    assert audio.ndim == 1
    # 2 seconds at the new rate (within resampler edge tolerance)
    assert abs(len(audio) - 2 * 44100) < 16


def test_load_audio_multichannel(noise_wav):
    audio, sr = load_audio(noise_wav, sr=None, mono=False)
    assert audio.shape[0] == 2
    assert sr == 22050


def test_valid_audio():
    assert valid_audio(np.zeros(10, dtype=np.float32))
    with pytest.raises(ValueError):
        valid_audio(np.array([np.nan, 1.0]))
    with pytest.raises(TypeError):
        valid_audio(np.zeros(10, dtype=np.int16))


def test_get_duration_rejects_non_wav(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"not audio")
    with pytest.raises(ValueError):
        get_duration(p)
