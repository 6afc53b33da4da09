"""Unit tests for the Ambience model (mirroring reference test_ambience.py)."""

import numpy as np
import pytest

from audiblelight_tpu.ambience import NOISE_MAPPING, Ambience, powerlaw_psd_gaussian
from audiblelight_tpu.io.audio import wav_write

SR = 44100


@pytest.fixture(scope="module")
def noise_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("amb") / "noise.wav"
    rng = np.random.default_rng(0)
    wav_write(path, (0.3 * rng.standard_normal(SR)).astype(np.float32), SR)
    return path


def test_colored_noise_shapes():
    amb = Ambience(channels=4, duration=0.5, alias="a", noise="pink", sample_rate=SR)
    audio = amb.load_ambience()
    assert audio.shape == (4, round(0.5 * SR))
    # per-channel peak normalised
    np.testing.assert_allclose(np.abs(audio).max(axis=1), 1.0, atol=1e-6)


@pytest.mark.parametrize("color", list(NOISE_MAPPING.keys()))
def test_all_colors(color):
    amb = Ambience(channels=1, duration=0.2, alias="a", noise=color, sample_rate=SR)
    audio = amb.load_ambience()
    assert np.isfinite(audio).all()


def test_gaussian_special_case():
    amb = Ambience(channels=2, duration=0.2, alias="a", noise="gaussian", sample_rate=SR)
    assert amb.beta == "gaussian"
    audio = amb.load_ambience()
    assert audio.shape == (2, round(0.2 * SR))


def test_numeric_beta():
    amb = Ambience(channels=1, duration=0.2, alias="a", noise=1.5, sample_rate=SR)
    assert amb.beta == 1.5
    assert np.isfinite(amb.load_ambience()).all()


def test_invalid_noise_inputs():
    with pytest.raises(KeyError):
        Ambience(channels=1, duration=1, alias="a", noise="turquoise")
    with pytest.raises(TypeError):
        Ambience(channels=1, duration=1, alias="a", noise=["pink"])
    with pytest.raises(AttributeError):
        Ambience(channels=1, duration=1, alias="a")  # neither noise nor filepath
    with pytest.raises(AttributeError):
        Ambience(channels=1, duration=1, alias="a", noise="pink", filepath="x")


def test_file_ambience_tiling(noise_file):
    # 1-second mono file tiled to 2.5 s x 4 channels
    amb = Ambience(
        channels=4, duration=2.5, alias="a", filepath=noise_file, sample_rate=SR
    )
    audio = amb.load_ambience()
    assert audio.shape == (4, round(2.5 * SR))
    # Tiling wraps the content: start of second repetition matches start of first
    np.testing.assert_allclose(audio[0, :100], audio[0, SR : SR + 100], atol=1e-5)


def test_colored_noise_spectrum_ordering():
    """Pink noise has more low-frequency energy; violet more high-frequency."""

    def band_ratio(beta):
        y = powerlaw_psd_gaussian(beta, (1, SR))[0]
        spec = np.abs(np.fft.rfft(y)) ** 2
        half = len(spec) // 2
        return spec[1:half].sum() / spec[half:].sum()

    assert band_ratio(1) > band_ratio(0) > band_ratio(-2)


def test_powerlaw_seeded_reproducibility():
    a = powerlaw_psd_gaussian(1, (2, 1000), seed=7)
    b = powerlaw_psd_gaussian(1, (2, 1000), seed=7)
    np.testing.assert_array_equal(a, b)
    c = powerlaw_psd_gaussian(1, (2, 1000), seed=8)
    assert not np.array_equal(a, c)


def test_powerlaw_fmin_validation():
    with pytest.raises(ValueError):
        powerlaw_psd_gaussian(1, 100, fmin=0.7)
    out = powerlaw_psd_gaussian(1, 100, fmin=0.4)
    assert out.shape == (100,)


def test_ambience_roundtrip():
    amb = Ambience(
        channels=4, duration=1.0, alias="a", noise="brown", ref_db=-50, sample_rate=SR
    )
    d = amb.to_dict()
    rebuilt = Ambience.from_dict(d)
    assert rebuilt == amb
    assert rebuilt.beta == NOISE_MAPPING["brown"]
    assert rebuilt.ref_db == -50


def test_ambience_caching():
    amb = Ambience(channels=1, duration=0.1, alias="a", noise="white", sample_rate=SR)
    a1 = amb.load_ambience()
    assert amb.is_audio_loaded
    assert amb.load_ambience() is a1
    assert amb.load_ambience(ignore_cache=True) is not a1


def test_positive_ref_db_rejected():
    with pytest.raises(ValueError):
        Ambience(channels=1, duration=1, alias="a", noise="pink", ref_db=10)
