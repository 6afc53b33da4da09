"""Tests for the 27 augmentation classes and their DSP kernels."""

import numpy as np
import pytest

from audiblelight_tpu.augmentation import (
    ALL_EVENT_AUGMENTATIONS,
    Augmentation,
    Bitcrush,
    Chorus,
    Clipping,
    Compressor,
    Deemphasis,
    Delay,
    Distortion,
    EventAugmentation,
    Fade,
    Gain,
    GSMFullRateCompressor,
    HighpassFilter,
    HighShelfFilter,
    Invert,
    Limiter,
    LowpassFilter,
    LowShelfFilter,
    MP3Compressor,
    MultibandEqualizer,
    Phaser,
    PitchShift,
    Preemphasis,
    Reverse,
    SpeedUp,
    TimeWarpDuplicate,
    TimeWarpRemove,
    TimeWarpReverse,
    TimeWarpSilence,
    validate_event_augmentation,
)

SR = 44100


@pytest.fixture
def tone(rng):
    """1 s of 440 Hz + 8 kHz tones at 44.1 kHz."""
    t = np.arange(SR) / SR
    return (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 8000 * t)).astype(
        np.float32
    )


def band_energy(x, lo, hi, sr=SR):
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    return spec[(freqs >= lo) & (freqs < hi)].sum()


def test_all_augmentations_instantiable_and_preserve_shape(tone):
    np.random.seed(0)
    for cls in ALL_EVENT_AUGMENTATIONS:
        aug = cls(sample_rate=SR)
        out = aug(tone)
        assert out.shape == tone.shape, cls.__name__
        assert np.isfinite(out).all(), cls.__name__


def test_all_augmentations_serialisation_roundtrip():
    np.random.seed(1)
    for cls in ALL_EVENT_AUGMENTATIONS:
        aug = cls(sample_rate=SR)
        d = aug.to_dict()
        assert d["name"] == cls.__name__
        rebuilt = Augmentation.from_dict(dict(d))
        assert type(rebuilt) is cls
        assert rebuilt == aug, cls.__name__


def test_lowpass_removes_high_band(tone):
    aug = LowpassFilter(sample_rate=SR, cutoff_frequency_hz=2000)
    out = aug(tone)
    assert band_energy(out, 7000, 9000) < 0.05 * band_energy(tone, 7000, 9000)
    assert band_energy(out, 300, 600) > 0.5 * band_energy(tone, 300, 600)


def test_highpass_removes_low_band(tone):
    aug = HighpassFilter(sample_rate=SR, cutoff_frequency_hz=1000)
    out = aug(tone)
    assert band_energy(out, 300, 600) < 0.1 * band_energy(tone, 300, 600)
    assert band_energy(out, 7000, 9000) > 0.5 * band_energy(tone, 7000, 9000)


def test_shelf_filters_gain(tone):
    hi = HighShelfFilter(sample_rate=SR, cutoff_frequency_hz=4000, gain_db=-20, q=0.7)
    out = hi(tone)
    assert band_energy(out, 7000, 9000) < 0.1 * band_energy(tone, 7000, 9000)
    lo = LowShelfFilter(sample_rate=SR, cutoff_frequency_hz=1000, gain_db=-20, q=0.7)
    out2 = lo(tone)
    assert band_energy(out2, 300, 600) < 0.1 * band_energy(tone, 300, 600)


def test_multiband_eq_params():
    eq = MultibandEqualizer(sample_rate=SR, n_bands=3, gain_db=-10, cutoff_frequency_hz=[2000, 4000, 8000], q=0.5)
    assert eq.n_bands == 3
    assert len(eq.fx) == 3
    assert eq.gain_db == [-10, -10, -10]
    with pytest.raises(ValueError):
        MultibandEqualizer(sample_rate=SR, n_bands=3, cutoff_frequency_hz=[100, 200])


def test_compressor_reduces_dynamic_range(tone):
    loud = tone * 2.0
    aug = Compressor(sample_rate=SR, threshold_db=-20, ratio=20, attack_ms=1, release_ms=50)
    out = aug(loud)
    assert np.abs(out).max() < np.abs(loud).max()


def test_limiter_caps_output():
    x = np.ones(1000, dtype=np.float32)
    aug = Limiter(sample_rate=SR, threshold_db=-20, release_ms=100)
    out = aug(x)
    assert np.abs(out).max() <= 10 ** (-20 / 20) + 1e-6


def test_clipping():
    x = np.linspace(-1, 1, 100).astype(np.float32)
    aug = Clipping(sample_rate=SR, threshold_db=-6)
    out = aug(x)
    assert np.isclose(np.abs(out).max(), 10 ** (-6 / 20), atol=1e-6)


def test_distortion_adds_harmonics(tone):
    aug = Distortion(sample_rate=SR, drive_db=30)
    out = aug(tone)
    # tanh saturation compresses peaks toward +-1
    assert np.abs(out).max() <= 1.0 + 1e-6
    # odd harmonics of 440 appear
    assert band_energy(out, 1200, 1450) > 10 * band_energy(tone, 1200, 1450)


def test_bitcrush_quantizes():
    x = np.linspace(-1, 1, 1000).astype(np.float32)
    aug = Bitcrush(sample_rate=SR, bit_depth=8)
    out = aug(x)
    assert len(np.unique(out)) <= 2**8 + 1


def test_gain():
    x = np.ones(100, dtype=np.float32) * 0.1
    assert np.allclose(Gain(sample_rate=SR, gain_db=6.0)(x), 0.1 * 10 ** (6 / 20), atol=1e-6)


def test_chorus_and_phaser_run(tone):
    out1 = Chorus(sample_rate=SR, rate_hz=1.0, depth=0.5, centre_delay_ms=8.0, feedback=0.3, mix=0.5)(tone)
    assert not np.allclose(out1, tone)
    out2 = Phaser(sample_rate=SR, rate_hz=1.0, depth=0.5, centre_frequency_hz=1000, feedback=0.3, mix=0.5)(tone)
    assert not np.allclose(out2, tone)


def test_delay_produces_echo():
    x = np.zeros(SR // 2, dtype=np.float32)
    x[100] = 1.0
    aug = Delay(sample_rate=SR, delay_seconds=0.1, feedback=0.5, mix=0.5)
    out = aug(x)
    echo_idx = 100 + int(0.1 * SR)
    assert np.abs(out[echo_idx]) > 0.1
    echo2_idx = 100 + 2 * int(0.1 * SR)
    assert np.abs(out[echo2_idx]) > 0.04  # second repeat via feedback


def test_gsm_degrades_bandwidth(tone):
    out = GSMFullRateCompressor(sample_rate=SR, quality=2)(tone)
    # 8 kHz content (above the 4 kHz GSM Nyquist) is strongly attenuated
    assert band_energy(out, 7000, 9000) < 0.1 * band_energy(tone, 7000, 9000)
    assert band_energy(out, 300, 600) > 0.3 * band_energy(tone, 300, 600)


def test_mp3_quality_range(tone):
    out = MP3Compressor(sample_rate=SR, vbr_quality=9.5)(tone)
    # low quality band-limits heavily
    assert band_energy(out, 16000, 20000) < 0.1 * band_energy(tone, 300, 600) + 1e-9
    with pytest.raises(ValueError):
        MP3Compressor(sample_rate=44000)


def test_pitch_shift_moves_fundamental():
    t = np.arange(SR) / SR
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    aug = PitchShift(sample_rate=SR, semitones=3)
    out = aug(x)
    target = 440 * 2 ** (3 / 12)  # ~523 Hz
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freqs = np.fft.rfftfreq(len(out), 1 / SR)
    peak_freq = freqs[np.argmax(spec)]
    assert abs(peak_freq - target) < 15
    # zero semitones is identity
    assert np.array_equal(PitchShift(sample_rate=SR, semitones=0)(x), x)


def test_speed_up_shortens_content():
    x = np.zeros(SR, dtype=np.float32)
    x[: SR // 2] = np.sin(2 * np.pi * 440 * np.arange(SR // 2) / SR).astype(np.float32)
    aug = SpeedUp(sample_rate=SR, stretch_factor=2.0)
    out = aug(x)
    assert out.shape == x.shape
    # After 2x speedup, content occupies ~ the first quarter
    assert np.abs(out[: SR // 4]).max() > 0.2
    assert np.abs(out[(3 * SR) // 8 : SR // 2]).max() < 0.2


def test_preemphasis_deemphasis_inverse(tone):
    pre = Preemphasis(sample_rate=SR, coef=0.9)
    de = Deemphasis(sample_rate=SR, coef=0.9)
    roundtrip = de(pre(tone))
    np.testing.assert_allclose(roundtrip, tone, atol=1e-4)


def test_fade_shapes(tone):
    aug = Fade(sample_rate=SR, fade_in_len=0.5, fade_out_len=0.5, fade_in_shape="linear", fade_out_shape="linear")
    out = aug(tone)
    assert abs(out[0]) < 1e-6
    assert abs(out[-1]) < 1e-6
    assert np.abs(out[SR // 2 - 100 : SR // 2 + 100]).max() > 0.3
    with pytest.raises(ValueError):
        Fade(sample_rate=SR, fade_in_shape="zigzag")


def test_invert_and_reverse(tone):
    np.testing.assert_array_equal(Invert(sample_rate=SR)(tone), -tone)
    np.testing.assert_array_equal(Reverse(sample_rate=SR)(tone), tone[::-1])


def test_timewarps(tone):
    import random as pyrandom

    pyrandom.seed(0)
    for cls in [TimeWarpSilence, TimeWarpDuplicate, TimeWarpRemove, TimeWarpReverse]:
        aug = cls(sample_rate=SR, fps=5, prob=0.9)
        out = aug(tone)
        assert out.shape == tone.shape, cls.__name__


def test_validate_event_augmentation():
    validate_event_augmentation(Gain(sample_rate=SR))
    with pytest.raises(ValueError):
        validate_event_augmentation(Gain)  # class, not instance
    with pytest.raises(ValueError):
        validate_event_augmentation("not even callable-ish")
    with pytest.raises(ValueError):
        validate_event_augmentation(lambda x: x)  # callable but wrong type


def test_sample_value_with_distribution():
    from scipy import stats

    aug = Gain(sample_rate=SR, gain_db=stats.uniform(-1, 2))
    assert -1 <= aug.gain_db <= 1


def test_process_handles_stereo(tone):
    stereo = np.stack([tone, tone * 0.5])
    out = Gain(sample_rate=SR, gain_db=0.0)(stereo)
    assert out.shape == stereo.shape
