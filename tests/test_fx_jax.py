"""Parity + dispatch tests for the JAX FX backend (ops.fx_jax).

The numpy implementations in ops.fx_dsp are the oracle: the JAX kernels
reimplement the same algorithms with bucketed shapes and traced parameters,
so outputs must agree to float32 tolerance (vocoder/filters) or spectrally
(the fractional resampler differs from scipy's polyphase by design).
"""

import numpy as np
import pytest

from audiblelight_tpu.ops import fx_dsp, fx_jax

SR = 44100


@pytest.fixture
def tone(rng):
    t = np.arange(SR) / SR
    x = 0.4 * np.sin(2 * np.pi * 440.0 * t) + 0.1 * np.sin(2 * np.pi * 3520.0 * t)
    return (x + 0.02 * rng.standard_normal(SR)).astype(np.float32)


def _numpy_backend(monkeypatch):
    monkeypatch.setenv("AUDIBLELIGHT_FX_BACKEND", "numpy")


def band_energy(x, lo, hi, sr=SR):
    spec = np.abs(np.fft.rfft(x)) ** 2
    f = np.fft.rfftfreq(len(x), 1 / sr)
    return spec[(f >= lo) & (f <= hi)].sum()


@pytest.mark.parametrize(
    "kind,freq,q,gain",
    [
        ("lowpass", 1000.0, 0.7071, 0.0),
        ("highpass", 900.0, 0.7071, 0.0),
        ("peak", 2000.0, 4.0, -12.0),
        ("lowshelf", 400.0, 0.7071, 9.0),
        ("highshelf", 5000.0, 0.7071, -9.0),
    ],
)
def test_biquad_matches_lfilter(tone, kind, freq, q, gain, monkeypatch):
    b, a = fx_dsp._biquad_coeffs(kind, SR, freq, q, gain)
    got = fx_jax.biquad(tone, b, a)
    _numpy_backend(monkeypatch)
    want = fx_dsp.biquad(tone, kind, SR, freq, q, gain)
    # float32 FFT frequency sampling vs float64 lfilter
    assert np.abs(got - want).max() < 2e-4 * max(np.abs(want).max(), 1e-6)


def test_biquad_multichannel(tone):
    b, a = fx_dsp._biquad_coeffs("lowpass", SR, 1500.0)
    stereo = np.stack([tone, -0.5 * tone])
    got = fx_jax.biquad(stereo, b, a)
    assert got.shape == stereo.shape
    np.testing.assert_allclose(got[1], -0.5 * got[0], atol=1e-5)


def test_compress_matches_numpy(tone, monkeypatch):
    loud = tone * 4.0
    got = fx_jax.compress(loud, SR, threshold_db=-20.0, ratio=4.0,
                          attack_ms=5.0, release_ms=100.0)
    _numpy_backend(monkeypatch)
    want = fx_dsp.compress(loud, SR, -20.0, 4.0, 5.0, 100.0)
    assert np.abs(got - want).max() < 5e-3 * np.abs(want).max()
    # And it actually compresses
    assert np.abs(got).max() < np.abs(loud).max()


def test_onepole_exactness(rng):
    """associative_scan one-pole vs the sequential recurrence, long release."""
    x = rng.standard_normal(8192).astype(np.float32)
    c = 0.9995  # ~1 s at 2 kHz: the regime FFT wrap-around would break
    import jax.numpy as jnp

    got = np.asarray(fx_jax._onepole(jnp.asarray(x), jnp.float32(c)))
    want = np.empty_like(x)
    acc = 0.0
    for i, v in enumerate(x):
        acc = (1 - c) * v + c * acc
        want[i] = acc
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("rate", [0.75, 1.3])
def test_time_stretch_matches_numpy(tone, rate, monkeypatch):
    got = fx_jax.time_stretch(tone, rate)
    _numpy_backend(monkeypatch)
    want = fx_dsp.time_stretch(tone, rate)
    assert got.shape == want.shape  # identical output-length law
    # Same algorithm in float32 vs float64; phase accumulation over ~90
    # frames amplifies rounding, so compare correlation + scale not samples
    num = float(np.dot(got, want))
    den = float(np.linalg.norm(got) * np.linalg.norm(want) + 1e-12)
    assert num / den > 0.99
    assert abs(np.abs(got).max() - np.abs(want).max()) < 0.1 * np.abs(want).max()


def test_time_stretch_multichannel(tone):
    stereo = np.stack([tone, tone[::-1].copy()])
    out = fx_jax.time_stretch(stereo, 1.25)
    assert out.ndim == 2 and out.shape[0] == 2


def test_pitch_shift_moves_fundamental_and_keeps_length(tone):
    for semis in (-5.0, 4.0):
        out = fx_jax.pitch_shift(tone, SR, semis)
        assert out.shape == tone.shape
        target = 440.0 * 2 ** (semis / 12.0)
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        f = np.fft.rfftfreq(len(out), 1 / SR)
        lo = spec[(f > 100) & (f < 1000)]
        peak = f[(f > 100) & (f < 1000)][np.argmax(lo)]
        assert abs(peak - target) < 15.0, (semis, peak, target)


def test_frac_resample_antialiases(rng):
    """Downsampling content above the target Nyquist must be attenuated."""
    import jax.numpy as jnp

    sr = 8000
    t = np.arange(sr) / sr
    hi = np.sin(2 * np.pi * 3500.0 * t).astype(np.float32)  # near Nyquist
    factor = 1.9  # read ~2x faster -> 3500 Hz aliases unless filtered
    n_pad = 16384
    xp = np.pad(hi[None], [(0, 0), (0, n_pad - sr)])
    out = np.asarray(
        fx_jax._frac_resample(jnp.asarray(xp), jnp.float32(factor),
                              jnp.int32(sr), 4096)
    )[0]
    valid = out[: int(sr / factor) - 64]
    assert np.abs(valid).max() < 0.35  # windowed-sinc cutoff suppresses it


def test_dispatch_env_switch(tone, monkeypatch):
    """fx_dsp routes through fx_jax when forced and numpy when opted out
    (the auto default resolves by jax.default_backend())."""
    monkeypatch.setenv("AUDIBLELIGHT_FX_BACKEND", "jax")
    jax_out = fx_dsp.pitch_shift(tone, SR, 3.0)
    _numpy_backend(monkeypatch)
    np_out = fx_dsp.pitch_shift(tone, SR, 3.0)
    assert jax_out.shape == np_out.shape
    # Different resampler tails -> not byte-identical, but same pitch content
    for out in (jax_out, np_out):
        spec = np.abs(np.fft.rfft(out))
        f = np.fft.rfftfreq(len(out), 1 / SR)
        sel = (f > 100) & (f < 1000)
        peak = f[sel][np.argmax(spec[sel])]
        assert abs(peak - 440.0 * 2 ** (3 / 12)) < 15.0


def test_auto_policy_uses_numpy_on_cpu(tone, monkeypatch):
    """auto = accelerator-only: under the CPU test backend the dispatcher
    must return None (numpy path) rather than the slower XLA:CPU kernels."""
    monkeypatch.delenv("AUDIBLELIGHT_FX_BACKEND", raising=False)
    monkeypatch.setattr(fx_dsp, "_AUTO_ACCEL", [])
    assert fx_dsp._jax_fx() is None  # conftest pins jax to CPU


def test_augmentation_classes_use_jax_backend(tone, monkeypatch):
    """End-to-end: the heavy augmentation classes run through the JAX path
    and keep their behavioural contracts."""
    monkeypatch.setenv("AUDIBLELIGHT_FX_BACKEND", "jax")
    from audiblelight_tpu.augmentation import Compressor, LowpassFilter, PitchShift

    lp = LowpassFilter(sample_rate=SR, cutoff_frequency_hz=1000.0)
    out = lp(tone)
    assert band_energy(out, 3000, 4000) < 0.05 * band_energy(tone, 3000, 4000)

    comp = Compressor(sample_rate=SR, threshold_db=-20.0, ratio=6.0)
    loud = tone * 4
    assert np.abs(comp(loud)).max() < np.abs(loud).max()

    ps = PitchShift(sample_rate=SR, semitones=-7.0)
    out = ps(tone)
    assert out.shape == tone.shape and np.isfinite(out).all()
