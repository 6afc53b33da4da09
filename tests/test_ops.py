"""Tests for the JAX DSP core against independent numpy reference implementations.

The numpy oracles below implement the documented algorithm definitions (sin^2-window
STFT, per-frame time-variant convolution sum, energy IR normalisation) directly from
their mathematical statements, so the fused/batched JAX kernels are validated against
straightforward, obviously-correct code.
"""

import numpy as np
import pytest
from scipy import fft as sfft
from scipy import signal as ssignal

import jax.numpy as jnp

from audiblelight_tpu import config
from audiblelight_tpu.ops import (
    apply_snr,
    db_to_multiplier,
    fft_convolve,
    interpolation_matrix,
    istft_overlap_add,
    normalize_irs,
    peak_normalize,
    stft,
    time_variant_convolve_spec,
    tv_convolve,
)
from audiblelight_tpu.ops.noise import powerlaw_psd_gaussian_jax

# ---------------------------------------------------------------------------
# numpy oracles
# ---------------------------------------------------------------------------


def np_stft(y, fft_size=512, win_size=256, hop_size=128):
    """Oracle STFT: explicit strided framing, sin^2 window, backward-norm rfft."""
    window = np.sin(np.pi / win_size * np.arange(win_size)) ** 2
    n_frames = 2 * int(np.ceil(y.shape[-1] / (2.0 * hop_size))) + 1
    pad_width = [(0, 0)] * (y.ndim - 1) + [(win_size - hop_size, n_frames * hop_size - y.shape[-1])]
    y_padded = np.pad(y, pad_width)
    frames = np.stack(
        [y_padded[..., i * hop_size : i * hop_size + win_size] for i in range(n_frames)],
        axis=-2,
    )  # (..., n_frames, win)
    spec = sfft.rfft(frames * window, fft_size, axis=-1, norm="backward")
    return np.moveaxis(np.moveaxis(spec, -1, 0), -1, 0)  # (frames, freq, ...)


def np_tv_conv(s_audio, s_ir, w_ir):
    """Oracle time-variant convolution: direct evaluation of the defining sum.

    out[i,f,c] = sum_{t,j} s_ir[t,f,c,j] * w_ir[i-t,j] * s_audio[i-t,f]
    """
    n_ir_frames, n_freq, n_ch, n_irs = s_ir.shape
    n_frames = min(s_audio.shape[0], w_ir.shape[0])
    out = np.zeros((n_frames, n_freq, n_ch), dtype=complex)
    for i in range(n_frames):
        for t in range(min(i + 1, n_ir_frames)):
            m = i - t
            ctf = np.einsum("fcj,j->fc", s_ir[t], w_ir[m])
            out[i] += ctf * s_audio[m][:, None]
    return out


def np_istft(spatial_stft, fft_size=512, win_size=256, hop_size=128):
    """Oracle overlap-add iSTFT: forward-norm irfft, explicit loop."""
    n_frames, _, n_ch = spatial_stft.shape
    audio_frames = np.real(sfft.irfft(spatial_stft, n=fft_size, axis=1, norm="forward"))
    out = np.zeros(((n_frames + 1) * hop_size + win_size, n_ch))
    for i in range(n_frames):
        out[i * hop_size : i * hop_size + fft_size] += audio_frames[i]
    return out[win_size : n_frames * hop_size, :]


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_stft_matches_oracle(rng):
    y = rng.standard_normal(5000).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(y)))
    oracle = np_stft(y)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_stft_batched_matches_oracle(rng):
    y = rng.standard_normal((3, 2, 2000)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(y)))
    oracle = np_stft(y)
    assert ours.shape == oracle.shape  # (frames, freq, 3, 2)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_istft_matches_oracle(rng):
    spec = (
        rng.standard_normal((21, 257, 4)) + 1j * rng.standard_normal((21, 257, 4))
    ).astype(np.complex64)
    ours = np.asarray(istft_overlap_add(jnp.asarray(spec)))
    oracle = np_istft(spec)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=1e-2, rtol=1e-4)


def test_fft_convolve_matches_scipy(rng):
    audio = rng.standard_normal(4096).astype(np.float32)
    irs = rng.standard_normal((4, 512)).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(audio), jnp.asarray(irs)))
    oracle = np.stack([ssignal.fftconvolve(audio, ir) for ir in irs])
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=5e-3)


def test_fft_convolve_batched(rng):
    audio = rng.standard_normal((3, 1000)).astype(np.float32)
    irs = rng.standard_normal((3, 2, 100)).astype(np.float32)
    ours = np.asarray(fft_convolve(jnp.asarray(audio), jnp.asarray(irs)))
    assert ours.shape == (3, 2, 1099)
    for b in range(3):
        for c in range(2):
            np.testing.assert_allclose(
                ours[b, c], ssignal.fftconvolve(audio[b], irs[b, c]), atol=5e-3
            )


@pytest.mark.parametrize("block_frames", [0, 16])
def test_time_variant_convolve_matches_oracle(rng, block_frames):
    n_ir_frames, n_freq, n_ch, n_irs = 12, 33, 2, 5
    n_audio_frames = 40
    s_ir = (
        rng.standard_normal((n_ir_frames, n_freq, n_ch, n_irs))
        + 1j * rng.standard_normal((n_ir_frames, n_freq, n_ch, n_irs))
    ).astype(np.complex64)
    s_audio = (
        rng.standard_normal((n_audio_frames, n_freq))
        + 1j * rng.standard_normal((n_audio_frames, n_freq))
    ).astype(np.complex64)
    w_ir = interpolation_matrix(np.linspace(0, 0.1, n_irs), sr=44100, n_frames=n_audio_frames)

    ours = np.asarray(
        time_variant_convolve_spec(
            jnp.asarray(s_audio), jnp.asarray(s_ir), jnp.asarray(w_ir), block_frames
        )
    )
    oracle = np_tv_conv(s_audio, s_ir, w_ir)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=1e-2, rtol=1e-3)


def test_tv_convolve_end_to_end_reduces_to_static(rng):
    """A 'moving' source whose IRs are all identical must equal the static render
    (up to STFT windowing edge effects)."""
    sr = config.SAMPLE_RATE
    audio = rng.standard_normal(sr // 4).astype(np.float32)
    ir = np.zeros((2, 400), dtype=np.float32)
    ir[:, 50] = 1.0  # pure delay
    ir[:, 200] = 0.5
    n_irs = 4
    irs = np.tile(ir[:, None, :], (1, n_irs, 1))  # (C, J, L)

    n_frames = (2 * int(np.ceil(len(audio) / (2.0 * config.HOP_SIZE))) + 1)
    w_ir = interpolation_matrix(
        np.linspace(0, len(audio) / sr, n_irs), sr=sr, n_frames=n_frames
    )
    wet_tv = np.asarray(tv_convolve(jnp.asarray(audio), jnp.asarray(irs), w_ir))

    wet_static = np.stack([ssignal.fftconvolve(audio, ir[c]) for c in range(2)])

    # The CTF pipeline carries an overall fft_size gain (backward-norm stft +
    # forward-norm istft, as in the reference, where apply_snr absorbs it).
    # Compare peak-normalised signals over the interior (skip STFT edge frames).
    n = min(wet_tv.shape[1], wet_static.shape[1]) - 512
    lo = 512
    a = wet_tv[:, lo:n] / np.abs(wet_tv[:, lo:n]).max()
    b = wet_static[:, lo:n] / np.abs(wet_static[:, lo:n]).max()
    np.testing.assert_allclose(a, b, atol=1e-4)
    # And the gain itself is fft_size
    gain = np.abs(wet_tv[:, lo:n]).max() / np.abs(wet_static[:, lo:n]).max()
    assert np.isclose(gain, config.FFT_SIZE, rtol=1e-2)


def test_interpolation_matrix_properties():
    w = interpolation_matrix(np.linspace(0, 1.0, 5), sr=44100, n_frames=300)
    assert w.shape == (300, 5)
    assert np.all(w >= 0) and np.all(w <= 1)
    # Within the interpolation region, weights sum to ~1 per frame
    active = w.sum(axis=1) > 0
    np.testing.assert_allclose(w[active].sum(axis=1), 1.0, atol=1e-9)


def test_apply_snr():
    x = jnp.asarray(np.array([0.1, -0.5, 0.25]))
    out = np.asarray(apply_snr(x, 2.0))
    assert np.isclose(np.abs(out).max(), 2.0)


def test_db_to_multiplier():
    m = float(db_to_multiplier(-6.0, 1.0))
    assert np.isclose(20 * np.log10(m * 1.0), -6.0, atol=1e-4)


def test_normalize_irs_matches_definition(rng):
    irs = rng.standard_normal((3, 4, 100)).astype(np.float32)
    ours = np.asarray(normalize_irs(jnp.asarray(irs)))
    e = np.sqrt(np.sum(np.abs(irs) ** 2, axis=-1, keepdims=True))
    oracle = irs / np.mean(e + np.finfo(np.float32).tiny, axis=-2, keepdims=True)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_peak_normalize():
    x = jnp.asarray(np.array([[0.5, -2.0], [0.1, 0.2]]))
    out = np.asarray(peak_normalize(x))
    assert np.isclose(np.abs(out).max(), 1.0)
    per_row = np.asarray(peak_normalize(x, axis=-1))
    np.testing.assert_allclose(np.abs(per_row).max(axis=-1), 1.0, atol=1e-6)


def test_powerlaw_noise_statistics():
    import jax

    key = jax.random.PRNGKey(0)
    noise = np.asarray(powerlaw_psd_gaussian_jax(key, 1.0, (4, 44100)))
    assert noise.shape == (4, 44100)
    # Approximately zero mean, unit variance
    assert abs(noise.mean()) < 0.1
    assert 0.5 < noise.std() < 2.0
    # Pink noise: low-frequency half has more energy than the high-frequency half
    spec = np.abs(np.fft.rfft(noise, axis=-1)) ** 2
    half = spec.shape[-1] // 2
    assert spec[:, 1:half].sum() > 2 * spec[:, half:].sum()
