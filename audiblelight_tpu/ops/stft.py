"""STFT / inverse-STFT with the sin^2 analysis window used by the synthesis engine.

Numerically matches the reference pipeline (audiblelight/synthesize.py:109-145 stft,
:255-274 istft_overlap_synthesis): window = sin(pi/W * n)^2, left pad W-H, frame count
2*ceil(S/(2H))+1, rfft with backward norm, irfft with forward norm, overlap-add, then
trim [W : n_frames*H].

The implementation is strided-free and fully vectorised: framing is W/H shifted
reshapes (static shapes, fuses into the FFT), overlap-add is N/H shifted adds — both
map onto VPU adds + batched FFTs on TPU instead of gather/scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from audiblelight_tpu import config


def sin_squared_window(win_size: int) -> jnp.ndarray:
    """The sin^2 analysis window: w[n] = sin(pi * n / W)^2."""
    n = jnp.arange(win_size)
    return jnp.sin(jnp.pi / win_size * n) ** 2


def n_stft_frames(n_samples: int, hop_size: int = config.HOP_SIZE) -> int:
    """Number of STFT frames produced for an input of `n_samples` samples."""
    return 2 * int(-(-n_samples // (2 * hop_size))) + 1


@partial(jax.jit, static_argnames=("fft_size", "win_size", "hop_size"))
def stft(
    y: jnp.ndarray,
    fft_size: int = config.FFT_SIZE,
    win_size: int = config.WIN_SIZE,
    hop_size: int = config.HOP_SIZE,
) -> jnp.ndarray:
    """Compute the STFT of `y` along its last axis.

    Arguments:
        y: real signal(s), shape (..., n_samples).

    Returns:
        Complex spectrogram with STFT dims first: (n_frames, n_freq, ...), matching
        the layout the time-variant convolution expects.
    """
    if win_size % hop_size != 0:
        raise ValueError("win_size must be an integer multiple of hop_size")
    w_per_hop = win_size // hop_size

    n_samples = y.shape[-1]
    n_frames = n_stft_frames(n_samples, hop_size)

    # Pad: win-hop on the left, out to (n_frames + 1) * hop total on the right.
    pad_left = win_size - hop_size
    pad_right = n_frames * hop_size - n_samples
    pad_width = [(0, 0)] * (y.ndim - 1) + [(pad_left, pad_right)]
    y_padded = jnp.pad(y, pad_width)

    # Frame extraction as shifted reshapes: chunks[i] = y_padded[i*hop:(i+1)*hop].
    # frame[i] = concat(chunks[i], ..., chunks[i + w_per_hop - 1]).
    n_chunks = y_padded.shape[-1] // hop_size
    chunks = y_padded.reshape(y.shape[:-1] + (n_chunks, hop_size))
    frames = jnp.concatenate(
        [chunks[..., w : w + n_frames, :] for w in range(w_per_hop)], axis=-1
    )  # (..., n_frames, win_size)

    window = sin_squared_window(win_size).astype(y.dtype)
    spec = jnp.fft.rfft(frames * window, n=fft_size, axis=-1, norm="backward")

    # Move (frames, freq) to the front: (n_frames, n_freq, ...)
    spec = jnp.moveaxis(jnp.moveaxis(spec, -1, 0), -1, 0)
    return spec


@partial(jax.jit, static_argnames=("fft_size", "win_size", "hop_size"))
def istft_overlap_add_from_parts(
    s_re: jnp.ndarray,
    s_im: jnp.ndarray,
    fft_size: int = config.FFT_SIZE,
    win_size: int = config.WIN_SIZE,
    hop_size: int = config.HOP_SIZE,
) -> jnp.ndarray:
    """istft_overlap_add for HOST-provided complex spectrograms, shipped as
    real/imag float32 pairs (complex program inputs are rejected by the TPU
    runtime)."""
    return istft_overlap_add(jax.lax.complex(s_re, s_im), fft_size, win_size, hop_size)


def istft_overlap_add(
    spatial_stft: jnp.ndarray,
    fft_size: int = config.FFT_SIZE,
    win_size: int = config.WIN_SIZE,
    hop_size: int = config.HOP_SIZE,
) -> jnp.ndarray:
    """Recompose an STFT (n_frames, n_freq, n_ch) into audio via overlap-add.

    Returns audio with shape (n_frames*hop - win, n_ch), matching the reference's
    output slice [win_size : n_frames*hop_size].
    """
    n_frames, _, n_ch = spatial_stft.shape
    if fft_size % hop_size != 0:
        raise ValueError("fft_size must be an integer multiple of hop_size")
    k_per_frame = fft_size // hop_size

    # Inverse FFT per frame. norm="forward" => scale by fft_size (matches reference).
    audio_frames = jnp.real(
        jnp.fft.irfft(spatial_stft, n=fft_size, axis=1, norm="forward")
    )  # (n_frames, fft_size, n_ch)

    # Overlap-add as k_per_frame shifted adds of contiguous hop-sized chunks:
    # out[i*hop + k*hop : i*hop + (k+1)*hop] += frames[i, k*hop:(k+1)*hop]
    total = (n_frames + 1) * hop_size + win_size
    chunks = audio_frames.reshape(n_frames, k_per_frame, hop_size, n_ch)
    flat_len = n_frames * hop_size
    out = jnp.zeros((total, n_ch), dtype=audio_frames.dtype)
    for k in range(k_per_frame):
        flat = chunks[:, k].reshape(flat_len, n_ch)
        out = out + jnp.pad(flat, ((k * hop_size, total - k * hop_size - flat_len), (0, 0)))

    return out[win_size : n_frames * hop_size]
