"""FFT convolution kernels: time-invariant (static sources) and time-variant (moving).

Time-invariant path: batched frequency-domain convolution (rfft -> multiply -> irfft),
replacing scipy.signal.fftconvolve in the reference (synthesize.py:71-106).

Time-variant path: the reference walks STFT frames in a Python loop with per-frame
einsums — O(n_frames^2 * freq * ch * irs) (synthesize.py:184-252). The key identity
this module exploits instead:

    out[i, f, c] = sum_t sum_j S_ir[t, f, c, j] * w[i-t, j] * S_audio[i-t, f]
                 = sum_j ( S_ir[:, f, c, j]  *conv_t*  (w[:, j] . S_audio[:, f]) )[i]

i.e. the time-variant convolution is an ordinary 1-D linear convolution ALONG THE
FRAME AXIS between the IR spectrogram bank and the weight-modulated audio
spectrogram, summed over IRs. That convolution is computed with batched FFTs over
frames — O(n_frames log n_frames * freq * ch * irs) — which is exactly the shape of
work (large batched FFTs + a j-contraction) that TPUs eat. Frame-axis blocking
(overlap-save) bounds the FFT size so very long events stream through HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audiblelight_tpu import config
from audiblelight_tpu.ops.stft import istft_overlap_add, stft


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


@partial(jax.jit, static_argnames=("out_len",))
def fft_convolve(audio: jnp.ndarray, irs: jnp.ndarray, out_len: Optional[int] = None) -> jnp.ndarray:
    """Batched time-invariant convolution of mono audio with an IR bank.

    Arguments:
        audio: (..., n_samples) dry signal.
        irs: (..., n_channels, ir_len) impulse responses; leading dims broadcast
            against audio's leading dims.
        out_len: output sample count. Defaults to full linear length
            n_samples + ir_len - 1 (scipy fftconvolve mode="full").

    Returns:
        (..., n_channels, out_len) wet signal.
    """
    n_samples = audio.shape[-1]
    ir_len = irs.shape[-1]
    full = n_samples + ir_len - 1
    if out_len is None:
        out_len = full
    nfft = _next_pow2(full)

    a_hat = jnp.fft.rfft(audio, n=nfft, axis=-1)[..., None, :]  # (..., 1, nfft//2+1)
    i_hat = jnp.fft.rfft(irs, n=nfft, axis=-1)  # (..., C, nfft//2+1)
    wet = jnp.fft.irfft(a_hat * i_hat, n=nfft, axis=-1)
    return wet[..., :out_len]


def interpolation_matrix(
    ir_times: np.ndarray,
    sr: float = config.SAMPLE_RATE,
    hop_size: int = config.HOP_SIZE,
    n_frames: Optional[int] = None,
) -> np.ndarray:
    """IR interpolation weights describing how the source moves through space.

    Linear crossfade between consecutive IRs: at frame boundaries derived from
    `ir_times` (seconds), weights ramp 0->1 into the next IR. Matches reference
    synthesize.py:148-181 exactly (host-side; shapes feed the jitted path).

    Returns:
        (n_frames, n_irs) float array of weights in [0, 1].
    """
    frames = np.round((np.asarray(ir_times) * sr + hop_size) / hop_size)
    n_frames = n_frames if n_frames is not None else int(frames[-1])

    g_interp = np.zeros((n_frames, len(frames)))
    for ni in range(len(frames) - 1):
        tpts = np.arange(frames[ni], frames[ni + 1] + 1, dtype=int) - 1
        # Ramp over the FULL segment, then TRUNCATE to the frame budget (the
        # reference assumes n_frames >= frames[-1] and never clips). Filtering
        # first and ramping over the survivors would COMPRESS the crossfade —
        # a clipped segment would snap to its end IR early.
        ratio = np.linspace(0, 1, len(tpts))
        keep = (tpts >= 0) & (tpts < n_frames)
        tpts, ratio = tpts[keep], ratio[keep]
        if len(tpts) == 0:
            continue
        g_interp[tpts, ni] = 1 - ratio
        g_interp[tpts, ni + 1] = ratio
    return g_interp


@partial(jax.jit, static_argnames=("block_frames",))
def time_variant_convolve_spec(
    s_audio: jnp.ndarray,
    s_ir: jnp.ndarray,
    w_ir: jnp.ndarray,
    block_frames: int = 0,
) -> jnp.ndarray:
    """Convolve a bank of time-varying IR spectrograms with an audio spectrogram.

    Arguments:
        s_audio: (n_audio_frames, n_freq) complex audio STFT.
        s_ir: (n_ir_frames, n_freq, n_ch, n_irs) complex IR STFTs.
        w_ir: (n_w_frames, n_irs) real interpolation weights.
        block_frames: frame-axis block size for overlap-save; 0 = single block.

    Returns:
        (n_frames, n_freq, n_ch) complex spatialised STFT, where
        n_frames = min(n_audio_frames, n_w_frames).
    """
    n_ir_frames, n_freq, n_ch, n_irs = s_ir.shape
    n_frames = min(s_audio.shape[0], w_ir.shape[0])

    # Weight-modulated audio spectrogram: y[m, j, f] = w[m, j] * s_audio[m, f]
    m = n_frames  # only the first n_frames of y can influence the first n_frames out
    y = w_ir[:m, :, None].astype(s_audio.dtype) * s_audio[:m, None, :]  # (m, J, F)

    if block_frames <= 0 or block_frames >= n_frames:
        # Single-block: one big FFT along the frame axis.
        nfft = _next_pow2(n_ir_frames + m - 1)
        a = jnp.fft.fft(s_ir, n=nfft, axis=0)  # (L, F, C, J)
        b = jnp.fft.fft(y, n=nfft, axis=0)  # (L, J, F)
        out_hat = jnp.einsum("tfcj,tjf->tfc", a, b)
        out = jnp.fft.ifft(out_hat, axis=0)[:n_frames]
        return out

    # Overlap-save over frame blocks: FFT size bounded by block + IR frames.
    nfft = _next_pow2(block_frames + n_ir_frames - 1)
    a = jnp.fft.fft(s_ir, n=nfft, axis=0)  # (L2, F, C, J) — shared across blocks

    n_blocks = -(-n_frames // block_frames)
    pad_to = n_blocks * block_frames
    y_pad = jnp.pad(y, ((0, pad_to - m), (0, 0), (0, 0)))
    y_blocks = y_pad.reshape(n_blocks, block_frames, n_irs, n_freq)

    def one_block(y_blk):
        b = jnp.fft.fft(y_blk, n=nfft, axis=0)
        out_hat = jnp.einsum("tfcj,tjf->tfc", a, b)
        return jnp.fft.ifft(out_hat, axis=0)  # (nfft, F, C)

    block_out = jax.lax.map(one_block, y_blocks)  # (n_blocks, nfft, F, C)

    # Scatter-add each block's linear-conv tail into the output timeline.
    total = pad_to + nfft
    out = jnp.zeros((total, n_freq, n_ch), dtype=block_out.dtype)
    starts = jnp.arange(n_blocks) * block_frames

    def add_block(i, acc):
        return jax.lax.dynamic_update_slice(
            acc,
            jax.lax.dynamic_slice(acc, (starts[i], 0, 0), (nfft, n_freq, n_ch)) + block_out[i],
            (starts[i], 0, 0),
        )

    out = jax.lax.fori_loop(0, n_blocks, add_block, out)
    return out[:n_frames]


@partial(jax.jit, static_argnames=("block_frames",))
def tv_convolve_spec_from_parts(
    sa_re: jnp.ndarray,
    sa_im: jnp.ndarray,
    si_re: jnp.ndarray,
    si_im: jnp.ndarray,
    w_ir: jnp.ndarray,
    block_frames: int = 0,
) -> jnp.ndarray:
    """time_variant_convolve_spec for HOST-provided complex spectrograms.

    The TPU runtime rejects host-transferred complex program inputs
    (UNIMPLEMENTED); callers holding numpy complex STFTs ship real/imag float32
    pairs, combined here with lax.complex inside the program.
    """
    return time_variant_convolve_spec(
        jax.lax.complex(sa_re, sa_im), jax.lax.complex(si_re, si_im), w_ir, block_frames
    )


def tv_convolve(
    audio: jnp.ndarray,
    irs: jnp.ndarray,
    w_ir: jnp.ndarray,
    fft_size: int = config.FFT_SIZE,
    win_size: int = config.WIN_SIZE,
    hop_size: int = config.HOP_SIZE,
    block_frames: int = 512,
) -> jnp.ndarray:
    """Full moving-source render: STFT -> time-variant convolution -> iSTFT.

    Arguments:
        audio: (n_samples,) dry mono signal.
        irs: (n_ch, n_irs, ir_len) impulse response bank (trajectory points).
        w_ir: (n_w_frames, n_irs) interpolation weights (see interpolation_matrix).
        block_frames: overlap-save block size along the frame axis.

    Returns:
        (n_ch, out_samples) wet audio; out_samples = n_frames*hop - win as in the
        reference iSTFT trim.
    """
    # IR spectrograms: stft over last axis of (C, J, L) -> (frames, freq, C, J)
    s_ir = stft(irs, fft_size, win_size, hop_size)
    s_audio = stft(audio, fft_size, win_size, hop_size)
    spatial_stft = time_variant_convolve_spec(s_audio, s_ir, jnp.asarray(w_ir), block_frames)
    return istft_overlap_add(spatial_stft, fft_size, win_size, hop_size).T
