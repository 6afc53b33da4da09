"""JAX backends for the heavy augmentation DSP (phase vocoder, IIR, dynamics).

The reference routes these through pedalboard's JUCE C++ processors
(reference augmentation.py:9-17); the numpy implementations in
`ops.fx_dsp` replace them functionally but serialise on a 1-core host —
`time_stretch`/`pitch_shift` per event dominate an augmentation-enabled
dataset run. This module reimplements the expensive kernels as jitted JAX
programs so they run on the accelerator (or XLA:CPU in prep workers) and so
`Event.load_audio` amortises compiles across events:

- every CONTINUOUS parameter (stretch rate, semitones, cutoff, thresholds,
  envelope coefficients) is a traced scalar — one compiled program serves
  every sampled augmentation value;
- every SHAPE is bucketed to a power of two, so arbitrary event clip lengths
  group into ~7 programs per kernel instead of one per length;
- recurrences use exact `lax.associative_scan` (one-pole envelopes) or
  FFT-domain frequency sampling (biquads, whose impulse response decays well
  inside the padded tail);
- the phase-vocoder overlap-add uses hop-strided reshapes (nfft/hop
  interleaved streams), not scatter-adds, so it lowers to VPU adds + batched
  FFTs on TPU.

`ops.fx_dsp` dispatches here by default (AUDIBLELIGHT_FX_BACKEND=numpy opts
out); the numpy path remains the bit-for-bit oracle the parity tests compare
against (tests/test_fx_jax.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Phase-vocoder framing (matches ops.fx_dsp.time_stretch)
_NFFT = 2048
_HOP = 512
_OLA_STREAMS = _NFFT // _HOP

# Fractional-resampler taps (windowed sinc)
_RESAMPLE_TAPS = 32


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# Exact one-pole recurrence: y[t] = (1 - c) x[t] + c y[t-1]
# ---------------------------------------------------------------------------


def _onepole(x: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    """Exact one-pole smoothing along the last axis via associative scan.

    A first-order linear recurrence composes associatively as
    (a2, b2) o (a1, b1) = (a1*a2, a2*b1 + b2), so lax.associative_scan
    evaluates it in O(log n) depth — no sequential sample loop, and exact
    (unlike FFT frequency-sampling, whose wrap error grows with the release
    time constant).
    """
    a = jnp.broadcast_to(coeff, x.shape).astype(x.dtype)
    b = (1.0 - coeff) * x

    def comb(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, y = lax.associative_scan(comb, (a, b), axis=-1)
    return y


# ---------------------------------------------------------------------------
# IIR filtering via FFT frequency sampling (biquads: short impulse tails)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n", "nfft"))
def _filter_fft(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray, n: int, nfft: int):
    """y = IIR(b, a) * x via frequency sampling on an nfft grid.

    Exactness: the circular-wrap error is bounded by the filter's impulse
    response beyond (nfft - n) samples; callers size nfft so that tail
    exceeds 8192 samples, where audio-EQ biquad responses have decayed below
    float32 resolution (pole radii << 1 - 1/8192 for RBJ-cookbook Q values).
    """
    w = 2.0 * jnp.pi * jnp.arange(nfft // 2 + 1) / nfft
    e1 = jnp.exp(-1j * w)
    e2 = e1 * e1
    num = b[0] + b[1] * e1 + b[2] * e2
    den = a[0] + a[1] * e1 + a[2] * e2
    h = num / den
    spec = jnp.fft.rfft(x, n=nfft, axis=-1)
    y = jnp.fft.irfft(spec * h, n=nfft, axis=-1)
    return y[..., :n]


def biquad(audio, b: np.ndarray, a: np.ndarray):
    """Apply one biquad (transfer coefficients from fx_dsp._biquad_coeffs)."""
    n = audio.shape[-1]
    nfft = 2 * _next_pow2(max(n, 8192))
    x = jnp.asarray(audio, dtype=jnp.float32)
    y = _filter_fft(x, jnp.asarray(b, jnp.float32), jnp.asarray(a, jnp.float32), n, nfft)
    return np.asarray(y)


# ---------------------------------------------------------------------------
# Dynamics
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n",))
def _compress(x, attack_coeff, release_coeff, threshold_db, inv_ratio, n: int):
    level = _onepole(jnp.abs(x), attack_coeff)
    level_db = 20.0 * jnp.log10(level + 1e-10)
    over = jnp.maximum(level_db - threshold_db, 0.0)
    gain_db = -over * (1.0 - inv_ratio)
    gain_db = _onepole(gain_db, release_coeff)
    return (x * 10.0 ** (gain_db / 20.0))[..., :n]


def compress(audio, sr: float, threshold_db: float, ratio: float,
             attack_ms: float, release_ms: float):
    """Feed-forward compressor; same detector/curve as fx_dsp.compress."""
    n = audio.shape[-1]
    n_pad = _next_pow2(n)
    x = jnp.asarray(audio, dtype=jnp.float32)
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)])
    att = float(np.exp(-1.0 / max(attack_ms * 1e-3 * sr, 1.0)))
    rel = float(np.exp(-1.0 / max(release_ms * 1e-3 * sr, 1.0)))
    y = _compress(
        x,
        jnp.float32(att), jnp.float32(rel),
        jnp.float32(threshold_db), jnp.float32(1.0 / max(ratio, 1.0)),
        n_pad,
    )
    return np.asarray(y)[..., :n]


# ---------------------------------------------------------------------------
# Phase vocoder: time stretch (+ fractional resampler -> pitch shift)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_frames_max", "out_frames_max"))
def _pv_stretch(x, rate, n_frames, n_frames_max: int, out_frames_max: int):
    """Phase-vocoder stretch on bucketed frame counts.

    x: (C, (n_frames_max - 1) * hop + nfft) zero-padded input.
    rate, n_frames: TRACED scalars (n_frames = true frame count before the
    bucket padding; frames past it hold zeros).
    Returns the full out_frames_max OLA buffer; the caller slices to the true
    output length it computes host-side.
    """
    window = jnp.hanning(_NFFT)  # matches fx_dsp.time_stretch's np.hanning
    idx = jnp.arange(_NFFT)[None, :] + _HOP * jnp.arange(n_frames_max)[:, None]
    frames = x[:, idx] * window  # (C, T, nfft)
    spec = jnp.fft.rfft(frames, axis=-1)
    mags = jnp.abs(spec)
    phases = jnp.angle(spec)

    time_steps = jnp.arange(out_frames_max, dtype=jnp.float32) * rate
    last = jnp.maximum(n_frames - 1, 0)
    valid = time_steps < jnp.maximum(n_frames.astype(jnp.float32), 1.0)
    t_lo = jnp.clip(jnp.floor(time_steps).astype(jnp.int32), 0, last)
    t_hi = jnp.minimum(t_lo + 1, last)
    frac = (time_steps - t_lo)[None, :, None]
    mag_i = (mags[:, t_lo] * (1 - frac) + mags[:, t_hi] * frac) * valid[None, :, None]

    omega = 2.0 * jnp.pi * _HOP * jnp.arange(spec.shape[-1]) / _NFFT
    dphase = phases[:, t_hi] - phases[:, t_lo] - omega
    dphase = dphase - 2.0 * jnp.pi * jnp.round(dphase / (2.0 * jnp.pi))
    inst_freq = omega + dphase
    phase_acc = jnp.cumsum(
        jnp.concatenate([phases[:, t_lo[:1]], inst_freq[:, :-1]], axis=1), axis=1
    )
    out_frames = jnp.fft.irfft(mag_i * jnp.exp(1j * phase_acc), n=_NFFT, axis=-1)
    out_frames = out_frames * window  # (C, T_out, nfft)

    # Overlap-add via hop-strided streams: nfft/hop interleaved chunk lanes,
    # chunk j of frame i lands at (i + j) * hop — a pad + add per lane, no
    # scatter. norm accumulates window^2 the same way (valid frames only).
    c, t_out = out_frames.shape[0], out_frames.shape[1]
    out_len = (t_out - 1) * _HOP + _NFFT
    out = jnp.zeros((c, out_len), out_frames.dtype)
    norm = jnp.zeros((out_len,), out_frames.dtype)
    w2 = (window**2)[None, :] * valid[:, None]  # (T_out, nfft)
    for j in range(_OLA_STREAMS):
        lane = out_frames[:, :, j * _HOP : (j + 1) * _HOP].reshape(c, t_out * _HOP)
        out = out.at[:, j * _HOP : (j + t_out) * _HOP].add(lane)
        wlane = w2[:, j * _HOP : (j + 1) * _HOP].reshape(t_out * _HOP)
        norm = norm.at[j * _HOP : (j + t_out) * _HOP].add(wlane)
    return out / jnp.maximum(norm, 1e-8)


def _pv_out_frames(n_frames: int, rate: float) -> int:
    """Synthesis frame count — matches len(np.arange(0, n_frames, rate))."""
    return len(np.arange(0, n_frames, rate))


def time_stretch(audio, rate: float):
    """Phase-vocoder time stretch; rate > 1 shortens. Matches the numpy
    implementation's framing and output length exactly (float32 math)."""
    if rate == 1.0:
        return audio
    mono = audio.ndim == 1
    x = np.asarray(audio, dtype=np.float32)
    x = x[None, :] if mono else x
    n = x.shape[-1]
    n_frames = max(1 + (n - _NFFT) // _HOP, 1)
    n_frames_max = _next_pow2(n_frames)
    out_frames_max = n_frames_max if rate >= 1.0 else 2 * n_frames_max

    pad_len = (n_frames_max - 1) * _HOP + _NFFT
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(pad_len - n, 0))])[..., :pad_len]
    out = _pv_stretch(
        jnp.asarray(xp), jnp.float32(rate), jnp.int32(n_frames),
        n_frames_max, out_frames_max,
    )
    n_out = (_pv_out_frames(n_frames, rate) - 1) * _HOP + _NFFT
    out = np.asarray(out)[..., :n_out]
    out = out[0] if mono else out
    return out.astype(np.asarray(audio).dtype, copy=False)


@partial(jax.jit, static_argnames=("out_len",))
def _frac_resample(x, factor, src_len, out_len: int):
    """Windowed-sinc fractional resampling: out[t] = x(t * factor).

    x: (C, n_pad); factor/src_len traced. Anti-aliasing cutoff scales with
    max(factor, 1); per-output-tap weight normalisation flattens the DC
    response (the classic resize-kernel trick), so amplitude is preserved for
    any fractional rate.
    """
    t = jnp.arange(out_len, dtype=jnp.float32)
    pos = t * factor
    i0 = jnp.floor(pos).astype(jnp.int32)
    k = jnp.arange(_RESAMPLE_TAPS, dtype=jnp.float32) - (_RESAMPLE_TAPS // 2 - 1)
    idx = i0[:, None] + k.astype(jnp.int32)[None, :]  # (T, M)
    arg = idx.astype(jnp.float32) - pos[:, None]  # (T, M) in [-M/2, M/2]
    cutoff = 0.92 / jnp.maximum(factor, 1.0)
    sinc = cutoff * jnp.sinc(cutoff * arg)
    hann = 0.5 + 0.5 * jnp.cos(jnp.pi * arg / (_RESAMPLE_TAPS // 2))
    hann = jnp.where(jnp.abs(arg) < _RESAMPLE_TAPS // 2, hann, 0.0)
    w = sinc * hann
    w = w * (idx >= 0) * (idx < src_len)
    w = w / jnp.maximum(jnp.abs(w.sum(-1, keepdims=True)), 1e-8)
    gathered = jnp.take(x, jnp.clip(idx, 0, x.shape[-1] - 1), axis=-1)  # (C, T, M)
    out = jnp.einsum("...tm,tm->...t", gathered, w)
    return out * (pos < src_len)


def pitch_shift(audio, sr: float, semitones: float):
    """Pitch shift = phase-vocoder stretch by 1/factor + fractional resample
    back to the original duration (factor = 2^(semitones/12))."""
    if semitones == 0:
        return audio
    factor = 2.0 ** (semitones / 12.0)
    stretched = time_stretch(audio, 1.0 / factor)
    mono = stretched.ndim == 1
    xs = stretched[None, :] if mono else stretched
    n = np.asarray(audio).shape[-1]
    src_len = xs.shape[-1]
    # Pad the source so every gather window fits, bucketed for program reuse
    n_pad = _next_pow2(src_len + _RESAMPLE_TAPS)
    xp = np.pad(xs, [(0, 0)] * (xs.ndim - 1) + [(0, n_pad - src_len)])
    out_bucket = _next_pow2(n)
    out = _frac_resample(
        jnp.asarray(xp, jnp.float32), jnp.float32(factor), jnp.int32(src_len),
        out_bucket,
    )
    out = np.asarray(out)[..., :n]
    if out.shape[-1] < n:  # pragma: no cover - out_bucket >= n by construction
        out = np.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, n - out.shape[-1])])
    out = out[0] if mono else out
    return out.astype(np.asarray(audio).dtype, copy=False)
