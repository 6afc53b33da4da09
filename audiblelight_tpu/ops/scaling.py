"""Level scaling and normalisation primitives (JAX, jit/vmap friendly).

Matches the semantics of reference synthesize.py:40-68 (apply_snr, db_to_multiplier),
:404-428 (normalize_irs) and utils.py:667-689 (pad_or_truncate_audio), re-expressed as
pure fixed-shape jnp functions so they fuse into the surrounding render program.
"""

from __future__ import annotations

import jax.numpy as jnp

_TINY32 = float(jnp.finfo(jnp.float32).tiny)


def apply_snr(x: jnp.ndarray, snr) -> jnp.ndarray:
    """Scale a signal so its absolute peak equals `snr`."""
    peak = jnp.maximum(jnp.max(jnp.abs(x)), 1e-15)
    return x * snr / peak


def db_to_multiplier(db, x) -> jnp.ndarray:
    """Multiplier m such that 20*log10(m * x) ~= db."""
    return 10 ** (db / 20.0) / (x + _TINY32)


def peak_normalize(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Normalise so max(|x|) == 1 (optionally per-axis, keeping dims)."""
    peak = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    return x / (peak + _TINY32)


def normalize_irs(irs: jnp.ndarray) -> jnp.ndarray:
    """Energy-normalise an IR bank.

    Each IR's energy is sqrt(sum(|ir|^2)) along the last (sample) axis; IRs are
    divided by the mean energy across the second-to-last axis. For a bank shaped
    (n_emitters, n_caps, n_samples), every emitter's (caps, samples) block is
    normalised by its mean per-capsule energy — identical to the reference's
    per-event normalisation (synthesize.py:404-428, applied at :560).
    """
    e = jnp.sqrt(jnp.sum(jnp.abs(irs) ** 2, axis=-1, keepdims=True))
    e = e + _TINY32
    return irs / jnp.mean(e, axis=-2, keepdims=True)


def pad_or_truncate_audio(audio: jnp.ndarray, desired_samples: int) -> jnp.ndarray:
    """Pad with zeros or truncate a (..., samples) array to `desired_samples`."""
    n = audio.shape[-1]
    if n < desired_samples:
        pad = [(0, 0)] * (audio.ndim - 1) + [(0, desired_samples - n)]
        return jnp.pad(audio, pad)
    return audio[..., :desired_samples]
