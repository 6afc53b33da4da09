"""Colored-noise synthesis on device: Gaussian (1/f)^beta power-law PSD shaping.

Device-side analog of the Timmer & Koenig (1995) spectral-shaping algorithm used by
the reference's ambience module (audiblelight/ambience.py:271-375). The host-parity
version (identical RNG draws to the reference) lives in
audiblelight_tpu.ambience.powerlaw_psd_gaussian; this JAX version is used for batched
on-device generation where statistical (not bitwise) equivalence is what matters.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("shape", "fmin"))
def powerlaw_psd_gaussian_jax(
    key: jax.Array,
    beta: float,
    shape: tuple,
    fmin: float = 0.0,
) -> jnp.ndarray:
    """Generate Gaussian (1/f)^beta noise with the given shape on device.

    The last axis is time; all other axes are independent channels. Output is
    normalised to approximately unit variance and zero mean.
    """
    shape = tuple(shape)
    samples = shape[-1]

    f = jnp.fft.rfftfreq(samples)
    eps = jnp.finfo(jnp.float32).tiny
    fmin_eff = jnp.maximum(fmin, 1.0 / (samples + eps))

    s_scale = jnp.where(f < fmin_eff, fmin_eff, f) ** (-beta / 2.0)
    # The DC bin is excluded from the output std computation.
    w = s_scale[1:]
    w = w.at[-1].multiply((1 + (samples % 2)) / 2.0)
    sigma = 2 * jnp.sqrt(jnp.sum(w**2)) / (samples + eps)

    fshape = shape[:-1] + (f.shape[0],)
    k_re, k_im = jax.random.split(key)
    sr = jax.random.normal(k_re, fshape) * s_scale
    si = jax.random.normal(k_im, fshape) * s_scale

    if samples % 2 == 0:
        si = si.at[..., -1].set(0.0)
        sr = sr.at[..., -1].multiply(jnp.sqrt(2.0))
    si = si.at[..., 0].set(0.0)
    sr = sr.at[..., 0].multiply(jnp.sqrt(2.0))

    y = jnp.fft.irfft(sr + 1j * si, n=samples, axis=-1)
    return y / sigma
