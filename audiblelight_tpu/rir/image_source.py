"""Shoebox image-source RIR engine (Allen & Berkley) in JAX, frequency-domain.

Fills (with a real implementation) the reference's unimplemented Shoebox backend
(reference worldstate.py:3105-3110, docs/backend.rst) and doubles as the analytic
oracle for the stochastic ray tracer.

TPU-first design notes:
  * Image contributions are synthesised IN THE FREQUENCY DOMAIN:
    H(f) = sum_k g_k(f) * exp(-i w_f tau_k). This replaces per-image scatter-adds
    (slow on TPU) with dense chunked elementwise math + reductions, gives *exact*
    band-limited fractional delays (important for inter-capsule phase coherence,
    e.g. MUSIC DOA), and lets wall absorption be frequency-dependent per image:
    g_k(f) = prod_w beta_w(f)^{m_kw} evaluated as exp((m K x 6) @ (6 x F) log-betas)
    — an MXU matmul.
  * float32 phase exactness: the sample delay d is split into integer + fractional
    parts; (f * d_int) mod S is computed in exact int32 arithmetic so phases never
    lose precision at large f*d products.
  * The image grid is processed in fixed-size chunks under lax.scan so VMEM/HBM
    working-set stays bounded regardless of reflection order.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audiblelight_tpu import config
from audiblelight_tpu.rir.sh import (
    ambisonic_encoding_gains,
    encoding_channels,
)


def _image_grid(max_order: int) -> tuple[np.ndarray, np.ndarray]:
    """All (n, q) image indices with |n_x|+|n_y|+|n_z| order cap.

    Returns n (K, 3) int and q (K, 3) int in {0, 1}.
    """
    rng = np.arange(-max_order, max_order + 1)
    n = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1).reshape(-1, 3)
    # Keep the cube (standard practice); could restrict to the L1 ball to halve work.
    q = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), axis=-1
    ).reshape(-1, 3)
    n_rep = np.repeat(n, 8, axis=0)
    q_rep = np.tile(q, (len(n), 1))
    return n_rep.astype(np.int32), q_rep.astype(np.int32)


@partial(
    jax.jit,
    static_argnames=("n_samples", "max_order", "sr", "encoding", "chunk"),
)
def shoebox_rirs(
    room_dims: jnp.ndarray,
    source_pos: jnp.ndarray,
    listener_pos: jnp.ndarray,
    wall_log_beta: jnp.ndarray,
    band_freqs: jnp.ndarray,
    n_samples: int,
    max_order: int = 8,
    sr: int = config.SAMPLE_RATE,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    chunk: int = 1024,
    hrtf=None,
) -> jnp.ndarray:
    """Compute shoebox RIRs for all (listener, source) pairs.

    Arguments:
        room_dims: (3,) room dimensions Lx, Ly, Lz in metres; the room spans
            [0, L] per axis.
        source_pos: (E, 3) source positions inside the room.
        listener_pos: (C, 3) listener (capsule) positions. For encoding="foa" or
            "binaural", C must be 1 (a single listener producing 4 / 2 channels).
        wall_log_beta: (6, B) log reflection coefficients per wall per band, walls
            ordered [x0, xL, y0, yL, z0, zL]; log(beta) = 0.5*log(1-alpha).
        band_freqs: (B,) band centre frequencies the coefficients are defined at.
        n_samples: IR length in samples.
        max_order: image order per axis.
        encoding: "omni" (one channel per listener), "foa" (4 channels, AmbiX), or
            "binaural" (2 channels).

    Returns:
        (C_out, E, n_samples) float32 IR bank. C_out = C for omni, 4 for foa,
        2 for binaural.
    """
    room_dims = jnp.asarray(room_dims, dtype=jnp.float32)
    source_pos = jnp.atleast_2d(jnp.asarray(source_pos, dtype=jnp.float32))
    listener_pos = jnp.atleast_2d(jnp.asarray(listener_pos, dtype=jnp.float32))

    n_np, q_np = _image_grid(max_order)
    k_total = len(n_np)
    n_chunks = -(-k_total // chunk)
    pad = n_chunks * chunk - k_total
    # Padded entries replicate image 0 with zero gain via a validity mask.
    valid = np.concatenate([np.ones(k_total, bool), np.zeros(pad, bool)])
    n_np = np.concatenate([n_np, np.tile(n_np[:1], (pad, 1))])
    q_np = np.concatenate([q_np, np.tile(q_np[:1], (pad, 1))])

    n_all = jnp.asarray(n_np).reshape(n_chunks, chunk, 3)
    q_all = jnp.asarray(q_np).reshape(n_chunks, chunk, 3)
    valid_all = jnp.asarray(valid).reshape(n_chunks, chunk)

    n_freq = n_samples // 2 + 1
    freqs_hz = jnp.arange(n_freq, dtype=jnp.float32) * (sr / n_samples)

    # Interpolation weights from band-space to FFT bins (piecewise-linear in log f,
    # clamped at the edges) — (F, B) matrix, precomputed once.
    band_freqs = jnp.asarray(band_freqs, dtype=jnp.float32)
    n_bands = band_freqs.shape[0]
    if n_bands == 1:
        interp = jnp.ones((n_freq, 1), dtype=jnp.float32)
    else:
        logf = jnp.log(jnp.maximum(freqs_hz, band_freqs[0] * 0.5))
        logb = jnp.log(band_freqs)
        # For each bin, find surrounding bands
        idx_hi = jnp.clip(jnp.searchsorted(logb, logf), 1, n_bands - 1)
        idx_lo = idx_hi - 1
        w_hi = jnp.clip(
            (logf - logb[idx_lo]) / jnp.maximum(logb[idx_hi] - logb[idx_lo], 1e-9),
            0.0,
            1.0,
        )
        interp = jnp.zeros((n_freq, n_bands), dtype=jnp.float32)
        interp = interp.at[jnp.arange(n_freq), idx_lo].add(1.0 - w_hi)
        interp = interp.at[jnp.arange(n_freq), idx_hi].add(w_hi)

    wall_log_beta = jnp.asarray(wall_log_beta, dtype=jnp.float32)  # (6, B)
    log_beta_bins = interp @ wall_log_beta.T  # (F, 6)

    e = source_pos.shape[0]
    cl = listener_pos.shape[0]
    c_out = encoding_channels(encoding, cl)

    def one_chunk(acc, inputs):
        n_c, q_c, valid_c = inputs  # (chunk, 3), (chunk, 3), (chunk,)

        # Image positions: (E, chunk, 3)
        img = (1 - 2 * q_c)[None].astype(jnp.float32) * source_pos[:, None, :] + (
            2.0 * n_c[None].astype(jnp.float32) * room_dims[None, None, :]
        )

        # Reflection counts per wall: [x0, xL, y0, yL, z0, zL] -> (chunk, 6)
        m0 = jnp.abs(n_c - q_c).astype(jnp.float32)
        mL = jnp.abs(n_c).astype(jnp.float32)
        m = jnp.stack(
            [m0[:, 0], mL[:, 0], m0[:, 1], mL[:, 1], m0[:, 2], mL[:, 2]], axis=-1
        )  # (chunk, 6)

        # Frequency-dependent gain: exp(m @ log_beta(f)) -> (chunk, F)
        loggain = m @ log_beta_bins.T  # (chunk, F)  [MXU]
        gain_f = jnp.exp(loggain) * valid_c[:, None]

        # Distances/delays per (listener, source, image)
        vec = img[None, :, :, :] - listener_pos[:, None, None, :]  # (C, E, chunk, 3)
        dist = jnp.linalg.norm(vec, axis=-1)  # (C, E, chunk)
        amp = 1.0 / (4.0 * jnp.pi * jnp.maximum(dist, 1e-2))
        delay = dist * (sr / c)  # samples, may exceed n_samples (those alias out)
        # Zero-out contributions that land beyond the IR length. With a measured
        # HRIR the image's N-tap tail must also fit before the cyclic rfft/irfft
        # wraps it around to the start of the IR (matches _binaural_direct_ir).
        in_range = n_samples - 1
        if encoding == "binaural" and hrtf is not None:
            in_range = n_samples - int(hrtf.hrirs.shape[-1])
        amp = amp * (delay < in_range)

        # Split delay into exact integer + fractional parts for float32-safe phase
        d_int = jnp.floor(delay).astype(jnp.int32)  # (C, E, chunk)
        d_frac = delay - d_int.astype(jnp.float32)

        f_idx = jnp.arange(n_freq, dtype=jnp.int32)
        # (C, E, chunk, F): (f * d_int) mod S computed exactly in int32. The product
        # is split (d = d1*256 + d0) so intermediates stay below 2^31 for any IR up
        # to ~740k samples (~16.8 s at 44.1 kHz).
        d_mod = jnp.mod(d_int, n_samples)[..., None]  # (C, E, chunk, 1)
        d_hi = d_mod >> 8
        d_lo = d_mod & 255
        f_b = f_idx[None, None, None, :]
        prod_mod = jnp.mod(
            jnp.mod(jnp.mod(f_b * d_hi, n_samples) << 8, n_samples) + f_b * d_lo,
            n_samples,
        )
        phase = (-2.0 * jnp.pi / n_samples) * (
            prod_mod.astype(jnp.float32)
            + f_idx[None, None, None, :].astype(jnp.float32) * d_frac[..., None]
        )
        phasor = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

        # Combine amplitude, per-frequency wall gain, and phase; reduce over images
        contrib = (
            amp[..., None].astype(jnp.complex64)
            * gain_f[None, None, :, :].astype(jnp.complex64)
            * phasor
        )  # (C, E, chunk, F)

        if encoding == "omni":
            spec_add = jnp.sum(contrib, axis=2)  # (C, E, F)
        else:
            dirs = vec / jnp.maximum(dist[..., None], 1e-9)  # (1, E, chunk, 3)
            if encoding == "binaural" and hrtf is not None:
                # Measured HRIR per image (rir.hrtf): blend the 3 nearest
                # HRIRs in the time domain (short: N ~ a few hundred taps),
                # then apply each ear's full spectrum to the image's
                # frequency-resolved contribution — per ear sequentially to
                # bound the (E, chunk, F) live set.
                u = dirs[0]  # (E, chunk, 3) receiver->source
                idx, wgt = hrtf.interp_weights(u)  # (E, chunk, K)
                ears = []
                for ear in range(2):
                    h_t = jnp.einsum(
                        "eck,eckn->ecn", wgt, hrtf.hrirs[idx][..., ear, :]
                    )  # (E, chunk, N)
                    h = jnp.fft.rfft(h_t, n=n_samples, axis=-1)  # (E, chunk, F)
                    ears.append(jnp.sum(contrib[0] * h, axis=1))  # (E, F)
                spec_add = jnp.stack(ears)  # (2, E, F)
            elif encoding == "binaural":
                # Spherical-head model per image: Brown-Duda shadow magnitude
                # + Woodworth ITD phase on the full frequency grid — the same
                # encoding the ray tracer's binaural paths use, so the ISM
                # stays the tracer's analytic oracle (rir.sh).
                from audiblelight_tpu.rir.sh import (
                    HEAD_RADIUS_M,
                    spherical_head_shadow,
                    woodworth_itd,
                )

                u = dirs[0]  # (E, chunk, 3) receiver->source
                itd = woodworth_itd(u, c=c)  # (E, chunk, 2) seconds
                freqs_hz = f_idx.astype(jnp.float32) * (sr / float(n_samples))
                w_ratio = (2.0 * jnp.pi * freqs_hz) * (HEAD_RADIUS_M / (2.0 * c))
                cos_axes = (u[..., 1], -u[..., 1])
                ears = []
                for ear in range(2):  # sequential: bounds the (E, chunk, F) live set
                    mag = spherical_head_shadow(cos_axes[ear], w_ratio)
                    ph = (-2.0 * jnp.pi) * freqs_hz * itd[..., ear][..., None]
                    h = mag * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
                    ears.append(jnp.sum(contrib[0] * h, axis=1))  # (E, F)
                spec_add = jnp.stack(ears)  # (2, E, F)
            else:
                # foa / sh{N}: encode at the layout's full order (the ISM has
                # no direct/indirect split — every image is a discrete path)
                enc = ambisonic_encoding_gains(dirs[0], 3, encoding)
                # (E, chunk, F) x (E, chunk, C_out) -> (C_out, E, F)
                spec_add = jnp.einsum(
                    "ekf,ekc->cef", contrib[0], enc.astype(jnp.complex64)
                )

        return acc + spec_add, None

    init = jnp.zeros((c_out, e, n_freq), dtype=jnp.complex64)
    spec, _ = jax.lax.scan(one_chunk, init, (n_all, q_all, valid_all))

    irs = jnp.fft.irfft(spec, n=n_samples, axis=-1)
    return irs.astype(jnp.float32)


def wall_log_betas_from_absorption(
    absorption, n_bands: int = 1, band_freqs: Optional[np.ndarray] = None
) -> tuple[np.ndarray, np.ndarray]:
    """Helper: build (6, B) log-reflection-coefficients + band centres.

    `absorption` may be a scalar (all walls, all bands), a (6,) per-wall array, or a
    (6, B) per-wall-per-band array. beta = sqrt(1 - alpha).
    """
    absorption = np.asarray(absorption, dtype=np.float64)
    if absorption.ndim == 0:
        alpha = np.full((6, n_bands), float(absorption))
    elif absorption.ndim == 1:
        alpha = np.tile(absorption[:, None], (1, n_bands))
    else:
        alpha = absorption
        n_bands = alpha.shape[1]
    if band_freqs is None:
        band_freqs = np.geomspace(125.0, 8000.0, n_bands) if n_bands > 1 else np.array([1000.0])
    beta = np.sqrt(np.clip(1.0 - alpha, 1e-6, 1.0))
    return np.log(beta).astype(np.float32), np.asarray(band_freqs, dtype=np.float32)
