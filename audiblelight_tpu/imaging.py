"""Acoustic imaging: APGD "acoustic camera" ground truth on device.

API parity with reference audiblelight/imaging.py:343-1205 (itself adapted from the
LAM/DeepWave line of work): Fibonacci-lattice hemisphere fields, far-field steering
operators, Tukey-windowed block-FFT visibility (spatial covariance) matrices, and
an accelerated proximal gradient descent (APGD) solve of the elastic-net acoustic
imaging problem

    min_x ||Sigma - A diag(x) A^H||_F^2 + lambda (gamma ||x||_1 + (1-gamma)/2 ||x||_2^2),
    x >= 0.

TPU-first design: the reference fans the per-band loop out over joblib processes
and runs a Python APGD iteration per frame (reference imaging.py:722-853). Here the
solver is a fixed-iteration lax.scan (warm-started frame to frame, matching the
reference's i_prev chaining), vmapped across frequency bands — eigendecompositions,
gradient matmuls and proximal steps all batch onto the MXU/VPU in one program.

Label generation (equirect interpolation, lat-corrected Gaussians, segmentation)
is host-side numpy/scipy; connected components via scipy.ndimage replace the
reference's OpenCV contour pass (the output is filled pixel lists either way).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage
from scipy.interpolate import griddata
from scipy.signal import windows

from audiblelight_tpu import config, custom_types, utils

SPEED_OF_SOUND = config.SPEED_OF_SOUND


# ---------------------------------------------------------------------------
# Coordinate helpers (equirectangular <-> spherical <-> cartesian)
# ---------------------------------------------------------------------------


def _spherical_to_equirectangular(az_deg, el_deg, width, height):
    """(azimuth, elevation) degrees -> equirect pixel (x, y)."""
    x = (0.5 - az_deg / 360.0) * width % width
    y = (0.5 - el_deg / 180.0) * height
    return x, y


def _equirectangular_to_spherical(x, y, width, height):
    """Equirect pixel (x, y) -> (azimuth, elevation) degrees."""
    az = (0.5 - x / width) * 360.0
    el = 90.0 - (y / height) * 180.0
    return az, el


def _cartesian_to_spherical(x, y, z):
    """Unit vector -> (azimuth, elevation) degrees."""
    az = np.degrees(np.arctan2(y, x))
    el = np.degrees(np.arcsin(np.clip(z, -1.0, 1.0)))
    return az, el


# ---------------------------------------------------------------------------
# Field geometry
# ---------------------------------------------------------------------------


def fibonacci(
    n: custom_types.Numeric,
    direction: Optional[np.ndarray] = None,
    fo_v: Optional[custom_types.Numeric] = None,
) -> np.ndarray:
    """Fibonacci-lattice sampling of the unit sphere.

    `n` is the refinement order: 4*(n+1)^2 points are generated. Optionally limit
    to a spherical cap of field-of-view `fo_v` (radians) around `direction`.

    Returns (3, m) cartesian coordinates.
    """
    if n < 0:
        raise ValueError("Parameter `n` must be non-negative.")
    if direction is not None:
        direction = np.asarray(direction, dtype=float)
        direction = direction / np.linalg.norm(direction)
        if fo_v is None:
            raise ValueError("Parameter `fo_v` must be specified if `direction` is provided.")
        if not (0 < np.rad2deg(fo_v) < 360):
            raise ValueError("Parameter `fo_v` must be in (0, 360) degrees.")

    n_px = 4 * (int(n) + 1) ** 2
    idx = np.arange(n_px)
    colat = np.arccos(1 - (2 * idx + 1) / n_px)
    lon = (4 * np.pi * idx) / (1 + np.sqrt(5))

    lat = np.pi / 2 - colat
    xyz = np.stack(
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)], axis=0
    )

    if direction is not None:
        mask = (direction @ xyz) >= np.cos(fo_v / 2)
        xyz = xyz[:, mask]
    return xyz


def get_field(sh_order: Optional[custom_types.Numeric] = config.AIMG_SH_ORDER) -> np.ndarray:
    """Full-sphere Fibonacci field at the given SH order: (3, n_px) coordinates."""
    r = fibonacci(sh_order)
    # NOTE: no polar-border trim. The row count must stay exactly
    # 4*(sh_order+1)^2: generate_acoustic_image_json rebuilds the tesselation
    # from that inversion, so any filtering here would silently desynchronise
    # the acoustic-image rows from their directions. (An earlier
    # |z| < sin(90 deg) trim was a no-op for the same reason.)
    return r


def steering_operator(
    xyz: np.ndarray,
    r: np.ndarray,
    fmin: Optional[custom_types.Numeric] = config.AIMG_FMIN,
    fmax: Optional[custom_types.Numeric] = config.AIMG_FMAX,
    n_bands: Optional[custom_types.Numeric] = config.AIMG_NBANDS,
) -> np.ndarray:
    """Far-field steering matrix A = exp(-i * 2pi/wl * X^T R).

    Arguments:
        xyz: (3, C) capsule positions.
        r: (3, N) field directions.

    Returns:
        (C, N) complex steering matrix at the band-top wavelength.
    """
    freq = np.linspace(fmin, fmax, n_bands)
    wl = SPEED_OF_SOUND / (freq.max() + 500)
    if wl <= 0:
        raise ValueError(f"Parameter `wl` must be positive (got {wl}).")
    scale = 2 * np.pi / wl
    return np.exp((-1j * scale * xyz.T) @ r)


# ---------------------------------------------------------------------------
# Visibility (spatial covariance) extraction
# ---------------------------------------------------------------------------


def extract_visibilities(
    data_: np.ndarray,
    rate_: custom_types.Numeric,
    t: custom_types.Numeric,
    fc: custom_types.Numeric,
    bw: custom_types.Numeric,
    alpha: custom_types.Numeric,
) -> np.ndarray:
    """Per-STI-frame visibility matrices for one frequency band.

    Tukey-windowed block FFT; band bins [fc-bw/2, fc+bw/2] are collapsed and the
    outer product X^H X forms the (C x C) visibility per frame.

    Returns (n_frames, C, C) complex.
    """
    n_stft_sample = int(rate_ * t)
    if n_stft_sample == 0:
        raise ValueError("Not enough samples per time frame.")

    n_sample = (data_.shape[0] // n_stft_sample) * n_stft_sample
    n_channel = data_.shape[1]
    blocks = data_[:n_sample].reshape(-1, n_stft_sample, n_channel)

    window = windows.tukey(M=n_stft_sample, alpha=alpha, sym=True).reshape(1, -1, 1)
    spec = np.fft.fft(blocks * window, axis=1)

    idx_start = int((fc - 0.5 * bw) * n_stft_sample / rate_)
    idx_end = int((fc + 0.5 * bw) * n_stft_sample / rate_)
    collapsed = np.sum(spec[:, idx_start : idx_end + 1, :], axis=1)  # (F, C)

    return collapsed[:, :, None].conj() * collapsed[:, None, :]


def form_visibility(
    data: np.ndarray,
    rate: custom_types.Numeric,
    fc: custom_types.Numeric,
    bw: custom_types.Numeric,
    t_sti: custom_types.Numeric,
    t_stationarity: custom_types.Numeric,
) -> np.ndarray:
    """Stationarity-pooled visibilities: sum STI frames into stationary blocks."""
    s_sti = extract_visibilities(data, rate, t_sti, fc, bw, alpha=1.0)
    n_block = int(t_stationarity / t_sti)
    n_out = s_sti.shape[0] // n_block
    return s_sti[: n_out * n_block].reshape(n_out, n_block, *s_sti.shape[1:]).sum(axis=1)


# ---------------------------------------------------------------------------
# APGD solver (device)
# ---------------------------------------------------------------------------


@jax.jit
def _eigh_max_device(a_re: jnp.ndarray, a_im: jnp.ndarray) -> jnp.ndarray:
    """Power iteration for eigh_max as ONE compiled program.

    Takes real/imag float32 parts: the TPU runtime handles complex values fine
    INSIDE a program but rejects complex program inputs (UNIMPLEMENTED), so all
    device entry points here take split operands and combine with lax.complex.
    """
    a_j = jax.lax.complex(a_re, a_im)

    def matvec(v):
        c = (a_j * v) @ a_j.conj().T
        d = c @ a_j
        return jnp.sum(a_j.conj() * d, axis=0).real

    n = a_j.shape[1]
    v0 = jnp.ones(n) / jnp.sqrt(jnp.float32(n))

    def body(_, v):
        w = matvec(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)

    v = jax.lax.fori_loop(0, 50, body, v0)
    return jnp.vdot(v, matvec(v)).real


def eigh_max(a: np.ndarray) -> float:
    """Largest eigenvalue of B = (conj(A) . A)^H (conj(A) . A) via power iteration.

    This is the Lipschitz-constant ingredient for the APGD step size.
    """
    a64 = np.asarray(a, dtype=np.complex64)
    return float(_eigh_max_device(jnp.asarray(a64.real), jnp.asarray(a64.imag)))


def _l2_grad(x, sigma, a):
    """Gradient of ||Sigma - A diag(x) A^H||_F^2 w.r.t. x."""
    residual = sigma - (a * x) @ a.conj().T
    return -2.0 * jnp.sum(a.conj() * (residual @ a), axis=0).real


@partial(jax.jit, static_argnames=("n_iter", "d"))
def apgd_solve(
    sigma: jnp.ndarray,
    a: jnp.ndarray,
    l_: jnp.ndarray,
    x0: jnp.ndarray,
    lambda_: Optional[jnp.ndarray] = None,
    gamma: float = 0.5,
    n_iter: int = 50,
    d: int = 50,
) -> jnp.ndarray:
    """Accelerated proximal gradient descent for one visibility matrix.

    Fixed-iteration Nesterov-accelerated forward-backward splitting with the
    elastic-net + nonnegativity prox. When `lambda_` is None, it is auto-tuned
    with the reference's procedure (one plain gradient step bounds the intensity
    scale; lambda = max/(10 * alpha * gamma), reference imaging.py:660-678).
    """
    alpha = 1.0 / l_

    if lambda_ is None:
        x_probe = jnp.maximum(x0 - alpha * _l2_grad(x0, sigma, a), 0.0)
        lambda_ = jnp.max(x_probe) / (10.0 * alpha * gamma)

    shrink = alpha * lambda_ * gamma
    denom = 1.0 + alpha * lambda_ * (1.0 - gamma)

    def body(carry, k):
        x_prev, y = carry
        grad = _l2_grad(y, sigma, a)
        z = y - alpha * grad
        x = jnp.maximum(z - shrink, 0.0) / denom  # elastic-net + nonneg prox
        beta = (k - 1.0) / (k + d)
        y_next = x + beta * (x - x_prev)
        return (x, y_next), None

    (x, _), _ = jax.lax.scan(body, (x0, x0), jnp.arange(1, n_iter + 1, dtype=jnp.float32))
    return x


@partial(jax.jit, static_argnames=("n_iter",))
def _apgd_band(
    sig_re: jnp.ndarray,
    sig_im: jnp.ndarray,
    a_re: jnp.ndarray,
    a_im: jnp.ndarray,
    l_: jnp.ndarray,
    n_iter: int = 50,
):
    """APGD over all frames of one band, warm-starting each frame from the last.

    Complex operands arrive as real/imag float32 pairs (complex program inputs
    are rejected by the TPU runtime; internal complex math is fine).
    """
    sigmas = jax.lax.complex(sig_re, sig_im)
    a = jax.lax.complex(a_re, a_im)
    n_px = a.shape[1]

    def norm_sigma(s):
        d, v = jnp.linalg.eigh(s)
        d_max = jnp.max(d)
        d_n = jnp.where(d_max <= 0, jnp.zeros_like(d), jnp.clip(d / jnp.maximum(d_max, 1e-30), 0, None))
        return (v * d_n) @ v.conj().T

    def frame(x_prev, s):
        s_norm = norm_sigma(s)
        x = apgd_solve(s_norm, a, l_, x_prev, gamma=0.5, n_iter=n_iter)
        return x, x

    _, xs = jax.lax.scan(frame, jnp.zeros(n_px), sigmas)
    return xs  # (frames, n_px)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------


def _mel_frequencies(n: int, fmin: float, fmax: float) -> np.ndarray:
    """Mel-spaced frequencies (Slaney-style htk=False formula)."""

    def hz_to_mel(f):
        f = np.asarray(f, dtype=float)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=float)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)

    return mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n))


def get_visibility_matrix(
    audio_in: np.ndarray,
    micarray_coords: np.ndarray,
    sr: Optional[custom_types.Numeric] = config.SAMPLE_RATE,
    t_sti: Optional[custom_types.Numeric] = config.AIMG_TSTI,
    scale: Optional[str] = config.AIMG_SCALE,
    nbands: Optional[custom_types.Numeric] = config.AIMG_NBANDS,
    frame_cap: Optional[custom_types.Numeric] = config.AIMG_FRAME_CAP,
    fmin: Optional[custom_types.Numeric] = config.AIMG_FMIN,
    fmax: Optional[custom_types.Numeric] = config.AIMG_FMAX,
    bw: Optional[custom_types.Numeric] = config.AIMG_BANDWIDTH,
    sh_order: Optional[custom_types.Numeric] = config.AIMG_SH_ORDER,
    n_jobs: Optional[custom_types.Numeric] = None,  # accepted for API parity; unused
    verbosity: Optional[custom_types.Numeric] = None,  # accepted for API parity; unused
    n_iter: int = 50,
) -> np.ndarray:
    """Compute the APGD acoustic image for multichannel audio.

    Arguments:
        audio_in: (samples, channels) audio.
        micarray_coords: (capsules, 3) polar capsule coordinates (az, el, dist).

    Returns:
        (tesselation, bands, frames) acoustic image.
    """
    if fmin >= fmax:
        raise ValueError(
            f"Minimum frequency must be smaller than maximum frequency "
            f"(current minimum: {fmin}, maximum: {fmax})."
        )
    if scale == "linear":
        freq = np.linspace(fmin, fmax, nbands)
    elif scale == "log":
        freq = _mel_frequencies(nbands, fmin, fmax)
    else:
        raise ValueError(
            f"'{scale}' is not a valid scale to generate covariance matrices "
            f"(must be either 'log' or 'linear')"
        )

    # Hemispherical field + steering operator
    r = get_field(sh_order)
    mic_xyz = utils.polar_to_cartesian(np.asarray(micarray_coords)).T  # (3, C)
    a = steering_operator(mic_xyz, r, fmin=fmin, fmax=fmax, n_bands=nbands)
    a64 = np.asarray(a, dtype=np.complex64)
    a_re, a_im = jnp.asarray(a64.real), jnp.asarray(a64.imag)
    l_ = jnp.asarray(2.0 * eigh_max(a), dtype=jnp.float32)

    # Host: band visibilities (cheap block FFTs), stacked to (bands, frames, C, C)
    t_stationarity = 10 * t_sti
    sigmas = []
    for fc in freq:
        s = form_visibility(audio_in, sr, fc, bw, t_sti, t_stationarity)
        if frame_cap:
            s = s[:frame_cap]
        sigmas.append(s)
    min_frames = min(s.shape[0] for s in sigmas)
    sigmas = np.stack([s[:min_frames] for s in sigmas])  # (B, F, C, C)

    # Device: all bands in one vmapped program (complex shipped as re/im pairs)
    sig64 = np.asarray(sigmas, dtype=np.complex64)
    xs = jax.vmap(lambda sr_, si_: _apgd_band(sr_, si_, a_re, a_im, l_, n_iter=n_iter))(
        jnp.asarray(sig64.real), jnp.asarray(sig64.imag)
    )  # (bands, frames, n_px)

    return np.asarray(jnp.transpose(xs, (2, 0, 1)))  # (tesselation, bands, frames)


# ---------------------------------------------------------------------------
# Label generation (host-side)
# ---------------------------------------------------------------------------


def create_target_grid(width: custom_types.Numeric, height: custom_types.Numeric) -> np.ndarray:
    """Regular equirect (azimuth, elevation) target grid of shape (W*H, 2)."""
    target_az = np.linspace(180, -180, utils.sanitise_positive_number(width, cast_to=int))
    target_el = np.linspace(90, -90, utils.sanitise_positive_number(height, cast_to=int))
    az_grid, el_grid = np.meshgrid(target_az, target_el, indexing="xy")
    return np.stack([az_grid.ravel(), el_grid.ravel()], axis=1)


def create_2d_gaussian(
    cx: custom_types.Numeric,
    cy: custom_types.Numeric,
    width: custom_types.Numeric,
    height: custom_types.Numeric,
    circle_radius: custom_types.Numeric = config.AIMG_CIRCLE_RADIUS_DEG,
) -> np.ndarray:
    """Latitude-corrected 2D Gaussian at pixel (cx, cy) on an equirect canvas.

    The circle radius contains ~2 SD of the mass; azimuth deltas wrap and are
    scaled by cos(latitude) so the footprint is isotropic on the sphere.
    """
    if not 0 <= cx <= width:
        raise ValueError(f"X coordinate is outside of width! (x = {cx}, width = {width})")
    if not 0 <= cy <= height:
        raise ValueError(f"Y coordinate is outside of height! (y = {cy}, height = {height})")

    sigma_deg = circle_radius / 2.0
    deg_per_pixel_x = 360.0 / width
    deg_per_pixel_y = 180.0 / height
    _, center_el_deg = _equirectangular_to_spherical(cx, cy, width=width, height=height)

    xx, yy = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    dx = (xx - cx + width / 2) % width - width / 2  # wrapped, signed
    dy = yy - cy
    delta_az = -dx * deg_per_pixel_x
    delta_el = dy * deg_per_pixel_y
    cos_lat = np.cos(np.radians(center_el_deg))
    dist_sq = delta_el**2 + (cos_lat * delta_az) ** 2
    return np.exp(-dist_sq / (2.0 * sigma_deg**2))


def find_segmentations(acoustic_image: np.ndarray) -> list[list[list]]:
    """Connected components of the nonzero mask, as filled pixel lists.

    Each component yields [[x, y, amplitude], ...]. A blob split across the
    left/right equirect edges produces two components, as in the reference's
    contour pass (imaging.py:925-975) — without the OpenCV dependency.
    """
    mask = acoustic_image > 0
    labelled, n_comp = ndimage.label(mask)
    out = []
    for comp in range(1, n_comp + 1):
        ys, xs = np.where(labelled == comp)
        if len(xs) < 2:
            continue  # degenerate single-pixel blobs, as in the reference
        amps = acoustic_image[ys, xs]
        out.append([[int(x), int(y), float(ampl)] for x, y, ampl in zip(xs, ys, amps)])
    return out


def generate_acoustic_image_json(
    acoustic_image: np.ndarray,
    metadata: np.ndarray,
    resolution: Optional[tuple] = config.AIMG_RESOLUTION,
    polygon_mask_threshold: Optional[custom_types.Numeric] = config.AIMG_POLYGON_MASK_THRESHOLD,
    circle_radius: Optional[custom_types.Numeric] = config.AIMG_CIRCLE_RADIUS_DEG,
) -> list[dict]:
    """Segmentation labels for an acoustic image, one dict per (frame, event).

    Pipeline (reference imaging.py:978-1139): band-median the image, interpolate
    each annotated frame onto an equirect canvas, weight by a Gaussian at the
    ground-truth direction, threshold, and emit per-blob pixel lists.
    """
    if not acoustic_image.ndim == 3:
        raise ValueError(
            f"Expected acoustic image to have 3 dimensions, but got {acoustic_image.shape}"
        )

    scene_res = []
    n_tesselation, _, _ = acoustic_image.shape
    medianed = np.median(acoustic_image, axis=1)  # (tesselation, frames)

    # Infer sh_order back from the tesselation size: n_px = 4*(order+1)^2
    sh_order = int(math.sqrt(n_tesselation) / 2 - 1)
    tess = fibonacci(sh_order).T
    tess_eq = np.stack([_cartesian_to_spherical(*p) for p in tess])

    video_width, video_height = resolution
    target_points = create_target_grid(video_width, video_height)

    for frame_idx in np.unique(metadata[:, 0]):
        frame = medianed[:, int(frame_idx)] if int(frame_idx) < medianed.shape[1] else None
        if frame is None:
            continue
        interpolated = griddata(
            tess_eq, frame, target_points, method="linear", fill_value=0.0
        ).reshape(video_height, video_width)

        for row in metadata[metadata[:, 0] == frame_idx]:
            _, class_id, instance_id, gt_az, gt_el, gt_dist = row[:6]
            gt_x, gt_y = _spherical_to_equirectangular(
                gt_az, gt_el, width=video_width, height=video_height
            )
            gauss = create_2d_gaussian(
                gt_x, gt_y, width=video_width, height=video_height, circle_radius=circle_radius
            )
            scaled = interpolated * gauss
            scaled = np.where(scaled < polygon_mask_threshold, 0.0, scaled)

            scene_res.append(
                {
                    "metadata_frame_index": int(frame_idx),
                    "instance_id": int(instance_id),
                    "category_id": int(class_id),
                    "segmentation": find_segmentations(scaled),
                    "distance": float(gt_dist),
                }
            )

    return scene_res


def sigmoid(x: Union[np.ndarray, custom_types.Numeric]):
    """Numerically-stable sigmoid mapping into [0, 1]."""
    return np.exp(-np.logaddexp(0, -np.asarray(x, dtype=float)))


def standardise_acoustic_image_amplitude(acoustic_image_labels: list[dict]) -> list[dict]:
    """Z-score segmentation amplitudes against the STARSS23 training distribution
    (hardcoded mu/sigma, reference config.py:97-100), then sigmoid into [0, 1]."""
    mu, sig = config.AIMG_STARSS23_MU, config.AIMG_STARSS23_SIGMA
    res = []
    for aimg in acoustic_image_labels:
        new_polys = []
        for poly in aimg["segmentation"]:
            poly_arr = np.array(poly, dtype=float)
            poly_arr[:, -1] = sigmoid((poly_arr[:, -1] - mu) / sig)
            new_polys.append(poly_arr.tolist())
        aimg["segmentation"] = new_polys
        res.append(aimg)
    return res
