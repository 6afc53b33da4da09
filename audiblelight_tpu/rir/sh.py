"""Real spherical harmonics and receiver encodings (AmbiX FOA, binaural approx).

Receiver-side directivity for the RIR engines. The FOA path follows the AmbiX
convention (ACN ordering, SN3D normalisation) matching the reference's Ambisonics
channel layout (reference micarrays.py:68-86: W, X, Y, Z capsule names).

Coordinate convention matches utils.polar_to_cartesian: +x front, +y left, +z up.
"""

from __future__ import annotations

import jax.numpy as jnp


def sh_real(order: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Real SH basis values (ACN order, SN3D norm) for unit direction vectors.

    Arguments:
        order: maximum SH order (0..3 supported).
        dirs: (..., 3) unit direction vectors.

    Returns:
        (..., (order+1)^2) SH values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    comps = [jnp.ones_like(x)]  # ACN 0: W
    if order >= 1:
        comps += [y, z, x]  # ACN 1..3 (SN3D): Y, Z, X
    if order >= 2:
        s3 = jnp.sqrt(3.0) / 2.0
        comps += [
            2.0 * s3 * x * y,  # ACN 4
            2.0 * s3 * y * z,  # ACN 5
            0.5 * (3.0 * z * z - 1.0),  # ACN 6
            2.0 * s3 * x * z,  # ACN 7
            s3 * (x * x - y * y),  # ACN 8
        ]
    if order >= 3:
        s5_8 = jnp.sqrt(5.0 / 8.0)
        s15_2 = jnp.sqrt(15.0) / 2.0
        s3_8 = jnp.sqrt(3.0 / 8.0)
        comps += [
            s5_8 * y * (3 * x * x - y * y),  # ACN 9
            2.0 * s15_2 * x * y * z,  # ACN 10
            s3_8 * y * (5 * z * z - 1.0),  # ACN 11
            0.5 * z * (5 * z * z - 3.0),  # ACN 12
            s3_8 * x * (5 * z * z - 1.0),  # ACN 13
            s15_2 * z * (x * x - y * y),  # ACN 14
            s5_8 * x * (x * x - 3 * y * y),  # ACN 15
        ]
    if order > 3:
        raise NotImplementedError("SH orders above 3 are not implemented")
    return jnp.stack(comps, axis=-1)


def encoding_channels(encoding: str, cl: int) -> int:
    """Output channel count for a tracer/ISM encoding string.

    "omni" -> one channel per capsule; "foa" -> 4 (AmbiX WXYZ, the reference
    FOAListener layout); "binaural" -> 2; "sh{N}" -> (N+1)^2 ACN/SN3D
    ambisonics of order N <= 3 (the higher-order layouts the reference rlr
    config's direct/indirect_sh_order fields address).
    """
    if encoding == "foa":
        return 4
    if encoding == "binaural":
        return 2
    if encoding.startswith("sh"):
        order = int(encoding[2:])
        if not 0 <= order <= 3:
            raise ValueError(f"sh encoding order must be 0..3, got {order}")
        return (order + 1) ** 2
    return cl


def ambisonic_encoding_gains(
    dirs: jnp.ndarray, encode_order: int, encoding: str
) -> jnp.ndarray:
    """Per-direction ambisonic gains encoded at `encode_order`, zero-padded to
    the layout's channel count. For "foa" the channels are permuted from ACN
    [W, Y, Z, X] to the reference FOAListener order [W, X, Y, Z]."""
    c_out = encoding_channels(encoding, 1)
    layout_order = int(round(c_out**0.5)) - 1
    encode_order = max(0, min(int(encode_order), layout_order))
    g = sh_real(encode_order, dirs)  # (..., (eo+1)^2) ACN
    if g.shape[-1] < c_out:
        g = jnp.concatenate(
            [g, jnp.zeros(g.shape[:-1] + (c_out - g.shape[-1],), g.dtype)], axis=-1
        )
    if encoding == "foa":
        g = g[..., jnp.asarray([0, 3, 1, 2])]
    return g


def foa_encoding_gains(dirs: jnp.ndarray) -> jnp.ndarray:
    """AmbiX (SN3D) first-order gains (W, X, Y, Z) for arrival directions.

    Channel ordering matches the reference FOAListener capsule names
    ["w", "x", "y", "z"] (micarrays.py:393), i.e. W then the *cartesian* dipoles.

    Arguments:
        dirs: (..., 3) unit vectors pointing from receiver toward the source.

    Returns:
        (..., 4) per-channel gains.
    """
    sh = sh_real(1, dirs)  # ACN: [W, Y, Z, X]
    return jnp.stack([sh[..., 0], sh[..., 3], sh[..., 1], sh[..., 2]], axis=-1)


def binaural_encoding_gains(dirs: jnp.ndarray) -> jnp.ndarray:
    """Simple 2-channel (left, right) head-shadow gains for arrival directions.

    A cardioid-weighted approximation: each ear is a cardioid aimed at +-90
    degrees azimuth. Sufficient for broadband level-difference cues; the
    frequency-resolved spherical-head model below (`spherical_head_gains`,
    `woodworth_itd`) carries the physical ILD tilt and ITD and is what the
    tracer/direct-path binaural encodings use.

    Returns:
        (..., 2) gains ordered [left, right].
    """
    y = dirs[..., 1]
    left = 0.5 * (1.0 + y)
    right = 0.5 * (1.0 - y)
    return jnp.stack([left, right], axis=-1)


# Average human head radius (Duda & Martens 1998); the reference's rlr engine
# renders its Binaural ChannelLayout with measured HRTFs — with no HRTF data
# shippable here, the analytic spherical-head model is the standard stand-in:
# correct ITD (Woodworth) and the physical head-shadow ILD tilt (+6 dB
# ipsilateral boost, up to -20 dB contralateral shadow at high frequency).
HEAD_RADIUS_M = 0.0875


def spherical_head_gains(
    dirs: jnp.ndarray,
    freqs: jnp.ndarray,
    c: float = 343.0,
    head_radius: float = HEAD_RADIUS_M,
) -> jnp.ndarray:
    """Per-frequency [left, right] magnitude gains from the Brown-Duda
    spherical-head shadow model (Brown & Duda, "A structural model for
    binaural sound synthesis", IEEE TSAP 1998):

        H(w, theta) = (1 + j alpha(theta) w / (2 w0)) / (1 + j w / (2 w0)),
        w0 = c / a,   alpha(theta) = 1.05 + 0.95 cos(theta * 180 / 150),

    where theta is the angle between the ARRIVAL (receiver->source) direction
    and the ear axis (+y left, -y right; coordinates as utils
    .polar_to_cartesian). |H| -> 1 at low frequency (diffraction wraps the
    head), ~2 toward the near ear and ~0.1 in the far ear's shadow at high
    frequency.

    Arguments:
        dirs: (..., 3) unit receiver->source vectors.
        freqs: (F,) frequencies in Hz.

    Returns:
        (..., 2, F) magnitude gains ordered [left, right].
    """
    freqs = jnp.asarray(freqs, dtype=jnp.float32)
    w_ratio = (2.0 * jnp.pi * freqs) * (head_radius / (2.0 * c))  # w / (2 w0)
    y = jnp.clip(dirs[..., 1], -1.0, 1.0)
    return jnp.stack(
        [spherical_head_shadow(y, w_ratio), spherical_head_shadow(-y, w_ratio)],
        axis=-2,
    )


def spherical_head_shadow(cos_to_ear: jnp.ndarray, w_ratio: jnp.ndarray) -> jnp.ndarray:
    """Single-ear Brown-Duda shadow magnitude (see spherical_head_gains).

    Arguments:
        cos_to_ear: (...,) cosine of the angle between the arrival direction
            and the ear axis.
        w_ratio: (F,) omega / (2 omega0) = 2 pi f a / (2 c).

    Returns:
        (..., F) magnitudes.
    """
    theta = jnp.arccos(jnp.clip(cos_to_ear, -1.0, 1.0))
    alpha = 1.05 + 0.95 * jnp.cos(theta * (180.0 / 150.0))
    num = 1.0 + (alpha[..., None] * w_ratio) ** 2
    den = 1.0 + w_ratio**2
    return jnp.sqrt(num / den)


def woodworth_itd(
    dirs: jnp.ndarray, c: float = 343.0, head_radius: float = HEAD_RADIUS_M
) -> jnp.ndarray:
    """Per-ear arrival-time OFFSETS (seconds) for [left, right] from the
    Woodworth spherical-head formula: relative to the head centre, the near
    ear leads by (a/c) cos(theta_inc) and the far ear lags by
    (a/c)(theta_inc - pi/2) once the path wraps the head (theta_inc is the
    angle from the ear axis; the two regimes join continuously at 90 deg).

    Returns:
        (..., 2) time offsets to ADD to the head-centre delay.
    """
    y = jnp.clip(jnp.asarray(dirs)[..., 1], -1.0, 1.0)

    def ear(cos_th):
        theta = jnp.arccos(cos_th)
        direct = -cos_th  # leads (negative offset) when the source is ear-side
        wrapped = theta - jnp.pi / 2.0
        return (head_radius / c) * jnp.where(theta < jnp.pi / 2.0, direct, wrapped)

    return jnp.stack([ear(y), ear(-y)], axis=-1)
