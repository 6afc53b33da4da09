"""Physics tests for the shoebox image-source engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from audiblelight_tpu.rir.image_source import shoebox_rirs, wall_log_betas_from_absorption

SR = 44100
C = 343.0


def render(room, src, mics, absorption, n_samples=8192, max_order=6, encoding="omni", n_bands=1):
    log_beta, freqs = wall_log_betas_from_absorption(absorption, n_bands=n_bands)
    return np.asarray(
        shoebox_rirs(
            jnp.asarray(room),
            jnp.asarray(src),
            jnp.asarray(mics),
            jnp.asarray(log_beta),
            jnp.asarray(freqs),
            n_samples=n_samples,
            max_order=max_order,
            sr=SR,
            c=C,
            encoding=encoding,
        )
    )


def test_direct_path_delay_and_amplitude():
    room = [6.0, 5.0, 3.0]
    src = [[4.0, 2.5, 1.5]]
    mic = [[1.0, 2.5, 1.5]]  # 3 m away
    # Perfectly absorbing walls -> direct path only
    irs = render(room, src, mic, absorption=0.999999, max_order=1)
    assert irs.shape == (1, 1, 8192)
    ir = irs[0, 0]
    peak = np.argmax(np.abs(ir))
    expected_delay = 3.0 / C * SR  # ~385.7 samples
    assert abs(peak - expected_delay) <= 1
    # Amplitude ~ 1/(4 pi d). The band-limited impulse spreads across neighbouring
    # samples (true delay is fractional), so compare total energy (Parseval) rather
    # than the single peak sample.
    expected_amp = 1.0 / (4 * np.pi * 3.0)
    energy_amp = np.sqrt(np.sum(ir[peak - 64 : peak + 64] ** 2))
    assert np.isclose(energy_amp, expected_amp, rtol=0.05)


def pulse_amplitude(ir):
    """Effective amplitude of a band-limited pulse: windowed energy around the peak
    (robust to the true delay falling between samples)."""
    peak = np.argmax(np.abs(ir))
    lo, hi = max(0, peak - 64), peak + 64
    return np.sqrt(np.sum(ir[lo:hi] ** 2))


def test_inverse_square_law():
    room = [10.0, 10.0, 10.0]
    src = [[5.0, 5.0, 5.0]]
    mics = [[6.0, 5.0, 5.0], [7.0, 5.0, 5.0], [9.0, 5.0, 5.0]]  # 1, 2, 4 m
    irs = render(room, src, mics, absorption=0.999999, max_order=1)
    amps = np.array([pulse_amplitude(irs[i, 0]) for i in range(3)])
    np.testing.assert_allclose(amps[0] / amps[1], 2.0, rtol=0.05)
    np.testing.assert_allclose(amps[1] / amps[2], 2.0, rtol=0.05)


def test_first_reflection_delay():
    """With a single reflective floor, the first echo path length is known."""
    room = [20.0, 20.0, 4.0]
    src = [[10.0, 10.0, 1.0]]
    mic = [[13.0, 10.0, 1.0]]
    # Make only reflections weakly absorbed: use order 1 and uniform absorption,
    # then check the floor-bounce echo timing. Floor image at z=-1: path length
    # sqrt(3^2 + 2^2) = sqrt(13)
    irs = render(room, src, mic, absorption=0.3, max_order=1)
    ir = irs[0, 0]
    direct = int(round(3.0 / C * SR))
    floor_echo = int(round(np.sqrt(13.0) / C * SR))
    assert np.abs(ir[direct - 1 : direct + 2]).max() > 1e-3
    # Echo present near the predicted sample
    window = np.abs(ir[floor_echo - 3 : floor_echo + 4])
    assert window.max() > np.abs(ir).max() * 0.05


def rt60_schroeder(ir, sr=SR):
    """RT60 estimate from the Schroeder backward integral (T20 extrapolated)."""
    energy = np.cumsum(ir[::-1] ** 2)[::-1]
    energy = energy / energy[0]
    db = 10 * np.log10(energy + 1e-20)
    # Fit between -5 and -25 dB
    i5 = np.argmax(db < -5)
    i25 = np.argmax(db < -25)
    if i25 <= i5:
        return np.nan
    slope = (db[i25] - db[i5]) / (i25 - i5)  # dB per sample
    return -60.0 / slope / sr


def test_rt60_matches_sabine():
    """Reverberation time of the simulated IR should track Sabine's formula.

    Pure specular ISM in a rectangular room with uniform absorption produces a
    slightly-slower-than-diffuse decay (axial image chains), so Sabine (not the
    more aggressive Eyring) with a 20% tolerance is the right oracle here.
    """
    room = np.array([6.0, 4.0, 3.0])
    alpha = 0.35
    src = [[2.0, 1.0, 1.2]]
    mic = [[4.5, 3.0, 1.8]]
    irs = render(room, src, mic, absorption=alpha, n_samples=16384, max_order=14)
    ir = irs[0, 0]

    v = room.prod()
    s = 2 * (room[0] * room[1] + room[0] * room[2] + room[1] * room[2])
    rt60_sabine = 0.161 * v / (s * alpha)

    rt60_sim = rt60_schroeder(ir)
    assert np.isfinite(rt60_sim)
    assert abs(rt60_sim - rt60_sabine) / rt60_sabine < 0.20


def test_foa_encoding_directionality():
    """A source directly in front (+x) must excite W and X but not Y or Z."""
    room = [8.0, 8.0, 8.0]
    mic = [[4.0, 4.0, 4.0]]
    src = [[6.0, 4.0, 4.0]]  # straight ahead (+x)
    irs = render(room, src, mic, absorption=0.999999, max_order=1, encoding="foa")
    assert irs.shape[0] == 4  # W, X, Y, Z
    w, x, y, z = (np.abs(irs[i, 0]).max() for i in range(4))
    assert np.isclose(x / w, 1.0, atol=0.05)  # full X dipole gain
    assert y < 0.05 * w
    assert z < 0.05 * w

    # Source to the left (+y): Y channel should light up instead
    src_left = [[4.0, 6.0, 4.0]]
    irs2 = render(room, src_left, mic, absorption=0.999999, max_order=1, encoding="foa")
    w2, x2, y2, z2 = (np.abs(irs2[i, 0]).max() for i in range(4))
    assert np.isclose(y2 / w2, 1.0, atol=0.05)
    assert x2 < 0.05 * w2


def test_binaural_left_right():
    """Spherical-head binaural: lateralisation via head shadow (strong at high
    frequency, unity at low — the physical ILD, not a broadband cardioid) and
    a Woodworth ITD between the ears."""
    room = [8.0, 8.0, 8.0]
    mic = [[4.0, 4.0, 4.0]]
    src = [[4.0, 6.0, 4.0]]  # to the left
    irs = render(room, src, mic, absorption=0.999999, max_order=1, encoding="binaural")
    assert irs.shape[0] == 2
    left, right = irs[0, 0], irs[1, 0]
    # Broadband peak ILD: modest but lateralised to the left
    assert np.abs(left).max() > 1.3 * np.abs(right).max()
    # HF shadow: left/right energy ratio large above 6 kHz, near unity at LF
    sr = 44100
    spec_l = np.abs(np.fft.rfft(left))
    spec_r = np.abs(np.fft.rfft(right))
    freqs = np.fft.rfftfreq(len(left), 1 / sr)
    hf = freqs > 6000
    lf = (freqs > 50) & (freqs < 400)
    assert spec_l[hf].sum() > 3.0 * spec_r[hf].sum()
    assert 0.5 < spec_l[lf].sum() / spec_r[lf].sum() < 2.0
    # ITD: the left ear leads
    onset_l = int(np.argmax(np.abs(left) > 0.25 * np.abs(left).max()))
    onset_r = int(np.argmax(np.abs(right) > 0.25 * np.abs(right).max()))
    assert onset_r > onset_l


def test_multiband_absorption_shapes_spectrum():
    """High-frequency-absorbing walls must damp the reverberant high band more."""
    room = [5.0, 4.0, 3.0]
    src = [[1.0, 1.0, 1.0]]
    mic = [[4.0, 3.0, 2.0]]
    # alpha rising with frequency: (6 walls, 4 bands)
    alpha = np.tile(np.array([0.05, 0.1, 0.3, 0.7])[None, :], (6, 1))
    irs = render(room, src, mic, absorption=alpha, n_samples=16384, max_order=12, n_bands=4)
    ir = irs[0, 0]
    # Look at the tail (reverb-dominated) spectrum
    tail = ir[2000:]
    spec = np.abs(np.fft.rfft(tail))
    freqs = np.fft.rfftfreq(len(tail), 1 / SR)
    low = spec[(freqs > 100) & (freqs < 500)].mean()
    high = spec[(freqs > 4000) & (freqs < 8000)].mean()
    assert low > 3 * high


def test_multiple_sources_batched():
    room = [6.0, 5.0, 3.0]
    srcs = [[2.0, 2.0, 1.5], [4.0, 3.0, 1.5], [3.0, 1.0, 2.0]]
    mics = [[1.0, 4.0, 1.5], [5.0, 4.0, 1.5]]
    irs = render(room, srcs, mics, absorption=0.5, max_order=4)
    assert irs.shape == (2, 3, 8192)
    for ci, mic in enumerate(mics):
        for si, src in enumerate(srcs):
            d = np.linalg.norm(np.array(mic) - np.array(src))
            expected = int(round(d / C * SR))
            ir = np.abs(irs[ci, si])
            # Strong arrival present at the direct-path delay...
            assert ir[expected - 2 : expected + 3].max() > 0.4 / (4 * np.pi * d), (ci, si)
            # ...and causality: nothing significant arrives earlier.
            assert ir[: expected - 16].max() < 0.1 * ir.max(), (ci, si)
