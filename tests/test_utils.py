"""Tests for utils: coordinate transforms, trajectories, sanitisers."""

import numpy as np
import pytest

from audiblelight_tpu import utils


def test_polar_cartesian_roundtrip():
    polar = np.array([[45.0, 35.0, 1.0], [-135.0, -10.0, 2.5], [0.0, 0.0, 0.3]])
    cart = utils.polar_to_cartesian(polar)
    back = utils.cartesian_to_polar(cart)
    np.testing.assert_allclose(back, polar, atol=1e-10)


def test_polar_to_cartesian_axes():
    # azimuth 0, elevation 0 => +x (front)
    np.testing.assert_allclose(
        utils.polar_to_cartesian([[0, 0, 1]]), [[1, 0, 0]], atol=1e-12
    )
    # azimuth 90 => +y (left)
    np.testing.assert_allclose(
        utils.polar_to_cartesian([[90, 0, 1]]), [[0, 1, 0]], atol=1e-12
    )
    # elevation 90 => +z (up)
    np.testing.assert_allclose(
        utils.polar_to_cartesian([[0, 90, 1]]), [[0, 0, 1]], atol=1e-12
    )


def test_polar_invalid_elevation_raises():
    with pytest.raises(ValueError):
        utils.polar_to_cartesian([[0, 120, 1]])


def test_coerce2d():
    assert utils.coerce2d([1.0, 2.0, 3.0]).shape == (1, 3)
    assert utils.coerce2d(np.zeros((4, 3))).shape == (4, 3)
    with pytest.raises(ValueError):
        utils.coerce2d(np.zeros((2, 2, 2)))


def test_linear_trajectory():
    traj = utils.generate_linear_trajectory(np.zeros(3), np.array([1.0, 0, 0]), 5)
    assert traj.shape == (5, 3)
    np.testing.assert_allclose(traj[:, 0], np.linspace(0, 1, 5))
    np.testing.assert_allclose(traj[:, 1:], 0)


def test_semicircular_trajectory_endpoints_and_radius():
    start, end = np.array([0.0, 0, 0]), np.array([2.0, 0, 0])
    traj = utils.generate_semicircular_trajectory(start, end, 11)
    np.testing.assert_allclose(traj[0], start, atol=1e-12)
    np.testing.assert_allclose(traj[-1], end, atol=1e-12)
    # all points are radius 1 from the midpoint
    d = np.linalg.norm(traj - np.array([1.0, 0, 0]), axis=1)
    np.testing.assert_allclose(d, 1.0, atol=1e-12)


def test_random_trajectory_max_step(rng):
    traj = utils.generate_random_trajectory(np.zeros(3), 0.5, 20, rng=rng)
    assert traj.shape == (20, 3)
    steps = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    assert np.all(steps <= 0.5 + 1e-9)


def test_sinusoidal_and_sawtooth_endpoints(rng):
    start, end = np.array([0.0, 0, 1.0]), np.array([3.0, 1.0, 1.0])
    sin_traj = utils.generate_sinusoidal_trajectory(start, end, 21, amplitude=0.2, frequency=2)
    np.testing.assert_allclose(sin_traj[0], start, atol=1e-9)
    np.testing.assert_allclose(sin_traj[-1], end, atol=1e-9)
    saw = utils.generate_sawtooth_trajectory(start, end, 21, amplitude=0.1, frequency=1, plane="yz")
    assert saw.shape == (21, 3)


def test_pad_or_truncate_audio():
    audio = np.ones((2, 10))
    assert utils.pad_or_truncate_audio(audio, 15).shape == (2, 15)
    assert utils.pad_or_truncate_audio(audio, 5).shape == (2, 5)
    assert utils.pad_or_truncate_audio(audio, 10) is audio


def test_get_default_alias():
    assert utils.get_default_alias("mic", {}) == "mic000"
    assert utils.get_default_alias("mic", {"mic000": 1, "mic001": 2}) == "mic002"
    with pytest.raises(KeyError):
        utils.get_default_alias("mic", {"mic001": 1})


def test_sanitise_positive_number():
    assert utils.sanitise_positive_number(3) == 3.0
    assert utils.sanitise_positive_number(3.5, cast_to=int) == 3
    with pytest.raises(ValueError):
        utils.sanitise_positive_number(-1)
    with pytest.raises(TypeError):
        utils.sanitise_positive_number("nope")
    with pytest.raises(TypeError):
        utils.sanitise_positive_number(True)


def test_sanitise_coordinates():
    np.testing.assert_array_equal(utils.sanitise_coordinates([1, 2, 3]), [1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        utils.sanitise_coordinates([1, 2])
    with pytest.raises(TypeError):
        utils.sanitise_coordinates("xyz")


def test_sanitise_distribution():
    from scipy import stats

    d = utils.sanitise_distribution(stats.uniform(0, 1))
    assert 0 <= d.rvs() <= 1
    w = utils.sanitise_distribution(lambda: 5.0)
    assert w.rvs() == 5.0
    assert utils.sanitise_distribution(None) is None
    with pytest.raises(TypeError):
        utils.sanitise_distribution("not-a-distribution")


def test_sample_distribution_override():
    assert utils.sample_distribution(lambda: 3.0, override=7.0) == 7.0
    assert utils.sample_distribution(lambda: 3.0) == 3.0
    with pytest.raises(ValueError):
        utils.sample_distribution(None, None)


def test_validate_kwargs():
    def f(a=1, b=2):
        return a + b

    utils.validate_kwargs(f, a=10)
    with pytest.raises(AttributeError):
        utils.validate_kwargs(f, c=3)


def test_validate_shape():
    utils.validate_shape((2, 3), (2, 3))
    utils.validate_shape((2, 3), (2,))  # padded with None
    with pytest.raises(ValueError):
        utils.validate_shape((2, 3), (2, 4))


def test_distribution_wrapper_percentiles():
    from audiblelight_tpu.custom_types import DistributionWrapper

    rng_ = np.random.default_rng(0)
    w = DistributionWrapper(lambda: rng_.uniform(0, 1))
    assert 0.9 < w.max <= 1.0
    assert 0.0 <= w.min < 0.1
