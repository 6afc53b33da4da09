"""Tests for microphone array geometry and serialisation."""

import numpy as np
import pytest

from audiblelight_tpu.micarrays import (
    MICARRAY_LIST,
    AmbeoVR,
    Binaural,
    ChannelLayoutType,
    Eigenmike32,
    Eigenmike64,
    FOAListener,
    MicArray,
    MonoCapsule,
    dynamically_define_micarray,
    sanitize_microphone_input,
)


def test_capsule_counts():
    assert MonoCapsule().n_capsules == 1
    assert Binaural().n_capsules == 2
    assert FOAListener().n_capsules == 4
    assert AmbeoVR().n_capsules == 4
    assert Eigenmike32().n_capsules == 32
    assert Eigenmike64().n_capsules == 64


def test_n_listeners_by_layout():
    assert AmbeoVR().n_listeners == 4  # mic: one listener per capsule
    assert FOAListener().n_listeners == 1  # foa: single listener, 4 channels
    assert Binaural().n_listeners == 1
    assert FOAListener().n_channels == 4
    assert Binaural().n_channels == 2
    assert Eigenmike32().n_channels == 32


def test_channel_layout_types():
    assert AmbeoVR().channel_layout.layout_type == ChannelLayoutType.Mono
    assert FOAListener().channel_layout.layout_type == ChannelLayoutType.Ambisonics
    assert Binaural().channel_layout.layout_type == ChannelLayoutType.Binaural


def test_spherical_radii():
    em = Eigenmike32()
    radii = np.linalg.norm(em.coordinates_cartesian, axis=1)
    np.testing.assert_allclose(radii, 0.042, atol=1e-9)
    vr = AmbeoVR()
    radii = np.linalg.norm(vr.coordinates_cartesian, axis=1)
    np.testing.assert_allclose(radii, 0.01, atol=1e-9)


def test_set_absolute_coordinates():
    mic = AmbeoVR()
    center = np.array([1.0, 2.0, 3.0])
    absolute = mic.set_absolute_coordinates(center)
    assert absolute.shape == (4, 3)
    np.testing.assert_allclose(absolute.mean(axis=0), center, atol=1e-9)
    np.testing.assert_allclose(mic.coordinates_center, center)


def test_absolute_coordinates_before_set_raises():
    with pytest.raises(NotImplementedError):
        _ = AmbeoVR().coordinates_absolute


def test_to_from_dict_roundtrip():
    mic = Eigenmike32()
    mic.set_absolute_coordinates(np.array([0.5, 0.5, 1.0]))
    d = mic.to_dict()
    rebuilt = MicArray.from_dict(d)
    assert rebuilt == mic
    assert rebuilt.name == "eigenmike32"
    np.testing.assert_allclose(
        rebuilt.coordinates_absolute, mic.coordinates_absolute, atol=1e-9
    )


def test_from_dict_dynamic_array():
    d = dict(
        micarray_type="WeirdArray",
        name="weird",
        is_spherical=False,
        channel_layout_type="mic",
        n_capsules=2,
        capsule_names=["a", "b"],
        coordinates_center=[0.0, 0.0, 0.0],
        coordinates_cartesian=[[0.1, 0, 0], [-0.1, 0, 0]],
        coordinates_absolute=[[0.1, 0, 0], [-0.1, 0, 0]],
        coordinates_polar=None,
    )
    mic = MicArray.from_dict(d)
    assert mic.name == "weird"
    assert mic.n_capsules == 2
    assert type(mic).__name__ == "WeirdArray"


def test_sanitize_microphone_input():
    assert sanitize_microphone_input("ambeovr") is AmbeoVR
    assert sanitize_microphone_input(AmbeoVR) is AmbeoVR
    assert sanitize_microphone_input(AmbeoVR()) is AmbeoVR
    assert sanitize_microphone_input(None) is MonoCapsule
    with pytest.raises(ValueError):
        sanitize_microphone_input("not_a_mic")
    with pytest.raises(TypeError):
        sanitize_microphone_input(12345)


def test_dynamically_define_micarray():
    cls = dynamically_define_micarray(
        name="tester",
        channel_layout_type="foa",
        coordinates_cartesian=[[0.0, 0.0, 1.0]],
        capsule_names=["only"],
    )
    inst = cls()
    assert isinstance(inst, MicArray)
    assert inst.name == "tester"
    assert inst.channel_layout_type == "foa"
    np.testing.assert_allclose(inst.coordinates_cartesian, [[0.0, 0.0, 1.0]])


def test_all_arrays_instantiable():
    for cls in MICARRAY_LIST:
        inst = cls()
        assert inst.n_capsules >= 1
        assert len(inst.capsule_names) == inst.n_capsules
