"""Tests for the WorldState backends: shoebox, ray-traced mesh, SOFA."""

import numpy as np
import pytest

from audiblelight_tpu.micarrays import AmbeoVR, FOAListener
from audiblelight_tpu.worldstate import (
    Emitter,
    WorldState,
    WorldStateRLR,
    WorldStateShoebox,
    WorldStateSOFA,
    get_worldstate_from_string,
)

SR = 44100


# ---------------------------------------------------------------------------
# Emitter
# ---------------------------------------------------------------------------


def test_emitter_roundtrip():
    em = Emitter("src000", np.array([1.0, 2.0, 3.0]))
    d = em.to_dict()
    rebuilt = Emitter.from_dict(d)
    assert rebuilt == em
    np.testing.assert_allclose(rebuilt.coordinates_absolute, [1, 2, 3])


def test_emitter_update_coordinates():
    from collections import OrderedDict

    em = Emitter("src000", np.array([3.0, 0.0, 0.0]))
    mic = AmbeoVR()
    mic.set_absolute_coordinates(np.array([0.0, 0.0, 0.0]))
    em.update_coordinates(OrderedDict({"mic000": mic}))
    np.testing.assert_allclose(
        em.coordinates_relative_cartesian["mic000"], [3, 0, 0], atol=1e-9
    )
    polar = em.coordinates_relative_polar["mic000"][0]
    assert np.isclose(polar[0], 0.0)  # azimuth 0 (front)
    assert np.isclose(polar[2], 3.0)  # distance 3


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def test_registry():
    assert get_worldstate_from_string("rlr") is WorldStateRLR
    assert get_worldstate_from_string("SOFA") is WorldStateSOFA
    assert get_worldstate_from_string("shoebox") is WorldStateShoebox
    with pytest.raises(ValueError):
        get_worldstate_from_string("unknown")


# ---------------------------------------------------------------------------
# Shoebox backend
# ---------------------------------------------------------------------------


@pytest.fixture
def shoebox():
    return WorldStateShoebox(
        dimensions=[6.0, 4.0, 3.0],
        max_order=6,
        max_ir_length=0.25,
        frequency_bands=1,
        seed=0,
    )


def test_shoebox_add_microphone_random(shoebox):
    shoebox.add_microphone("ambeovr")
    mic = shoebox.get_microphone("mic000")
    assert mic.name == "ambeovr"
    # capsule positions respect the surface margin
    caps = mic.coordinates_absolute
    assert np.all(caps > 0.1) and np.all(caps < np.array([6, 4, 3]) - 0.1)


def test_shoebox_add_microphone_fixed_position(shoebox):
    shoebox.add_microphone("monocapsule", position=[3.0, 2.0, 1.5], alias="центр")
    np.testing.assert_allclose(
        shoebox.get_microphone("центр").coordinates_center, [3, 2, 1.5]
    )


def test_shoebox_invalid_position_raises(shoebox):
    with pytest.raises(ValueError):
        shoebox.add_microphone("monocapsule", position=[100.0, 0.0, 0.0])


def test_shoebox_add_emitters_and_spacing(shoebox):
    shoebox.add_microphone("monocapsule", position=[3.0, 2.0, 1.5])
    shoebox.add_emitter(position=[1.0, 1.0, 1.0], alias="a")
    shoebox.add_emitter(keep_existing=True)  # random
    assert shoebox.num_emitters == 2
    # Adding an emitter on top of another must fail
    with pytest.raises(ValueError):
        shoebox.add_emitter(position=[1.0, 1.0, 1.05], alias="b", keep_existing=True)


def test_shoebox_simulate_direct_path(shoebox):
    shoebox.add_microphone("monocapsule", position=[1.0, 2.0, 1.5])
    shoebox.add_emitter(position=[4.0, 2.0, 1.5], alias="s")  # 3 m
    shoebox.simulate()
    irs = shoebox.irs["mic000"]
    assert irs.shape[0] == 1 and irs.shape[1] == 1
    # Direct arrival at the expected delay (search before the first reflections;
    # symmetric placements can make coincident reflection images out-peak a
    # fractionally-split direct pulse globally)
    peak = np.argmax(np.abs(irs[0, 0, :450]))
    assert abs(peak - 3.0 / 343.0 * SR) <= 2


def test_shoebox_foa_mic(shoebox):
    shoebox.add_microphone("foalistener", position=[3.0, 2.0, 1.5])
    shoebox.add_emitter(position=[4.5, 2.0, 1.5], alias="s")
    shoebox.simulate()
    irs = shoebox.irs["mic000"]
    assert irs.shape[0] == 4  # W, X, Y, Z channels


def test_shoebox_trajectory(shoebox):
    shoebox.add_microphone("monocapsule", position=[3.0, 2.0, 1.5])
    traj = shoebox.define_trajectory(
        duration=2.0, velocity=1.0, resolution=2.0, shape="linear"
    )
    assert traj.shape == (5, 3)
    # all points valid & inside
    assert shoebox._validate_position(traj)
    # step distance <= velocity/resolution
    steps = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    assert np.all(steps <= 0.5 + 1e-4)


def test_shoebox_serialisation_roundtrip(shoebox):
    shoebox.add_microphone("ambeovr", position=[3.0, 2.0, 1.5])
    shoebox.add_emitter(position=[1.0, 1.0, 1.0], alias="s")
    d = shoebox.to_dict()
    rebuilt = WorldState.from_dict(d)
    assert isinstance(rebuilt, WorldStateShoebox)
    assert rebuilt == shoebox
    np.testing.assert_allclose(rebuilt.dimensions, shoebox.dimensions)
    assert rebuilt.num_emitters == 1


def test_shoebox_path_always_exists(shoebox):
    assert shoebox.path_exists_between_points([1, 1, 1], [5, 3, 2])
    assert not shoebox.path_exists_between_points([1, 1, 1], [7, 3, 2])  # outside


# ---------------------------------------------------------------------------
# Mesh (ray-traced) backend
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def room_obj(tmp_path_factory):
    """A 6x4x3 shoebox room as an OBJ file on disk."""
    from audiblelight_tpu.geometry import box_mesh

    mesh = box_mesh(extents=[6.0, 4.0, 3.0], center=[3.0, 2.0, 1.5])
    path = tmp_path_factory.mktemp("meshes") / "room.obj"
    with open(path, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in mesh.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    return path


@pytest.fixture
def rlr(room_obj):
    return WorldStateRLR(
        mesh=room_obj,
        rlr_kwargs=dict(
            indirect_ray_count=300, indirect_ray_depth=20, max_ir_length=0.2
        ),
        seed=0,
    )


def test_rlr_mesh_loaded(rlr):
    assert rlr.mesh.is_watertight
    np.testing.assert_allclose(rlr.mesh.bounds, [[0, 0, 0], [6, 4, 3]])


def test_rlr_config_surface(rlr):
    assert rlr.cfg.sample_rate == SR
    assert rlr.cfg.indirect_ray_count == 300
    with pytest.raises(AttributeError):
        WorldStateRLR(mesh=rlr.mesh, rlr_kwargs={"not_a_field": 1})
    with pytest.raises(ValueError):
        WorldStateRLR(mesh=rlr.mesh, sample_rate=24000, rlr_kwargs={"sample_rate": 44100})


def test_rlr_placement_and_validation(rlr):
    rlr.add_microphone("ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    assert rlr.ctx.get_listener_count() == 4
    rlr.add_emitter(position=[1.0, 1.0, 1.0], alias="s")
    assert rlr.ctx.get_source_count() == 1
    # invalid: outside mesh
    assert not rlr._validate_position(np.array([10.0, 0.0, 0.0]))
    # invalid: too close to surface
    assert not rlr._validate_position(np.array([0.05, 2.0, 1.5]))


def test_rlr_direct_path(rlr):
    assert rlr.path_exists_between_points(
        np.array([1.0, 2.0, 1.5]), np.array([5.0, 2.0, 1.5])
    )
    assert not rlr.path_exists_between_points(
        np.array([1.0, 2.0, 1.5]), np.array([8.0, 2.0, 1.5])
    )


def test_rlr_weighted_average_ray_length(rlr):
    # Center of a 6x4x3 room: distances to walls are (3, 2, 1.5)-ish
    val = rlr.calculate_weighted_average_ray_length(np.array([3.0, 2.0, 1.5]))
    assert 1.0 < val < 6.0


def test_rlr_simulate(rlr):
    rlr.add_microphone("monocapsule", position=[1.0, 2.0, 1.5], alias="m")
    rlr.add_emitter(position=[4.0, 2.0, 1.5], alias="s")  # 3 m
    rlr.simulate()
    irs = rlr.irs["m"]
    assert irs.shape[0] == 1 and irs.shape[1] == 1
    peak = np.argmax(np.abs(irs[0, 0, : int(0.05 * SR)]))
    assert abs(peak - 3.0 / 343.0 * SR) <= 2
    # reverb tail present
    tail = irs[0, 0, int(0.05 * SR) :]
    assert np.abs(tail).max() > 0


def test_rlr_trajectory(rlr):
    rlr.add_microphone("monocapsule", position=[3.0, 2.0, 1.5], alias="m")
    traj = rlr.define_trajectory(duration=2.0, velocity=1.0, resolution=2.0, shape="linear")
    assert traj.shape == (5, 3)
    assert rlr._validate_position(traj)


def test_rlr_serialisation_roundtrip(rlr):
    rlr.add_microphone("ambeovr", position=[3.0, 2.0, 1.5], alias="m")
    rlr.add_emitter(position=[1.0, 1.0, 1.0], alias="s")
    d = rlr.to_dict()
    assert d["backend"] == "RLR"
    assert "rlr_config" in d
    rebuilt = WorldState.from_dict(d)
    assert isinstance(rebuilt, WorldStateRLR)
    assert rebuilt.num_emitters == 1
    np.testing.assert_allclose(
        rebuilt.get_microphone("m").coordinates_center, [3, 2, 1.5]
    )


def test_rlr_add_emitters_without_validating(rlr):
    rlr.add_microphone("monocapsule", position=[3.0, 2.0, 1.5], alias="m")
    traj = np.array([[1.0, 1.0, 1.0], [1.05, 1.0, 1.0], [1.1, 1.0, 1.0]])
    rlr._add_emitters_without_validating(traj, "moving")
    assert len(rlr.get_emitters("moving")) == 3


# ---------------------------------------------------------------------------
# SOFA backend
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sofa_file(tmp_path_factory):
    """Synthetic 4-capsule SOFA file: 27-point grid of delta-impulse IRs."""
    from audiblelight_tpu.io.sofa import write_sofa

    rng = np.random.default_rng(0)
    grid = np.stack(
        np.meshgrid(
            np.linspace(1.0, 5.0, 3), np.linspace(1.0, 3.0, 3), np.linspace(1.0, 2.0, 3)
        ),
        axis=-1,
    ).reshape(-1, 3)
    listener = np.array([3.0, 2.0, 1.5])
    n_caps, n_samp = 4, 2048
    irs = np.zeros((len(grid), n_caps, n_samp))
    for m, src in enumerate(grid):
        delay = int(np.linalg.norm(src - listener) / 343.0 * SR)
        irs[m, :, delay] = 1.0 / (4 * np.pi * max(np.linalg.norm(src - listener), 0.1))
        irs[m, :, delay + 100 :] += (
            rng.standard_normal((n_caps, n_samp - delay - 100)) * 1e-4
        )
    receivers = np.array(
        [[0.01, 0.01, 0.01], [0.01, -0.01, -0.01], [-0.01, 0.01, -0.01], [-0.01, -0.01, 0.01]]
    )
    path = tmp_path_factory.mktemp("sofa") / "test_mic.sofa"
    write_sofa(
        path, irs, grid, listener, receivers, SR, listener_short_name="testmic"
    )
    return path


def test_sofa_dummy_microphone(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file, seed=0)
    assert len(ws.microphones) == 1
    mic = ws.get_microphone(ws.mic_alias)
    assert mic.n_capsules == 4
    assert mic.channel_layout_type == "mic"  # inferred from filepath "test_mic.sofa"


def test_sofa_clear_microphones_forbidden(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file)
    with pytest.raises(NotImplementedError):
        ws.clear_microphones()
    with pytest.raises(NotImplementedError):
        ws.clear_microphone("mic000")


def test_sofa_emitter_snapping(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file, seed=0)
    # A position near (1, 1, 1) snaps to exactly (1, 1, 1)
    ws.add_emitter(position=[1.02, 0.98, 1.01], alias="s")
    em = ws.get_emitter("s")
    np.testing.assert_allclose(em.coordinates_absolute, [1, 1, 1], atol=1e-9)
    assert em.sofa_idx is not None


def test_sofa_get_irs_shape(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file, seed=0)
    ws.add_emitter(position=[1.0, 1.0, 1.0], alias="a")
    ws.add_emitter(position=[5.0, 3.0, 2.0], alias="b", keep_existing=True)
    ws.simulate()
    irs = ws.irs[ws.mic_alias]
    assert irs.shape == (4, 2, 2048)
    # Delta at the right delay for emitter a
    d = np.linalg.norm(np.array([1, 1, 1.0]) - np.array([3, 2, 1.5]))
    expected = int(d / 343.0 * SR)
    assert np.argmax(np.abs(irs[0, 0])) == expected


def test_sofa_resampling(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file, sample_rate=22050, seed=0)
    ws.add_emitter(position=[1.0, 1.0, 1.0], alias="a")
    ws.simulate()
    irs = ws.irs[ws.mic_alias]
    assert irs.shape[2] == 1024  # halved


def test_sofa_trajectory_snapped(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file, seed=3)
    traj = ws.define_trajectory(
        duration=2.0, velocity=1.2, resolution=1.0, shape="linear"
    )
    assert traj.shape == (3, 3)
    # every point is a measured grid point
    grid = ws.get_source_positions()
    for p in traj:
        assert np.min(np.linalg.norm(grid - p, axis=1)) < 1e-9


def test_sofa_serialisation_roundtrip(sofa_file):
    ws = WorldStateSOFA(sofa=sofa_file, seed=0)
    ws.add_emitter(position=[1.0, 1.0, 1.0], alias="s")
    d = ws.to_dict()
    assert d["backend"] == "SOFA"
    rebuilt = WorldState.from_dict(d)
    assert isinstance(rebuilt, WorldStateSOFA)
    assert rebuilt.num_emitters == 1
    assert rebuilt.get_emitter("s").sofa_idx == ws.get_emitter("s").sofa_idx
