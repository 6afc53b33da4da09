"""Placement-mixin coverage: batch microphone adds, paired mic+emitter placement,
trajectory shapes, and predefined/waypoint events (reference: the placement
portions of tests/test_worldstate_rlr.py and tests/test_scene.py)."""

import json

import numpy as np
import pytest

from audiblelight_tpu import Scene
from audiblelight_tpu.geometry.mesh import box_mesh
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.worldstate import WorldStateRLR, WorldStateShoebox

SR = 44100


@pytest.fixture
def shoebox():
    return WorldStateShoebox(
        dimensions=[6.0, 4.0, 3.0], max_order=4, max_ir_length=0.2,
        frequency_bands=1, seed=1,
    )


# ---------------------------------------------------------------------------
# add_microphones (batch)
# ---------------------------------------------------------------------------


def test_add_microphones_types_only(shoebox):
    shoebox.add_microphones(microphone_types=["ambeovr", "monocapsule"])
    assert len(shoebox.microphones) == 2
    assert shoebox.get_microphone("mic000").name == "ambeovr"
    assert shoebox.get_microphone("mic001").name == "monocapsule"


def test_add_microphones_with_positions_and_aliases(shoebox):
    shoebox.add_microphones(
        microphone_types=["monocapsule", "monocapsule"],
        positions=[[2.0, 2.0, 1.5], [4.0, 2.0, 1.5]],
        aliases=["a", "b"],
    )
    np.testing.assert_allclose(
        shoebox.get_microphone("a").coordinates_center, [2, 2, 1.5]
    )
    np.testing.assert_allclose(
        shoebox.get_microphone("b").coordinates_center, [4, 2, 1.5]
    )


def test_add_microphones_mismatched_lengths(shoebox):
    with pytest.raises(ValueError):
        shoebox.add_microphones(
            microphone_types=["ambeovr"], positions=[[1, 1, 1], [2, 2, 2]]
        )


def test_add_microphones_duplicate_aliases(shoebox):
    with pytest.raises(ValueError):
        shoebox.add_microphones(microphone_types=["ambeovr", "ambeovr"],
                                aliases=["m", "m"])


def test_add_microphones_raise_on_error_false(shoebox):
    # Second position is outside the room: with raise_on_error=False it is
    # skipped with a warning instead of aborting the whole batch.
    shoebox.add_microphones(
        microphone_types=["monocapsule", "monocapsule"],
        positions=[[3.0, 2.0, 1.5], [50.0, 50.0, 50.0]],
        raise_on_error=False,
    )
    assert len(shoebox.microphones) == 1


def test_add_microphone_keep_existing_false(shoebox):
    shoebox.add_microphone("ambeovr", position=[3, 2, 1.5], alias="first")
    shoebox.add_microphone("monocapsule", keep_existing=False, alias="second")
    assert list(shoebox.microphones.keys()) == ["second"]


# ---------------------------------------------------------------------------
# add_microphone_and_emitter (paired placement)
# ---------------------------------------------------------------------------


def test_add_microphone_and_emitter_polar(shoebox):
    # Emitter 1 m in front of the mic (azimuth 0, elevation 0)
    shoebox.add_microphone_and_emitter(position=[0.0, 0.0, 1.0],
                                       microphone_type="ambeovr")
    mic = shoebox.get_microphone("mic000")
    em = shoebox.get_emitter("src000")
    offset = em.coordinates_absolute - mic.coordinates_center
    np.testing.assert_allclose(offset, [1.0, 0.0, 0.0], atol=1e-9)


def test_add_microphone_and_emitter_cartesian(shoebox):
    shoebox.add_microphone_and_emitter(position=[0.5, -0.5, 0.0], polar=False,
                                       microphone_type="monocapsule",
                                       mic_alias="m", emitter_alias="e")
    offset = (shoebox.get_emitter("e").coordinates_absolute
              - shoebox.get_microphone("m").coordinates_center)
    np.testing.assert_allclose(offset, [0.5, -0.5, 0.0], atol=1e-9)


def test_add_microphone_and_emitter_impossible_offset(shoebox):
    # 50 m offset can never fit inside a 6x4x3 room
    with pytest.raises(ValueError):
        shoebox.add_microphone_and_emitter(position=[0.0, 0.0, 50.0],
                                           max_place_attempts=25)


# ---------------------------------------------------------------------------
# Emitter accessors
# ---------------------------------------------------------------------------


def test_emitter_accessors_and_clearing(shoebox):
    shoebox.add_microphone("monocapsule", position=[3, 2, 1.5])
    shoebox.add_emitters(positions=[[2, 2, 1.5], [4, 2.5, 1.5]], aliases=["x", "y"])
    assert len(shoebox.get_emitters("x")) == 1
    shoebox.clear_emitter("x")
    assert "x" not in shoebox.emitters
    assert "y" in shoebox.emitters
    shoebox.clear_emitters()
    assert len(shoebox.emitters) == 0
    with pytest.raises(KeyError):
        shoebox.get_emitter("x")


# ---------------------------------------------------------------------------
# define_trajectory shapes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", ["linear", "semicircular", "sine", "sawtooth", "random"])
def test_define_trajectory_shapes(shoebox, shape):
    duration, velocity, resolution = 2.0, 1.0, 2.0
    traj = shoebox.define_trajectory(duration=duration, velocity=velocity,
                                     resolution=resolution, shape=shape)
    assert traj.shape == (round(duration * resolution) + 1, 3)
    # Every waypoint is inside the room
    assert shoebox._validate_position(traj)
    # Per-step movement bounded by velocity/resolution (with a shape tolerance)
    steps = np.linalg.norm(np.diff(traj, axis=0), axis=1)
    assert steps.max() <= (velocity / resolution) * 2.0 + 1e-6


def test_define_trajectory_invalid_shape(shoebox):
    with pytest.raises(ValueError):
        shoebox.define_trajectory(duration=2.0, shape="zigzag")


def test_define_trajectory_invalid_start(shoebox):
    with pytest.raises(ValueError):
        shoebox.define_trajectory(duration=2.0, starting_position=[99, 99, 99])


def test_define_trajectory_fixed_start(shoebox):
    start = np.array([3.0, 2.0, 1.5])
    traj = shoebox.define_trajectory(duration=2.0, starting_position=start,
                                     shape="linear")
    np.testing.assert_allclose(traj[0], start, atol=1e-9)


# ---------------------------------------------------------------------------
# Predefined events (explicit trajectory + mesh waypoints)
# ---------------------------------------------------------------------------


@pytest.fixture
def fg(tmp_path):
    d = tmp_path / "fg" / "music"
    d.mkdir(parents=True)
    t = np.arange(SR * 2) / SR
    wav_write(d / "tone.wav",
              (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), SR)
    return tmp_path / "fg"


def test_scene_predefined_event_from_trajectory(fg):
    scene = Scene(duration=10.0, backend="shoebox",
                  backend_kwargs=dict(dimensions=[6, 4, 3], max_order=2,
                                      max_ir_length=0.1, seed=0),
                  fg_path=fg)
    scene.add_microphone(microphone_type="monocapsule", position=[3, 2, 1.5])
    traj = np.array([[1.5, 1.5, 1.5], [2.5, 2.0, 1.5], [3.5, 2.5, 1.5]])
    ev = scene.add_event(event_type="predefined", trajectory=traj,
                         scene_start=1.0, event_start=0.0, duration=2.0, snr=5.0)
    assert ev.is_moving
    assert len(ev.emitters) == 3
    np.testing.assert_allclose(ev.start_coordinates_absolute, traj[0])
    np.testing.assert_allclose(ev.end_coordinates_absolute, traj[-1])


def test_scene_predefined_requires_waypoints_or_trajectory(fg):
    scene = Scene(duration=10.0, backend="shoebox",
                  backend_kwargs=dict(dimensions=[6, 4, 3], max_order=2,
                                      max_ir_length=0.1, seed=0),
                  fg_path=fg)
    scene.add_microphone(microphone_type="monocapsule", position=[3, 2, 1.5])
    # Shoebox has no navigation waypoints and no trajectory was given
    with pytest.raises((ValueError, AttributeError)):
        scene.add_event(event_type="predefined")


def test_scene_predefined_invalid_trajectory_rejected(fg):
    scene = Scene(duration=10.0, backend="shoebox",
                  backend_kwargs=dict(dimensions=[6, 4, 3], max_order=2,
                                      max_ir_length=0.1, seed=0),
                  fg_path=fg)
    scene.add_microphone(microphone_type="monocapsule", position=[3, 2, 1.5])
    bad = np.array([[1.0, 1.0, 1.0], [99.0, 99.0, 99.0]])  # leaves the room
    with pytest.raises(ValueError):
        scene.add_event(event_type="predefined", trajectory=bad,
                        scene_start=1.0, event_start=0.0, duration=2.0, snr=5.0)


@pytest.fixture
def rlr_with_waypoints(tmp_path):
    mesh = box_mesh(extents=[6.0, 4.0, 3.0], center=[3.0, 2.0, 1.5])
    obj = tmp_path / "room.obj"
    with open(obj, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in mesh.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    wps = [
        {"waypoints": [[1.5, 1.5, 1.5], [2.5, 2.0, 1.5], [3.5, 2.5, 1.5]]},
        {"waypoints": [[4.5, 3.0, 1.5], [4.0, 2.0, 1.5]]},
        {"waypoints": [[90.0, 90.0, 90.0], [91.0, 91.0, 91.0]]},  # invalid, dropped
    ]
    wp_json = tmp_path / "room_waypoints.json"
    wp_json.write_text(json.dumps(wps))
    return WorldStateRLR(mesh=obj, waypoints_json=wp_json,
                        rlr_kwargs=dict(indirect_ray_count=256, indirect_ray_depth=8))


def test_rlr_waypoints_loaded(rlr_with_waypoints):
    # The out-of-mesh route is filtered out at load time
    assert len(rlr_with_waypoints.waypoints) == 2
    assert rlr_with_waypoints.waypoints[0].shape == (3, 3)


def test_scene_predefined_event_from_waypoints(fg, rlr_with_waypoints):
    scene = Scene(duration=10.0, backend=rlr_with_waypoints, fg_path=fg)
    scene.add_microphone(microphone_type="monocapsule", position=[3, 2, 1.5])
    ev = scene.add_event(event_type="predefined",
                         scene_start=1.0, event_start=0.0, duration=2.0, snr=5.0)
    assert ev.is_moving
    starts = [np.asarray(w[0]) for w in rlr_with_waypoints.waypoints]
    assert any(np.allclose(ev.start_coordinates_absolute, s) for s in starts)
