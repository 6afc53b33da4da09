"""Knife-edge diffraction for occluded direct paths (rlr `diffraction` flag).

Scene: a room split by a tall thin barrier with a gap above it; source and
listener on opposite sides. The diffracted component must (1) give finite
occluded-path energy, (2) attenuate high bands more than low bands (the
knife-edge frequency tilt), (3) arrive at the bent path's delay, and (4) match
the analytic Maekawa attenuation for the known edge geometry.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiblelight_tpu.geometry.mesh import TriMesh, box_mesh
from audiblelight_tpu.rir.raytracer import diffracted_path_ir, trace_rirs_multi

SR = 24000
C = 343.0


def _room_with_barrier():
    """An 8x4x3 room with a thin full-width barrier at x=4 up to z=2 (1 m gap
    at the top). Source at x=2, listener at x=6: direct path blocked, shortest
    detour bends over the barrier's top edge."""
    room = box_mesh(extents=[8.0, 4.0, 3.0], center=[4.0, 2.0, 1.5])
    v = []
    f = []
    # Barrier: a double-sided quad x=4, y in [0,4], z in [0,2]
    quad = np.array([[4.0, 0.0, 0.0], [4.0, 4.0, 0.0], [4.0, 4.0, 2.0], [4.0, 0.0, 2.0]])
    v.append(quad)
    f.append(np.array([[0, 1, 2], [0, 2, 3], [0, 2, 1], [0, 3, 2]]))
    barrier_v = np.concatenate(v)
    barrier_f = np.concatenate(f)
    verts = np.concatenate([room.vertices, barrier_v])
    faces = np.concatenate([room.faces, barrier_f + len(room.vertices)])
    return TriMesh(verts, faces.astype(np.int32))


SRC = np.array([2.0, 2.0, 1.2], np.float32)
LIS = np.array([[6.0, 2.0, 1.2]], np.float32)
BANDS = np.array([125.0, 500.0, 2000.0, 8000.0], np.float32)


@pytest.fixture(scope="module")
def barrier_ir():
    mesh = _room_with_barrier()
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    ir = np.asarray(
        diffracted_path_ir(
            tris, jnp.asarray(SRC), jnp.asarray(LIS), jnp.asarray(BANDS),
            n_samples=SR // 2, sr=SR,
        )
    )
    return ir


def test_occluded_pair_gets_finite_energy(barrier_ir):
    assert np.isfinite(barrier_ir).all()
    assert np.abs(barrier_ir).max() > 1e-6


def test_visible_pair_gets_zero():
    mesh = box_mesh(extents=[8.0, 4.0, 3.0], center=[4.0, 2.0, 1.5])
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    ir = np.asarray(
        diffracted_path_ir(
            tris, jnp.asarray(SRC), jnp.asarray(LIS), jnp.asarray(BANDS),
            n_samples=SR // 2, sr=SR,
        )
    )
    assert np.abs(ir).max() == 0.0


def test_arrival_at_bent_path_delay(barrier_ir):
    # Shortest detour: over the barrier's top edge at (4, 2, 2)
    edge = np.array([4.0, 2.0, 2.0])
    d1 = np.linalg.norm(edge - SRC)
    d2 = np.linalg.norm(LIS[0] - edge)
    expected = (d1 + d2) / C * SR
    peak = np.argmax(np.abs(barrier_ir[0]))
    # bend-candidate grid resolution limits precision; allow a few samples
    assert abs(peak - expected) < 0.02 * SR  # within 20 ms worth of samples? no:
    assert abs(peak - expected) < 80  # ~3.3 ms


def test_frequency_tilt_matches_maekawa(barrier_ir):
    """Band energies follow the Maekawa attenuation of the known edge within
    a few dB (bend-grid discretisation)."""
    edge = np.array([4.0, 2.0, 2.0])
    d1 = np.linalg.norm(edge - SRC)
    d2 = np.linalg.norm(LIS[0] - edge)
    d = np.linalg.norm(LIS[0] - SRC)
    delta = d1 + d2 - d

    spec = np.fft.rfft(barrier_ir[0])
    freqs = np.arange(len(spec)) * SR / len(barrier_ir[0])

    def band_mag(f0):
        sel = (freqs > f0 * 0.8) & (freqs < f0 * 1.25)
        return np.abs(spec[sel]).mean()

    mags = np.array([band_mag(f) for f in [250.0, 1000.0, 4000.0]])
    # monotone decreasing with frequency
    assert mags[0] > mags[1] > mags[2]

    # measured tilt vs analytic Maekawa prediction between 250 Hz and 4 kHz
    def maekawa_db(f):
        n = 2.0 * delta * f / C
        return 10.0 * np.log10(3.0 + 20.0 * n)

    measured_db = 20.0 * np.log10(mags[0] / mags[2])
    predicted_db = maekawa_db(4000.0) - maekawa_db(250.0)
    assert abs(measured_db - predicted_db) < 3.0


def test_trace_rirs_multi_diffraction_flag():
    """diffraction=True adds energy for the occluded pair; False leaves the
    direct window empty (tail-only)."""
    mesh = _room_with_barrier()
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    f = tris.shape[0]
    absor = jnp.full((f, len(BANDS)), 0.5, jnp.float32)
    scat = jnp.full((f,), 0.3, jnp.float32)
    kw = dict(
        n_samples=SR // 4, sr=SR, n_rays=128, max_depth=4, occlusion=True,
    )
    irs_on = np.asarray(
        trace_rirs_multi(
            jax.random.PRNGKey(0), tris, absor, scat,
            jnp.asarray(SRC[None]), jnp.asarray(LIS), diffraction=True, **kw
        )
    )
    irs_off = np.asarray(
        trace_rirs_multi(
            jax.random.PRNGKey(0), tris, absor, scat,
            jnp.asarray(SRC[None]), jnp.asarray(LIS), diffraction=False, **kw
        )
    )
    # The added component is exactly the diffracted arrival: same PRNG key, so
    # the stochastic tails cancel and the difference peaks at the bent path's
    # delay with finite energy.
    diff = irs_on[0, 0] - irs_off[0, 0]
    assert float(np.sum(diff**2)) > 1e-9
    edge = np.array([4.0, 2.0, 2.0])
    arrive = (np.linalg.norm(edge - SRC) + np.linalg.norm(LIS[0] - edge)) / C * SR
    peak = int(np.argmax(np.abs(diff)))
    assert abs(peak - arrive) < 80


def test_worldstate_diffraction_config(tmp_path):
    """The rlr config flag wires through WorldStateRLR."""
    from audiblelight_tpu.worldstate.mesh_backend import WorldStateRLR
    from audiblelight_tpu.micarrays import MonoCapsule

    mesh = _room_with_barrier()
    irs = {}
    for flag in (False, True):
        ws = WorldStateRLR(
            mesh=mesh, sample_rate=SR, seed=0,
            rlr_kwargs=dict(
                indirect_ray_count=128, indirect_ray_depth=4,
                max_ir_length=0.25, diffraction=flag,
            ),
        )
        ws.add_microphone(MonoCapsule, alias="m", position=LIS[0].tolist())
        ws.add_emitter(alias="s", position=SRC.tolist())
        ws.simulate()
        irs[flag] = ws.irs["m"]
    assert not np.allclose(irs[True], irs[False])
    assert np.sum(irs[True] ** 2) > np.sum(irs[False] ** 2)


# ---------------------------------------------------------------------------
# Multi-order diffraction (rlr `max_diffraction_order`)
# ---------------------------------------------------------------------------

def _room_two_barriers():
    """A 12x4x3 room with TWO full-width barriers: x=4 blocks z<2 (gap at the
    top), x=8 blocks z>1 (gap at the bottom). Source x=2, listener x=10: no
    single bend clears both (a bend on the bisecting plane x=6 high enough to
    clear A lands its listener leg inside B), but a 2-bend path over A then
    under B exists."""
    room = box_mesh(extents=[12.0, 4.0, 3.0], center=[6.0, 2.0, 1.5])
    quad_a = np.array([[4.0, 0, 0], [4.0, 4, 0], [4.0, 4, 2], [4.0, 0, 2]])
    quad_b = np.array([[8.0, 0, 1], [8.0, 4, 1], [8.0, 4, 3], [8.0, 0, 3]])
    f4 = np.array([[0, 1, 2], [0, 2, 3], [0, 2, 1], [0, 3, 2]])
    verts = np.concatenate([room.vertices, quad_a, quad_b])
    faces = np.concatenate(
        [room.faces, f4 + len(room.vertices), f4 + len(room.vertices) + 4]
    )
    return TriMesh(verts, faces.astype(np.int32))


SRC2 = np.array([2.0, 2.0, 1.2], np.float32)
LIS2 = np.array([[10.0, 2.0, 1.2]], np.float32)


def _diffr(mesh, order):
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    return np.asarray(
        diffracted_path_ir(
            tris, jnp.asarray(SRC2), jnp.asarray(LIS2), jnp.asarray(BANDS),
            n_samples=SR, sr=SR, order=order,
        )
    )


def test_double_barrier_needs_second_order():
    mesh = _room_two_barriers()
    ir1 = _diffr(mesh, order=1)
    ir4 = _diffr(mesh, order=4)
    # No single mid-plane bend clears both screens; two bends do.
    assert np.abs(ir1).max() == 0.0
    assert np.abs(ir4).max() > 1e-8
    # Arrival in the plausible 2-bend window: the continuous optimum is
    # ~8.4 m, the bend lattice finds <= ~10.5 m (vs 8 m direct).
    peak = int(np.argmax(np.abs(ir4[0])))
    assert 8.1 / C * SR < peak < 10.8 / C * SR


def test_single_barrier_order2_matches_order1_geometry():
    """On the single-barrier room, the graph search must find (approximately)
    the same over-the-top detour as the 1-bend search: arrival within a few
    ms and band tilt still monotone."""
    mesh = _room_with_barrier()
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    ir2 = np.asarray(
        diffracted_path_ir(
            tris, jnp.asarray(SRC), jnp.asarray(LIS), jnp.asarray(BANDS),
            n_samples=SR // 2, sr=SR, order=4,
        )
    )
    assert np.abs(ir2).max() > 1e-8
    edge = np.array([4.0, 2.0, 2.0])
    expected = (np.linalg.norm(edge - SRC) + np.linalg.norm(LIS[0] - edge)) / C * SR
    peak = int(np.argmax(np.abs(ir2[0])))
    assert abs(peak - expected) < 140  # lattice resolution
    spec = np.fft.rfft(ir2[0])
    freqs = np.arange(len(spec)) * SR / len(ir2[0])
    lo = np.abs(spec[(freqs > 200) & (freqs < 320)]).mean()
    hi = np.abs(spec[(freqs > 3200) & (freqs < 5000)]).mean()
    assert lo > hi  # knife-edge LF tilt survives multi-bend attenuation


def test_visible_pair_zero_any_order():
    mesh = box_mesh(extents=[12.0, 4.0, 3.0], center=[6.0, 2.0, 1.5])
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    ir = np.asarray(
        diffracted_path_ir(
            tris, jnp.asarray(SRC2), jnp.asarray(LIS2), jnp.asarray(BANDS),
            n_samples=SR // 2, sr=SR, order=3,
        )
    )
    assert np.abs(ir).max() == 0.0


def test_engine_config_diffraction_defaults_match_reference():
    """The engine defaults mirror the reference rlr serialisation:
    diffraction on, max_diffraction_order 10 (reference
    tests/test_worldstate_rlr.py:811,824)."""
    from audiblelight_tpu.worldstate.mesh_backend import WorldStateRLR

    ws = WorldStateRLR(
        mesh=box_mesh(extents=[4, 4, 3], center=[2, 2, 1.5]),
        sample_rate=SR, seed=0,
    )
    cfg = ws.cfg.to_dict()
    assert cfg["diffraction"] is True
    assert cfg["max_diffraction_order"] == 10
    # round-trips through to_dict/from_dict
    ws2 = WorldStateRLR(
        mesh=box_mesh(extents=[4, 4, 3], center=[2, 2, 1.5]),
        sample_rate=SR, seed=0,
        rlr_kwargs=dict(diffraction=True, max_diffraction_order=3),
    )
    assert ws2.cfg.to_dict()["max_diffraction_order"] == 3
