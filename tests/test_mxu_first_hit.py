"""MXU-formulated bounce first-hit (ops/mxu_first_hit.py).

Run in interpret mode on CPU: the matmuls execute in f32, so the comparison
against the exact XLA oracle is tight — the bf16 slop only appears on real
TPU hardware, where the design (relative barycentric margins + exact plane-t
re-evaluation) bounds its effect to face selection near edges.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from audiblelight_tpu.geometry.mesh import box_mesh, scanned_like_room
from audiblelight_tpu.geometry.queries import ray_mesh_first_hit
from audiblelight_tpu.ops.mxu_first_hit import (
    MXU_F_MAX,
    build_mxu_face_tables,
    mxu_first_hit,
)


def _rays(n, extents, seed=0, interior=True):
    rng = np.random.default_rng(seed)
    if interior:
        o = rng.uniform(0.25, 0.75, (n, 3)) * np.asarray(extents)
    else:
        o = rng.uniform(-2.0, -1.0, (n, 3))
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_matches_oracle_on_box():
    ext = [6.0, 4.0, 3.0]
    mesh = box_mesh(extents=ext, center=[3.0, 2.0, 1.5])
    tris = jnp.asarray(mesh.triangles, jnp.float32)
    o, d = _rays(700, ext)
    tables = build_mxu_face_tables(tris)
    t_m, i_m = mxu_first_hit(tables, o, d, interpret=True)
    t_x, i_x = ray_mesh_first_hit(o, d, tris)
    t_m, i_m, t_x, i_x = map(np.asarray, (t_m, i_m, t_x, i_x))
    assert np.isfinite(t_m).all()  # interior rays in a closed room always hit
    # Off shared edges the face choice must agree; near-edge rays may pick
    # either adjacent face (the documented EPS_UV slop).
    agree = i_m == i_x
    assert agree.mean() > 0.9
    np.testing.assert_allclose(t_m[agree], t_x[agree], rtol=2e-4, atol=2e-4)


def test_matches_oracle_on_scanned_lod():
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.8), seed=3).simplified(target_faces=2000)
    tris = jnp.asarray(mesh.triangles, jnp.float32)
    o, d = _rays(600, (5.0, 4.0, 2.8), seed=5)
    tables = build_mxu_face_tables(tris)
    t_m, i_m = mxu_first_hit(tables, o, d, interpret=True)
    t_x, i_x = ray_mesh_first_hit(o, d, tris)
    t_m, i_m, t_x, i_x = map(np.asarray, (t_m, i_m, t_x, i_x))
    hit_both = (i_m >= 0) & (i_x >= 0)
    assert hit_both.mean() > 0.99
    agree = hit_both & (i_m == i_x)
    assert agree.mean() > 0.78
    np.testing.assert_allclose(t_m[agree], t_x[agree], rtol=5e-4, atol=5e-4)


def test_hit_points_land_on_selected_plane():
    """The exact re-evaluation contract: o + t*d lies on the winner's plane."""
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.8), seed=7).simplified(target_faces=1500)
    tris = np.asarray(mesh.triangles, np.float32)
    o, d = _rays(400, (5.0, 4.0, 2.8), seed=11)
    tables = build_mxu_face_tables(jnp.asarray(tris))
    t, idx = mxu_first_hit(tables, o, d, interpret=True)
    t, idx = np.asarray(t), np.asarray(idx)
    hits = idx >= 0
    p = np.asarray(o)[hits] + t[hits, None] * np.asarray(d)[hits]
    a = tris[idx[hits], 0]
    n = np.cross(
        tris[idx[hits], 1] - tris[idx[hits], 0],
        tris[idx[hits], 2] - tris[idx[hits], 0],
    )
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    dist_to_plane = np.abs(np.sum((p - a) * n, axis=-1))
    assert dist_to_plane.max() < 1e-3


def test_escaping_rays_miss():
    mesh = box_mesh(extents=[2.0, 2.0, 2.0], center=[1.0, 1.0, 1.0])
    tables = build_mxu_face_tables(jnp.asarray(mesh.triangles, jnp.float32))
    o = jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    t, idx = mxu_first_hit(tables, o, d, interpret=True)
    assert np.isinf(np.asarray(t)[0]) and np.asarray(idx)[0] == -1


def test_ragged_ray_count_padding():
    mesh = box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    tris = jnp.asarray(mesh.triangles, jnp.float32)
    tables = build_mxu_face_tables(tris)
    o, d = _rays(301, (4.0, 3.0, 2.5), seed=2)  # not a multiple of the block
    t, idx = mxu_first_hit(tables, o, d, interpret=True)
    t_x, i_x = ray_mesh_first_hit(o, d, tris)
    agree = np.asarray(idx) == np.asarray(i_x)
    assert agree.mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(t)[agree], np.asarray(t_x)[agree], rtol=2e-4, atol=2e-4
    )


def test_face_budget_enforced():
    rng = np.random.default_rng(0)
    tris = jnp.asarray(rng.random((MXU_F_MAX + 1, 3, 3)), jnp.float32)
    with pytest.raises(ValueError):
        build_mxu_face_tables(tris)


def test_tracer_dispatch_is_cpu_safe():
    """On CPU the tracer must keep the exact XLA path (pallas unsupported)."""
    from audiblelight_tpu.rir.raytracer import _mxu_tables_for

    mesh = box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    tris = jnp.asarray(mesh.triangles, jnp.float32)
    assert _mxu_tables_for(tris, None, None) is None  # tests force JAX cpu


def test_prev_face_excluded():
    """A surface-origin ray never re-hits its launch face when masked."""
    mesh = box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    tris = np.asarray(mesh.triangles, np.float32)
    tables = build_mxu_face_tables(jnp.asarray(tris))
    # Launch from the centroid of face 0, along its (interior-flipped) normal
    a, b, c = tris[0]
    centroid = (a + b + c) / 3.0
    n = np.cross(b - a, c - a)
    n /= np.linalg.norm(n)
    interior = np.array([2.0, 1.5, 1.25], np.float32)
    if np.dot(interior - centroid, n) < 0:
        n = -n
    o = jnp.asarray(centroid[None], jnp.float32)
    d = jnp.asarray(n[None], jnp.float32)
    t0, i0 = mxu_first_hit(tables, o, d, jnp.asarray([0], jnp.int32), interpret=True)
    assert int(np.asarray(i0)[0]) != 0
    assert np.isfinite(np.asarray(t0)[0])  # hits the opposite wall instead
