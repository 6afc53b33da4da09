"""Interpret-mode checks for the per-ray pair-walk first hit.

Same parity contract as tests/test_sorted_first_hit.py: identical per-pair
algebra to the dense big kernel over the Morton-sorted face order, exact
nearest-hit semantics at ANY ray/mesh configuration (the round loop is
provably conservative), smallest-index tie rule.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audiblelight_tpu.geometry.mesh import box_mesh, scanned_like_room
from audiblelight_tpu.ops.pallas_kernels import ray_first_hit_pallas
from audiblelight_tpu.ops.pair_first_hit import build_sorted_tiles, pair_first_hit
from tests.test_sorted_first_hit import _sorted_tris, _wavefront


def _check(tris_np, origins, dirs, alive=None, k_slots=4):
    tiles, order = build_sorted_tiles(tris_np)
    st = _sorted_tris(tris_np, order, tiles.n_tiles)
    t_s, i_s = pair_first_hit(
        tiles, jnp.asarray(origins), jnp.asarray(dirs),
        alive=None if alive is None else jnp.asarray(alive),
        k_slots=k_slots, interpret=True,
    )
    t_d, i_d = ray_first_hit_pallas(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(st), interpret=True
    )
    t_s, i_s, t_d, i_d = map(np.asarray, (t_s, i_s, t_d, i_d))
    if alive is not None:
        live = np.asarray(alive)
        assert np.all(np.isinf(t_s[~live])) and np.all(i_s[~live] == -1)
        t_s, i_s, t_d, i_d = t_s[live], i_s[live], t_d[live], i_d[live]
    both_inf = np.isinf(t_s) & np.isinf(t_d)
    np.testing.assert_allclose(
        np.where(both_inf, 0, t_s), np.where(both_inf, 0, t_d),
        rtol=2e-3, atol=1e-5,
    )
    disagree = i_s != i_d
    assert disagree.mean() <= 0.005, f"{disagree.sum()} idx mismatches"


def test_pair_first_hit_box_interior():
    rng = np.random.default_rng(0)
    mesh = box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    origins = rng.uniform(0.3, 1.8, (700, 3)).astype(np.float32)
    d = rng.standard_normal((700, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    _check(mesh.triangles.astype(np.float32), origins, d, k_slots=2)


def test_pair_first_hit_scanned_wavefront():
    rng = np.random.default_rng(1)
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.7), seed=3, subdivision_levels=3)
    origins, dirs = _wavefront(rng, mesh, 700)
    _check(mesh.triangles.astype(np.float32), origins, dirs, k_slots=4)


def test_pair_first_hit_small_k_forces_rounds():
    """k_slots=1 exercises the while-loop resolution path heavily and must
    still be exact."""
    rng = np.random.default_rng(2)
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.7), seed=3, subdivision_levels=3)
    origins, dirs = _wavefront(rng, mesh, 256)
    _check(mesh.triangles.astype(np.float32), origins, dirs, k_slots=1)


def test_pair_first_hit_dead_lanes():
    rng = np.random.default_rng(3)
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.7), seed=3, subdivision_levels=3)
    origins, dirs = _wavefront(rng, mesh, 300)
    alive = rng.uniform(size=300) < 0.6
    _check(mesh.triangles.astype(np.float32), origins, dirs, alive=alive)


def test_pair_first_hit_escaping_rays():
    mesh = box_mesh(extents=[2.0, 2.0, 2.0], center=[1.0, 1.0, 1.0])
    tiles, _ = build_sorted_tiles(mesh.triangles.astype(np.float32))
    origins = np.array([[5.0, 5.0, 5.0], [1.0, 1.0, 1.0]], np.float32)
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    t, idx = pair_first_hit(
        tiles, jnp.asarray(origins), jnp.asarray(dirs), interpret=True
    )
    t, idx = np.asarray(t), np.asarray(idx)
    assert np.isinf(t[0]) and idx[0] == -1
    assert np.isfinite(t[1]) and idx[1] >= 0
    np.testing.assert_allclose(t[1], 1.0, atol=1e-5)
