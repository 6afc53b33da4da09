"""Reachability-culled first-hit: agreement with the dense path.

Index equality is exact (the tie rule compares ORIGINAL face indices through
the Morton reorder); t agrees to float32 ulps on CPU interpret mode, where FMA
contraction differs from the XLA formulation (on TPU the kernel shares the
dense Pallas kernels' scalar-expanded arithmetic).
"""

import numpy as np
import jax.numpy as jnp

from audiblelight_tpu.geometry.mesh import scanned_like_room
from audiblelight_tpu.geometry.queries import _ray_mesh_first_hit_xla
from audiblelight_tpu.ops.tiled_first_hit import build_mesh_tiles, tiled_first_hit


def test_tiled_first_hit_matches_dense():
    tris = scanned_like_room(seed=4).triangles
    tiles = build_mesh_tiles(np.asarray(tris))
    assert tiles.n_tiles > 100

    rng = np.random.default_rng(3)
    R = 1200
    orig = np.float32(rng.uniform([0.3, 0.3, 0.2], [6.7, 4.7, 2.8], size=(R, 3)))
    d = rng.normal(size=(R, 3))
    d = np.float32(d / np.linalg.norm(d, axis=-1, keepdims=True))

    t_t, i_t = tiled_first_hit(tiles, jnp.asarray(orig), jnp.asarray(d), interpret=True)
    t_x, i_x = _ray_mesh_first_hit_xla(jnp.asarray(orig), jnp.asarray(d), jnp.asarray(tris))
    t_t, i_t, t_x, i_x = map(np.asarray, (t_t, i_t, t_x, i_x))

    np.testing.assert_array_equal(i_t, i_x)
    both = np.isfinite(t_t) & np.isfinite(t_x)
    assert (np.isfinite(t_t) == np.isfinite(t_x)).all()
    np.testing.assert_allclose(t_t[both], t_x[both], rtol=2e-6)


def test_tiled_first_hit_surface_origin_regime():
    """Bounce-style rays: origins ON faces, reflected directions."""
    tris = np.asarray(scanned_like_room(seed=5).triangles)
    tiles = build_mesh_tiles(tris)

    rng = np.random.default_rng(4)
    R = 600
    orig0 = np.float32(rng.uniform([0.4, 0.4, 0.3], [6.6, 4.6, 2.7], size=(R, 3)))
    d0 = rng.normal(size=(R, 3))
    d0 = np.float32(d0 / np.linalg.norm(d0, axis=-1, keepdims=True))
    t0, f0 = map(np.asarray, _ray_mesh_first_hit_xla(
        jnp.asarray(orig0), jnp.asarray(d0), jnp.asarray(tris)))
    hit = orig0 + t0[:, None] * d0
    v = tris[np.maximum(f0, 0)]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    n = np.where((np.sum(n * d0, axis=-1) > 0)[:, None], -n, n)
    refl = d0 - 2 * np.sum(d0 * n, axis=-1, keepdims=True) * n
    o2 = np.float32(hit + 1e-4 * n)
    refl = np.float32(refl)

    t_t, i_t = tiled_first_hit(tiles, jnp.asarray(o2), jnp.asarray(refl), interpret=True)
    t_x, i_x = _ray_mesh_first_hit_xla(jnp.asarray(o2), jnp.asarray(refl), jnp.asarray(tris))
    t_t, i_t, t_x, i_x = map(np.asarray, (t_t, i_t, t_x, i_x))
    np.testing.assert_array_equal(i_t, i_x)
    both = np.isfinite(t_t) & np.isfinite(t_x)
    np.testing.assert_allclose(t_t[both], t_x[both], rtol=2e-6)
