"""Interpret-mode checks for the cone-sorted first-hit kernel.

The sorted kernel's per-pair algebra is IDENTICAL to the dense big kernel
(ops.pallas_kernels._first_hit_big_kernel), its entry bounds are conservative
and its tie rule is "smallest sorted face index" — so results must match the
dense kernel, run over the same Morton-sorted face order, bit for bit. A real
room (box + scanned) and surface-origin wavefront shapes mirror the tracer's
actual query pattern.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audiblelight_tpu.geometry.mesh import box_mesh, scanned_like_room
from audiblelight_tpu.ops.pallas_kernels import ray_first_hit_pallas
from audiblelight_tpu.ops.sorted_first_hit import (
    SFH_LANES,
    build_sorted_tiles,
    sorted_first_hit,
)


def _sorted_tris(tris_np, order, n_tiles):
    """The padded, Morton-sorted triangle array the kernel's indices refer to."""
    from audiblelight_tpu.ops.sorted_first_hit import TILE_FACES

    vt = tris_np[order]
    pad = n_tiles * TILE_FACES - len(vt)
    return np.pad(vt, ((0, pad), (0, 0), (0, 0)))


def _check(tris_np, origins, dirs, alive=None):
    tiles, order = build_sorted_tiles(tris_np)
    st = _sorted_tris(tris_np, order, tiles.n_tiles)
    t_s, i_s = sorted_first_hit(
        tiles, jnp.asarray(origins), jnp.asarray(dirs),
        alive=None if alive is None else jnp.asarray(alive),
        interpret=True,
    )
    t_d, i_d = ray_first_hit_pallas(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(st), interpret=True
    )
    t_s, i_s, t_d, i_d = map(np.asarray, (t_s, i_s, t_d, i_d))
    if alive is not None:
        live = np.asarray(alive)
        assert np.all(np.isinf(t_s[~live])) and np.all(i_s[~live] == -1)
        t_s, i_s, t_d, i_d = t_s[live], i_s[live], t_d[live], i_d[live]
    # The sorted kernel's face table is built on the host (numpy f32) while
    # the dense kernel builds its table in-graph; XLA's FMA fusion rounds the
    # precomputed triple-product constants differently at the last ULP, so t
    # agrees to f32 rounding (grazing hits amplify it by 1/det) and idx may
    # flip only on razor ties.
    np.testing.assert_allclose(t_s, t_d, rtol=2e-3, atol=1e-5)
    disagree = i_s != i_d
    assert disagree.mean() <= 0.005, f"{disagree.sum()} idx mismatches"
    if disagree.any():
        np.testing.assert_allclose(t_s[disagree], t_d[disagree], rtol=1e-4, atol=1e-5)


def _wavefront(rng, mesh, n):
    """Surface-origin rays: points just off random faces, random directions
    (the bounce loop's exact query distribution)."""
    tris = mesh.triangles.astype(np.float32)
    fi = rng.integers(0, len(tris), n)
    w = rng.dirichlet([1, 1, 1], n).astype(np.float32)
    pts = np.einsum("nk,nkd->nd", w, tris[fi])
    nrm = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (pts + 1e-4 * nrm[fi]).astype(np.float32), d


def test_sorted_first_hit_box_interior():
    rng = np.random.default_rng(0)
    mesh = box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    origins = rng.uniform(0.3, 1.8, (SFH_LANES + 37, 3)).astype(np.float32)
    d = rng.standard_normal((len(origins), 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    _check(mesh.triangles.astype(np.float32), origins, d)


def test_sorted_first_hit_scanned_wavefront():
    rng = np.random.default_rng(1)
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.7), seed=3, subdivision_levels=3)
    origins, dirs = _wavefront(rng, mesh, 700)
    _check(mesh.triangles.astype(np.float32), origins, dirs)


def test_sorted_first_hit_dead_lanes_and_padding():
    rng = np.random.default_rng(2)
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.7), seed=3, subdivision_levels=3)
    origins, dirs = _wavefront(rng, mesh, 300)
    alive = rng.uniform(size=300) < 0.6
    _check(mesh.triangles.astype(np.float32), origins, dirs, alive=alive)


def test_sorted_first_hit_escaping_rays():
    mesh = box_mesh(extents=[2.0, 2.0, 2.0], center=[1.0, 1.0, 1.0])
    tiles, order = build_sorted_tiles(mesh.triangles.astype(np.float32))
    origins = np.array([[5.0, 5.0, 5.0], [1.0, 1.0, 1.0]], np.float32)
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], np.float32)
    t, idx = sorted_first_hit(
        tiles, jnp.asarray(origins), jnp.asarray(dirs), interpret=True
    )
    t, idx = np.asarray(t), np.asarray(idx)
    assert np.isinf(t[0]) and idx[0] == -1  # outside, pointing away
    assert np.isfinite(t[1]) and idx[1] >= 0  # interior ray hits the ceiling
    np.testing.assert_allclose(t[1], 1.0, atol=1e-5)


def test_build_sorted_tiles_order_maps_attributes():
    mesh = scanned_like_room(extents=(5.0, 4.0, 2.7), seed=3, subdivision_levels=3)
    tris = mesh.triangles.astype(np.float32)
    tiles, order = build_sorted_tiles(tris)
    # order maps sorted position -> original face: centroids must agree with
    # the tile AABBs they were binned into
    cen = tris[order].mean(axis=1) - np.asarray(tiles.center)
    from audiblelight_tpu.ops.sorted_first_hit import TILE_FACES

    for ti in range(tiles.n_tiles):
        blk = cen[ti * TILE_FACES : (ti + 1) * TILE_FACES]
        if len(blk) == 0:
            continue
        lo = np.asarray(tiles.tile_lo)[ti] - 1e-5
        hi = np.asarray(tiles.tile_hi)[ti] + 1e-5
        assert (blk >= lo).all() and (blk <= hi).all()
