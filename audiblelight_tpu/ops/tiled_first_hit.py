"""Reachability-culled first-hit for surface-origin ray wavefronts (Pallas TPU).

The tracer's bounce loop asks for the first hit of R rays whose ORIGINS sit on
mesh surfaces and whose DIRECTIONS are post-bounce (specular or cosine-diffuse)
— the regime where the uniform-grid DDA degenerates (grazing marches through
face-dense cells) and the dense kernels pay O(R*F) with no culling.

This kernel keeps the dense formulation's shape (VPU-friendly (8, LANES) tile
loops, exact Moller-Trumbore) but skips whole (ray block x face tile) pairs by
REACHABILITY:

- Build (host, once per mesh): faces sort by centroid Morton code into tiles
  of TILE_FACES; each tile stores its tight AABB. Morton order keeps tiles
  spatially compact, so the AABBs are small.
- Per call (device): rays sort by (coarse origin cell, direction-sign octant),
  so each kernel block holds rays with a tight origin AABB and coherent
  direction signs. Per block, the min/max of each direction component decide
  which per-axis half-space constraints apply: if every ray in the block has
  dx >= 0, points with x < min origin x are unreachable, so any tile entirely
  there is skipped (similarly for the other five signed axes). The test is
  conservative by construction — a mixed-sign axis simply contributes no
  constraint — and the tie rule (smallest ORIGINAL face index at equal t)
  matches the dense kernels, so results are exactly theirs.

Additionally, tiles visit in per-block distance-lower-bound order with an
early exit once every ray's best hit precedes the next tile's bound.

MEASURED OUTCOME (110k-face scanned room, 65k bounce rays, TPU v5e): exact
results, but wall time lands AT PAR with the dense streamed kernel (~0.9-1.2x)
— the 512-lane tiles lose the VPU op efficiency of the dense kernel's
4096-lane rows, and the early exit is governed by each block's WORST ray
(grazing rays keep whole blocks alive). Kept as an exact, tested alternative
(config.USE_TILED_FIRST_HIT); the tracer defaults to the dense kernel for
first hits and the azimuth-star kernel (a much stronger cull) for occlusion.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9
_BIG = 3.0e38

FH_LANES = 512  # rays per grid step
FACE_GROUP = 8
TILE_FACES = 256


@dataclass
class MeshTiles:
    """Morton-tiled face layout + per-tile AABBs (device arrays, static counts)."""

    face_tab: jnp.ndarray  # (n_tiles*TILE_FACES, 10): [a, e1, e2, orig_idx]
    tile_aabb: jnp.ndarray  # (6, n_tiles): xmin ymin zmin xmax ymax zmax
    n_tiles: int
    n_faces: int

    def __repr__(self):
        return f"MeshTiles(tiles={self.n_tiles}, faces={self.n_faces})"


jax.tree_util.register_pytree_node(
    MeshTiles,
    lambda m: ((m.face_tab, m.tile_aabb), (m.n_tiles, m.n_faces)),
    lambda aux, leaves: MeshTiles(*leaves, *aux),
)


def _morton3(ix: np.ndarray, iy: np.ndarray, iz: np.ndarray) -> np.ndarray:
    """Interleave three 10-bit integer grids into Morton codes."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return spread(ix) | (spread(iy) << np.uint64(1)) | (spread(iz) << np.uint64(2))


def build_mesh_tiles(tris: np.ndarray) -> MeshTiles | None:
    """Host build: Morton-sort valid faces, tile, record tight per-tile AABBs."""
    tris = np.asarray(tris, dtype=np.float32)
    finite = np.all(np.abs(tris) < 1.0e8, axis=(1, 2))
    area = np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    )
    valid = np.nonzero(finite & (area > 0))[0]
    if len(valid) == 0:
        return None
    vt = tris[valid]

    cen = vt.mean(axis=1)
    lo = cen.min(axis=0)
    span = np.maximum(cen.max(axis=0) - lo, 1e-6)
    g = np.clip(((cen - lo) / span) * 1023.0, 0, 1023).astype(np.uint32)
    order = np.argsort(_morton3(g[:, 0], g[:, 1], g[:, 2]), kind="stable")

    vt = vt[order]
    orig = valid[order].astype(np.float32)

    n = len(vt)
    n_tiles = -(-n // TILE_FACES)
    pad = n_tiles * TILE_FACES - n

    a = vt[:, 0]
    rows = np.zeros((n + pad, 10), np.float32)
    rows[:n, 0:3] = a
    rows[:n, 3:6] = vt[:, 1] - a
    rows[:n, 6:9] = vt[:, 2] - a
    rows[:n, 9] = orig
    rows[n:, 9] = -1.0  # degenerate padding, never hits

    aabb = np.empty((6, n_tiles), np.float32)
    for t in range(n_tiles):
        blk = vt[t * TILE_FACES : (t + 1) * TILE_FACES]
        aabb[0:3, t] = blk.min(axis=(0, 1))
        aabb[3:6, t] = blk.max(axis=(0, 1))

    return MeshTiles(
        face_tab=jnp.asarray(rows),
        tile_aabb=jnp.asarray(aabb),
        n_tiles=n_tiles,
        n_faces=int(tris.shape[0]),
    )


DONE_CHECK_EVERY = 4  # tiles between early-exit re-evaluations


def _fh_kernel(
    n_tiles,
    aabb_ref,  # SMEM (6, n_tiles)
    bmeta_ref,  # SMEM (12, n_blocks): omin(3) omax(3) dmin(3) dmax(3)
    perm_ref,  # SMEM (8, n_tiles): 8-block group of distance-ascending orders
    dlo_ref,  # SMEM (8, n_tiles): matching ascending distance lower bounds
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (1, L)
    face_ref,  # (n_tiles*TILE_FACES, 10) VMEM
    t_out_ref, idx_out_ref,
    best_t_ref, best_i_ref,  # VMEM scratch (FACE_GROUP, FH_LANES)
    done_ref,  # SMEM scratch (1, 1) int32: early-exit flag
):
    g = pl.program_id(0)
    row = g - (g // 8) * 8  # this block's row within its 8-block perm group
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    om = [bmeta_ref[i, g] for i in range(3)]
    oM = [bmeta_ref[3 + i, g] for i in range(3)]
    dm = [bmeta_ref[6 + i, g] for i in range(3)]
    dM = [bmeta_ref[9 + i, g] for i in range(3)]

    shape = (FACE_GROUP, FH_LANES)
    best_t_ref[:] = jnp.full(shape, _BIG, jnp.float32)
    best_i_ref[:] = jnp.full(shape, jnp.int32(2**30))
    done_ref[0, 0] = 0

    def tile(i, _):
        # Tiles visit in ascending distance-lower-bound order; once every
        # ray's resolved hit precedes the next tile's bound, the rest of the
        # mesh cannot improve any ray and every remaining iteration reduces
        # to this one scalar test.
        @pl.when(done_ref[0, 0] == 0)
        def _():
            tl = perm_ref[row, i]
            # Reachability: a tile wholly behind every ray on any axis skips.
            reachable = True
            for ax in range(3):
                lo = aabb_ref[ax, tl]
                hi = aabb_ref[3 + ax, tl]
                reachable = reachable & ~((dm[ax] >= 0.0) & (hi < om[ax]))
                reachable = reachable & ~((dM[ax] <= 0.0) & (lo > oM[ax]))

            @pl.when(reachable)
            def _():
                def group(gi, c):
                    bt, bi = c
                    rows = pl.ds(tl * TILE_FACES + gi * FACE_GROUP, FACE_GROUP)
                    ax_ = face_ref[rows, 0:1]
                    ay_ = face_ref[rows, 1:2]
                    az_ = face_ref[rows, 2:3]
                    e1x = face_ref[rows, 3:4]
                    e1y = face_ref[rows, 4:5]
                    e1z = face_ref[rows, 5:6]
                    e2x = face_ref[rows, 6:7]
                    e2y = face_ref[rows, 7:8]
                    e2z = face_ref[rows, 8:9]
                    fid = face_ref[rows, 9:10]

                    hx = dy * e2z - dz * e2y
                    hy = dz * e2x - dx * e2z
                    hz = dx * e2y - dy * e2x
                    det = e1x * hx + e1y * hy + e1z * hz
                    ok = jnp.abs(det) > _EPS
                    inv = 1.0 / jnp.where(ok, det, 1.0)
                    sx = ox - ax_
                    sy = oy - ay_
                    sz = oz - az_
                    u = inv * (sx * hx + sy * hy + sz * hz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = inv * (dx * qx + dy * qy + dz * qz)
                    t = inv * (e2x * qx + e2y * qy + e2z * qz)
                    hit = (
                        ok
                        & (u >= -_EPS)
                        & (u <= 1.0 + _EPS)
                        & (v >= -_EPS)
                        & (u + v <= 1.0 + _EPS)
                        & (t > _EPS)
                        & (fid >= 0.0)
                    )
                    t_hit = jnp.where(hit, t, _BIG)
                    fidx = jnp.where(hit, fid.astype(jnp.int32), jnp.int32(2**30))
                    better = (t_hit < bt) | ((t_hit == bt) & (fidx < bi))
                    return jnp.where(better, t_hit, bt), jnp.where(better, fidx, bi)

                bt, bi = jax.lax.fori_loop(
                    0, TILE_FACES // FACE_GROUP, group, (best_t_ref[:], best_i_ref[:])
                )
                best_t_ref[:] = bt
                best_i_ref[:] = bi

            @pl.when((i % DONE_CHECK_EVERY) == (DONE_CHECK_EVERY - 1))
            def _():
                # worst-resolved ray: max over rays of (min over sublanes)
                worst = jnp.max(jnp.min(best_t_ref[:], axis=0))
                nxt = dlo_ref[row, jnp.minimum(i + 1, n_tiles - 1)]
                hit_all = worst < _BIG
                done_ref[0, 0] = jnp.where(
                    hit_all & ((worst <= nxt) | (i + 1 >= n_tiles)), 1, 0
                )

        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)
    best_t = best_t_ref[:]
    best_i = best_i_ref[:]

    # Cross-sublane resolve: min t, then smallest original index on ties
    t_min = jnp.min(best_t, axis=0, keepdims=True)
    idx = jnp.min(
        jnp.where(best_t == t_min, best_i, jnp.int32(2**30)), axis=0, keepdims=True
    )
    t_out_ref[:] = t_min
    idx_out_ref[:] = jnp.where(t_min >= _BIG, -1, idx)


@partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _fh_call(face_tab, tile_aabb, n_tiles, o, d, bmeta, perm, dlo, interpret=False):
    r_pad = o.shape[0]
    comp = lambda x, i: x[:, i].reshape(1, -1)
    ray_spec = pl.BlockSpec((1, FH_LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    n_t = perm.shape[1]
    return pl.pallas_call(
        partial(_fh_kernel, n_tiles),
        grid=(r_pad // FH_LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # tile AABBs, whole
            pl.BlockSpec(memory_space=pltpu.SMEM),  # block metas, whole
            # TPU blocks need 8-divisible penultimate dims: deliver perm/dlo
            # in 8-block-row groups; the kernel picks row g % 8.
            pl.BlockSpec((8, n_t), lambda g: (g // 8, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((8, n_t), lambda g: (g // 8, 0), memory_space=pltpu.SMEM),
        ]
        + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((FACE_GROUP, FH_LANES), jnp.float32),
            pltpu.VMEM((FACE_GROUP, FH_LANES), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_aabb, bmeta, perm, dlo, comp(o, 0), comp(o, 1), comp(o, 2),
      comp(d, 0), comp(d, 1), comp(d, 2), face_tab)


@partial(jax.jit, static_argnames=("interpret",))
def tiled_first_hit(
    tiles: MeshTiles, origins: jnp.ndarray, dirs: jnp.ndarray, interpret: bool = False
):
    """First-hit (t, original_face_idx); exactly matches the dense kernels.

    Rays sort by (coarse origin cell, direction-sign octant) so kernel blocks
    get tight origin AABBs and sign-coherent directions — the inputs the
    per-axis reachability cull needs.
    """
    origins = jnp.atleast_2d(origins).astype(jnp.float32)
    dirs = jnp.atleast_2d(dirs).astype(jnp.float32)
    r = origins.shape[0]

    # Sort key: direction-sign octant MAJOR, coarse origin cell minor. The
    # octant must own the high bits — per-block sign coherence is what turns
    # the per-axis constraints on; blocks then subdivide each octant's rays by
    # origin locality (16x16x8 cells over the wavefront's own AABB).
    lo = jnp.min(origins, axis=0)
    span = jnp.maximum(jnp.max(origins, axis=0) - lo, 1e-6)
    cell = ((origins - lo) / span * jnp.asarray([15.999, 15.999, 7.999])).astype(
        jnp.int32
    )
    octant = (
        (dirs[:, 0] >= 0).astype(jnp.int32)
        + 2 * (dirs[:, 1] >= 0).astype(jnp.int32)
        + 4 * (dirs[:, 2] >= 0).astype(jnp.int32)
    )
    key = octant * 2048 + ((cell[:, 0] * 16 + cell[:, 1]) * 8 + cell[:, 2])
    order = jnp.argsort(key)

    packed = jnp.concatenate([origins, dirs], axis=1)[order]  # one row gather
    r_pad = max(FH_LANES, -(-r // FH_LANES) * FH_LANES)
    pad_rows = jnp.broadcast_to(packed[-1:], (r_pad - r, 6))
    packed = jnp.concatenate([packed, pad_rows], axis=0)
    o = packed[:, 0:3]
    d = packed[:, 3:6]

    ob = o.reshape(-1, FH_LANES, 3)
    db = d.reshape(-1, FH_LANES, 3)
    omin = ob.min(axis=1)
    omax = ob.max(axis=1)
    bmeta = jnp.concatenate(
        [omin, omax, db.min(axis=1), db.max(axis=1)], axis=1
    ).T  # (12, n_blocks)

    # Per-block tile visit order by distance lower bound (origin AABB to tile
    # AABB, componentwise gap), ascending — feeds the kernel's early exit.
    t_lo = tiles.tile_aabb[0:3].T  # (n_tiles, 3)
    t_hi = tiles.tile_aabb[3:6].T
    gap = jnp.maximum(
        0.0,
        jnp.maximum(
            t_lo[None, :, :] - omax[:, None, :], omin[:, None, :] - t_hi[None, :, :]
        ),
    )  # (n_blocks, n_tiles, 3)
    dlo = jnp.linalg.norm(gap, axis=-1)
    perm = jnp.argsort(dlo, axis=1).astype(jnp.int32)
    dlo_sorted = jnp.take_along_axis(dlo, perm, axis=1).astype(jnp.float32)
    # Pad the block axis to a multiple of 8 for the SMEM group delivery
    nb = perm.shape[0]
    nb_pad = -(-nb // 8) * 8
    perm = jnp.pad(perm, ((0, nb_pad - nb), (0, 0)))
    dlo_sorted = jnp.pad(dlo_sorted, ((0, nb_pad - nb), (0, 0)))

    t, idx = _fh_call(
        tiles.face_tab, tiles.tile_aabb, tiles.n_tiles, o, d, bmeta,
        perm, dlo_sorted, interpret,
    )
    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    t = jnp.where(t >= _BIG, jnp.inf, t)

    inv = jnp.zeros(r, dtype=jnp.int32).at[order].set(jnp.arange(r, dtype=jnp.int32))
    return t[inv], jnp.where(jnp.isinf(t), -1, idx)[inv]


__all__ = ["MeshTiles", "build_mesh_tiles", "tiled_first_hit"]
