"""Cone-sorted, entry-ordered first hit: the tracer's "TPU BVH".

The bounce loop's dominant cost is the nearest-hit query of an 80k-ray
surface-origin wavefront against the room mesh. The dense streaming kernel
(ops.pallas_kernels) pays O(R*F) with no culling — ~170 ms/bounce on a
110k-face scanned room — where the reference's C++ rlr engine walks a BVH
per ray (reference audiblelight/worldstate.py:2148-2181). Per-ray pointer
chasing is the wrong shape for a vector machine, so this kernel recovers the
BVH's work savings with *sorted wavefront coherence* instead of recursion:

1.  Build (host, once per mesh): faces sort by centroid Morton code into
    tiles of TILE_FACES with tight AABBs (spatially compact by construction).
    The face table stores the same precomputed bilinear Moller-Trumbore
    columns as the dense kernel, centered on the mesh (identical algebra =>
    identical f32 results).
2.  Per call: rays sort by (coarse origin cell, direction cone): rays in a
    kernel block then share a tight origin AABB *and* a narrow direction
    cone. Dead rays sort to the end and resolve instantly, so late bounces
    with a collapsed wavefront cost only their live fraction (free,
    unbiased "compaction" — no Russian-roulette thinning needed).
3.  Per (block, tile), a conservative DIRECTED entry bound via interval
    arithmetic over the block's origin/direction ranges: the earliest time
    any ray in the block could reach the tile (+inf when the cone cannot
    reach it at all). Tiles visit in ascending bound order.
4.  The kernel keeps a running per-ray best hit and exits the tile walk as
    soon as every live ray's resolved hit precedes the next tile's entry
    bound — the per-ray early exit a BVH gets from ordered traversal,
    recovered at block granularity. Because blocks are cone-coherent, their
    hits cluster in a handful of tiles: the walk typically touches a few %
    of the mesh instead of all of it.

Exactness: results match the dense kernel on the same (Morton-sorted) face
order bit-for-bit — the per-pair algebra is identical, the entry bounds are
conservative, and ties resolve to the smallest face index. Callers must
index per-face attributes in the SORTED order (build returns the
permutation); the tracer permutes its absorption/scattering/normal tables
once per mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9
_BIG = 3.0e38
_IDX_BIG = 2**30

TILE_FACES = 256
FACE_GROUP = 8
SFH_LANES = 512  # rays per kernel block

# Sort-key granularity: coarse origin cells x direction bins. Sized so the
# number of (cell, cone) groups is comparable to the number of 512-ray blocks
# of a production wavefront (~80k rays -> 156 blocks): finer keys cost sort
# entropy without tightening per-block bounds further.
AZ_BINS = 8
EL_BINS = 2
CELL_BITS = (2, 2, 1)  # 4 x 4 x 2 = 32 origin cells


class SortedTiles(NamedTuple):
    """Morton-tiled bilinear face table + per-tile AABBs (device arrays)."""

    face_tab: jnp.ndarray  # (n_tiles*TILE_FACES, 16) centered bilinear columns
    tile_lo: jnp.ndarray  # (n_tiles, 3) AABB minima (centered coordinates)
    tile_hi: jnp.ndarray  # (n_tiles, 3) AABB maxima
    center: jnp.ndarray  # (3,) centering translation baked into face_tab
    room_lo: jnp.ndarray  # (3,) wavefront-domain minima (centered)
    room_span: jnp.ndarray  # (3,) wavefront-domain extents
    n_tiles: int
    n_faces: int  # valid (sorted) face count, before tile padding

    def __repr__(self):  # pragma: no cover - logging convenience
        return f"SortedTiles(tiles={self.n_tiles}, faces={self.n_faces})"


jax.tree_util.register_pytree_node(
    SortedTiles,
    lambda s: (
        (s.face_tab, s.tile_lo, s.tile_hi, s.center, s.room_lo, s.room_span),
        (s.n_tiles, s.n_faces),
    ),
    lambda aux, leaves: SortedTiles(*leaves, *aux),
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


def build_sorted_tiles(tris: np.ndarray) -> tuple["SortedTiles | None", np.ndarray]:
    """Host build: Morton-sort valid faces, tile, precompute bilinear columns.

    Returns (tiles, order): `order` maps sorted position -> ORIGINAL face
    index, so per-face attribute tables permute as `attr[order]` (padded tail
    rows, if any, never hit — their all-zero columns give det == 0).
    """
    tris = np.asarray(tris, dtype=np.float32)
    finite = np.all(np.abs(tris) < 1.0e8, axis=(1, 2))
    area = np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1
    )
    order = np.nonzero(finite & (area > 0))[0]
    if len(order) == 0:
        return None, order
    vt = tris[order]

    cen = vt.mean(axis=1)
    lo = cen.min(axis=0)
    span = np.maximum(cen.max(axis=0) - lo, 1e-6)
    g = np.clip(((cen - lo) / span) * 1023.0, 0, 1023).astype(np.uint32)
    morton = np.argsort(_morton3(g[:, 0], g[:, 1], g[:, 2]), kind="stable")
    vt = vt[morton]
    order = order[morton]

    n = len(vt)
    n_tiles = -(-n // TILE_FACES)
    pad = n_tiles * TILE_FACES - n

    # Centered coordinates bound the f32 cancellation in the precomputed
    # triple-product constants (see pallas_kernels._first_hit_big_kernel —
    # identical construction, so results match that kernel bitwise).
    vmin = vt.reshape(-1, 3).min(axis=0)
    vmax = vt.reshape(-1, 3).max(axis=0)
    center = 0.5 * (vmin + vmax)

    av = vt[:, 0] - center
    e1 = vt[:, 1] - vt[:, 0]
    e2 = vt[:, 2] - vt[:, 0]
    w1 = np.cross(av, e1)
    w2 = np.cross(av, e2)
    nrm = np.cross(e1, e2)
    kk = np.sum(av * nrm, axis=-1)
    tab = np.concatenate([e2, w2, -e1, -w1, -nrm, -kk[:, None]], axis=1).astype(
        np.float32
    )  # (n, 16)
    tab = np.pad(tab, ((0, pad), (0, 0)))  # zero rows: det == 0, never hit

    vt_c = vt - center
    tl = np.empty((n_tiles, 3), np.float32)
    th = np.empty((n_tiles, 3), np.float32)
    for t in range(n_tiles):
        blk = vt_c[t * TILE_FACES : (t + 1) * TILE_FACES]
        tl[t] = blk.min(axis=(0, 1))
        th[t] = blk.max(axis=(0, 1))

    tiles = SortedTiles(
        face_tab=jnp.asarray(tab),
        tile_lo=jnp.asarray(tl),
        tile_hi=jnp.asarray(th),
        center=jnp.asarray(center.astype(np.float32)),
        room_lo=jnp.asarray((vmin - center).astype(np.float32)),
        room_span=jnp.asarray(np.maximum(vmax - vmin, 1e-6).astype(np.float32)),
        n_tiles=int(n_tiles),
        n_faces=int(n),
    )
    return tiles, order


def _sort_keys(o_c: jnp.ndarray, d: jnp.ndarray, alive, tiles: SortedTiles):
    """(cell, cone) sort keys; dead rays key past every live group."""
    az = jnp.arctan2(d[:, 1], d[:, 0])  # [-pi, pi]
    azb = jnp.clip(
        ((az * (0.5 / jnp.pi) + 0.5) * AZ_BINS).astype(jnp.int32), 0, AZ_BINS - 1
    )
    elb = jnp.clip(
        ((d[:, 2] * 0.5 + 0.5) * EL_BINS).astype(jnp.int32), 0, EL_BINS - 1
    )
    rel = (o_c - tiles.room_lo) / tiles.room_span
    nx, ny, nz = (1 << b for b in CELL_BITS)
    cx = jnp.clip((rel[:, 0] * nx).astype(jnp.int32), 0, nx - 1)
    cy = jnp.clip((rel[:, 1] * ny).astype(jnp.int32), 0, ny - 1)
    cz = jnp.clip((rel[:, 2] * nz).astype(jnp.int32), 0, nz - 1)
    cell = (cx * ny + cy) * nz + cz
    key = (cell * AZ_BINS + azb) * EL_BINS + elb
    if alive is not None:
        key = jnp.where(alive, key, nx * ny * nz * AZ_BINS * EL_BINS)
    return key


def _block_tile_bounds(omin, omax, dmin, dmax, tile_lo, tile_hi):
    """Conservative directed entry bound for every (block, tile) pair.

    For each axis: if the tile lies strictly ahead of the block on the +axis
    side, reaching it needs a positive direction component and at least
    gap / d_max travel (the fastest ray of the cone); a cone with no positive
    component cannot reach it at all (+inf). Symmetrically for the - side.
    Axes whose extents overlap contribute no constraint. The entry bound is
    the max over axes — every axis gap must be crossed.

    Shapes: omin/omax/dmin/dmax (B, 3); tile_lo/hi (T, 3). Returns (B, T).
    """
    gap_pos = tile_lo[None, :, :] - omax[:, None, :]  # (B, T, 3)
    gap_neg = omin[:, None, :] - tile_hi[None, :, :]
    dmax_e = dmax[:, None, :]
    dmin_e = dmin[:, None, :]

    # +side: need d > 0; fastest crossing = gap / dmax
    t_pos = jnp.where(
        gap_pos > 0.0,
        jnp.where(dmax_e > _EPS, gap_pos / jnp.maximum(dmax_e, _EPS), jnp.inf),
        0.0,
    )
    # -side: need d < 0; fastest crossing = gap / (-dmin)
    t_neg = jnp.where(
        gap_neg > 0.0,
        jnp.where(dmin_e < -_EPS, gap_neg / jnp.maximum(-dmin_e, _EPS), jnp.inf),
        0.0,
    )
    return jnp.max(jnp.maximum(t_pos, t_neg), axis=-1)  # (B, T)


def _sfh_kernel(
    n_tiles,
    perm_ref,  # SMEM (8, n_tiles) int32: this 8-block group's visit orders
    dlo_ref,  # SMEM (8, n_tiles) f32: matching ascending entry bounds
    nv_ref,  # SMEM (8, 1) int32: per-block count of reachable tiles
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (1, L) ray rows
    alive_ref,  # (1, L) int32 (1 = live)
    face_ref,  # (n_tiles*TILE_FACES, 16) VMEM bilinear table
    t_out_ref, idx_out_ref,
    best_t_ref, best_i_ref,  # VMEM scratch (FACE_GROUP, SFH_LANES)
    done_ref,  # SMEM scratch (1, 1) int32
):
    g = pl.program_id(0)
    row = g - (g // 8) * 8
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    live = alive_ref[:] != 0  # (1, L)

    # Shared per-ray Plucker moment od = o x d (same as the dense kernel)
    odx = oy * dz - oz * dy
    ody = oz * dx - ox * dz
    odz = ox * dy - oy * dx

    shape = (FACE_GROUP, SFH_LANES)
    # Dead lanes start "resolved" at t=0 so they never hold the walk open.
    best_t_ref[:] = jnp.broadcast_to(jnp.where(live, _BIG, 0.0), shape)
    best_i_ref[:] = jnp.full(shape, _IDX_BIG, jnp.int32)
    nv = nv_ref[row, 0]
    done_ref[0, 0] = jnp.where(nv == 0, 1, 0)

    def tile(i, _):
        @pl.when((done_ref[0, 0] == 0) & (i < nv))
        def _():
            tl = perm_ref[row, i]

            def group(gp, carry):
                bt, bi = carry
                rows = pl.ds(tl * TILE_FACES + gp * FACE_GROUP, FACE_GROUP)
                e2x = face_ref[rows, 0:1]
                e2y = face_ref[rows, 1:2]
                e2z = face_ref[rows, 2:3]
                w2x = face_ref[rows, 3:4]
                w2y = face_ref[rows, 4:5]
                w2z = face_ref[rows, 5:6]
                me1x = face_ref[rows, 6:7]
                me1y = face_ref[rows, 7:8]
                me1z = face_ref[rows, 8:9]
                mw1x = face_ref[rows, 9:10]
                mw1y = face_ref[rows, 10:11]
                mw1z = face_ref[rows, 11:12]
                mnx = face_ref[rows, 12:13]
                mny = face_ref[rows, 13:14]
                mnz = face_ref[rows, 14:15]
                mk = face_ref[rows, 15:16]

                u_num = (odx * e2x + ody * e2y + odz * e2z) + (
                    dx * w2x + dy * w2y + dz * w2z
                )
                v_num = (odx * me1x + ody * me1y + odz * me1z) + (
                    dx * mw1x + dy * mw1y + dz * mw1z
                )
                a = dx * mnx + dy * mny + dz * mnz
                t_num = mk - (ox * mnx + oy * mny + oz * mnz)
                f = 1.0 / a
                u = u_num * f
                v = v_num * f
                t = t_num * f
                hit = (
                    (u >= -_EPS)
                    & (u <= 1.0 + _EPS)
                    & (v >= -_EPS)
                    & (u + v <= 1.0 + _EPS)
                    & (t > _EPS)
                )
                t_hit = jnp.where(hit, t, _BIG)
                fidx = jnp.where(
                    hit,
                    (tl * (TILE_FACES // FACE_GROUP) + gp) * FACE_GROUP
                    + jax.lax.broadcasted_iota(jnp.int32, shape, 0),
                    jnp.int32(_IDX_BIG),
                )
                better = (t_hit < bt) | ((t_hit == bt) & (fidx < bi))
                return jnp.where(better, t_hit, bt), jnp.where(better, fidx, bi)

            bt, bi = jax.lax.fori_loop(
                0, TILE_FACES // FACE_GROUP, group, (best_t_ref[:], best_i_ref[:])
            )
            best_t_ref[:] = bt
            best_i_ref[:] = bi

            # Early exit EVERY tile: once the block's worst resolved ray
            # precedes the next tile's entry bound, nothing ahead can win.
            worst = jnp.max(jnp.min(bt, axis=0))
            nxt = jnp.where(
                i + 1 < nv, dlo_ref[row, jnp.minimum(i + 1, n_tiles - 1)], _BIG
            )
            done_ref[0, 0] = jnp.where(worst <= nxt, 1, 0)

        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)

    best_t = best_t_ref[:]
    best_i = best_i_ref[:]
    t_min = jnp.min(best_t, axis=0, keepdims=True)
    idx = jnp.min(
        jnp.where(best_t == t_min, best_i, jnp.int32(_IDX_BIG)), axis=0, keepdims=True
    )
    t_out_ref[:] = t_min
    idx_out_ref[:] = jnp.where((t_min >= _BIG) | (~live), -1, idx)


@partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def _sfh_call(face_tab, n_tiles, o, d, alive, perm, dlo, nv, interpret=False):
    r_pad = o.shape[0]
    comp = lambda x, i: x[:, i].reshape(1, -1)
    ray_spec = pl.BlockSpec((1, SFH_LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    n_t = perm.shape[1]
    grp = lambda shape: pl.BlockSpec(
        shape, lambda g: (g // 8, 0), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        partial(_sfh_kernel, n_tiles),
        grid=(r_pad // SFH_LANES,),
        in_specs=[grp((8, n_t)), grp((8, n_t)), grp((8, 1))]
        + [ray_spec] * 7
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((FACE_GROUP, SFH_LANES), jnp.float32),
            pltpu.VMEM((FACE_GROUP, SFH_LANES), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        perm, dlo, nv,
        comp(o, 0), comp(o, 1), comp(o, 2),
        comp(d, 0), comp(d, 1), comp(d, 2),
        alive.reshape(1, -1), face_tab,
    )


@partial(jax.jit, static_argnames=("interpret",))
def sorted_first_hit(
    tiles: SortedTiles,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    alive: jnp.ndarray = None,
    interpret: bool = False,
):
    """First-hit (t, face_idx) against the SORTED face order.

    `alive` (R,) bool: dead rays return (-1, inf) immediately and — because
    they sort to the tail — cost only empty kernel blocks. Face indices refer
    to the Morton-sorted order (see build_sorted_tiles); t matches the dense
    kernels bitwise on the same face set.
    """
    origins = jnp.atleast_2d(origins).astype(jnp.float32)
    dirs = jnp.atleast_2d(dirs).astype(jnp.float32)
    r = origins.shape[0]
    if alive is None:
        alive = jnp.ones((r,), bool)

    o_c = origins - tiles.center
    key = _sort_keys(o_c, dirs, alive, tiles)
    order = jnp.argsort(key)

    packed = jnp.concatenate(
        [o_c, dirs, alive[:, None].astype(jnp.float32)], axis=1
    )[order]
    r_pad = max(SFH_LANES, -(-r // SFH_LANES) * SFH_LANES)
    # Pad with DEAD copies of the last ray: they resolve instantly.
    pad_rows = jnp.concatenate(
        [packed[-1:, 0:6], jnp.zeros((1, 1), jnp.float32)], axis=1
    )
    packed = jnp.concatenate(
        [packed, jnp.broadcast_to(pad_rows, (r_pad - r, 7))], axis=0
    )
    o = packed[:, 0:3]
    d = packed[:, 3:6]
    live = packed[:, 6].astype(jnp.int32)

    ob = o.reshape(-1, SFH_LANES, 3)
    db = d.reshape(-1, SFH_LANES, 3)
    lb = live.reshape(-1, SFH_LANES).astype(bool)
    # Bounds over LIVE rays only (dead lanes would blow the AABB open);
    # all-dead blocks get nv == 0 below and skip the walk entirely.
    big = jnp.float32(1e30)
    omin = jnp.min(jnp.where(lb[..., None], ob, big), axis=1)
    omax = jnp.max(jnp.where(lb[..., None], ob, -big), axis=1)
    dmin = jnp.min(jnp.where(lb[..., None], db, big), axis=1)
    dmax = jnp.max(jnp.where(lb[..., None], db, -big), axis=1)

    dlo = _block_tile_bounds(omin, omax, dmin, dmax, tiles.tile_lo, tiles.tile_hi)
    any_live = jnp.any(lb, axis=1)
    dlo = jnp.where(any_live[:, None], dlo, jnp.inf)
    perm = jnp.argsort(dlo, axis=1).astype(jnp.int32)
    dlo_sorted = jnp.take_along_axis(dlo, perm, axis=1)
    nv = jnp.sum(jnp.isfinite(dlo_sorted), axis=1).astype(jnp.int32)
    dlo_sorted = jnp.where(jnp.isfinite(dlo_sorted), dlo_sorted, _BIG).astype(
        jnp.float32
    )

    nb = perm.shape[0]
    nb_pad = -(-nb // 8) * 8
    perm = jnp.pad(perm, ((0, nb_pad - nb), (0, 0)))
    dlo_sorted = jnp.pad(dlo_sorted, ((0, nb_pad - nb), (0, 0)))
    nv = jnp.pad(nv, (0, nb_pad - nb))[:, None]

    t, idx = _sfh_call(
        tiles.face_tab, tiles.n_tiles, o, d, live, perm, dlo_sorted, nv, interpret
    )
    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    # Misses AND dead lanes (whose scratch t is 0) report (inf, -1).
    t = jnp.where((t >= _BIG) | (idx < 0), jnp.inf, t)
    idx = jnp.where(jnp.isinf(t), -1, idx)

    inv = jnp.zeros(r, dtype=jnp.int32).at[order].set(jnp.arange(r, dtype=jnp.int32))
    return t[inv], idx[inv]


__all__ = ["SortedTiles", "build_sorted_tiles", "sorted_first_hit", "TILE_FACES"]
