"""Pallas TPU kernels for the ray tracer's hot loop.

Three kernels cover the tracer's per-bounce cost:

- first hit (rays x faces Moller-Trumbore + min/argmin): the XLA formulation
  (geometry.queries.ray_mesh_first_hit) materialises (R, F) temporaries in HBM.
  Here everything stays in VMEM. Two variants by mesh size: <= SMALL_F_MAX
  faces keeps faces in SMEM as scalars with rays packed as dense (8, lanes)
  tiles; larger meshes put faces on the SUBLANE axis ((8, 1) columns sliced
  from an (F, 9) table) and rays on the LANE axis. Both avoid the (BLOCK, 1)
  column layout, which VMEM tiles pad to 128 lanes (a 128x memory blowup).
- any hit (segment occlusion): same tiling, boolean any() reduction with the
  segment-interior window.
- bin histogram (energy accumulation): the scatter-add serialises on duplicate
  bins; instead a one-hot bin matrix is built in VMEM from an iota comparison
  and folded with MXU matmuls at Precision.HIGHEST.

Layout rule learned the hard way: long axes go on lanes; per-group constants
come in as (8, 1) sublane columns or SMEM scalars.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
RAY_BLOCK = 1024  # legacy block size, kept as a convenient test-shape constant

_EPS = 1e-9
_BIG = 3.0e38


BIG_LANES = 2048  # rays per grid step in the big-mesh kernel (lanes axis):
# measured ~9% faster than 4096 at 80k rays x 4k faces on v5e (smaller live
# tiles keep the fori-of-face-groups resident in vector registers)
FACE_GROUP = 8  # faces per sublane group
FACE_TILE = 16384  # faces per VMEM-resident tile; larger meshes scan over tiles


def _first_hit_big_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # ray rows (1, BIG_LANES)
    face_ref,  # (F_pad, 16) VMEM: [e2, w2, -e1, -w1, -n, -k, pad] columns
    t_out_ref, idx_out_ref,
):
    """One grid step: all faces against BIG_LANES rays.

    Faces ride the SUBLANE axis (8 per group, as (8, 1) columns sliced from the
    face table) and rays ride the LANE axis as dense (1, BIG_LANES) rows, so
    every tile is fully packed — the original formulation kept rays as
    (BLOCK, 1) columns, which VMEM pads to 128 lanes (128x waste).

    The test is Moller-Trumbore's scalar triple products expanded against
    PRECOMPUTED per-face constants (centered coordinates; w_i = A x e_i,
    n = e1 x e2, k = A.n), so the per-pair cross products reduce to dots
    against the shared per-ray Plucker moment od = o x d:

        u_num = od.e2 + d.w2          a = d.(-n)
        v_num = od.(-e1) + d.(-w1)    t = ((-k) - o.(-n)) / a

    ~16% fewer VPU ops per (ray, face) than the in-kernel cross-product form.
    The algebra is an exact rearrangement, so results match the XLA
    Moller-Trumbore path to f32 rounding (t equal to ULPs; the tie rule —
    smallest face index — is preserved). Each sublane s carries the running
    minimum over faces congruent to s mod 8; the final cross-sublane reduce
    keeps the smallest face index on ties.
    """
    n_groups = face_ref.shape[0] // FACE_GROUP
    shape = (FACE_GROUP, BIG_LANES)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]  # (1, L) rows
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    # Shared per-ray Plucker moment od = o x d (amortised over all groups)
    odx = oy * dz - oz * dy
    ody = oz * dx - ox * dz
    odz = ox * dy - oy * dx

    def group(fg, carry):
        best_t, best_fg = carry
        rows = pl.ds(fg * FACE_GROUP, FACE_GROUP)
        e2x = face_ref[rows, 0:1]  # (8, 1) columns
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

        u_num = (odx * e2x + ody * e2y + odz * e2z) + (dx * w2x + dy * w2y + dz * w2z)
        v_num = (odx * me1x + ody * me1y + odz * me1z) + (
            dx * mw1x + dy * mw1y + dz * mw1z
        )
        a = dx * mnx + dy * mny + dz * mnz
        t_num = mk - (ox * mnx + oy * mny + oz * mnz)
        # No validity guard: a == 0 (incl. all-zero padded faces) makes u/v/t
        # inf or NaN, and every window comparison below then fails.
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
        better = t_hit < best_t  # strict: earliest group wins ties per sublane
        return (
            jnp.where(better, t_hit, best_t),
            jnp.where(better, jnp.full(shape, 1, jnp.int32) * fg, best_fg),
        )

    init = (jnp.full(shape, _BIG, jnp.float32), jnp.full(shape, 0, jnp.int32))
    best_t, best_fg = jax.lax.fori_loop(0, n_groups, group, init)

    # Reduce across the 8 sublanes: min t, smallest face index on ties
    sub_id = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    face_id = best_fg * FACE_GROUP + sub_id
    t_min = jnp.min(best_t, axis=0, keepdims=True)  # (1, L)
    idx = jnp.min(
        jnp.where(best_t == t_min, face_id, jnp.int32(2**30)), axis=0, keepdims=True
    )
    t_out_ref[:] = t_min
    idx_out_ref[:] = jnp.where(t_min >= _BIG, -1, idx)


SMALL_F_MAX = 512  # face count below which the SMEM-scalar kernel runs
SMALL_LANES = 1024  # ray lanes per tile row in the small-mesh kernel
SMALL_ROWS = 8  # sublane rows per grid step (full (8, lanes) tiles)


def _first_hit_small_kernel(n_faces, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                            face_ref, t_out_ref, idx_out_ref):
    """Small-mesh first hit: faces live in SMEM as scalars, rays pack densely.

    The general kernel stores each ray component as a (BLOCK, 1) column, which
    VMEM tiles pad to 128 lanes — a 128x memory blowup and tiny grid steps. For
    meshes with few faces (every shoebox room, most synthetic scenes) it is far
    cheaper to loop over faces as SMEM scalars and keep rays packed as full
    (8, lanes) tiles: one grid step covers 8*lanes rays with dense DMA.
    """
    shape = (SMALL_ROWS, SMALL_LANES)
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def face(f, carry):
        best_t, best_idx = carry
        ax = face_ref[0, f]
        ay = face_ref[1, f]
        az = face_ref[2, f]
        e1x = face_ref[3, f]
        e1y = face_ref[4, f]
        e1z = face_ref[5, f]
        e2x = face_ref[6, f]
        e2y = face_ref[7, f]
        e2z = face_ref[8, f]

        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        valid_a = jnp.abs(a) > _EPS
        fInv = 1.0 / jnp.where(valid_a, a, 1.0)

        sx = ox - ax
        sy = oy - ay
        sz = oz - az
        u = fInv * (sx * hx + sy * hy + sz * hz)

        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = fInv * (dx * qx + dy * qy + dz * qz)
        t = fInv * (e2x * qx + e2y * qy + e2z * qz)

        hit = (
            valid_a
            & (u >= -_EPS)
            & (u <= 1.0 + _EPS)
            & (v >= -_EPS)
            & (u + v <= 1.0 + _EPS)
            & (t > _EPS)
        )
        t_hit = jnp.where(hit, t, _BIG)
        better = t_hit < best_t
        return (
            jnp.where(better, t_hit, best_t),
            jnp.where(better, jnp.full(shape, 1, jnp.int32) * f, best_idx),
        )

    init = (jnp.full(shape, _BIG, jnp.float32), jnp.full(shape, -1, jnp.int32))
    best_t, best_idx = jax.lax.fori_loop(0, n_faces, face, init)
    t_out_ref[:] = best_t
    idx_out_ref[:] = best_idx


def _pad_to(x: jnp.ndarray, n: int, value) -> jnp.ndarray:
    if x.shape[0] == n:
        return x
    return jnp.pad(x, (0, n - x.shape[0]), constant_values=value)


@partial(jax.jit, static_argnames=("interpret",))
def ray_first_hit_pallas(
    origins: jnp.ndarray, dirs: jnp.ndarray, tris: jnp.ndarray, interpret: bool = False
):
    """First-hit (t, face_idx) for rays against triangles via the Pallas kernel.

    Arguments:
        origins/dirs: (R, 3) float32.
        tris: (F, 3, 3) float32 (sentinel-padded faces never hit).

    Returns:
        (t (R,), idx (R,)): t = +inf and idx = -1 where the ray escapes.
    """
    r = origins.shape[0]
    f = tris.shape[0]
    if f <= SMALL_F_MAX:
        return _ray_first_hit_small(origins, dirs, tris, interpret)

    # Big-mesh path: faces on sublanes, rays on lanes (see _first_hit_big_kernel)
    r_pad = max(BIG_LANES, ((r + BIG_LANES - 1) // BIG_LANES) * BIG_LANES)
    f_pad = max(FACE_GROUP, ((f + FACE_GROUP - 1) // FACE_GROUP) * FACE_GROUP)

    # Centered coordinates bound the f32 cancellation in the precomputed
    # triple-product constants (see _first_hit_big_kernel); the translation is
    # exact up to f32 rounding and identical for rays and faces. PAD_DISTANCE
    # sentinel faces (the documented padding contract) are EXCLUDED from the
    # bounds — a 1e9 sentinel would drag the centre ~5e8 away from the real
    # geometry and destroy exactly the precision the centring protects.
    tris32 = tris.astype(jnp.float32)
    verts = tris32.reshape(-1, 3)
    real = jnp.all(jnp.abs(verts) < 1.0e8, axis=-1, keepdims=True)
    vmin = jnp.min(jnp.where(real, verts, jnp.inf), axis=0)
    vmax = jnp.max(jnp.where(real, verts, -jnp.inf), axis=0)
    center = jnp.where(jnp.isfinite(vmin + vmax), 0.5 * (vmin + vmax), 0.0)
    o = jnp.pad(origins.astype(jnp.float32) - center, ((0, r_pad - r), (0, 0)))
    d = jnp.pad(dirs.astype(jnp.float32), ((0, r_pad - r), (0, 0)), constant_values=1.0)

    av = tris32[:, 0] - center
    e1 = tris32[:, 1] - tris32[:, 0]
    e2 = tris32[:, 2] - tris32[:, 0]
    w1 = jnp.cross(av, e1)
    w2 = jnp.cross(av, e2)
    nrm = jnp.cross(e1, e2)
    kk = jnp.sum(av * nrm, axis=-1)
    face_tab = jnp.concatenate(
        [e2, w2, -e1, -w1, -nrm, -kk[:, None]], axis=1
    )  # (F, 16); all-zero padded faces have a == 0 -> never hit

    ray_comp = lambda x, i: x[:, i].reshape(1, -1)  # (1, r_pad) rows
    grid = (r_pad // BIG_LANES,)
    ray_spec = pl.BlockSpec((1, BIG_LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    rays = (
        ray_comp(o, 0), ray_comp(o, 1), ray_comp(o, 2),
        ray_comp(d, 0), ray_comp(d, 1), ray_comp(d, 2),
    )

    def call_tile(tile_tab):
        tile_f = tile_tab.shape[0]
        face_spec = pl.BlockSpec((tile_f, 16), lambda g: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _first_hit_big_kernel,
            grid=grid,
            in_specs=[ray_spec] * 6 + [face_spec],
            out_specs=(ray_spec, ray_spec),
            out_shape=(
                jax.ShapeDtypeStruct((1, r_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
            ),
            interpret=interpret,
        )(*rays, tile_tab)

    if f_pad <= FACE_TILE:
        t, idx = call_tile(jnp.pad(face_tab, ((0, f_pad - f), (0, 0))))
    else:
        # Meshes past one VMEM tile (scanned rooms): stream FACE_TILE-face
        # chunks through the same kernel and fold with a min/first-tie combine.
        # O(R*F) total like the single-tile case — the ascending tile order
        # preserves the smallest-face-index tie rule.
        n_tiles = -(-f // FACE_TILE)
        face_tab = jnp.pad(face_tab, ((0, n_tiles * FACE_TILE - f), (0, 0)))
        tiles = face_tab.reshape(n_tiles, FACE_TILE, 16)

        def body(carry, tile_tab):
            best_t, best_i, off = carry
            t_c, i_c = call_tile(tile_tab)
            i_c = i_c + off  # local -> global face index (misses stay masked below)
            better = t_c < best_t
            tie = (t_c == best_t) & (i_c < best_i) & (t_c < _BIG)
            best_t = jnp.where(better, t_c, best_t)
            best_i = jnp.where(better | tie, i_c, best_i)
            return (best_t, best_i, off + FACE_TILE), None

        init = (
            jnp.full((1, r_pad), _BIG, jnp.float32),
            jnp.full((1, r_pad), jnp.int32(2**30)),
            jnp.asarray(0, jnp.int32),
        )
        (t, idx, _), _ = jax.lax.scan(body, init, tiles)

    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    t = jnp.where(t >= _BIG, jnp.inf, t)
    idx = jnp.where(jnp.isinf(t), -1, idx)
    return t, idx


def _ray_first_hit_small(origins, dirs, tris, interpret: bool = False):
    """Small-mesh dispatch of ray_first_hit_pallas (see _first_hit_small_kernel)."""
    r = origins.shape[0]
    f = tris.shape[0]
    step = SMALL_ROWS * SMALL_LANES
    r_pad = max(step, ((r + step - 1) // step) * step)

    o = jnp.pad(origins.astype(jnp.float32), ((0, r_pad - r), (0, 0)))
    d = jnp.pad(dirs.astype(jnp.float32), ((0, r_pad - r), (0, 0)), constant_values=1.0)
    rows = r_pad // SMALL_LANES

    # faces: 9 component rows x F columns, SMEM-resident scalars
    face_tab = jnp.stack(
        [
            tris[:, 0, 0], tris[:, 0, 1], tris[:, 0, 2],
            tris[:, 1, 0] - tris[:, 0, 0], tris[:, 1, 1] - tris[:, 0, 1], tris[:, 1, 2] - tris[:, 0, 2],
            tris[:, 2, 0] - tris[:, 0, 0], tris[:, 2, 1] - tris[:, 0, 1], tris[:, 2, 2] - tris[:, 0, 2],
        ]
    )  # (9, F)

    comp = lambda x, i: x[:, i].reshape(rows, SMALL_LANES)
    grid = (rows // SMALL_ROWS,)
    ray_spec = pl.BlockSpec(
        (SMALL_ROWS, SMALL_LANES), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    face_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, idx = pl.pallas_call(
        partial(_first_hit_small_kernel, f),
        grid=grid,
        in_specs=[ray_spec] * 6 + [face_spec],
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, SMALL_LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, SMALL_LANES), jnp.int32),
        ),
        interpret=interpret,
    )(
        comp(o, 0), comp(o, 1), comp(o, 2),
        comp(d, 0), comp(d, 1), comp(d, 2),
        face_tab,
    )
    t = t.reshape(-1)[:r]
    idx = idx.reshape(-1)[:r]
    t = jnp.where(t >= _BIG, jnp.inf, t)
    idx = jnp.where(jnp.isinf(t), -1, idx)
    return t, idx


def _any_hit_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, len_ref,  # segment rows (1, BIG_LANES)
    face_ref,  # (F_pad, 9)
    occ_out_ref,
):
    """Segment-occlusion: does ANY face intersect the open segment?

    Same sublane-face x lane-ray tiling as _first_hit_big_kernel, with the
    reduction replaced by a boolean any() over the segment-interior window
    (margin < t < length - margin), matching geometry.queries.segments_occluded.
    """
    n_groups = face_ref.shape[0] // FACE_GROUP
    margin = 1e-4

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    seg_len = len_ref[:]

    def group(fg, blocked):
        rows = pl.ds(fg * FACE_GROUP, FACE_GROUP)
        ax = face_ref[rows, 0:1]
        ay = face_ref[rows, 1:2]
        az = face_ref[rows, 2:3]
        e1x = face_ref[rows, 3:4]
        e1y = face_ref[rows, 4:5]
        e1z = face_ref[rows, 5:6]
        e2x = face_ref[rows, 6:7]
        e2y = face_ref[rows, 7:8]
        e2z = face_ref[rows, 8:9]

        hx = dy * e2z - dz * e2y
        hy = dz * e2x - dx * e2z
        hz = dx * e2y - dy * e2x
        a = e1x * hx + e1y * hy + e1z * hz
        valid_a = jnp.abs(a) > _EPS
        f = 1.0 / jnp.where(valid_a, a, 1.0)

        sx = ox - ax
        sy = oy - ay
        sz = oz - az
        u = f * (sx * hx + sy * hy + sz * hz)

        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (dx * qx + dy * qy + dz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)

        hit = (
            valid_a
            & (u >= -_EPS)
            & (u <= 1.0 + _EPS)
            & (v >= -_EPS)
            & (u + v <= 1.0 + _EPS)
            & (t > margin)
            & (t < seg_len - margin)
        )
        row_any = jnp.max(hit.astype(jnp.int32), axis=0, keepdims=True)  # (1, L)
        return jnp.maximum(blocked, row_any)

    init = jnp.zeros((1, BIG_LANES), dtype=jnp.int32)
    occ_out_ref[:] = jax.lax.fori_loop(0, n_groups, group, init)


@partial(jax.jit, static_argnames=("interpret",))
def segments_occluded_pallas(
    starts: jnp.ndarray, ends: jnp.ndarray, tris: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(R,) bools: open segment start->end blocked by the mesh (Pallas kernel).

    Matches geometry.queries.segments_occluded (same endpoint margin semantics).
    """
    r = starts.shape[0]
    f = tris.shape[0]
    r_pad = max(BIG_LANES, ((r + BIG_LANES - 1) // BIG_LANES) * BIG_LANES)
    f_pad = max(FACE_GROUP, ((f + FACE_GROUP - 1) // FACE_GROUP) * FACE_GROUP)

    seg = ends - starts
    length = jnp.linalg.norm(seg.astype(jnp.float32), axis=-1)
    dirs = seg / jnp.maximum(length, _EPS)[:, None]

    o = jnp.pad(starts.astype(jnp.float32), ((0, r_pad - r), (0, 0)))
    d = jnp.pad(dirs.astype(jnp.float32), ((0, r_pad - r), (0, 0)), constant_values=1.0)
    # Padded segments have length 0 -> the (margin, length - margin) window is empty
    ln = jnp.pad(length, (0, r_pad - r)).reshape(1, -1)

    face_tab = jnp.stack(
        [
            tris[:, 0, 0], tris[:, 0, 1], tris[:, 0, 2],
            tris[:, 1, 0] - tris[:, 0, 0], tris[:, 1, 1] - tris[:, 0, 1], tris[:, 1, 2] - tris[:, 0, 2],
            tris[:, 2, 0] - tris[:, 0, 0], tris[:, 2, 1] - tris[:, 0, 1], tris[:, 2, 2] - tris[:, 0, 2],
        ],
        axis=1,
    )
    ray_comp = lambda x, i: x[:, i].reshape(1, -1)
    grid = (r_pad // BIG_LANES,)
    ray_spec = pl.BlockSpec((1, BIG_LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    rays = (
        ray_comp(o, 0), ray_comp(o, 1), ray_comp(o, 2),
        ray_comp(d, 0), ray_comp(d, 1), ray_comp(d, 2), ln,
    )

    def call_tile(tile_tab):
        tile_f = tile_tab.shape[0]
        face_spec = pl.BlockSpec((tile_f, 9), lambda g: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _any_hit_kernel,
            grid=grid,
            in_specs=[ray_spec] * 6 + [ray_spec, face_spec],
            out_specs=ray_spec,
            out_shape=jax.ShapeDtypeStruct((1, r_pad), jnp.int32),
            interpret=interpret,
        )(*rays, tile_tab)

    if f_pad <= FACE_TILE:
        occ = call_tile(jnp.pad(face_tab, ((0, f_pad - f), (0, 0))))
    else:
        # Stream VMEM-sized face tiles (scanned meshes); OR-fold the per-tile
        # blocked flags.
        n_tiles = -(-f // FACE_TILE)
        face_tab = jnp.pad(face_tab, ((0, n_tiles * FACE_TILE - f), (0, 0)))
        tiles = face_tab.reshape(n_tiles, FACE_TILE, 9)

        def body(blocked, tile_tab):
            return jnp.maximum(blocked, call_tile(tile_tab)), None

        occ, _ = jax.lax.scan(body, jnp.zeros((1, r_pad), jnp.int32), tiles)
    return occ.reshape(-1)[:r].astype(bool)


HIST_RAY_BLOCK = 1024  # rays per inner chunk of the histogram kernel
HIST_GROUP_BLOCK = 8  # histogram groups folded per grid step


def _bin_histogram_kernel(bins_ref, dep_ref, out_ref):
    """One grid step: fold ALL of one group's rays into its histogram.

    The scatter-add the XLA path performs (hist.at[...,bins].add) serialises on
    duplicate bins; here the one-hot bin matrix is built in VMEM from an iota
    comparison and the accumulation becomes MXU matmuls:
    out[bin, k] = sum_r 1[bins[r]==bin] * dep[k, r]. The one-hot never touches
    HBM, so traffic drops from O(R * n_bins) to O(R * K). Precision HIGHEST
    keeps the fp32 deposits exact to ~3e-7 (the TPU matmul default rounds the
    deposits to bf16, a 1.6e-3 relative error).
    """
    n_groups = bins_ref.shape[0]
    n_bins_pad = out_ref.shape[1]
    r_pad = bins_ref.shape[2]
    n_chunks = r_pad // HIST_RAY_BLOCK

    def group(g, _):
        def chunk(i, acc):
            sl = pl.ds(i * HIST_RAY_BLOCK, HIST_RAY_BLOCK)
            # one_hot[bin, ray] for this chunk of rays
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (n_bins_pad, HIST_RAY_BLOCK), 0)
                == bins_ref[g, :, sl]
            ).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                oh,
                dep_ref[g, :, sl],
                (((1,), (1,)), ((), ())),  # contract over the ray axis
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        init = jnp.zeros((n_bins_pad, out_ref.shape[2]), dtype=jnp.float32)
        out_ref[g] = jax.lax.fori_loop(0, n_chunks, chunk, init)
        return 0

    jax.lax.fori_loop(0, n_groups, group, 0)


@partial(jax.jit, static_argnames=("n_bins", "interpret"))
def bin_histogram_pallas(
    bins: jnp.ndarray, dep: jnp.ndarray, n_bins: int, interpret: bool = False
) -> jnp.ndarray:
    """Grouped histogram: out[g, bin, k] = sum over rays r of dep[g, r, k]
    where bins[g, r] == bin.

    Arguments:
        bins: (G, R) int32 bin indices (negative values deposit nowhere).
        dep: (G, R, K) float32 deposits.
    Returns:
        (G, n_bins, K) float32.
    """
    g, r, k = dep.shape
    r_pad = max(HIST_RAY_BLOCK, ((r + HIST_RAY_BLOCK - 1) // HIST_RAY_BLOCK) * HIST_RAY_BLOCK)
    bins_pad = max(LANES, ((n_bins + LANES - 1) // LANES) * LANES)
    gb = HIST_GROUP_BLOCK
    g_pad = max(gb, ((g + gb - 1) // gb) * gb)

    # Padded rays get bin -1 -> match no lane of the iota -> zero contribution.
    # Rays sit on the minor (contiguous) axis so every DMA row is dense; groups
    # batch HIST_GROUP_BLOCK per grid step to amortise the per-step overhead.
    bins_p = jnp.pad(
        bins.astype(jnp.int32), ((0, g_pad - g), (0, r_pad - r)), constant_values=-1
    )
    dep_p = jnp.pad(dep.astype(jnp.float32), ((0, g_pad - g), (0, r_pad - r), (0, 0)))
    dep_t = jnp.moveaxis(dep_p, 1, 2)  # (G_pad, K, r_pad)

    grid = (g_pad // gb,)
    out = pl.pallas_call(
        _bin_histogram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gb, 1, r_pad), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, k, r_pad), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb, bins_pad, k), lambda gi: (gi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g_pad, bins_pad, k), jnp.float32),
        interpret=interpret,
    )(bins_p[:, None, :], dep_t)

    return out[:g, :n_bins, :]


def _deposit_histogram_kernel(
    n_bins_pad,
    bin_dt,
    c_sound,
    hit_ref,  # (1, 3, R_pad) block: hit x/y/z rows for one source
    nrm_ref,  # (1, 3, R_pad)
    erefl_ref,  # (1, B, R_pad)
    dist_ref,  # (1, 1, R_pad)
    occ_ref,  # (1, 1, R_pad) int32 (1 = blocked); all-zero when occlusion off
    lis_ref,  # (C, 3) SMEM listener positions
    out_ref,  # (1, n_bins_pad, B) block for group (c, e)
):
    """Fused diffuse-rain deposit + bin histogram for one (capsule, source).

    Computes the per-ray deposit (cos(theta) / (4 pi^2 d^2) geometry, visibility,
    arrival binning) in VMEM and folds it straight into the histogram with the
    one-hot MXU matmul — none of the (C, rays) intermediates the XLA
    formulation materialises in HBM per bounce.
    """
    ci = pl.program_id(0)
    r_pad = hit_ref.shape[2]
    n_chunks = r_pad // HIST_RAY_BLOCK
    n_bands = erefl_ref.shape[1]

    lx = lis_ref[ci, 0]
    ly = lis_ref[ci, 1]
    lz = lis_ref[ci, 2]

    def chunk(i, acc):
        sl = pl.ds(i * HIST_RAY_BLOCK, HIST_RAY_BLOCK)
        hx = hit_ref[0, 0:1, sl]  # (1, chunk)
        hy = hit_ref[0, 1:2, sl]
        hz = hit_ref[0, 2:3, sl]
        nx = nrm_ref[0, 0:1, sl]
        ny = nrm_ref[0, 1:2, sl]
        nz = nrm_ref[0, 2:3, sl]

        vx = lx - hx
        vy = ly - hy
        vz = lz - hz
        d2 = vx * vx + vy * vy + vz * vz
        d = jnp.sqrt(d2)
        cos_th = jnp.maximum((vx * nx + vy * ny + vz * nz) / jnp.maximum(d, 1e-9), 0.0)

        arrival = (dist_ref[0, 0:1, sl] + d) / c_sound
        bins = (arrival * (1.0 / bin_dt)).astype(jnp.int32)
        in_range = arrival < (n_bins_pad * bin_dt)  # padded bins stay addressable
        visible = (occ_ref[0, 0:1, sl] == 0) & (cos_th > 0.0) & in_range

        geom = jnp.where(
            visible, cos_th / (4.0 * jnp.pi**2 * jnp.maximum(d, 1e-2) ** 2), 0.0
        )  # (1, chunk)
        dep = erefl_ref[0, :, sl] * geom  # (B, chunk)

        bins = jnp.clip(bins, 0, n_bins_pad - 1)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (n_bins_pad, HIST_RAY_BLOCK), 0) == bins
        ).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh, dep, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    init = jnp.zeros((n_bins_pad, n_bands), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, n_chunks, chunk, init)


@partial(jax.jit, static_argnames=("n_sources", "n_bins", "bin_dt", "c_sound", "interpret"))
def deposit_histogram_pallas(
    hit: jnp.ndarray,  # (TR, 3) hit positions (TR = n_sources * rays, source-major)
    normal: jnp.ndarray,  # (TR, 3) surface normals at the hits
    e_refl: jnp.ndarray,  # (TR, B) post-reflection energies
    dist: jnp.ndarray,  # (TR,) path distances so far
    occ: jnp.ndarray,  # (C, TR) bool, True = listener blocked
    listener_pos: jnp.ndarray,  # (C, 3)
    n_sources: int,
    n_bins: int,
    bin_dt: float,
    c_sound: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused diffuse-rain deposit + grouped histogram.

    Returns (n_sources, C, B, n_bins) energy to add to the running histograms —
    the Pallas replacement for the tracer's XLA deposit chain + bin_histogram.
    """
    tr = hit.shape[0]
    cl = listener_pos.shape[0]
    n_bands = e_refl.shape[1]
    r = tr // n_sources
    r_pad = max(HIST_RAY_BLOCK, ((r + HIST_RAY_BLOCK - 1) // HIST_RAY_BLOCK) * HIST_RAY_BLOCK)
    bins_pad = max(LANES, ((n_bins + LANES - 1) // LANES) * LANES)

    def per_source(x, fill=0.0):
        # (TR, K) -> (E, K, r_pad): source-major rows, rays dense on lanes
        x = x.reshape(n_sources, r, -1)
        x = jnp.pad(x, ((0, 0), (0, r_pad - r), (0, 0)), constant_values=fill)
        return jnp.moveaxis(x, 1, 2)

    hit_t = per_source(hit)  # (E, 3, r_pad)
    nrm_t = per_source(normal)
    erefl_t = per_source(e_refl)
    # Padded rays: occ=1 marks them invisible -> zero deposit
    dist_t = per_source(dist[:, None])
    occ_t = jnp.pad(
        occ.astype(jnp.int32).reshape(cl, n_sources, r),
        ((0, 0), (0, 0), (0, r_pad - r)),
        constant_values=1,
    ).reshape(cl * n_sources, 1, r_pad)  # (C*E, 1, r_pad), capsule-major

    grid = (cl, n_sources)
    src_spec = lambda k: pl.BlockSpec(
        (1, k, r_pad), lambda ci, e: (e, 0, 0), memory_space=pltpu.VMEM
    )
    occ_spec = pl.BlockSpec(
        (1, 1, r_pad), lambda ci, e: (ci * n_sources + e, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, bins_pad, n_bands),
        lambda ci, e: (ci * n_sources + e, 0, 0),
        memory_space=pltpu.VMEM,
    )

    out = pl.pallas_call(
        partial(_deposit_histogram_kernel, bins_pad, float(bin_dt), float(c_sound)),
        grid=grid,
        in_specs=[
            src_spec(3), src_spec(3), src_spec(n_bands), src_spec(1),
            occ_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((cl * n_sources, bins_pad, n_bands), jnp.float32),
        interpret=interpret,
    )(
        hit_t, nrm_t, erefl_t, dist_t, occ_t,
        listener_pos.astype(jnp.float32),
    )
    # (C*E, bins_pad, B) -> (E, C, B, n_bins)
    out = out.reshape(cl, n_sources, bins_pad, n_bands)[:, :, :n_bins, :]
    return jnp.transpose(out, (1, 0, 3, 2))


def _deposit_histogram_foa_kernel(
    n_bins_pad,
    bin_dt,
    c_sound,
    hit_ref,  # (1, 3, R_pad) block: hit x/y/z rows for one source
    nrm_ref,  # (1, 3, R_pad)
    erefl_ref,  # (1, B, R_pad)
    dist_ref,  # (1, 1, R_pad)
    occ_ref,  # (1, 1, R_pad) int32 (1 = blocked)
    lis_ref,  # (1, 3) SMEM listener position
    out_ref,  # (1, n_bins_pad, 4*B) block for one source
):
    """Fused diffuse-rain deposit + FOA (AmbiX order-1) encode + histogram.

    The FOA production path's XLA formulation materialises the (TR, B)
    deposits, the (TR, 4) SH gains and the (TR, 4, B) weighted deposits in HBM
    every bounce; here the whole chain — geometry, visibility, binning,
    first-order encode [W, X, Y, Z] = [1, ux, uy, uz] (the same arrival vector
    rir.sh.foa_encoding_gains receives), and the one-hot MXU fold — runs in
    VMEM. Output columns are channel-major: out[bin, c*B + band].
    """
    r_pad = hit_ref.shape[2]
    n_chunks = r_pad // HIST_RAY_BLOCK
    n_bands = erefl_ref.shape[1]

    lx = lis_ref[0, 0]
    ly = lis_ref[0, 1]
    lz = lis_ref[0, 2]

    def chunk(i, acc):
        sl = pl.ds(i * HIST_RAY_BLOCK, HIST_RAY_BLOCK)
        hx = hit_ref[0, 0:1, sl]
        hy = hit_ref[0, 1:2, sl]
        hz = hit_ref[0, 2:3, sl]
        nx = nrm_ref[0, 0:1, sl]
        ny = nrm_ref[0, 1:2, sl]
        nz = nrm_ref[0, 2:3, sl]

        vx = lx - hx
        vy = ly - hy
        vz = lz - hz
        d2 = vx * vx + vy * vy + vz * vz
        d = jnp.sqrt(d2)
        inv_d = 1.0 / jnp.maximum(d, 1e-9)
        cos_th = jnp.maximum((vx * nx + vy * ny + vz * nz) * inv_d, 0.0)

        arrival = (dist_ref[0, 0:1, sl] + d) / c_sound
        bins = (arrival * (1.0 / bin_dt)).astype(jnp.int32)
        in_range = arrival < (n_bins_pad * bin_dt)
        visible = (occ_ref[0, 0:1, sl] == 0) & (cos_th > 0.0) & in_range

        geom = jnp.where(
            visible, cos_th / (4.0 * jnp.pi**2 * jnp.maximum(d, 1e-2) ** 2), 0.0
        )  # (1, chunk)
        dep = erefl_ref[0, :, sl] * geom  # (B, chunk)
        # AmbiX WXYZ gains for the ARRIVAL vector (hit - listener)/d: the
        # encoders take receiver->source directions — identical to the XLA
        # path's _ambi_gains(-dir_l) at order 1
        ux = -vx * inv_d
        uy = -vy * inv_d
        uz = -vz * inv_d
        w = jnp.concatenate(
            [dep, dep * ux, dep * uy, dep * uz], axis=0
        )  # (4B, chunk), channel-major rows

        bins = jnp.clip(bins, 0, n_bins_pad - 1)
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (n_bins_pad, HIST_RAY_BLOCK), 0) == bins
        ).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    init = jnp.zeros((n_bins_pad, 4 * n_bands), dtype=jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, n_chunks, chunk, init)


@partial(jax.jit, static_argnames=("n_sources", "n_bins", "bin_dt", "c_sound", "interpret"))
def deposit_histogram_foa_pallas(
    hit: jnp.ndarray,  # (TR, 3) hit positions (source-major)
    normal: jnp.ndarray,  # (TR, 3)
    e_refl: jnp.ndarray,  # (TR, B)
    dist: jnp.ndarray,  # (TR,)
    occ: jnp.ndarray,  # (1, TR) bool, True = blocked
    listener_pos: jnp.ndarray,  # (1, 3)
    n_sources: int,
    n_bins: int,
    bin_dt: float,
    c_sound: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused deposit + AmbiX first-order encode + grouped histogram.

    Returns (n_sources, 4, B, n_bins) — the FOA analog of
    deposit_histogram_pallas for a single-listener ambisonic rig.
    """
    tr = hit.shape[0]
    n_bands = e_refl.shape[1]
    r = tr // n_sources
    r_pad = max(HIST_RAY_BLOCK, ((r + HIST_RAY_BLOCK - 1) // HIST_RAY_BLOCK) * HIST_RAY_BLOCK)
    bins_pad = max(LANES, ((n_bins + LANES - 1) // LANES) * LANES)

    def per_source(x):
        x = x.reshape(n_sources, r, -1)
        x = jnp.pad(x, ((0, 0), (0, r_pad - r), (0, 0)))
        return jnp.moveaxis(x, 1, 2)

    hit_t = per_source(hit)
    nrm_t = per_source(normal)
    erefl_t = per_source(e_refl)
    dist_t = per_source(dist[:, None])
    occ_t = jnp.pad(
        occ.astype(jnp.int32).reshape(1, n_sources, r),
        ((0, 0), (0, 0), (0, r_pad - r)),
        constant_values=1,  # padded rays: invisible -> zero deposit
    ).reshape(n_sources, 1, r_pad)

    grid = (n_sources,)
    src_spec = lambda k: pl.BlockSpec(
        (1, k, r_pad), lambda e: (e, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, bins_pad, 4 * n_bands), lambda e: (e, 0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        partial(_deposit_histogram_foa_kernel, bins_pad, float(bin_dt), float(c_sound)),
        grid=grid,
        in_specs=[
            src_spec(3), src_spec(3), src_spec(n_bands), src_spec(1), src_spec(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_sources, bins_pad, 4 * n_bands), jnp.float32),
        interpret=interpret,
    )(
        hit_t, nrm_t, erefl_t, dist_t, occ_t,
        listener_pos.astype(jnp.float32),
    )
    # (E, bins_pad, 4B) channel-major columns -> (E, 4, B, n_bins)
    out = out[:, :n_bins, :].reshape(n_sources, n_bins, 4, n_bands)
    return jnp.transpose(out, (0, 2, 3, 1))


def bin_histogram(bins: jnp.ndarray, dep: jnp.ndarray, n_bins: int) -> jnp.ndarray:
    """Grouped histogram with automatic backend dispatch (see bin_histogram_pallas).

    Falls back to an XLA scatter-add off TPU — identical results, the TPU kernel
    just avoids the scatter serialisation.
    """
    from audiblelight_tpu import config as _config

    if getattr(_config, "USE_PALLAS_RAYCAST", True) and pallas_supported():
        return bin_histogram_pallas(bins, dep, n_bins)
    g = dep.shape[0]
    out = jnp.zeros((g, n_bins, dep.shape[2]), dtype=jnp.float32)
    # clip() keeps negative sentinels in-bounds; their deposits are zero by contract
    safe = jnp.clip(bins, 0, n_bins - 1)
    return out.at[jnp.arange(g)[:, None], safe, :].add(
        jnp.where((bins >= 0)[..., None], dep, 0.0)
    )


def pallas_supported() -> bool:
    """True when the current backend can run the Pallas TPU kernels."""
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return backend in ("tpu", "axon")
