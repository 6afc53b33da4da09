"""Uniform-grid ray acceleration for large triangle meshes (host build + JAX DDA).

The dense (rays x faces) kernels in ops.pallas_kernels are ideal for the small
meshes placement and shoebox scenes use, but a scanned interior (the reference's
flagship Gibson rooms go through the rlr C++ engine's BVH,
reference worldstate.py:2148-2181 / trimesh+rtree at :1390-1544) has 10^5+
faces — dense testing is O(R*F) and infeasible. A BVH's per-ray divergent
recursion is the wrong shape for the TPU; instead:

- **Host build** (numpy, once per mesh): a uniform grid over the mesh AABB with
  CSR cell -> face-index lists. Faces are inserted into every cell their AABB
  overlaps, so a hit found in the current cell's t-window is always discovered
  (the standard replication argument).
- **Device traversal** (pure XLA, fixed-shape): every ray walks its own cells
  with a vectorised Amanatides-Woo DDA inside `lax.while_loop`. Per step each
  ray row-gathers the next K=16 faces of its current cell from the HBM face
  table (the embedding-lookup access pattern, which XLA lowers efficiently)
  and Moller-Trumbore-tests them densely. Cells holding more than K faces
  simply take several virtual steps via a per-ray offset. Work per ray is
  O(cells_crossed * K) instead of O(F).

First-hit exits when every ray's best hit precedes its current cell's entry
distance (or the ray left the grid); any-hit exits on the first blocking hit.
Results match geometry.queries' dense kernels exactly, including
smallest-face-index tie-breaking.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1.0e-9
_BIG = 3.0e38

FACES_PER_STEP = 16  # K: faces gathered + tested per ray per DDA step


@dataclass
class GridAccel:
    """Device-resident uniform-grid acceleration structure.

    Static Python metadata (dims, counts) keeps jit caches keyed per mesh; the
    arrays live on device. Face data is pre-swizzled to the (F, 16) row layout
    [ax ay az e1x e1y e1z e2x e2y e2z idx_f pad...] so one row gather fetches a
    whole test.
    """

    face_rows: jnp.ndarray  # (N_refs_padded, 16) float32, duplicated per cell ref
    cell_start: jnp.ndarray  # (n_cells + 1,) int32 CSR offsets into face_rows
    gmin: jnp.ndarray  # (3,) float32 grid origin
    inv_h: jnp.ndarray  # (3,) float32 1 / cell size
    h: jnp.ndarray  # (3,) float32 cell size
    dims: tuple  # (gx, gy, gz) static
    n_faces: int  # original face count (before replication)
    max_cell_faces: int  # largest per-cell face list (diagnostic)

    def __repr__(self):  # keep logs readable
        return (
            f"GridAccel(dims={self.dims}, faces={self.n_faces}, "
            f"refs={int(self.face_rows.shape[0])}, max_cell={self.max_cell_faces})"
        )


# Pytree registration: array leaves flow through jit/shard_map; the static
# metadata (dims, counts) keys the compile cache per mesh.
jax.tree_util.register_pytree_node(
    GridAccel,
    lambda g: (
        (g.face_rows, g.cell_start, g.gmin, g.inv_h, g.h),
        (g.dims, g.n_faces, g.max_cell_faces),
    ),
    lambda aux, leaves: GridAccel(*leaves, *aux),
)


def build_grid(tris: np.ndarray, target_faces_per_cell: float = 2.0,
               max_dim: int = 96) -> GridAccel:
    """Build the uniform grid for an (F, 3, 3) triangle soup (host, numpy).

    Resolution picks ~`target_faces_per_cell` average occupancy along the mesh's
    proportions, capped at `max_dim` cells per axis. Degenerate/sentinel-padded
    faces (zero-area, or vertices at the PAD_DISTANCE sentinel) are skipped.
    """
    tris = np.asarray(tris, dtype=np.float32)
    f = tris.shape[0]

    # Drop sentinel padding / degenerate faces from the grid (they never hit)
    finite = np.all(np.abs(tris) < 1.0e8, axis=(1, 2))
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    area2 = np.linalg.norm(np.cross(e1, e2), axis=-1)
    valid = finite & (area2 > 0)
    valid_idx = np.nonzero(valid)[0].astype(np.int32)
    vt = tris[valid]

    if len(vt) == 0:
        raise ValueError("Cannot build a grid over an empty/degenerate mesh")

    lo = vt.min(axis=(0, 1))
    hi = vt.max(axis=(0, 1))
    extent = np.maximum(hi - lo, 1e-6)
    # ~ (n_valid / target) cells total, distributed by axis proportion
    n_cells_target = max(len(vt) / max(target_faces_per_cell, 0.25), 1.0)
    scale = (n_cells_target / np.prod(extent)) ** (1.0 / 3.0)
    dims = np.clip(np.ceil(extent * scale).astype(np.int64), 1, max_dim)
    h = extent / dims
    # Tiny epsilon so points exactly on the upper boundary stay in range
    lo = lo - 1e-4
    h = (hi + 1e-4 - lo) / dims

    # Face AABB -> overlapped cell ranges
    fmin = vt.min(axis=1)
    fmax = vt.max(axis=1)
    c0 = np.clip(((fmin - lo) / h).astype(np.int64), 0, dims - 1)
    c1 = np.clip(((fmax - lo) / h).astype(np.int64), 0, dims - 1)
    spans = c1 - c0 + 1  # (n, 3)

    n_refs = int(np.prod(spans, axis=1).sum())
    cell_of_ref = np.empty(n_refs, dtype=np.int64)
    face_of_ref = np.empty(n_refs, dtype=np.int32)
    pos = 0
    gy, gz = int(dims[1]), int(dims[2])
    for i in range(len(vt)):
        sx, sy, sz = spans[i]
        n_i = sx * sy * sz
        xs = np.arange(c0[i, 0], c1[i, 0] + 1)
        ys = np.arange(c0[i, 1], c1[i, 1] + 1)
        zs = np.arange(c0[i, 2], c1[i, 2] + 1)
        cells = (
            (xs[:, None, None] * gy + ys[None, :, None]) * gz + zs[None, None, :]
        ).reshape(-1)
        cell_of_ref[pos : pos + n_i] = cells
        face_of_ref[pos : pos + n_i] = i
        pos += n_i

    order = np.argsort(cell_of_ref, kind="stable")
    cell_sorted = cell_of_ref[order]
    face_sorted = face_of_ref[order]

    n_cells = int(np.prod(dims))
    counts = np.bincount(cell_sorted, minlength=n_cells)
    cell_start = np.zeros(n_cells + 1, dtype=np.int32)
    np.cumsum(counts, out=cell_start[1:])

    # Swizzled per-reference face rows: [a, e1, e2, original_face_index, pad]
    a = vt[face_sorted, 0]
    e1s = vt[face_sorted, 1] - a
    e2s = vt[face_sorted, 2] - a
    rows = np.zeros((n_refs + 1, 16), dtype=np.float32)  # +1 padding row
    rows[:n_refs, 0:3] = a
    rows[:n_refs, 3:6] = e1s
    rows[:n_refs, 6:9] = e2s
    rows[:n_refs, 9] = valid_idx[face_sorted].astype(np.float32)
    rows[n_refs, 9] = -1.0  # the padding row never hits (zero edges) and has idx -1

    return GridAccel(
        face_rows=jnp.asarray(rows),
        cell_start=jnp.asarray(cell_start),
        gmin=jnp.asarray(lo),
        inv_h=jnp.asarray((1.0 / h).astype(np.float32)),
        h=jnp.asarray(h.astype(np.float32)),
        dims=(int(dims[0]), int(dims[1]), int(dims[2])),
        n_faces=f,
        max_cell_faces=int(counts.max(initial=0)),
    )


def _setup_dda(accel: GridAccel, origins, dirs):
    """Initial DDA state for rays clipped to the grid AABB."""
    dims = jnp.asarray(accel.dims, dtype=jnp.float32)
    gmax = accel.gmin + dims * accel.h

    safe_dir = jnp.where(jnp.abs(dirs) > _EPS, dirs, _EPS)
    inv_d = 1.0 / safe_dir

    # Slab clip to the grid bounds: entry t (>= 0) and exit t
    t0 = (accel.gmin[None] - origins) * inv_d
    t1 = (gmax[None] - origins) * inv_d
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_entry = jnp.maximum(t_near, 0.0)
    misses = t_far < t_entry  # ray never touches the grid

    # Start cell at the (slightly inset) entry point
    p = origins + (t_entry + 1e-5)[:, None] * dirs
    cell = jnp.clip(
        ((p - accel.gmin[None]) * accel.inv_h[None]).astype(jnp.int32),
        0,
        jnp.asarray(accel.dims, dtype=jnp.int32)[None] - 1,
    )

    # Step sign must come from safe_dir, not the raw direction: a component in
    # (-_EPS, 0) is replaced by +_EPS above, and a mismatched step/-inv_d pair
    # yields a NEGATIVE t_max on that axis — the march takes one spurious
    # backward cell step and tests the wrong cell row.
    step = jnp.where(safe_dir >= 0, 1, -1).astype(jnp.int32)
    # t at which the ray crosses the next boundary on each axis
    next_bound = accel.gmin[None] + (cell + (step > 0)).astype(jnp.float32) * accel.h[None]
    t_max = (next_bound - origins) * inv_d
    t_delta = jnp.abs(accel.h[None] * inv_d)

    return cell, step, t_max, t_delta, t_entry, misses


def _test_faces(accel: GridAccel, origins, dirs, ref_idx, lo_window, hi_window):
    """Moller-Trumbore a (R, K) block of gathered face references.

    ref_idx: (R, K) indices into accel.face_rows (clamped to the padding row).
    Returns (t (R, K) with +inf misses, face_idx (R, K) original indices).
    Hits count only when lo_window < t <= hi_window (per ray).
    """
    rows = accel.face_rows[ref_idx]  # (R, K, 16) row gather
    a = rows[..., 0:3]
    e1 = rows[..., 3:6]
    e2 = rows[..., 6:9]
    fidx = rows[..., 9].astype(jnp.int32)

    d = dirs[:, None, :]
    o = origins[:, None, :]
    hvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * hvec, axis=-1)
    valid = jnp.abs(det) > _EPS
    inv = 1.0 / jnp.where(valid, det, 1.0)
    s = o - a
    u = inv * jnp.sum(s * hvec, axis=-1)
    q = jnp.cross(s, e1)
    v = inv * jnp.sum(d * q, axis=-1)
    t = inv * jnp.sum(e2 * q, axis=-1)
    hit = (
        valid
        & (u >= -_EPS)
        & (u <= 1.0 + _EPS)
        & (v >= -_EPS)
        & (u + v <= 1.0 + _EPS)
        & (t > lo_window[:, None])
        & (t <= hi_window[:, None])
        & (fidx >= 0)
    )
    return jnp.where(hit, t, jnp.inf), fidx


def _flat_cell(accel: GridAccel, cell):
    gy, gz = accel.dims[1], accel.dims[2]
    return (cell[:, 0] * gy + cell[:, 1]) * gz + cell[:, 2]


@partial(jax.jit, static_argnames=("accel_dims", "max_steps"))
def _grid_first_hit_impl(
    face_rows, cell_start, gmin, inv_h, h, accel_dims,
    origins, dirs, max_steps,
):
    accel = GridAccel(face_rows, cell_start, gmin, inv_h, h, accel_dims, 0, 0)
    r = origins.shape[0]
    cell, step, t_max, t_delta, t_entry, misses = _setup_dda(accel, origins, dirs)

    # margin matching the dense kernels' t > _EPS acceptance
    eps_lo = jnp.full(r, _EPS, dtype=jnp.float32)

    def cond(state):
        i, active, *_ = state
        return (i < max_steps) & jnp.any(active)

    def body(state):
        i, active, cell, t_max, t_entry, offset, best_t, best_i = state

        flat = _flat_cell(accel, cell)
        start = cell_start[flat]
        count = cell_start[flat + 1] - start
        remaining = count - offset

        pad_row = face_rows.shape[0] - 1
        k_idx = start[:, None] + offset[:, None] + jnp.arange(FACES_PER_STEP)[None]
        in_list = jnp.arange(FACES_PER_STEP)[None] < remaining[:, None]
        ref_idx = jnp.where(active[:, None] & in_list, k_idx, pad_row)

        hi_window = jnp.full(r, jnp.inf, dtype=jnp.float32)
        t_blk, fidx_blk = _test_faces(accel, origins, dirs, ref_idx, eps_lo, hi_window)

        # Best within the block, smallest original face index on exact ties
        t_min = jnp.min(t_blk, axis=-1)
        i_min = jnp.min(
            jnp.where(t_blk == t_min[:, None], fidx_blk, jnp.int32(2**30)), axis=-1
        )
        better = t_min < best_t
        tie = (t_min == best_t) & (i_min < best_i)
        best_t = jnp.where(better, t_min, best_t)
        best_i = jnp.where(better | tie, jnp.where(better, i_min, jnp.minimum(best_i, i_min)), best_i)

        # Advance: stay in a heavy cell, else DDA to the next cell
        more_here = remaining > FACES_PER_STEP
        axis = jnp.argmin(t_max, axis=-1)
        t_exit = jnp.min(t_max, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_next = cell + onehot * step
        t_max_next = t_max + onehot.astype(t_max.dtype) * t_delta

        offset = jnp.where(more_here, offset + FACES_PER_STEP, 0)
        cell = jnp.where(more_here[:, None], cell, cell_next)
        t_entry_next = jnp.where(more_here, t_entry, t_exit)
        t_max = jnp.where(more_here[:, None], t_max, t_max_next)

        dims_i = jnp.asarray(accel.dims, dtype=jnp.int32)
        inside = jnp.all((cell >= 0) & (cell < dims_i[None]), axis=-1)
        # Done when the best hit precedes the next cell's entry (any face in a
        # later cell that could beat it would overlap an already-visited cell)
        active = active & inside & (best_t > t_entry_next + 1e-6)

        return (i + 1, active, cell, t_max, t_entry_next, offset, best_t, best_i)

    init = (
        jnp.asarray(0, jnp.int32),
        ~misses,
        cell,
        t_max,
        t_entry,
        jnp.zeros(r, dtype=jnp.int32),
        jnp.full(r, _BIG, dtype=jnp.float32),
        jnp.full(r, jnp.int32(2**30)),
    )
    _, _, _, _, _, _, best_t, best_i = jax.lax.while_loop(cond, body, init)
    t = jnp.where(best_t >= _BIG, jnp.inf, best_t)
    idx = jnp.where(jnp.isinf(t), -1, best_i)
    return t, idx


@partial(jax.jit, static_argnames=("accel_dims", "max_steps"))
def _grid_any_hit_impl(
    face_rows, cell_start, gmin, inv_h, h, accel_dims,
    starts, dirs, seg_len, max_steps,
):
    accel = GridAccel(face_rows, cell_start, gmin, inv_h, h, accel_dims, 0, 0)
    r = starts.shape[0]
    cell, step, t_max, t_delta, t_entry, misses = _setup_dda(accel, starts, dirs)

    margin = 1e-4  # matches geometry.queries.segments_occluded endpoint slack
    lo = jnp.full(r, margin, dtype=jnp.float32)
    hi = seg_len - margin

    # Occlusion as a THRESHOLDED FIRST HIT: the open segment is blocked iff the
    # earliest hit past the start margin lands before `hi` (the min over faces
    # with t > margin is inside (margin, hi) iff any face is). Tracking the
    # first hit UNBOUNDED (no upper window during the march) is what makes this
    # fast: a ray terminates at the first surface it meets — a few cells in a
    # closed room — instead of marching the entire segment when a hit happens
    # to fall beyond the endpoint. The windowed formulation degenerated to
    # O(grid diagonal) steps on every unblocked segment, which at ~1 ms per
    # scattered (R, K)-row gather made bounce-occlusion the tracer bottleneck.
    def cond(state):
        i, active, *_ = state
        return (i < max_steps) & jnp.any(active)

    def body(state):
        i, active, cell, t_max, t_entry, offset, best_t = state

        flat = _flat_cell(accel, cell)
        start = cell_start[flat]
        count = cell_start[flat + 1] - start
        remaining = count - offset

        pad_row = face_rows.shape[0] - 1
        k_idx = start[:, None] + offset[:, None] + jnp.arange(FACES_PER_STEP)[None]
        in_list = jnp.arange(FACES_PER_STEP)[None] < remaining[:, None]
        ref_idx = jnp.where(active[:, None] & in_list, k_idx, pad_row)

        inf_hi = jnp.full(r, jnp.inf, dtype=jnp.float32)
        t_blk, _ = _test_faces(accel, starts, dirs, ref_idx, lo, inf_hi)
        best_t = jnp.minimum(best_t, jnp.min(t_blk, axis=-1))

        more_here = remaining > FACES_PER_STEP
        axis = jnp.argmin(t_max, axis=-1)
        t_exit = jnp.min(t_max, axis=-1)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        cell_next = cell + onehot * step
        t_max_next = t_max + onehot.astype(t_max.dtype) * t_delta

        offset = jnp.where(more_here, offset + FACES_PER_STEP, 0)
        cell = jnp.where(more_here[:, None], cell, cell_next)
        t_entry_next = jnp.where(more_here, t_entry, t_exit)
        t_max = jnp.where(more_here[:, None], t_max, t_max_next)

        dims_i = jnp.asarray(accel.dims, dtype=jnp.int32)
        inside = jnp.all((cell >= 0) & (cell < dims_i[None]), axis=-1)
        # Stop once the first hit is resolved (no later cell can beat it), the
        # ray left the grid, or the next cell starts past the segment window
        # with nothing found yet inside it.
        active = (
            active & inside & (best_t > t_entry_next + 1e-6) & (t_entry_next < hi)
        )

        return (i + 1, active, cell, t_max, t_entry_next, offset, best_t)

    init = (
        jnp.asarray(0, jnp.int32),
        ~misses,
        cell,
        t_max,
        t_entry,
        jnp.zeros(r, dtype=jnp.int32),
        jnp.full(r, _BIG, dtype=jnp.float32),
    )
    *_, best_t = jax.lax.while_loop(cond, body, init)
    return best_t < hi


def _max_steps(accel: GridAccel) -> int:
    """Worst-case step bound: every cell on the longest DDA march (bounded by
    3x the dims sum) may cost ceil(faces_in_cell / FACES_PER_STEP) iterations.
    The while_loop exits as soon as every ray resolves, so the generous bound
    costs nothing at runtime — it only guarantees a ray crossing many heavy
    cells can never exhaust the budget and silently return no-hit/unoccluded.
    """
    diag = sum(accel.dims)
    per_cell = max(1, -(-int(accel.max_cell_faces) // FACES_PER_STEP))
    return int(3 * diag * per_cell + 16)


def grid_first_hit(accel: GridAccel, origins, dirs):
    """First-hit (t, original_face_idx) through the grid. Matches the dense
    kernels exactly (t == +inf, idx == -1 where a ray escapes)."""
    return _grid_first_hit_impl(
        accel.face_rows, accel.cell_start, accel.gmin, accel.inv_h, accel.h,
        accel.dims,
        jnp.atleast_2d(origins).astype(jnp.float32),
        jnp.atleast_2d(dirs).astype(jnp.float32),
        _max_steps(accel),
    )


def grid_segments_occluded(accel: GridAccel, starts, ends):
    """(R,) bools: open segment start->end blocked. Matches
    geometry.queries.segments_occluded's endpoint-margin semantics."""
    starts = jnp.atleast_2d(starts).astype(jnp.float32)
    ends = jnp.atleast_2d(ends).astype(jnp.float32)
    seg = ends - starts
    length = jnp.linalg.norm(seg, axis=-1)
    dirs = seg / jnp.maximum(length, _EPS)[:, None]
    return _grid_any_hit_impl(
        accel.face_rows, accel.cell_start, accel.gmin, accel.inv_h, accel.h,
        accel.dims, starts, dirs, length, _max_steps(accel),
    )


__all__ = ["GridAccel", "build_grid", "grid_first_hit", "grid_segments_occluded"]
