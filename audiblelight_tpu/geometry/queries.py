"""Batched spatial queries on triangle soups (JAX, jit/vmap-friendly).

These kernels back placement validation (point-in-mesh, nearest-surface distance,
segment occlusion — the reference's hot loops at worldstate.py:1404-1544 via trimesh)
and the ray tracer (first-hit queries). Everything is expressed as dense
(queries x faces) math with face-axis chunking so the working set streams through
VMEM in fixed-size blocks — the TPU-friendly formulation of what a CPU does with an
rtree/BVH. Padded faces use a sentinel far from any scene (PAD_DISTANCE) so padding
never intersects and never dominates a min-reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PAD_DISTANCE = 1.0e9
_EPS = 1.0e-9

# Fixed, slightly irrational ray direction for parity tests: avoids axis-aligned
# edge-grazing on axis-aligned architecture meshes.
_PARITY_DIR = np.array([0.57735027, 0.62882718, 0.52019128])
_PARITY_DIR = _PARITY_DIR / np.linalg.norm(_PARITY_DIR)


def pad_triangles(tris: np.ndarray, multiple: int = 512) -> np.ndarray:
    """Pad (F, 3, 3) triangles to a multiple of `multiple` with far-away sentinels."""
    f = tris.shape[0]
    target = max(multiple, ((f + multiple - 1) // multiple) * multiple)
    if target == f:
        return np.asarray(tris)
    pad = np.full((target - f, 3, 3), PAD_DISTANCE, dtype=tris.dtype)
    # Make padding degenerate as well (all three vertices identical)
    return np.concatenate([tris, pad], axis=0)


def _effective_chunk(n_faces: int, face_chunk: int) -> int:
    """Face-chunk size bounded by the (128-aligned) actual face count.

    Without this, a 12-triangle room padded to a 4096-face chunk makes every
    (rays x faces) intermediate ~340x larger than needed.
    """
    aligned = max(128, ((n_faces + 127) // 128) * 128)
    return min(face_chunk, aligned)

def _ray_tri_t(origins, dirs, tri_a, tri_e1, tri_e2):
    """Moller-Trumbore: intersection parameter t for rays x triangles.

    origins/dirs: (R, 3); tri_a/e1/e2: (F, 3).
    Returns t with shape (R, F): +inf where no intersection.
    """
    h = jnp.cross(dirs[:, None, :], tri_e2[None, :, :])  # (R, F, 3)
    a = jnp.sum(tri_e1[None, :, :] * h, axis=-1)  # (R, F)
    f = jnp.where(jnp.abs(a) > _EPS, 1.0 / jnp.where(jnp.abs(a) > _EPS, a, 1.0), 0.0)
    s = origins[:, None, :] - tri_a[None, :, :]  # (R, F, 3)
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, tri_e1[None, :, :])
    v = f * jnp.sum(dirs[:, None, :] * q, axis=-1)
    t = f * jnp.sum(tri_e2[None, :, :] * q, axis=-1)
    hit = (
        (jnp.abs(a) > _EPS)
        & (u >= -_EPS)
        & (u <= 1.0 + _EPS)
        & (v >= -_EPS)
        & (u + v <= 1.0 + _EPS)
        & (t > _EPS)
    )
    return jnp.where(hit, t, jnp.inf)


@partial(jax.jit, static_argnames=("face_chunk",))
def ray_crossing_counts(points: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096) -> jnp.ndarray:
    """Number of mesh crossings of a fixed-direction ray from each point. (R,) ints."""
    points = jnp.atleast_2d(points)
    d = jnp.broadcast_to(jnp.asarray(_PARITY_DIR, dtype=points.dtype), points.shape)

    f = tris.shape[0]
    face_chunk = _effective_chunk(f, face_chunk)
    n_chunks = max(1, -(-f // face_chunk))
    pad_to = n_chunks * face_chunk
    tris_p = jnp.pad(tris, ((0, pad_to - f), (0, 0), (0, 0)), constant_values=PAD_DISTANCE)
    tri_a = tris_p[:, 0]
    tri_e1 = tris_p[:, 1] - tris_p[:, 0]
    tri_e2 = tris_p[:, 2] - tris_p[:, 0]
    chunks = (
        tri_a.reshape(n_chunks, face_chunk, 3),
        tri_e1.reshape(n_chunks, face_chunk, 3),
        tri_e2.reshape(n_chunks, face_chunk, 3),
    )

    def body(carry, chunk_tris):
        a, e1, e2 = chunk_tris
        t = _ray_tri_t(points, d, a, e1, e2)
        return carry + jnp.sum(jnp.isfinite(t), axis=-1), None

    counts, _ = jax.lax.scan(body, jnp.zeros(points.shape[0], dtype=jnp.int32), chunks)
    return counts


@partial(jax.jit, static_argnames=("face_chunk",))
def points_inside_mesh(points: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096) -> jnp.ndarray:
    """Boolean mask: True where each point is inside the (watertight) mesh.

    Uses ray-crossing parity along a fixed non-axis-aligned direction.
    """
    return ray_crossing_counts(points, tris, face_chunk) % 2 == 1


@partial(jax.jit, static_argnames=("face_chunk",))
def nearest_surface_distance(
    points: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096
) -> jnp.ndarray:
    """Distance from each point to the nearest point on the mesh surface. (R,)."""
    points = jnp.atleast_2d(points)

    f = tris.shape[0]
    face_chunk = _effective_chunk(f, face_chunk)
    n_chunks = max(1, -(-f // face_chunk))
    pad_to = n_chunks * face_chunk
    tris_p = jnp.pad(tris, ((0, pad_to - f), (0, 0), (0, 0)), constant_values=PAD_DISTANCE)
    tri_chunks = tris_p.reshape(n_chunks, face_chunk, 3, 3)

    def point_tri_dist_sq(p, tri):
        """Squared distance point->triangle (Ericson, branchless). p: (R,3), tri: (Fc,3,3)."""
        a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]
        ab = b - a
        ac = c - a
        ap = p[:, None, :] - a[None, :, :]  # (R, Fc, 3)

        d1 = jnp.sum(ab[None] * ap, axis=-1)
        d2 = jnp.sum(ac[None] * ap, axis=-1)

        bp = p[:, None, :] - b[None, :, :]
        d3 = jnp.sum(ab[None] * bp, axis=-1)
        d4 = jnp.sum(ac[None] * bp, axis=-1)

        cp = p[:, None, :] - c[None, :, :]
        d5 = jnp.sum(ab[None] * cp, axis=-1)
        d6 = jnp.sum(ac[None] * cp, axis=-1)

        vc = d1 * d4 - d3 * d2
        vb = d5 * d2 - d1 * d6
        va = d3 * d6 - d5 * d4

        safe = lambda num, den: num / jnp.where(jnp.abs(den) > _EPS, den, 1.0)

        # Region tests (applied in priority order via nested where)
        v_edge_ab = jnp.clip(safe(d1, d1 - d3), 0.0, 1.0)
        w_edge_ac = jnp.clip(safe(d2, d2 - d6), 0.0, 1.0)
        w_edge_bc = jnp.clip(safe(d4 - d3, (d4 - d3) + (d5 - d6)), 0.0, 1.0)

        denom = va + vb + vc
        v_in = safe(vb, denom)
        w_in = safe(vc, denom)

        # Candidate closest points
        p_a = jnp.broadcast_to(a[None], ap.shape)
        p_b = jnp.broadcast_to(b[None], ap.shape)
        p_c = jnp.broadcast_to(c[None], ap.shape)
        p_ab = a[None] + v_edge_ab[..., None] * ab[None]
        p_ac = a[None] + w_edge_ac[..., None] * ac[None]
        p_bc = b[None] + w_edge_bc[..., None] * (c - b)[None]
        p_int = a[None] + v_in[..., None] * ab[None] + w_in[..., None] * ac[None]

        closest = p_int
        closest = jnp.where(((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None], p_bc, closest)
        closest = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None], p_ac, closest)
        closest = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None], p_ab, closest)
        closest = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], p_c, closest)
        closest = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], p_b, closest)
        closest = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], p_a, closest)

        diff = p[:, None, :] - closest
        return jnp.sum(diff * diff, axis=-1)  # (R, Fc)

    def body(carry, tri_chunk):
        d2_chunk = point_tri_dist_sq(points, tri_chunk)
        return jnp.minimum(carry, jnp.min(d2_chunk, axis=-1)), None

    init = jnp.full(points.shape[0], jnp.inf, dtype=points.dtype)
    d2_min, _ = jax.lax.scan(body, init, tri_chunks)
    return jnp.sqrt(d2_min)


def segments_occluded(
    starts: jnp.ndarray, ends: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096,
    accel=None,
) -> jnp.ndarray:
    """True where the open segment start->end is blocked by the mesh. (R,) bools.

    A small endpoint margin keeps segments that *touch* the surface at their
    endpoints (e.g. emitters placed on walls) from counting as occluded.

    With a grid `accel` (geometry.grid.build_grid — the interior-origin
    regime: placement queries, panorama raycasts) the uniform-grid DDA runs;
    otherwise TPU backends dispatch to the Pallas any-hit kernel
    (ops.pallas_kernels.segments_occluded_pallas, streaming VMEM-sized face
    tiles at any face count); the chunked XLA formulation below is the
    non-TPU fallback. All agree exactly.
    """
    from audiblelight_tpu import config as _config

    if accel is not None:
        from audiblelight_tpu.geometry.grid import grid_segments_occluded

        return grid_segments_occluded(accel, jnp.atleast_2d(starts), jnp.atleast_2d(ends))

    if getattr(_config, "USE_PALLAS_RAYCAST", True):
        from audiblelight_tpu.ops.pallas_kernels import (
            pallas_supported,
            segments_occluded_pallas,
        )

        if pallas_supported():
            return segments_occluded_pallas(
                jnp.atleast_2d(starts), jnp.atleast_2d(ends), tris
            )
    return _segments_occluded_xla(starts, ends, tris, face_chunk)


@partial(jax.jit, static_argnames=("face_chunk",))
def _segments_occluded_xla(
    starts: jnp.ndarray, ends: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096
) -> jnp.ndarray:
    """Chunked XLA segment occlusion (fallback / large-mesh path)."""
    starts = jnp.atleast_2d(starts)
    ends = jnp.atleast_2d(ends)
    seg = ends - starts
    length = jnp.linalg.norm(seg, axis=-1, keepdims=True)
    dirs = seg / jnp.maximum(length, _EPS)

    f = tris.shape[0]
    face_chunk = _effective_chunk(f, face_chunk)
    n_chunks = max(1, -(-f // face_chunk))
    pad_to = n_chunks * face_chunk
    tris_p = jnp.pad(tris, ((0, pad_to - f), (0, 0), (0, 0)), constant_values=PAD_DISTANCE)
    tri_a = tris_p[:, 0].reshape(n_chunks, face_chunk, 3)
    tri_e1 = (tris_p[:, 1] - tris_p[:, 0]).reshape(n_chunks, face_chunk, 3)
    tri_e2 = (tris_p[:, 2] - tris_p[:, 0]).reshape(n_chunks, face_chunk, 3)

    margin = 1e-4

    def body(carry, chunk):
        a, e1, e2 = chunk
        t = _ray_tri_t(starts, dirs, a, e1, e2)  # (R, Fc)
        blocked = jnp.any((t > margin) & (t < length - margin), axis=-1)
        return carry | blocked, None

    init = jnp.zeros(starts.shape[0], dtype=bool)
    out, _ = jax.lax.scan(body, init, (tri_a, tri_e1, tri_e2))
    return out


def ray_mesh_first_hit(
    origins: jnp.ndarray, dirs: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096,
    accel=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First-hit distance and face index for rays against the mesh.

    With a grid `accel` (geometry.grid.build_grid) the uniform-grid DDA runs
    — the interior-origin regime, O(cells crossed) per ray instead of O(F).
    Otherwise TPU backends dispatch to the Pallas kernel
    (ops.pallas_kernels.ray_first_hit_pallas), which streams VMEM-sized face
    tiles at any face count; elsewhere the chunked XLA formulation below
    runs. All agree exactly.

    Returns:
        (t, face_idx): t is +inf (and face_idx -1) where a ray escapes.
    """
    from audiblelight_tpu import config as _config

    if accel is not None:
        from audiblelight_tpu.geometry.grid import grid_first_hit

        return grid_first_hit(accel, jnp.atleast_2d(origins), jnp.atleast_2d(dirs))

    if getattr(_config, "USE_PALLAS_RAYCAST", True):
        from audiblelight_tpu.ops.pallas_kernels import (
            pallas_supported,
            ray_first_hit_pallas,
        )

        if pallas_supported():
            origins2 = jnp.atleast_2d(origins)
            dirs2 = jnp.atleast_2d(dirs)
            return ray_first_hit_pallas(origins2, dirs2, tris)
    return _ray_mesh_first_hit_xla(origins, dirs, tris, face_chunk)


@partial(jax.jit, static_argnames=("face_chunk",))
def _ray_mesh_first_hit_xla(
    origins: jnp.ndarray, dirs: jnp.ndarray, tris: jnp.ndarray, face_chunk: int = 4096
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked XLA first-hit (fallback / large-mesh path)."""
    origins = jnp.atleast_2d(origins)
    dirs = jnp.atleast_2d(dirs)

    f = tris.shape[0]
    face_chunk = _effective_chunk(f, face_chunk)
    n_chunks = max(1, -(-f // face_chunk))
    pad_to = n_chunks * face_chunk
    tris_p = jnp.pad(tris, ((0, pad_to - f), (0, 0), (0, 0)), constant_values=PAD_DISTANCE)
    tri_a = tris_p[:, 0].reshape(n_chunks, face_chunk, 3)
    tri_e1 = (tris_p[:, 1] - tris_p[:, 0]).reshape(n_chunks, face_chunk, 3)
    tri_e2 = (tris_p[:, 2] - tris_p[:, 0]).reshape(n_chunks, face_chunk, 3)

    def body(carry, inputs):
        best_t, best_idx, chunk_i = carry
        a, e1, e2 = inputs
        t = _ray_tri_t(origins, dirs, a, e1, e2)  # (R, Fc)
        tmin = jnp.min(t, axis=-1)
        argmin = jnp.argmin(t, axis=-1).astype(jnp.int32) + chunk_i * t.shape[-1]
        better = tmin < best_t
        return (
            jnp.where(better, tmin, best_t),
            jnp.where(better, argmin, best_idx),
            chunk_i + 1,
        ), None

    r = origins.shape[0]
    init = (
        jnp.full(r, jnp.inf, dtype=origins.dtype),
        jnp.full(r, -1, dtype=jnp.int32),
        jnp.asarray(0, dtype=jnp.int32),
    )
    (best_t, best_idx, _), _ = jax.lax.scan(body, init, (tri_a, tri_e1, tri_e2))
    return best_t, best_idx
