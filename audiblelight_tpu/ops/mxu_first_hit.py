"""MXU-formulated ray/mesh first hit for the tracer's bounce wavefront.

The dense Pallas first-hit kernel (ops.pallas_kernels) evaluates ~60 VPU ops
per (ray, face) pair; at 80k rays x 4k LOD faces that is the ray tracer's
dominant per-bounce cost (~8 ms measured on a v5e chip). This module moves the
bulk of that arithmetic onto the MXU by rewriting Moller-Trumbore's scalar
triple products as BILINEAR forms — a (rays, 16) x (16, faces) matmul per
quantity:

With per-face constants  e1 = B - A,  e2 = C - A,  n = e1 x e2,  k = A'.n,
w1 = A' x e1,  w2 = A' x e2   (A' = A - center)  and per-ray  o' = o - center,
od = o' x d:

    u_num = det[s, d, e2] =  od.e2 + d.w2          (s = o' - A')
    v_num = det[d, s, e1] = -od.e1 - d.w1
    a     = det[e1, d, e2] = -d.n
    t_num = det[e2, s, e1] =  o'.n - k

so the shared ray vector r = [od, d, o', 1] (10 components, padded to 16)
against four per-face column vectors gives every quantity as one MXU dot, and
the VPU keeps only the division + the u/v/t window tests + the running min.

Numerics: TPU matmuls at default precision round inputs to bfloat16, and
u_num/v_num are differences of terms ~|o'| larger than themselves. Both are
handled deliberately:

- coordinates are CENTERED on the mesh (the `center` baked into the tables),
  bounding the cancellation amplification at ~|room radius| / |a|;
- the barycentric window uses a relative slop EPS_UV (~2%) so adjacent faces
  overlap slightly at shared edges rather than opening cracks a bf16-rounded
  test could fall through — near an edge either face is an acceptable winner
  for the diffuse tail this kernel serves (the exact direct path never runs
  through it);
- the returned distance is NOT the bf16 estimate: the winning face's plane is
  re-evaluated exactly in f32 (t = (k - o'.n)/(d.n)), so hit points land on
  the true surface and path-length accumulation carries no bf16 bias.

Use this kernel for the stochastic energy tail only. The exact kernels in
ops.pallas_kernels remain the contract-grade path (direct rays, occlusion,
tests). Reference scope: this replaces the inner loop the reference delegates
to the rlr C++ BVH tracer (reference audiblelight/worldstate.py:2148-2181).

MEASURED NEGATIVE RESULT (config.USE_MXU_FIRST_HIT ships False): on a 4k-face
scanned-room LOD the fast-precision variant traced a 60-bounce 80k-ray scan in
581 ms vs 720 ms for the dense VPU kernel (-2.3 ms/bounce), but the bf16
selection noise — amplified ~(room radius / face size) on u_num/v_num —
made the min over ~4k noisy window tests pick false hits at arbitrary t:
rays teleported, 32% of wavefront energy vanished, RT60 collapsed 650 ->
407 ms. Self-face masking and the exact plane-t re-evaluation fix the
self-rehit failure but not the selection noise. Paying for precision erases
the win: Mosaic only lowers DEFAULT/HIGHEST dots, HIGHEST measured 854 ms
(slower than the VPU kernel), and emulating bf16x3 with three DEFAULT dots
costs exactly the matmul time saved. For meshes whose faces are comparable to
the room scale (amplification ~1) the kernel is numerically sound — hence it
stays available behind the flag rather than deleted.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MXU_R_BLOCK = 256  # rays per grid step (matmul rows)
MXU_F_TILE = 1024  # faces per in-kernel dot (matmul columns)
MXU_F_MAX = 8192  # table VMEM bound; bigger meshes use the streaming kernels

EPS_UV = 0.02  # relative barycentric slop: covers the residual det-side bf16
# noise (u = u_num / det with det at fast precision). Overlap beats cracks:
# near an edge either adjacent face is an acceptable winner; a crack kills
# the ray.
T_EPS = 1.0e-4  # minimum hit distance (metres)
_BIG = 3.0e38
_IDX_BIG = 2**30


class MxuFaceTables(NamedTuple):
    """Precomputed per-mesh operands (build once, reuse every bounce)."""

    face_u: jnp.ndarray  # (16, F_pad) u_num columns
    face_v: jnp.ndarray  # (16, F_pad) v_num columns
    face_a: jnp.ndarray  # (16, F_pad) determinant columns
    face_t: jnp.ndarray  # (16, F_pad) t_num columns
    normal: jnp.ndarray  # (F_pad, 3) unnormalised plane normals (f32 exact)
    plane_k: jnp.ndarray  # (F_pad,) plane offsets A'.n
    center: jnp.ndarray  # (3,) the translation baked into the tables
    n_faces: int


def build_mxu_face_tables(tris: jnp.ndarray) -> MxuFaceTables:
    """Build the matmul operands for a mesh. tris: (F, 3, 3) float32."""
    f = int(tris.shape[0])
    if f > MXU_F_MAX:
        raise ValueError(f"{f} faces exceeds MXU_F_MAX={MXU_F_MAX}")
    f_pad = max(MXU_F_TILE, -(-f // MXU_F_TILE) * MXU_F_TILE)

    tris = tris.astype(jnp.float32)
    # Exclude PAD_DISTANCE sentinel faces from the centring bounds (see
    # pallas_kernels.ray_first_hit_pallas — same precision rationale).
    verts = tris.reshape(-1, 3)
    real = jnp.all(jnp.abs(verts) < 1.0e8, axis=-1, keepdims=True)
    vmin = jnp.min(jnp.where(real, verts, jnp.inf), axis=0)
    vmax = jnp.max(jnp.where(real, verts, -jnp.inf), axis=0)
    center = jnp.where(jnp.isfinite(vmin + vmax), 0.5 * (vmin + vmax), 0.0)
    a = tris[:, 0] - center
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = jnp.cross(e1, e2)
    k = jnp.sum(a * n, axis=-1)
    w1 = jnp.cross(a, e1)
    w2 = jnp.cross(a, e2)

    zeros = jnp.zeros((f, 1), jnp.float32)

    def cols(mat_rows):
        # (F, 16) -> padded (16, F_pad); padded faces are all-zero -> a == 0
        # -> invalid -> never hit.
        m = jnp.concatenate(mat_rows, axis=1)
        m = jnp.pad(m, ((0, f_pad - f), (0, 16 - m.shape[1])))
        return m.T

    face_u = cols([e2, w2, zeros, zeros])  # od.e2 + d.(A' x e2)
    face_v = cols([-e1, -w1, zeros, zeros])  # -od.e1 - d.w1
    face_a = cols([jnp.zeros((f, 3), jnp.float32), -n, zeros, zeros])  # -d.n
    face_t = cols([jnp.zeros((f, 6), jnp.float32), n, -k[:, None]])  # o'.n - k

    return MxuFaceTables(
        face_u=face_u,
        face_v=face_v,
        face_a=face_a,
        face_t=face_t,
        normal=jnp.pad(n, ((0, f_pad - f), (0, 0))),
        plane_k=jnp.pad(k, (0, f_pad - f)),
        center=jnp.asarray(center, jnp.float32),
        n_faces=f,
    )


def _mxu_first_hit_kernel(
    n_tiles,
    rmat_ref,  # (R_B, 16) ray operand [od, d, o', 1, 0...]
    prev_ref,  # (R_B, 1) int32: face to EXCLUDE (the ray's launch face)
    fu_ref, fv_ref, fa_ref, ft_ref,  # (16, F_pad) face operands
    t_out_ref, idx_out_ref,  # (R_B, 1)
):
    rmat = rmat_ref[:]
    prev = prev_ref[:]
    r_b = rmat.shape[0]

    def tile(i, carry):
        best_t, best_i = carry
        sl = pl.ds(i * MXU_F_TILE, MXU_F_TILE)
        # u_num/v_num are small differences of terms ~|o'| larger than
        # themselves; at default (bf16-input) precision the min over thousands
        # of noisy window tests selects the extreme noise — false hits at
        # arbitrary t that teleport rays (measured: RT60 collapsing 650->407 ms
        # on a scanned LOD). HIGHEST (~f32) keeps the selection sound — and is
        # the only non-default precision Mosaic lowers (HIGH raises
        # "Unsupported dot precision" on real TPUs; verified on v5e) — which
        # is exactly why the module ships default-off: paying for HIGHEST
        # erases the matmul win (see the docstring's measurements). det/t_num
        # are well-conditioned and stay on the fast path (t is re-evaluated
        # exactly outside the kernel anyway).
        u_num = jnp.dot(rmat, fu_ref[:, sl], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        v_num = jnp.dot(rmat, fv_ref[:, sl], preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        det = jnp.dot(rmat, fa_ref[:, sl], preferred_element_type=jnp.float32)
        t_num = jnp.dot(rmat, ft_ref[:, sl], preferred_element_type=jnp.float32)

        valid = jnp.abs(det) > 1.0e-6
        inv = 1.0 / jnp.where(valid, det, 1.0)
        u = u_num * inv
        v = v_num * inv
        t = t_num * inv
        hit = (
            valid
            & (u >= -EPS_UV)
            & (u <= 1.0 + EPS_UV)
            & (v >= -EPS_UV)
            & (u + v <= 1.0 + EPS_UV)
            & (t > T_EPS)
        )
        # Self-exclusion: a bounce ray re-tests its own launch face, whose
        # bf16 plane-t noise (~cm) dwarfs any epsilon lift-off — without this
        # mask rays re-hit themselves at t~0 and get stuck in place (observed:
        # half the wavefront energy burning on the first bounces).
        lane = jax.lax.broadcasted_iota(jnp.int32, (r_b, MXU_F_TILE), 1) + i * MXU_F_TILE
        t_hit = jnp.where(hit & (lane != prev), t, _BIG)

        t_min = jnp.min(t_hit, axis=1, keepdims=True)  # (R_B, 1)
        i_min = jnp.min(
            jnp.where(t_hit == t_min, lane, jnp.int32(_IDX_BIG)), axis=1, keepdims=True
        )
        better = t_min < best_t  # strict: earlier tile keeps ties (smaller idx)
        return (
            jnp.where(better, t_min, best_t),
            jnp.where(better, i_min, best_i),
        )

    init = (
        jnp.full((r_b, 1), _BIG, jnp.float32),
        jnp.full((r_b, 1), _IDX_BIG, jnp.int32),
    )
    best_t, best_i = jax.lax.fori_loop(0, n_tiles, tile, init)
    t_out_ref[:] = best_t
    idx_out_ref[:] = jnp.where(best_t >= _BIG, -1, best_i)


@partial(jax.jit, static_argnames=("interpret",))
def mxu_first_hit(
    tables: MxuFaceTables,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    prev_face: jnp.ndarray = None,
    interpret: bool = False,
):
    """First-hit (t, face_idx) through the MXU kernel.

    `prev_face` (R,) int32 excludes each ray's launch face from the test (the
    bounce loop passes the previous hit; -1 = no exclusion). Planar faces
    cannot be legitimately re-hit, so the mask is exact.

    Returns (t (R,), idx (R,)): t = +inf, idx = -1 where a ray escapes. t is
    the exact f32 plane intersection of the selected face (see module
    docstring); face SELECTION near edges carries bf16-grade slop.
    """
    r = origins.shape[0]
    r_pad = max(MXU_R_BLOCK, -(-r // MXU_R_BLOCK) * MXU_R_BLOCK)
    f_pad = tables.face_u.shape[1]
    n_tiles = f_pad // MXU_F_TILE

    o_c = origins.astype(jnp.float32) - tables.center
    d = dirs.astype(jnp.float32)
    od = jnp.cross(o_c, d)
    rmat = jnp.concatenate(
        [od, d, o_c, jnp.ones((r, 1), jnp.float32), jnp.zeros((r, 6), jnp.float32)],
        axis=1,
    )  # (R, 16)
    rmat = jnp.pad(rmat, ((0, r_pad - r), (0, 0)))  # zero rays -> det 0 -> miss
    if prev_face is None:
        prev_face = jnp.full((r,), -1, jnp.int32)
    prev = jnp.pad(prev_face.astype(jnp.int32), (0, r_pad - r), constant_values=-1)
    prev = prev[:, None]

    grid = (r_pad // MXU_R_BLOCK,)
    ray_spec = pl.BlockSpec((MXU_R_BLOCK, 16), lambda g: (g, 0), memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec((MXU_R_BLOCK, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    face_spec = pl.BlockSpec((16, f_pad), lambda g: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((MXU_R_BLOCK, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)

    t_sel, idx = pl.pallas_call(
        partial(_mxu_first_hit_kernel, n_tiles),
        grid=grid,
        in_specs=[ray_spec, prev_spec] + [face_spec] * 4,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        interpret=interpret,
    )(rmat, prev, tables.face_u, tables.face_v, tables.face_a, tables.face_t)

    t_sel = t_sel[:r, 0]
    idx = idx[:r, 0]

    # Exact f32 re-evaluation of the winner's plane: the kernel's t carries
    # bf16 rounding; hit points must land on the true surface so the bounce
    # loop's epsilon lift-off works and path lengths stay unbiased.
    safe = jnp.maximum(idx, 0)
    n_g = tables.normal[safe]  # (R, 3)
    k_g = tables.plane_k[safe]
    denom = jnp.sum(d * n_g, axis=-1)
    numer = k_g - jnp.sum(o_c * n_g, axis=-1)
    t_exact = jnp.where(jnp.abs(denom) > 1.0e-9, numer / denom, t_sel)
    t_exact = jnp.where(t_exact > 0.0, t_exact, t_sel)

    t_out = jnp.where(idx >= 0, t_exact, jnp.inf)
    idx_out = jnp.where(idx >= 0, idx, -1)
    return t_out, idx_out


__all__ = ["MxuFaceTables", "build_mxu_face_tables", "mxu_first_hit", "MXU_F_MAX"]
