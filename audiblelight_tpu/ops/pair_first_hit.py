"""Per-ray exact first hit via (ray, tile) pair walks — the production "BVH".

ops.sorted_first_hit showed that BLOCK-granular culling cannot beat the dense
kernel in an enclosed room: 512 coherent rays still collectively reach ~100 of
432 face tiles (measured), while each RAY individually needs only ~6.6. This
module gets per-ray granularity the TPU way:

1.  Slab-test every ray against every tile AABB (a cheap (R, T) pass, ~1.4 ms
    at 80k x 432 measured) and keep each ray's K nearest tiles by entry
    distance (jax.lax.top_k).
2.  Lay the (ray, tile) candidate pairs out TILE-ALIGNED: pairs sort by tile,
    each tile's run pads to whole 512-lane blocks, so every kernel block
    tests 512 rays against exactly ONE tile's 256 faces — dense vector work,
    no masks, the tile id arrives as one scalar per block. Dead/padding lanes
    cluster into blocks the kernel skips at scalar cost (this also gives the
    bounce loop free "compaction": dead rays stop costing face tests).
3.  A per-ray reduction over the K pair results gives the round's best hit; a
    ray is RESOLVED once that hit precedes its next untested tile's entry
    bound (the per-ray ordered early exit a CPU BVH gets from recursion).
    Unresolved rays (typically <2%) take another K tiles in a while_loop —
    conservative and exact at any ray/mesh configuration.

Face tables, tie rules and the per-pair algebra are shared with
ops.sorted_first_hit (identical bilinear Moller-Trumbore columns), so results
match the dense kernels on the Morton-sorted face order. Replaces the per-ray
recursion of the reference's rlr C++ BVH (reference
audiblelight/worldstate.py:2148-2181) with sorted, aligned vector work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiblelight_tpu.ops.sorted_first_hit import (
    SortedTiles,
    TILE_FACES,
    build_sorted_tiles,
)

_EPS = 1e-9
_BIG = 3.0e38
_IDX_BIG = 2**30

PFH_LANES = 512  # pair lanes per kernel block (= rays per block, one tile)
FACE_GROUP = 8


def _pair_kernel(
    tile_id_ref,  # SMEM (8, 1) int32: this 8-block group's tile ids (-1 = dead)
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (1, L) pair-ray rows
    face_ref,  # (n_tiles*TILE_FACES, 16) VMEM bilinear table
    t_out_ref, idx_out_ref,  # (1, L)
    best_t_ref, best_i_ref,  # VMEM scratch (FACE_GROUP, PFH_LANES)
):
    g = pl.program_id(0)
    row = g - (g // 8) * 8
    tl = tile_id_ref[row, 0]

    shape = (FACE_GROUP, PFH_LANES)
    best_t_ref[:] = jnp.full(shape, _BIG, jnp.float32)
    best_i_ref[:] = jnp.full(shape, jnp.int32(_IDX_BIG))

    @pl.when(tl >= 0)
    def _():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        odx = oy * dz - oz * dy
        ody = oz * dx - ox * dz
        odz = ox * dy - oy * dx

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

    best_t = best_t_ref[:]
    best_i = best_i_ref[:]
    t_min = jnp.min(best_t, axis=0, keepdims=True)
    idx = jnp.min(
        jnp.where(best_t == t_min, best_i, jnp.int32(_IDX_BIG)), axis=0, keepdims=True
    )
    t_out_ref[:] = t_min
    idx_out_ref[:] = jnp.where(t_min >= _BIG, -1, idx)


@partial(jax.jit, static_argnames=("interpret",))
def _pair_call(face_tab, o, d, tile_ids, interpret=False):
    n_pad = o.shape[0]
    comp = lambda x, i: x[:, i].reshape(1, -1)
    ray_spec = pl.BlockSpec((1, PFH_LANES), lambda g: (0, g), memory_space=pltpu.VMEM)
    tid_spec = pl.BlockSpec((8, 1), lambda g: (g // 8, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _pair_kernel,
        grid=(n_pad // PFH_LANES,),
        in_specs=[tid_spec] + [ray_spec] * 6
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((FACE_GROUP, PFH_LANES), jnp.float32),
            pltpu.VMEM((FACE_GROUP, PFH_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(
        tile_ids,
        comp(o, 0), comp(o, 1), comp(o, 2),
        comp(d, 0), comp(d, 1), comp(d, 2),
        face_tab,
    )


def _tile_entries(tiles: SortedTiles, o_c: jnp.ndarray, d: jnp.ndarray):
    """Per-(ray, tile) conservative entry distance; +inf where the ray's line
    misses the tile AABB. Built axis-streamed so no (R, T, 3) materialises."""
    r = o_c.shape[0]
    t_n = tiles.tile_lo.shape[0]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
    ent = jnp.zeros((r, t_n), jnp.float32)
    exi = jnp.full((r, t_n), jnp.inf, jnp.float32)
    for ax in range(3):
        t0 = (tiles.tile_lo[None, :, ax] - o_c[:, ax, None]) * inv[:, ax, None]
        t1 = (tiles.tile_hi[None, :, ax] - o_c[:, ax, None]) * inv[:, ax, None]
        ent = jnp.maximum(ent, jnp.minimum(t0, t1))
        exi = jnp.minimum(exi, jnp.maximum(t0, t1))
    return jnp.where(exi >= ent, ent, jnp.inf)


def _one_round(tiles, o_c, d, cand_tile, cand_live, interpret):
    """Test each ray against its K candidate tiles; (t, idx) best per ray.

    cand_tile: (R, K) tile ids; cand_live: (R, K) bool. Pairs lay out
    tile-aligned: each tile's pairs pad to whole PFH_LANES blocks so a kernel
    block serves exactly one tile; dead pairs cluster into skipped blocks.
    """
    r, k = cand_tile.shape
    n_tiles = tiles.n_tiles
    n_pairs = r * k

    pair_ray = jnp.repeat(jnp.arange(r, dtype=jnp.int32), k)
    pair_tile = jnp.where(cand_live, cand_tile, n_tiles).reshape(-1)

    # Tile-aligned layout: counts -> padded offsets -> slot map
    counts = jnp.zeros((n_tiles + 1,), jnp.int32).at[pair_tile].add(1)
    padded = -(-counts[:n_tiles] // PFH_LANES) * PFH_LANES
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )  # (T+1,)
    # Static capacity: every tile may waste at most one partial block.
    cap = n_pairs + n_tiles * PFH_LANES
    cap = -(-cap // PFH_LANES) * PFH_LANES

    order = jnp.argsort(pair_tile, stable=True)  # live pairs grouped by tile
    # rank of each sorted pair within its tile run
    sorted_tile = pair_tile[order]
    pos_in_run = jnp.arange(n_pairs, dtype=jnp.int32) - jnp.searchsorted(
        sorted_tile, sorted_tile, side="left"
    ).astype(jnp.int32)
    slot = jnp.where(
        sorted_tile < n_tiles,
        offsets[jnp.minimum(sorted_tile, n_tiles - 1)] + pos_in_run,
        cap,  # dead pairs drop off the end
    )

    # slot -> pair gather indices (cap,), -1 = padding lane
    slot_to_pair = jnp.full((cap + 1,), -1, jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop"
    )[:cap]

    ray_of_slot = jnp.where(slot_to_pair >= 0, pair_ray[jnp.maximum(slot_to_pair, 0)], 0)
    o_s = o_c[ray_of_slot]
    d_s = d[ray_of_slot]
    # Padding lanes carry a degenerate direction so they never hit.
    dead = (slot_to_pair < 0)[:, None]
    o_s = jnp.where(dead, 0.0, o_s)
    d_s = jnp.where(dead, 0.0, d_s)

    # Per-block tile ids: block b serves the tile whose slot range contains
    # b*PFH_LANES; all-padding blocks (beyond every tile's range) get -1.
    n_blocks = cap // PFH_LANES
    block_start = jnp.arange(n_blocks, dtype=jnp.int32) * PFH_LANES
    blk_tile = (
        jnp.searchsorted(offsets[1:], block_start, side="right").astype(jnp.int32)
    )
    blk_tile = jnp.where(blk_tile >= n_tiles, -1, blk_tile)
    # A block inside a tile's PADDED range but past its live pairs still runs
    # that tile (harmless: its lanes are degenerate); a block whose FIRST lane
    # is padding-only could skip, but detecting that costs more than it saves.
    nb_pad = -(-n_blocks // 8) * 8
    blk_tile = jnp.pad(blk_tile, (0, nb_pad - n_blocks), constant_values=-1)[:, None]
    if cap < nb_pad * PFH_LANES:
        extra = nb_pad * PFH_LANES - cap
        o_s = jnp.pad(o_s, ((0, extra), (0, 0)))
        d_s = jnp.pad(d_s, ((0, extra), (0, 0)))

    t_slot, i_slot = _pair_call(tiles.face_tab, o_s, d_s, blk_tile, interpret)
    t_slot = t_slot.reshape(-1)
    i_slot = i_slot.reshape(-1)

    # Back to (R, K): pair -> slot gather, then per-ray min with tie rule
    pair_slot = jnp.zeros((n_pairs,), jnp.int32).at[order].set(
        jnp.minimum(slot, cap - 1).astype(jnp.int32)
    )
    t_pair = t_slot[pair_slot].reshape(r, k)
    i_pair = i_slot[pair_slot].reshape(r, k)
    # Dead pairs (slot == cap) may alias the last live slot: re-mask. Kernel
    # misses carry _BIG — normalise them (and any negative sentinel) to inf so
    # an all-miss round never reports a pseudo-finite hit.
    live = cand_live
    t_pair = jnp.where(live & (t_pair < _BIG) & (t_pair > 0), t_pair, jnp.inf)
    i_pair = jnp.where(live & (i_pair >= 0), i_pair, _IDX_BIG)
    t_best = jnp.min(t_pair, axis=1)
    i_best = jnp.min(jnp.where(t_pair == t_best[:, None], i_pair, _IDX_BIG), axis=1)
    return t_best, i_best


@partial(jax.jit, static_argnames=("k_slots", "interpret"))
def pair_first_hit(
    tiles: SortedTiles,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    alive: jnp.ndarray = None,
    k_slots: int = 8,
    interpret: bool = False,
):
    """Exact first-hit (t, sorted_face_idx) through per-ray tile walks.

    Rounds of `k_slots` nearest-entry tiles per ray run until every live
    ray's best hit provably precedes all its untested tiles (or its tiles are
    exhausted). Face indices refer to the Morton-sorted order of
    build_sorted_tiles; dead rays return (inf, -1).
    """
    origins = jnp.atleast_2d(origins).astype(jnp.float32)
    dirs = jnp.atleast_2d(dirs).astype(jnp.float32)
    r = origins.shape[0]
    if alive is None:
        alive = jnp.ones((r,), bool)

    o_c = origins - tiles.center
    enter = _tile_entries(tiles, o_c, dirs)  # (R, T)
    enter = jnp.where(alive[:, None], enter, jnp.inf)

    k = min(k_slots, tiles.n_tiles)

    def round_body(state):
        enter_w, best_t, best_i, _ = state
        neg, cand = jax.lax.top_k(-enter_w, k)  # nearest K untested tiles
        cand_enter = -neg
        # <= keeps the tie rule exact: a tile whose entry equals the current
        # best could hold an equal-t hit with a smaller face index.
        cand_live = jnp.isfinite(cand_enter) & (cand_enter <= best_t[:, None])
        t_r, i_r = _one_round(tiles, o_c, dirs, cand, cand_live, interpret)
        better = (t_r < best_t) | ((t_r == best_t) & (i_r < best_i))
        best_t = jnp.where(better, t_r, best_t)
        best_i = jnp.where(better, i_r, best_i)
        # Mark ALL K candidates consumed — dead ones (entry beyond the best
        # hit) can never improve the result, and unconditional consumption
        # guarantees termination in <= ceil(T / k) rounds.
        enter_w = enter_w.at[
            jnp.repeat(jnp.arange(r), k), cand.reshape(-1)
        ].set(jnp.inf)
        # Resolved: best hit strictly precedes every untested tile's entry
        next_enter = jnp.min(enter_w, axis=1)
        unresolved = (next_enter <= best_t) & jnp.isfinite(next_enter)
        return enter_w, best_t, best_i, unresolved

    def cond(state):
        return jnp.any(state[3])

    state0 = (
        enter,
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.full((r,), _IDX_BIG, jnp.int32),
        jnp.ones((r,), bool),
    )
    # One round always runs; the while handles the (rare) unresolved tail.
    state = round_body(state0)
    _, best_t, best_i, _ = jax.lax.while_loop(cond, round_body, state)

    t = jnp.where(jnp.isfinite(best_t) & alive, best_t, jnp.inf)
    idx = jnp.where(jnp.isfinite(t), best_i, -1)
    return t, idx


__all__ = ["pair_first_hit", "build_sorted_tiles", "SortedTiles"]
