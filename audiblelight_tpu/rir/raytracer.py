"""Stochastic acoustic ray tracer over triangle meshes (JAX, wavefront-style).

TPU-native replacement for the reference's C++ `rlr-audio-propagation` engine
(reference worldstate.py:942-973 builds the Context; :2148-2181 simulates). The
algorithm is the classic stochastic ray tracing + diffuse-rain energy histogram:

  1. N rays leave the source with unit-total energy, uniformly over the sphere.
  2. Each bounce: first-hit against the mesh (dense chunked ray x triangle tests —
     the wavefront formulation keeps every step a fixed-shape batched op, which is
     what the TPU wants instead of divergent per-ray BVH recursion), energy is
     attenuated by the per-band surface absorption, and a "diffuse rain" deposit is
     sent to every visible listener: dE = E*(1-a)*cos(theta)/(4 pi^2 d^2) in
     pressure^2 units (calibrated so a direct impulse has amplitude 1/(4 pi d)).
  3. Deposits land in per-band, per-channel energy histograms at the arrival-time
     bin; reflection direction is resampled (specular mirror vs cosine-weighted
     Lambertian, by the surface scattering coefficient).
  4. The IR is synthesised from the histograms with band-filtered noise carriers;
     FOA (AmbiX) channels share the carrier and match the first-order directional
     covariance; the exact direct path is added separately in the amplitude domain.

Validation against the analytic shoebox image-source engine (RT60 / energy decay /
direct-path) is in tests/test_raytracer.py; exact parity with a stochastic C++
tracer is not meaningful (SURVEY.md section 7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audiblelight_tpu import config
from audiblelight_tpu.geometry.queries import ray_mesh_first_hit, segments_occluded
from audiblelight_tpu.ops.star_occlusion import star_segments_occluded
from audiblelight_tpu.ops.tiled_first_hit import tiled_first_hit
from audiblelight_tpu.ops.pallas_kernels import (
    bin_histogram,
    deposit_histogram_foa_pallas,
    deposit_histogram_pallas,
    pallas_supported,
)
from audiblelight_tpu.rir.sh import (
    ambisonic_encoding_gains as _ambi_gains,
    encoding_channels as _encoding_channels,
    spherical_head_gains,
    woodworth_itd,
)


def _band_centers(n_bands: int) -> jnp.ndarray:
    """The tracer's octave-ish band centre frequencies (Hz), shared by the
    histogram's binaural head-shadow weighting and the synthesis filterbank."""
    return jnp.asarray(
        np.geomspace(125.0, 8000.0, n_bands) if n_bands > 1 else np.array([1000.0]),
        dtype=jnp.float32,
    )


def _use_fused_deposit() -> bool:
    """True when the fused Pallas deposit+histogram kernel should run (TPU)."""
    return bool(getattr(config, "USE_PALLAS_RAYCAST", True)) and pallas_supported()


def _mxu_tables_for(tris, accel, mesh_tiles):
    """Face tables for the MXU bounce first-hit, or None when it doesn't apply.

    The MXU formulation serves the stochastic wavefront on TPU for meshes that
    fit its VMEM tables (shoeboxes, acoustic LODs). Callers with an explicit
    accel/tile structure, non-TPU backends, or big meshes keep the exact
    kernels. Built ONCE before the bounce scan — the tables are loop
    constants.
    """
    from audiblelight_tpu.ops.mxu_first_hit import MXU_F_MAX, build_mxu_face_tables

    if (
        getattr(config, "USE_MXU_FIRST_HIT", True)
        and pallas_supported()
        and accel is None
        and mesh_tiles is None
        and tris.shape[0] <= MXU_F_MAX
    ):
        return build_mxu_face_tables(tris)
    return None


def _sphere_directions(key, n: int) -> jnp.ndarray:
    """n uniformly distributed unit vectors."""
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _cosine_hemisphere(key, normals: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted directions about each (R, 3) normal."""
    r = normals.shape[0]
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (r,))
    u2 = jax.random.uniform(k2, (r,))
    # Local frame sample
    rad = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    local = jnp.stack(
        [rad * jnp.cos(phi), rad * jnp.sin(phi), jnp.sqrt(1.0 - u1)], axis=-1
    )
    # Build tangent frame per normal
    helper = jnp.where(
        (jnp.abs(normals[:, 0]) < 0.9)[:, None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), normals.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), normals.shape),
    )
    t1 = jnp.cross(normals, helper)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(normals, t1)
    return (
        local[:, 0:1] * t1 + local[:, 1:2] * t2 + local[:, 2:3] * normals
    )



def _tpu_compiler_options() -> dict | None:
    """Raise the TPU scoped-vmem ceiling for the tracer programs.

    The culled raycast kernels keep a whole-mesh face table VMEM-resident;
    inside the bounce scan the default scoped-vmem budget (16 MiB) rejects the
    custom call, so the tracer jits compile with a 64 MiB ceiling on TPU
    backends (ignored elsewhere — CPU rejects unknown options, so None).
    """
    from audiblelight_tpu.ops.pallas_kernels import pallas_supported

    return {"xla_tpu_scoped_vmem_limit_kib": 65536} if pallas_supported() else None


def _lazy_jit(fn, **jit_kwargs):
    """jax.jit whose compiler options are resolved at FIRST CALL, not import.

    Backend identity (TPU vs CPU) is unknown at import time, and
    `compiler_options` is only legal on a TOP-LEVEL jit — so the raised
    scoped-vmem ceiling is applied exactly when a call actually passes the
    culled accel structures (star / mesh_tiles), which only top-level callers
    (WorldStateRLR.get_irs) do. Calls without them — including the bench's
    nested-jit pipeline — get a plain jit.
    """
    box = {}

    def wrapper(*args, **kwargs):
        needs_vmem = (
            kwargs.get("star") is not None or kwargs.get("mesh_tiles") is not None
        )
        key = "opts" if needs_vmem else "plain"
        if key not in box:
            box[key] = jax.jit(
                fn,
                compiler_options=_tpu_compiler_options() if needs_vmem else None,
                **jit_kwargs,
            )
        return box[key](*args, **kwargs)

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    wrapper.__wrapped__ = fn
    return wrapper


@partial(
    _lazy_jit,
    static_argnames=("n_rays", "max_depth", "n_bins", "bin_dt", "c", "encoding", "face_chunk", "occlusion", "transmission", "shared_visibility", "sh_order", "decimate"),
)
def trace_energy_histogram(
    key: jax.Array,
    tris: jnp.ndarray,
    face_absorption: jnp.ndarray,
    face_scattering: jnp.ndarray,
    source_pos: jnp.ndarray,
    listener_pos: jnp.ndarray,
    n_rays: int = 2000,
    max_depth: int = 50,
    n_bins: int = 512,
    bin_dt: float = 0.002,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    face_chunk: int = 4096,
    # KEYWORD-ONLY below: the _lazy_jit wrapper detects the culled accel
    # structures (star / mesh_tiles) in kwargs to apply the raised scoped-VMEM
    # ceiling — a positional star would silently compile without it and be
    # rejected by the 16 MiB default budget.
    *,
    occlusion: bool = True,
    tri_normals: jnp.ndarray = None,
    face_transmission: jnp.ndarray = None,
    transmission: bool = False,
    shared_visibility: bool = True,
    accel=None,
    star=None,
    mesh_tiles=None,
    face_occlusion: jnp.ndarray = None,
    sh_order: int = 1,
    decimate: bool = False,
    hrtf=None,
) -> jnp.ndarray:
    """Trace rays from one source; return per-channel per-band energy histograms.

    Arguments:
        tris: (F, 3, 3) triangles (may include PAD_DISTANCE sentinels).
        face_absorption: (F, B) per-band absorption in [0, 1].
        face_scattering: (F,) scattering coefficient in [0, 1].
        source_pos: (3,) source position.
        listener_pos: (C, 3) listener positions (C=1 for foa/binaural).
        n_bins/bin_dt: histogram length and bin width in seconds.
        encoding: "omni" | "foa" | "binaural".
        face_transmission: (F, B) fraction of NON-ABSORBED energy transmitted
            through each face (required when `transmission=True`).
        transmission: enable through-surface transmission — each bounce splits
            the non-absorbed energy into a reflected part (1-tau, deposits +
            reflects as before) and a transmitted part (tau) that continues past
            the face; a single Russian-roulette branch per ray keeps the
            wavefront fixed-shape and the estimate unbiased. Matches the
            reference rlr config's `transmission` field (reference
            tests/test_worldstate_rlr.py:810-835). With `transmission=False`
            results are bit-identical to builds without this feature.
        shared_visibility: for multi-capsule arrays (cl > 1), test diffuse-rain
            visibility once per hit point against the ARRAY CENTROID instead of
            per capsule — a cl-fold cut of the tracer's dominant cost on
            nonconvex meshes. Capsule spacing (centimetres) is far below scene
            scale, so per-capsule visibility differs only for blockers grazing
            the array itself; set False for exact per-capsule queries (the
            reference rlr engine's per-listener behaviour).
        face_occlusion: optional (C_occ, F) bool table — True where diffuse
            rain from face f toward listener (or centroid when C_occ == 1) is
            blocked, precomputed at the face centroids (WorldStateRLR's
            "acoustic LOD" mode). When given, per-bounce visibility becomes a
            gather by hit-face index instead of a ray query — exact up to the
            within-face penumbra (faces are decimation-cell sized).

    Returns:
        (C_out, B, n_bins) histogram. For "omni", entries are pressure^2 energies.
        For "foa"/"binaural", channel 0 (W / left-reference) carries energy and the
        remaining channels carry signed direction-weighted energy for covariance
        matching at synthesis time.
    """
    if transmission and face_transmission is None:
        raise ValueError("transmission=True requires face_transmission (F, B)")
    n_bands = face_absorption.shape[1]
    cl = listener_pos.shape[0]
    c_out = _encoding_channels(encoding, cl)

    key, k0 = jax.random.split(key)
    dirs0 = _sphere_directions(k0, n_rays)
    origins0 = jnp.broadcast_to(source_pos, (n_rays, 3)).astype(jnp.float32)
    energy0 = jnp.full((n_rays, n_bands), 1.0 / n_rays, dtype=jnp.float32)
    dist0 = jnp.zeros(n_rays, dtype=jnp.float32)
    alive0 = jnp.ones(n_rays, dtype=bool)

    if tri_normals is None:
        # NOTE: computing normals inside a LARGER fused program miscompiles on
        # the axon TPU backend (the norm evaluates ~0 and normals blow up to
        # ~1e13 — observed when this code is inlined into a shard_map body).
        # Standalone-jitted tracing is fine; composed callers (parallel.
        # shard_trace_rirs) must precompute normals and pass them in.
        tri_normals = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        tri_normals = tri_normals / jnp.maximum(
            jnp.linalg.norm(tri_normals, axis=-1, keepdims=True), 1e-12
        )

    hist0 = jnp.zeros((c_out, n_bands, n_bins), dtype=jnp.float32)
    band_freqs = _band_centers(n_bands)
    # Measured-HRTF binaural: per-direction band powers, computed ONCE outside
    # the bounce loop (loop-invariant; see rir.hrtf).
    hrtf_bp = (
        hrtf.band_powers(band_freqs)
        if (hrtf is not None and encoding == "binaural")
        else None
    )
    keys = jax.random.split(key, max_depth)
    mxu_tables = _mxu_tables_for(tris, accel, mesh_tiles)

    def make_bounce(r_src):
        # Phase-width-parameterised bounce (see trace_energy_histogram_multi's
        # make_bounce); the single-source tracer decimates identically.
        def bounce(carry, k_step):
            origins, dirs, energy, dist, alive, prev_face, hist = carry

            if mesh_tiles is not None:
                # Reachability-culled first hit (surface-origin wavefront regime)
                t, face = tiled_first_hit(mesh_tiles, origins, dirs)
            elif mxu_tables is not None:
                from audiblelight_tpu.ops.mxu_first_hit import mxu_first_hit

                t, face = mxu_first_hit(mxu_tables, origins, dirs, prev_face)
            else:
                t, face = ray_mesh_first_hit(origins, dirs, tris, face_chunk, accel=accel)
            hit_ok = alive & jnp.isfinite(t)
            t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
            face_safe = jnp.maximum(face, 0)
            hit = origins + t_safe[:, None] * dirs
            new_dist = dist + t_safe

            normal = tri_normals[face_safe]
            # Flip normals to face the incoming ray
            normal = jnp.where(
                (jnp.sum(normal * dirs, axis=-1) > 0)[:, None], -normal, normal
            )

            alpha = face_absorption[face_safe]  # (R, B)
            e_nonabs = energy * (1.0 - alpha)
            if transmission:
                tau = face_transmission[face_safe]  # (R, B)
                e_refl = e_nonabs * (1.0 - tau)
                e_trans = e_nonabs * tau
            else:
                e_refl = e_nonabs

            # --- Diffuse rain toward every listener -------------------------------
            # hit -> listener geometry: (C, R)
            vec = listener_pos[:, None, :] - hit[None, :, :]
            d_l = jnp.linalg.norm(vec, axis=-1)
            dir_l = vec / jnp.maximum(d_l[..., None], 1e-9)
            cos_th = jnp.maximum(jnp.sum(dir_l * normal[None], axis=-1), 0.0)

            # Visibility: offset start off the surface to dodge self-intersection
            if occlusion and face_occlusion is not None:
                # Precomputed per-face rain visibility: one gather per bounce
                occ = jnp.broadcast_to(face_occlusion[:, face_safe], (cl, r_src))
            elif occlusion and star is not None and shared_visibility:
                # Azimuth-culled star kernel against the array centroid
                occ1 = star_segments_occluded(star, hit + 1e-4 * normal, jnp.mean(listener_pos, axis=0))
                occ = jnp.broadcast_to(occ1[None], (cl, r_src))
            elif occlusion and star is not None:
                # Exact per-capsule star queries (capsules lie within star.r_pad)
                occ = jnp.stack([
                    star_segments_occluded(star, hit + 1e-4 * normal, listener_pos[i])
                    for i in range(cl)
                ])
            elif occlusion and shared_visibility and cl > 1:
                center = jnp.mean(listener_pos, axis=0)
                occ1 = segments_occluded(
                    hit + 1e-4 * normal,
                    jnp.broadcast_to(center, (r_src, 3)),
                    tris, face_chunk, accel=accel,
                )
                occ = jnp.broadcast_to(occ1[None], (cl, r_src))
            elif occlusion:
                starts = jnp.broadcast_to(hit + 1e-4 * normal, (cl, r_src, 3)).reshape(-1, 3)
                ends = jnp.repeat(listener_pos, r_src, axis=0)
                occ = segments_occluded(starts, ends, tris, face_chunk, accel=accel).reshape(cl, r_src)
            else:
                # Convex enclosure: interior segments are never blocked
                # (geometry.mesh.TriMesh.is_convex), so the query is skipped exactly.
                occ = jnp.zeros((cl, r_src), dtype=bool)

            visible = hit_ok[None] & (~occ) & (cos_th > 0)
            # pressure^2-unit deposit: E*(1-a)*cos(theta) / (4 pi^2 d^2)
            deposit = (
                e_refl[None]  # (1, R, B) -> broadcast C
                * (cos_th / (4.0 * jnp.pi**2 * jnp.maximum(d_l, 1e-2) ** 2))[..., None]
                * visible[..., None]
            )  # (C, R, B)

            arrival = (new_dist[None] + d_l) / c  # (C, R) seconds
            bin_idx = jnp.clip((arrival / bin_dt).astype(jnp.int32), 0, n_bins - 1)
            in_range = arrival < (n_bins * bin_dt)
            deposit = deposit * in_range[..., None]

            if encoding == "omni":
                # hist: (C, B, n_bins). bin_histogram folds each listener's deposits
                # with an in-VMEM one-hot matmul on TPU (scatter-add elsewhere).
                add = bin_histogram(bin_idx, deposit, n_bins)  # (C, n_bins, B)
                hist = hist + jnp.moveaxis(add, 1, 2)
            else:
                # Single listener; accumulate channel-weighted deposits
                # ARRIVAL direction at the listener is hit -> listener
                # NEGATED: the encoders take receiver->source vectors (the
                # direct path passes source - listener); dir_l is the
                # propagation direction listener <- hit.
                if encoding == "binaural":
                    if hrtf_bp is not None:
                        # measured HRTF set: band-averaged |H_ear|^2 gathered
                        # at the arrival direction (rir.hrtf — the rlr
                        # engine's measured-HRTF ChannelLayout behaviour)
                        gains = hrtf.band_power_at(-dir_l[0], hrtf_bp)
                    else:
                        # spherical-head shadow fallback: per-BAND [L, R]
                        # gains (the physical ILD tilt — see rir.sh)
                        gains = spherical_head_gains(-dir_l[0], band_freqs) ** 2
                    weighted = deposit[0][:, None, :] * gains  # (R, 2, B)
                else:
                    # foa / sh{N}: ambisonic gains at the tail's encode order
                    gains = _ambi_gains(-dir_l[0], sh_order, encoding)  # (R, C_out)
                    weighted = deposit[0][:, None, :] * gains[:, :, None]  # (R, C_out, B)
                add = bin_histogram(
                    bin_idx[0:1], weighted.reshape(1, r_src, -1), n_bins
                )  # (1, n_bins, C_out*B)
                hist = hist + jnp.moveaxis(
                    add.reshape(n_bins, hist.shape[0], n_bands), 0, -1
                )

            # --- Reflect ----------------------------------------------------------
            if transmission:
                k_spec, k_diff, k_trans = jax.random.split(k_step, 3)
            else:
                k_spec, k_diff = jax.random.split(k_step)
            spec_dir = dirs - 2.0 * jnp.sum(dirs * normal, axis=-1, keepdims=True) * normal
            diff_dir = _cosine_hemisphere(k_diff, normal)
            s = face_scattering[face_safe]
            go_diffuse = jax.random.uniform(k_spec, (r_src,)) < s
            new_dirs = jnp.where(go_diffuse[:, None], diff_dir, spec_dir)
            new_origins = hit + 1e-4 * normal
            new_energy = e_refl

            if transmission:
                # Russian roulette between reflect and transmit, branch probability
                # proportional to band-mean branch energy; the chosen branch carries
                # its energy divided by its probability (unbiased estimator).
                w_r = jnp.mean(e_refl, axis=-1)
                w_t = jnp.mean(e_trans, axis=-1)
                p_t = w_t / jnp.maximum(w_r + w_t, 1e-30)
                go_trans = jax.random.uniform(k_trans, (r_src,)) < p_t
                e_branch_t = e_trans / jnp.maximum(p_t, 1e-12)[:, None]
                e_branch_r = e_refl / jnp.maximum(1.0 - p_t, 1e-12)[:, None]
                new_energy = jnp.where(go_trans[:, None], e_branch_t, e_branch_r)
                # Transmitted rays keep their direction and restart just past the face
                new_dirs = jnp.where(go_trans[:, None], dirs, new_dirs)
                new_origins = hit + jnp.where(go_trans[:, None], -1e-4, 1e-4) * normal

            # Kill rays that escaped, ran out of energy, or travelled past the window
            new_alive = (
                hit_ok
                & (jnp.max(new_energy, axis=-1) * n_rays > 1e-6)
                & (new_dist < c * n_bins * bin_dt)
            )

            # Next bounce excludes the face just hit (MXU kernel self-mask);
            # -1 where the ray missed.
            new_prev = jnp.where(hit_ok, face, -1)
            return (new_origins, new_dirs, new_energy, new_dist, new_alive, new_prev, hist), None

        return bounce

    prev0 = jnp.full(origins0.shape[:1], -1, jnp.int32)
    carry = (origins0, dirs0, energy0, dist0, alive0, prev0, hist0)
    phases = decimation_phases(n_rays, max_depth, decimate)
    for pi, (start, end, r_src_phase) in enumerate(phases):
        if pi > 0:
            carry = _halve_wavefront(carry, 1, phases[pi - 1][2], r_src_phase)
        carry = _bounce_segment(make_bounce(r_src_phase), carry, keys, start, end)
    return carry[-1]


def decimation_phases(n_rays: int, max_depth: int, enabled: bool) -> tuple:
    """Static (start_bounce, end_bounce, rays_per_source) schedule for
    progressive wavefront decimation.

    In a reverberant room the mean free path (~4V/S, a few metres) is far
    below the IR distance window, so rays stay alive for the FULL bounce
    budget and the first-hit kernel pays every lane every bounce. The late
    bounces only shape the low-energy tail, where per-bin deposit counts are
    high (each late bin collects deposits from many bounce generations) — so
    the wavefront can be THINNED instead: at each breakpoint keep the first
    half of each source's rays and double their energy. Ray indices are
    exchangeable (iid PRNG directions), so fixed-subset selection is Russian
    roulette — the histogram stays an unbiased estimator with per-bin energy
    variance growing only where deposits are already dense (measured <10%
    added per-bin noise on a -40 dB tail region; tests/test_raytracer.py
    asserts total-energy and RT60 agreement with the undecimated trace).

    Static breakpoints at depth/3 and 2*depth/3 keep every phase a fixed
    XLA shape. Short or thin traces ((depth < 24) or (rays < 2048)) run a
    single phase — bitwise identical to the undecimated loop.
    """
    if not enabled or max_depth < 24 or n_rays < 2048:
        return ((0, max_depth, n_rays),)
    b1, b2 = max_depth // 3, (2 * max_depth) // 3
    return ((0, b1, n_rays), (b1, b2, n_rays // 2), (b2, max_depth, n_rays // 4))


def _bounce_segment(bounce, init, keys, start, end):
    """while_loop over bounces [start, end) with the all-dead early exit."""
    def cond(state):
        i, carry = state
        return (i < end) & jnp.any(carry[4])

    def body(state):
        i, carry = state
        new_carry, _ = bounce(carry, keys[i])
        return (i + 1, new_carry)

    _, final = jax.lax.while_loop(cond, body, (jnp.asarray(start), init))
    return final


def _halve_wavefront(carry, n_sources, r_now, r_next):
    """Keep each source's first r_next rays, scaling energy by r_now/r_next
    (the Russian-roulette reweighting that keeps the estimator unbiased)."""
    origins, dirs, energy, dist, alive, prev_face, hist = carry

    def keep(x):
        return x.reshape((n_sources, r_now) + x.shape[1:])[:, :r_next].reshape(
            (n_sources * r_next,) + x.shape[1:]
        )

    boost = jnp.float32(r_now / r_next)
    return (
        keep(origins), keep(dirs), keep(energy) * boost, keep(dist),
        keep(alive), keep(prev_face), hist,
    )


@partial(
    jax.jit,
    # bin_dt is static so the envelope upsample factor (bin_dt * sr) is a
    # Python int at trace time — it is a config constant at every call site.
    static_argnames=("n_samples", "bin_dt", "sr", "encoding"),
)
def synthesize_ir_from_histogram(
    key: jax.Array,
    hist: jnp.ndarray,
    band_freqs: jnp.ndarray,
    n_samples: int,
    bin_dt: float,
    sr: int = config.SAMPLE_RATE,
    encoding: str = "omni",
) -> jnp.ndarray:
    """Turn (C_out, B, n_bins) energy histograms into a (C_out, n_samples) IR.

    Band-limited Gaussian noise carriers are envelope-shaped so each histogram
    bin's time-integrated squared pressure equals its energy. For foa/binaural the
    carrier is shared across channels and channel envelopes are the ratio
    E_ch/sqrt(E_ref) (first-order covariance matching); omni capsules get
    independent carriers (diffuse-field decorrelation).
    """
    c_out, n_bands, n_bins = hist.shape
    bin_samples = bin_dt * sr

    # Carrier FFT length: on TPU, non-power-of-two FFTs (e.g. 24000 = 2^5*3*5^3)
    # lower to slow mixed-radix/Bluestein code; the carriers are band-filtered
    # NOISE, so synthesising them at the next power of two and cropping to
    # n_samples is statistically identical and measurably faster. CPU keeps the
    # exact-length transform so pinned golden fixtures stay stable.
    if pallas_supported():
        n_fft = 1 << (n_samples - 1).bit_length()
    else:
        n_fft = n_samples

    # --- band filterbank (complementary in power) ----------------------------
    n_freq = n_fft // 2 + 1
    freqs = jnp.arange(n_freq) * (sr / n_fft)
    band_freqs = jnp.asarray(band_freqs, dtype=jnp.float32)
    if n_bands == 1:
        power_w = jnp.ones((1, n_freq))
    else:
        logf = jnp.log(jnp.maximum(freqs, 1.0))
        logb = jnp.log(band_freqs)
        idx_hi = jnp.clip(jnp.searchsorted(logb, logf), 1, n_bands - 1)
        idx_lo = idx_hi - 1
        w_hi = jnp.clip(
            (logf - logb[idx_lo]) / jnp.maximum(logb[idx_hi] - logb[idx_lo], 1e-9),
            0.0,
            1.0,
        )
        power_w = jnp.zeros((n_bands, n_freq))
        power_w = power_w.at[idx_lo, jnp.arange(n_freq)].add(1.0 - w_hi)
        power_w = power_w.at[idx_hi, jnp.arange(n_freq)].add(w_hi)
    filt = jnp.sqrt(power_w)  # (B, F): sum of squared mags = 1 per bin

    # --- noise carriers ------------------------------------------------------
    n_carriers = n_bands if encoding != "omni" else c_out * n_bands
    white = jax.random.normal(key, (n_carriers, n_fft))
    spec = jnp.fft.rfft(white, axis=-1)
    if encoding == "omni":
        spec = spec.reshape(c_out, n_bands, n_freq) * filt[None]
        carriers = jnp.fft.irfft(spec, n=n_fft, axis=-1)[..., :n_samples]
    else:
        spec = spec * filt
        carriers = jnp.fft.irfft(spec, n=n_fft, axis=-1)[None, ..., :n_samples]
        carriers = jnp.broadcast_to(carriers, (c_out, n_bands, n_samples))
    # per-band carrier variance (analytic): mean power = sum(|H|^2)/n_freq-ish;
    # compute empirically in-graph for robustness.
    var = jnp.mean(carriers**2, axis=-1, keepdims=True) + 1e-20  # (C|1, B, 1)

    # --- envelopes -----------------------------------------------------------
    if encoding in ("omni", "binaural"):
        # Per-channel energies: omni capsules carry independent energy; the
        # binaural channels carry POWER-weighted (|H_ear|^2) energies, so each
        # ear's amplitude envelope is sqrt of its own energy (the shared
        # carrier below keeps interaural coherence).
        e_ref = hist  # (C, B, bins)
    else:
        # Ambisonics: channel 0 (W, unit gain) carries energy; the remaining
        # channels carry SIGNED direction-weighted energy, and dividing by
        # sqrt(E_W) recovers their amplitude gains (covariance matching).
        e_ref = jnp.broadcast_to(jnp.maximum(hist[0:1], 0.0), hist.shape)
    env_bins = hist / jnp.sqrt(jnp.maximum(e_ref, 1e-20) * bin_samples)  # (C, B, bins)

    # Linear-interpolate envelopes to sample resolution.
    k_up = int(round(bin_samples))
    window = pallas_supported() and abs(bin_samples - k_up) < 1e-9 and k_up >= 1
    env = _interp_envelope(env_bins, n_samples, bin_samples, window=window)

    ir = jnp.sum(carriers / jnp.sqrt(var) * env, axis=1)  # (C, S)
    return ir.astype(jnp.float32)


def _interp_envelope(
    env_bins: jnp.ndarray, n_samples: int, bin_samples: float, window: bool
) -> jnp.ndarray:
    """Upsample (..., n_bins) histogram-bin envelopes to sample resolution.

    window=False: direct gather interpolation (the reference formulation).
    window=True (TPU; requires integer bin_samples): the gather lowers to a
    96k-index dynamic gather on TPU (~30 ms/source at 4 s IRs), but the
    interpolation is k-periodic in the output index, so it is exactly a
    3-tap window matmul per bin: out[q*k + r] = (1-f)*env[lo] + f*env[hi]
    with lo in {q-1, q} by r — one (3, k) constant weight table einsummed
    against shifted envelope copies. The edge-padded head reproduces the
    gather's clipped lo/frac at q == 0 exactly; the tail never clips since
    n_bins * bin_dt >= n_samples/sr + bin_dt by construction
    (tests/test_raytracer.py pins window == gather equality).
    """
    n_bins = env_bins.shape[-1]
    if window:
        k_up = int(round(bin_samples))
        r_off = jnp.arange(k_up) / k_up - 0.5
        f_lo = jnp.where(r_off < 0, r_off + 1.0, r_off)
        w_up = jnp.stack(
            [
                jnp.where(r_off < 0, 1.0 - f_lo, 0.0),  # env[q-1]
                jnp.where(r_off < 0, f_lo, 1.0 - f_lo),  # env[q]
                jnp.where(r_off < 0, 0.0, f_lo),  # env[q+1]
            ]
        )  # (3, k_up)
        ep = jnp.concatenate(
            [env_bins[..., :1], env_bins, env_bins[..., -1:]], axis=-1
        )
        sh = jnp.stack(
            [ep[..., 0:n_bins], ep[..., 1 : n_bins + 1], ep[..., 2 : n_bins + 2]],
            axis=-2,
        )  # (..., 3, bins)
        up = jnp.einsum("...kq,kr->...qr", sh, w_up)
        return up.reshape(env_bins.shape[:-1] + (n_bins * k_up,))[..., :n_samples]
    t_samples = jnp.arange(n_samples) / bin_samples - 0.5
    lo = jnp.clip(jnp.floor(t_samples).astype(jnp.int32), 0, n_bins - 1)
    hi = jnp.clip(lo + 1, 0, n_bins - 1)
    frac = jnp.clip(t_samples - lo, 0.0, 1.0)
    return env_bins[..., lo] * (1 - frac) + env_bins[..., hi] * frac


def _linear_phase(delay_samp: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """exp(-2 pi j k delay / N) on the rfft grid, float32-safe at any IR length.

    The naive float32 product k * delay loses ~0.03 rad at reference-parity
    IR lengths (4 s at 24 kHz: k*delay ~ 4.6e9, ulp ~512) — audible broadband
    noise around the impulse. Delay splits into exact integer + fractional
    parts and (k * d_int) mod N is computed exactly in int32 (the same
    construction rir.image_source uses; intermediates stay below 2^31 for IRs
    up to ~740k samples).

    Arguments:
        delay_samp: (...,) delays in samples (may be fractional/negative).
    Returns:
        (..., n_freq) complex64 phasors.
    """
    n_freq = n_samples // 2 + 1
    d_int = jnp.floor(delay_samp).astype(jnp.int32)
    d_frac = (delay_samp - d_int.astype(jnp.float32))[..., None]
    d_mod = jnp.mod(d_int, n_samples)[..., None]
    d_hi = d_mod >> 8
    d_lo = d_mod & 255
    k_row = jnp.arange(n_freq, dtype=jnp.int32).reshape(
        (1,) * (d_mod.ndim - 1) + (n_freq,)
    )
    prod_mod = jnp.mod(
        jnp.mod(jnp.mod(k_row * d_hi, n_samples) << 8, n_samples) + k_row * d_lo,
        n_samples,
    )
    phase = (-2.0 * jnp.pi / n_samples) * (
        prod_mod.astype(jnp.float32) + k_row.astype(jnp.float32) * d_frac
    )
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def _binaural_direct_ir(dirs, amp, dist, n_samples, sr, c, hrtf=None):
    """Exact binaural direct path: per-ear Woodworth ITD + spherical-head
    shadow magnitude on the full rfft grid, synthesised linear-phase.

    The other encodings place a windowed sinc at the head-centre delay; ears
    need a frequency-DEPENDENT magnitude (the ILD tilt) and per-ear delays,
    which the frequency-domain form carries exactly (same construction as
    diffracted_path_ir). dirs are receiver->source unit vectors. Arrivals
    outside [0, n_samples) are dropped (matching the windowed-sinc paths'
    in-range mask — a cyclic irfft would otherwise wrap them around).

    With a measured `hrtf` set (rir.hrtf.HRTFSet), the interpolated HRIR's
    full complex spectrum replaces the analytic magnitude+ITD pair: the
    direct path then carries the measured ITD, ILD and pinna cues exactly
    (the reference rlr engine's measured-HRTF binaural rendering,
    reference micarrays.py:68-86).

    Returns (E, 2, n_samples).
    """
    if hrtf is not None:
        h = hrtf.hrirs_at(dirs)  # (E, 2, N) at engine sr
        n_h = h.shape[-1]
        delay_samp = dist[:, None] * (sr / c)  # (E, 1) head-centre delay
        in_range = (delay_samp >= 0.0) & (delay_samp < n_samples - n_h)
        h_spec = jnp.fft.rfft(h, n=n_samples, axis=-1)  # (E, 2, F)
        spec = (
            (amp[:, None] * in_range).astype(jnp.complex64)[..., None]
            * h_spec
            * _linear_phase(jnp.broadcast_to(delay_samp, h.shape[:2]), n_samples)
        )
        return jnp.fft.irfft(spec, n=n_samples, axis=-1).astype(jnp.float32)
    n_freq = n_samples // 2 + 1
    freqs = jnp.arange(n_freq) * (sr / n_samples)
    mag = spherical_head_gains(dirs, freqs)  # (E, 2, F) amplitude gains
    itd = woodworth_itd(dirs, c=c)  # (E, 2) seconds
    delay_samp = dist[:, None] * (sr / c) + itd * sr  # (E, 2)
    in_range = (delay_samp >= 0.0) & (delay_samp < n_samples - 1)
    spec = (
        (amp[:, None] * in_range)[..., None]
        * mag
        * _linear_phase(delay_samp, n_samples)
    )
    return jnp.fft.irfft(spec, n=n_samples, axis=-1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_samples", "sr", "encoding", "sh_order"))
def direct_path_ir(
    tris: jnp.ndarray,
    source_pos: jnp.ndarray,
    listener_pos: jnp.ndarray,
    n_samples: int,
    sr: int = config.SAMPLE_RATE,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    accel=None,
    sh_order: int = 3,
    hrtf=None,
) -> jnp.ndarray:
    """Exact direct-path contribution for ONE source: windowed-sinc impulse at
    delay d/c with amplitude visibility/(4 pi d), encoded per channel. For
    ambisonic encodings ("foa"/"sh{N}") the direct path is encoded at
    `sh_order` (clipped to the layout's order) — the reference rlr config's
    `direct_sh_order` semantics; binaural uses the spherical-head ITD +
    shadow (or a measured HRTF set when `hrtf` is given — rir.hrtf). Thin
    wrapper over the batched direct_paths_ir so the occlusion/sinc/encode
    math exists ONCE. Returns (C_out, n_samples)."""
    return direct_paths_ir(
        tris, jnp.atleast_2d(source_pos), listener_pos, n_samples,
        sr=sr, c=c, encoding=encoding, accel=accel, sh_order=sh_order,
        hrtf=hrtf,
    )[0]


@partial(jax.jit, static_argnames=("n_samples", "sr", "encoding", "sh_order"))
def direct_paths_ir(
    tris: jnp.ndarray,
    source_positions: jnp.ndarray,
    listener_pos: jnp.ndarray,
    n_samples: int,
    sr: int = config.SAMPLE_RATE,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    accel=None,
    sh_order: int = 3,
    hrtf=None,
) -> jnp.ndarray:
    """direct_path_ir for a BATCH of sources with ONE occlusion query.

    The vmapped single-source form issued one Pallas any-hit call per source;
    with 4 listener segments padding to 4096 kernel lanes that wasted 99% of
    each dispatch and dominated trace_rirs_multi's fixed cost on scanned
    meshes (~220 ms for 16 sources on a 110k-face room vs <5 ms batched
    through the placement grid). Per-element math is identical to
    direct_path_ir — same occlusion contract, same windowed sinc.

    Returns (E, C_out, n_samples).
    """
    source_positions = jnp.atleast_2d(source_positions)
    listener_pos = jnp.atleast_2d(listener_pos)
    n_src = source_positions.shape[0]
    cl = listener_pos.shape[0]

    vec = source_positions[:, None, :] - listener_pos[None, :, :]  # (E, C, 3)
    d = jnp.linalg.norm(vec, axis=-1)  # (E, C)
    dirs = vec / jnp.maximum(d[..., None], 1e-9)
    starts = jnp.broadcast_to(listener_pos[None], (n_src, cl, 3)).reshape(-1, 3)
    ends = jnp.repeat(source_positions, cl, axis=0)
    occ = segments_occluded(starts, ends, tris, accel=accel).reshape(n_src, cl)
    amp = (~occ) / (4.0 * jnp.pi * jnp.maximum(d, 1e-2))  # (E, C)

    if encoding == "binaural":
        return _binaural_direct_ir(
            dirs[:, 0, :], amp[:, 0], d[:, 0], n_samples, sr, c, hrtf=hrtf
        )
    if encoding != "omni":
        gains = _ambi_gains(dirs[:, 0, :], sh_order, encoding)  # (E, C_out)
        amps = amp[:, 0:1] * gains
        delays = jnp.broadcast_to((d[:, 0] * sr / c)[:, None], gains.shape)
    else:
        amps = amp
        delays = d * sr / c

    c_out = amps.shape[1]
    n_taps = 32
    window = jnp.asarray(np.hanning(2 * n_taps + 1), dtype=jnp.float32)
    tap_offsets = jnp.arange(-n_taps, n_taps + 1)

    d_int = jnp.floor(delays).astype(jnp.int32)  # (E, C_out)
    d_frac = delays - d_int
    x = tap_offsets[None, None, :].astype(jnp.float32) - d_frac[..., None]
    taps = jnp.sinc(x) * window[None, None, :]
    pos = d_int[..., None] + tap_offsets[None, None, :]
    idx = jnp.clip(pos, 0, n_samples - 1)
    in_range = (pos >= 0) & (pos < n_samples)
    vals = amps[..., None] * taps * in_range

    ir = jnp.zeros((n_src, c_out, n_samples), dtype=jnp.float32)
    e_idx = jnp.arange(n_src)[:, None, None]
    c_idx = jnp.arange(c_out)[None, :, None]
    return ir.at[e_idx, c_idx, idx].add(vals)


def _diffraction_frame(source_pos, center):
    """(d, axis, u, v): source->listener distance + an orthonormal frame."""
    d_vec = center - source_pos
    d = jnp.linalg.norm(d_vec)
    axis = d_vec / jnp.maximum(d, 1e-9)
    helper = jnp.where(
        jnp.abs(axis[0]) < 0.9, jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0])
    )
    u = jnp.cross(axis, helper)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-9)
    v = jnp.cross(axis, u)
    return d, axis, u, v


def _graph_detour(
    tris, source_pos, center, accel, order: int,
    n_angles: int = 12, n_radii: int = 4,
):
    """Multi-bend detour search: layered shortest path over bend candidates.

    The reference rlr config exposes `max_diffraction_order` (default 10):
    paths may bend around several obstacles. Per-ray UTD edge tracing is the
    wrong shape for a vector machine, so the search is a fixed-shape layered
    graph: `order` (capped at 4 — a 5th bend costs > 40 dB of knife-edge
    attenuation and is inaudible) STATIONS along the source->listener axis,
    each holding a polar lattice of bend candidates; edges connect the source,
    every station pair in axis order, and the listener, weighted by length
    (+inf when the segment is occluded). A min-plus forward relaxation — one
    dense (P, P) reduction per station pair, exactly Bellman-Ford on a DAG —
    yields the shortest unoccluded polyline with <= `order` bends, and a
    fixed-step backtrace recovers the bend points for per-bend Maekawa
    attenuation (sequential knife edges attenuate multiplicatively, the
    standard engineering treatment of multi-edge diffraction).

    Returns (total_att_db_scale (B-free callable inputs): deltas (S,) per-bend
    detours with zeros for unused bends, n/a), packed as
    (found, dist_to_last (scalar), last_bend (3,), deltas (S,)).
    """
    d, axis, u, v = _diffraction_frame(source_pos, center)
    s_n = max(2, min(int(order), 4))
    p_n = n_angles * n_radii

    fracs = (jnp.arange(s_n) + 1.0) / (s_n + 1.0)
    centers = source_pos[None] + fracs[:, None] * (d * axis)[None]  # (S, 3)
    angles = jnp.arange(n_angles) * (2.0 * jnp.pi / n_angles)
    radii = jnp.geomspace(0.05, 4.0, n_radii)
    offs = (
        jnp.cos(angles)[:, None, None] * u[None, None, :]
        + jnp.sin(angles)[:, None, None] * v[None, None, :]
    ) * radii[None, :, None]  # (A, R, 3)
    nodes = (centers[:, None, :] + offs.reshape(-1, 3)[None]).reshape(-1, 3)  # (S*P, 3)
    n_nodes = s_n * p_n

    # Occlusion for every candidate edge in ONE batched query: src->node,
    # node->node (all pairs; axis-order enforced by the +inf mask below) and
    # node->listener. Each segment overshoots its endpoint slightly so a
    # candidate ON the occluder surface cannot sneak through the endpoint
    # exclusion (same margin rationale as the single-bend search).
    over = 5e-4

    def _ext(a, b):
        g = b - a
        ln = jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
        return b + over * g / ln

    starts = jnp.concatenate([
        jnp.broadcast_to(source_pos, (n_nodes, 3)),
        jnp.repeat(nodes, n_nodes, axis=0),
        nodes,
    ])
    raw_ends = jnp.concatenate([
        nodes,
        jnp.tile(nodes, (n_nodes, 1)),
        jnp.broadcast_to(center, (n_nodes, 3)),
    ])
    ends = _ext(starts, raw_ends)
    occ = segments_occluded(starts, ends, tris, accel=accel)
    occ_src = occ[:n_nodes]
    occ_pair = occ[n_nodes : n_nodes + n_nodes * n_nodes].reshape(n_nodes, n_nodes)
    occ_lis = occ[n_nodes + n_nodes * n_nodes :]

    len_src = jnp.linalg.norm(nodes - source_pos[None], axis=-1)
    len_lis = jnp.linalg.norm(center[None] - nodes, axis=-1)
    len_pair = jnp.linalg.norm(nodes[None] - nodes[:, None], axis=-1)

    inf = jnp.float32(jnp.inf)
    # Per-hop penalty: the continuous shortest path bends only where it wraps
    # geometry (Fermat), but its LATTICE discretisation can shave millimetres
    # by splitting one sharp bend into several shallow ones — each of which
    # would then pay a spurious knife-edge floor. A few centimetres of extra
    # cost per station hop makes the relaxation prefer the fewest-bend
    # representative of the same detour without distorting real geometry.
    hop = jnp.float32(0.05)
    w_src = jnp.where(occ_src, inf, len_src + hop)  # (S*P,)
    w_lis = jnp.where(occ_lis, inf, len_lis)
    sta_of = jnp.arange(n_nodes) // p_n
    fwd = sta_of[None, :] > sta_of[:, None]  # strictly later station
    w_pair = jnp.where(fwd & ~occ_pair, len_pair + hop, inf)  # (S*P, S*P)

    # Min-plus forward relaxation, one pass per station (DAG layers)
    dist = w_src
    parent = jnp.full((n_nodes,), -1, jnp.int32)  # -1 = direct from source
    for _ in range(s_n - 1):
        via = dist[:, None] + w_pair  # (from, to)
        best_via = jnp.min(via, axis=0)
        best_from = jnp.argmin(via, axis=0)
        better = best_via < dist
        parent = jnp.where(better, best_from, parent)
        dist = jnp.minimum(dist, best_via)

    total = dist + w_lis
    last = jnp.argmin(total)
    found = jnp.isfinite(total[last])

    # Fixed-step backtrace (<= s_n nodes) collecting per-bend local detours:
    # delta_i = |p_{i-1} p_i| + |p_i p_{i+1}| - |p_{i-1} p_{i+1}|.
    def step(carry, _):
        cur, nxt_pos, deltas, slot = carry
        cur_pos = nodes[jnp.maximum(cur, 0)]
        par = parent[jnp.maximum(cur, 0)]
        prev_pos = jnp.where(par < 0, source_pos, nodes[jnp.maximum(par, 0)])
        delta = jnp.maximum(
            jnp.linalg.norm(cur_pos - prev_pos)
            + jnp.linalg.norm(nxt_pos - cur_pos)
            - jnp.linalg.norm(nxt_pos - prev_pos),
            0.0,
        )
        live = cur >= 0
        deltas = jnp.where(live, deltas.at[slot].set(delta), deltas)
        return (
            jnp.where(live, par, jnp.int32(-2)),
            jnp.where(live, prev_pos, nxt_pos),
            deltas,
            slot + live.astype(jnp.int32),
        ), None

    deltas0 = jnp.zeros((s_n,), jnp.float32)
    (_, _, deltas, _), _ = jax.lax.scan(
        step, (last.astype(jnp.int32), center, deltas0, jnp.int32(0)), None, length=s_n
    )
    return found, dist[last], nodes[last], deltas


def _synth_bent_component(
    gain_b, path, bend, listener_pos, band_freqs, n_samples, sr, c,
    encoding, sh_order, hrtf,
):
    """Frequency-domain synthesis of one bent-path arrival.

    gain_b: (C, B) per-capsule per-band amplitude gains (already masked to
    zero when inactive); path: (C,) bent path lengths in metres; bend: (3,)
    the LAST bend point (the arrival direction for spatial encoding).
    Returns (C_out, n_samples).
    """
    band_freqs = jnp.asarray(band_freqs, dtype=jnp.float32)
    n_bands = band_freqs.shape[0]
    # Interpolate band gains onto the FFT grid
    # (same log-f piecewise-linear scheme as the tail filterbank), apply the
    # bent path's delay phase, and invert.
    n_freq = n_samples // 2 + 1
    freqs = jnp.arange(n_freq) * (sr / n_samples)
    if n_bands == 1:
        w = jnp.ones((n_freq, 1))
    else:
        logf = jnp.log(jnp.maximum(freqs, 1.0))
        logb = jnp.log(band_freqs)
        idx_hi = jnp.clip(jnp.searchsorted(logb, logf), 1, n_bands - 1)
        idx_lo = idx_hi - 1
        w_hi = jnp.clip(
            (logf - logb[idx_lo]) / jnp.maximum(logb[idx_hi] - logb[idx_lo], 1e-9), 0.0, 1.0
        )
        w = jnp.zeros((n_freq, n_bands))
        w = w.at[jnp.arange(n_freq), idx_lo].add(1.0 - w_hi)
        w = w.at[jnp.arange(n_freq), idx_hi].add(w_hi)
    g_f = gain_b @ w.T  # (C, F) magnitude
    delay_samp = path * (sr / c)
    # float32-safe linear phase (see _linear_phase); bent paths longer than
    # the IR window are dropped rather than wrapped by the cyclic irfft
    g_f = g_f * (delay_samp < n_samples - 1)[:, None]
    spec = g_f * _linear_phase(delay_samp, n_samples)
    ir_caps = jnp.fft.irfft(spec, n=n_samples, axis=-1).astype(jnp.float32)  # (C, S)

    if encoding == "omni":
        return ir_caps
    # Single listener; encode the arrival direction (listener -> bend)
    dirs = (bend[None] - listener_pos)  # (1, 3)
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
    if encoding == "binaural":
        if hrtf is not None:
            # Measured HRIR spectrum at the bend arrival direction (rir.hrtf)
            h_spec = jnp.fft.rfft(hrtf.hrirs_at(dirs)[0], n=n_samples, axis=-1)
            spec_ear = spec[0:1] * h_spec
            return jnp.fft.irfft(spec_ear, n=n_samples, axis=-1).astype(jnp.float32)
        # The spectrum is already frequency-resolved: apply the spherical-head
        # shadow magnitude and per-ear Woodworth ITD phase directly (see
        # _binaural_direct_ir).
        mag = spherical_head_gains(dirs, freqs)[0]  # (2, F)
        itd_samp = woodworth_itd(dirs, c=c)[0] * sr  # (2,) — tiny (<20 samples),
        # but _linear_phase handles negatives exactly too
        spec_ear = spec[0:1] * mag * _linear_phase(itd_samp, n_samples)
        return jnp.fft.irfft(spec_ear, n=n_samples, axis=-1).astype(jnp.float32)
    gains = _ambi_gains(dirs, sh_order, encoding)[0]
    return gains[:, None] * ir_caps[0:1]


@partial(
    jax.jit,
    static_argnames=("n_samples", "sr", "encoding", "sh_order", "n_angles", "n_radii", "order"),
)
def diffracted_path_ir(
    tris: jnp.ndarray,
    source_pos: jnp.ndarray,
    listener_pos: jnp.ndarray,
    band_freqs: jnp.ndarray,
    n_samples: int,
    sr: int = config.SAMPLE_RATE,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    accel=None,
    sh_order: int = 3,
    n_angles: int = 16,
    n_radii: int = 12,
    hrtf=None,
    order: int = 1,
    tris_graph=None,
) -> jnp.ndarray:
    """Edge-diffraction contribution for an OCCLUDED direct path.

    Implements the reference rlr config's `diffraction` flag with its
    `max_diffraction_order` semantics (`order`; reference serialises
    diffraction=1, max_diffraction_order=10 — reference
    tests/test_worldstate_rlr.py:811,824):

    - order == 1: when the straight source->listener segment is blocked, the
      shortest ONE-bend path around the blocker is found by searching a polar
      grid of bend candidates on the plane bisecting the segment (both legs
      must be unoccluded).
    - order >= 2: the shortest MULTI-bend polyline through a layered graph of
      bend-candidate stations (min-plus Bellman-Ford over a DAG; see
      _graph_detour). Bend count is capped at min(order, 4): a fifth knife
      edge costs > 40 dB and is inaudible.

    Each bend attenuates by the Maekawa knife-edge fit
        A(N) = 10 log10(3 + 20 N) dB,  N = 2 delta f / c,
    with delta the bend's LOCAL detour ((d_in + d_out) - straight-through) —
    the standard engineering fit to the Fresnel/UTD solution (within ~1.5 dB
    of exact Kirchhoff for N >= 0); sequential knife edges attenuate
    multiplicatively. Higher bands attenuate more (the physical LF "bending
    around corners" tilt), the arrival lands at the bent path's total delay,
    and amplitude carries the 1/(4 pi L) spreading of the bent path. Visible
    (unoccluded) pairs contribute ZERO — the exact direct path covers them.

    Returns (C_out, n_samples) to add to the RIR.
    """
    listener_pos = jnp.atleast_2d(listener_pos).astype(jnp.float32)
    cl = listener_pos.shape[0]
    center = jnp.mean(listener_pos, axis=0)

    # Direct-path occlusion per capsule (the trigger for diffraction)
    occ_direct = segments_occluded(
        listener_pos, jnp.broadcast_to(source_pos, (cl, 3)), tris, accel=accel
    )
    band_freqs = jnp.asarray(band_freqs, dtype=jnp.float32)

    # Fine single-bend search first — a 1-bend detour, when one exists, both
    # dominates (one knife edge attenuates least) and is found at the mid-
    # plane lattice's full resolution. CANDIDATE legs check against
    # `tris_graph` when given (an acoustic LOD on big meshes): 16 sources x
    # 385 room-length segments through the full-mesh grid DDA cost ~180 ms
    # per scene, while bend candidates only care about wall-scale blockers.
    # The direct-path TRIGGER below stays on the exact mesh — it must agree
    # with the exact direct path it complements.
    leg_tris = tris if tris_graph is None else tris_graph
    leg_accel = accel if tris_graph is None else None
    d, axis, u, v = _diffraction_frame(source_pos, center)
    mid = 0.5 * (source_pos + center)
    angles = jnp.arange(n_angles) * (2.0 * jnp.pi / n_angles)
    radii = jnp.geomspace(0.05, 4.0, n_radii)
    offs = (
        jnp.cos(angles)[:, None, None] * u[None, None, :]
        + jnp.sin(angles)[:, None, None] * v[None, None, :]
    ) * radii[None, :, None]  # (A, R, 3)
    bends = (mid[None, None, :] + offs).reshape(-1, 3)  # (K, 3)
    k = bends.shape[0]

    # Both legs must clear the mesh for a bend to be a valid detour. Each
    # leg overshoots the bend by a few endpoint margins: a candidate lying
    # ON the occluder surface would otherwise sneak both legs through via
    # the segment-endpoint exclusion and fake a zero-detour path.
    d1 = jnp.linalg.norm(bends - source_pos[None], axis=-1)
    d2c = jnp.linalg.norm(bends - center[None], axis=-1)
    over = 5e-4
    ext1 = bends + over * (bends - source_pos[None]) / jnp.maximum(d1, 1e-9)[:, None]
    ext2 = bends + over * (bends - center[None]) / jnp.maximum(d2c, 1e-9)[:, None]
    occ1 = segments_occluded(
        jnp.broadcast_to(source_pos, (k, 3)), ext1, leg_tris, accel=leg_accel
    )
    occ2 = segments_occluded(
        jnp.broadcast_to(center, (k, 3)), ext2, leg_tris, accel=leg_accel
    )
    detour = jnp.where(~occ1 & ~occ2, d1 + d2c, jnp.inf)
    best = jnp.argmin(detour)
    bend = bends[best]
    found = jnp.isfinite(detour[best])

    # Per-capsule geometry through the chosen bend
    d2 = jnp.linalg.norm(listener_pos - bend[None], axis=-1)  # (C,)
    path = d1[best] + d2
    deltas = jnp.maximum(
        path - jnp.linalg.norm(listener_pos - source_pos[None], axis=-1), 0.0
    )[:, None]  # (C, 1): one bend

    if order >= 2:
        # Multi-bend fallback where NO single bend clears the blockers (two
        # staggered screens, L-shaped corridors): layered shortest-path graph
        # (see _graph_detour), engaged only when the fine search fails. Its
        # leg occlusion runs against `tris_graph` (callers pass an acoustic
        # LOD for big scanned meshes: ~40k lattice segments against 10^5
        # faces through the grid DDA measured ~4.7 s/source on chip, while
        # multi-edge diffraction physically concerns LARGE blockers, which
        # vertex-clustered LODs preserve) through the dense any-hit kernels.
        found_g, dist_last, bend_g, deltas_s = _graph_detour(
            tris if tris_graph is None else tris_graph,
            source_pos, center,
            accel if tris_graph is None else None,
            order,
        )
        d2_g = jnp.linalg.norm(listener_pos - bend_g[None], axis=-1)  # (C,)
        path_g = dist_last + d2_g
        deltas_g = jnp.broadcast_to(deltas_s[None], (cl, deltas_s.shape[0]))

        use_graph = (~found) & found_g
        found = found | found_g
        bend = jnp.where(use_graph, bend_g, bend)
        path = jnp.where(use_graph, path_g, path)
        deltas = jnp.where(
            use_graph,
            deltas_g,
            jnp.pad(deltas, ((0, 0), (0, deltas_g.shape[1] - 1))),
        )

    # Per-bend Maekawa attenuation, summed in dB. Bends below the lattice's
    # resolution (sub-5 mm local detour) are path REPRESENTATION, not physical
    # edges, and must not pay the knife-edge floor (see _graph_detour's hop
    # penalty); unused slots (delta == 0) are masked the same way.
    bend_eps = 5e-3
    fresnel = 2.0 * deltas[..., None] * band_freqs[None, None, :] / c  # (C, S, B)
    att_db = 10.0 * jnp.log10(3.0 + 20.0 * fresnel)
    att_db = jnp.sum(att_db * (deltas[..., None] > bend_eps), axis=1)  # (C, B)
    # A genuinely-bent path always has at least one active bend; a zero-delta
    # "detour" (numerically straight) collapses to the Maekawa floor once.
    no_bend = jnp.all(deltas <= bend_eps, axis=1)
    att_db = jnp.where(no_bend[:, None], 10.0 * jnp.log10(3.0), att_db)
    gain_b = 10.0 ** (-att_db / 20.0) / (4.0 * jnp.pi * jnp.maximum(path, 1e-2))[:, None]
    # Active only where the direct path is blocked AND a detour exists
    gain_b = gain_b * (occ_direct & found)[:, None]

    return _synth_bent_component(
        gain_b, path, bend, listener_pos, band_freqs, n_samples, sr, c,
        encoding, sh_order, hrtf,
    )


def face_rain_occlusion(
    tris: jnp.ndarray,
    tri_normals: jnp.ndarray,
    listener_points: jnp.ndarray,
    accel=None,
    star=None,
    face_chunk: int = 4096,
) -> jnp.ndarray:
    """Precompute per-face diffuse-rain visibility: (C_occ, F) bool, True where
    the segment face-centroid -> listener point is blocked by the mesh.

    The start point is offset off the surface on the LISTENER side (rain only
    deposits when the listener lies on the hit normal's side, so that is the
    side whose visibility matters). One query per (face, listener point),
    amortised over every bounce of every source that traces this mesh — the
    per-bounce visibility cost collapses to a gather by hit-face index.
    """
    listener_points = jnp.atleast_2d(listener_points).astype(jnp.float32)
    centroids = jnp.mean(tris, axis=1)  # (F, 3)
    rows = []
    for i in range(listener_points.shape[0]):
        lp = listener_points[i]
        to_l = lp[None] - centroids
        n_or = jnp.where(
            (jnp.sum(tri_normals * to_l, axis=-1) >= 0)[:, None],
            tri_normals,
            -tri_normals,
        )
        starts = centroids + 1e-4 * n_or
        if star is not None:
            occ = star_segments_occluded(star, starts, lp)
        else:
            occ = segments_occluded(
                starts, jnp.broadcast_to(lp, starts.shape), tris, face_chunk,
                accel=accel,
            )
        rows.append(occ)
    return jnp.stack(rows)


def trace_rirs(
    key: jax.Array,
    tris: jnp.ndarray,
    face_absorption: jnp.ndarray,
    face_scattering: jnp.ndarray,
    source_pos: jnp.ndarray,
    listener_pos: jnp.ndarray,
    n_samples: int,
    sr: int = config.SAMPLE_RATE,
    n_rays: int = 2000,
    max_depth: int = 50,
    bin_dt: float = 0.002,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    face_chunk: int = 4096,
    # KEYWORD-ONLY below: the _lazy_jit wrapper detects the culled accel
    # structures (star / mesh_tiles) in kwargs to apply the raised scoped-VMEM
    # ceiling — a positional star would silently compile without it and be
    # rejected by the 16 MiB default budget.
    *,
    occlusion: bool = True,
    tri_normals: jnp.ndarray = None,
    face_transmission: jnp.ndarray = None,
    transmission: bool = False,
    shared_visibility: bool = True,
    accel=None,
    star=None,
    mesh_tiles=None,
    face_occlusion: jnp.ndarray = None,
    tris_direct: jnp.ndarray = None,
    sh_order_direct: int = 3,
    sh_order_indirect: int = 1,
    decimate: bool = False,
    hrtf=None,
) -> jnp.ndarray:
    """Full RIR for one source: stochastic tail + exact direct path.

    `tris_direct` (default: `tris`) lets the exact direct path test occlusion
    against the FULL-resolution mesh while the stochastic tail traces a
    decimated acoustic mesh (WorldStateRLR's mesh_simplification mode).

    Returns (C_out, n_samples).
    """
    n_bins = int(np.ceil(n_samples / sr / bin_dt)) + 1
    k_trace, k_synth = jax.random.split(key)
    hist = trace_energy_histogram(
        k_trace,
        tris,
        face_absorption,
        face_scattering,
        source_pos,
        listener_pos,
        n_rays=n_rays,
        max_depth=max_depth,
        n_bins=n_bins,
        bin_dt=bin_dt,
        c=c,
        encoding=encoding,
        face_chunk=face_chunk,
        occlusion=occlusion,
        tri_normals=tri_normals,
        face_transmission=face_transmission,
        transmission=transmission,
        shared_visibility=shared_visibility,
        accel=accel,
        star=star,
        mesh_tiles=mesh_tiles,
        face_occlusion=face_occlusion,
        sh_order=sh_order_indirect,
        decimate=decimate,
        hrtf=hrtf,
    )
    band_freqs = _band_centers(face_absorption.shape[1])
    tail = synthesize_ir_from_histogram(
        k_synth, hist, band_freqs, n_samples, bin_dt, sr=sr, encoding=encoding
    )
    direct = direct_path_ir(
        tris if tris_direct is None else tris_direct,
        source_pos, listener_pos, n_samples, sr=sr, c=c, encoding=encoding,
        accel=accel, sh_order=sh_order_direct, hrtf=hrtf,
    )
    return tail + direct


@partial(
    _lazy_jit,
    static_argnames=("n_rays", "max_depth", "n_bins", "bin_dt", "c", "encoding", "face_chunk", "n_sources", "occlusion", "transmission", "shared_visibility", "sh_order", "decimate"),
)
def trace_energy_histogram_multi(
    key: jax.Array,
    tris: jnp.ndarray,
    face_absorption: jnp.ndarray,
    face_scattering: jnp.ndarray,
    source_positions: jnp.ndarray,
    listener_pos: jnp.ndarray,
    n_sources: int,
    n_rays: int = 2000,
    max_depth: int = 50,
    n_bins: int = 512,
    bin_dt: float = 0.002,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    face_chunk: int = 4096,
    # KEYWORD-ONLY below: the _lazy_jit wrapper detects the culled accel
    # structures (star / mesh_tiles) in kwargs to apply the raised scoped-VMEM
    # ceiling — a positional star would silently compile without it and be
    # rejected by the 16 MiB default budget.
    *,
    occlusion: bool = True,
    tri_normals: jnp.ndarray = None,
    face_transmission: jnp.ndarray = None,
    transmission: bool = False,
    shared_visibility: bool = True,
    accel=None,
    star=None,
    mesh_tiles=None,
    face_occlusion: jnp.ndarray = None,
    sh_order: int = 1,
    decimate: bool = False,
    hrtf=None,
) -> jnp.ndarray:
    """Energy histograms for E sources traced TOGETHER in one wavefront.

    All E*R rays advance per bounce in a single batched step: the bounce loop is
    inherently sequential, so putting every source's rays into one wavefront
    keeps the chip busy instead of paying the per-step dispatch latency E times
    (the lax.map-over-sources formulation was latency-bound on small scenes).

    `transmission`/`face_transmission` behave as in trace_energy_histogram.
    `decimate=True` enables progressive wavefront decimation (see
    decimation_phases): rays halve at depth/3 and 2*depth/3 with energy
    reweighting — an unbiased Russian-roulette thinning that cuts the
    first-hit cost of deep traces ~40%. False is bitwise identical to
    builds without the feature.

    Returns (E, C_out, B, n_bins).
    """
    if transmission and face_transmission is None:
        raise ValueError("transmission=True requires face_transmission (F, B)")
    n_bands = face_absorption.shape[1]
    cl = listener_pos.shape[0]
    c_out = _encoding_channels(encoding, cl)

    total_rays = n_sources * n_rays
    key, k0 = jax.random.split(key)
    dirs0 = _sphere_directions(k0, total_rays)
    origins0 = jnp.repeat(source_positions, n_rays, axis=0).astype(jnp.float32)
    src_idx = jnp.repeat(jnp.arange(n_sources, dtype=jnp.int32), n_rays)
    energy0 = jnp.full((total_rays, n_bands), 1.0 / n_rays, dtype=jnp.float32)
    dist0 = jnp.zeros(total_rays, dtype=jnp.float32)
    alive0 = jnp.ones(total_rays, dtype=bool)

    if tri_normals is None:
        # NOTE: computing normals inside a LARGER fused program miscompiles on
        # the axon TPU backend (the norm evaluates ~0 and normals blow up to
        # ~1e13 — observed when this code is inlined into a shard_map body).
        # Standalone-jitted tracing is fine; composed callers (parallel.
        # shard_trace_rirs) must precompute normals and pass them in.
        tri_normals = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
        tri_normals = tri_normals / jnp.maximum(
            jnp.linalg.norm(tri_normals, axis=-1, keepdims=True), 1e-12
        )

    hist0 = jnp.zeros((n_sources, c_out, n_bands, n_bins), dtype=jnp.float32)
    band_freqs = _band_centers(n_bands)
    # Measured-HRTF binaural: loop-invariant band-power table (rir.hrtf)
    hrtf_bp = (
        hrtf.band_powers(band_freqs)
        if (hrtf is not None and encoding == "binaural")
        else None
    )
    keys = jax.random.split(key, max_depth)
    mxu_tables = _mxu_tables_for(tris, accel, mesh_tiles)

    def make_bounce(r_src):
        # One bounce step at r_src rays per source (total tr_l lanes). The
        # decimation schedule instantiates this at each phase's width; the
        # physics is identical at every width — only the reshape groupings
        # and broadcast extents change.
        tr_l = n_sources * r_src

        def bounce(carry, k_step):
            origins, dirs, energy, dist, alive, prev_face, hist = carry

            if mesh_tiles is not None:
                t, face = tiled_first_hit(mesh_tiles, origins, dirs)
            elif mxu_tables is not None:
                from audiblelight_tpu.ops.mxu_first_hit import mxu_first_hit

                t, face = mxu_first_hit(mxu_tables, origins, dirs, prev_face)
            else:
                t, face = ray_mesh_first_hit(origins, dirs, tris, face_chunk, accel=accel)
            hit_ok = alive & jnp.isfinite(t)
            t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
            face_safe = jnp.maximum(face, 0)
            hit = origins + t_safe[:, None] * dirs
            new_dist = dist + t_safe

            normal = tri_normals[face_safe]
            normal = jnp.where((jnp.sum(normal * dirs, axis=-1) > 0)[:, None], -normal, normal)

            alpha = face_absorption[face_safe]
            e_nonabs = energy * (1.0 - alpha)
            if transmission:
                tau = face_transmission[face_safe]  # (TR, B)
                e_refl = e_nonabs * (1.0 - tau)
                e_trans = e_nonabs * tau
            else:
                e_refl = e_nonabs

            if occlusion and face_occlusion is not None:
                # Precomputed per-face rain visibility: one gather per bounce (see
                # trace_energy_histogram's face_occlusion doc)
                occ = jnp.broadcast_to(face_occlusion[:, face_safe], (cl, tr_l))
            elif occlusion and star is not None and shared_visibility:
                occ1 = star_segments_occluded(star, hit + 1e-4 * normal, jnp.mean(listener_pos, axis=0))
                occ = jnp.broadcast_to(occ1[None], (cl, tr_l))
            elif occlusion and star is not None:
                occ = jnp.stack([
                    star_segments_occluded(star, hit + 1e-4 * normal, listener_pos[i])
                    for i in range(cl)
                ])
            elif occlusion and shared_visibility and cl > 1:
                # One visibility query per hit point against the array centroid
                # (see trace_energy_histogram's shared_visibility doc).
                center = jnp.mean(listener_pos, axis=0)
                occ1 = segments_occluded(
                    hit + 1e-4 * normal,
                    jnp.broadcast_to(center, (tr_l, 3)),
                    tris, face_chunk, accel=accel,
                )
                occ = jnp.broadcast_to(occ1[None], (cl, tr_l))
            elif occlusion:
                starts = jnp.broadcast_to(hit + 1e-4 * normal, (cl, tr_l, 3)).reshape(-1, 3)
                ends = jnp.repeat(listener_pos, tr_l, axis=0)
                occ = segments_occluded(starts, ends, tris, face_chunk, accel=accel).reshape(cl, tr_l)
            else:
                # Convex enclosure: interior segments are never blocked
                # (geometry.mesh.TriMesh.is_convex), so the query is skipped exactly.
                occ = jnp.zeros((cl, tr_l), dtype=bool)

            if encoding == "omni" and _use_fused_deposit():
                # Fused path: per-ray geometry, visibility, binning and the
                # histogram fold all happen inside one Pallas kernel — the (C, TR)
                # deposit intermediates below never materialise in HBM.
                hist = hist + deposit_histogram_pallas(
                    hit, normal, e_refl, new_dist,
                    occ | ~hit_ok[None], listener_pos,
                    n_sources=n_sources, n_bins=n_bins, bin_dt=bin_dt, c_sound=c,
                )
                # Reflection below still needs nothing from the deposit chain.
                dir_l = None
            elif encoding == "foa" and cl == 1 and sh_order == 1 and _use_fused_deposit():
                # FOA production path: deposit + AmbiX order-1 encode +
                # histogram fold fused in one Pallas kernel (the XLA chain
                # materialised (TR, B) deposits, (TR, 4) gains and (TR, 4, B)
                # weighted deposits in HBM every bounce).
                hist = hist + deposit_histogram_foa_pallas(
                    hit, normal, e_refl, new_dist,
                    occ | ~hit_ok[None], listener_pos,
                    n_sources=n_sources, n_bins=n_bins, bin_dt=bin_dt, c_sound=c,
                )
                dir_l = None
            else:
                # Diffuse rain toward every listener: (C, TR)
                vec = listener_pos[:, None, :] - hit[None, :, :]
                d_l = jnp.linalg.norm(vec, axis=-1)
                dir_l = vec / jnp.maximum(d_l[..., None], 1e-9)
                cos_th = jnp.maximum(jnp.sum(dir_l * normal[None], axis=-1), 0.0)

                visible = hit_ok[None] & (~occ) & (cos_th > 0)
                deposit = (
                    e_refl[None]
                    * (cos_th / (4.0 * jnp.pi**2 * jnp.maximum(d_l, 1e-2) ** 2))[..., None]
                    * visible[..., None]
                )  # (C, TR, B)

                arrival = (new_dist[None] + d_l) / c
                bin_idx = jnp.clip((arrival / bin_dt).astype(jnp.int32), 0, n_bins - 1)
                in_range = arrival < (n_bins * bin_dt)
                deposit = deposit * in_range[..., None]

            if dir_l is None:
                pass  # histogram already accumulated by a fused kernel
            elif encoding == "omni":
                # Group rays as (capsule, source): one histogram fold per group.
                add = bin_histogram(
                    bin_idx.reshape(cl * n_sources, r_src),
                    deposit.reshape(cl, n_sources, r_src, n_bands).reshape(
                        cl * n_sources, r_src, n_bands
                    ),
                    n_bins,
                )  # (C*E, n_bins, B)
                hist = hist + jnp.transpose(
                    add.reshape(cl, n_sources, n_bins, n_bands), (1, 0, 3, 2)
                )
            else:
                # receiver->source arrival vector = -dir_l (see the
                # single-source tracer's note)
                if encoding == "binaural":
                    if hrtf_bp is not None:
                        # measured per-band |H_ear|^2 (see the single-source
                        # tracer's note; rir.hrtf)
                        gains = hrtf.band_power_at(-dir_l[0], hrtf_bp)
                    else:
                        # per-band spherical-head shadow (see the
                        # single-source tracer's note)
                        gains = spherical_head_gains(-dir_l[0], band_freqs) ** 2
                    weighted = deposit[0][:, None, :] * gains  # (TR, 2, B)
                else:
                    gains = _ambi_gains(-dir_l[0], sh_order, encoding)  # (TR, C_out)
                    weighted = deposit[0][:, None, :] * gains[:, :, None]  # (TR, C_out, B)
                add = bin_histogram(
                    bin_idx[0].reshape(n_sources, r_src),
                    weighted.reshape(n_sources, r_src, -1),
                    n_bins,
                )  # (E, n_bins, C_out*B)
                hist = hist + jnp.transpose(
                    add.reshape(n_sources, n_bins, c_out, n_bands), (0, 2, 3, 1)
                )

            # Reflect
            if transmission:
                k_spec, k_diff, k_trans = jax.random.split(k_step, 3)
            else:
                k_spec, k_diff = jax.random.split(k_step)
            spec_dir = dirs - 2.0 * jnp.sum(dirs * normal, axis=-1, keepdims=True) * normal
            diff_dir = _cosine_hemisphere(k_diff, normal)
            s = face_scattering[face_safe]
            go_diffuse = jax.random.uniform(k_spec, (tr_l,)) < s
            new_dirs = jnp.where(go_diffuse[:, None], diff_dir, spec_dir)
            new_origins = hit + 1e-4 * normal
            new_energy = e_refl

            if transmission:
                # Russian roulette reflect-vs-transmit (see trace_energy_histogram)
                w_r = jnp.mean(e_refl, axis=-1)
                w_t = jnp.mean(e_trans, axis=-1)
                p_t = w_t / jnp.maximum(w_r + w_t, 1e-30)
                go_trans = jax.random.uniform(k_trans, (tr_l,)) < p_t
                e_branch_t = e_trans / jnp.maximum(p_t, 1e-12)[:, None]
                e_branch_r = e_refl / jnp.maximum(1.0 - p_t, 1e-12)[:, None]
                new_energy = jnp.where(go_trans[:, None], e_branch_t, e_branch_r)
                new_dirs = jnp.where(go_trans[:, None], dirs, new_dirs)
                new_origins = hit + jnp.where(go_trans[:, None], -1e-4, 1e-4) * normal

            new_alive = (
                hit_ok
                & (jnp.max(new_energy, axis=-1) * n_rays > 1e-6)
                & (new_dist < c * n_bins * bin_dt)
            )
            # Next bounce excludes the face just hit (MXU kernel self-mask);
            # -1 where the ray missed.
            new_prev = jnp.where(hit_ok, face, -1)
            return (new_origins, new_dirs, new_energy, new_dist, new_alive, new_prev, hist), None

        return bounce

    prev0 = jnp.full(origins0.shape[:1], -1, jnp.int32)
    carry = (origins0, dirs0, energy0, dist0, alive0, prev0, hist0)
    phases = decimation_phases(n_rays, max_depth, decimate)
    for pi, (start, end, r_src_phase) in enumerate(phases):
        if pi > 0:
            carry = _halve_wavefront(carry, n_sources, phases[pi - 1][2], r_src_phase)
        carry = _bounce_segment(make_bounce(r_src_phase), carry, keys, start, end)
    return carry[-1]


def trace_rirs_multi(
    key: jax.Array,
    tris: jnp.ndarray,
    face_absorption: jnp.ndarray,
    face_scattering: jnp.ndarray,
    source_positions: jnp.ndarray,
    listener_pos: jnp.ndarray,
    n_samples: int,
    sr: int = config.SAMPLE_RATE,
    n_rays: int = 2000,
    max_depth: int = 50,
    bin_dt: float = 0.002,
    c: float = config.SPEED_OF_SOUND,
    encoding: str = "omni",
    face_chunk: int = 4096,
    # KEYWORD-ONLY below: the _lazy_jit wrapper detects the culled accel
    # structures (star / mesh_tiles) in kwargs to apply the raised scoped-VMEM
    # ceiling — a positional star would silently compile without it and be
    # rejected by the 16 MiB default budget.
    *,
    occlusion: bool = True,
    tri_normals: jnp.ndarray = None,
    face_transmission: jnp.ndarray = None,
    transmission: bool = False,
    shared_visibility: bool = True,
    accel=None,
    star=None,
    mesh_tiles=None,
    face_occlusion: jnp.ndarray = None,
    tris_direct: jnp.ndarray = None,
    sh_order_direct: int = 3,
    sh_order_indirect: int = 1,
    diffraction: bool = False,
    diffraction_order: int = 1,
    tris_diffraction_graph=None,
    accel_direct=None,
    decimate: bool = False,
    hrtf=None,
) -> jnp.ndarray:
    """RIRs for a batch of sources against one listener group.

    `face_occlusion`/`tris_direct` as in trace_rirs: precomputed per-face rain
    visibility for the tail, full-resolution mesh for the exact direct path.
    With `diffraction=True`, occluded direct paths gain a knife-edge
    component of up to `diffraction_order` bends (diffracted_path_ir; the rlr
    config's `diffraction` + `max_diffraction_order` fields).

    `accel_direct` (geometry.grid.build_grid over the DIRECT-path mesh) serves
    the few direct/diffraction occlusion segments — the interior-origin regime
    where the DDA grid is ~100x the dense kernels. It is deliberately separate
    from `accel`: the bounce loop's surface-origin wavefront must stay on the
    dense streaming kernels where the grid degenerates.

    Returns (C_out, E, n_samples).
    """
    source_positions = jnp.atleast_2d(source_positions)
    n_sources = source_positions.shape[0]
    n_bins = int(np.ceil(n_samples / sr / bin_dt)) + 1

    k_trace, k_synth = jax.random.split(key)
    hist = trace_energy_histogram_multi(
        k_trace,
        tris,
        face_absorption,
        face_scattering,
        source_positions,
        listener_pos,
        n_sources=n_sources,
        n_rays=n_rays,
        max_depth=max_depth,
        n_bins=n_bins,
        bin_dt=bin_dt,
        c=c,
        encoding=encoding,
        face_chunk=face_chunk,
        occlusion=occlusion,
        tri_normals=tri_normals,
        face_transmission=face_transmission,
        transmission=transmission,
        shared_visibility=shared_visibility,
        accel=accel,
        star=star,
        mesh_tiles=mesh_tiles,
        face_occlusion=face_occlusion,
        sh_order=sh_order_indirect,
        decimate=decimate,
        hrtf=hrtf,
    )  # (E, C_out, B, bins)

    band_freqs = _band_centers(face_absorption.shape[1])
    synth_keys = jax.random.split(k_synth, n_sources)
    tails = jax.vmap(
        lambda k, h: synthesize_ir_from_histogram(
            k, h, band_freqs, n_samples, bin_dt, sr=sr, encoding=encoding
        )
    )(synth_keys, hist)  # (E, C_out, S)

    td = tris if tris_direct is None else tris_direct
    a_dir = accel_direct if accel_direct is not None else accel
    directs = direct_paths_ir(
        td, source_positions, listener_pos, n_samples, sr=sr, c=c,
        encoding=encoding, accel=a_dir, sh_order=sh_order_direct, hrtf=hrtf,
    )  # (E, C_out, S)

    if diffraction:
        # vmap batches every source's candidate segments into single queries.
        # This is only memory-safe because the multi-bend graph checks its
        # ~37k lattice legs against `tris_diffraction_graph` through the
        # DENSE streaming any-hit (tiny state): routing them through the grid
        # DDA instead multiplied its per-segment walk state by 16 sources
        # into a 19 GB HBM allocation on a 110k-face room (and a sequential
        # lax.map cost ~75 ms/source in dispatch serialisation).
        directs = directs + jax.vmap(
            lambda src: diffracted_path_ir(
                td, src, listener_pos, band_freqs, n_samples, sr=sr, c=c,
                encoding=encoding, accel=a_dir, sh_order=sh_order_direct,
                hrtf=hrtf, order=int(diffraction_order),
                tris_graph=tris_diffraction_graph,
            )
        )(source_positions)

    return jnp.moveaxis(tails + directs, 0, 1)


__all__ = [
    "trace_energy_histogram",
    "synthesize_ir_from_histogram",
    "direct_path_ir",
    "face_rain_occlusion",
    "trace_rirs",
    "trace_rirs_multi",
]
