"""Physics tests for the stochastic ray tracer, using the shoebox as oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiblelight_tpu.geometry import box_mesh
from audiblelight_tpu.rir.raytracer import (
    direct_path_ir,
    trace_energy_histogram,
    trace_rirs,
    trace_rirs_multi,
)

SR = 44100
C = 343.0
ROOM = np.array([6.0, 4.0, 3.0])


def make_scene(alpha=0.3, scattering=1.0, n_bands=1):
    mesh = box_mesh(extents=ROOM, center=ROOM / 2)
    tris = jnp.asarray(mesh.triangles.astype(np.float32))
    absorption = jnp.full((len(mesh.faces), n_bands), alpha, dtype=jnp.float32)
    scatter = jnp.full(len(mesh.faces), scattering, dtype=jnp.float32)
    return tris, absorption, scatter


def test_direct_path_exact():
    tris, _, _ = make_scene()
    src = jnp.asarray([4.0, 2.0, 1.5])
    mic = jnp.asarray([[1.0, 2.0, 1.5]])  # 3 m away
    ir = np.asarray(direct_path_ir(tris, src, mic, n_samples=4096, sr=SR))
    assert ir.shape == (1, 4096)
    peak = np.argmax(np.abs(ir[0]))
    assert abs(peak - 3.0 / C * SR) <= 1
    energy_amp = np.sqrt(np.sum(ir[0] ** 2))
    assert np.isclose(energy_amp, 1 / (4 * np.pi * 3.0), rtol=0.05)


def test_direct_path_occluded():
    # Obstacle between source and mic
    mesh = box_mesh(extents=ROOM, center=ROOM / 2)
    obstacle = box_mesh(extents=[0.5, 2.0, 2.0], center=[3.0, 2.0, 1.0], inward_normals=False)
    tris = jnp.asarray(
        np.concatenate([mesh.triangles, obstacle.triangles]).astype(np.float32)
    )
    src = jnp.asarray([4.5, 2.0, 1.0])
    mic = jnp.asarray([[1.5, 2.0, 1.0]])
    ir = np.asarray(direct_path_ir(tris, src, mic, n_samples=4096, sr=SR))
    assert np.abs(ir).max() < 1e-9  # fully occluded


def test_histogram_energy_decay():
    """The reverberant energy histogram must decay roughly exponentially."""
    tris, absorption, scatter = make_scene(alpha=0.3)
    hist = np.asarray(
        trace_energy_histogram(
            jax.random.PRNGKey(0),
            tris,
            absorption,
            scatter,
            jnp.asarray([2.0, 1.0, 1.2]),
            jnp.asarray([[4.5, 3.0, 1.8]]),
            n_rays=2000,
            max_depth=60,
            n_bins=256,
            bin_dt=0.002,
        )
    )
    assert hist.shape == (1, 1, 256)
    e = hist[0, 0]
    assert e.sum() > 0
    # Compare decay rate in dB/s against Eyring (diffuse tracer ~ diffuse theory)
    t = (np.arange(256) + 0.5) * 0.002
    sel = (e > 0) & (t > 0.02) & (t < 0.25)
    db = 10 * np.log10(e[sel])
    slope, _ = np.polyfit(t[sel], db, 1)  # dB per second
    rt60_sim = -60.0 / slope

    v = ROOM.prod()
    s = 2 * (ROOM[0] * ROOM[1] + ROOM[0] * ROOM[2] + ROOM[1] * ROOM[2])
    rt60_eyring = 0.161 * v / (-s * np.log(1 - 0.3))
    assert abs(rt60_sim - rt60_eyring) / rt60_eyring < 0.25


def test_full_rir_shape_and_direct():
    tris, absorption, scatter = make_scene(alpha=0.4)
    src = jnp.asarray([4.0, 2.0, 1.5])
    mics = jnp.asarray([[1.0, 2.0, 1.5], [1.5, 3.0, 1.0]])
    ir = np.asarray(
        trace_rirs(
            jax.random.PRNGKey(1),
            tris,
            absorption,
            scatter,
            src,
            mics,
            n_samples=SR // 2,
            sr=SR,
            n_rays=1000,
            max_depth=40,
        )
    )
    assert ir.shape == (2, SR // 2)
    # Direct-path peak for mic 0 at 3 m
    peak = np.argmax(np.abs(ir[0, : int(0.02 * SR)]))
    assert abs(peak - 3.0 / C * SR) <= 2
    # Tail exists (reverb energy beyond the direct pulse) and decays monotonically
    seg = lambda i: np.sum(ir[0, i * SR // 16 : (i + 1) * SR // 16] ** 2)
    assert seg(1) > 0  # reverberant tail present
    assert seg(0) > seg(1) > seg(2)  # strictly decaying


def test_foa_rir_directionality():
    tris, absorption, scatter = make_scene(alpha=0.9)
    src = jnp.asarray([5.0, 2.0, 1.5])  # +x of listener
    mic = jnp.asarray([[2.0, 2.0, 1.5]])
    ir = np.asarray(
        trace_rirs(
            jax.random.PRNGKey(2),
            tris,
            absorption,
            scatter,
            src,
            mic,
            n_samples=SR // 4,
            sr=SR,
            n_rays=500,
            max_depth=20,
            encoding="foa",
        )
    )
    assert ir.shape == (4, SR // 4)
    # Direct path dominates with high absorption: X ~ W, |Y|,|Z| small
    n_direct = int(0.015 * SR)
    w = np.abs(ir[0, :n_direct]).max()
    x = np.abs(ir[1, :n_direct]).max()
    y = np.abs(ir[2, :n_direct]).max()
    z = np.abs(ir[3, :n_direct]).max()
    assert np.isclose(x / w, 1.0, atol=0.1)
    assert y < 0.15 * w and z < 0.15 * w


def test_total_energy_against_ism():
    """Reverberant energy level from the tracer should match the image-source
    engine for the same shoebox, within stochastic tolerance."""
    from audiblelight_tpu.rir.image_source import (
        shoebox_rirs,
        wall_log_betas_from_absorption,
    )

    alpha = 0.35
    src = np.array([2.0, 1.0, 1.2])
    mic = np.array([[4.5, 3.0, 1.8]])
    n_samples = SR // 2

    tris, absorption, scatter = make_scene(alpha=alpha)
    ir_rt = np.asarray(
        trace_rirs(
            jax.random.PRNGKey(3),
            tris,
            absorption,
            scatter,
            jnp.asarray(src),
            jnp.asarray(mic),
            n_samples=n_samples,
            sr=SR,
            n_rays=4000,
            max_depth=60,
        )
    )[0]

    log_beta, freqs = wall_log_betas_from_absorption(alpha, n_bands=1)
    ir_ism = np.asarray(
        shoebox_rirs(
            jnp.asarray(ROOM),
            jnp.asarray(src[None]),
            jnp.asarray(mic),
            jnp.asarray(log_beta),
            jnp.asarray(freqs),
            n_samples=n_samples,
            max_order=14,
            sr=SR,
        )
    )[0, 0]

    e_rt = np.sum(ir_rt**2)
    e_ism = np.sum(ir_ism**2)
    # The two engines model reflections differently (fully-diffuse Lambertian
    # tracer vs fully-specular ISM), which shifts total reverberant energy by a
    # few dB even when decay rates agree; assert the same order of magnitude.
    assert 0.2 < e_rt / e_ism < 5.0


def test_convex_room_occlusion_skip_is_exact():
    """For a convex room, occlusion=False (the TriMesh.is_convex fast path that
    mesh_backend enables automatically) must be bit-identical to occlusion=True:
    interior segments are provably never blocked."""
    room = box_mesh(extents=[6.0, 4.0, 3.0], center=[3.0, 2.0, 1.5])
    assert room.is_convex
    tris = jnp.asarray(room.triangles.astype(np.float32))
    absorp = jnp.full((12, 2), 0.3, jnp.float32)
    scatter = jnp.full((12,), 0.2, jnp.float32)
    srcs = jnp.asarray([[1.5, 1.0, 1.2], [4.5, 3.0, 1.8]], jnp.float32)
    lis = jnp.asarray([[3.0, 2.0, 1.5]], jnp.float32)
    key = jax.random.PRNGKey(0)

    kw = dict(n_samples=2400, sr=24000, n_rays=512, max_depth=12)
    on = np.asarray(trace_rirs_multi(key, tris, absorp, scatter, srcs, lis,
                                     occlusion=True, **kw))
    off = np.asarray(trace_rirs_multi(key, tris, absorp, scatter, srcs, lis,
                                      occlusion=False, **kw))
    np.testing.assert_array_equal(on, off)


def _divided_room(tau=0.02, n_bands=2):
    """A 6x4x3 room fully divided at x=3 by a wall (nonconvex soup)."""
    room = box_mesh(extents=ROOM, center=ROOM / 2)
    # Wall overlaps the outer shell so no gap leaks around its edges
    wall = box_mesh(extents=[0.2, 4.4, 3.4], center=[3.0, 2.0, 1.5], inward_normals=False)
    tris = jnp.asarray(np.concatenate([room.triangles, wall.triangles]).astype(np.float32))
    f = tris.shape[0]
    absorption = jnp.full((f, n_bands), 0.3, jnp.float32)
    scatter = jnp.full((f,), 0.3, jnp.float32)
    transmission = jnp.full((f, n_bands), tau, jnp.float32)
    return tris, absorption, scatter, transmission


def test_transmission_through_dividing_wall():
    """With transmission off, a fully divided room passes zero energy across the
    wall; with it on, the listener receives a nonzero but bounded tail
    (the reference rlr config's `transmission` field, reference
    tests/test_worldstate_rlr.py:810-835)."""
    tris, absorption, scatter, tau = _divided_room(tau=0.02)
    src = jnp.asarray([[1.5, 2.0, 1.5]], jnp.float32)  # left of the wall
    lis = jnp.asarray([[4.5, 2.0, 1.5]], jnp.float32)  # right of the wall
    key = jax.random.PRNGKey(7)
    kw = dict(n_samples=2400, sr=24000, n_rays=2048, max_depth=24, occlusion=True)

    ir_off = np.asarray(
        trace_rirs_multi(key, tris, absorption, scatter, src, lis, **kw)
    )
    assert np.abs(ir_off).max() == 0.0  # divided: no path at all

    ir_on = np.asarray(
        trace_rirs_multi(key, tris, absorption, scatter, src, lis,
                         face_transmission=tau, transmission=True, **kw)
    )
    e_on = float(np.sum(ir_on**2))
    assert e_on > 0.0  # energy leaked through the wall

    # Bounded: far below the same trace in an undivided room
    room = box_mesh(extents=ROOM, center=ROOM / 2)
    tris_open = jnp.asarray(room.triangles.astype(np.float32))
    f = tris_open.shape[0]
    ir_open = np.asarray(
        trace_rirs_multi(key, tris_open, jnp.full((f, 2), 0.3, jnp.float32),
                         jnp.full((f,), 0.3, jnp.float32), src, lis,
                         n_samples=2400, sr=24000, n_rays=2048, max_depth=24,
                         occlusion=False)
    )
    e_open = float(np.sum(ir_open**2))
    assert e_on < 0.2 * e_open


def test_transmission_scales_with_tau():
    """More transmissive walls leak more energy."""
    src = jnp.asarray([[1.5, 2.0, 1.5]], jnp.float32)
    lis = jnp.asarray([[4.5, 2.0, 1.5]], jnp.float32)
    key = jax.random.PRNGKey(3)
    kw = dict(n_samples=2400, sr=24000, n_rays=2048, max_depth=24, occlusion=True)

    energies = []
    for tau_val in (1e-3, 3e-2):
        tris, absorption, scatter, tau = _divided_room(tau=tau_val)
        ir = np.asarray(
            trace_rirs_multi(key, tris, absorption, scatter, src, lis,
                             face_transmission=tau, transmission=True, **kw)
        )
        energies.append(float(np.sum(ir**2)))
    assert energies[1] > 3.0 * energies[0]


def test_transmission_config_plumbs_through_backend():
    """WorldStateRLR's rlr_kwargs transmission flag changes simulated IRs."""
    from audiblelight_tpu.geometry.mesh import TriMesh
    from audiblelight_tpu.worldstate.mesh_backend import WorldStateRLR

    room = box_mesh(extents=ROOM, center=ROOM / 2)
    wall = box_mesh(extents=[0.2, 4.4, 3.4], center=[3.0, 2.0, 1.5], inward_normals=False)
    soup = TriMesh(
        vertices=np.concatenate([room.vertices, wall.vertices]),
        faces=np.concatenate([room.faces, wall.faces + len(room.vertices)]),
    )

    irs = {}
    for flag in (False, True):
        # Curtain: tau ~0.2 at 500 Hz. The wall is a closed box (two faces), so
        # pass-through probability is ~tau^2 — pick rays/depth high enough that
        # the transmitted flux is reliably nonzero.
        state = WorldStateRLR(
            mesh=soup, material="Curtain", seed=0, sample_rate=24000,
            rlr_kwargs=dict(transmission=flag, indirect_ray_count=4096,
                            indirect_ray_depth=24, max_ir_length=0.1,
                            sample_rate=24000),
        )
        assert state.cfg.transmission is flag
        state.add_microphone("monocapsule", [4.5, 2.0, 1.5], "mic000")
        state._add_emitters_without_validating(np.array([[1.5, 2.0, 1.5]]), "src000")
        state.simulate()
        irs[flag] = state.irs["mic000"]

    e_off = float(np.sum(irs[False] ** 2))
    e_on = float(np.sum(irs[True] ** 2))
    assert e_off == 0.0
    assert e_on > 0.0


# ---------------------------------------------------------------------------
# Progressive wavefront decimation (rir.raytracer.decimation_phases)
# ---------------------------------------------------------------------------


def test_decimation_phases_schedule():
    from audiblelight_tpu.rir.raytracer import decimation_phases

    # Gated off: short or thin traces run one full-width phase
    assert decimation_phases(4096, 12, True) == ((0, 12, 4096),)
    assert decimation_phases(512, 60, True) == ((0, 60, 512),)
    assert decimation_phases(4096, 60, False) == ((0, 60, 4096),)
    # Active: thirds of the depth, halving ray width
    assert decimation_phases(4096, 60, True) == (
        (0, 20, 4096), (20, 40, 2048), (40, 60, 1024),
    )
    # Odd widths floor-divide
    assert decimation_phases(5000, 61, True) == (
        (0, 20, 5000), (20, 40, 2500), (40, 61, 1250),
    )


def test_decimation_gated_off_is_bitwise_identical():
    """decimate=True below the gate thresholds must change NOTHING."""
    from audiblelight_tpu.rir.raytracer import trace_energy_histogram_multi

    tris, absorption, scatter = make_scene(alpha=0.3)
    srcs = jnp.asarray([[2.0, 1.0, 1.2], [4.0, 3.0, 2.0]])
    lis = jnp.asarray([[4.5, 3.0, 1.8]])
    kwargs = dict(
        n_sources=2, n_rays=1024, max_depth=20, n_bins=128, bin_dt=0.002,
        occlusion=False,
    )
    h0 = trace_energy_histogram_multi(
        jax.random.PRNGKey(7), tris, absorption, scatter, srcs, lis,
        decimate=False, **kwargs,
    )
    h1 = trace_energy_histogram_multi(
        jax.random.PRNGKey(7), tris, absorption, scatter, srcs, lis,
        decimate=True, **kwargs,
    )
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_decimation_is_unbiased():
    """Decimated tracing must estimate the same energy histogram: matching
    total energy, per-source energies, and decay rate (RT60) — the Russian-
    roulette reweighting keeps the estimator unbiased, only the late-tail
    Monte-Carlo variance grows."""
    from audiblelight_tpu.rir.raytracer import trace_energy_histogram_multi

    tris, absorption, scatter = make_scene(alpha=0.3)
    srcs = jnp.asarray([[2.0, 1.0, 1.2], [4.0, 3.0, 2.0]])
    lis = jnp.asarray([[4.5, 3.0, 1.8]])
    kwargs = dict(
        n_sources=2, n_rays=4096, max_depth=36, n_bins=256, bin_dt=0.002,
        occlusion=False,
    )
    h_full = np.asarray(
        trace_energy_histogram_multi(
            jax.random.PRNGKey(3), tris, absorption, scatter, srcs, lis,
            decimate=False, **kwargs,
        )
    )
    h_dec = np.asarray(
        trace_energy_histogram_multi(
            jax.random.PRNGKey(3), tris, absorption, scatter, srcs, lis,
            decimate=True, **kwargs,
        )
    )
    assert h_dec.shape == h_full.shape
    # Deposits from bounces before the first breakpoint are bitwise shared
    # (same rays, same keys), so totals differ only by the thinned tail's
    # Monte-Carlo realisation.
    e_full = h_full.sum(axis=(1, 2, 3))
    e_dec = h_dec.sum(axis=(1, 2, 3))
    np.testing.assert_allclose(e_dec, e_full, rtol=0.05)

    # Decay rate agreement on the energy-decay fit window
    t = (np.arange(256) + 0.5) * 0.002
    for e_f, e_d in zip(h_full.sum(axis=(1, 2)), h_dec.sum(axis=(1, 2))):
        sel = (e_f > 0) & (e_d > 0) & (t > 0.02) & (t < 0.25)
        s_f, _ = np.polyfit(t[sel], 10 * np.log10(e_f[sel]), 1)
        s_d, _ = np.polyfit(t[sel], 10 * np.log10(e_d[sel]), 1)
        assert abs(s_f - s_d) / abs(s_f) < 0.1


def test_decimation_single_source_unbiased():
    """Single-source tracer: decimation keeps total energy and is gated off
    (bitwise) below thresholds, matching the multi-source behaviour."""
    tris, absorption, scatter = make_scene(alpha=0.3)
    src = jnp.asarray([2.0, 1.0, 1.2])
    lis = jnp.asarray([[4.5, 3.0, 1.8]])
    kwargs = dict(n_rays=4096, max_depth=36, n_bins=256, bin_dt=0.002, occlusion=False)
    h0 = np.asarray(trace_energy_histogram(
        jax.random.PRNGKey(5), tris, absorption, scatter, src, lis,
        decimate=False, **kwargs))
    h1 = np.asarray(trace_energy_histogram(
        jax.random.PRNGKey(5), tris, absorption, scatter, src, lis,
        decimate=True, **kwargs))
    np.testing.assert_allclose(h1.sum(), h0.sum(), rtol=0.05)
    # Below the gate: identical
    small = dict(n_rays=1024, max_depth=20, n_bins=128, bin_dt=0.002, occlusion=False)
    a = np.asarray(trace_energy_histogram(
        jax.random.PRNGKey(6), tris, absorption, scatter, src, lis,
        decimate=False, **small))
    b = np.asarray(trace_energy_histogram(
        jax.random.PRNGKey(6), tris, absorption, scatter, src, lis,
        decimate=True, **small))
    np.testing.assert_array_equal(a, b)


def test_tail_first_order_arrival_direction():
    """The TAIL's first-order encoding must point toward the arrivals.

    Source close to the +x wall, highly absorbent room: early tail deposits
    come from hit points clustered around the source on the +x side, so the
    X channel's signed energy (AmbiX dipole, receiver->source convention, the
    same convention the direct path uses) must be positive. A sign flip here
    (encoding the propagation direction instead of the arrival direction)
    passed every magnitude-based test while inverting the reverb's spatial
    image relative to the direct path."""
    from audiblelight_tpu.rir.raytracer import trace_energy_histogram_multi

    tris, absorption, scatter = make_scene(alpha=0.9, scattering=1.0)
    src = jnp.asarray([[5.6, 2.0, 1.5]])  # near the +x wall (room 6 x 4 x 3)
    lis = jnp.asarray([[1.5, 2.0, 1.5]])
    hist = np.asarray(
        trace_energy_histogram_multi(
            jax.random.PRNGKey(9), tris, absorption, scatter, src, lis,
            n_sources=1, n_rays=4096, max_depth=3, n_bins=64, bin_dt=0.002,
            encoding="foa", occlusion=False,
        )
    )  # (1, 4, 1, 64): AmbiX [W, X, Y, Z]
    w = hist[0, 0, 0]
    x = hist[0, 1, 0]
    # Early bins only (first bounce generation): arrivals from the +x side
    early = slice(0, 24)
    assert w[early].sum() > 0
    assert x[early].sum() > 0.3 * w[early].sum(), (
        f"tail X dipole should point toward the +x arrivals "
        f"(X={x[early].sum():.3e}, W={w[early].sum():.3e})"
    )


def test_tail_binaural_lateralisation():
    """Binaural tail: a source on the listener's LEFT (+y) must put more
    early-tail energy in the LEFT channel."""
    from audiblelight_tpu.rir.raytracer import trace_energy_histogram_multi

    tris, absorption, scatter = make_scene(alpha=0.9, scattering=1.0)
    src = jnp.asarray([[3.0, 3.6, 1.5]])  # +y of listener (left)
    lis = jnp.asarray([[3.0, 1.0, 1.5]])
    hist = np.asarray(
        trace_energy_histogram_multi(
            jax.random.PRNGKey(10), tris, absorption, scatter, src, lis,
            n_sources=1, n_rays=4096, max_depth=3, n_bins=64, bin_dt=0.002,
            encoding="binaural", occlusion=False,
        )
    )  # (1, 2, 1, 64): [left, right]; ref channel 0 carries energy, channel
    # 1 carries the covariance-matched companion — compare their signed sums
    left = hist[0, 0, 0, :24].sum()
    right = hist[0, 1, 0, :24].sum()
    assert left > right, (left, right)


def test_binaural_direct_itd_and_shadow():
    """Spherical-head binaural direct path: a source on the LEFT arrives at
    the left ear first (Woodworth ITD) and with more high-frequency energy
    (head shadow); a frontal source is interaurally symmetric."""
    from audiblelight_tpu.rir.sh import HEAD_RADIUS_M

    tris, absorption, scatter = make_scene()
    lis = jnp.asarray([[3.0, 1.0, 1.5]])
    sr_ = 48000
    n = 4096

    # Left source (+y of listener)
    ir = np.asarray(direct_path_ir(
        tris, jnp.asarray([3.0, 3.0, 1.5]), lis, n, sr=sr_, encoding="binaural",
    ))
    assert ir.shape == (2, n)
    onset_l = int(np.argmax(np.abs(ir[0]) > 0.25 * np.abs(ir[0]).max()))
    onset_r = int(np.argmax(np.abs(ir[1]) > 0.25 * np.abs(ir[1]).max()))
    itd = (onset_r - onset_l) / sr_
    expected = HEAD_RADIUS_M / 343.0 * (1.0 + np.pi / 2.0)  # ~0.66 ms at 90 deg
    assert 0.5 * expected < itd < 1.5 * expected, (itd, expected)

    # Head shadow: HF energy ratio L >> R, LF roughly equal
    spec_l = np.abs(np.fft.rfft(ir[0]))
    spec_r = np.abs(np.fft.rfft(ir[1]))
    freqs = np.fft.rfftfreq(n, 1 / sr_)
    hf = freqs > 6000
    lf = (freqs > 100) & (freqs < 500)
    assert spec_l[hf].sum() > 3.0 * spec_r[hf].sum()
    assert 0.6 < spec_l[lf].sum() / spec_r[lf].sum() < 1.7

    # Frontal source: symmetric
    ir_f = np.asarray(direct_path_ir(
        tris, jnp.asarray([5.0, 1.0, 1.5]), lis, n, sr=sr_, encoding="binaural",
    ))
    e_l, e_r = float((ir_f[0] ** 2).sum()), float((ir_f[1] ** 2).sum())
    assert abs(e_l - e_r) / max(e_l, e_r) < 0.05


def test_envelope_window_upsample_matches_gather():
    """The TPU window-matmul envelope upsample equals the gather
    interpolation (head clip included) for integer bin_samples.

    Tolerance note: the gather path computes frac = t - floor(t) with
    t = n / k in f32, whose cancellation at large n costs up to ulp(n/k)
    ~ 1e-4 of frac; the window path's per-phase weights are exact. The
    bound below is the GATHER's own rounding, not the window's."""
    import jax
    from audiblelight_tpu.rir.raytracer import _interp_envelope

    rng = np.random.default_rng(7)
    for n_bins, k, n_samples in ((2001, 48, 96000), (13, 4, 45), (6, 3, 18)):
        env = jnp.asarray(rng.uniform(0.0, 1.0, (2, 3, n_bins)).astype(np.float32))
        g = np.asarray(_interp_envelope(env, n_samples, float(k), window=False))
        w = np.asarray(_interp_envelope(env, n_samples, float(k), window=True))
        np.testing.assert_allclose(w, g, atol=3e-4)
