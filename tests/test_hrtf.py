"""Measured-HRTF binaural rendering (rir.hrtf).

Covers the capability the reference gets from the rlr engine's measured-HRTF
Binaural ChannelLayout (reference micarrays.py:68-86, :349): SOFA
SimpleFreeFieldHRIR loading, direction interpolation, the direct-path HRIR
spectrum, the stochastic tail's band-power weighting, the shoebox ISM branch,
and the Binaural micarray's end-to-end plumbing + serialisation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from audiblelight_tpu import config
from audiblelight_tpu.micarrays import Binaural
from audiblelight_tpu.rir.hrtf import (
    HRTFSet,
    load_hrtf_sofa,
    sofa_source_dirs,
    write_hrtf_sofa,
)

SR = config.SAMPLE_RATE
N_TAPS = 128
BULK = 32  # common onset delay baked into every fixture HRIR (samples)
HEAD_R = 0.0875


def _windowed_sinc(delay: float, n: int) -> np.ndarray:
    """Unit-sum fractional-delay kernel on n taps."""
    h = np.sinc(np.arange(n) - delay) * np.hanning(n)
    return h / max(np.sum(h), 1e-9)


def _fixture_grid():
    az = np.arange(0, 360, 15, dtype=np.float64)
    el = np.array([-30.0, 0.0, 30.0])
    pairs = [(a, e) for e in el for a in az]
    return np.array([p[0] for p in pairs]), np.array([p[1] for p in pairs])


def make_fixture_hrirs(sr: int = SR, n: int = N_TAPS):
    """Synthetic measured set: per-ear Woodworth-style lead/lag + a monotone
    broadband ILD, with the LEFT ear's polarity INVERTED as a marker no
    analytic fallback can produce — any render whose left direct peak is
    negative provably went through the measured path."""
    az_deg, el_deg = _fixture_grid()
    az, el = np.deg2rad(az_deg), np.deg2rad(el_deg)
    dirs = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    )
    m = len(dirs)
    hrirs = np.zeros((m, 2, n))
    for i in range(m):
        y = dirs[i, 1]  # cosine to the left-ear axis
        for ear, sign in ((0, 1.0), (1, -1.0)):
            cos_ear = y * sign
            gain = 0.6 + 0.4 * cos_ear  # broadband ILD, near ear louder
            delay = BULK - cos_ear * (HEAD_R / 343.0) * sr  # near ear leads
            polarity = -1.0 if ear == 0 else 1.0  # left-ear marker
            hrirs[i, ear] = polarity * gain * _windowed_sinc(delay, n)
    return hrirs, az_deg, el_deg


@pytest.fixture(scope="module")
def hrtf_sofa(tmp_path_factory):
    hrirs, az, el = make_fixture_hrirs()
    path = tmp_path_factory.mktemp("hrtf") / "fixture_hrir.sofa"
    return write_hrtf_sofa(path, hrirs, az, el, SR)


@pytest.fixture(scope="module")
def hrtf(hrtf_sofa):
    return load_hrtf_sofa(str(hrtf_sofa), SR)


def test_load_shapes_and_units(hrtf):
    m = 24 * 3
    assert hrtf.dirs.shape == (m, 3)
    assert hrtf.hrirs.shape == (m, 2, N_TAPS)
    assert hrtf.sr == SR
    norms = np.linalg.norm(np.asarray(hrtf.dirs), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_load_resamples_to_engine_rate(tmp_path):
    hrirs, az, el = make_fixture_hrirs(sr=2 * SR, n=2 * N_TAPS)
    p = write_hrtf_sofa(tmp_path / "hi.sofa", hrirs, az, el, 2 * SR)
    s = load_hrtf_sofa(str(p), SR)
    assert s.hrirs.shape[-1] == N_TAPS
    assert s.sr == SR


def test_sofa_source_dirs_cartesian_rows():
    d = sofa_source_dirs(np.array([[2.0, 0.0, 0.0], [0.0, 0.0, -3.0]]), "metre", "cartesian")
    np.testing.assert_allclose(d, [[1, 0, 0], [0, 0, -1]], atol=1e-6)


def test_on_grid_interpolation_snaps(hrtf):
    # Query exactly at stored directions: weights concentrate on that row
    q = hrtf.dirs[5:8]
    out = hrtf.hrirs_at(q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(hrtf.hrirs[5:8]), atol=2e-3
    )


def test_off_grid_interpolation_is_convex(hrtf):
    # Midway between two azimuth neighbours at el=0: bounded by neighbours
    az = np.deg2rad(7.5)
    q = jnp.asarray([[np.cos(az), np.sin(az), 0.0]], dtype=jnp.float32)
    idx, w = hrtf.interp_weights(q)
    w = np.asarray(w)[0]
    assert w.shape == (3,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    assert np.all(w >= 0) and np.max(w) < 0.9


def test_band_powers_shape_and_ild(hrtf):
    bands = jnp.asarray([125.0, 500.0, 2000.0, 8000.0])
    bp = hrtf.band_powers(bands)
    assert bp.shape == (hrtf.dirs.shape[0], 2, 4)
    # Direction straight left (+y): left-ear power above right-ear power
    i_left = int(np.argmax(np.asarray(hrtf.dirs)[:, 1]))
    p = np.asarray(bp)[i_left]
    assert np.all(p[0] > p[1])


def _direct_binaural(hrtf, az_deg, dist=2.0):
    from audiblelight_tpu.rir.raytracer import direct_paths_ir

    az = np.deg2rad(az_deg)
    src = jnp.asarray([[dist * np.cos(az), dist * np.sin(az), 0.0]], dtype=jnp.float32)
    listener = jnp.zeros((1, 3), dtype=jnp.float32)
    # A distant dummy triangle: no occlusion
    tris = jnp.asarray([[[50.0, 50, 49], [51, 50, 49], [50, 51, 49]]], dtype=jnp.float32)
    n = 4096
    return np.asarray(
        direct_paths_ir(
            tris, src, listener, n, sr=SR, encoding="binaural", hrtf=hrtf
        )
    )[0]


def test_direct_path_uses_measured_hrir(hrtf):
    ir = _direct_binaural(hrtf, az_deg=90.0)  # source hard left
    el, er = np.sum(ir[0] ** 2), np.sum(ir[1] ** 2)
    assert el > 2.0 * er  # measured broadband ILD: left much louder
    # Left leads: energy-weighted arrival earlier on the left
    t = np.arange(ir.shape[-1])
    tl = np.sum(t * ir[0] ** 2) / el
    tr = np.sum(t * ir[1] ** 2) / er
    assert tl < tr
    # The fixture's left-polarity marker survives: the left peak is NEGATIVE,
    # which the analytic fallback (positive sinc kernels) cannot produce.
    assert ir[0][np.argmax(np.abs(ir[0]))] < 0


def test_direct_path_differs_from_analytic_fallback(hrtf):
    from audiblelight_tpu.rir.raytracer import direct_paths_ir

    src = jnp.asarray([[0.0, 2.0, 0.0]], dtype=jnp.float32)
    listener = jnp.zeros((1, 3), dtype=jnp.float32)
    tris = jnp.asarray([[[50.0, 50, 49], [51, 50, 49], [50, 51, 49]]], dtype=jnp.float32)
    a = np.asarray(direct_paths_ir(tris, src, listener, 4096, sr=SR, encoding="binaural", hrtf=hrtf))
    b = np.asarray(direct_paths_ir(tris, src, listener, 4096, sr=SR, encoding="binaural"))
    assert np.max(np.abs(a - b)) > 1e-4


def test_trace_rirs_binaural_with_hrtf(hrtf):
    """Full tracer (tail + direct) with the measured set on a small box."""
    import jax

    from audiblelight_tpu.geometry.mesh import box_mesh
    from audiblelight_tpu.rir.raytracer import trace_rirs

    mesh = box_mesh([4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    tris = jnp.asarray(mesh.triangles, dtype=jnp.float32)
    absorb = jnp.full((tris.shape[0], 4), 0.3, dtype=jnp.float32)
    scatter = jnp.full((tris.shape[0],), 0.3, dtype=jnp.float32)
    src = jnp.asarray([1.0, 2.2, 1.2], dtype=jnp.float32)  # left of listener
    lis = jnp.asarray([[2.0, 1.0, 1.2]], dtype=jnp.float32)
    ir = np.asarray(
        trace_rirs(
            jax.random.PRNGKey(0), tris, absorb, scatter, src, lis,
            n_samples=SR // 4, sr=SR, n_rays=400, max_depth=12,
            encoding="binaural", occlusion=False, hrtf=hrtf,
        )
    )
    assert ir.shape == (2, SR // 4)
    assert np.all(np.isfinite(ir))
    # Source sits toward +y (left): left channel carries more energy
    assert np.sum(ir[0] ** 2) > np.sum(ir[1] ** 2)


def test_shoebox_ism_with_hrtf(hrtf):
    from audiblelight_tpu.rir.image_source import shoebox_rirs

    log_beta = jnp.full((6, 4), 0.5 * np.log(1 - 0.3), dtype=jnp.float32)
    bands = jnp.asarray([125.0, 500.0, 2000.0, 8000.0])
    ir = np.asarray(
        shoebox_rirs(
            jnp.asarray([4.0, 3.0, 2.5]),
            jnp.asarray([[1.0, 2.2, 1.2]]),
            jnp.asarray([[2.0, 1.0, 1.2]]),
            log_beta, bands, n_samples=4096, max_order=2, sr=SR,
            encoding="binaural", hrtf=hrtf,
        )
    )
    assert ir.shape == (2, 1, 4096)
    assert np.all(np.isfinite(ir))
    assert np.sum(ir[0] ** 2) > np.sum(ir[1] ** 2)  # source on the left
    # Differs from the analytic spherical-head branch
    ir_fb = np.asarray(
        shoebox_rirs(
            jnp.asarray([4.0, 3.0, 2.5]),
            jnp.asarray([[1.0, 2.2, 1.2]]),
            jnp.asarray([[2.0, 1.0, 1.2]]),
            log_beta, bands, n_samples=4096, max_order=2, sr=SR,
            encoding="binaural",
        )
    )
    assert np.max(np.abs(ir - ir_fb)) > 1e-4


def test_micarray_serialisation_roundtrip(hrtf_sofa):
    from audiblelight_tpu.micarrays import MicArray

    mic = Binaural(hrtf_sofa=str(hrtf_sofa))
    mic.set_absolute_coordinates([1.0, 1.0, 1.0])
    d = mic.to_dict()
    assert d["hrtf_sofa"] == str(hrtf_sofa)
    back = MicArray.from_dict(d)
    assert isinstance(back, Binaural)
    assert back.hrtf_sofa == str(hrtf_sofa)
    assert back.load_hrtf(SR) is not None
    # Without a file the field is omitted and load_hrtf yields the fallback
    plain = Binaural()
    assert "hrtf_sofa" not in plain.to_dict()
    assert plain.load_hrtf(SR) is None


def test_scene_e2e_measured_binaural(hrtf_sofa, tmp_path):
    """WorldStateShoebox + Binaural(hrtf_sofa=...) end-to-end: the simulation
    runs the measured path and its stems differ from the analytic fallback."""
    from audiblelight_tpu.worldstate.shoebox_backend import WorldStateShoebox

    def render(hrtf_path):
        ws = WorldStateShoebox(dimensions=[4.0, 3.0, 2.5], max_order=2)
        ws.add_microphone(
            Binaural(hrtf_sofa=hrtf_path), alias="head", position=[2.0, 1.0, 1.2]
        )
        ws.add_emitter(alias="src", position=[1.0, 2.2, 1.2])
        irs = ws.get_irs()["head"]
        return np.asarray(irs)

    measured = render(str(hrtf_sofa))
    fallback = render(None)
    assert measured.shape == fallback.shape
    assert np.all(np.isfinite(measured))
    assert np.max(np.abs(measured - fallback)) > 1e-4


def test_non_binaural_sofa_rejected(tmp_path):
    """FIR sets without exactly 2 receivers are refused with a clear error."""
    import h5py

    p = tmp_path / "quad.sofa"
    with h5py.File(p, "w") as f:
        f.create_dataset("Data.IR", data=np.zeros((4, 4, 64)))
        f.create_dataset("Data.SamplingRate", data=np.array([float(SR)]))
        ds = f.create_dataset("SourcePosition", data=np.zeros((4, 3)))
        ds.attrs["Type"] = "spherical"
        ds.attrs["Units"] = "degree, degree, metre"
    with pytest.raises(ValueError, match="2 ears"):
        load_hrtf_sofa(str(p), SR)


def test_load_is_cached_per_path_and_rate(hrtf_sofa):
    a = load_hrtf_sofa(str(hrtf_sofa), SR)
    b = load_hrtf_sofa(str(hrtf_sofa), SR)
    assert a is b  # lru-cached: one device copy per (path, rate)
    c = load_hrtf_sofa(str(hrtf_sofa), SR // 2)
    assert c is not a and c.hrirs.shape[-1] == N_TAPS // 2


def test_hrtf_set_is_a_pytree(hrtf):
    """HRTFSet flattens/unflattens through jax transforms (jit boundary)."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(hrtf)
    assert len(leaves) == 2
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.sr == hrtf.sr and back.hrirs.shape == hrtf.hrirs.shape

    @jax.jit
    def left_peak(h):
        return jnp.max(jnp.abs(h.hrirs[:, 0]))

    assert np.isfinite(float(left_peak(hrtf)))


def test_bytes_attrs_cartesian_parsed(tmp_path):
    """Real SOFA files store attrs as BYTES; a cartesian SourcePosition set
    must be recognised (ADVICE r4: str(b'cartesian') never startswith 'cart')."""
    import h5py

    hrirs, az, el = make_fixture_hrirs()
    azr, elr = np.deg2rad(az), np.deg2rad(el)
    dirs = np.stack(
        [np.cos(elr) * np.cos(azr), np.cos(elr) * np.sin(azr), np.sin(elr)],
        axis=-1,
    )
    p = tmp_path / "cart.sofa"
    with h5py.File(p, "w") as f:
        f.create_dataset("Data.IR", data=hrirs)
        f.create_dataset("Data.SamplingRate", data=np.array([float(SR)]))
        ds = f.create_dataset("SourcePosition", data=dirs * 1.5)
        ds.attrs["Type"] = np.bytes_(b"cartesian")
        ds.attrs["Units"] = np.bytes_(b"metre")
    got = load_hrtf_sofa(str(p), SR)
    # Parsed as cartesian: directions match the generating grid exactly.
    np.testing.assert_allclose(np.asarray(got.dirs), dirs, atol=1e-6)
    # If the rows had been misread as spherical the frames would disagree.
    sph = sofa_source_dirs(dirs * 1.5, "degree, degree, metre", "spherical")
    assert np.max(np.abs(sph - dirs)) > 0.1
