"""Tests for the APGD acoustic imaging subsystem."""

import numpy as np
import pytest

import jax.numpy as jnp

from audiblelight_tpu.imaging import (
    apgd_solve,
    create_2d_gaussian,
    create_target_grid,
    eigh_max,
    extract_visibilities,
    fibonacci,
    find_segmentations,
    form_visibility,
    generate_acoustic_image_json,
    get_field,
    get_visibility_matrix,
    sigmoid,
    standardise_acoustic_image_amplitude,
    steering_operator,
)
from audiblelight_tpu.micarrays import Eigenmike32

SR = 44100


def test_fibonacci_lattice():
    pts = fibonacci(3)
    assert pts.shape == (3, 4 * 16)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=0), 1.0, atol=1e-9)
    # Region-limited
    sub = fibonacci(3, direction=[0, 0, 1], fo_v=np.deg2rad(90))
    assert sub.shape[1] < pts.shape[1]
    assert np.all(sub[2] >= np.cos(np.deg2rad(45)) - 1e-9)
    with pytest.raises(ValueError):
        fibonacci(-1)
    with pytest.raises(ValueError):
        fibonacci(3, direction=[0, 0, 1])  # fo_v missing


def test_get_field():
    r = get_field(5)
    assert r.shape[0] == 3
    assert r.shape[1] <= 4 * 36


def test_steering_operator():
    mic_xyz = np.random.default_rng(0).standard_normal((3, 8)) * 0.05
    r = get_field(4)
    a = steering_operator(mic_xyz, r)
    assert a.shape == (8, r.shape[1])
    np.testing.assert_allclose(np.abs(a), 1.0, atol=1e-12)  # phase-only


def test_extract_visibilities_shapes(rng):
    audio = rng.standard_normal((SR, 4))
    s = extract_visibilities(audio, SR, 0.1, 2000.0, 100.0, alpha=1.0)
    assert s.shape == (10, 4, 4)
    # Hermitian
    np.testing.assert_allclose(s, s.conj().transpose(0, 2, 1), atol=1e-6)


def test_form_visibility_pooling(rng):
    audio = rng.standard_normal((SR, 4))
    s = form_visibility(audio, SR, 2000.0, 100.0, 0.01, 0.1)
    assert s.shape == (10, 4, 4)


def test_apgd_recovers_point_source():
    """A plane wave from direction r0 must produce an image peaking near r0."""
    em = Eigenmike32()
    mic_xyz = em.coordinates_cartesian.T  # (3, 32)
    r = get_field(6)
    a = steering_operator(mic_xyz, r)

    # Pick a field direction and form its ideal rank-1 visibility
    target_idx = 40
    a0 = a[:, target_idx]
    sigma = np.outer(a0, a0.conj())

    l_ = jnp.asarray(2.0 * eigh_max(a), dtype=jnp.float32)
    x = np.asarray(
        apgd_solve(
            jnp.asarray(sigma, dtype=jnp.complex64),
            jnp.asarray(a, dtype=jnp.complex64),
            l_,
            jnp.zeros(a.shape[1]),
            n_iter=100,
        )
    )
    assert x.min() >= 0
    peak_idx = int(np.argmax(x))
    # Peak within ~15 degrees of the injected direction
    cos_angle = float(r[:, peak_idx] @ r[:, target_idx])
    assert cos_angle > np.cos(np.deg2rad(15.0))


def test_get_visibility_matrix_end_to_end(rng):
    """Acoustic image for a synthetic 32-channel signal with a dominant source."""
    em = Eigenmike32()
    mic_xyz = em.coordinates_cartesian.T
    r = get_field(4)
    a = steering_operator(mic_xyz, r)

    # Simulate a narrowband source from field direction 10 hitting all capsules
    n = SR // 2
    t = np.arange(n) / SR
    carrier = np.sin(2 * np.pi * 3000.0 * t)
    audio = np.real(np.outer(carrier, a[:, 10].conj())) + 0.01 * rng.standard_normal((n, 32))

    img = get_visibility_matrix(
        audio, em.coordinates_polar, sr=SR, nbands=2, sh_order=4, n_iter=30
    )
    n_px = r.shape[1]
    assert img.shape[0] == n_px
    assert img.shape[1] == 2
    assert img.min() >= 0
    assert img.max() > 0
    # The steering operator is evaluated at a single band-top wavelength (a
    # deliberate quirk inherited from the pipeline design), so an off-model
    # carrier localises imprecisely; assert a bright pixel lands near the
    # injected direction among the top responses. Exact-model recovery is
    # covered by test_apgd_recovers_point_source.
    med = np.median(img, axis=1)
    top5 = np.argsort(med.max(axis=1))[-5:]
    cos_angles = [float(r[:, i] @ r[:, 10]) for i in top5]
    assert max(cos_angles) > np.cos(np.deg2rad(50.0))


def test_scale_validation(rng):
    audio = rng.standard_normal((SR // 4, 4))
    coords = np.array([[45, 35, 0.01], [-45, -35, 0.01], [135, -35, 0.01], [-135, 35, 0.01]])
    with pytest.raises(ValueError):
        get_visibility_matrix(audio, coords, sr=SR, fmin=5000, fmax=1000)
    with pytest.raises(ValueError):
        get_visibility_matrix(audio, coords, sr=SR, scale="sqrt")


def test_create_2d_gaussian():
    g = create_2d_gaussian(180, 90, 360, 180)
    assert g.shape == (180, 360)
    assert np.isclose(g[90, 180], 1.0)
    # Decays with distance
    assert g[90, 250] < g[90, 200] < 1.0
    with pytest.raises(ValueError):
        create_2d_gaussian(400, 90, 360, 180)


def test_create_target_grid():
    grid = create_target_grid(8, 4)
    assert grid.shape == (32, 2)
    assert grid[:, 0].max() == 180 and grid[:, 0].min() == -180
    assert grid[:, 1].max() == 90 and grid[:, 1].min() == -90


def test_find_segmentations():
    img = np.zeros((20, 40))
    img[5:8, 10:14] = 0.5  # blob 1
    img[15:17, 30:33] = 0.3  # blob 2
    segs = find_segmentations(img)
    assert len(segs) == 2
    total_px = sum(len(s) for s in segs)
    assert total_px == 3 * 4 + 2 * 3
    # each entry is [x, y, amplitude]
    assert all(len(p) == 3 for s in segs for p in s)


def test_generate_acoustic_image_json_and_standardise():
    rng = np.random.default_rng(0)
    sh_order = 3
    n_px = 4 * (sh_order + 1) ** 2
    # Acoustic image with a bright region
    img = rng.uniform(0, 1e-4, (n_px, 2, 5))
    img[7, :, 2] = 0.002  # bright pixel at frame 2
    metadata = np.array([[2, 1, 0, 10, 5, 150]])
    js = generate_acoustic_image_json(
        img, metadata, resolution=(72, 36), polygon_mask_threshold=4e-5
    )
    assert len(js) == 1
    assert js[0]["metadata_frame_index"] == 2
    assert js[0]["category_id"] == 1
    assert js[0]["distance"] == 150.0

    std = standardise_acoustic_image_amplitude(js)
    for poly in std[0]["segmentation"]:
        amps = np.array(poly)[:, -1]
        assert np.all((amps >= 0) & (amps <= 1))


def test_sigmoid():
    assert sigmoid(0) == 0.5
    assert sigmoid(100) > 0.999
    assert sigmoid(-100) < 0.001
