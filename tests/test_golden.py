"""Checked-in golden fixtures for the deterministic SOFA render path.

Unlike the numpy oracle in test_synthesize.py (which is rebuilt from the same
algorithm at test time), these fixtures are frozen binary outputs: any drift in
SOFA IR lookup, IR normalisation, convolution, level chain, ambience PRNG,
scene mixing, or DCASE framing fails here even if a reimplementation drifts
"consistently". Regenerate intentionally via `python tests/golden_gen.py --write`.
"""

from pathlib import Path

import numpy as np
import pytest

from golden_gen import FIXTURE_DIR, SR, build

pytestmark = pytest.mark.skipif(
    not (FIXTURE_DIR / "golden_sofa_render.npz").is_file(),
    reason="golden fixtures not generated",
)


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    return build(tmp_path_factory.mktemp("golden"))


def test_scene_audio_matches_golden(rendered):
    audio, _, _ = rendered
    ref = np.load(FIXTURE_DIR / "golden_sofa_render.npz")
    assert int(ref["sr"]) == SR
    assert audio.shape == ref["audio"].shape
    scale = np.abs(ref["audio"]).max()
    # 1e-5 relative absorbs CPU/TPU float accumulation-order differences only
    np.testing.assert_allclose(audio / scale, ref["audio"] / scale, atol=1e-5)


def test_dcase_csv_matches_golden(rendered):
    _, csv_text, _ = rendered
    ref = (FIXTURE_DIR / "golden_dcase.csv").read_text()
    assert csv_text == ref


def test_golden_metadata_invariants(rendered):
    """Independent sanity on the frozen CSV so a bad regeneration can't slip in."""
    _, csv_text, scene_dict = rendered
    rows = [r.split(",") for r in csv_text.strip().splitlines()]
    frames = [int(r[0]) for r in rows]
    classes = {int(r[1]) for r in rows}
    assert min(frames) == 10  # static event starts at 1.0 s -> frame 10
    assert classes == {8, 1}  # music + maleSpeech (DCASE2023Task3 ids)
    assert len(scene_dict["events"]) == 2


def test_tracer_histogram_matches_golden():
    """Frozen-key stochastic-tracer regression: the energy histogram for a
    fixed PRNG key on a fixed nonconvex room is deterministic on CPU; any
    drift in ray generation, bounce physics, occlusion, or binning breaks
    this (threefry keys are stable across jax versions)."""
    import jax
    import jax.numpy as jnp

    from audiblelight_tpu.geometry.mesh import scanned_like_room
    from audiblelight_tpu.rir.raytracer import trace_energy_histogram_multi

    ref = np.load(FIXTURE_DIR / "golden_tracer_hist.npz")

    m = scanned_like_room(
        extents=(5.0, 4.0, 2.8), n_furniture=3, subdivision_levels=2, seed=21
    )
    tris = jnp.asarray(m.triangles)
    f = tris.shape[0]
    assert f == int(ref["faces"])
    hist = trace_energy_histogram_multi(
        jax.random.PRNGKey(1234), tris,
        jnp.full((f, 4), 0.3, jnp.float32), jnp.full((f,), 0.4, jnp.float32),
        jnp.asarray([[1.5, 1.2, 1.0], [3.5, 2.8, 1.6]], jnp.float32),
        jnp.asarray([[2.5, 2.0, 1.4], [2.55, 2.0, 1.4]], jnp.float32),
        n_sources=2, n_rays=512, max_depth=12, n_bins=128, bin_dt=0.002,
        occlusion=True,
    )
    np.testing.assert_allclose(np.asarray(hist), ref["hist"], rtol=2e-5, atol=1e-12)
