"""Physics-oracle tests: MUSIC DOA closes the loop placement -> RIR -> render.

Mirror of the reference's algorithm-validation strategy
(tests/test_with_algorithms.py): render a scene with an Eigenmike32 and check that
MUSIC recovers the ground-truth azimuth of the placed source.
"""

import numpy as np
import pytest

from audiblelight_tpu import Scene
from audiblelight_tpu.doa import estimate_doa
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.micarrays import Eigenmike32

SR = 44100


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("fg")
    d = root / "music"
    d.mkdir()
    t = np.arange(SR * 2) / SR
    # Broadband source: noise bursts + harmonics
    sig = 0.4 * np.sin(2 * np.pi * 800 * t) + 0.3 * np.sin(2 * np.pi * 2400 * t)
    sig += 0.2 * rng.standard_normal(len(t))
    wav_write(d / "src.wav", sig.astype(np.float32), SR)
    return root


@pytest.mark.parametrize("az_gt", [0.0, 90.0, -135.0])
def test_music_recovers_azimuth(fg_dir, az_gt):
    scene = Scene(
        duration=3.0,
        backend="shoebox",
        fg_path=fg_dir,
        backend_kwargs=dict(
            dimensions=[8.0, 8.0, 4.0],
            max_order=2,
            max_ir_length=0.12,
            frequency_bands=1,
            absorption=0.85,  # dry room keeps the direct path dominant
            seed=0,
        ),
    )
    mic_center = np.array([4.0, 4.0, 2.0])
    scene.add_microphone(microphone_type="eigenmike32", position=mic_center, alias="em")
    # Source 2 m away at the requested azimuth, same elevation
    scene.add_event(
        event_type="static",
        position=[az_gt, 0.0, 2.0],
        polar=True,
        scene_start=0.0,
        event_start=0.0,
        duration=2.0,
        snr=25.0,
    )

    from audiblelight_tpu.synthesize import (
        generate_scene_audio_from_events,
        render_audio_for_all_scene_events,
    )

    render_audio_for_all_scene_events(scene)
    generate_scene_audio_from_events(scene)
    audio = scene.audio["em"][:, : 2 * SR]

    em = Eigenmike32()
    est = estimate_doa(audio, em.coordinates_cartesian, SR, n_sources=1)
    est_az = est[0, 0]

    err = abs((est_az - az_gt + 180) % 360 - 180)
    assert err <= 15.0, f"azimuth error {err:.1f} deg (est {est_az:.1f}, gt {az_gt})"
