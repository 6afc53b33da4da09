"""Acoustic-image end-to-end: APGD on a RENDERED scanned-room scene.

The unit tests in test_imaging.py stop at `get_visibility_matrix` on
synthetic capsule signals; this closes the loop the reference's imaging
pipeline closes (reference imaging.py:978, core.py:1900-2104): place a
source in a nonconvex ray-traced room, render the Eigenmike32 mix, run
`Scene.generate_acoustic_image`, and assert the APGD energy blob lands at
the ground-truth direction of the placed emitter.
"""

import json

import numpy as np
import pytest

from audiblelight_tpu import Scene
from audiblelight_tpu.geometry.mesh import scanned_like_room
from audiblelight_tpu.io.audio import wav_write

SR = 24000


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fg")
    d = root / "maleSpeech"
    d.mkdir()
    rng = np.random.default_rng(5)
    t = np.arange(SR * 2) / SR
    # Broadband in the imaging band (config.AIMG_FMIN..FMAX = 1500..4500 Hz)
    sig = sum(0.25 * np.sin(2 * np.pi * f * t) for f in (1800.0, 2700.0, 3900.0))
    sig += 0.05 * rng.standard_normal(len(t))
    wav_write(d / "src.wav", sig.astype(np.float32), SR)
    return root


def test_acoustic_image_peak_matches_source_direction(fg_dir, tmp_path):
    mesh = scanned_like_room(
        extents=(6.0, 5.0, 3.0), n_furniture=2, subdivision_levels=2, seed=9
    )
    assert not mesh.is_convex
    scene = Scene(
        duration=2.0,
        sample_rate=SR,
        backend="rlr",
        fg_path=fg_dir,
        backend_kwargs=dict(
            mesh=mesh,
            seed=3,
            rlr_kwargs=dict(
                indirect_ray_count=256,
                indirect_ray_depth=6,
                max_ir_length=0.15,
                mesh_simplification=400,
                diffraction=False,  # parity default ON; pinned off for CPU test speed
            ),
        ),
    )
    mic_pos = np.array([3.0, 2.5, 1.5])
    scene.add_microphone(
        microphone_type="eigenmike32", position=mic_pos, alias="em"
    )
    # Source 1.2 m away toward +x, slightly above — clear line of sight
    src_pos = mic_pos + np.array([1.2, 0.0, 0.3])
    scene.add_event(
        event_type="static", position=src_pos, alias="s0",
        scene_start=0.2, event_start=0.0, duration=1.5, snr=30.0,
    )

    from audiblelight_tpu.synthesize import (
        generate_scene_audio_from_events,
        render_audio_for_all_scene_events,
    )

    render_audio_for_all_scene_events(scene)
    generate_scene_audio_from_events(scene)
    assert "em" in scene.audio and np.abs(scene.audio["em"]).max() > 0

    # Reduced APGD params keep the CPU cost test-sized: 3 bands, 40 frames,
    # SH order 8 (field of 4*(8+1)^2 = 324 pixels)
    scene.generate_acoustic_image(
        output_dir=tmp_path, nbands=3, frame_cap=40, sh_order=8
    )

    img = scene.acoustic_image["em"]  # (n_px, nbands, n_frames)
    assert img.shape[0] == 4 * (8 + 1) ** 2
    assert img.min() >= 0 and np.isfinite(img).all()

    # Ground truth: emitter direction in the mic frame
    from audiblelight_tpu.imaging import get_field

    emitter = scene.get_event("s0").emitters[0]
    gt_vec = emitter.coordinates_relative_cartesian["em"]
    gt_dir = gt_vec / np.linalg.norm(gt_vec)
    r = get_field(8)  # (3, n_px) unit directions

    # Peak of the median-band image, maxed over frames
    med = np.median(img, axis=1)  # (n_px, n_frames)
    peak_px = int(np.argmax(med.max(axis=1)))
    cos = float(r[:, peak_px] @ gt_dir)
    assert cos > np.cos(np.deg2rad(25.0)), (
        f"APGD peak {np.rad2deg(np.arccos(np.clip(cos, -1, 1))):.1f} deg off "
        f"the placed source"
    )

    # The JSON + HDF artifacts the reference pipeline writes must exist
    js = json.loads((tmp_path / "acoustic_image_metadata_em.json").read_text())
    assert js  # segmentation metadata is non-empty
    assert (tmp_path / "acoustic_image_em.hdf").is_file()
