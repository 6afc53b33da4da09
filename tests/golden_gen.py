"""Golden-fixture generator for the deterministic SOFA render path.

The round-1 parity oracle is a numpy transcription of the reference algorithm
living in the same repo — a semantics drift in both implementations at once
would pass it. These fixtures freeze the current outputs as checked-in binary
artifacts so ANY later drift in the deterministic path (SOFA IR lookup, IR
normalisation, convolution, level chain, scene mix, ambience PRNG, DCASE
framing) breaks `tests/test_golden.py`.

Regenerate intentionally (after an *audited* semantics change) with:

    python tests/golden_gen.py --write

Everything is seeded and placed explicitly; the only permitted cross-platform
variance is float accumulation order (CPU vs TPU FFTs), which the test absorbs
with a 1e-5 relative tolerance on audio and exact equality on the DCASE CSV.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

FIXTURE_DIR = Path(__file__).resolve().parent / "fixtures"
SR = 24000


def build(tmp_dir=None):
    """Render the canonical deterministic scene.

    Returns (audio (4, 5*SR) float32, dcase_csv_text, scene_json_dict).
    """
    from audiblelight_tpu import Scene
    from audiblelight_tpu.io.audio import wav_write
    from audiblelight_tpu.io.sofa import write_sofa
    from audiblelight_tpu.synthesize import generate_dcase2024_metadata

    tmp = Path(tmp_dir or tempfile.mkdtemp())
    rng = np.random.default_rng(5)

    # Synthetic measured room: 8 source positions, 4 capsules, delay + decay IRs
    grid = rng.uniform([1, 1, 1], [4, 3, 2], (8, 3))
    irs = np.zeros((8, 4, 2048))
    for m in range(8):
        for c in range(4):
            d = int(np.linalg.norm(grid[m] - [2.5, 2.0, 1.5]) / 343 * SR)
            irs[m, c, d] = 1.0 / (1 + d / 100)
            tail = 2048 - d - 50
            irs[m, c, d + 50 :] = (
                rng.standard_normal(tail) * 0.01 * np.exp(-np.linspace(0, 6, tail))
            )
    sofa_path = write_sofa(
        tmp / "room_mic.sofa", irs, grid, [2.5, 2.0, 1.5],
        rng.uniform(-0.02, 0.02, (4, 3)), SR,
    )

    fg = tmp / "fg"
    t = np.arange(SR * 2) / SR
    (fg / "music").mkdir(parents=True)
    wav_write(
        fg / "music" / "tone.wav",
        (0.6 * np.sin(2 * np.pi * 440 * t) * np.exp(-t)).astype(np.float32),
        SR,
    )
    (fg / "maleSpeech").mkdir()
    wav_write(
        fg / "maleSpeech" / "speech.wav",
        (0.4 * np.sign(np.sin(2 * np.pi * 180 * t)) * np.exp(-0.5 * t)).astype(
            np.float32
        ),
        SR,
    )

    scene = Scene(
        duration=5.0,
        sample_rate=SR,
        backend="sofa",
        backend_kwargs=dict(sofa=sofa_path, seed=11),
        fg_path=fg,
    )
    # Static event at a measured grid point; moving event snapped along the grid
    scene.add_event(
        event_type="static", position=grid[3], alias="ev_static",
        scene_start=1.0, event_start=0.0, duration=2.0, snr=10.0,
        filepath=fg / "music" / "tone.wav",
    )
    # Every samplable parameter is pinned: Scene's default distributions draw
    # from the GLOBAL numpy RNG (scipy .rvs), which other test imports perturb.
    scene.add_event(
        event_type="moving", alias="ev_moving", shape="linear",
        scene_start=2.5, event_start=0.0, duration=1.5, snr=8.0,
        filepath=fg / "maleSpeech" / "speech.wav",
        spatial_resolution=2.0, spatial_velocity=1.0,
    )
    scene.add_ambience(noise="pink")

    from audiblelight_tpu.synthesize import (
        generate_scene_audio_from_events,
        render_audio_for_all_scene_events,
    )

    render_audio_for_all_scene_events(scene)
    generate_scene_audio_from_events(scene)
    mic_alias = scene.state.mic_alias
    audio = np.asarray(scene.audio[mic_alias], dtype=np.float32)

    meta = generate_dcase2024_metadata(scene)[mic_alias]
    csv_text = meta.to_csv(header=False)
    return audio, csv_text, scene.to_dict()


def write_fixtures() -> None:
    FIXTURE_DIR.mkdir(exist_ok=True)
    audio, csv_text, _ = build()
    np.savez_compressed(FIXTURE_DIR / "golden_sofa_render.npz", audio=audio, sr=SR)
    (FIXTURE_DIR / "golden_dcase.csv").write_text(csv_text)
    print(
        f"Wrote {FIXTURE_DIR / 'golden_sofa_render.npz'} "
        f"(audio {audio.shape}, peak {np.abs(audio).max():.6f}) and golden_dcase.csv "
        f"({len(csv_text.splitlines())} rows)"
    )


if __name__ == "__main__":
    import sys

    if "--write" not in sys.argv:
        raise SystemExit("Refusing to overwrite golden fixtures without --write")
    write_fixtures()
