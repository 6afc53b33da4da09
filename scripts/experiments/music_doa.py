#!/usr/bin/env python
"""MUSIC DOA validation experiment (reference scripts/experiments/music_doa.py
surface): place a source at known azimuths around an Eigenmike32, render the
scene, estimate DOA with MUSIC, and report the error statistics. Uses the
package's own MUSIC implementation (audiblelight_tpu.doa) instead of
pyroomacoustics."""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu.core import Scene
from audiblelight_tpu.doa import estimate_doa
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.micarrays import Eigenmike32
from audiblelight_tpu.utils import logger

SR = 44100


def run_trial(az_gt: float, fg: Path, seed: int) -> float:
    scene = Scene(
        duration=3.0,
        backend="shoebox",
        fg_path=fg,
        backend_kwargs=dict(
            dimensions=[8.0, 8.0, 4.0], max_order=2, max_ir_length=0.12,
            frequency_bands=1, absorption=0.85, seed=seed,
        ),
    )
    scene.add_microphone(microphone_type="eigenmike32", position=[4.0, 4.0, 2.0])
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
    audio = scene.audio[list(scene.audio.keys())[0]][:, : 2 * SR]

    est = estimate_doa(audio, Eigenmike32().coordinates_cartesian, SR, n_sources=1)
    err = abs((est[0, 0] - az_gt + 180) % 360 - 180)
    return float(err)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n-azimuths", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="al_doa_"))
    d = tmp / "music"
    d.mkdir()
    rng = np.random.default_rng(args.seed)
    t = np.arange(SR * 2) / SR
    sig = 0.4 * np.sin(2 * np.pi * 800 * t) + 0.3 * np.sin(2 * np.pi * 2400 * t)
    sig += 0.2 * rng.standard_normal(len(t))
    wav_write(d / "src.wav", sig.astype(np.float32), SR)

    azimuths = np.linspace(-180, 180, args.n_azimuths, endpoint=False)
    errors = []
    for i, az in enumerate(azimuths):
        err = run_trial(float(az), tmp, seed=i)
        errors.append(err)
        logger.warning(f"az={az:+7.1f} deg -> error {err:5.1f} deg")

    errors = np.array(errors)
    print(
        f"mean_error_deg={errors.mean():.2f} median_error_deg={np.median(errors):.2f} "
        f"max_error_deg={errors.max():.2f}"
    )


if __name__ == "__main__":
    main()
