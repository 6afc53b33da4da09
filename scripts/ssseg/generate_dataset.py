#!/usr/bin/env python
"""Generate a DCASE2025-Task4-style spatial semantic segmentation dataset.

Reference scripts/ssseg/generate_dataset.py:1-272 surface: short FOA scenes
(default 10 s) with up to 3 overlapping events, emitting BOTH the wet spatial
mixture and per-event dry stems (direct path + early reflections), enabled via
the Event's `ref_ir_channel` + `direct_path_time_ms` parameters. Uses the
DCASE2025Task4 class mapping.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu import utils
from audiblelight_tpu.core import Scene
from audiblelight_tpu.io.audio import wav_write
from audiblelight_tpu.utils import logger

DURATION = 10.0
SAMPLE_RATE = 32000
MAX_POLYPHONY = 3


def generate_scene(args, idx: int, rng: np.random.Generator) -> None:
    """One scene: FOA mixture + dry per-event stems + metadata."""
    out_root = Path(args.output_dir)
    mix_path = out_root / "mixtures" / f"scene_{idx:05d}"
    stem_dir = out_root / "stems" / f"scene_{idx:05d}"
    if (mix_path.parent / f"{mix_path.name}_mic000.wav").is_file():
        logger.info(f"Skipping existing scene {idx}")
        return
    mix_path.parent.mkdir(parents=True, exist_ok=True)
    stem_dir.mkdir(parents=True, exist_ok=True)

    dims = rng.uniform([4.0, 3.5, 2.5], [9.0, 7.0, 3.4])
    scene = Scene(
        duration=args.duration,
        sample_rate=SAMPLE_RATE,
        backend="shoebox",
        backend_kwargs=dict(
            dimensions=dims.tolist(),
            absorption=float(rng.uniform(0.2, 0.6)),
            max_order=args.ism_order,
            max_ir_length=0.5,
            seed=int(rng.integers(2**31)),
        ),
        fg_path=args.fg_dir,
        max_overlap=MAX_POLYPHONY,
        class_mapping="DCASE2025Task4",
    )
    scene.add_microphone(microphone_type="foalistener")

    n_events = int(rng.integers(1, MAX_POLYPHONY + 1))
    for _ in range(n_events):
        try:
            scene.add_event(
                event_type="static",
                max_place_attempts=100,
                # Dry-stem parameters: reference channel 0 (W), direct path
                # window [5, 50] ms around the IR peak
                ref_ir_channel=0,
                direct_path_time_ms=(5, 50),
            )
        except (ValueError, FileNotFoundError) as e:
            logger.warning(f"Could not place event: {e}")

    if len(scene.events) == 0:
        logger.warning(f"No events placed for scene {idx}; skipping")
        return

    scene.add_ambience(noise="gaussian")
    scene.generate(
        output_dir=mix_path.parent,
        audio=True,
        metadata_json=True,
        metadata_dcase=True,
        audio_fname=mix_path.name,
        metadata_fname=mix_path.name,
    )

    # Dry stems were computed during the render: write one WAV per event
    for alias, event in scene.events.items():
        for mic_alias, dry in event._spatial_audio_dry_padded.items():
            wav_write(
                stem_dir / f"{alias}_{event.class_label}_{mic_alias}_dry.wav",
                dry.astype(np.float32),
                SAMPLE_RATE,
            )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fg-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--n-scenes", type=int, default=10)
    parser.add_argument("--ism-order", type=int, default=10)
    parser.add_argument("--duration", type=float, default=DURATION)
    parser.add_argument("--seed", type=int, default=utils.SEED)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    for idx in range(args.n_scenes):
        logger.warning(f"[{idx + 1}/{args.n_scenes}] generating ssseg scene")
        generate_scene(args, idx, rng)


if __name__ == "__main__":
    main()
