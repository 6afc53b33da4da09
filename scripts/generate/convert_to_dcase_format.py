#!/usr/bin/env python
"""Convert generated scene outputs into the canonical DCASE dataset layout.

Reference scripts/generate/convert_to_dcase_format.py surface: walk a directory
of generated scenes (audio WAVs + per-mic DCASE CSVs + metadata JSONs) and
re-arrange into the fold/split layout expected by DCASE SELD baselines:

    <out>/foa_dev/dev-train-synth/fold1_room1_mix001.wav
    <out>/metadata_dev/dev-train-synth/fold1_room1_mix001.csv
"""

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu.utils import logger


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-dir", type=str, required=True)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--fmt", choices=["foa", "mic"], default="mic")
    parser.add_argument("--split", choices=["train", "test"], default="train")
    parser.add_argument("--room", type=int, default=1)
    args = parser.parse_args()

    in_root = Path(args.input_dir)
    out_root = Path(args.output_dir)
    fold = 1 if args.split == "train" else 2

    audio_out = out_root / f"{args.fmt}_dev" / f"dev-{args.split}-synth"
    meta_out = out_root / "metadata_dev" / f"dev-{args.split}-synth"
    audio_out.mkdir(parents=True, exist_ok=True)
    meta_out.mkdir(parents=True, exist_ok=True)

    wavs = sorted(in_root.rglob("*.wav"))
    mix_idx = 1
    for wav in wavs:
        # Pair each WAV with ITS mic's CSV (scene_X_mic000.wav ->
        # scene_X_mic000.csv); a multi-mic scene otherwise attached the
        # alphabetically-first mic's metadata to every mic's audio.
        exact = wav.with_suffix(".csv")
        if exact.is_file():
            csv_path = exact
        else:
            csv_candidates = sorted(wav.parent.glob("*.csv"))
            if not csv_candidates:
                logger.warning(f"No CSV next to {wav}; skipping")
                continue
            if len(csv_candidates) > 1:
                logger.warning(
                    f"No exact CSV match for {wav.name}; using {csv_candidates[0].name}"
                )
            csv_path = csv_candidates[0]
        stem = f"fold{fold}_room{args.room}_mix{mix_idx:03d}"
        shutil.copy2(wav, audio_out / f"{stem}.wav")
        shutil.copy2(csv_path, meta_out / f"{stem}.csv")
        mix_idx += 1

    logger.warning(f"Converted {mix_idx - 1} scenes into {out_root}")


if __name__ == "__main__":
    main()
