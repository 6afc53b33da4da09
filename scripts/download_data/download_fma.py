#!/usr/bin/env python
"""Download and prepare the Free Music Archive for the 'music' event class.

Behavior parity with the reference's download_fma.py: fetch an FMA subset zip
plus its metadata, then lay out per-genre train/test folders of MP3s under
<output>/music/<fold>/<genre>/<trackid>.mp3 (corrupt tracks and the three
abstract genres skipped). The organize half (`organize_fma`) works offline on an
already-extracted tree and is what the tests exercise.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from netutils import download_file, extract_zip  # noqa: E402

from audiblelight_tpu.utils import logger  # noqa: E402

BASE_URL = "https://os.unil.cloud.switch.ch/fma/"
METADATA_URL = BASE_URL + "fma_metadata.zip"
SUBSETS = ("small", "medium", "large", "full")

# Track ids the FMA maintainers list as corrupt archives
CORRUPT_FMA_TRACKS = {"098565", "098567", "098569", "099134", "108925", "133297"}
# Abstract genres that don't read as "music playing in a room"
SKIP_GENRES = {"Electronic", "Experimental", "Instrumental"}


_FMA_SUBSET_ORDER = {"small": 0, "medium": 1, "large": 2, "full": 3}


def fetch_fma(dataset_home: Path, subset: str = "small") -> None:
    """Download + extract fma_<subset>.zip and fma_metadata.zip (resumable)."""
    if subset not in SUBSETS:
        raise ValueError(f"subset must be one of {SUBSETS}, got {subset}")
    dataset_home.mkdir(parents=True, exist_ok=True)
    if not (dataset_home / f"fma_{subset}").is_dir():
        z = download_file(BASE_URL + f"fma_{subset}.zip", dataset_home / f"fma_{subset}.zip")
        extract_zip(z, dataset_home)
    if not (dataset_home / "fma_metadata").is_dir():
        z = download_file(METADATA_URL, dataset_home / "fma_metadata.zip")
        extract_zip(z, dataset_home)


def organize_fma(
    dataset_home: Path,
    output_dir: Path,
    subset: str = "small",
    ntracks_genre: int = 20,
    split_prob: float = 0.6,
    seed: int = 0,
) -> int:
    """Class-sorted layout (offline half): music/<fold>/<genre>/<id>.mp3.

    Reads fma_metadata/tracks.csv, takes up to `ntracks_genre` tracks per
    top-level genre from the chosen subset, splits train/test with probability
    `split_prob`, and copies out of the fma_<subset>/<id[:3]>/<id>.mp3 tree.

    Returns the number of tracks laid out.
    """
    tracks = pd.read_csv(
        Path(dataset_home) / "fma_metadata/tracks.csv", header=[0, 1], index_col=0
    )
    rng = np.random.default_rng(seed)
    n_copied = 0
    for genre in tracks["track"]["genre_top"].unique():
        if pd.isna(genre) or genre in SKIP_GENRES:
            continue
        sel = tracks[
            (tracks["track", "genre_top"] == genre)
            & (
                # FMA subsets NEST: each track is labelled with the smallest
                # subset containing it, so "medium" must include "small" etc.
                tracks["set", "subset"].map(
                    lambda x: _FMA_SUBSET_ORDER.get(str(x), 99)
                )
                <= _FMA_SUBSET_ORDER.get(str(subset), 0)
            )
        ][:ntracks_genre]
        for track_id in sel.index:
            tid = f"{int(track_id):06}"
            if tid in CORRUPT_FMA_TRACKS:
                continue
            src = Path(dataset_home) / f"fma_{subset}" / tid[:3] / f"{tid}.mp3"
            if not src.is_file():
                logger.warning(f"Missing FMA track {src}; skipping")
                continue
            fold = "train" if rng.random() < split_prob else "test"
            dest = Path(output_dir) / "music" / fold / str(genre) / f"{tid}.mp3"
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copyfile(src, dest)
            n_copied += 1
    return n_copied


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", required=True, help="dataset home (downloads land here)")
    parser.add_argument("--output", default=None, help="soundevents dir (default <path>/soundevents)")
    parser.add_argument("--subset", default="small", choices=SUBSETS)
    parser.add_argument("--ntracks-genre", type=int, default=20)
    parser.add_argument("--split-prob", type=float, default=0.6)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip-download", action="store_true",
                        help="organize an already-extracted tree only")
    args = parser.parse_args()

    home = Path(args.path)
    out = Path(args.output) if args.output else home / "soundevents"
    if not args.skip_download:
        fetch_fma(home, args.subset)
    n = organize_fma(home, out, args.subset, args.ntracks_genre, args.split_prob, args.seed)
    logger.info(f"Laid out {n} FMA tracks under {out / 'music'}")


if __name__ == "__main__":
    main()
