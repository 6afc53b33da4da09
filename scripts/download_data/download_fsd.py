#!/usr/bin/env python
"""Download FSD50K and sort the DCASE-selected clips into class folders.

Behavior parity with the reference's download_fsd.py: fetch the FSD50K archives
(multipart zips from Zenodo), recombine + extract them, fetch the
DCASE-synthetic-2022 selection list, and copy each selected clip into
<output>/<fold>/<class>/<file>.wav. `organize_fsd` (the selection/copy half)
works offline on an already-extracted tree and a local selection list.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path
from typing import Iterable

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from netutils import combine_multipart_zip, download_file, download_text, extract_zip  # noqa: E402

from audiblelight_tpu.utils import logger  # noqa: E402

ZENODO = "https://zenodo.org/record/4060432/files/"
# FSD50K ships the dev audio as a 6-part spanned zip and eval as 2 parts.
DEV_PARTS = ["FSD50K.dev_audio.z01", "FSD50K.dev_audio.z02", "FSD50K.dev_audio.z03",
             "FSD50K.dev_audio.z04", "FSD50K.dev_audio.z05", "FSD50K.dev_audio.zip"]
EVAL_PARTS = ["FSD50K.eval_audio.z01", "FSD50K.eval_audio.zip"]
GROUND_TRUTH = "FSD50K.ground_truth.zip"
DCASE_FSD50K_SELECTED = "https://zenodo.org/record/6406873/files/FSD50K_selected.txt"


def fetch_fsd(dataset_home: Path) -> None:
    """Download + recombine + extract the FSD50K audio archives (resumable)."""
    dataset_home.mkdir(parents=True, exist_ok=True)
    for parts, marker in ((DEV_PARTS, "FSD50K.dev_audio"), (EVAL_PARTS, "FSD50K.eval_audio")):
        if (dataset_home / marker).is_dir():
            continue
        for part in parts:
            download_file(ZENODO + part, dataset_home / part)
        single = combine_multipart_zip(
            dataset_home / parts[-1], dataset_home / f"{marker}_single.zip"
        )
        extract_zip(single, dataset_home)
    if not (dataset_home / "FSD50K.ground_truth").is_dir():
        z = download_file(ZENODO + GROUND_TRUTH, dataset_home / GROUND_TRUTH)
        extract_zip(z, dataset_home)


def organize_fsd(
    dataset_home: Path, selected_lines: Iterable[str], output_dir: Path
) -> int:
    """Copy DCASE-selected clips into class folders (offline half).

    Each line of the selection list is a relative path like
    ``train/maleSpeech/12345.wav``; "train" paths resolve against
    FSD50K.dev_audio, "test" against FSD50K.eval_audio (the reference's rule).

    Returns the number of clips laid out.
    """
    n_copied = 0
    for line in selected_lines:
        line = line.strip()
        if not line:
            continue
        rel = Path(line)
        if "train" in rel.parts:
            source_root = Path(dataset_home) / "FSD50K.dev_audio"
        elif "test" in rel.parts:
            source_root = Path(dataset_home) / "FSD50K.eval_audio"
        else:
            raise ValueError(f"Selection line has no train/test component: {line}")
        src = source_root / rel.name
        if not src.is_file():
            logger.warning(f"Missing FSD50K clip {src}; skipping")
            continue
        dest = Path(output_dir) / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(src, dest)
        n_copied += 1
    return n_copied


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", required=True, help="dataset home (downloads land here)")
    parser.add_argument("--output", default=None, help="soundevents dir (default <path>/soundevents)")
    parser.add_argument("--selected", default=None,
                        help="local FSD50K_selected.txt (fetched from Zenodo when omitted)")
    parser.add_argument("--skip-download", action="store_true",
                        help="organize an already-extracted tree only")
    parser.add_argument("--cleanup", action="store_true", help="remove raw archives after layout")
    args = parser.parse_args()

    home = Path(args.path)
    out = Path(args.output) if args.output else home / "soundevents"
    if not args.skip_download:
        fetch_fsd(home)
    if args.selected:
        lines = Path(args.selected).read_text().splitlines()
    else:
        lines = download_text(DCASE_FSD50K_SELECTED)
    n = organize_fsd(home, lines, out)
    logger.info(f"Laid out {n} FSD50K clips under {out}")
    if args.cleanup:
        for d in ("FSD50K.dev_audio", "FSD50K.eval_audio", "FSD50K.ground_truth"):
            shutil.rmtree(home / d, ignore_errors=True)
        for z in home.glob("FSD50K.*.z*"):
            z.unlink()


if __name__ == "__main__":
    main()
