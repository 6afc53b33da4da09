#!/usr/bin/env python
"""Download VisualGenome images and crop class-labelled regions for video overlays.

Behavior parity with the reference's download_visualgenome.py: fetch the two
VG_100K image archives plus objects.json, find objects whose (alias-normalised)
names map onto DCASE2023Task3 class labels, crop each object's bounding box out
of its source image, and save crops as <output>/<class>/<image>_<i>.jpg — the
layout Scene(image_path=...) pairs with events for video generation.

The region-extraction half (`extract_regions`) is offline-testable: it takes a
parsed objects.json structure and a directory of images.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from netutils import download_file, extract_zip  # noqa: E402

from audiblelight_tpu.utils import logger  # noqa: E402

VG_OBJECTS_JSON = (
    "https://homes.cs.washington.edu/~ranjay/visualgenome/data/dataset/objects.json.zip"
)
VG_IMAGE_ZIPS = [
    ("https://cs.stanford.edu/people/rak248/VG_100K_2/images.zip", "VG_100K"),
    ("https://cs.stanford.edu/people/rak248/VG_100K_2/images2.zip", "VG_100K_2"),
]

# DCASE2023Task3 class label -> VisualGenome object names that depict it
DCASE_VG_SELECTED = {
    "telephone": ["telephone", "phone", "cellphone", "mobile phone"],
    "waterTap": ["tap", "faucet", "water tap", "sink faucet"],
    "doorCupboard": ["door", "doorway", "open door", "cupboard", "cabinet door"],
    "femaleSpeech": ["woman", "girl", "lady"],
    "maleSpeech": ["man", "boy", "gentleman"],
    "laughter": ["smile", "laughing", "smiling woman", "smiling man"],
    "footsteps": ["shoe", "shoes", "boots", "sneakers"],
    "knock": ["door knocker", "fist", "knuckles"],
    "bell": ["bell", "church bell", "doorbell"],
    "musicInstrument": ["guitar", "piano", "violin", "drums", "trumpet"],
    "clapping": ["hands", "clapping hands", "applause"],
    "domesticSounds": ["vacuum", "dishwasher", "washing machine", "kettle"],
    "music": ["speaker", "stereo", "radio", "headphones"],
}
MIN_REGION_PIXELS = 64  # skip boxes smaller than this on either side


def _object_to_class() -> dict[str, str]:
    """Invert DCASE_VG_SELECTED: VG object name -> DCASE class label."""
    return {
        name.lower(): label
        for label, names in DCASE_VG_SELECTED.items()
        for name in names
    }


def extract_regions(
    objects: list[dict],
    image_dirs: list[Path],
    output_dir: Path,
    max_per_class: int = 200,
) -> int:
    """Crop class-matching object regions out of their images (offline half).

    `objects` is the parsed objects.json: a list of per-image dicts with
    ``image_id`` and ``objects`` = [{"names": [...], "x", "y", "w", "h"}, ...].

    Returns the number of crops written.
    """
    from PIL import Image

    obj_to_class = _object_to_class()
    counts = {label: 0 for label in DCASE_VG_SELECTED}
    n_written = 0
    for img_entry in objects:
        image_id = img_entry.get("image_id")
        img_path = None
        for d in image_dirs:
            candidate = Path(d) / f"{image_id}.jpg"
            if candidate.is_file():
                img_path = candidate
                break
        if img_path is None:
            continue
        img = None
        for i, ob in enumerate(img_entry.get("objects", [])):
            label = next(
                (obj_to_class[n.lower()] for n in ob.get("names", []) if n.lower() in obj_to_class),
                None,
            )
            if label is None or counts[label] >= max_per_class:
                continue
            w, h = int(ob.get("w", 0)), int(ob.get("h", 0))
            if w < MIN_REGION_PIXELS or h < MIN_REGION_PIXELS:
                continue
            if img is None:
                img = Image.open(img_path).convert("RGB")
            x, y = int(ob.get("x", 0)), int(ob.get("y", 0))
            crop = img.crop((x, y, x + w, y + h))
            dest = Path(output_dir) / label
            dest.mkdir(parents=True, exist_ok=True)
            crop.save(dest / f"{image_id}_{i}.jpg", quality=90)
            counts[label] += 1
            n_written += 1
    logger.info(f"Region counts per class: {counts}")
    return n_written


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", required=True, help="dataset home (downloads land here)")
    parser.add_argument("--output", default=None, help="images dir (default <path>/images)")
    parser.add_argument("--max-per-class", type=int, default=200)
    parser.add_argument("--skip-download", action="store_true")
    args = parser.parse_args()

    home = Path(args.path)
    out = Path(args.output) if args.output else home / "images"
    if not args.skip_download:
        home.mkdir(parents=True, exist_ok=True)
        if not (home / "objects.json").is_file():
            z = download_file(VG_OBJECTS_JSON, home / "objects.json.zip")
            extract_zip(z, home)
        for url, subdir in VG_IMAGE_ZIPS:
            if not (home / subdir).is_dir():
                z = download_file(url, home / Path(url).name)
                extract_zip(z, home)

    objects = json.loads((home / "objects.json").read_text())
    image_dirs = [home / sub for _, sub in VG_IMAGE_ZIPS]
    n = extract_regions(objects, image_dirs, out, args.max_per_class)
    logger.info(f"Wrote {n} class-labelled crops under {out}")


if __name__ == "__main__":
    main()
