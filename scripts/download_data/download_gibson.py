#!/usr/bin/env python
"""Download Gibson environment meshes (license-gated) and lay them out.

The Gibson database requires accepting a license agreement
(https://forms.gle/36TW9uVpjrE1Mkf9A); access is granted as a Google Drive
link, so the fetch half needs either `gdown` (when a Drive file id is given)
or any pre-downloaded archive passed via --archive. The extract half
(`extract_gibson`) is offline: it unpacks the archive and flattens every .glb
into <output>/meshes/gibson/<Room>.glb, the layout the SELD asset table
(scripts/seld/seld_dataset_assets.py) resolves rooms against.
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from netutils import extract_archive  # noqa: E402

from audiblelight_tpu.utils import logger, safe_import  # noqa: E402

GIBSON_FORM = "https://forms.gle/36TW9uVpjrE1Mkf9A"


def fetch_gibson(drive_id: str, dataset_home: Path) -> Path:
    """Fetch the licensed Gibson archive from Google Drive via gdown."""
    gdown = safe_import(
        "gdown",
        "downloading Gibson meshes requires the 'gdown' package and a Drive file "
        f"id granted through the license form at {GIBSON_FORM}",
    )
    dataset_home.mkdir(parents=True, exist_ok=True)
    dest = dataset_home / "gibson_glb.zip"
    gdown.download(id=drive_id, output=str(dest), quiet=False)
    return dest


def extract_gibson(archive: Path, output_dir: Path) -> int:
    """Unpack a Gibson archive and flatten .glb meshes into meshes/gibson/.

    Returns the number of meshes laid out.
    """
    mesh_dir = Path(output_dir) / "meshes" / "gibson"
    mesh_dir.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        extract_archive(archive, tmp)
        n = 0
        for glb in Path(tmp).rglob("*.glb"):
            shutil.copyfile(glb, mesh_dir / glb.name)
            n += 1
    if n == 0:
        logger.warning(f"No .glb meshes found inside {archive}")
    return n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", required=True, help="output root (resources dir)")
    parser.add_argument("--drive-id", default=None,
                        help="Google Drive file id from the Gibson license grant")
    parser.add_argument("--archive", default=None,
                        help="pre-downloaded Gibson archive (zip/tar) to extract")
    args = parser.parse_args()

    out = Path(args.path)
    if args.archive:
        archive = Path(args.archive)
    elif args.drive_id:
        archive = fetch_gibson(args.drive_id, out)
    else:
        raise SystemExit(
            f"Provide --archive or --drive-id. Gibson access is granted via the "
            f"license form at {GIBSON_FORM}."
        )
    n = extract_gibson(archive, out)
    logger.info(f"Laid out {n} Gibson meshes under {out / 'meshes/gibson'}")


if __name__ == "__main__":
    main()
