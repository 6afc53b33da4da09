#!/usr/bin/env python
"""Download navigation waypoint JSONs for the Gibson meshes.

The waypoints archive is distributed alongside the reference project on Google
Drive (gdown, license-free). The extract half (`extract_waypoints`) is offline:
it flattens every per-room waypoints JSON into
<output>/waypoints/gibson/<Room>.json, where WorldStateRLR's
load_mesh_navigation_waypoints looks them up by mesh name.
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


def fetch_waypoints(drive_id: str, dataset_home: Path) -> Path:
    """Fetch the waypoints archive from Google Drive via gdown."""
    gdown = safe_import(
        "gdown", "downloading Gibson waypoints requires the 'gdown' package"
    )
    dataset_home.mkdir(parents=True, exist_ok=True)
    dest = dataset_home / "gibson_waypoints.zip"
    gdown.download(id=drive_id, output=str(dest), quiet=False)
    return dest


def extract_waypoints(archive: Path, output_dir: Path) -> int:
    """Flatten per-room waypoint JSONs into waypoints/gibson/ (offline half)."""
    wp_dir = Path(output_dir) / "waypoints" / "gibson"
    wp_dir.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        extract_archive(archive, tmp)
        n = 0
        for js in Path(tmp).rglob("*.json"):
            shutil.copyfile(js, wp_dir / js.name)
            n += 1
    if n == 0:
        logger.warning(f"No waypoint JSONs found inside {archive}")
    return n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path", required=True, help="output root (resources dir)")
    parser.add_argument("--drive-id", default=None, help="Google Drive file id")
    parser.add_argument("--archive", default=None, help="pre-downloaded archive to extract")
    args = parser.parse_args()

    out = Path(args.path)
    if args.archive is None and args.drive_id is None:
        raise SystemExit(
            "Pass --archive <file> (pre-downloaded) or --drive-id <id> "
            "(the waypoints archive is licence-gated; see download_gibson.py)"
        )
    archive = Path(args.archive) if args.archive else fetch_waypoints(args.drive_id, out)
    n = extract_waypoints(archive, out)
    logger.info(f"Laid out {n} waypoint files under {out / 'waypoints/gibson'}")


if __name__ == "__main__":
    main()
