"""Data-acquisition helpers (re-exported download functions).

Reference audiblelight/download_data.py:39-46 surface: FSD50K sound events, FMA
music, Gibson meshes + waypoints, measured RIRs (-> SOFA), and VisualGenome
images. The implementations live in scripts/download_data/ (stdlib urllib
fetchers with resume + offline organize/extract halves); network fetches are
attempted directly and raise ordinary URL errors in offline environments,
while every layout/convert half runs without network (and is what the tests
exercise). License-gated sources (Gibson) additionally need `gdown` and a
granted Drive file id.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Union

from audiblelight_tpu.utils import get_project_root, logger

# Canonical dataset sources (for manual acquisition)
FSD50K_ZENODO = "https://zenodo.org/records/4060432"
FMA_GITHUB = "https://github.com/mdeff/fma"
GIBSON_FORM = "https://forms.gle/36TW9uVpjrE1Mkf9A"  # Gibson database access form
TAU_SRIR_ZENODO = "https://zenodo.org/records/6408611"
VISUALGENOME = "https://homes.cs.washington.edu/~ranjay/visualgenome/index.html"


def _scripts():
    """Import the scripts/download_data package (kept CLI-first, like the ref)."""
    p = str(get_project_root() / "scripts" / "download_data")
    if p not in sys.path:
        sys.path.insert(0, p)


def download_fsd(
    output_dir: Union[str, Path], selected_txt: Optional[Union[str, Path]] = None
) -> Path:
    """Download FSD50K (multipart Zenodo zips) and sort the DCASE-selected
    clips into <fold>/<class>/<file>.wav folders under `output_dir`."""
    _scripts()
    from download_fsd import DCASE_FSD50K_SELECTED, fetch_fsd, organize_fsd

    from netutils import download_text

    home = Path(output_dir)
    fetch_fsd(home)
    lines = (
        Path(selected_txt).read_text().splitlines()
        if selected_txt
        else download_text(DCASE_FSD50K_SELECTED)
    )
    n = organize_fsd(home, lines, home / "soundevents")
    logger.info(f"FSD50K: laid out {n} clips under {home / 'soundevents'}")
    return home / "soundevents"


def download_fma(
    output_dir: Union[str, Path], subset: str = "small", ntracks_genre: int = 20
) -> Path:
    """Download an FMA subset and lay out music/<fold>/<genre>/<id>.mp3."""
    _scripts()
    from download_fma import fetch_fma, organize_fma

    home = Path(output_dir)
    fetch_fma(home, subset)
    n = organize_fma(home, home / "soundevents", subset, ntracks_genre)
    logger.info(f"FMA: laid out {n} tracks under {home / 'soundevents' / 'music'}")
    return home / "soundevents" / "music"


def download_gibson(
    output_dir: Union[str, Path],
    drive_id: Optional[str] = None,
    archive: Optional[Union[str, Path]] = None,
) -> Path:
    """Download (license-gated, via gdown + Drive id) or extract a provided
    Gibson archive into <output_dir>/meshes/gibson/<Room>.glb."""
    _scripts()
    from download_gibson import extract_gibson, fetch_gibson

    out = Path(output_dir)
    if archive is None:
        if drive_id is None:
            raise ValueError(
                f"Gibson meshes are license-gated: accept the form at {GIBSON_FORM}, "
                f"then pass the granted Drive file id as drive_id= (or a "
                f"pre-downloaded archive as archive=)."
            )
        archive = fetch_gibson(drive_id, out)
    n = extract_gibson(Path(archive), out)
    logger.info(f"Gibson: laid out {n} meshes under {out / 'meshes/gibson'}")
    return out / "meshes" / "gibson"


def download_gibson_waypoints(
    output_dir: Union[str, Path],
    drive_id: Optional[str] = None,
    archive: Optional[Union[str, Path]] = None,
) -> Path:
    """Download or extract the navigation-waypoints archive into
    <output_dir>/waypoints/gibson/<Room>.json."""
    _scripts()
    from download_gibson_waypoints import extract_waypoints, fetch_waypoints

    out = Path(output_dir)
    if archive is None:
        if drive_id is None:
            raise ValueError("Pass drive_id= (gdown) or archive= (local file).")
        archive = fetch_waypoints(drive_id, out)
    n = extract_waypoints(Path(archive), out)
    logger.info(f"Waypoints: laid out {n} files under {out / 'waypoints/gibson'}")
    return out / "waypoints" / "gibson"


def download_rirs(output_dir: Union[str, Path], dataset: str = "tau") -> Path:
    """Download measured RIR datasets and convert them to SOFA files.

    Delegates to scripts/download_data/download_rirs.py (fetch + the offline
    numpy-IR -> SingleRoomSRIR conversion via audiblelight_tpu.io.sofa).
    """
    _scripts()
    import download_rirs as _rirs

    return _rirs.run(Path(output_dir), dataset)


def download_visualgenome(
    output_dir: Union[str, Path], max_per_class: int = 200
) -> Path:
    """Download VisualGenome and crop class-labelled regions into
    <output_dir>/images/<class>/ for Scene.image_path video overlays."""
    _scripts()
    import json

    from download_visualgenome import (
        VG_IMAGE_ZIPS,
        VG_OBJECTS_JSON,
        extract_regions,
    )
    from netutils import download_file, extract_zip

    home = Path(output_dir)
    home.mkdir(parents=True, exist_ok=True)
    if not (home / "objects.json").is_file():
        z = download_file(VG_OBJECTS_JSON, home / "objects.json.zip")
        extract_zip(z, home)
    for url, subdir in VG_IMAGE_ZIPS:
        if not (home / subdir).is_dir():
            z = download_file(url, home / Path(url).name)
            extract_zip(z, home)
    objects = json.loads((home / "objects.json").read_text())
    n = extract_regions(objects, [home / s for _, s in VG_IMAGE_ZIPS], home / "images", max_per_class)
    logger.info(f"VisualGenome: wrote {n} crops under {home / 'images'}")
    return home / "images"


__all__ = [
    "download_fsd",
    "download_fma",
    "download_gibson",
    "download_gibson_waypoints",
    "download_rirs",
    "download_visualgenome",
]
