#!/usr/bin/env python
"""Shared fetch/extract helpers for the dataset download scripts.

Stdlib-only networking (urllib with Range-header resume) so the download
tooling works without `requests`; archive handling via zipfile/tarfile.
Multipart (spanned) zips — FSD50K ships as .z01..zNN + .zip — are recombined
with the system `zip -s 0` when available.

Mirrors the role of the reference's scripts/download_data/utils.py (which uses
requests + tqdm); the behavior surface (download, extract, combine) is the same.
"""

from __future__ import annotations

import shutil
import subprocess
import tarfile
import urllib.request
import zipfile
from pathlib import Path
from typing import Union

from audiblelight_tpu.utils import logger

CHUNK = 1 << 20


def download_file(
    url: str, destination: Union[str, Path], resume: bool = True, timeout: int = 60
) -> Path:
    """Download `url` to `destination`, resuming partial files when possible."""
    destination = Path(destination)
    destination.parent.mkdir(parents=True, exist_ok=True)
    part = destination.with_suffix(destination.suffix + ".part")

    start = part.stat().st_size if (resume and part.is_file()) else 0
    req = urllib.request.Request(url)
    if start:
        req.add_header("Range", f"bytes={start}-")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            mode = "ab" if start and resp.status == 206 else "wb"
            total = resp.headers.get("Content-Length")
            logger.info(
                f"Downloading {url} -> {destination}"
                + (f" ({int(total) / 1e6:.1f} MB)" if total else "")
            )
            with open(part, mode) as f:
                while True:
                    chunk = resp.read(CHUNK)
                    if not chunk:
                        break
                    f.write(chunk)
    except urllib.error.HTTPError as e:
        if e.code == 416 and part.is_file():  # already fully downloaded
            pass
        else:
            raise
    part.rename(destination)
    return destination


def download_text(url: str, timeout: int = 60) -> list[str]:
    """Fetch a small text resource and return its lines."""
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return resp.read().decode("utf-8").splitlines()


def extract_zip(zip_path: Union[str, Path], destination: Union[str, Path]) -> None:
    """Extract a zip archive."""
    try:
        with zipfile.ZipFile(zip_path, "r") as zf:
            zf.extractall(destination)
    except zipfile.BadZipFile as e:
        raise ValueError(f"{zip_path} is not a valid zip file") from e


def extract_tar(tar_path: Union[str, Path], destination: Union[str, Path]) -> None:
    """Extract a (possibly gzipped) tar archive."""
    with tarfile.open(tar_path, "r:*") as tf:
        tf.extractall(destination)


def extract_archive(path: Union[str, Path], destination: Union[str, Path]) -> None:
    """Extract by suffix: .zip via zipfile, .tar/.tar.gz/.tgz via tarfile."""
    path = Path(path)
    if path.suffix == ".zip":
        extract_zip(path, destination)
    elif path.suffix in (".tar", ".gz", ".tgz", ".bz2", ".xz"):
        extract_tar(path, destination)
    else:
        raise ValueError(f"Don't know how to extract {path}")


def combine_multipart_zip(first_zip: Union[str, Path], out_zip: Union[str, Path]) -> Path:
    """Recombine a spanned zip (x.zip + x.z01..) into a single archive.

    Requires the system `zip` binary (`zip -s 0`), as in the reference.
    """
    if shutil.which("zip") is None:
        raise RuntimeError(
            "Recombining multipart zips requires the system `zip` binary; "
            "install it or recombine manually with `zip -s 0 <first> --out <dest>`."
        )
    res = subprocess.run(
        ["zip", "-s", "0", str(first_zip), "--out", str(out_zip)],
        capture_output=True,
        text=True,
    )
    if res.returncode != 0:
        raise RuntimeError(f"zip -s 0 failed: {res.stderr[-500:]}")
    return Path(out_zip)
