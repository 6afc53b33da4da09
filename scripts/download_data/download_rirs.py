#!/usr/bin/env python
"""Download measured RIR datasets (TAU-SRIR, METU Sparg) and convert to SOFA.

Reference scripts/download_data/download_rirs.py surface. Downloading requires
network access (gated via `requests`); the conversion path — packing measured IR
arrays + source/listener positions into SingleRoomSRIR SOFA files readable by
WorldStateSOFA — runs fully offline via audiblelight_tpu.io.sofa.write_sofa.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu.io.sofa import write_sofa
from audiblelight_tpu.utils import logger, safe_import

TAU_SRIR_ZENODO = "https://zenodo.org/records/6408611"
METU_SPARG_ZENODO = "https://zenodo.org/records/2635758"


def download_file(url: str, dest: Path) -> Path:
    """Stream a file from `url` to `dest` (stdlib urllib, resumable)."""
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from netutils import download_file as _dl

    return _dl(url, dest)


# Per-record archive names on the Zenodo landing pages
_ZENODO_FILES = {
    "tau": (TAU_SRIR_ZENODO, ["TAU-SRIR_DB.zip", "TAU-SNoise_DB.zip"]),
    "metu": (METU_SPARG_ZENODO, ["spargair.zip"]),
}


def run(output_dir: Path, dataset: str = "tau") -> Path:
    """Fetch + extract a measured-RIR dataset's archives into `output_dir`.

    The archives hold MATLAB/mat or wav IRs; convert them into SingleRoomSRIR
    SOFA files with the `convert` subcommand (offline) once extracted.
    """
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from netutils import extract_zip

    if dataset not in _ZENODO_FILES:
        raise ValueError(f"dataset must be one of {list(_ZENODO_FILES)}, got {dataset}")
    record, files = _ZENODO_FILES[dataset]
    out = Path(output_dir)
    for fname in files:
        dest = out / fname
        if not dest.is_file():
            download_file(f"{record}/files/{fname}?download=1", dest)
        extract_zip(dest, out)
    logger.info(
        f"Extracted {dataset} archives under {out}; convert IR arrays to SOFA "
        f"with `python scripts/download_data/download_rirs.py convert ...`"
    )
    return out


def convert_rirs_to_sofa(
    irs: np.ndarray,
    source_positions: np.ndarray,
    listener_position: np.ndarray,
    receiver_positions: np.ndarray,
    sample_rate: float,
    out_path: Path,
    listener_short_name: str = "mic",
) -> Path:
    """Pack measured IRs into a SingleRoomSRIR SOFA file (offline)."""
    out = write_sofa(
        out_path,
        irs,
        source_positions,
        listener_position,
        receiver_positions,
        sample_rate,
        listener_short_name=listener_short_name,
    )
    logger.warning(f"Wrote SOFA with {irs.shape[0]} measurements to {out}")
    return out


def convert_npy_dir(in_dir: Path, out_path: Path, sample_rate: float, name: str) -> Path:
    """Convert a directory of .npy arrays (irs/source_pos/listener_pos/receiver_pos)
    into one SOFA file. This is the offline half of the reference's pipeline."""
    irs = np.load(in_dir / "irs.npy")
    src = np.load(in_dir / "source_positions.npy")
    lst = np.load(in_dir / "listener_position.npy")
    rec = np.load(in_dir / "receiver_positions.npy")
    return convert_rirs_to_sofa(irs, src, lst, rec, sample_rate, out_path, name)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    dl = sub.add_parser("download", help="download a RIR dataset (needs network)")
    dl.add_argument("--dataset", choices=["tau", "metu"], required=True)
    dl.add_argument("--output-dir", type=str, required=True)

    cv = sub.add_parser("convert", help="convert local .npy RIRs to SOFA (offline)")
    cv.add_argument("--input-dir", type=str, required=True)
    cv.add_argument("--output", type=str, required=True)
    cv.add_argument("--sample-rate", type=float, default=24000)
    cv.add_argument("--name", type=str, default="mic")

    args = parser.parse_args()
    if args.cmd == "download":
        run(Path(args.output_dir), args.dataset)
        return
    convert_npy_dir(Path(args.input_dir), Path(args.output), args.sample_rate, args.name)


if __name__ == "__main__":
    main()
