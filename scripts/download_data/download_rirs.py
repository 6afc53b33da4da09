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
    """Stream a file from `url` to `dest` (requires network access)."""
    requests = safe_import(
        "requests",
        "Network downloads require the `requests` package and egress access. "
        "In an offline environment, place the dataset files manually and use "
        "`convert_rirs_to_sofa` instead.",
    )
    dest.parent.mkdir(parents=True, exist_ok=True)
    with requests.get(url, stream=True, timeout=60) as r:
        r.raise_for_status()
        with open(dest, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
    return dest


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
        url = TAU_SRIR_ZENODO if args.dataset == "tau" else METU_SPARG_ZENODO
        logger.warning(f"Dataset landing page: {url}")
        raise SystemExit(
            "Automated Zenodo download requires resolving per-file URLs from the "
            "record page; fetch the archive manually (or with zenodo_get) and then "
            "run the `convert` subcommand."
        )
    convert_npy_dir(Path(args.input_dir), Path(args.output), args.sample_rate, args.name)


if __name__ == "__main__":
    main()
