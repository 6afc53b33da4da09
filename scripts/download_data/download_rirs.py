#!/usr/bin/env python
"""Download measured RIR datasets (TAU-SRIR, METU Sparg) and convert to SOFA.

Reference scripts/download_data/download_rirs.py surface. Downloading requires
network access (gated via `requests`); the conversion path — packing measured IR
arrays + source/listener positions into SingleRoomSRIR SOFA files readable by
WorldStateSOFA — runs fully offline via audiblelight_tpu.io.sofa.write_sofa.
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from audiblelight_tpu.io.sofa import write_sofa
from audiblelight_tpu.utils import logger

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


# EM32 capsule indices forming the AmbeoVR-like tetrahedral 'mic' subset of
# the Eigenmike (the reference's channel pick for MIC-format SOFA files,
# reference scripts/download_data/download_rirs.py:100).
TETRA_CHANS_IN_EM32 = (5, 9, 25, 21)

# Tetrahedral capsule positions for the EM32 subset (metres, relative to the
# array centre) — matches micarrays.AmbeoVR's geometry scale.
_TETRA_RECEIVERS = np.array(
    [
        [0.02432, 0.02432, 0.02432],
        [0.02432, -0.02432, -0.02432],
        [-0.02432, 0.02432, -0.02432],
        [-0.02432, -0.02432, 0.02432],
    ]
)


def metu_grid_to_metres(xyz_digits: str) -> tuple:
    """METU Sparg directory names are digit triples indexing a 0.5 m grid
    centred on the em32 array: x/y count DOWN from 3, z counts UP from 2
    (reference scripts/download_data/download_rirs.py:431-436)."""
    x_d, y_d, z_d = xyz_digits
    return ((3 - int(x_d)) * 0.5, (3 - int(y_d)) * 0.5, (int(z_d) - 2) * 0.5)


def prepare_metu(dataset_path: Path, dest_path_sofa: Path) -> Path:
    """Convert an extracted METU Sparg `spargair/em32` tree to metu_mic.sofa.

    Layout: one directory per source grid position (digit-triple name), each
    holding per-channel IR WAVs `IR{ch:05d}.wav` (1-based channel numbers);
    the MIC-format SOFA keeps the tetrahedral EM32 channel subset, matching
    the reference pipeline's output
    (reference scripts/download_data/download_rirs.py:427-468).
    """
    from audiblelight_tpu.io.audio import load_audio

    spargpath = Path(dataset_path) / "spargair" / "em32"
    positions = sorted(p for p in os.listdir(spargpath) if len(p) == 3)
    if not positions:
        raise FileNotFoundError(f"no METU grid positions under {spargpath}")

    irs = []
    xyzs = []
    sr = None
    for xyz in positions:
        xyzs.append(metu_grid_to_metres(xyz))
        chans = []
        for ch in TETRA_CHANS_IN_EM32:
            wav = spargpath / xyz / f"IR{ch + 1:05d}.wav"
            audio, sr = load_audio(wav, sr=None, mono=True)
            chans.append(np.asarray(audio, dtype=np.float32))
        irs.append(np.stack(chans))

    dest_path_sofa = Path(dest_path_sofa)
    dest_path_sofa.mkdir(parents=True, exist_ok=True)
    return convert_rirs_to_sofa(
        np.stack(irs),
        np.asarray(xyzs, dtype=np.float64),
        np.zeros((1, 3)),
        _TETRA_RECEIVERS,
        float(sr),
        dest_path_sofa / "metu_mic.sofa",
        listener_short_name="em32",
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    dl = sub.add_parser("download", help="download a RIR dataset (needs network)")
    dl.add_argument("--dataset", choices=["tau", "metu"], required=True)
    dl.add_argument("--output-dir", type=str, required=True)

    tau = sub.add_parser(
        "convert-tau", help="convert an extracted TAU-SRIR DB to SOFA (offline)"
    )
    tau.add_argument("--tau-db-dir", type=str, required=True)
    tau.add_argument("--output-dir", type=str, required=True)
    tau.add_argument("--format", choices=["mic", "foa"], default="mic")
    tau.add_argument("--sample-rate", type=float, default=24000)

    metu = sub.add_parser(
        "convert-metu", help="convert an extracted METU spargair tree to SOFA (offline)"
    )
    metu.add_argument("--dataset-dir", type=str, required=True,
                      help="directory containing spargair/em32")
    metu.add_argument("--output-dir", type=str, required=True)

    cv = sub.add_parser("convert", help="convert local .npy RIRs to SOFA (offline)")
    cv.add_argument("--input-dir", type=str, required=True)
    cv.add_argument("--output", type=str, required=True)
    cv.add_argument("--sample-rate", type=float, default=24000)
    cv.add_argument("--name", type=str, default="mic")

    args = parser.parse_args()
    if args.cmd == "download":
        run(Path(args.output_dir), args.dataset)
        return
    if args.cmd == "convert-tau":
        convert_tau_to_sofa(
            Path(args.tau_db_dir), Path(args.output_dir), args.format, args.sample_rate
        )
        return
    if args.cmd == "convert-metu":
        prepare_metu(Path(args.dataset_dir), Path(args.output_dir))
        return
    convert_npy_dir(Path(args.input_dir), Path(args.output), args.sample_rate, args.name)



# ---------------------------------------------------------------------------
# TAU-SRIR DB -> SOFA (the reference pipeline's mat-file half)
# ---------------------------------------------------------------------------

TAU_ROOMS = [
    "bomb_shelter", "gym", "pb132", "pc226", "sa203", "sc203", "se203",
    "tb103", "tc352",
]


def _mat73(path: Path) -> dict:
    """Minimal MATLAB v7.3 (.mat = HDF5) reader via h5py — the mat73 role.

    Returns datasets as numpy arrays in MATLAB axis order (h5py yields the
    dims reversed, so every dataset is transposed back) and cell arrays of
    object references as nested Python lists.
    """
    import h5py

    def load(node, f):
        if isinstance(node, h5py.Group):
            return {k: load(v, f) for k, v in node.items() if not k.startswith("#")}
        arr = node[()]
        if arr.dtype == object or arr.dtype.kind == "O":  # cell array of refs
            arr = arr.T  # cell arrays come back transposed too

            def deref(x):
                if isinstance(x, np.ndarray):
                    return [deref(e) for e in x]
                return load(f[x], f)

            return [deref(e) for e in arr]
        if isinstance(arr, np.ndarray):
            return arr.T  # back to MATLAB (column-major) axis order
        return arr

    with h5py.File(path, "r") as f:
        return {k: load(v, f) for k, v in f.items() if not k.startswith("#")}


def _cell(x):
    """Unwrap the nested singleton lists _mat73 produces for 1x1 cells."""
    while isinstance(x, list) and len(x) == 1:
        x = x[0]
    return x


def _map_to_cylinder(path: np.ndarray, rad: float, axis: int) -> np.ndarray:
    """Scale unit vectors onto a cylinder of radius `rad` about `axis`."""
    rad_axes = [i for i in range(3) if i != axis]
    scale_rad = np.sqrt(np.sum(path[:, rad_axes] ** 2, axis=1))
    return path * (rad / np.maximum(scale_rad, 1e-12))[:, None]


def _unitvec_to_cartesian(path_unitvec, height, dist):
    if isinstance(dist, np.ndarray):  # linear trajectories: per-height dists
        rad = float(np.sqrt(dist[0] ** 2 + (dist[2] + height) ** 2))
        return _map_to_cylinder(path_unitvec, rad, axis=1)
    return _map_to_cylinder(path_unitvec, float(dist), axis=2)


def _squeeze_obj(x):
    """Unwrap singleton MATLAB cell nesting ((1,1) object arrays) from loadmat."""
    while isinstance(x, np.ndarray) and x.dtype == object and x.size == 1:
        x = x.reshape(-1)[0]
    return x


def load_tau_paths(tau_db_dir: Path, room_idx: int, center_on_mic: bool = True):
    """Source trajectories + room metadata from measinfo.mat / rirdata.mat
    (MATLAB v5 files; positional struct-field indexing mirrors the layout the
    reference consumes at its download_rirs.py:334-370)."""
    from scipy.io import loadmat

    measinfo = loadmat(str(Path(tau_db_dir) / "measinfo.mat"))["measinfo"]
    rirdata = loadmat(str(Path(tau_db_dir) / "rirdata.mat"))["rirdata"][0]

    info = measinfo[room_idx][0]
    trajs = info[4][0]
    heights = info[5][0]
    dists = info[6][0]
    mic_pos = info[7][0]
    traj_type = info[9][0]
    paths = rirdata[0][1][room_idx][0][2]

    n_traj, n_heights = paths.shape
    out = np.empty((n_traj, n_heights), dtype=object)
    for i in range(n_traj):
        for j, height in enumerate(heights):
            if traj_type == "circular":
                dist = dists[i]
            elif traj_type == "linear":
                dist = dists[:, i]
            else:
                raise ValueError(f"Unknown trajectory type: {traj_type}")
            p = _unitvec_to_cartesian(np.asarray(_squeeze_obj(paths[i, j])), height, dist)
            if center_on_mic:
                p = p + mic_pos
            out[i, j] = p
    return out, {
        "room": TAU_ROOMS[room_idx],
        "trajectory_type": str(traj_type),
        "microphone_position": np.asarray(mic_pos, dtype=float),
    }


def load_flat_tau_srir(
    tau_db_dir: Path, room_idx: int, aud_fmt: str = "mic", traj=None, flip: bool = True
):
    """Flattened (measurements, receivers, samples) RIR stack + source path for
    one TAU room, reading the v7.3 per-room mat via _mat73 (no mat73 dep).

    Every other height's path runs the opposite direction in the DCASE
    convention, so `flip` reverses odd heights (reference
    download_rirs.py:119-150 parity).
    """
    tau_db_dir = Path(tau_db_dir)
    room = TAU_ROOMS[room_idx]
    rir_file = sorted(p for p in tau_db_dir.iterdir() if room in p.name)[0]
    mat = _mat73(rir_file)["rirs"]
    cells = mat[aud_fmt] if isinstance(mat, dict) else mat
    paths_out, room_meta = load_tau_paths(tau_db_dir, room_idx)
    n_traj, n_heights = paths_out.shape

    traj_iter = range(n_traj) if traj is None else [traj]
    rir_blocks, path_blocks = [], []
    for i in traj_iter:
        for j in range(n_heights):
            block = np.asarray(_cell(cells[i][j]))  # (n, r, m) MATLAB order
            path = paths_out[i, j]
            if flip and j % 2 == 1:
                block = block[:, :, ::-1]
                path = path[::-1]
            rir_blocks.append(block)
            path_blocks.append(path)

    stack = np.concatenate(rir_blocks, axis=2)  # (n, r, M)
    source_pos = np.concatenate(path_blocks, axis=0)  # (M, 3)
    flat = np.moveaxis(stack, [0, 2], [2, 0])  # (M, r, n)
    mic_pos = np.repeat(room_meta["microphone_position"][None], len(flat), axis=0)
    return flat, source_pos, mic_pos, room_meta["room"]


def convert_tau_to_sofa(
    tau_db_dir: Path,
    out_dir: Path,
    aud_fmt: str = "mic",
    sample_rate: float = 24000.0,
    rooms=None,
) -> list:
    """All TAU rooms -> one SingleRoomSRIR SOFA each (offline, given the
    extracted DB). The WorldStateSOFA backend reads these directly."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    room_ids = range(len(TAU_ROOMS)) if rooms is None else rooms
    for room_idx in room_ids:
        try:
            rirs, src, mic, room = load_flat_tau_srir(tau_db_dir, room_idx, aud_fmt)
        except (IndexError, FileNotFoundError) as exc:
            logger.warning(f"Skipping room {room_idx}: {exc}")
            continue
        # write_sofa wants one listener position + per-capsule receivers
        receivers = np.zeros((rirs.shape[1], 3))
        path = convert_rirs_to_sofa(
            rirs, src, mic[0], receivers, sample_rate,
            out_dir / f"tau_{room}_{aud_fmt}.sofa", aud_fmt,
        )
        written.append(path)
    return written


if __name__ == "__main__":
    main()
