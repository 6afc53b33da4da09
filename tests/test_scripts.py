"""Smoke tests for the dataset-generation CLI scripts."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from audiblelight_tpu.io.audio import wav_write

REPO = Path(__file__).resolve().parents[1]
SR = 24000


def _make_fg(root, classes):
    rng = np.random.default_rng(0)
    for i, cls in enumerate(classes):
        d = root / cls
        d.mkdir()
        t = np.arange(SR * 3) / SR
        sig = 0.5 * np.sin(2 * np.pi * 220.0 * (i + 1) * t) * np.exp(-t * 0.4)
        sig += 0.02 * rng.standard_normal(len(t))
        wav_write(d / f"{cls}.wav", sig.astype(np.float32), SR)
    return root


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    """DCASE2023Task3-labelled foreground audio."""
    return _make_fg(tmp_path_factory.mktemp("fg23"), ["maleSpeech", "music"])


@pytest.fixture(scope="module")
def fg_dir_2025(tmp_path_factory):
    """DCASE2025Task4-labelled foreground audio (for the ssseg generator)."""
    return _make_fg(tmp_path_factory.mktemp("fg25"), ["Speech", "Clapping"])


def run_script(script, *args):
    import os

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        # Persistent compile cache: subprocesses reuse each other's XLA programs
        JAX_COMPILATION_CACHE_DIR="/tmp/al_jax_cache",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
        # Drop the axon sitecustomize from PYTHONPATH: it force-selects the
        # TPU tunnel and IGNORES JAX_PLATFORMS=cpu, so script subprocesses
        # would silently run through (and hang on) the tunnel.
        PYTHONPATH=os.pathsep.join(
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ) or str(REPO),
    )
    return subprocess.run(
        [sys.executable, str(REPO / script), *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd=REPO,
    )


@pytest.mark.e2e
def test_seld_generate_dataset(fg_dir, tmp_path):
    res = run_script(
        "scripts/seld/generate_dataset.py",
        "--fg-dir", str(fg_dir),
        "--output-dir", str(tmp_path),
        "--backend", "shoebox",
        "--n-scenes", "2",
        "--train-frac", "0.5",
        "--max-events-static", "2",
        "--max-events-moving", "1",
        "--ism-order", "4",
        "--ir-seconds", "0.15",
        "--duration", "8",
        "--augmentations", "reverse", "invert",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    wavs = list(tmp_path.rglob("*.wav"))
    csvs = list(tmp_path.rglob("*.csv"))
    assert len(wavs) >= 2, [str(p) for p in tmp_path.rglob("*")]
    assert len(csvs) >= 2
    # DCASE layout present
    assert any("mic_dev" in str(p) for p in wavs)
    assert any("metadata_dev" in str(p) for p in csvs)
    # Resume: re-running skips everything quickly
    res2 = run_script(
        "scripts/seld/generate_dataset.py",
        "--fg-dir", str(fg_dir),
        "--output-dir", str(tmp_path),
        "--backend", "shoebox",
        "--n-scenes", "2",
        "--train-frac", "0.5",
        "--ism-order", "4",
        "--ir-seconds", "0.15",
        "--duration", "8",
    )
    assert res2.returncode == 0
    assert "Skipping existing scene" in (res2.stderr + res2.stdout)


@pytest.mark.e2e
def test_ssseg_generate_dataset(fg_dir_2025, tmp_path):
    res = run_script(
        "scripts/ssseg/generate_dataset.py",
        "--fg-dir", str(fg_dir_2025),
        "--output-dir", str(tmp_path),
        "--n-scenes", "1",
        "--ism-order", "4",
        "--duration", "5",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    mixtures = list((tmp_path / "mixtures").rglob("*.wav"))
    stems = list((tmp_path / "stems").rglob("*_dry.wav"))
    assert len(mixtures) >= 1
    assert len(stems) >= 1  # dry stems rendered


@pytest.mark.e2e
def test_generate_benchmark_script(tmp_path):
    res = run_script(
        "scripts/generate/benchmark.py",
        "--n-scenes", "1",
        "--duration", "5",
        "--output-dir", str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "avg_seconds_per_scene=" in res.stdout


@pytest.mark.e2e
def test_convert_to_dcase_format(fg_dir, tmp_path):
    # First generate a scene, then convert its layout
    gen_dir = tmp_path / "gen"
    res = run_script(
        "scripts/generate/generate_with_random_events.py",
        "--fg-dir", str(fg_dir),
        "--output-dir", str(gen_dir),
        "--n-scenes", "1",
        "--duration", "5",
        "--n-static", "1",
        "--n-moving", "0",
    )
    assert res.returncode == 0, res.stderr[-2000:]

    conv_dir = tmp_path / "dcase"
    res2 = run_script(
        "scripts/generate/convert_to_dcase_format.py",
        "--input-dir", str(gen_dir),
        "--output-dir", str(conv_dir),
        "--fmt", "mic",
        "--split", "train",
    )
    assert res2.returncode == 0, res2.stderr[-2000:]
    assert (conv_dir / "mic_dev/dev-train-synth/fold1_room1_mix001.wav").is_file()
    assert (conv_dir / "metadata_dev/dev-train-synth/fold1_room1_mix001.csv").is_file()


@pytest.mark.e2e
def test_download_rirs_convert_offline(tmp_path):
    """The offline npy->SOFA conversion path works without network."""
    rng = np.random.default_rng(0)
    in_dir = tmp_path / "npy"
    in_dir.mkdir()
    np.save(in_dir / "irs.npy", rng.standard_normal((5, 4, 256)))
    np.save(in_dir / "source_positions.npy", rng.uniform(0, 3, (5, 3)))
    np.save(in_dir / "listener_position.npy", np.array([1.0, 1.0, 1.0]))
    np.save(in_dir / "receiver_positions.npy", rng.uniform(-0.05, 0.05, (4, 3)))

    out = tmp_path / "test.sofa"
    res = run_script(
        "scripts/download_data/download_rirs.py",
        "convert",
        "--input-dir", str(in_dir),
        "--output", str(out),
        "--sample-rate", "24000",
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.is_file()

    from audiblelight_tpu.io.sofa import SOFAFile

    with SOFAFile(out) as f:
        assert f.data_shape == (5, 4, 256)
        assert f.sampling_rate == 24000


def test_download_data_gating(tmp_path):
    """Network fetch halves fail with ordinary errors offline; the license-gated
    Gibson paths fail with descriptive ValueErrors when no id/archive is given."""
    import urllib.error

    from audiblelight_tpu import download_data

    net_errors = (urllib.error.URLError, OSError, ImportError)
    for fn in [
        download_data.download_fma,
        download_data.download_fsd,
        download_data.download_rirs,
        download_data.download_visualgenome,
    ]:
        with pytest.raises(net_errors):
            fn(tmp_path / "dl")
    for fn in [download_data.download_gibson, download_data.download_gibson_waypoints]:
        with pytest.raises(ValueError):
            fn(tmp_path / "dl")


def test_organize_fma_offline(tmp_path):
    """The FMA layout half works on a local extracted tree (no network)."""
    import sys as _sys

    _sys.path.insert(0, str(REPO / "scripts/download_data"))
    import pandas as pd

    from download_fma import organize_fma

    home = tmp_path / "home"
    (home / "fma_metadata").mkdir(parents=True)
    # tracks.csv with the two-level header the real metadata uses
    cols = pd.MultiIndex.from_tuples([("track", "genre_top"), ("set", "subset")])
    df = pd.DataFrame(
        [["Rock", "small"], ["Rock", "small"], ["Jazz", "small"],
         ["Electronic", "small"], ["Rock", "medium"]],
        index=[2, 5, 10, 20, 30], columns=cols,
    )
    df.to_csv(home / "fma_metadata/tracks.csv")
    for tid in (2, 5, 10, 20):
        p = home / "fma_small" / f"{tid:06}"[:3]
        p.mkdir(parents=True, exist_ok=True)
        (p / f"{tid:06}.mp3").write_bytes(b"ID3fake")
    out = tmp_path / "soundevents"
    n = organize_fma(home, out, subset="small", ntracks_genre=10, seed=0)
    # Electronic skipped; track 30 is medium-subset; 3 tracks laid out
    assert n == 3
    laid = sorted(str(p.relative_to(out)) for p in out.rglob("*.mp3"))
    assert all(s.startswith("music/") for s in laid)
    assert any("/Rock/" in s for s in laid) and any("/Jazz/" in s for s in laid)
    assert not any("Electronic" in s for s in laid)


def test_organize_fsd_offline(tmp_path):
    import sys as _sys

    _sys.path.insert(0, str(REPO / "scripts/download_data"))
    from download_fsd import organize_fsd

    home = tmp_path / "home"
    (home / "FSD50K.dev_audio").mkdir(parents=True)
    (home / "FSD50K.eval_audio").mkdir()
    (home / "FSD50K.dev_audio" / "111.wav").write_bytes(b"RIFFfake")
    (home / "FSD50K.eval_audio" / "222.wav").write_bytes(b"RIFFfake")
    lines = ["train/maleSpeech/111.wav", "test/waterTap/222.wav", "train/bell/999.wav"]
    out = tmp_path / "soundevents"
    n = organize_fsd(home, lines, out)
    assert n == 2  # 999.wav missing -> skipped with a warning
    assert (out / "train/maleSpeech/111.wav").is_file()
    assert (out / "test/waterTap/222.wav").is_file()


def test_extract_gibson_offline(tmp_path):
    import sys as _sys
    import zipfile

    _sys.path.insert(0, str(REPO / "scripts/download_data"))
    from download_gibson import extract_gibson

    archive = tmp_path / "gibson.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        zf.writestr("gibson/Oyens.glb", b"glTF fake")
        zf.writestr("gibson/nested/Helix.glb", b"glTF fake")
        zf.writestr("gibson/readme.txt", b"not a mesh")
    n = extract_gibson(archive, tmp_path / "resources")
    assert n == 2
    assert (tmp_path / "resources/meshes/gibson/Oyens.glb").is_file()
    assert (tmp_path / "resources/meshes/gibson/Helix.glb").is_file()


def test_extract_regions_offline(tmp_path):
    import sys as _sys

    _sys.path.insert(0, str(REPO / "scripts/download_data"))
    import numpy as np
    from PIL import Image

    from download_visualgenome import extract_regions

    imgs = tmp_path / "VG_100K"
    imgs.mkdir()
    Image.fromarray(
        (np.random.default_rng(0).uniform(0, 255, (300, 400, 3))).astype("uint8")
    ).save(imgs / "42.jpg")
    objects = [
        {
            "image_id": 42,
            "objects": [
                {"names": ["telephone"], "x": 10, "y": 10, "w": 120, "h": 100},
                {"names": ["woman"], "x": 200, "y": 50, "w": 100, "h": 150},
                {"names": ["unrelated thing"], "x": 0, "y": 0, "w": 80, "h": 80},
                {"names": ["tap"], "x": 5, "y": 5, "w": 10, "h": 10},  # too small
            ],
        },
        {"image_id": 999, "objects": []},  # missing image -> skipped
    ]
    out = tmp_path / "images"
    n = extract_regions(objects, [imgs], out)
    assert n == 2
    assert len(list((out / "telephone").glob("*.jpg"))) == 1
    assert len(list((out / "femaleSpeech").glob("*.jpg"))) == 1


def test_seld_assets_table_sanity():
    import sys as _sys

    _sys.path.insert(0, str(REPO / "scripts/seld"))
    import seld_dataset_assets as assets

    assets.sanity_check()
    # Every split totals 1200 scenes over rooms x scapes
    assert set(assets.MESHES) == {"9", "9A", "9B", "9C", "9D", "12", "18", "36", "72", "144"}
    # Stand-in rooms are deterministic, nonconvex, and watertight
    room = assets.synthetic_room("Helix.glb")
    assert not room.is_convex and room.is_watertight
    assert room.metadata["synthetic_stand_in"]
    # resolve_room prefers a real file when present
    assert assets.resolve_room("Helix.glb", None).metadata["synthetic_stand_in"]


@pytest.mark.e2e
def test_seld_generate_dataset_from_assets(fg_dir, tmp_path):
    """--assets iterates rooms x splits from the table (DCASE2023 layout)."""
    res = run_script(
        "scripts/seld/generate_dataset.py",
        "--fg-dir", str(fg_dir),
        "--output-dir", str(tmp_path),
        "--backend", "rlr",
        "--assets", "9A",
        "--scapes-per-room", "1",
        "--min-events-static", "1",
        "--max-events-static", "1",
        "--min-events-moving", "0",
        "--max-events-moving", "0",
        "--rays", "256",
        "--ray-depth", "6",
        "--ir-seconds", "0.1",
        "--duration", "6",
    )
    assert res.returncode == 0, res.stderr[-3000:]
    wavs = sorted(tmp_path.rglob("*.wav"))
    # 6 train rooms + 3 test rooms, 1 scape each
    train = [p for p in wavs if "dev-train-alight" in str(p)]
    test = [p for p in wavs if "dev-test-alight" in str(p)]
    assert len(train) == 6, [str(p) for p in wavs]
    assert len(test) == 3
    # Room index is encoded as the scene number (fold1_scene<room>_000)
    assert any("fold1_scene5_000" in str(p) for p in train)
    assert any("fold2_scene2_000" in str(p) for p in test)
    csvs = list(tmp_path.rglob("*.csv"))
    assert len(csvs) == 9


def test_tau_srir_mat_to_sofa_offline(tmp_path):
    """Full TAU-SRIR conversion on a synthetic DB with the real layout:
    a v7.3 (HDF5) per-room rirs mat holding struct->cell[traj][height] IR
    blocks, and v5 measinfo/rirdata mats with the positional struct fields the
    loader indexes. Validates the h5py-based v7.3 reader, the
    unitvec->cylinder path reconstruction, odd-height flipping, and the final
    SOFA round trip."""
    import h5py
    import numpy as np
    from scipy.io import savemat

    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "download_rirs", Path(__file__).resolve().parents[1]
        / "scripts" / "download_data" / "download_rirs.py"
    )
    dr = _ilu.module_from_spec(spec)
    spec.loader.exec_module(dr)

    rng = np.random.default_rng(0)
    n, r = 48, 4  # samples, receivers
    n_traj, n_heights, m_pts = 2, 2, 5
    db = tmp_path / "TAU-SRIR_DB"
    db.mkdir()

    # v7.3 per-room rirs file: /rirs/mic = (n_traj, n_heights) cell of refs to
    # (n, r, m) arrays — h5py axis order reversed, as MATLAB writes it.
    blocks = rng.standard_normal((n_traj, n_heights, n, r, m_pts)).astype(np.float64)
    with h5py.File(db / "rirs_01_bomb_shelter.mat", "w") as f:
        refs = f.create_group("#refs#")
        cell = np.empty((n_heights, n_traj), dtype=h5py.ref_dtype)
        for i in range(n_traj):
            for j in range(n_heights):
                d = refs.create_dataset(f"b{i}{j}", data=blocks[i, j].T)
                cell[j, i] = d.ref
        f.create_group("rirs").create_dataset("mic", data=cell)

    # v5 measinfo.mat: (9, 1) struct array; loader reads positional fields
    # 4 (trajs) 5 (heights) 6 (dists) 7 (mic pos) 9 (traj type).
    heights = np.array([1.0, 1.6])
    dists = np.array([2.0, 2.5])  # circular: one radius per trajectory
    mic_pos = np.array([4.0, 3.0, 1.2])
    dt = np.dtype(
        [(f"f{k}", object) for k in range(4)]
        + [("trajs", object), ("heights", object), ("dists", object),
           ("micpos", object), ("f8", object), ("trajtype", object)]
    )
    rec = np.empty((9, 1), dtype=dt)
    for k in range(9):
        for name in rec.dtype.names:
            rec[k, 0][name] = np.zeros((1, 1))
        rec[k, 0]["trajs"] = np.array([[1.0, 2.0]])
        rec[k, 0]["heights"] = heights[None]
        rec[k, 0]["dists"] = dists[None]
        rec[k, 0]["micpos"] = mic_pos[None]
        rec[k, 0]["trajtype"] = np.array(["circular"])
    savemat(db / "measinfo.mat", {"measinfo": rec})

    # v5 rirdata.mat: rirdata[0][0][1][room][0][2] = (n_traj, n_heights) cell
    # of 1x1 cells holding (m, 3) unit-vector paths.
    paths = np.empty((n_traj, n_heights), dtype=object)
    for i in range(n_traj):
        for j in range(n_heights):
            v = rng.standard_normal((m_pts, 3))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            inner = np.empty((1,), dtype=object)
            inner[0] = v
            paths[i, j] = inner
    rooms_cell = np.empty((9, 1), dtype=[("a", object), ("b", object), ("paths", object)])
    for k in range(9):
        rooms_cell[k, 0]["a"] = np.zeros((1, 1))
        rooms_cell[k, 0]["b"] = np.zeros((1, 1))
        rooms_cell[k, 0]["paths"] = paths
    outer = np.empty((1, 1), dtype=[("x", object), ("rooms", object)])
    outer[0, 0]["x"] = np.zeros((1, 1))
    outer[0, 0]["rooms"] = rooms_cell
    savemat(db / "rirdata.mat", {"rirdata": outer})

    written = dr.convert_tau_to_sofa(db, tmp_path / "sofa", rooms=[0])
    assert len(written) == 1

    from audiblelight_tpu.io.sofa import SOFAFile

    with SOFAFile(written[0]) as sf:
        irs = sf.data_ir
        src = sf.source_positions
    m_total = n_traj * n_heights * m_pts
    assert irs.shape == (m_total, r, n)
    assert src.shape == (m_total, 3)
    # circular trajectories land on a cylinder of the per-traj radius about z
    rel = src - mic_pos[None]
    rad = np.sqrt(rel[:, 0] ** 2 + rel[:, 1] ** 2)
    assert np.allclose(rad[: n_heights * m_pts], 2.0, atol=1e-4)  # traj 0
    assert np.allclose(rad[n_heights * m_pts :], 2.5, atol=1e-4)  # traj 1
    # odd heights flipped: block (0,1) appears reversed along measurements
    got = irs[m_pts : 2 * m_pts]  # traj 0, height 1
    expect = np.moveaxis(blocks[0, 1][:, :, ::-1], [0, 2], [2, 0])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def run_script_env(script, *args, extra_env=None):
    """run_script with additional environment (e.g. a virtual device mesh)."""
    import os

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/al_jax_cache",
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1",
        PYTHONPATH=os.pathsep.join(
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p
        ) or str(REPO),
    )
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, str(REPO / script), *args],
        capture_output=True, text=True, env=env, timeout=1500, cwd=REPO,
    )


@pytest.mark.e2e
def test_seld_pooled_multichip_matches_single_device(fg_dir, tmp_path):
    """The production CLI's multi-chip path: the SELD script driven over an
    8-device virtual mesh (--mesh-devices 8, pooled driver) produces WAVs
    IDENTICAL to the single-device pooled run with the same seed (VERDICT r3
    item 2's acceptance check)."""
    # One nonconvex room as an OBJ file so n-scenes mode (single room,
    # 8 scenes -> full mesh-wide batches) can drive the rlr backend
    from audiblelight_tpu.geometry.mesh import scanned_like_room

    room = scanned_like_room(extents=(6.0, 4.0, 3.0), seed=3)
    obj = tmp_path / "room.obj"
    with open(obj, "w") as f:
        for v in room.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in room.faces + 1:
            f.write(f"f {a} {b} {c}\n")

    common = [
        "--fg-dir", str(fg_dir),
        "--backend", "rlr",
        "--mesh", str(obj),
        "--n-scenes", "8", "--train-frac", "1.0",
        "--min-events-static", "1", "--max-events-static", "1",
        "--min-events-moving", "0", "--max-events-moving", "0",
        "--rays", "128", "--ray-depth", "4",
        "--ir-seconds", "0.1", "--duration", "4",
        "--seed", "77",
        "--fused-batch", "8",
    ]
    out_a = tmp_path / "mesh8"
    out_b = tmp_path / "mesh1"
    res_a = run_script_env(
        "scripts/seld/generate_dataset.py", *common,
        "--output-dir", str(out_a), "--mesh-devices", "8",
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert res_a.returncode == 0, res_a.stderr[-3000:]
    assert "Pooled driver rendered 8 scenes" in (res_a.stderr + res_a.stdout)
    # Single-device pooled run (worker prep on, same per-job seeding)
    res_b = run_script_env(
        "scripts/seld/generate_dataset.py", *common,
        "--output-dir", str(out_b), "--placement-workers", "1",
    )
    assert res_b.returncode == 0, res_b.stderr[-3000:]
    assert "Pooled driver rendered 8 scenes" in (res_b.stderr + res_b.stdout)

    wavs_a = sorted(p.relative_to(out_a) for p in out_a.rglob("*.wav"))
    wavs_b = sorted(p.relative_to(out_b) for p in out_b.rglob("*.wav"))
    assert len(wavs_a) == 8 and wavs_a == wavs_b
    import numpy as _np

    from audiblelight_tpu.io.audio import wav_read

    for rel in wavs_a:
        a, sr_a = wav_read(out_a / rel)
        b, sr_b = wav_read(out_b / rel)
        assert sr_a == sr_b and a.shape == b.shape
        # Same trace keys + same program, but shard_map partitioning
        # reassociates float accumulation -> at most 1 LSB of int16 drift
        diff = _np.abs(a - b).max() * 32767.0
        assert diff <= 1.0, f"WAVs differ between mesh sizes by {diff} LSBs: {rel}"
    # CSV + JSON metadata must be byte-identical (pure host bookkeeping)
    csvs_a = sorted(p.relative_to(out_a) for p in out_a.rglob("*.csv"))
    assert len(csvs_a) == 8
    for rel in csvs_a:
        assert (out_a / rel).read_bytes() == (out_b / rel).read_bytes()


def test_metu_spargair_to_sofa_offline(tmp_path):
    """METU Sparg conversion on a synthetic spargair/em32 tree with the real
    layout: digit-triple position directories holding per-channel
    IR{ch:05d}.wav files. Validates the tetrahedral channel pick, the 0.5 m
    grid -> metres position rule, and the SOFA round trip through
    WorldStateSOFA-compatible fields."""
    import importlib.util as _ilu

    import numpy as np

    from audiblelight_tpu.io.audio import wav_write
    from audiblelight_tpu.io.sofa import SOFAFile

    spec = _ilu.spec_from_file_location(
        "download_rirs", Path(__file__).resolve().parents[1]
        / "scripts" / "download_data" / "download_rirs.py"
    )
    dr = _ilu.module_from_spec(spec)
    spec.loader.exec_module(dr)

    rng = np.random.default_rng(5)
    sr = 48000
    n = 96
    positions = ["020", "342", "132"]
    em32 = tmp_path / "spargair" / "em32"
    ir_bank = {}
    for xyz in positions:
        d = em32 / xyz
        d.mkdir(parents=True)
        # full 32-channel layout on disk; the converter must pick the tetra set
        for ch in range(32):
            sig = rng.standard_normal(n).astype(np.float32) * 0.3
            wav_write(d / f"IR{ch + 1:05d}.wav", sig, sr)
            ir_bank[(xyz, ch)] = sig

    out = dr.prepare_metu(tmp_path, tmp_path / "sofa")
    assert out.name == "metu_mic.sofa"

    with SOFAFile(out) as sofa:
        irs = sofa.get_variable("Data.IR")
        src = sofa.get_variable("SourcePosition")
        sr_read = float(np.asarray(sofa.get_variable("Data.SamplingRate")).ravel()[0])
    assert irs.shape == (3, 4, n)
    assert int(sr_read) == sr

    # grid rule: "020" -> x=(3-0)*0.5, y=(3-2)*0.5, z=(0-2)*0.5
    order = [positions.index(p) for p in sorted(positions)]
    exp = {
        "020": (1.5, 0.5, -1.0),
        "342": ((3 - 3) * 0.5, (3 - 4) * 0.5, (2 - 2) * 0.5),
        "132": (1.0, (3 - 3) * 0.5, 0.0),
    }
    for i, xyz in enumerate(sorted(positions)):
        np.testing.assert_allclose(src[i], exp[xyz], atol=1e-9)
        # tetra channel subset, in order (5, 9, 25, 21), 16-bit WAV round trip
        for j, ch in enumerate(dr.TETRA_CHANS_IN_EM32):
            np.testing.assert_allclose(
                irs[i, j], ir_bank[(xyz, ch)], atol=2.0 / 32767.0
            )
