"""Whole-Scene end-to-end on a scanned (nonconvex, occlusion-on) mesh.

CI enforcement of the claim that the full Scene API — placement, occluded
ray-traced RIRs, stem rendering, WAV + DCASE CSV outputs — composes on a
scanned-room workload (the reference's flagship regime, reference
worldstate.py:2148-2181). Kept small for CPU: a reduced-subdivision
scanned_like_room and low ray counts; the full 110k-face configuration is
bench.py's headline measurement.
"""

import json

import numpy as np
import pytest

from audiblelight_tpu import Scene
from audiblelight_tpu.geometry.mesh import scanned_like_room
from audiblelight_tpu.io.audio import wav_read, wav_write

SR = 24000


@pytest.fixture(scope="module")
def scan_mesh():
    m = scanned_like_room(
        extents=(6.0, 5.0, 3.0), n_furniture=3, subdivision_levels=2, seed=7
    )
    assert not m.is_convex  # occlusion must actually be exercised
    return m


@pytest.fixture(scope="module")
def fg_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fg")
    d = root / "maleSpeech"
    d.mkdir()
    t = np.arange(SR * 3) / SR
    rng = np.random.default_rng(3)
    for i in range(3):
        sig = 0.4 * np.sin(2 * np.pi * (250 + 180 * i) * t) * np.exp(-t * 0.5)
        sig += 0.01 * rng.standard_normal(len(t))
        wav_write(d / f"ev{i}.wav", sig.astype(np.float32), SR)
    return root


def _build_scene(scan_mesh, fg_dir, **rlr_extra):
    scene = Scene(
        duration=12.0,
        sample_rate=SR,
        backend="rlr",
        backend_kwargs=dict(
            mesh=scan_mesh,
            seed=11,
            rlr_kwargs=dict(
                indirect_ray_count=300,
                indirect_ray_depth=8,
                max_ir_length=0.2,
                # Diffraction defaults ON (reference rlr parity) but its
                # multi-bend graph costs minutes per trace on the CPU fallback
                # occlusion path at 110k faces; tests/test_diffraction.py owns
                # that coverage on purpose-built small rooms.
                diffraction=False,
                **rlr_extra,
            ),
        ),
        fg_path=fg_dir,
        max_overlap=2,
        class_mapping="DCASE2023Task3",
    )
    scene.add_microphone(microphone_type="ambeovr", alias="mic000")
    for _ in range(2):
        scene.add_event(event_type="static", duration=2.0, event_start=0.0,
                        max_place_attempts=200)
    scene.add_event(event_type="moving", duration=2.0, event_start=0.0,
                    spatial_resolution=2.0, max_place_attempts=200)
    scene.add_ambience(noise="gaussian")
    return scene


def test_scene_on_scanned_mesh_end_to_end(scan_mesh, fg_dir, tmp_path):
    """Placement + occluded tracing (acoustic LOD) + compiled stems + outputs."""
    scene = _build_scene(scan_mesh, fg_dir, mesh_simplification=400)
    scene.generate(
        output_dir=tmp_path, audio=True, metadata_json=True, metadata_dcase=True,
        audio_fname="scn", metadata_fname="scn", compiled=True,
    )
    wav, sr = wav_read(tmp_path / "scn_mic000.wav")
    assert sr == SR
    assert wav.shape == (4, 12 * SR)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 0

    csv_lines = (tmp_path / "scn_mic000.csv").read_text().strip().splitlines()
    assert len(csv_lines) > 0
    first = [int(x) for x in csv_lines[0].split(",")[:3]]
    assert first[1] >= 0  # class index column

    meta = json.loads((tmp_path / "scn.json").read_text())
    assert meta["state"]["backend"] == "RLR" if "state" in meta else True

    # The acoustic LOD actually engaged (mesh decimated for the tail)
    ws = scene.state
    assert len(ws.acoustic_mesh.faces) < len(ws.mesh.faces)
    # and the rain-visibility table exists for the mic used ("auto" -> "face")
    assert ws._rain_mode() == "face"


def test_scene_on_scanned_mesh_occlusion_matters(scan_mesh, fg_dir):
    """Occlusion-on tracing differs from occlusion-off on a nonconvex room —
    guards against a regression that silently skips the visibility path."""
    from audiblelight_tpu.rir.raytracer import trace_energy_histogram

    import jax
    import jax.numpy as jnp

    m = scan_mesh.simplified(target_faces=1500)
    tris = jnp.asarray(m.triangles.astype(np.float32))
    f = tris.shape[0]
    absor = jnp.full((f, 2), 0.3, jnp.float32)
    scat = jnp.full((f,), 0.4, jnp.float32)
    src = jnp.asarray([1.0, 1.0, 1.0], jnp.float32)
    lis = jnp.asarray([[5.0, 4.0, 2.0]], jnp.float32)
    kw = dict(n_rays=400, max_depth=6, n_bins=64, bin_dt=0.002)
    h_on = trace_energy_histogram(
        jax.random.PRNGKey(5), tris, absor, scat, src, lis, occlusion=True, **kw
    )
    h_off = trace_energy_histogram(
        jax.random.PRNGKey(5), tris, absor, scat, src, lis, occlusion=False, **kw
    )
    assert float(jnp.sum(h_on)) < float(jnp.sum(h_off))
