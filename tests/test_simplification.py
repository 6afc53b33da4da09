"""Mesh simplification (acoustic LOD), per-face rain visibility, SH-order wiring.

Covers the round-3 engine additions: TriMesh.simplified vertex clustering, the
WorldStateRLR mesh_simplification/rain_visibility config surface (reference rlr
config fields, reference tests/test_worldstate_rlr.py:810-835), and the
direct/indirect SH-order encoding semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiblelight_tpu import config
from audiblelight_tpu.geometry.mesh import box_mesh, scanned_like_room
from audiblelight_tpu.micarrays import AmbeoVR, FOAListener, HOAListener
from audiblelight_tpu.rir.raytracer import (
    direct_path_ir,
    face_rain_occlusion,
    trace_rirs_multi,
)
from audiblelight_tpu.worldstate.mesh_backend import WorldStateRLR


@pytest.fixture(scope="module")
def small_scan():
    return scanned_like_room(extents=(5.0, 4.0, 3.0), seed=1)


# ---------------------------------------------------------------------------
# TriMesh.simplified
# ---------------------------------------------------------------------------


def test_simplified_respects_face_budget(small_scan):
    s = small_scan.simplified(target_faces=4000)
    assert len(s.faces) <= 4000
    assert len(s.faces) > 1000  # not degenerate


def test_simplified_voxel_records_metadata(small_scan):
    s = small_scan.simplified(voxel=0.25)
    assert s.metadata["simplified_from_faces"] == len(small_scan.faces)
    assert s.metadata["simplified_voxel"] == 0.25
    assert len(s.faces) < len(small_scan.faces)


def test_simplified_no_boundary_edges(small_scan):
    """Clustering may create non-manifold edges but must not open holes."""
    s = small_scan.simplified(target_faces=4000)
    f = s.faces
    e = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert np.sum(counts == 1) == 0  # no edge bounds a hole


def test_simplified_preserves_area(small_scan):
    s = small_scan.simplified(target_faces=8000)
    assert abs(s.area - small_scan.area) / small_scan.area < 0.15


def test_simplified_small_mesh_passthrough():
    m = box_mesh(extents=[4, 3, 2], center=[2, 1.5, 1])
    s = m.simplified(target_faces=1000)
    assert len(s.faces) == len(m.faces)


def test_simplified_arg_validation(small_scan):
    with pytest.raises(ValueError):
        small_scan.simplified()
    with pytest.raises(ValueError):
        small_scan.simplified(voxel=0.1, target_faces=100)


# ---------------------------------------------------------------------------
# face_rain_occlusion vs exact segment queries
# ---------------------------------------------------------------------------


def test_face_rain_occlusion_matches_exact_centroid_queries(small_scan):
    from audiblelight_tpu.geometry.queries import segments_occluded

    s = small_scan.simplified(target_faces=1500)
    tris = jnp.asarray(s.triangles.astype(np.float32))
    normals = jnp.asarray(s.face_normals.astype(np.float32))
    center = jnp.asarray([2.5, 2.0, 1.5], jnp.float32)
    table = np.asarray(face_rain_occlusion(tris, normals, center[None]))[0]
    assert table.shape == (len(s.faces),)
    # In a single nonconvex room some faces see the centre, some do not
    assert 0.0 < table.mean() < 1.0

    # Exact check on a subset: the table IS the centroid-segment query
    centroids = np.asarray(jnp.mean(tris, axis=1))
    n_or = np.asarray(normals)
    to_l = np.asarray(center)[None] - centroids
    flip = np.sum(n_or * to_l, axis=-1) < 0
    n_or = np.where(flip[:, None], -n_or, n_or)
    starts = jnp.asarray(centroids + 1e-4 * n_or, jnp.float32)
    idx = np.arange(0, len(s.faces), 7)
    occ = np.asarray(
        segments_occluded(
            starts[idx], jnp.broadcast_to(center, (len(idx), 3)), tris
        )
    )
    assert np.array_equal(occ, table[idx])


# ---------------------------------------------------------------------------
# WorldStateRLR wiring
# ---------------------------------------------------------------------------


def _build_state(mesh, **rlr_extra):
    ws = WorldStateRLR(
        mesh=mesh,
        sample_rate=24000,
        seed=0,
        rlr_kwargs=dict(
            indirect_ray_count=200,
            indirect_ray_depth=6,
            max_ir_length=0.2,
            diffraction=False,  # parity default ON; pinned off for CPU test speed
            **rlr_extra,
        ),
    )
    return ws


def test_worldstate_simplification_modes(small_scan):
    ws = _build_state(small_scan, mesh_simplification=True)
    am = ws.acoustic_mesh
    assert len(am.faces) <= config.MESH_SIMPLIFICATION_TARGET_FACES
    ws2 = _build_state(small_scan, mesh_simplification=3000)
    assert len(ws2.acoustic_mesh.faces) <= 3000
    ws3 = _build_state(small_scan, mesh_simplification=0.4)
    assert ws3.acoustic_mesh.metadata["simplified_voxel"] == 0.4
    ws4 = _build_state(small_scan)
    assert ws4.acoustic_mesh is ws4.mesh


def test_worldstate_simplified_render_close_to_full(small_scan):
    """The acoustic-LOD render stays within ~2 dB of the full-mesh energy."""
    irs = {}
    for name, extra in (
        ("full", {}),
        ("lod", dict(mesh_simplification=2000)),
    ):
        ws = _build_state(small_scan, **extra)
        ws.add_microphone(AmbeoVR, alias="mic000")
        ws.add_emitter(alias="src000")
        ws.simulate()
        irs[name] = ws.irs["mic000"]
    e_full = np.sum(irs["full"] ** 2, axis=-1)
    e_lod = np.sum(irs["lod"] ** 2, axis=-1)
    ratio = e_lod / np.maximum(e_full, 1e-20)
    assert np.all(ratio > 10 ** (-2 / 10)) and np.all(ratio < 10 ** (2 / 10))


def test_rain_visibility_modes_agree(small_scan):
    """face-mode rain visibility tracks the exact mode closely (identical PRNG)."""
    irs = {}
    for mode in ("exact", "face"):
        ws = _build_state(
            small_scan, mesh_simplification=2000, rain_visibility=mode
        )
        ws.add_microphone(AmbeoVR, alias="mic000", position=None)
        ws.add_emitter(alias="src000")
        ws.simulate()
        irs[mode] = ws.irs["mic000"]
    e_exact = np.sum(irs["exact"] ** 2, axis=-1)
    e_face = np.sum(irs["face"] ** 2, axis=-1)
    ratio = e_face / np.maximum(e_exact, 1e-20)
    # same rays, only penumbra-grazing deposits differ
    assert np.all(ratio > 0.7) and np.all(ratio < 1.4)


def test_rain_visibility_validation(small_scan):
    ws = _build_state(small_scan, rain_visibility="nope")
    with pytest.raises(ValueError):
        ws._rain_mode()


def test_inert_fields_warn(small_scan, caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        _build_state(small_scan, temporal_coherence=True, dmin=2.0)
    text = caplog.text.lower()
    assert "temporal_coherence" in text and "dmin" in text


# ---------------------------------------------------------------------------
# SH-order wiring
# ---------------------------------------------------------------------------


def test_direct_sh_order_changes_content():
    m = box_mesh(extents=[6, 5, 3], center=[3, 2.5, 1.5])
    tris = jnp.asarray(m.triangles.astype(np.float32))
    src = jnp.asarray([4.0, 3.0, 1.5], jnp.float32)
    lis = jnp.asarray([[2.0, 2.0, 1.5]], jnp.float32)
    ir3 = np.asarray(direct_path_ir(tris, src, lis, 2048, sr=24000, encoding="sh3", sh_order=3))
    ir1 = np.asarray(direct_path_ir(tris, src, lis, 2048, sr=24000, encoding="sh3", sh_order=1))
    assert ir3.shape == (16, 2048)
    # order-1 encoding leaves ACN 4..15 empty; order-3 fills them
    assert np.abs(ir1[4:]).max() == 0.0
    assert np.abs(ir3[4:]).max() > 0.0
    # the order-0/1 channels agree between the two encodings
    np.testing.assert_allclose(ir1[:4], ir3[:4], rtol=1e-6, atol=1e-8)


def test_trace_rirs_multi_sh3_channels():
    m = box_mesh(extents=[6, 5, 3], center=[3, 2.5, 1.5])
    tris = jnp.asarray(m.triangles.astype(np.float32))
    absor = jnp.full((len(m.faces), 2), 0.3, jnp.float32)
    scat = jnp.full((len(m.faces),), 0.3, jnp.float32)
    srcs = jnp.asarray([[4.0, 3.0, 1.5]], jnp.float32)
    lis = jnp.asarray([[2.0, 2.0, 1.5]], jnp.float32)
    irs = np.asarray(
        trace_rirs_multi(
            jax.random.PRNGKey(0), tris, absor, scat, srcs, lis,
            n_samples=2400, sr=24000, n_rays=200, max_depth=5,
            occlusion=False, encoding="sh3",
            sh_order_direct=3, sh_order_indirect=1,
        )
    )
    assert irs.shape == (16, 1, 2400)
    assert np.isfinite(irs).all()
    # direct path provides order-2/3 content even with an order-1 tail
    assert np.abs(irs[4:]).max() > 0.0


def test_hoa_listener_worldstate(small_scan):
    ws = _build_state(small_scan, mesh_simplification=2000)
    ws.add_microphone(HOAListener, alias="hoa000")
    ws.add_emitter(alias="src000")
    ws.simulate()
    irs = ws.irs["hoa000"]
    assert irs.shape[0] == 16
    assert np.isfinite(irs).all()
    assert np.abs(irs[0]).max() > 0.0


def test_foa_default_orders_unchanged(small_scan):
    """Default config (direct 3 / indirect 1) on a 4-channel FOA listener equals
    explicit order-1 everywhere: SH orders are orthogonal, truncation to 4
    channels discards the higher orders."""
    irs = {}
    for name, extra in (
        ("default", {}),
        ("order1", dict(direct_sh_order=1, indirect_sh_order=1)),
    ):
        ws = _build_state(small_scan, mesh_simplification=2000, **extra)
        ws.add_microphone(FOAListener, alias="foa000")
        ws.add_emitter(alias="src000")
        ws.simulate()
        irs[name] = ws.irs["foa000"]
    np.testing.assert_allclose(irs["default"], irs["order1"], rtol=1e-5, atol=1e-7)
