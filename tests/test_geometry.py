"""Tests for the geometry engine: mesh loading/repair and JAX spatial queries."""

import numpy as np
import pytest

import jax.numpy as jnp

from audiblelight_tpu.geometry import (
    TriMesh,
    box_mesh,
    load_mesh,
    nearest_surface_distance,
    points_inside_mesh,
    ray_mesh_first_hit,
    segments_occluded,
)


@pytest.fixture(scope="module")
def room():
    """A 4 x 3 x 2.5 m shoebox room centred at (2, 1.5, 1.25)."""
    return box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])


def test_box_mesh_properties(room):
    assert len(room.vertices) == 8
    assert len(room.faces) == 12
    np.testing.assert_allclose(room.bounds, [[0, 0, 0], [4, 3, 2.5]])
    assert room.is_watertight
    # surface area of the box
    expected = 2 * (4 * 3 + 4 * 2.5 + 3 * 2.5)
    assert np.isclose(room.area, expected)


def test_points_inside_mesh(room):
    tris = jnp.asarray(room.triangles)
    pts = np.array(
        [
            [2.0, 1.5, 1.25],  # centre: inside
            [0.1, 0.1, 0.1],  # corner region: inside
            [-1.0, 1.5, 1.25],  # outside -x
            [2.0, 1.5, 5.0],  # outside +z
            [3.9, 2.9, 2.4],  # inside near corner
        ]
    )
    mask = np.asarray(points_inside_mesh(jnp.asarray(pts), tris))
    np.testing.assert_array_equal(mask, [True, True, False, False, True])


def test_points_inside_mesh_random(room, rng):
    tris = jnp.asarray(room.triangles)
    pts = rng.uniform([-2, -2, -2], [6, 5, 4.5], size=(200, 3))
    expected = np.all((pts > [0, 0, 0]) & (pts < [4, 3, 2.5]), axis=1)
    mask = np.asarray(points_inside_mesh(jnp.asarray(pts), tris))
    np.testing.assert_array_equal(mask, expected)


def test_nearest_surface_distance(room):
    tris = jnp.asarray(room.triangles)
    pts = np.array(
        [
            [2.0, 1.5, 1.25],  # centre: nearest wall is z (1.25)
            [0.5, 1.5, 1.25],  # 0.5 from -x wall
            [2.0, 0.2, 1.0],  # 0.2 from -y wall
            [5.0, 1.5, 1.25],  # outside: 1.0 from +x wall
        ]
    )
    d = np.asarray(nearest_surface_distance(jnp.asarray(pts), tris))
    np.testing.assert_allclose(d, [1.25, 0.5, 0.2, 1.0], atol=1e-6)


def test_nearest_surface_distance_oracle(rng):
    """Random points vs a single random triangle, oracle = dense sampling."""
    tri = rng.standard_normal((1, 3, 3))
    pts = rng.standard_normal((20, 3))
    d = np.asarray(nearest_surface_distance(jnp.asarray(pts), jnp.asarray(tri)))

    # Dense barycentric sampling of the triangle as oracle
    u = rng.uniform(size=(20000, 1))
    v = rng.uniform(size=(20000, 1))
    over = (u + v) > 1
    u = np.where(over, 1 - u, u)
    v = np.where(over, 1 - v, v)
    samples = tri[0, 0] + u * (tri[0, 1] - tri[0, 0]) + v * (tri[0, 2] - tri[0, 0])
    oracle = np.min(np.linalg.norm(pts[:, None] - samples[None], axis=-1), axis=1)
    np.testing.assert_allclose(d, oracle, atol=1e-2)
    assert np.all(d <= oracle + 1e-9)  # exact distance can't exceed sampled min


def test_segments_occluded(room):
    tris = jnp.asarray(room.triangles)
    starts = np.array(
        [
            [1.0, 1.5, 1.25],  # open line inside the room
            [1.0, 1.5, 1.25],  # line leaving the room (crosses +x wall)
        ]
    )
    ends = np.array(
        [
            [3.0, 1.5, 1.25],
            [6.0, 1.5, 1.25],
        ]
    )
    occ = np.asarray(segments_occluded(jnp.asarray(starts), jnp.asarray(ends), tris))
    np.testing.assert_array_equal(occ, [False, True])


def test_segments_occluded_with_obstacle(room):
    # Put a small box between two points inside the room
    obstacle = box_mesh(extents=[0.5, 0.5, 0.5], center=[2.0, 1.5, 1.25], inward_normals=False)
    tris = np.concatenate([room.triangles, obstacle.triangles])
    starts = np.array([[0.5, 1.5, 1.25], [0.5, 0.5, 0.5]])
    ends = np.array([[3.5, 1.5, 1.25], [0.5, 2.5, 0.5]])
    occ = np.asarray(segments_occluded(jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(tris)))
    np.testing.assert_array_equal(occ, [True, False])


def test_ray_first_hit(room):
    tris = jnp.asarray(room.triangles)
    origins = np.array([[2.0, 1.5, 1.25], [2.0, 1.5, 1.25]])
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0]])
    t, idx = ray_mesh_first_hit(jnp.asarray(origins), jnp.asarray(dirs), tris)
    np.testing.assert_allclose(np.asarray(t), [2.0, 1.25], atol=1e-6)
    assert np.all(np.asarray(idx) >= 0)


def test_ray_escape():
    # Single triangle far from the ray
    tri = jnp.asarray(np.array([[[10.0, 10, 10], [11, 10, 10], [10, 11, 10]]]))
    t, idx = ray_mesh_first_hit(
        jnp.asarray([[0.0, 0, 0]]), jnp.asarray([[0.0, 0, -1.0]]), tri
    )
    assert np.isinf(np.asarray(t)[0])
    assert np.asarray(idx)[0] == -1


def test_watertight_and_repair():
    m = box_mesh()
    assert m.is_watertight
    # Remove a face -> not watertight; broken faces detected
    m2 = TriMesh(m.vertices, m.faces[:-1])
    assert not m2.is_watertight
    assert len(m2.broken_faces()) > 0

    # Flip some faces -> fix_winding restores coherent orientation
    m3 = TriMesh(m.vertices.copy(), m.faces.copy())
    m3.faces[3] = m3.faces[3][::-1]
    m3.faces[7] = m3.faces[7][::-1]
    m3.fix_winding()
    # After winding fix, all inward normals point toward the centroid again
    normals = m3.face_normals
    centers = m3.triangles.mean(axis=1)
    to_center = m3.vertices.mean(axis=0) - centers
    dots = np.sum(normals * to_center, axis=1)
    assert np.all(dots > 0) or np.all(dots < 0)  # coherent


def test_sample_surface(room, rng):
    pts = room.sample_surface(500, rng=rng)
    assert pts.shape == (500, 3)
    d = np.asarray(nearest_surface_distance(jnp.asarray(pts), jnp.asarray(room.triangles)))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_obj_roundtrip(tmp_path, room):
    # Write a tiny OBJ and reload it
    path = tmp_path / "room.obj"
    with open(path, "w") as f:
        for v in room.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in room.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    loaded = load_mesh(path)
    np.testing.assert_allclose(loaded.vertices, room.vertices)
    np.testing.assert_array_equal(loaded.faces, room.faces)
    assert loaded.metadata["fname"] == "room"


def test_glb_roundtrip(tmp_path, room):
    """Write a minimal GLB container and reload it."""
    import json as _json
    import struct

    verts = room.vertices.astype(np.float32)
    faces = room.faces.astype(np.uint32)
    bin_blob = verts.tobytes() + faces.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}
                ]
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": len(verts),
                "type": "VEC3",
                "min": verts.min(0).tolist(),
                "max": verts.max(0).tolist(),
            },
            {
                "bufferView": 1,
                "componentType": 5125,
                "count": faces.size,
                "type": "SCALAR",
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": verts.nbytes},
            {"buffer": 0, "byteOffset": verts.nbytes, "byteLength": faces.nbytes},
        ],
        "buffers": [{"byteLength": len(bin_blob)}],
    }
    json_bytes = _json.dumps(gltf).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    bin_blob += b"\x00" * (-len(bin_blob) % 4)

    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(json_bytes) + 8 + len(bin_blob))
    glb += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    glb += struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob

    path = tmp_path / "room.glb"
    path.write_bytes(glb)

    loaded = load_mesh(path)
    np.testing.assert_allclose(loaded.vertices, room.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, room.faces)
    assert loaded.is_watertight


def _pack_glb(gltf_dict, bin_blob):
    import json as _json
    import struct

    json_bytes = _json.dumps(gltf_dict).encode()
    json_bytes += b" " * (-len(json_bytes) % 4)
    bin_blob = bin_blob + b"\x00" * (-len(bin_blob) % 4)
    glb = struct.pack(
        "<III", 0x46546C67, 2, 12 + 8 + len(json_bytes) + 8 + len(bin_blob)
    )
    glb += struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
    glb += struct.pack("<II", len(bin_blob), 0x004E4942) + bin_blob
    return glb


def test_glb_exporter_quirks(tmp_path):
    """Real-exporter GLB features in one file: an INTERLEAVED vertex buffer
    (position+normal with byteStride), uint16 indices, TWO primitives split
    across TWO nodes — one under a translation+scale TRS transform — all
    concatenated into a single mesh on load."""
    # Primitive A: unit right triangle at origin, interleaved pos+normal
    pos_a = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm_a = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    inter = np.empty((3, 6), np.float32)
    inter[:, 0:3] = pos_a
    inter[:, 3:6] = nrm_a
    idx_a = np.array([0, 1, 2], np.uint16)

    # Primitive B: triangle translated by node TRS (t=[5,0,0], s=2)
    pos_b = np.array([[0, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    idx_b = np.array([0, 1, 2], np.uint16)

    blob = inter.tobytes() + idx_a.tobytes() + pos_b.tobytes() + idx_b.tobytes()
    o1 = inter.nbytes
    o2 = o1 + idx_a.nbytes
    o3 = o2 + pos_b.nbytes
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0},
            {"mesh": 1, "translation": [5.0, 0.0, 0.0], "scale": [2.0, 2.0, 2.0]},
        ],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0, "NORMAL": 1}, "indices": 2}]},
            {"primitives": [{"attributes": {"POSITION": 3}, "indices": 4}]},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 3, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": inter.nbytes, "byteStride": 24},
            {"buffer": 0, "byteOffset": o1, "byteLength": idx_a.nbytes},
            {"buffer": 0, "byteOffset": o2, "byteLength": pos_b.nbytes},
            {"buffer": 0, "byteOffset": o3, "byteLength": idx_b.nbytes},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    path = tmp_path / "quirks.glb"
    path.write_bytes(_pack_glb(gltf, blob))

    loaded = load_mesh(path)
    assert loaded.faces.shape == (2, 3)
    assert loaded.vertices.shape == (6, 3)
    # Primitive A vertices intact despite interleaving
    np.testing.assert_allclose(loaded.vertices[:3], pos_a, atol=1e-6)
    # Primitive B transformed: scaled by 2 then translated by [5, 0, 0]
    expect_b = pos_b * 2.0 + np.array([5.0, 0.0, 0.0])
    np.testing.assert_allclose(loaded.vertices[3:], expect_b, atol=1e-6)


def test_glb_millimetre_scale_heuristic(tmp_path):
    """A room-sized mesh authored in millimetres rescales to metres on load."""
    room_mm = box_mesh(extents=[7000.0, 5000.0, 3000.0], center=[3500, 2500, 1500])
    verts = np.asarray(room_mm.vertices, np.float32)
    faces = np.asarray(room_mm.faces, np.uint32)
    blob = verts.tobytes() + faces.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(verts), "type": "VEC3"},
            {"bufferView": 1, "componentType": 5125, "count": faces.size, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": verts.nbytes},
            {"buffer": 0, "byteOffset": verts.nbytes, "byteLength": faces.nbytes},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    path = tmp_path / "mm.glb"
    path.write_bytes(_pack_glb(gltf, blob))
    loaded = load_mesh(path)
    extent = loaded.vertices.max(0) - loaded.vertices.min(0)
    np.testing.assert_allclose(extent, [7.0, 5.0, 3.0], rtol=1e-5)
