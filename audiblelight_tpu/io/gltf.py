"""Minimal GLB/glTF-2.0 mesh reader (host side, pure numpy).

Replaces the reference's trimesh.load_mesh for the common case of Gibson / Matterport
GLB scans (reference worldstate.py:51-71). Parses the binary container, the JSON
scene graph (with node transforms) and extracts a single concatenated triangle soup
(vertices + faces). Per the glTF 2.0 spec, units are always metres.
"""

from __future__ import annotations

import base64
import json
import struct
from pathlib import Path
from typing import Tuple, Union

import numpy as np

_COMPONENT_DTYPES = {
    5120: np.int8,
    5121: np.uint8,
    5122: np.int16,
    5123: np.uint16,
    5125: np.uint32,
    5126: np.float32,
}
_TYPE_SIZES = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _parse_glb_container(data: bytes) -> tuple[dict, bytes]:
    """Split a GLB container into (json_dict, binary_blob)."""
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != 0x46546C67:  # b'glTF'
        raise ValueError("Not a GLB file (bad magic)")
    if version != 2:
        raise ValueError(f"Unsupported GLB version: {version}")

    offset = 12
    json_chunk = None
    bin_chunk = b""
    while offset < len(data):
        chunk_len, chunk_type = struct.unpack_from("<II", data, offset)
        offset += 8
        chunk = data[offset : offset + chunk_len]
        offset += chunk_len
        if chunk_type == 0x4E4F534A:  # JSON
            json_chunk = json.loads(chunk.decode("utf-8"))
        elif chunk_type == 0x004E4942:  # BIN
            bin_chunk = chunk
    if json_chunk is None:
        raise ValueError("GLB file has no JSON chunk")
    return json_chunk, bin_chunk


def _read_accessor(gltf: dict, buffers: list[bytes], accessor_idx: int) -> np.ndarray:
    """Read an accessor into a numpy array of shape (count, type_size)."""
    acc = gltf["accessors"][accessor_idx]
    if "bufferView" not in acc:
        count = acc["count"]
        size = _TYPE_SIZES[acc["type"]]
        return np.zeros((count, size), dtype=_COMPONENT_DTYPES[acc["componentType"]])

    view = gltf["bufferViews"][acc["bufferView"]]
    buffer = buffers[view["buffer"]]
    dtype = np.dtype(_COMPONENT_DTYPES[acc["componentType"]]).newbyteorder("<")
    n_comp = _TYPE_SIZES[acc["type"]]
    count = acc["count"]
    item_bytes = dtype.itemsize * n_comp

    start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", item_bytes)

    if stride == item_bytes:
        raw = buffer[start : start + count * item_bytes]
        arr = np.frombuffer(raw, dtype=dtype, count=count * n_comp).reshape(count, n_comp)
    else:
        # Interleaved: gather with a strided view over bytes
        raw = np.frombuffer(buffer, dtype=np.uint8)
        idx = start + stride * np.arange(count)[:, None] + np.arange(item_bytes)[None, :]
        arr = raw[idx].copy().view(dtype).reshape(count, n_comp)
    return np.ascontiguousarray(arr)


def _node_transform(node: dict) -> np.ndarray:
    """4x4 world transform for a glTF node (matrix or TRS)."""
    if "matrix" in node:
        return np.asarray(node["matrix"], dtype=np.float64).reshape(4, 4).T
    m = np.eye(4)
    if "scale" in node:
        m[:3, :3] *= np.asarray(node["scale"], dtype=np.float64)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        rot = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        m[:3, :3] = rot @ m[:3, :3]
    if "translation" in node:
        m[:3, 3] = node["translation"]
    return m


def load_gltf(path: Union[str, Path]) -> Tuple[np.ndarray, np.ndarray]:
    """Load a .glb/.gltf file into a single (vertices, faces) triangle soup.

    All mesh primitives in the default scene are concatenated, with node transforms
    applied. Returns float64 vertices (V, 3) and int32 faces (F, 3).
    """
    path = Path(path)
    data = path.read_bytes()
    if path.suffix.lower() == ".glb" or data[:4] == b"glTF":
        gltf, bin_blob = _parse_glb_container(data)
        buffers = []
        for buf in gltf.get("buffers", []):
            uri = buf.get("uri")
            if uri is None:
                buffers.append(bin_blob)
            elif uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                buffers.append((path.parent / uri).read_bytes())
    else:
        gltf = json.loads(data.decode("utf-8"))
        buffers = []
        for buf in gltf.get("buffers", []):
            uri = buf.get("uri", "")
            if uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                buffers.append((path.parent / uri).read_bytes())

    all_verts = []
    all_faces = []
    vert_offset = 0

    # Walk the node hierarchy of the default scene, accumulating transforms.
    scene_idx = gltf.get("scene", 0)
    scenes = gltf.get("scenes", [{"nodes": list(range(len(gltf.get("nodes", []))))}])
    root_nodes = scenes[scene_idx].get("nodes", []) if scenes else []
    nodes = gltf.get("nodes", [])

    def visit(node_idx: int, parent_tf: np.ndarray):
        nonlocal vert_offset
        node = nodes[node_idx]
        tf = parent_tf @ _node_transform(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:  # triangles only
                    continue
                pos = _read_accessor(gltf, buffers, prim["attributes"]["POSITION"]).astype(
                    np.float64
                )
                pos_h = np.concatenate([pos, np.ones((len(pos), 1))], axis=1)
                pos_w = (tf @ pos_h.T).T[:, :3]
                if "indices" in prim:
                    idx = _read_accessor(gltf, buffers, prim["indices"]).reshape(-1)
                else:
                    idx = np.arange(len(pos))
                faces = idx.astype(np.int64).reshape(-1, 3) + vert_offset
                all_verts.append(pos_w)
                all_faces.append(faces)
                vert_offset += len(pos)
        for child in node.get("children", []):
            visit(child, tf)

    if root_nodes and nodes:
        for root in root_nodes:
            visit(root, np.eye(4))
    else:
        # No scene graph: read all mesh primitives directly
        for mesh in gltf.get("meshes", []):
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:
                    continue
                pos = _read_accessor(gltf, buffers, prim["attributes"]["POSITION"]).astype(
                    np.float64
                )
                if "indices" in prim:
                    idx = _read_accessor(gltf, buffers, prim["indices"]).reshape(-1)
                else:
                    idx = np.arange(len(pos))
                all_faces.append(idx.astype(np.int64).reshape(-1, 3) + vert_offset)
                all_verts.append(pos)
                vert_offset += len(pos)

    if not all_verts:
        raise ValueError(f"No triangle meshes found in {path}")

    vertices = np.concatenate(all_verts, axis=0)
    faces = np.concatenate(all_faces, axis=0).astype(np.int32)
    return vertices, faces
