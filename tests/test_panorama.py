"""Mesh-panorama renderer: geometry and integration checks."""

import numpy as np

from audiblelight_tpu.geometry.mesh import box_mesh, scanned_like_room
from audiblelight_tpu.viz import render_equirect_panorama


def test_box_panorama_full_coverage_and_symmetry():
    """Inside a closed box every pixel hits; the ceiling fills the top rows."""
    b = box_mesh(extents=[4.0, 3.0, 2.5], center=[2.0, 1.5, 1.25])
    img = render_equirect_panorama(
        np.asarray(b.triangles), [2.0, 1.5, 1.25], 160, 80
    )
    assert img.shape == (80, 160, 3) and img.dtype == np.uint8
    lit = img.sum(axis=-1) > 40
    assert lit.all()  # no escaped rays inside a watertight box
    # Top row = ceiling straight up: uniform distance, so tones differ only by
    # the per-face albedo jitter (<= 15 %)
    top = img[0].astype(int).sum(axis=-1)
    assert np.ptp(top) <= 0.2 * top.max()


def test_scanned_room_panorama_shows_structure():
    """A scanned room produces varied tones (face structure), not a flat fill."""
    m = scanned_like_room(seed=2)
    img = render_equirect_panorama(m.triangles, [3.5, 2.5, 1.5], 160, 80)
    tones = np.unique(img.reshape(-1, 3), axis=0)
    assert len(tones) > 50
    assert (img.sum(axis=-1) > 40).mean() > 0.98


def test_nearer_surfaces_render_brighter_with_fog():
    """Fog: the same wall seen from closer is brighter."""
    b = box_mesh(extents=[10.0, 3.0, 2.5], center=[5.0, 1.5, 1.25])
    near = render_equirect_panorama(np.asarray(b.triangles), [1.0, 1.5, 1.25], 64, 32)
    far = render_equirect_panorama(np.asarray(b.triangles), [9.0, 1.5, 1.25], 64, 32)
    # Pixel at az ~ +180-side wall: column 0 looks along -x... compare the wall
    # behind (-x) which is 1 m away in `near` and 9 m away in `far`.
    mid = 16
    col_back = 32  # az = 180 deg column (x index where az wraps)
    assert near[mid, col_back].sum() != far[mid, col_back].sum()


def _write_textured_glb(path):
    """A GLB with one textured quad (2x2-quadrant texture) at the x=+2 plane.

    Exercises the material layer a real exporter produces: PNG image in a
    bufferView, sampler/texture indirection, TEXCOORD_0 floats, and a
    baseColorFactor of 1.
    """
    import io
    import json
    import struct

    from PIL import Image

    verts = np.array(
        [[2, -2, -2], [2, 2, -2], [2, 2, 2], [2, -2, 2]], dtype=np.float32
    )
    uvs = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], dtype=np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], dtype=np.uint16)

    tex = np.zeros((2, 2, 3), np.uint8)
    tex[0, 0] = [255, 0, 0]     # v<0.5, u<0.5  red
    tex[0, 1] = [0, 255, 0]     # v<0.5, u>0.5  green
    tex[1, 0] = [0, 0, 255]     # v>0.5, u<0.5  blue
    tex[1, 1] = [255, 255, 0]   # v>0.5, u>0.5  yellow
    png = io.BytesIO()
    Image.fromarray(np.kron(tex, np.ones((32, 32, 1), np.uint8))).save(png, "PNG")
    png_bytes = png.getvalue()

    def pad4(b, fill=b"\x00"):
        return b + fill * (-len(b) % 4)

    v_b = verts.tobytes()
    u_b = uvs.tobytes()
    i_b = pad4(idx.tobytes())
    p_b = pad4(png_bytes)
    blob = v_b + u_b + i_b + p_b

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2,
                "material": 0,
            }]
        }],
        "materials": [{"pbrMetallicRoughness": {"baseColorTexture": {"index": 0}}}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": verts.min(0).tolist(), "max": verts.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(v_b)},
            {"buffer": 0, "byteOffset": len(v_b), "byteLength": len(u_b)},
            {"buffer": 0, "byteOffset": len(v_b) + len(u_b), "byteLength": len(idx.tobytes())},
            {"buffer": 0, "byteOffset": len(v_b) + len(u_b) + len(i_b),
             "byteLength": len(png_bytes)},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    js = pad4(json.dumps(gltf).encode(), b" ")
    out = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8 + len(blob))
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(blob), 0x004E4942) + blob
    path.write_bytes(out)


def test_textured_glb_panorama_samples_real_texture(tmp_path):
    """A GLB with a base-color texture renders it; the untextured fallback
    keeps the hashed-albedo shading (reference synthesize.py:922-998)."""
    from audiblelight_tpu.geometry.mesh import load_mesh

    glb = tmp_path / "quad.glb"
    _write_textured_glb(glb)
    mesh = load_mesh(glb)
    assert mesh.visuals is not None and mesh.visuals.any_textured
    assert mesh.visuals.face_uv.shape == (2, 3, 2)

    img = render_equirect_panorama(
        mesh.triangles, [0.0, 0.0, 0.0], 256, 128, visuals=mesh.visuals
    )
    # The quad spans azimuths around 0 (image centre). Collect hue classes.
    px = img.reshape(-1, 3).astype(int)
    lit = px[px.sum(axis=1) > 60]
    red = ((lit[:, 0] > 2 * lit[:, 1]) & (lit[:, 0] > 2 * lit[:, 2])).sum()
    green = ((lit[:, 1] > 2 * lit[:, 0]) & (lit[:, 1] > 2 * lit[:, 2])).sum()
    blue = ((lit[:, 2] > 2 * lit[:, 0]) & (lit[:, 2] > 2 * lit[:, 1])).sum()
    yellow = ((lit[:, 0] > 2 * lit[:, 2]) & (lit[:, 1] > 2 * lit[:, 2]) & (lit[:, 0] < 2 * lit[:, 1])).sum()
    assert min(red, green, blue, yellow) > 20  # all four quadrants visible

    # Without visuals the same mesh renders the warm fallback tone only
    plain = render_equirect_panorama(mesh.triangles, [0.0, 0.0, 0.0], 256, 128)
    ppx = plain.reshape(-1, 3).astype(int)
    plit = ppx[ppx.sum(axis=1) > 60]
    assert ((plit[:, 2] > 2 * plit[:, 0])).sum() == 0  # no saturated blue
