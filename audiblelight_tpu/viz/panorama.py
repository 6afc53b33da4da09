"""Equirectangular panorama of a room mesh, rendered by raycasting.

The reference textures a VTK scene and grabs panoramic frames
(reference synthesize.py:881-1283, optional VTK/PyVista dependencies). Here the
same picture comes out of the framework's OWN ray kernels: one first-hit query
per pixel (geometry.queries.ray_mesh_first_hit — the Pallas dense kernels on
TPU, chunked XLA elsewhere), shaded with a headlight Lambertian term, a
per-face albedo hashed for stable face contrast, and distance fog. The camera
sits at the microphone, so the background panorama matches the equirect event
overlay coordinates exactly: az in [-180, 180) maps right-to-left onto x, el in
[-90, 90] maps top-to-bottom onto y (the convention of
synthesize.generate_scene_video_from_events).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _equirect_dirs(width: int, height: int) -> np.ndarray:
    """(H*W, 3) unit view directions for the pixel grid (x: az, y: el)."""
    # Pixel centres; the x axis runs az=+180..-180 left->right shifted so the
    # image centre is az=0 (matching the event overlay's x mapping).
    az = (0.5 - (np.arange(width) + 0.5) / width) * 2.0 * np.pi
    el = (0.5 - (np.arange(height) + 0.5) / height) * np.pi
    azg, elg = np.meshgrid(az, el)  # (H, W)
    ce = np.cos(elg)
    dirs = np.stack([ce * np.cos(azg), ce * np.sin(azg), np.sin(elg)], axis=-1)
    return dirs.reshape(-1, 3).astype(np.float32)


def _sample_visuals(visuals, tris, fsafe, hit_points) -> tuple[np.ndarray, np.ndarray]:
    """Per-pixel albedo from the mesh's material layer.

    Computes barycentric coordinates of each hit point in its face, bilinearly
    interpolates the face-corner UVs and samples the base-color texture
    (nearest texel, REPEAT wrap — glTF defaults). Untextured faces keep the
    base-color factor only. Returns (albedo (N, 3) float, textured (N,) bool).
    """
    a = tris[fsafe, 0]
    e1 = tris[fsafe, 1] - a
    e2 = tris[fsafe, 2] - a
    p = hit_points - a
    d11 = np.sum(e1 * e1, axis=-1)
    d12 = np.sum(e1 * e2, axis=-1)
    d22 = np.sum(e2 * e2, axis=-1)
    dp1 = np.sum(p * e1, axis=-1)
    dp2 = np.sum(p * e2, axis=-1)
    det = np.maximum(d11 * d22 - d12 * d12, 1e-20)
    u = np.clip((d22 * dp1 - d12 * dp2) / det, 0.0, 1.0)
    v = np.clip((d11 * dp2 - d12 * dp1) / det, 0.0, 1.0)
    w0 = np.clip(1.0 - u - v, 0.0, 1.0)

    uv_corners = visuals.face_uv[fsafe]  # (N, 3, 2)
    uv = (
        w0[:, None] * uv_corners[:, 0]
        + u[:, None] * uv_corners[:, 1]
        + v[:, None] * uv_corners[:, 2]
    )
    albedo = visuals.face_color[fsafe].astype(np.float32).copy()
    tex_idx = visuals.face_texture[fsafe]
    textured = tex_idx >= 0
    for ti, tex in enumerate(visuals.textures):
        sel = tex_idx == ti
        if not np.any(sel):
            continue
        h, w = tex.shape[:2]
        x = (np.mod(uv[sel, 0], 1.0) * (w - 1)).astype(np.int64)
        y = (np.mod(uv[sel, 1], 1.0) * (h - 1)).astype(np.int64)
        albedo[sel] *= tex[y, x].astype(np.float32) / 255.0
    return albedo, textured


def render_equirect_panorama(
    tris: np.ndarray,
    cam_pos,
    width: int = 640,
    height: int = 320,
    fog_distance: float = 12.0,
    accel=None,
    visuals=None,
) -> np.ndarray:
    """(H, W, 3) uint8 panorama of the mesh seen from cam_pos.

    Escaped rays (mesh holes) render as dark sky. With `visuals` (an
    io.gltf.MeshVisuals, e.g. `mesh.visuals` from a textured GLB) pixels sample
    the mesh's real base-color textures at the hit UVs — the reference's VTK
    textured panorama (reference synthesize.py:922-998). Without one, shading
    is geometry-only: headlight Lambertian + hashed per-face albedo + distance
    fog, which keeps the renderer dependency-free while still showing the
    room's actual scanned structure behind the event overlay.
    """
    from audiblelight_tpu.geometry.queries import ray_mesh_first_hit

    tris = np.asarray(tris, dtype=np.float32)
    cam = np.asarray(cam_pos, dtype=np.float32).reshape(3)
    dirs = _equirect_dirs(width, height)
    origins = np.broadcast_to(cam, dirs.shape)

    t, fidx = ray_mesh_first_hit(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(tris), accel=accel
    )
    t = np.asarray(t)
    fidx = np.asarray(fidx)

    hit = np.isfinite(t)
    fsafe = np.maximum(fidx, 0)

    n = np.cross(tris[fsafe, 1] - tris[fsafe, 0], tris[fsafe, 2] - tris[fsafe, 0])
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # Headlight: light rides the camera, so shading is |n . view|
    lam = np.abs(np.sum(n * dirs, axis=-1))
    shade = 0.25 + 0.75 * lam

    # Stable per-face albedo via an integer hash — adjacent scanned-mesh faces
    # get slightly different tones, which reads as surface texture.
    h = (fsafe.astype(np.uint32) * np.uint32(2654435761)) >> np.uint32(16)
    jitter = 0.85 + 0.15 * ((h % np.uint32(256)).astype(np.float32) / 255.0)

    base = np.broadcast_to(
        np.array([0.78, 0.72, 0.62], np.float32), (len(fsafe), 3)
    )  # warm interior fallback tone
    mod = shade * jitter
    if visuals is not None:
        t_safe0 = np.where(hit, t, 0.0)
        hit_points = cam[None, :] + t_safe0[:, None] * dirs
        albedo, textured = _sample_visuals(visuals, tris, fsafe, hit_points)
        base = np.where(textured[:, None], albedo, base)
        # Textured pixels carry real surface colour; keep the hash jitter off
        # them (it exists to fake texture where there is none).
        mod = np.where(textured, shade, mod)

    t_safe = np.where(hit, t, 0.0)
    fog = np.exp(-t_safe / fog_distance).astype(np.float32)
    sky = np.array([0.06, 0.07, 0.10], np.float32)

    rgb = base * (mod * fog)[:, None]
    rgb = np.where(hit[:, None], rgb, sky[None, :])
    img = np.clip(rgb.reshape(height, width, 3) * 255.0, 0, 255).astype(np.uint8)
    return img


__all__ = ["render_equirect_panorama"]
