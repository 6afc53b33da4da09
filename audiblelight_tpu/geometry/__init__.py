"""Geometry engine: host-side mesh ingestion + device-side batched spatial queries.

`TriMesh` replaces the reference's trimesh dependency for loading/repair/metadata
(reference worldstate.py:51-97); `queries` provides the batched point-in-mesh,
nearest-surface-distance and segment-occlusion kernels that back placement
validation and the ray tracer (reference's trimesh.ray/proximity hot loops,
worldstate.py:1390-1544).
"""

from audiblelight_tpu.geometry.mesh import TriMesh, box_mesh, load_mesh, scanned_like_room
from audiblelight_tpu.geometry.queries import (
    nearest_surface_distance,
    points_inside_mesh,
    ray_mesh_first_hit,
    segments_occluded,
)

__all__ = [
    "TriMesh",
    "load_mesh",
    "box_mesh",
    "scanned_like_room",
    "points_inside_mesh",
    "nearest_surface_distance",
    "segments_occluded",
    "ray_mesh_first_hit",
]
