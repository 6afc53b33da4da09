"""Azimuth-culled star occlusion: exact agreement with the dense kernels.

The cull must be conservative for every geometry it claims to handle — the
cases here hit the spots where the azimuth parameterisation is weakest:
points directly above/below the array (unstable az), segment ends offset from
the build centre (parallax pad), and wraparound at the +-pi seam.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audiblelight_tpu.geometry.mesh import scanned_like_room, box_mesh
from audiblelight_tpu.geometry.queries import _segments_occluded_xla
from audiblelight_tpu.ops.star_occlusion import (
    build_star_accel,
    star_segments_occluded,
)


@pytest.fixture(scope="module")
def room():
    m = scanned_like_room(seed=11)
    return np.asarray(m.triangles)


def _agree(tris, accel, pts, end):
    occ_s = np.asarray(
        star_segments_occluded(accel, jnp.asarray(pts), jnp.asarray(end), interpret=True)
    )
    occ_x = np.asarray(
        _segments_occluded_xla(
            jnp.asarray(pts),
            jnp.broadcast_to(jnp.asarray(end), (len(pts), 3)),
            jnp.asarray(tris),
        )
    )
    return occ_s, occ_x


def test_star_matches_dense_centroid(room):
    center = np.array([3.3, 2.4, 1.4], np.float32)
    accel = build_star_accel(room, center, r_pad=0.02)
    assert accel is not None and accel.n_tiles > 1
    rng = np.random.default_rng(0)
    pts = np.float32(rng.uniform([0.2, 0.2, 0.1], [6.8, 4.8, 2.9], size=(700, 3)))
    occ_s, occ_x = _agree(room, accel, pts, center)
    assert occ_x.any() and not occ_x.all()  # the workload actually exercises both
    np.testing.assert_array_equal(occ_s, occ_x)


def test_star_overhead_points_and_seam(room):
    """Points straight above/below the array and near the az = +-pi seam."""
    center = np.array([3.3, 2.4, 1.4], np.float32)
    accel = build_star_accel(room, center, r_pad=0.02)
    rng = np.random.default_rng(1)
    pts = np.float32(rng.uniform([0.2, 0.2, 0.1], [6.8, 4.8, 2.9], size=(256, 3)))
    pts[:64, :2] = center[:2] + rng.normal(scale=0.01, size=(64, 2))  # vertical
    pts[64:128, 1] = center[1] + rng.normal(scale=0.01, size=64)  # az ~ +-pi
    pts[64:128, 0] = 0.3
    occ_s, occ_x = _agree(room, accel, pts, center)
    np.testing.assert_array_equal(occ_s, occ_x)


def test_star_offset_capsule_within_pad(room):
    """Segment ends offset from the centre stay exact inside r_pad."""
    center = np.array([3.3, 2.4, 1.4], np.float32)
    accel = build_star_accel(room, center, r_pad=0.15)
    rng = np.random.default_rng(2)
    pts = np.float32(rng.uniform([0.2, 0.2, 0.1], [6.8, 4.8, 2.9], size=(400, 3)))
    for off in ([0.1, 0.0, 0.05], [-0.07, 0.09, -0.06]):
        end = center + np.float32(off)
        occ_s, occ_x = _agree(room, accel, pts, end)
        np.testing.assert_array_equal(occ_s, occ_x)


def test_star_build_declines_degenerate():
    """A mesh entirely within the wide radius returns None (dense fallback)."""
    tiny = np.asarray(box_mesh(extents=[0.2, 0.2, 0.2], center=[0, 0, 0]).triangles)
    assert build_star_accel(tiny, np.zeros(3, np.float32), r_pad=0.02) is None
