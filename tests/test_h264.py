"""H.264 video path (io/h264.py + cpp/h264mux.c over system libavcodec).

The writer must produce a real H.264 MP4 (avc1 sample entry, not MJPEG) and
the reader must decode it back close to the source frames; the reader must
also decode our own dependency-free MJPEG muxes, proving the fallback
containers are standards-conforming.
"""

import numpy as np
import pytest

from audiblelight_tpu.io.h264 import h264_available

pytestmark = pytest.mark.skipif(
    not h264_available(), reason="native H.264 shim unavailable"
)


def _frames(n=12, h=72, w=96):
    """Moving gradient + box: enough structure for PSNR to be meaningful."""
    out = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        f = np.zeros((h, w, 3), np.uint8)
        f[..., 0] = (xx * 255 // w).astype(np.uint8)
        f[..., 1] = (yy * 255 // h).astype(np.uint8)
        x0 = 4 + 6 * i
        f[20:44, x0 : x0 + 16, 2] = 230
        out.append(f)
    return out


def test_h264_roundtrip(tmp_path):
    from audiblelight_tpu.io.h264 import read_video_frames, write_h264_mp4

    frames = _frames()
    path = write_h264_mp4(tmp_path / "clip.mp4", frames, fps=10, crf=18)
    raw = path.read_bytes()
    assert b"avc1" in raw or b"avcC" in raw  # real H.264 sample entry
    assert b"mp4v" not in raw  # not the MJPEG fallback signalling

    it, w, h, fps = read_video_frames(path)
    decoded = list(it)
    assert (w, h) == (96, 72)
    assert abs(fps - 10.0) < 1.5  # container-duration rounding shifts avg rate
    assert len(decoded) == len(frames)
    for src, dec in zip(frames, decoded):
        err = np.mean((src.astype(np.float64) - dec.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0**2 / max(err, 1e-9))
        assert psnr > 30.0, f"lossy roundtrip too lossy: {psnr:.1f} dB"


def test_h264_odd_dimensions_padded(tmp_path):
    from audiblelight_tpu.io.h264 import read_video_frames, write_h264_mp4

    frames = [np.full((31, 45, 3), 128, np.uint8) for _ in range(3)]
    path = write_h264_mp4(tmp_path / "odd.mp4", frames, fps=5)
    it, w, h, _ = read_video_frames(path)
    assert (w, h) == (46, 32)  # padded to even for 4:2:0
    assert len(list(it)) == 3


def test_reader_decodes_own_mjpeg_mp4(tmp_path):
    from audiblelight_tpu.io.h264 import read_video_frames
    from audiblelight_tpu.io.mp4 import write_mjpeg_mp4

    frames = _frames(n=5)
    path = write_mjpeg_mp4(tmp_path / "mj.mp4", frames, fps=8)
    it, w, h, _ = read_video_frames(path)
    decoded = list(it)
    assert (w, h) == (96, 72)
    assert len(decoded) == 5
    err = np.mean(
        (frames[0].astype(np.float64) - decoded[0].astype(np.float64)) ** 2
    )
    assert 10 * np.log10(255.0**2 / max(err, 1e-9)) > 25.0


def test_reader_decodes_own_mjpeg_avi(tmp_path):
    from audiblelight_tpu.io.avi import write_mjpeg_avi
    from audiblelight_tpu.io.h264 import read_video_frames

    frames = _frames(n=4)
    write_mjpeg_avi(tmp_path / "mj.avi", frames, fps=8)
    it, w, h, _ = read_video_frames(tmp_path / "mj.avi")
    assert (w, h) == (96, 72)
    assert len(list(it)) == 4


def test_scene_video_uses_h264(tmp_path):
    """The video generator prefers the H.264 writer when the shim loads."""
    pytest.importorskip("PIL")
    from audiblelight_tpu.core import Scene
    from audiblelight_tpu.geometry.mesh import box_mesh
    from audiblelight_tpu.synthesize import generate_scene_video_from_events

    scene = Scene(
        duration=1.0,
        sample_rate=8000,
        backend="rlr",
        backend_kwargs=dict(
            mesh=box_mesh(extents=[5.0, 4.0, 3.0], center=[2.5, 2.0, 1.5])
        ),
        video_fps=2,
    )
    scene.add_microphone(microphone_type="monocapsule", position=[2.5, 2.0, 1.5])
    generate_scene_video_from_events(scene, tmp_path / "vid")
    raw = (tmp_path / "vid.mp4").read_bytes()
    assert b"avc1" in raw or b"avcC" in raw
