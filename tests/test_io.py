"""Tests for host-side audio I/O (WAV codec, load_audio semantics)."""

import numpy as np
import pytest

from audiblelight_tpu.io import get_duration, load_audio, valid_audio, wav_read, wav_write


def test_wav_roundtrip_float32(tmp_path, rng):
    audio = rng.standard_normal((2, 1000)).astype(np.float32) * 0.5
    path = tmp_path / "t.wav"
    wav_write(path, audio, 44100)
    loaded, sr = wav_read(path)
    assert sr == 44100
    np.testing.assert_allclose(loaded, audio, atol=1e-7)


@pytest.mark.parametrize("subtype,atol", [("int16", 1e-4), ("int24", 1e-6)])
def test_wav_roundtrip_pcm(tmp_path, rng, subtype, atol):
    audio = (rng.uniform(-0.9, 0.9, (1, 500))).astype(np.float32)
    path = tmp_path / "t.wav"
    wav_write(path, audio, 22050, subtype=subtype)
    loaded, sr = wav_read(path)
    assert sr == 22050
    np.testing.assert_allclose(loaded, audio, atol=atol)


def test_wav_mono_write_from_1d(tmp_path):
    audio = np.linspace(-0.5, 0.5, 100).astype(np.float32)
    path = tmp_path / "m.wav"
    wav_write(path, audio, 8000)
    loaded, sr = wav_read(path)
    assert loaded.shape == (1, 100)


def test_get_duration(sine_wav):
    assert np.isclose(get_duration(sine_wav), 1.0, atol=1e-4)


def test_wav_read_offset_duration(sine_wav):
    full, sr = wav_read(sine_wav)
    part, _ = wav_read(sine_wav, offset=0.25, duration=0.5)
    assert part.shape[1] == sr // 2
    np.testing.assert_allclose(part, full[:, sr // 4 : sr // 4 + sr // 2], atol=1e-7)


def test_load_audio_mono_resample(noise_wav):
    audio, sr = load_audio(noise_wav, sr=44100, mono=True)
    assert sr == 44100
    assert audio.ndim == 1
    # 2 seconds at the new rate (within resampler edge tolerance)
    assert abs(len(audio) - 2 * 44100) < 16


def test_load_audio_multichannel(noise_wav):
    audio, sr = load_audio(noise_wav, sr=None, mono=False)
    assert audio.shape[0] == 2
    assert sr == 22050


def test_valid_audio():
    assert valid_audio(np.zeros(10, dtype=np.float32))
    with pytest.raises(ValueError):
        valid_audio(np.array([np.nan, 1.0]))
    with pytest.raises(TypeError):
        valid_audio(np.zeros(10, dtype=np.int16))


def test_get_duration_rejects_unknown_format(tmp_path):
    # mp3/flac now decode (io.codecs); formats with no decoder still raise
    p = tmp_path / "x.ogg"
    p.write_bytes(b"not audio")
    with pytest.raises(ValueError):
        get_duration(p)
    bad_mp3 = tmp_path / "x.mp3"
    bad_mp3.write_bytes(b"not audio")
    with pytest.raises((ValueError, RuntimeError)):
        get_duration(bad_mp3)


# ---------------------------------------------------------------------------
# MJPEG AVI muxer
# ---------------------------------------------------------------------------


def test_mjpeg_avi_roundtrip(tmp_path):
    from audiblelight_tpu.io.avi import read_avi_frame_count, write_mjpeg_avi

    rng = np.random.default_rng(0)
    frames = [(rng.random((64, 96, 3)) * 255).astype(np.uint8) for _ in range(7)]
    out = write_mjpeg_avi(tmp_path / "clip.avi", frames, fps=10)
    data = out.read_bytes()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"MJPG" in data[:200]
    assert data.count(b"00dc") >= 7  # one frame chunk each (+ idx1 entries)
    assert read_avi_frame_count(out) == 7


def test_mjpeg_avi_errors(tmp_path):
    from audiblelight_tpu.io.avi import write_mjpeg_avi

    with pytest.raises(ValueError):
        write_mjpeg_avi(tmp_path / "x.avi", [], fps=10)
    frames = [np.zeros((32, 32, 3), np.uint8), np.zeros((16, 32, 3), np.uint8)]
    with pytest.raises(ValueError):
        write_mjpeg_avi(tmp_path / "y.avi", frames, fps=10)


def test_mjpeg_mp4_box_structure(tmp_path):
    """The MP4 muxer writes a well-formed ISO-BMFF tree: box sizes tile the
    file exactly, the required boxes exist, stsz matches the JPEG payloads,
    and every frame decodes from its recorded offset."""
    import io
    import struct

    import numpy as np
    from PIL import Image

    from audiblelight_tpu.io.mp4 import write_mjpeg_mp4

    rng = np.random.default_rng(0)
    frames = [
        (rng.uniform(0, 255, size=(48, 64, 3))).astype(np.uint8) for _ in range(5)
    ]
    out = write_mjpeg_mp4(tmp_path / "clip.mp4", frames, fps=10)
    data = out.read_bytes()

    def walk(buf, base):
        boxes = {}
        pos = 0
        while pos < len(buf):
            size, four = struct.unpack(">I4s", buf[pos : pos + 8])
            assert size >= 8
            boxes[four] = (base + pos + 8, buf[pos + 8 : pos + size])
            pos += size
        assert pos == len(buf)  # boxes tile the range exactly
        return boxes

    top = walk(data, 0)
    assert set(top) == {b"ftyp", b"mdat", b"moov"}
    moov_off, moov = top[b"moov"]
    moov_boxes = walk(moov, moov_off)
    trak_off, trak = moov_boxes[b"trak"]
    # descend: trak -> mdia -> minf -> stbl
    mdia_off, mdia_buf = walk(trak, trak_off)[b"mdia"]
    minf_off, minf_buf = walk(mdia_buf, mdia_off)[b"minf"]
    stbl_off, stbl_buf = walk(minf_buf, minf_off)[b"stbl"]
    stbl = walk(stbl_buf, stbl_off)
    for four in (b"stsd", b"stts", b"stsc", b"stsz", b"stco"):
        assert four in stbl

    # stsz sample sizes + stco chunk offset recover every JPEG frame
    stsz = stbl[b"stsz"][1]
    _, _, n = struct.unpack(">III", stsz[:12])
    sizes = struct.unpack(f">{n}I", stsz[12 : 12 + 4 * n])
    assert n == 5
    stco = stbl[b"stco"][1]
    (_, _, chunk_off) = struct.unpack(">III", stco[:12])
    pos = chunk_off
    for k, size in enumerate(sizes):
        img = Image.open(io.BytesIO(data[pos : pos + size]))
        assert img.size == (64, 48)
        pos += size
    # sample entry advertises mp4v + an esds with the JPEG object type (0x6C):
    # esds fourcc, verflags(4), ES tag(1) len(1) ES_ID(2) flags(1),
    # DecoderConfig tag(1) len(1) -> objectTypeIndication
    stsd = stbl[b"stsd"][1]
    assert b"mp4v" in stsd and b"esds" in stsd
    idx = stsd.index(b"esds")
    assert stsd[idx + 15] == 0x6C
