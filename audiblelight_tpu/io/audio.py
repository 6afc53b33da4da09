"""WAV audio I/O and decode-time processing (mono mix, offset/duration, resample).

Replaces the reference's librosa/soundfile usage (reference event.py:520 loads with
``librosa.load(sr=, mono=True, offset=, duration=)``; core.py:1841 writes WAVs with
soundfile). Implemented on the standard RIFF/WAVE format directly so the package has
no native audio-codec dependency: PCM 16/24/32-bit and IEEE float 32/64 are supported.
MP3 (the FMA music corpus format) and FLAC dispatch to audiblelight_tpu.io.codecs
(system libmpg123 over ctypes / pure-Python FLAC); other formats raise a clear error.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np
from scipy.signal import resample_poly


_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _parse_fmt_chunk(data: bytes) -> tuple[int, int, int, int]:
    """Parse a fmt chunk -> (format_tag, n_channels, sample_rate, bits_per_sample)."""
    fmt_tag, n_channels, sample_rate = struct.unpack_from("<HHI", data, 0)
    bits_per_sample = struct.unpack_from("<H", data, 14)[0]
    if fmt_tag == _WAVE_FORMAT_EXTENSIBLE and len(data) >= 40:
        # Actual format is in the first two bytes of the SubFormat GUID
        fmt_tag = struct.unpack_from("<H", data, 24)[0]
    return fmt_tag, n_channels, sample_rate, bits_per_sample


def _iter_riff_chunks(f):
    """Yield (chunk_id, size, offset_of_data) for every top-level RIFF chunk."""
    header = f.read(12)
    if len(header) < 12 or header[:4] != b"RIFF" or header[8:12] != b"WAVE":
        raise ValueError("Not a RIFF/WAVE file")
    while True:
        chunk_header = f.read(8)
        if len(chunk_header) < 8:
            return
        chunk_id, size = chunk_header[:4], struct.unpack("<I", chunk_header[4:])[0]
        data_offset = f.tell()
        yield chunk_id, size, data_offset
        # Chunks are word-aligned
        f.seek(data_offset + size + (size & 1))


def _read_header(path: Union[str, Path]) -> tuple[int, int, int, int, int, int]:
    """Read WAV header only -> (fmt_tag, channels, sr, bits, data_offset, data_size)."""
    with open(path, "rb") as f:
        fmt = None
        data = None
        for chunk_id, size, offset in _iter_riff_chunks(f):
            if chunk_id == b"fmt ":
                f.seek(offset)
                fmt = _parse_fmt_chunk(f.read(size))
            elif chunk_id == b"data":
                data = (offset, size)
            if fmt is not None and data is not None:
                break
        if fmt is None or data is None:
            raise ValueError(f"Missing fmt/data chunk in WAV file {path}")
        fmt_tag, channels, sr, bits = fmt
        return fmt_tag, channels, sr, bits, data[0], data[1]


def _decode_pcm(raw: np.ndarray, fmt_tag: int, bits: int) -> np.ndarray:
    """Decode raw sample bytes (interleaved) into float32 in [-1, 1]."""
    if fmt_tag == _WAVE_FORMAT_IEEE_FLOAT:
        dtype = np.float32 if bits == 32 else np.float64
        return np.frombuffer(raw, dtype="<" + np.dtype(dtype).char).astype(np.float32)
    if fmt_tag != _WAVE_FORMAT_PCM:
        raise ValueError(f"Unsupported WAV format tag: {fmt_tag}")
    if bits == 16:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if bits == 32:
        return np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    if bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        # Sign-extend 24-bit little-endian into int32
        as_int = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        as_int = np.where(as_int & 0x800000, as_int - 0x1000000, as_int)
        return as_int.astype(np.float32) / 8388608.0
    if bits == 8:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    raise ValueError(f"Unsupported PCM bit depth: {bits}")


def wav_read(
    path: Union[str, Path],
    offset: float = 0.0,
    duration: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Read a WAV file (optionally a [offset, offset+duration] slice) without decoding
    the whole file.

    Returns:
        (audio, sample_rate): audio has shape (channels, samples), float32 in [-1, 1].
    """
    fmt_tag, channels, sr, bits, data_offset, data_size = _read_header(path)
    bytes_per_frame = channels * (bits // 8)
    total_frames = data_size // bytes_per_frame

    start_frame = min(int(round(offset * sr)), total_frames)
    if duration is None:
        n_frames = total_frames - start_frame
    else:
        n_frames = min(int(round(duration * sr)), total_frames - start_frame)

    with open(path, "rb") as f:
        f.seek(data_offset + start_frame * bytes_per_frame)
        raw = f.read(n_frames * bytes_per_frame)

    samples = _decode_pcm(raw, fmt_tag, bits)
    n_full = (len(samples) // channels) * channels
    audio = samples[:n_full].reshape(-1, channels).T
    return np.ascontiguousarray(audio), sr


def wav_write(
    path: Union[str, Path],
    audio: np.ndarray,
    sample_rate: int,
    subtype: str = "float32",
) -> None:
    """Write a WAV file from a (channels, samples) or (samples,) float array."""
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    interleaved = np.ascontiguousarray(audio.T)

    # Each branch produces exactly ONE interleaved payload array and streams it
    # with tofile() — the astype(...).tobytes() form made two extra full-size
    # copies per call, which dominated per-scene host time on dataset runs.
    if subtype == "float32":
        fmt_tag, bits = _WAVE_FORMAT_IEEE_FLOAT, 32
        payload = np.asarray(interleaved, dtype="<f4")
    elif subtype == "int16":
        fmt_tag, bits = _WAVE_FORMAT_PCM, 16
        if interleaved.dtype == np.int16:
            # Already-quantised samples (the device-mix pipeline emits the
            # exact WAV payload, render.quantize_mix_wav) pass through — and
            # when the caller hands a (C, T) view of a (T, C) int16 buffer,
            # ascontiguousarray(audio.T) above was already a no-op.
            payload = interleaved
        else:
            clipped = np.clip(interleaved, -1.0, 1.0)
            clipped *= 32767.0  # clip() copied; scale in place
            payload = clipped.astype("<i2")
    elif subtype == "int24":
        fmt_tag, bits = _WAVE_FORMAT_PCM, 24
        clipped = np.clip(interleaved, -1.0, 1.0)
        as_int = (clipped * 8388607.0).astype(np.int32)
        b = np.empty((as_int.size, 3), dtype=np.uint8)
        flat = as_int.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b
    else:
        raise ValueError(f"Unsupported subtype: {subtype}")

    channels = audio.shape[0]
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8

    with open(path, "wb") as f:
        data_size = payload.nbytes
        f.write(b"RIFF")
        # the RIFF size includes the data chunk's odd-length pad byte
        f.write(struct.pack("<I", 36 + data_size + (data_size & 1)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, fmt_tag, channels, sample_rate, byte_rate, block_align, bits))
        f.write(b"data")
        f.write(struct.pack("<I", data_size))
        payload.tofile(f)  # streams without a tobytes() copy
        if data_size & 1:
            f.write(b"\x00")


def get_duration(path: Union[str, Path]) -> float:
    """Duration of an audio file in seconds, from the header only (no decode).

    WAV natively; MP3 via the system libmpg123 (frame scan); FLAC from
    STREAMINFO (audiblelight_tpu.io.codecs).
    """
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".mp3":
        from audiblelight_tpu.io.codecs import mp3_duration

        return mp3_duration(path)
    if suffix == ".flac":
        from audiblelight_tpu.io.codecs import flac_duration

        return flac_duration(path)
    if suffix != ".wav":
        raise ValueError(
            f"Unsupported audio format '{suffix}' (wav/mp3/flac are supported). "
            f"Convert other formats to WAV."
        )
    _, channels, sr, bits, _, data_size = _read_header(path)
    return data_size / (channels * (bits // 8)) / sr


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis (host-side, kaiser-windowed)."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    g = gcd(int(orig_sr), int(target_sr))
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(audio.dtype)


def load_audio(
    path: Union[str, Path],
    sr: Optional[int] = None,
    mono: bool = True,
    offset: float = 0.0,
    duration: Optional[float] = None,
    dtype=np.float32,
) -> Tuple[np.ndarray, int]:
    """Load audio with librosa.load-compatible semantics.

    Decodes (a slice of) the file, optionally mixes down to mono (mean of channels)
    and resamples to `sr`. Returns (audio, sr) where mono audio has shape (samples,)
    and multichannel audio has shape (channels, samples).

    WAV decodes natively (seekable, so offset/duration read only that slice);
    MP3 decodes through the system libmpg123 and FLAC through the pure-Python
    decoder (audiblelight_tpu.io.codecs) — both decode fully, then slice.
    The reference loads every format via librosa (reference event.py:520);
    FMA music events are MP3.
    """
    suffix = Path(path).suffix.lower()
    if suffix in (".mp3", ".flac"):
        if suffix == ".mp3":
            from audiblelight_tpu.io.codecs import mp3_read

            audio, file_sr = mp3_read(path)
        else:
            from audiblelight_tpu.io.codecs import flac_read

            audio, file_sr = flac_read(path)
        start = round(offset * file_sr)
        stop = None if duration is None else start + round(duration * file_sr)
        audio = audio[:, start:stop]
    else:
        audio, file_sr = wav_read(path, offset=offset, duration=duration)
    if mono:
        audio = np.mean(audio, axis=0)
    if sr is not None and sr != file_sr:
        audio = resample(audio, file_sr, int(sr))
        file_sr = int(sr)
    return audio.astype(dtype), file_sr


def valid_audio(audio: np.ndarray) -> bool:
    """Validate an audio buffer (librosa.util.valid_audio-equivalent checks)."""
    if not isinstance(audio, np.ndarray):
        raise TypeError(f"Audio data must be a numpy array, got {type(audio)}")
    if not np.issubdtype(audio.dtype, np.floating):
        raise TypeError(f"Audio data must be floating-point, got dtype {audio.dtype}")
    if audio.ndim == 0:
        raise ValueError("Audio data must be at least one-dimensional")
    if not np.isfinite(audio).all():
        raise ValueError("Audio buffer is not finite everywhere")
    return True
