"""Compressed-audio codecs: MP3 via system libmpg123/libmp3lame, FLAC in Python.

The reference loads any format through librosa/libsndfile (reference event.py:520);
the FMA music corpus it targets is MP3. Neither librosa nor ffmpeg exists in this
environment, so:

- MP3 decode binds the system `libmpg123` shared library over ctypes (no pip
  package involved); encode (used by round-trip tests, and handy for dataset
  export) binds `libmp3lame` the same way. Both gate cleanly: `mp3_available()`
  is False and loaders raise a clear error when the libraries are absent.
- FLAC is decoded by a self-contained pure-Python implementation of the format
  (bit reader, STREAMINFO, fixed/LPC subframes, Rice residuals, stereo
  decorrelation) — no native dependency at all. A verbatim-mode encoder
  (`flac_write`) provides lossless round-trips.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Tuple, Union

import numpy as np

# ---------------------------------------------------------------------------
# MP3 decode: libmpg123 over ctypes
# ---------------------------------------------------------------------------

_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_ENC_SIGNED_16 = 0xD0  # MPG123_ENC_16 | MPG123_ENC_SIGNED | 0x80

_mpg123 = None
_mpg123_failed = False


def _load_mpg123():
    global _mpg123, _mpg123_failed
    if _mpg123 is not None or _mpg123_failed:
        return _mpg123
    try:
        lib = ctypes.CDLL("libmpg123.so.0")
    except OSError:
        _mpg123_failed = True
        return None
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
    lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.mpg123_getformat.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
    lib.mpg123_format.argtypes = [
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.mpg123_read.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.mpg123_scan.argtypes = [ctypes.c_void_p]
    lib.mpg123_length.argtypes = [ctypes.c_void_p]
    lib.mpg123_length.restype = ctypes.c_long
    lib.mpg123_close.argtypes = [ctypes.c_void_p]
    lib.mpg123_delete.argtypes = [ctypes.c_void_p]
    _mpg123 = lib
    return lib


def mp3_available() -> bool:
    """True when the system libmpg123 can be loaded for MP3 decoding."""
    return _load_mpg123() is not None


def mp3_read(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Decode an MP3 file to float32. Returns ((channels, samples), sample_rate)."""
    lib = _load_mpg123()
    if lib is None:
        raise RuntimeError(
            "MP3 decoding requires the system libmpg123 shared library, which "
            "could not be loaded. Convert the file to WAV instead."
        )
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed (code {err.value})")
    try:
        if lib.mpg123_open(h, str(path).encode()) != _MPG123_OK:
            raise RuntimeError(f"mpg123 could not open {path}")
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        if lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(channels), ctypes.byref(enc)) != _MPG123_OK:
            raise RuntimeError(f"mpg123 could not read the format of {path}")
        # Decode in the universally supported SIGNED_16 output (post-open format
        # forcing does not renegotiate an already-open stream) and convert —
        # the same precision as a 16-bit WAV pipeline.
        if enc.value != _MPG123_ENC_SIGNED_16:
            lib.mpg123_format_none(h)
            lib.mpg123_format(h, rate.value, channels.value, _MPG123_ENC_SIGNED_16)

        chunks = []
        buf = ctypes.create_string_buffer(1 << 18)
        done = ctypes.c_size_t(0)
        while True:
            rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(np.frombuffer(buf.raw[: done.value], dtype=np.int16).copy())
            if rc == _MPG123_DONE:
                break
            if rc == _MPG123_NEW_FORMAT:
                # Mid-stream renegotiation: re-query and reject a changed
                # rate/channel count instead of deinterleaving the remainder
                # with the stale layout (garbled channels / wrong rate).
                new_rate = ctypes.c_long(0)
                new_ch = ctypes.c_int(0)
                new_enc = ctypes.c_int(0)
                lib.mpg123_getformat(
                    h, ctypes.byref(new_rate), ctypes.byref(new_ch), ctypes.byref(new_enc)
                )
                if (new_rate.value, new_ch.value) != (rate.value, channels.value):
                    raise RuntimeError(
                        f"MP3 stream {path} changed format mid-stream "
                        f"({rate.value} Hz x {channels.value}ch -> "
                        f"{new_rate.value} Hz x {new_ch.value}ch); refusing to "
                        "decode a mixed-format stream."
                    )
                continue
            if rc != _MPG123_OK:
                raise RuntimeError(f"mpg123_read failed with code {rc} on {path}")
        flat = np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int16)
        n = flat.size // channels.value
        audio = flat[: n * channels.value].reshape(n, channels.value).T
        return np.ascontiguousarray(audio).astype(np.float32) / 32768.0, int(rate.value)
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


def mp3_duration(path: Union[str, Path]) -> float:
    """Duration of an MP3 file in seconds (frame scan, no full decode)."""
    lib = _load_mpg123()
    if lib is None:
        raise RuntimeError("MP3 support requires the system libmpg123 library.")
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    try:
        if lib.mpg123_open(h, str(path).encode()) != _MPG123_OK:
            raise RuntimeError(f"mpg123 could not open {path}")
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(channels), ctypes.byref(enc))
        lib.mpg123_scan(h)
        n = lib.mpg123_length(h)
        if n < 0:
            raise RuntimeError(f"mpg123 could not determine the length of {path}")
        return float(n) / float(rate.value)
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


# ---------------------------------------------------------------------------
# MP3 encode: libmp3lame over ctypes
# ---------------------------------------------------------------------------

_lame = None
_lame_failed = False


def _load_lame():
    global _lame, _lame_failed
    if _lame is not None or _lame_failed:
        return _lame
    try:
        lib = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        _lame_failed = True
        return None
    lib.lame_init.restype = ctypes.c_void_p
    for fn in ("lame_set_in_samplerate", "lame_set_num_channels", "lame_set_brate", "lame_set_quality"):
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lame_init_params.argtypes = [ctypes.c_void_p]
    lib.lame_encode_buffer_ieee_float.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.lame_close.argtypes = [ctypes.c_void_p]
    _lame = lib
    return lib


def mp3_encode_available() -> bool:
    """True when the system libmp3lame can be loaded for MP3 encoding."""
    return _load_lame() is not None


def mp3_write(
    path: Union[str, Path], audio: np.ndarray, sr: int, bitrate_kbps: int = 192
) -> None:
    """Encode float32 audio ((channels, samples) or (samples,)) as MP3."""
    lib = _load_lame()
    if lib is None:
        raise RuntimeError("MP3 encoding requires the system libmp3lame library.")
    audio = np.atleast_2d(np.asarray(audio, dtype=np.float32))
    if audio.shape[0] > 2:
        raise ValueError(f"MP3 supports at most 2 channels, got {audio.shape[0]}")
    n = audio.shape[1]
    left = np.ascontiguousarray(audio[0])
    right = np.ascontiguousarray(audio[1] if audio.shape[0] == 2 else audio[0])

    h = lib.lame_init()
    try:
        lib.lame_set_in_samplerate(h, int(sr))
        lib.lame_set_num_channels(h, audio.shape[0])
        lib.lame_set_brate(h, int(bitrate_kbps))
        lib.lame_set_quality(h, 2)
        if lib.lame_init_params(h) < 0:
            raise RuntimeError(f"lame_init_params rejected sr={sr}")
        out = ctypes.create_string_buffer(int(1.25 * n) + 7200)
        written = lib.lame_encode_buffer_ieee_float(
            h,
            left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n,
            out,
            len(out),
        )
        if written < 0:
            raise RuntimeError(f"lame encode failed with code {written}")
        tail = ctypes.create_string_buffer(7200)
        flushed = lib.lame_encode_flush(h, tail, len(tail))
        with open(path, "wb") as f:
            f.write(out.raw[:written])
            f.write(tail.raw[:flushed])
    finally:
        lib.lame_close(h)


# ---------------------------------------------------------------------------
# FLAC: pure-Python decoder + verbatim encoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over a bytes object."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # position in bits

    def read(self, n: int) -> int:
        """Read n bits as an unsigned integer."""
        end = self.pos + n
        # Gather the bytes that cover [pos, end)
        first = self.pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        shift = (last << 3) - end
        val = (chunk >> shift) & ((1 << n) - 1)
        self.pos = end
        return val

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count zero bits until the terminating 1."""
        count = 0
        # Fast path: scan byte-at-a-time
        while True:
            bit_in_byte = self.pos & 7
            byte = self.data[self.pos >> 3]
            rest = byte & (0xFF >> bit_in_byte)
            if rest == 0:
                count += 8 - bit_in_byte
                self.pos += 8 - bit_in_byte
                continue
            lead = rest.bit_length()
            zeros = (8 - bit_in_byte) - lead
            count += zeros
            self.pos += zeros + 1
            return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_coded_number(br: _BitReader) -> int:
    """FLAC frame-header sample/frame number (UTF-8-style variable length)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    mask = 0x40
    while b0 & mask:
        n_follow += 1
        mask >>= 1
    val = b0 & (mask - 1)
    for _ in range(n_follow):
        val = (val << 6) | (br.read(8) & 0x3F)
    return val


_FLAC_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_FLAC_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_BIT_DEPTHS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _decode_residual(br: _BitReader, block_size: int, pred_order: int) -> np.ndarray:
    """Rice-coded residual partitions (both 4- and 5-bit parameter methods)."""
    method = br.read(2)
    if method > 1:
        raise ValueError(f"Reserved FLAC residual coding method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    out = np.empty(block_size - pred_order, dtype=np.int64)
    idx = 0
    for p in range(n_parts):
        n = (block_size >> part_order) - (pred_order if p == 0 else 0)
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            for i in range(n):
                out[idx + i] = br.read_signed(raw_bits) if raw_bits else 0
        else:
            for i in range(n):
                q = br.read_unary()
                r = br.read(param) if param else 0
                v = (q << param) | r
                out[idx + i] = (v >> 1) ^ -(v & 1)  # zigzag
        idx += n
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("Invalid FLAC subframe sync bit")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted

    if sf_type == 0:  # CONSTANT
        v = br.read_signed(bps)
        samples = np.full(block_size, v, dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        samples = np.array([br.read_signed(bps) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = 0
            for k, ck in enumerate(coeffs):
                pred += ck * samples[i - 1 - k]
            samples[i] = resid[i - order] + pred
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("Invalid FLAC LPC precision")
        shift = br.read_signed(5)
        coeffs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        samples = np.empty(block_size, dtype=np.int64)
        samples[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for k in range(order):
                pred += coeffs[k] * samples[i - 1 - k]
            samples[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"Reserved FLAC subframe type {sf_type}")

    if wasted:
        samples <<= wasted
    return samples


def flac_read(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file to float32. Returns ((channels, samples), sample_rate).

    Self-contained implementation of the FLAC format (RFC 9639): metadata
    blocks, frame headers, constant/verbatim/fixed/LPC subframes, Rice
    residuals and stereo decorrelation. CRCs are not verified (files are
    trusted local assets).
    """
    data = Path(path).read_bytes()
    if data[:4] != b"fLaC":
        raise ValueError(f"{path} is not a FLAC file")

    # --- metadata blocks ---------------------------------------------------
    pos = 4
    streaminfo = None
    while True:
        header = data[pos]
        is_last = header & 0x80
        btype = header & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = data[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if is_last:
            break
    if streaminfo is None:
        raise ValueError("FLAC file has no STREAMINFO block")

    si = _BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)  # min frame size
    si.read(24)  # max frame size
    sample_rate = si.read(20)
    n_channels = si.read(3) + 1
    bps_si = si.read(5) + 1
    total_samples = si.read(36)

    # --- frames ------------------------------------------------------------
    channels = [[] for _ in range(n_channels)]
    br = _BitReader(data, pos)
    n_bytes = len(data)
    decoded = 0
    while br.byte_pos() < n_bytes - 2 and (total_samples == 0 or decoded < total_samples):
        if br.read(14) != 0x3FFE:
            raise ValueError(f"Lost FLAC frame sync at byte {br.byte_pos()}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bd_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_coded_number(br)

        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _FLAC_BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = _FLAC_BIT_DEPTHS.get(bd_code, bps_si)
        br.read(8)  # header CRC-8 (unverified)

        if ch_code < 8:
            if ch_code + 1 != n_channels:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_decode_subframe(br, block_size, bps) for _ in range(n_channels)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, block_size, bps + 1)
            right = _decode_subframe(br, block_size, bps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            left = ((mid << 1) | (side & 1)) + side
            subs = [left >> 1, (left - (side << 1)) >> 1]
        else:
            raise ValueError(f"Reserved FLAC channel assignment {ch_code}")

        br.align()
        br.read(16)  # frame CRC-16 (unverified)
        for c, s in enumerate(subs):
            channels[c].append(s)
        decoded += block_size

    arrs = [np.concatenate(c) if c else np.zeros(0, dtype=np.int64) for c in channels]
    if total_samples:
        arrs = [a[:total_samples] for a in arrs]
    scale = float(1 << (bps_si - 1))
    audio = np.stack(arrs).astype(np.float32) / scale
    return audio, int(sample_rate)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def flac_write(path: Union[str, Path], audio: np.ndarray, sr: int, bps: int = 16) -> None:
    """Write float32 audio ((channels, samples) or (samples,)) as a FLAC file.

    Uses verbatim subframes (lossless, uncompressed payload inside a fully
    valid FLAC container with correct CRCs) — enough for exact round-trips and
    interchange; real compression is the decoder's concern, not the tests'.
    """
    audio = np.atleast_2d(np.asarray(audio))
    n_ch, n = audio.shape
    if not 1 <= n_ch <= 8:
        raise ValueError(f"FLAC supports 1-8 channels, got {n_ch}")
    q = np.clip(np.round(audio * (1 << (bps - 1))), -(1 << (bps - 1)), (1 << (bps - 1)) - 1).astype(np.int64)

    block = 4096
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.bytes() + bytes(16)  # zero MD5 (unset)
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for fi, start in enumerate(range(0, n, block)):
        bs = min(block, n - start)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed block size
        bw.write(7, 4)  # 16-bit block size follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        bw.write(n_ch - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        # frame number, UTF-8 coded
        if fi < 0x80:
            bw.write(fi, 8)
        elif fi < 0x800:
            bw.write(0xC0 | (fi >> 6), 8)
            bw.write(0x80 | (fi & 0x3F), 8)
        else:
            bw.write(0xE0 | (fi >> 12), 8)
            bw.write(0x80 | ((fi >> 6) & 0x3F), 8)
            bw.write(0x80 | (fi & 0x3F), 8)
        bw.write(bs - 1, 16)
        bw.align()
        header = bw.bytes()
        header += bytes([_crc8(header)])

        body = _BitWriter()
        for c in range(n_ch):
            body.write(0, 1)
            body.write(1, 6)  # VERBATIM
            body.write(0, 1)  # no wasted bits
            for v in q[c, start : start + bs]:
                body.write(int(v), bps)
        body.align()
        frame = header + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame

    Path(path).write_bytes(bytes(out))


def flac_duration(path: Union[str, Path]) -> float:
    """Duration of a FLAC file in seconds, from STREAMINFO only."""
    with open(path, "rb") as f:
        if f.read(4) != b"fLaC":
            raise ValueError(f"{path} is not a FLAC file")
        header = f.read(4)
        length = int.from_bytes(header[1:4], "big")
        si = _BitReader(f.read(length))
    si.read(16 + 16 + 24 + 24)
    sample_rate = si.read(20)
    si.read(3)
    si.read(5)
    total = si.read(36)
    if sample_rate == 0:
        raise ValueError(f"FLAC STREAMINFO of {path} has no sample rate")
    return total / sample_rate
