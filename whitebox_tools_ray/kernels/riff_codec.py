"""Pure-numpy RIFF container codecs: PCM/float WAV audio and
MJPEG-in-AVI video.

Together with ``jpeg_codec.py`` these make the multimodal audio/video
plumbing REAL for the formats a container without media libraries can
honestly support: uncompressed WAV (8/16/24/32-bit PCM + IEEE float)
and Motion-JPEG AVI (every frame is a baseline JPEG). Compressed audio
(MP3/AAC) and inter-frame video (H.264& co) remain out of scope and
raise with the library that would provide them.

Both parsers walk the RIFF chunk tree generically (chunk id + u32le
size + word-aligned payload), so files from standard writers parse —
not just this module's own output.
"""
from __future__ import annotations

import struct

import numpy as np


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) within [start, end)."""
    pos = start
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


# --- WAV ----------------------------------------------------------------------


def parse_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono float64 samples in [-1, 1], sample_rate).

    Multi-channel input mixes down to mono (channel mean). Supports
    PCM (format 1: u8 / i16 / i24 / i32) and IEEE float (format 3:
    f32 / f64); anything else (MP3-in-WAV etc.) raises."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    fmt_off = fmt_size = 0
    data = None
    for cid, off, size in _chunks(buf, 12, len(buf)):
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", buf, off)
            fmt_off, fmt_size = off, size
        elif cid == b"data":
            data = buf[off : off + size]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, _align, bits = fmt
    if audio_fmt == 0xFFFE and fmt_size >= 26:
        # WAVE_FORMAT_EXTENSIBLE: real tag = first u16 of SubFormat GUID
        audio_fmt = struct.unpack_from("<H", buf, fmt_off + 24)[0]
    if audio_fmt == 1:  # PCM
        if bits == 8:
            x = np.frombuffer(data, np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8).reshape(-1, 3)
            x = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} needs an audio library (only "
            "PCM/IEEE-float are supported without one)"
        )
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, int(rate)


def write_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Mono float samples in [-1, 1] → 16-bit PCM (or f32) WAV bytes."""
    x = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        data = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2").tobytes()
        fmt_tag, bps = 1, 2
    elif bits == 32:
        data = x.astype("<f4").tobytes()
        fmt_tag, bps = 3, 4
    else:
        raise ValueError("write_wav supports bits=16 (PCM) or 32 (float)")
    fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate * bps, bps, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- MJPEG AVI ----------------------------------------------------------------


def parse_avi_mjpeg(buf: bytes) -> list[bytes]:
    """AVI bytes → list of JPEG frame payloads (compressed video chunks
    '##dc'/'##db' inside LIST 'movi'). Decode each with
    ``jpeg_codec.jpeg_decode``. Raises if no movi list is present."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    frames: list[bytes] = []

    def walk(start: int, end: int):
        for cid, off, size in _chunks(buf, start, end):
            if cid == b"LIST":
                ltype = buf[off : off + 4]
                if ltype in (b"movi", b"hdrl", b"strl", b"rec "):
                    walk(off + 4, off + size)
            elif cid[2:4] in (b"dc", b"db") and size > 2:
                if buf[off : off + 2] == b"\xff\xd8":  # JPEG SOI
                    frames.append(buf[off : off + size])

    walk(12, len(buf))
    if not frames:
        raise ValueError("AVI contains no MJPEG frames (non-MJPEG codecs "
                         "need ffmpeg/pyav)")
    return frames


def write_avi_mjpeg(frames: list[bytes], width: int, height: int,
                    fps: int = 25) -> bytes:
    """JPEG frame payloads → minimal spec-shaped MJPEG AVI (avih +
    strl/strh/strf headers + movi 00dc chunks)."""
    n = len(frames)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), 0, 0, 0x10, n, 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, n, 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
