"""Tile pixel codecs — encode/decode the ``bytes`` column of the tile table.

The container ships no image libraries (no PIL / cv2 / imageio), so the
engine carries its own minimal codecs, NumPy + zlib only:

- ``png``  — real PNG (grayscale 8/16-bit, RGB 8-bit): signature + IHDR +
  IDAT(zlib, scanline filters 0-4 on decode, filter 0 on encode) + IEND.
  Lossless → exact pixel parity.
- ``f32``  — raw little-endian float32 grid, zlib-compressed, 8-byte
  header (rows, cols). Lossless for float DEM tiles — the exact-parity
  path for flow accumulation / focal goldens.
- ``q16``  — lossy: float grid affinely quantized to uint16 over
  [min, max], zlib-compressed. Quantization SNR ⪆ 90 dB for smooth
  fields — exercises the PSNR≥40dB acceptance path of BASELINE.json.
- ``jpeg`` — lossy: float grid affinely quantized to uint8 over
  [min, max] (8-byte lo/scale side header) then baseline JFIF via the
  pure-numpy T.81 codec (``kernels/jpeg_codec.py``). Real encode AND
  decode; use for photographic-texture tiles, never for exact-parity
  goldens.

Semantics note: decoded pixel grids keep the reference's nodata SENTINEL
convention (compare ``!=``, never Arrow validity masks) — see
/root/reference/src/raster/mod.rs:364-412 and SURVEY.md §1.6.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_tile", "decode_tile", "png_encode", "png_decode", "psnr"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8/uint16 or (h, w, 3) uint8 array as PNG."""
    if img.ndim == 2:
        color_type = 0
        if img.dtype == np.uint8:
            bit_depth = 8
            raw = img
        elif img.dtype == np.uint16:
            bit_depth = 16
            raw = img.astype(">u2")
        else:
            raise ValueError(f"unsupported gray dtype {img.dtype}")
    elif img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8:
        color_type = 2
        bit_depth = 8
        raw = img
    else:
        raise ValueError(f"unsupported image shape {img.shape} / dtype {img.dtype}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    body = raw.tobytes()
    stride = len(body) // h
    scan = bytearray()
    for r in range(h):
        scan.append(0)  # filter type 0 (None)
        scan += body[r * stride : (r + 1) * stride]
    idat = zlib.compress(bytes(scan), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4. ``scan`` is (h, 1+stride) uint8."""
    ftypes = scan[:, 0]
    if not ftypes.any():  # all filter 0 (what png_encode writes) — no-op
        return np.ascontiguousarray(scan[:, 1:])
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = int(scan[r, 0])
        line = scan[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            out[r] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[r] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right scan
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
            out[r] = cur.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode the subset of PNG produced by :func:`png_encode` (plus any
    filter types and non-interlaced gray/RGB images)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = bit_depth = color_type = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if color_type == 0:
        channels = 1
    elif color_type == 2:
        channels = 3
    else:
        raise ValueError(f"unsupported color type {color_type}")
    bpp = channels * (bit_depth // 8)
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    flat = _unfilter(scan, h, stride, bpp)
    if bit_depth == 8:
        img = flat.reshape(h, w, channels) if channels > 1 else flat.reshape(h, w)
    else:
        img = flat.reshape(h, stride).view(">u2").astype(np.uint16).reshape(h, w)
    return img


# --- tile-level codecs over float64 grids ---


def _f32_encode(grid: np.ndarray) -> bytes:
    # raw little-endian payload: zlib on float mantissas was measured at
    # 2.3 ms/128² tile for a 14% size win — the parquet writer's column
    # compression covers storage, so the hot path ships raw bytes
    h, w = grid.shape
    return struct.pack("<II", h, w) + np.ascontiguousarray(grid, dtype="<f4").tobytes()


def _f32_decode(data: bytes) -> np.ndarray:
    h, w = struct.unpack("<II", data[:8])
    payload = data[8:]
    if len(payload) != h * w * 4:  # legacy zlib-compressed payload
        payload = zlib.decompress(payload)
    return np.frombuffer(payload, dtype="<f4").astype(np.float64).reshape(h, w)


def _q16_encode(grid: np.ndarray) -> bytes:
    # raw quantized payload — zlib on the 16-bit plane was measured to
    # save <2% (high-entropy low bits) at ~1 ms/tile; parquet column
    # compression covers storage
    h, w = grid.shape
    lo = float(np.min(grid))
    hi = float(np.max(grid))
    scale = (hi - lo) / 65535.0 if hi > lo else 1.0
    q = np.round((grid - lo) / scale).astype("<u2")
    return struct.pack("<IIdd", h, w, lo, scale) + q.tobytes()


def _q16_decode(data: bytes) -> np.ndarray:
    h, w, lo, scale = struct.unpack("<IIdd", data[:24])
    payload = data[24:]
    if len(payload) != h * w * 2:  # legacy zlib-compressed payload
        payload = zlib.decompress(payload)
    q = np.frombuffer(payload, dtype="<u2").astype(np.float64)
    return (q * scale + lo).reshape(h, w)


def _i8_encode(grid: np.ndarray) -> bytes:
    h, w = grid.shape
    return struct.pack("<II", h, w) + zlib.compress(grid.astype(np.int8).tobytes(), 1)


def _i8_decode(data: bytes) -> np.ndarray:
    h, w = struct.unpack("<II", data[:8])
    return np.frombuffer(zlib.decompress(data[8:]), dtype=np.int8).reshape(h, w).copy()


def encode_tile(grid: np.ndarray, fmt: str) -> bytes:
    """Encode a float64 (h, w) pixel grid into the tile ``bytes`` payload."""
    if fmt == "f32":
        return _f32_encode(grid)
    if fmt == "f64":
        # exact float64 payload (label grids / large integer ids that
        # exceed f32's 2^24 integer range)
        h, w = grid.shape
        return struct.pack("<II", h, w) + np.ascontiguousarray(grid, dtype="<f8").tobytes()
    if fmt == "i8":
        return _i8_encode(grid)
    if fmt == "q16":
        return _q16_encode(grid)
    if fmt == "png":
        # losslessly store float grids scaled into uint16 with a side header
        lo = float(np.min(grid))
        hi = float(np.max(grid))
        scale = (hi - lo) / 65535.0 if hi > lo else 1.0
        q = np.round((grid - lo) / scale).astype(np.uint16)
        return struct.pack("<dd", lo, scale) + png_encode(q)
    if fmt == "jpeg":
        # LOSSY: grid scaled into uint8 with a side header; baseline
        # JFIF via the pure-numpy codec (kernels/jpeg_codec.py)
        from . import jpeg_codec

        lo = float(np.min(grid))
        hi = float(np.max(grid))
        scale = (hi - lo) / 255.0 if hi > lo else 1.0
        q = np.round((grid - lo) / scale).astype(np.uint8)
        return struct.pack("<dd", lo, scale) + jpeg_codec.jpeg_encode(q, quality=92)
    raise ValueError(f"unknown tile format {fmt!r}")


def decode_tile(data: bytes, fmt: str) -> np.ndarray:
    """Decode a tile payload into a float64 (h, w) grid."""
    if fmt == "f32":
        return _f32_decode(data)
    if fmt == "f64":
        h, w = struct.unpack("<II", data[:8])
        return np.frombuffer(data[8:], dtype="<f8").reshape(h, w).copy()
    if fmt == "i8":
        return _i8_decode(data).astype(np.float64)
    if fmt == "q16":
        return _q16_decode(data)
    if fmt == "png":
        lo, scale = struct.unpack("<dd", data[:16])
        q = png_decode(data[16:]).astype(np.float64)
        return q * scale + lo
    if fmt == "jpeg":
        from . import jpeg_codec

        lo, scale = struct.unpack("<dd", data[:16])
        q = jpeg_codec.jpeg_decode(data[16:]).astype(np.float64)
        return q * scale + lo
    raise ValueError(f"unknown tile format {fmt!r}")


def psnr(ref: np.ndarray, test: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over the ref grid's dynamic range."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    mse = float(np.mean((ref - test) ** 2))
    if mse == 0.0:
        return float("inf")
    peak = float(np.max(ref) - np.min(ref)) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def tile_row_table(tr: int, tc: int, blob: bytes, fmt: str, **extra):
    """One-row tile table in the canonical block shape: Arrow, int32
    keys. Every stage that emits per-tile rows goes through this so
    Ray's schema dedup / operator fusion sees ONE schema across the
    whole pipeline (mixed int32/int64 keys and pandas blocks defeat
    both and spam `unify_schemas` warnings on every reduce)."""
    import pyarrow as pa

    cols = {
        "tile_row": pa.array([int(tr)], pa.int32()),
        "tile_col": pa.array([int(tc)], pa.int32()),
        "bytes": pa.array([blob], pa.binary()),
        "fmt": pa.array([fmt], pa.string()),
    }
    for k, v in extra.items():
        cols[k] = pa.array([v])
    return pa.table(cols)


def tile_table(trs, tcs, blobs, fmts, **extra):
    """Multi-row variant of :func:`tile_row_table` (same canon)."""
    import pyarrow as pa

    cols = {
        "tile_row": pa.array(np.asarray(trs, dtype=np.int32), pa.int32()),
        "tile_col": pa.array(np.asarray(tcs, dtype=np.int32), pa.int32()),
        "bytes": pa.array(list(blobs), pa.binary()),
        "fmt": pa.array(list(fmts), pa.string()),
    }
    for k, v in extra.items():
        cols[k] = pa.array(v)
    return pa.table(cols)
