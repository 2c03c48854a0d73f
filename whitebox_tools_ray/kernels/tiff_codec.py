"""Minimal GeoTIFF codec (classic TIFF 6.0 + BigTIFF read,
little/big-endian, single IFD, stripped or tiled, uncompressed or
Deflate), written from the
public TIFF 6.0 + GeoTIFF 1.1 specifications; tag coverage mirrors what
the reference reader consumes (src/raster/geotiff/mod.rs,
tiff_consts.rs): ImageWidth/Length, BitsPerSample, SampleFormat,
Compression 1/8, Strip/Tile offsets+counts, ModelPixelScale,
ModelTiepoint, GDAL_NODATA.

Sample types: uint8/16/32, int8/16/32, float32/64, single band.
Decode returns float64 grids (the engine's working dtype).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
               11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}


def _read_ifd(buf: bytes, bo: str):
    ifd_off = struct.unpack_from(bo + "I", buf, 4)[0]
    n = struct.unpack_from(bo + "H", buf, ifd_off)[0]
    tags = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, e)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            voff = e + 8
        else:
            voff = struct.unpack_from(bo + "I", buf, e + 8)[0]
        if typ == 2:  # ASCII
            tags[tag] = buf[voff : voff + cnt].split(b"\x00")[0].decode("ascii", "replace")
        elif typ in (5, 10):  # RATIONAL
            vals = struct.unpack_from(bo + f"{2*cnt}" + ("I" if typ == 5 else "i"), buf, voff)
            tags[tag] = [vals[2 * j] / max(vals[2 * j + 1], 1) for j in range(cnt)]
        else:
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                continue
            vals = struct.unpack_from(bo + str(cnt) + fmt, buf, voff)
            tags[tag] = list(vals) if cnt > 1 else vals[0]
    return tags


def _read_ifd_big(buf: bytes, bo: str):
    """BigTIFF (magic 43) IFD reader: 8-byte offsets, 20-byte entries,
    u64 entry count; LONG8/SLONG8/IFD8 types. Mirrors the reference's
    BigTIFF branch (geotiff/mod.rs:50-71)."""
    off_size, zero = struct.unpack_from(bo + "HH", buf, 4)
    if off_size != 8 or zero != 0:
        raise ValueError("Incorrect BigTIFF header. Unsupported bytesize of offsets.")
    ifd_off = struct.unpack_from(bo + "Q", buf, 8)[0]
    n = struct.unpack_from(bo + "Q", buf, ifd_off)[0]
    tags = {}
    for i in range(n):
        e = ifd_off + 8 + 20 * i
        tag, typ = struct.unpack_from(bo + "HH", buf, e)
        cnt = struct.unpack_from(bo + "Q", buf, e + 4)[0]
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 8:
            voff = e + 12
        else:
            voff = struct.unpack_from(bo + "Q", buf, e + 12)[0]
        if typ == 2:  # ASCII
            tags[tag] = buf[voff : voff + cnt].split(b"\x00")[0].decode("ascii", "replace")
        elif typ in (5, 10):  # RATIONAL
            vals = struct.unpack_from(bo + f"{2*cnt}" + ("I" if typ == 5 else "i"), buf, voff)
            tags[tag] = [vals[2 * j] / max(vals[2 * j + 1], 1) for j in range(cnt)]
        else:
            fmt = _TYPE_FMT.get(typ)
            if fmt is None:
                continue
            vals = struct.unpack_from(bo + str(cnt) + fmt, buf, voff)
            tags[tag] = list(vals) if cnt > 1 else vals[0]
    return tags


def _sample_dtype(bits: int, fmt: int, bo: str) -> np.dtype:
    e = "<" if bo == "<" else ">"
    if fmt == 3:
        return np.dtype(e + {32: "f4", 64: "f8"}[bits])
    if fmt == 2:
        return np.dtype(e + {8: "i1", 16: "i2", 32: "i4"}[bits])
    return np.dtype(e + {8: "u1", 16: "u2", 32: "u4"}[bits])


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-flavour LZW (TIFF6 §13): MSB-first variable-width codes
    starting at 9 bits, ClearCode=256, EOI=257, 'early change' width
    bumps at next_code == 2^w - 1."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = 258
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width and pos < n:
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        if nbits < width:
            break
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            next_code = 258
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if not table:
            raise ValueError("LZW stream must start with a Clear code")
        if code < next_code:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            next_code += 1
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry at read time, so it widens at
        # 2^w - 2 where the (libtiff) encoder widens at 2^w - 1
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-flavour LZW encoder (TIFF6 §13), the inverse of
    ``_lzw_decode``: MSB-first variable-width codes from 9 bits,
    ClearCode=256, EOI=257, encoder-side 'early change' width bump when
    the next free code reaches 2^w - 1, table reset at 4094 entries.
    The reference writes LZW output (raster/geotiff/mod.rs); round-trip
    compatibility is pinned against this repo's decoder, which itself
    is pinned bit-exact against the reference's shipped LZW files."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict[tuple[int, int], int] = {}
    next_code = 258
    emit(CLEAR)
    prev = -1
    for b in data:
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR)
            table.clear()
            next_code = 258
            width = 9
        prev = b
    if prev >= 0:
        emit(prev)
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF6 §9)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # h+1 literals
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def parse_geotiff(buf: bytes) -> dict:
    """Parse one GeoTIFF → {"grid": float64 2-D array, "meta": dict}.

    meta: nodata (float | None), pixel_scale (sx, sy) | None,
    tiepoint (i, j, k, x, y, z) | None — the raster-space→model-space
    anchor GeoTIFF uses for the north-west corner."""
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    magic = struct.unpack_from(bo + "H", buf, 2)[0]
    if magic == 43:
        tags = _read_ifd_big(buf, bo)  # BigTIFF (geotiff/mod.rs:50-71)
    elif magic == 42:
        tags = _read_ifd(buf, bo)
    else:
        raise ValueError("not a TIFF file (bad magic)")
    width = int(tags[256])
    height = int(tags[257])
    bits_t = tags.get(258, 8)
    bits = int(bits_t[0] if isinstance(bits_t, list) else bits_t)
    comp = int(tags.get(259, 1))
    spp = int(tags.get(277, 1))
    fmt_t = tags.get(339, 1)
    fmt = int(fmt_t[0] if isinstance(fmt_t, list) else fmt_t)
    planar = int(tags.get(284, 1))
    if spp not in (1, 3, 4) or (spp > 1 and (planar != 1 or bits != 8)):
        raise NotImplementedError(
            "GeoTIFF bands: single-band any depth, or chunky 8-bit RGB/RGBA "
            f"(got spp={spp}, planar={planar}, bits={bits})"
        )
    if comp not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"compression {comp} not supported (none/LZW/deflate/PackBits only)"
        )
    predictor = int(tags.get(317, 1))
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported (1/2 only)")
    if predictor == 2 and fmt == 3:
        raise NotImplementedError("predictor 2 applies to integer data only")
    dt = _sample_dtype(bits, fmt, bo)

    def _unpredict(rows2d: np.ndarray) -> np.ndarray:
        # horizontal differencing (tag 317=2): cumulative sum per row in
        # the sample's unsigned width with wraparound, then re-typed.
        # Multi-sample pixels difference per channel (stride = spp).
        if predictor != 2:
            return rows2d
        u = rows2d.view(f"u{rows2d.dtype.itemsize}")
        if spp > 1:
            h = u.shape[0]
            ch = u.reshape(h, -1, spp)
            acc = np.cumsum(ch.astype(np.uint64), axis=1) & ((1 << bits) - 1)
            return acc.astype(u.dtype).reshape(h, -1).view(rows2d.dtype)
        acc = np.cumsum(u.astype(np.uint64), axis=1) & ((1 << bits) - 1)
        return acc.astype(u.dtype).view(rows2d.dtype)

    def _pack_rgba(rows3d: np.ndarray) -> np.ndarray:
        # reference parity (geotiff/mod.rs:1299-1355): in-memory RGB(A)
        # value = a<<24 | b<<16 | g<<8 | r, stored in the f64 grid
        r = rows3d[..., 0].astype(np.int64)
        g = rows3d[..., 1].astype(np.int64)
        b = rows3d[..., 2].astype(np.int64)
        a = rows3d[..., 3].astype(np.int64) if rows3d.shape[-1] == 4 else np.full_like(r, 255)
        return ((a << 24) | (b << 16) | (g << 8) | r).astype(np.float64)

    def blocks(offsets, counts):
        for off, cnt in zip(offsets, counts):
            chunk = buf[off : off + cnt]
            if comp in (8, 32946):
                chunk = zlib.decompress(chunk)
            elif comp == 5:
                chunk = _lzw_decode(chunk)
            elif comp == 32773:
                chunk = _packbits_decode(chunk)
            yield np.frombuffer(chunk, dtype=dt)

    grid = np.empty((height, width), dtype=np.float64)
    if 322 in tags:  # tiled
        tw, th = int(tags[322]), int(tags[323])
        offs = tags[324] if isinstance(tags[324], list) else [tags[324]]
        cnts = tags[325] if isinstance(tags[325], list) else [tags[325]]
        tiles_across = (width + tw - 1) // tw
        for idx, data in enumerate(blocks(offs, cnts)):
            tr, tc = idx // tiles_across, idx % tiles_across
            tile = _unpredict(data[: tw * th * spp].reshape(th, tw * spp))
            if spp > 1:
                tile = _pack_rgba(tile.reshape(th, tw, spp))
            r0, c0 = tr * th, tc * tw
            h = min(th, height - r0)
            w = min(tw, width - c0)
            grid[r0 : r0 + h, c0 : c0 + w] = tile[:h, :w]
    else:  # stripped
        rps = int(tags.get(278, height))
        offs = tags[273] if isinstance(tags[273], list) else [tags[273]]
        cnts = tags[279] if isinstance(tags[279], list) else [tags[279]]
        r0 = 0
        for data in blocks(offs, cnts):
            h = min(rps, height - r0)
            rows = _unpredict(data[: h * width * spp].reshape(h, width * spp))
            if spp > 1:
                rows = _pack_rgba(rows.reshape(h, width, spp))
            grid[r0 : r0 + h] = rows
            r0 += h
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            pass
    return {
        "grid": grid,
        "meta": {
            "width": width,
            "height": height,
            "samples_per_pixel": spp,
            "nodata": nodata,
            "pixel_scale": tuple(tags[33550][:2]) if 33550 in tags else None,
            "tiepoint": tuple(tags[33922][:6]) if 33922 in tags else None,
        },
    }


def write_geotiff(
    grid: np.ndarray,
    nodata: float | None = None,
    pixel_scale: tuple | None = None,
    tiepoint: tuple | None = None,
    dtype: str = "f4",
    compress: bool | str = True,
    bigtiff: bool | None = None,
) -> bytes:
    """Serialize one grid → classic little-endian GeoTIFF (one strip per
    64 rows). ``compress``: "lzw" (the reference's write codec,
    raster/geotiff/mod.rs), "deflate" (or True, the legacy default),
    or False/None for uncompressed. ``bigtiff``: True forces the
    BigTIFF (magic 43) layout — 8-byte offsets, 20-byte IFD entries,
    LONG8 strip offsets/counts; None (default) auto-selects it when
    the payload would overflow classic TIFF's u32 offsets.

    ``dtype`` "u1/u2/u4/i1/i2/i4/f4/f8" writes a single band;
    "rgb8"/"rgba8" writes chunky 8-bit RGB(A) from the packed-composite
    f64 grid (a<<24|b<<16|g<<8|r — the reference's in-memory RGB encoding,
    geotiff/mod.rs:1299-1355), the inverse of what parse_geotiff returns
    for multi-band files."""
    height, width = grid.shape
    rps = 64
    if dtype in ("rgb8", "rgba8"):
        spp = 3 if dtype == "rgb8" else 4
        # cells never covered by a tile arrive as NaN from the sheet
        # initialiser; NaN→int64 is undefined (INT64_MIN → garbage RGB
        # bytes), so map them to packed 0 (transparent black) first
        v = np.nan_to_num(np.ascontiguousarray(grid), nan=0.0).astype(np.int64)
        chans = [(v & 0xFF), ((v >> 8) & 0xFF), ((v >> 16) & 0xFF)]
        if spp == 4:
            chans.append((v >> 24) & 0xFF)
        data = np.stack(chans, axis=-1).astype(np.uint8).reshape(height, width * spp)
        fmt, bits = 1, 8
    else:
        spp = 1
        dt = np.dtype("<" + dtype)
        data = np.ascontiguousarray(grid, dtype=dt)
        fmt = 3 if dt.kind == "f" else (2 if dt.kind == "i" else 1)
        bits = dt.itemsize * 8
    if compress is True:
        compress = "deflate"
    if compress not in ("deflate", "lzw", False, None):
        raise ValueError(f"compress must be 'deflate', 'lzw' or falsy, got {compress!r}")
    comp_tag = {"deflate": 8, "lzw": 5}.get(compress, 1)
    strips = []
    for r0 in range(0, height, rps):
        raw = data[r0 : r0 + rps].tobytes()
        if compress == "deflate":
            raw = zlib.compress(raw, 6)
        elif compress == "lzw":
            raw = _lzw_encode(raw)
        strips.append(raw)

    entries = []  # (tag, type, count, packed-value or bytes-to-place)
    extra = bytearray()  # out-of-line values, offsets fixed later

    def entry(tag, typ, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        cnt = len(values)
        fmt_ch = _TYPE_FMT[typ]
        size = _TYPE_SIZES[typ] * cnt
        packed = struct.pack("<" + str(cnt) + fmt_ch, *values)
        entries.append([tag, typ, cnt, packed])

    if bigtiff is None:
        bigtiff = sum(len(s) for s in strips) + 65536 > 0xFFFFFFFF
    off_typ = 16 if bigtiff else 4  # LONG8 in BigTIFF
    off_fmt = "Q" if bigtiff else "I"

    nod_str = None
    entry(256, 4, width)
    entry(257, 4, height)
    entry(258, 3, [bits] * spp)
    entry(259, 3, comp_tag)
    entry(262, 3, 2 if spp > 1 else 1)  # RGB / BlackIsZero
    entry(273, off_typ, [0] * len(strips))  # placeholder strip offsets
    entry(277, 3, spp)
    entry(278, 4, rps)
    entry(279, off_typ, [len(s) for s in strips])
    if spp == 4:
        entry(338, 3, 2)  # ExtraSamples: unassociated alpha
    entry(339, 3, [fmt] * spp)
    if pixel_scale is not None:
        entry(33550, 12, [float(pixel_scale[0]), float(pixel_scale[1]), 0.0])
    if tiepoint is not None:
        entry(33922, 12, [float(v) for v in tiepoint])
    if nodata is not None:
        nod_str = (repr(float(nodata)) + "\x00").encode("ascii")
        entries.append([42113, 2, len(nod_str), nod_str])
    entries.sort(key=lambda e: e[0])

    if bigtiff:
        header = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
        ifd_size = 8 + 20 * len(entries) + 8
        data_start = 16 + ifd_size
        inline_cap = 8
    else:
        header = struct.pack("<2sHI", b"II", 42, 8)
        ifd_size = 2 + 12 * len(entries) + 4
        data_start = 8 + ifd_size
        inline_cap = 4
    # lay out out-of-line entry values first, then strip data
    pos = data_start
    placed = []
    for tag, typ, cnt, packed in entries:
        if len(packed) > inline_cap:
            placed.append((tag, typ, cnt, None, pos, packed))
            pos += len(packed)
        else:
            placed.append((tag, typ, cnt, packed.ljust(inline_cap, b"\x00"), None, packed))
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    # patch the strip-offset entry now that positions are known
    so_packed = struct.pack("<" + str(len(strips)) + off_fmt, *strip_offsets)
    for i, (tag, typ, cnt, inline, off, packed) in enumerate(placed):
        if tag == 273:
            if len(so_packed) > inline_cap:
                placed[i] = (tag, typ, cnt, None, off, so_packed)
            else:
                placed[i] = (tag, typ, cnt, so_packed.ljust(inline_cap, b"\x00"), None, so_packed)

    out = bytearray(header)
    out += struct.pack("<Q" if bigtiff else "<H", len(entries))
    for tag, typ, cnt, inline, off, packed in placed:
        if bigtiff:
            if inline is not None:
                out += struct.pack("<HHQ", tag, typ, cnt) + inline
            else:
                out += struct.pack("<HHQQ", tag, typ, cnt, off)
        else:
            if inline is not None:
                out += struct.pack("<HHI", tag, typ, cnt) + inline
            else:
                out += struct.pack("<HHII", tag, typ, cnt, off)
    out += struct.pack("<Q" if bigtiff else "<I", 0)  # no next IFD
    for tag, typ, cnt, inline, off, packed in placed:
        if inline is None:
            assert len(out) == off, (len(out), off, tag)
            out += packed
    for s in strips:
        out += s
    return bytes(out)
