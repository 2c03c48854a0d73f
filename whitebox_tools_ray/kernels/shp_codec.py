"""Minimal ESRI Shapefile (.shp) + dBASE III (.dbf) codec, written from
the public ESRI Shapefile Technical Description (July 1998 white paper);
the parts/points geometry layout matches the reference reader
(src/vector/shapefile/geometry.rs:13-30 — flat point array + part start
indices) and the attribute handling matches
src/vector/shapefile/attributes.rs (C/N/F/L/D field types).

Supported shape types: 1 Point, 3 PolyLine, 5 Polygon, 8 MultiPoint,
11/13/15 Z-variants (Z read, M ignored). All parsing is offset-driven
``np.frombuffer`` slices — no Python per-vertex loops.
"""

from __future__ import annotations

import struct

import numpy as np

SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8

_Z_BASE = {11: 1, 13: 3, 15: 5, 18: 8}


def parse_shp(buf: bytes) -> dict:
    """Parse one .shp → {"shape_type": int, "records": [dict]}.

    Each record: record_id (1-based, the shapefile record number),
    xs/ys float64 arrays, parts int32 start indices (poly types),
    bbox (x_min, y_min, x_max, y_max). Null shapes (type 0) are
    skipped, matching the reference reader."""
    if struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile (file code != 9994)")
    file_len = struct.unpack_from(">i", buf, 24)[0] * 2  # 16-bit words
    shape_type = struct.unpack_from("<i", buf, 32)[0]
    records = []
    pos = 100
    while pos < min(file_len, len(buf)):
        rec_num = struct.unpack_from(">i", buf, pos)[0]
        content_len = struct.unpack_from(">i", buf, pos + 4)[0] * 2
        p = pos + 8
        pos = p + content_len
        stype = struct.unpack_from("<i", buf, p)[0]
        if stype == 0:  # null shape
            continue
        base = _Z_BASE.get(stype, stype)
        p += 4
        if base == SHAPE_POINT:
            x, y = struct.unpack_from("<2d", buf, p)
            records.append(
                {
                    "record_id": rec_num,
                    "xs": np.array([x]), "ys": np.array([y]),
                    "parts": np.array([0], dtype=np.int32),
                    "bbox": (x, y, x, y),
                }
            )
            continue
        bbox = struct.unpack_from("<4d", buf, p)  # x_min y_min x_max y_max
        p += 32
        if base == SHAPE_MULTIPOINT:
            n_pts = struct.unpack_from("<i", buf, p)[0]
            p += 4
            parts = np.array([0], dtype=np.int32)
        else:
            n_parts, n_pts = struct.unpack_from("<2i", buf, p)
            p += 8
            parts = np.frombuffer(buf, dtype="<i4", count=n_parts, offset=p).astype(np.int32)
            p += 4 * n_parts
        xy = np.frombuffer(buf, dtype="<f8", count=2 * n_pts, offset=p).reshape(n_pts, 2)
        p += 16 * n_pts
        rec = {
            "record_id": rec_num,
            "xs": xy[:, 0].copy(), "ys": xy[:, 1].copy(),
            "parts": parts,
            "bbox": bbox,
        }
        if stype in _Z_BASE:  # z range + z values follow
            p += 16
            rec["zs"] = np.frombuffer(buf, dtype="<f8", count=n_pts, offset=p).copy()
        records.append(rec)
    return {"shape_type": shape_type, "records": records}


def parse_dbf(buf: bytes) -> dict:
    """Parse one .dbf → {"fields": [(name, type, len, dec)], "columns":
    {name: list}}. N/F → float (int when dec==0 and parseable), L →
    bool, D/C → str. Deleted records ('*' flag) are skipped."""
    n_rec = struct.unpack_from("<I", buf, 4)[0]
    header_size = struct.unpack_from("<H", buf, 8)[0]
    rec_size = struct.unpack_from("<H", buf, 10)[0]
    fields = []
    fp = 32
    while fp < header_size - 1 and buf[fp] != 0x0D:
        raw_name = buf[fp : fp + 11].split(b"\x00")[0]
        ftype = chr(buf[fp + 11])
        flen = buf[fp + 16]
        fdec = buf[fp + 17]
        fields.append((raw_name.decode("ascii", "replace"), ftype, flen, fdec))
        fp += 32
    cols: dict[str, list] = {name: [] for name, *_ in fields}
    pos = header_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            break
        if buf[pos] != 0x2A:  # not deleted
            off = pos + 1
            for name, ftype, flen, fdec in fields:
                raw = buf[off : off + flen].decode("ascii", "replace").strip()
                off += flen
                if ftype in ("N", "F"):
                    if raw in ("", "*" * flen):
                        cols[name].append(None)
                    elif fdec == 0 and ftype == "N" and "." not in raw:
                        cols[name].append(int(raw))
                    else:
                        cols[name].append(float(raw))
                elif ftype == "L":
                    cols[name].append(raw in ("Y", "y", "T", "t"))
                else:
                    cols[name].append(raw)
        pos += rec_size
    return {"fields": fields, "columns": cols}


def write_shp(records: list[dict], shape_type: int) -> bytes:
    """Serialize records (xs/ys [+parts]) → one .shp byte string."""
    body = bytearray()
    allx, ally = [], []
    for i, rec in enumerate(records):
        xs = np.asarray(rec["xs"], dtype=np.float64)
        ys = np.asarray(rec["ys"], dtype=np.float64)
        allx.append(xs)
        ally.append(ys)
        if shape_type == SHAPE_POINT:
            content = struct.pack("<i2d", shape_type, float(xs[0]), float(ys[0]))
        else:
            parts = np.asarray(rec.get("parts", [0]), dtype="<i4")
            xy = np.empty((len(xs), 2))
            xy[:, 0] = xs
            xy[:, 1] = ys
            if shape_type == SHAPE_MULTIPOINT:
                content = (
                    struct.pack("<i4d", shape_type, xs.min(), ys.min(), xs.max(), ys.max())
                    + struct.pack("<i", len(xs))
                    + xy.astype("<f8").tobytes()
                )
            else:
                content = (
                    struct.pack("<i4d", shape_type, xs.min(), ys.min(), xs.max(), ys.max())
                    + struct.pack("<2i", len(parts), len(xs))
                    + parts.tobytes()
                    + xy.astype("<f8").tobytes()
                )
        body += struct.pack(">2i", i + 1, len(content) // 2) + content
    ax = np.concatenate(allx) if allx else np.array([0.0])
    ay = np.concatenate(ally) if ally else np.array([0.0])
    header = bytearray(100)
    struct.pack_into(">i", header, 0, 9994)
    struct.pack_into(">i", header, 24, (100 + len(body)) // 2)
    struct.pack_into("<i", header, 28, 1000)
    struct.pack_into("<i", header, 32, shape_type)
    struct.pack_into("<4d", header, 36, ax.min(), ay.min(), ax.max(), ay.max())
    return bytes(header) + bytes(body)


def write_dbf(columns: dict, n_records: int) -> bytes:
    """Serialize {name: list} → one dBASE III .dbf. Numeric columns get
    N 18.6 (ints N 18.0), everything else C with the max value width."""
    fields = []
    for name, vals in columns.items():
        if all(isinstance(v, (int, np.integer)) or v is None for v in vals):
            fields.append((name, "N", 18, 0))
        elif all(isinstance(v, (int, float, np.floating, np.integer)) or v is None for v in vals):
            fields.append((name, "N", 18, 6))
        else:
            width = max([len(str(v)) for v in vals] + [1])
            fields.append((name, "C", min(width, 254), 0))
    rec_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = bytearray(header_size)
    out[0] = 0x03
    struct.pack_into("<I", out, 4, n_records)
    struct.pack_into("<H", out, 8, header_size)
    struct.pack_into("<H", out, 10, rec_size)
    for i, (name, ftype, flen, fdec) in enumerate(fields):
        fp = 32 + 32 * i
        out[fp : fp + 11] = name.encode("ascii", "replace")[:10].ljust(11, b"\x00")
        out[fp + 11] = ord(ftype)
        out[fp + 16] = flen
        out[fp + 17] = fdec
    out[header_size - 1] = 0x0D
    for r in range(n_records):
        row = bytearray(b" ")
        for name, ftype, flen, fdec in fields:
            v = columns[name][r]
            if ftype == "N":
                s = "" if v is None else (f"{v:.{fdec}f}" if fdec else str(int(v)))
                row += s.rjust(flen).encode("ascii")[-flen:]
            else:
                row += str(v if v is not None else "").ljust(flen).encode("ascii", "replace")[:flen]
        out += row
    out += b"\x1a"
    return bytes(out)
