"""Minimal LAS 1.0-1.4 codec (uncompressed; reads point formats 0-10,
writes 0-3 as LAS 1.2 and 6-8 as LAS 1.4), written from the public
ASPRS LAS specification; field semantics match the reference reader
(src/lidar/las.rs, src/lidar/header.rs, src/lidar/point_data.rs) —
scaled int32 coordinates, 3-bit (4-bit extended) return number /
number-of-returns packing, classification byte.

Pure numpy: the whole point block parses as one structured-array view
(zero Python loops), so a 200 MB LAS file decodes in ~100 ms. LAZ
(compressed) is out of scope — raise with a clear message.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT_DTYPES: dict[int, np.dtype] = {
    0: np.dtype(
        [
            ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
            ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
            ("scan_angle", "i1"), ("user_data", "u1"), ("pt_src_id", "<u2"),
        ]
    ),
    1: np.dtype(
        [
            ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
            ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
            ("scan_angle", "i1"), ("user_data", "u1"), ("pt_src_id", "<u2"),
            ("gps_time", "<f8"),
        ]
    ),
    2: np.dtype(
        [
            ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
            ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
            ("scan_angle", "i1"), ("user_data", "u1"), ("pt_src_id", "<u2"),
            ("red", "<u2"), ("green", "<u2"), ("blue", "<u2"),
        ]
    ),
    3: np.dtype(
        [
            ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
            ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
            ("scan_angle", "i1"), ("user_data", "u1"), ("pt_src_id", "<u2"),
            ("gps_time", "<f8"),
            ("red", "<u2"), ("green", "<u2"), ("blue", "<u2"),
        ]
    ),
}
# formats 4/5 = 1/3 + waveform packets; the wave bytes are skipped by
# the record stride, so they parse with the 1/3 field layouts
_POINT_DTYPES[4] = _POINT_DTYPES[1]
_POINT_DTYPES[5] = _POINT_DTYPES[3]

# LAS 1.4 extended formats (6-10): 30-byte base, 4+4-bit return counts,
# i16 scan angle, f64 gps time always present
_PF6_BASE = [
    ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
    ("intensity", "<u2"), ("returns", "u1"), ("flags", "u1"),
    ("classification", "u1"), ("user_data", "u1"), ("scan_angle", "<i2"),
    ("pt_src_id", "<u2"), ("gps_time", "<f8"),
]
_POINT_DTYPES[6] = np.dtype(_PF6_BASE)
_POINT_DTYPES[7] = np.dtype(
    _PF6_BASE + [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
)
_POINT_DTYPES[8] = np.dtype(
    _PF6_BASE + [("red", "<u2"), ("green", "<u2"), ("blue", "<u2"), ("nir", "<u2")]
)
_POINT_DTYPES[9] = _POINT_DTYPES[6]   # + waveform (skipped by stride)
_POINT_DTYPES[10] = _POINT_DTYPES[8]  # + waveform (skipped by stride)


def parse_las(buf: bytes) -> dict:
    """Parse one LAS file → dict of numpy columns + header metadata.

    Columns: x, y, z (float64, scale/offset applied), intensity,
    return_num, num_returns, classification, scan_angle, user_data,
    pt_src_id, and gps_time / red / green / blue when the point format
    carries them. Extra per-point bytes beyond the standard format size
    (user extra bytes) are skipped via the record stride.
    """
    if buf[:4] == b"PK\x03\x04":
        # zipped LAS (las.rs:486-534): a .zip archive whose first member
        # is the .las file; DEFLATE/stored both handled by stdlib zipfile
        import io
        import zipfile

        with zipfile.ZipFile(io.BytesIO(buf)) as zf:
            names = zf.namelist()
            if not names:
                raise ValueError("empty zip archive (expected one .las member)")
            if not names[0].lower().endswith(".las"):
                raise ValueError(
                    "The data file contained within zipped archive does not "
                    "have the proper 'las' extension (las.rs:527-531)"
                )
            buf = zf.read(names[0])
    if buf[:4] != b"LASF":
        raise ValueError("not a LAS file (missing LASF signature)")
    ver_major, ver_minor = buf[24], buf[25]
    offset_to_points = struct.unpack_from("<I", buf, 96)[0]
    point_format = buf[104]
    if point_format >= 128:
        raise NotImplementedError("LAZ (compressed LAS) is not supported")
    record_len = struct.unpack_from("<H", buf, 105)[0]
    n_legacy = struct.unpack_from("<I", buf, 107)[0]
    n_points = n_legacy
    if (ver_major, ver_minor) >= (1, 4):
        n64 = struct.unpack_from("<Q", buf, 247)[0]
        if n64:
            n_points = n64
    if point_format not in _POINT_DTYPES:
        raise NotImplementedError(f"LAS point format {point_format} not supported (0-10 only)")
    sx, sy, sz = struct.unpack_from("<3d", buf, 131)
    ox, oy, oz = struct.unpack_from("<3d", buf, 155)

    base = _POINT_DTYPES[point_format]
    if record_len < base.itemsize:
        raise ValueError(f"record length {record_len} < format {point_format} size {base.itemsize}")
    stride = np.dtype(
        {"names": list(base.names), "formats": [base.fields[n][0] for n in base.names],
         "offsets": [base.fields[n][1] for n in base.names], "itemsize": record_len}
    )
    raw = np.frombuffer(buf, dtype=stride, count=n_points, offset=offset_to_points)

    out = {
        "x": raw["X"].astype(np.float64) * sx + ox,
        "y": raw["Y"].astype(np.float64) * sy + oy,
        "z": raw["Z"].astype(np.float64) * sz + oz,
        "intensity": raw["intensity"].astype(np.int32),
        "classification": raw["classification"].astype(np.int32),
        "scan_angle": raw["scan_angle"].astype(np.int32),
        "user_data": raw["user_data"].astype(np.int32),
        "pt_src_id": raw["pt_src_id"].astype(np.int32),
    }
    if point_format >= 6:  # 1.4 extended: 4+4-bit return counts
        returns = raw["returns"]
        out["return_num"] = (returns & 0x0F).astype(np.int8)
        out["num_returns"] = ((returns >> 4) & 0x0F).astype(np.int8)
    else:
        flags = raw["flags"]
        out["return_num"] = (flags & 0x07).astype(np.int8)
        out["num_returns"] = ((flags >> 3) & 0x07).astype(np.int8)
    if "gps_time" in base.names:
        out["gps_time"] = raw["gps_time"].astype(np.float64)
    if "red" in base.names:
        for c in ("red", "green", "blue"):
            out[c] = raw[c].astype(np.int32)
    if "nir" in base.names:
        out["nir"] = raw["nir"].astype(np.int32)
    meta = {
        "version": (ver_major, ver_minor),
        "point_format": point_format,
        "n_points": int(n_points),
        "scale": (sx, sy, sz),
        "offset": (ox, oy, oz),
    }
    return {"columns": out, "meta": meta}


def write_las(
    columns: dict,
    point_format: int = 1,
    scale: tuple = (0.001, 0.001, 0.001),
    offset: tuple | None = None,
) -> bytes:
    """Serialize numpy columns → one uncompressed LAS file.

    Formats 0-3 emit classic LAS 1.2 (227-byte header); formats 6-8
    emit LAS 1.4 (375-byte header, u64 point count, 4+4-bit return
    packing, i16 scan angle). Formats 4/5/9/10 (waveform) stay
    read-only — the engine carries no waveform packets to serialize.
    ``columns`` must carry x/y/z (float64); the remaining fields default
    to zero when absent. Coordinates are stored as
    round((v - offset) / scale) int32, the spec's quantization."""
    if point_format not in (0, 1, 2, 3, 6, 7, 8):
        raise NotImplementedError(
            f"write_las emits formats 0-3 (LAS 1.2) and 6-8 (LAS 1.4); "
            f"format {point_format} is read-only (waveform packets)"
        )
    x = np.asarray(columns["x"], dtype=np.float64)
    y = np.asarray(columns["y"], dtype=np.float64)
    z = np.asarray(columns["z"], dtype=np.float64)
    n = len(x)
    if offset is None:
        offset = (
            float(np.floor(x.min())) if n else 0.0,
            float(np.floor(y.min())) if n else 0.0,
            float(np.floor(z.min())) if n else 0.0,
        )
    sx, sy, sz = scale
    ox, oy, oz = offset
    base = _POINT_DTYPES[point_format]
    rec = np.zeros(n, dtype=base)
    rec["X"] = np.round((x - ox) / sx).astype(np.int64)
    rec["Y"] = np.round((y - oy) / sy).astype(np.int64)
    rec["Z"] = np.round((z - oz) / sz).astype(np.int64)

    def col(name, default=0):
        v = columns.get(name)
        return np.asarray(v) if v is not None else np.full(n, default)

    rec["intensity"] = col("intensity")
    extended = point_format >= 6
    ret_cap = 15 if extended else 7
    rn = np.clip(col("return_num", 1), 0, ret_cap).astype(np.uint8)
    nr = np.clip(col("num_returns", 1), 0, ret_cap).astype(np.uint8)
    if extended:
        rec["returns"] = rn | (nr << 4)
        rec["flags"] = 0
    else:
        rec["flags"] = rn | (nr << 3)
    rec["classification"] = col("classification")
    rec["scan_angle"] = col("scan_angle")
    rec["user_data"] = col("user_data")
    rec["pt_src_id"] = col("pt_src_id")
    if "gps_time" in base.names:
        rec["gps_time"] = col("gps_time", 0.0)
    if "red" in base.names:
        for c in ("red", "green", "blue"):
            rec[c] = col(c)
    if "nir" in base.names:
        rec["nir"] = col("nir")

    header_size = 375 if extended else 227  # LAS 1.4 / LAS 1.2
    header = bytearray(header_size)
    header[0:4] = b"LASF"
    header[24] = 1
    header[25] = 4 if extended else 2
    struct.pack_into("<28s", header, 26, b"whitebox_tools_ray las codec")
    struct.pack_into("<H", header, 94, header_size)
    struct.pack_into("<I", header, 96, header_size)  # points follow header
    struct.pack_into("<I", header, 100, 0)  # no VLRs
    header[104] = point_format
    struct.pack_into("<H", header, 105, base.itemsize)
    if extended:
        # legacy count/histogram stay 0 for formats 6+ (LAS 1.4 §2.3)
        struct.pack_into("<Q", header, 247, n)
        for i in range(15):
            struct.pack_into("<Q", header, 255 + 8 * i, int((rn == i + 1).sum()))
    else:
        struct.pack_into("<I", header, 107, n)
        # returns-by-count histogram (5 legacy slots)
        for i in range(5):
            struct.pack_into("<I", header, 111 + 4 * i, int((rn == i + 1).sum()))
    struct.pack_into("<3d", header, 131, sx, sy, sz)
    struct.pack_into("<3d", header, 155, ox, oy, oz)
    if n:
        struct.pack_into("<6d", header, 179, x.max(), x.min(), y.max(), y.min(), z.max(), z.min())
    return bytes(header) + rec.tobytes()


def zip_las(las_bytes: bytes, member: str = "points.las") -> bytes:
    """Wrap LAS bytes in a one-member DEFLATE .zip archive — the
    reference's zipped-LAS write model (las.rs:1163-1200; README:179:
    'only LAS file should be contained within a zipped archive')."""
    import io
    import zipfile

    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(member, las_bytes)
    return bio.getvalue()
