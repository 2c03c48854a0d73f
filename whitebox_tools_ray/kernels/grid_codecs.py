"""Legacy single-grid raster codecs — the reference's six remaining
front-door formats (src/raster/mod.rs:126-182 dispatch,
:1238-1290 extension sniffing):

- ArcGIS ASCII grid  (.asc/.txt)        arcascii_raster.rs
- ArcGIS float grid  (.flt + .hdr)      arcbinary_raster.rs
- GRASS ASCII grid   (.asc/.txt)        grass_raster.rs
- Idrisi binary      (.rst + .rdc)      idrisi_raster.rs
- SAGA binary        (.sdat + .sgrd)    saga_raster.rs
- Surfer 7 binary    (.grd)             surfer7_raster.rs
- Surfer ASCII       (.grd, DSAA)       surfer_ascii_raster.rs
- Whitebox           (.tas + .dep)      whitebox_raster.rs

Each ``read_*`` returns ``(grid, meta)`` — grid is a float64
``(rows, cols)`` array in NORTH-UP row-major order (row 0 = top),
meta carries ``rows cols west south east north res_x res_y nodata
data_type``. Each ``write_*`` takes the same pair. ``read_grid`` /
``write_grid`` dispatch on the extension exactly like the reference
(`.grd` is sniffed for the DSAA magic; `.asc`/`.txt` for Arc-vs-GRASS
header style).

Reference parity quirks reproduced or documented:
- whitebox_raster.rs: `.dep` key:value header, `.tas` raw row-major
  top-down; I32 data is WRITTEN as FLOAT (write_whitebox match arm).
- saga_raster.rs:83-97 maps POSITION_XMIN/_YMIN directly to west/south
  (SAGA itself documents them as lower-left CELL-CENTER coordinates —
  the reference ignores the half-cell offset; we follow the reference).
  Rows are stored bottom-to-top (TOPTOBOTTOM = FALSE, writer :112,128).
- surfer7_raster.rs: north = south + RES_X * rows (:182 uses the x
  resolution for both axes); blank value 1.70141e38; data bottom-up.
- surfer_ascii_raster.rs:18 hard-codes nodata 1.71041e38 (a typo'd
  Surfer blank constant) — we use the true 1.70141e38 on write and
  accept anything >= 1.7e38 as blank on read so both survive.
- arcascii_raster.rs:41-65 swaps the xllcorner/xllcenter variables, so
  the reference applies CENTER math to CORNER files; we implement the
  spec (corner = corner) and still parse both keys.

All parsing is numpy-vectorized; these codecs run inside one Ray task
per file (sources/formats.py), never on the driver hot path.
"""
from __future__ import annotations

import os
import struct

import numpy as np

SURFER_BLANK = 1.70141e38

_DTYPES = {
    "f64": "<f8", "f32": "<f4", "i32": "<i4", "u32": "<u4",
    "i16": "<i2", "u16": "<u2", "i8": "<i1", "u8": "<u1",
}


def _meta(rows, cols, west, south, east, north, nodata, data_type="f32"):
    return {
        "rows": int(rows), "cols": int(cols),
        "west": float(west), "south": float(south),
        "east": float(east), "north": float(north),
        "res_x": (float(east) - float(west)) / int(cols),
        "res_y": (float(north) - float(south)) / int(rows),
        "nodata": float(nodata), "data_type": data_type,
    }


def _num(s: str) -> float:
    return float(s.strip())


# --- ArcGIS ASCII (.asc / .txt) -------------------------------------------

def read_arc_ascii(path: str):
    with open(path) as f:
        text = f.read()
    lines = text.splitlines()
    hdr: dict[str, float] = {}
    data_start = 0
    for i, ln in enumerate(lines):
        parts = ln.split()
        if len(parts) >= 2 and parts[0].lower() in (
            "ncols", "nrows", "xllcorner", "yllcorner", "xllcenter",
            "yllcenter", "cellsize", "nodata_value",
        ):
            hdr[parts[0].lower()] = _num(parts[-1])
            data_start = i + 1
        elif hdr:
            break
    rows, cols = int(hdr["nrows"]), int(hdr["ncols"])
    res = hdr["cellsize"]
    nodata = hdr.get("nodata_value", -32768.0)
    if "xllcorner" in hdr:
        west, south = hdr["xllcorner"], hdr["yllcorner"]
    else:  # cell-center registration: shift to the outer corner
        west = hdr["xllcenter"] - 0.5 * res
        south = hdr["yllcenter"] - 0.5 * res
    vals = np.array(" ".join(lines[data_start:]).split(), dtype=np.float64)
    grid = vals[: rows * cols].reshape(rows, cols)
    return grid, _meta(rows, cols, west, south, west + cols * res,
                       south + rows * res, nodata)


def write_arc_ascii(path: str, grid: np.ndarray, meta: dict) -> None:
    rows, cols = grid.shape
    with open(path, "w") as f:
        f.write(f"NCOLS {cols}\n")
        f.write(f"NROWS {rows}\n")
        f.write(f"XLLCORNER {meta['west']:.10g}\n")
        f.write(f"YLLCORNER {meta['south']:.10g}\n")
        f.write(f"CELLSIZE {meta['res_x']:.10g}\n")
        f.write(f"NODATA_VALUE {meta['nodata']:.10g}\n")
        np.savetxt(f, grid, fmt="%.10g", delimiter=" ")


# --- ArcGIS binary float grid (.flt + .hdr) --------------------------------

def read_arc_binary(path: str):
    hdr_path = os.path.splitext(path)[0] + ".hdr"
    hdr: dict[str, str] = {}
    with open(hdr_path) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 2:
                hdr[parts[0].lower()] = parts[-1]
    rows, cols = int(float(hdr["nrows"])), int(float(hdr["ncols"]))
    res = float(hdr["cellsize"])
    nodata = float(hdr.get("nodata_value", -9999.0))
    if "xllcorner" in hdr:
        west, south = float(hdr["xllcorner"]), float(hdr["yllcorner"])
    else:
        west = float(hdr["xllcenter"]) - 0.5 * res
        south = float(hdr["yllcenter"]) - 0.5 * res
    order = "<" if hdr.get("byteorder", "lsbfirst").lower().startswith("lsb") else ">"
    raw = np.fromfile(path, dtype=order + "f4", count=rows * cols)
    grid = raw.astype(np.float64).reshape(rows, cols)
    return grid, _meta(rows, cols, west, south, west + cols * res,
                       south + rows * res, nodata)


def write_arc_binary(path: str, grid: np.ndarray, meta: dict) -> None:
    rows, cols = grid.shape
    with open(os.path.splitext(path)[0] + ".hdr", "w") as f:
        f.write(f"NCOLS {cols}\n")
        f.write(f"NROWS {rows}\n")
        f.write(f"XLLCORNER {meta['west']:.10g}\n")
        f.write(f"YLLCORNER {meta['south']:.10g}\n")
        f.write(f"CELLSIZE {meta['res_x']:.10g}\n")
        f.write(f"NODATA_VALUE {meta['nodata']:.10g}\n")
        f.write("BYTEORDER LSBFIRST\n")
    grid.astype("<f4").tofile(path)


# --- GRASS ASCII (.asc / .txt with north:/south: header) -------------------

def read_grass_ascii(path: str):
    with open(path) as f:
        lines = f.read().splitlines()
    hdr: dict[str, str] = {}
    mult = 1.0
    nodata = -32768.0
    data_start = 0
    for i, ln in enumerate(lines):
        if ":" in ln and not _is_data_line(ln):
            k, v = ln.split(":", 1)
            k = k.strip().lower()
            v = v.strip()
            if k in ("north", "south", "east", "west", "rows", "cols"):
                hdr[k] = v
            elif k == "null":
                nodata = float(v)
            elif k == "multiplier":
                mult = float(v)
            data_start = i + 1
        elif hdr:
            break
    rows, cols = int(float(hdr["rows"])), int(float(hdr["cols"]))
    west, east = float(hdr["west"]), float(hdr["east"])
    south, north = float(hdr["south"]), float(hdr["north"])
    vals = np.array(" ".join(lines[data_start:]).split(), dtype=np.float64)
    grid = vals[: rows * cols].reshape(rows, cols)
    if mult != 1.0:
        keep = grid != nodata
        grid = np.where(keep, grid * mult, grid)
    return grid, _meta(rows, cols, west, south, east, north, nodata)


def _is_data_line(ln: str) -> bool:
    tok = ln.split()
    if not tok:
        return False
    try:
        float(tok[0])
        return True
    except ValueError:
        return False


def write_grass_ascii(path: str, grid: np.ndarray, meta: dict) -> None:
    rows, cols = grid.shape
    with open(path, "w") as f:
        f.write(f"north: {meta['north']:.10g}\n")
        f.write(f"south: {meta['south']:.10g}\n")
        f.write(f"east: {meta['east']:.10g}\n")
        f.write(f"west: {meta['west']:.10g}\n")
        f.write(f"rows: {rows}\n")
        f.write(f"cols: {cols}\n")
        f.write(f"null: {meta['nodata']:.10g}\n")
        f.write("type: double\n")
        np.savetxt(f, grid, fmt="%.10g", delimiter=" ")


# --- Whitebox (.tas data + .dep header) ------------------------------------

_WB_TYPES = {"double": "f64", "float": "f32", "i32": "i32",
             "integer": "i16", "byte": "u8"}
_WB_NAMES = {"f64": "DOUBLE", "f32": "FLOAT", "i32": "I32",
             "i16": "INTEGER", "u8": "BYTE"}


def read_whitebox(path: str):
    base = os.path.splitext(path)[0]
    hdr: dict[str, str] = {}
    with open(base + ".dep") as f:
        for ln in f:
            if ":" not in ln:
                continue
            k, v = ln.split(":", 1)
            hdr[k.strip().lower()] = v.strip()
    rows = int(float(hdr["rows"]))
    cols = int(float(hdr["cols"]))
    north, south = float(hdr["north"]), float(hdr["south"])
    east, west = float(hdr["east"]), float(hdr["west"])
    nodata = float(hdr.get("nodata", -32768.0))
    dt = _WB_TYPES.get(hdr.get("data type", "float").lower(), "f32")
    order = ">" if "big" in hdr.get("byte order", "little").lower() else "<"
    raw = np.fromfile(base + ".tas", dtype=order + _DTYPES[dt][1:],
                      count=rows * cols)
    grid = raw.astype(np.float64).reshape(rows, cols)
    m = _meta(rows, cols, west, south, east, north, nodata, dt)
    return grid, m


def write_whitebox(path: str, grid: np.ndarray, meta: dict) -> None:
    base = os.path.splitext(path)[0]
    rows, cols = grid.shape
    dt = meta.get("data_type", "f32")
    if dt not in _WB_NAMES or dt == "i32":
        dt = "f64" if dt in ("f64", "u32", "i32") else "f32"
    valid = grid[grid != meta["nodata"]]
    lo = float(valid.min()) if valid.size else 0.0
    hi = float(valid.max()) if valid.size else 0.0
    with open(base + ".dep", "w") as f:
        f.write(f"Min:\t{lo:.10g}\n")
        f.write(f"Max:\t{hi:.10g}\n")
        f.write(f"North:\t{meta['north']:.10g}\n")
        f.write(f"South:\t{meta['south']:.10g}\n")
        f.write(f"East:\t{meta['east']:.10g}\n")
        f.write(f"West:\t{meta['west']:.10g}\n")
        f.write(f"Cols:\t{cols}\n")
        f.write(f"Rows:\t{rows}\n")
        f.write("Stacks:\t1\n")
        f.write(f"Data Type:\t{_WB_NAMES[dt]}\n")
        f.write("Data Scale:\tcontinuous\n")
        f.write(f"Display Min:\t{lo:.10g}\n")
        f.write(f"Display Max:\t{hi:.10g}\n")
        f.write("Z Units:\tnot specified\n")
        f.write("XY Units:\tnot specified\n")
        f.write("Projection:\tnot specified\n")
        f.write(f"NoData:\t{meta['nodata']:.10g}\n")
        f.write("Byte Order:\tLITTLE_ENDIAN\n")
        f.write("Preferred Palette:\tgrey.pal\n")
    grid.astype(_DTYPES[dt]).tofile(base + ".tas")


# --- Idrisi (.rst data + .rdc header) ---------------------------------------

def read_idrisi(path: str):
    base = os.path.splitext(path)[0]
    hdr: dict[str, str] = {}
    with open(base + ".rdc") as f:
        for ln in f:
            if ":" not in ln:
                continue
            k, v = ln.split(":", 1)
            hdr[k.strip().lower()] = v.strip()
    rows = int(float(hdr["rows"]))
    cols = int(float(hdr["columns"]))
    west, east = float(hdr["min. x"]), float(hdr["max. x"])
    south, north = float(hdr["min. y"]), float(hdr["max. y"])
    t = hdr.get("data type", "real").lower()
    dt = "f32" if "real" in t else ("i16" if "int" in t else "u8")
    nodata = float(hdr["flag value"]) if hdr.get(
        "flag value", "none").lower() not in ("none", "") else -32768.0
    raw = np.fromfile(base + ".rst", dtype=_DTYPES[dt], count=rows * cols)
    grid = raw.astype(np.float64).reshape(rows, cols)
    return grid, _meta(rows, cols, west, south, east, north, nodata, dt)


def write_idrisi(path: str, grid: np.ndarray, meta: dict) -> None:
    base = os.path.splitext(path)[0]
    rows, cols = grid.shape
    dt = meta.get("data_type", "f32")
    dt = {"f64": "f32", "f32": "f32", "i32": "i16", "i16": "i16",
          "u16": "i16", "u8": "u8", "i8": "u8"}.get(dt, "f32")
    name = {"f32": "real", "i16": "integer", "u8": "byte"}[dt]
    valid = grid[grid != meta["nodata"]]
    lo = float(valid.min()) if valid.size else 0.0
    hi = float(valid.max()) if valid.size else 0.0
    with open(base + ".rdc", "w") as f:
        f.write("file format : IDRISI Raster A.1\n")
        f.write(f"file title  : {os.path.basename(base)}\n")
        f.write(f"data type   : {name}\n")
        f.write("file type   : binary\n")
        f.write(f"columns     : {cols}\n")
        f.write(f"rows        : {rows}\n")
        f.write("ref. system : plane\n")
        f.write("ref. units  : m\n")
        f.write("unit dist.  : 1.0000000\n")
        f.write(f"min. X      : {meta['west']:.10g}\n")
        f.write(f"max. X      : {meta['east']:.10g}\n")
        f.write(f"min. Y      : {meta['south']:.10g}\n")
        f.write(f"max. Y      : {meta['north']:.10g}\n")
        f.write("pos'n error : unknown\n")
        f.write(f"resolution  : {meta['res_x']:.10g}\n")
        f.write(f"min. value  : {lo:.10g}\n")
        f.write(f"max. value  : {hi:.10g}\n")
        f.write(f"display min : {lo:.10g}\n")
        f.write(f"display max : {hi:.10g}\n")
        f.write("value units : unspecified\n")
        f.write("value error : unknown\n")
        f.write(f"flag value  : {meta['nodata']:.10g}\n")
        f.write("flag def'n  : nodata\n")
        f.write("legend cats : 0\n")
    grid.astype(_DTYPES[dt]).tofile(base + ".rst")


# --- SAGA (.sdat data + .sgrd header) ---------------------------------------

_SAGA_FMT = {"byte_unsigned": "u8", "byte": "u8", "shortint_unsigned": "u16",
             "shortint": "i16", "integer_unsigned": "u32", "integer": "i32",
             "float": "f32", "double": "f64"}
_SAGA_NAMES = {"u8": "BYTE_UNSIGNED", "u16": "SHORTINT_UNSIGNED",
               "i16": "SHORTINT", "u32": "INTEGER_UNSIGNED",
               "i32": "INTEGER", "f32": "FLOAT", "f64": "DOUBLE"}


def read_saga(path: str):
    base = os.path.splitext(path)[0]
    hdr: dict[str, str] = {}
    with open(base + ".sgrd") as f:
        for ln in f:
            if "=" not in ln:
                continue
            k, v = ln.split("=", 1)
            hdr[k.strip().lower()] = v.strip()
    rows = int(float(hdr["cellcount_y"]))
    cols = int(float(hdr["cellcount_x"]))
    res = float(hdr["cellsize"])
    # reference parity: POSITION_* maps straight to the outer corner
    # (saga_raster.rs:83-97; SAGA's own docs say cell center)
    west, south = float(hdr["position_xmin"]), float(hdr["position_ymin"])
    nodata = float(hdr.get("nodata_value", -99999.0))
    z = float(hdr.get("z_factor", 1.0))
    dt = _SAGA_FMT.get(hdr.get("dataformat", "float").lower(), "f32")
    order = ">" if hdr.get("byteorder_big", "false").lower().startswith(
        ("t", "msb")) else "<"
    raw = np.fromfile(base + ".sdat", dtype=order + _DTYPES[dt][1:],
                      count=rows * cols).astype(np.float64)
    if z != 1.0:
        raw = raw * z
    grid = raw.reshape(rows, cols)
    if not hdr.get("toptobottom", "false").lower().startswith("t"):
        grid = grid[::-1]  # stored bottom-to-top
    return grid, _meta(rows, cols, west, south, west + cols * res,
                       south + rows * res, nodata, dt)


def write_saga(path: str, grid: np.ndarray, meta: dict) -> None:
    base = os.path.splitext(path)[0]
    rows, cols = grid.shape
    dt = meta.get("data_type", "f32")
    if dt not in _SAGA_NAMES:
        dt = "f32"
    with open(base + ".sgrd", "w") as f:
        f.write(f"NAME\t= {os.path.basename(base)}\n")
        f.write("DESCRIPTION\t=\n")
        f.write("UNIT\t=\n")
        f.write("DATAFILE_OFFSET\t= 0\n")
        f.write(f"DATAFORMAT\t= {_SAGA_NAMES[dt]}\n")
        f.write("BYTEORDER_BIG\t= FALSE\n")
        f.write(f"POSITION_XMIN\t= {meta['west']:.10g}\n")
        f.write(f"POSITION_YMIN\t= {meta['south']:.10g}\n")
        f.write(f"CELLCOUNT_X\t= {cols}\n")
        f.write(f"CELLCOUNT_Y\t= {rows}\n")
        f.write(f"CELLSIZE\t= {meta['res_x']:.10g}\n")
        f.write("Z_FACTOR\t= 1.000000\n")
        f.write(f"NODATA_VALUE\t= {meta['nodata']:.10g}\n")
        f.write("TOPTOBOTTOM\t= FALSE\n")
    grid[::-1].astype(_DTYPES[dt]).tofile(base + ".sdat")


# --- Surfer 7 binary (.grd) --------------------------------------------------

def read_surfer7(path: str):
    with open(path, "rb") as f:
        buf = f.read()
    if struct.unpack_from("<i", buf, 0)[0] != 0x42525344:  # 'DSRB'
        raise ValueError("not a Surfer 7 grid (DSRB magic missing)")
    off = 12  # header id + size(4) + version
    if struct.unpack_from("<i", buf, off)[0] != 0x44495247:  # 'GRID'
        raise ValueError("Surfer 7 GRID section missing")
    off += 8
    rows, cols = struct.unpack_from("<2i", buf, off)
    off += 8
    west, south, res_x, res_y, zmin, zmax, rot, blank = struct.unpack_from(
        "<8d", buf, off)
    off += 64
    if struct.unpack_from("<i", buf, off)[0] != 0x41544144:  # 'DATA'
        raise ValueError("Surfer 7 DATA section missing")
    off += 8
    vals = np.frombuffer(buf, dtype="<f8", count=rows * cols, offset=off)
    grid = vals.reshape(rows, cols)[::-1].copy()  # stored bottom-up
    # surfer7_raster.rs:181-182 parity: north uses RES_X
    return grid, _meta(rows, cols, west, south, west + res_x * cols,
                       south + res_x * rows, blank, "f64")


def write_surfer7(path: str, grid: np.ndarray, meta: dict) -> None:
    rows, cols = grid.shape
    g = np.where(grid == meta["nodata"], SURFER_BLANK, grid)
    valid = g[g < SURFER_BLANK]
    zmin = float(valid.min()) if valid.size else 0.0
    zmax = float(valid.max()) if valid.size else 0.0
    with open(path, "wb") as f:
        f.write(struct.pack("<3i", 0x42525344, 4, 1))
        f.write(struct.pack("<2i", 0x44495247, 72))
        f.write(struct.pack("<2i", rows, cols))
        f.write(struct.pack("<8d", meta["west"], meta["south"],
                            meta["res_x"], meta["res_y"], zmin, zmax,
                            0.0, SURFER_BLANK))
        f.write(struct.pack("<2i", 0x41544144, rows * cols * 8))
        f.write(g[::-1].astype("<f8").tobytes())


# --- Surfer ASCII (.grd, DSAA) ----------------------------------------------

def read_surfer_ascii(path: str):
    with open(path) as f:
        text = f.read()
    tok = text.split()
    if tok[0].upper() != "DSAA":
        raise ValueError("not a Surfer ASCII grid (DSAA missing)")
    cols, rows = int(tok[1]), int(tok[2])
    west, east = float(tok[3]), float(tok[4])
    south, north = float(tok[5]), float(tok[6])
    # tok[7:9] = zmin zmax
    vals = np.array(tok[9 : 9 + rows * cols], dtype=np.float64)
    grid = vals.reshape(rows, cols)[::-1].copy()  # rows bottom-to-top
    grid = np.where(grid >= 1.7e38, SURFER_BLANK, grid)
    return grid, _meta(rows, cols, west, south, east, north, SURFER_BLANK,
                       "f32")


def write_surfer_ascii(path: str, grid: np.ndarray, meta: dict) -> None:
    rows, cols = grid.shape
    g = np.where(grid == meta["nodata"], SURFER_BLANK, grid)
    valid = g[g < SURFER_BLANK]
    zmin = float(valid.min()) if valid.size else 0.0
    zmax = float(valid.max()) if valid.size else 0.0
    with open(path, "w") as f:
        f.write("DSAA\n")
        f.write(f"{cols} {rows}\n")
        f.write(f"{meta['west']:.10g} {meta['east']:.10g}\n")
        f.write(f"{meta['south']:.10g} {meta['north']:.10g}\n")
        f.write(f"{zmin:.10g} {zmax:.10g}\n")
        np.savetxt(f, g[::-1], fmt="%.10g", delimiter=" ")


# --- extension dispatch (mod.rs:1238-1290 parity) ----------------------------

def _sniff_ascii_grid(path: str) -> str:
    """Arc vs GRASS: GRASS headers are `key: value`, Arc are `KEY value`."""
    with open(path) as f:
        first = f.readline()
    return "grass" if ":" in first else "arcascii"


def _sniff_grd(path: str) -> str:
    with open(path, "rb") as f:
        magic = f.read(4)
    return "surfer_ascii" if magic == b"DSAA" else "surfer7"


_READERS = {
    "arcascii": read_arc_ascii, "arcbinary": read_arc_binary,
    "grass": read_grass_ascii, "whitebox": read_whitebox,
    "idrisi": read_idrisi, "saga": read_saga,
    "surfer7": read_surfer7, "surfer_ascii": read_surfer_ascii,
}
_WRITERS = {
    "arcascii": write_arc_ascii, "arcbinary": write_arc_binary,
    "grass": write_grass_ascii, "whitebox": write_whitebox,
    "idrisi": write_idrisi, "saga": write_saga,
    "surfer7": write_surfer7, "surfer_ascii": write_surfer_ascii,
}


def format_of(path: str, mode: str = "r") -> str:
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("tas", "dep"):
        return "whitebox"
    if ext == "flt":
        return "arcbinary"
    if ext in ("rst", "rdc"):
        return "idrisi"
    if ext in ("sdat", "sgrd"):
        return "saga"
    if ext == "grd":
        return _sniff_grd(path) if mode == "r" else "surfer7"
    if ext in ("asc", "txt"):
        return _sniff_ascii_grid(path) if mode == "r" else "arcascii"
    raise ValueError(f"unrecognized grid raster extension: .{ext}")


def read_grid(path: str):
    return _READERS[format_of(path, "r")](path)


def write_grid(path: str, grid: np.ndarray, meta: dict,
               fmt: str | None = None) -> None:
    _WRITERS[fmt or format_of(path, "w")](path, grid, meta)


def read_grid_meta(path: str) -> dict:
    """Header-only parse — georef/shape meta without touching the data
    payload (sidecar text headers, ASCII first lines, or the Surfer 7
    fixed-offset GRID section). Used by the Dataset source to return
    per-file metas driver-side at O(header) cost."""
    fmt = format_of(path, "r")
    if fmt == "arcbinary":
        hdr = {}
        with open(os.path.splitext(path)[0] + ".hdr") as f:
            for ln in f:
                parts = ln.split()
                if len(parts) >= 2:
                    hdr[parts[0].lower()] = parts[-1]
        rows, cols = int(float(hdr["nrows"])), int(float(hdr["ncols"]))
        res = float(hdr["cellsize"])
        nodata = float(hdr.get("nodata_value", -9999.0))
        if "xllcorner" in hdr:
            west, south = float(hdr["xllcorner"]), float(hdr["yllcorner"])
        else:
            west = float(hdr["xllcenter"]) - 0.5 * res
            south = float(hdr["yllcenter"]) - 0.5 * res
        return _meta(rows, cols, west, south, west + cols * res,
                     south + rows * res, nodata)
    if fmt == "whitebox":
        hdr = {}
        with open(os.path.splitext(path)[0] + ".dep") as f:
            for ln in f:
                if ":" in ln:
                    k, v = ln.split(":", 1)
                    hdr[k.strip().lower()] = v.strip()
        return _meta(int(float(hdr["rows"])), int(float(hdr["cols"])),
                     float(hdr["west"]), float(hdr["south"]),
                     float(hdr["east"]), float(hdr["north"]),
                     float(hdr.get("nodata", -32768.0)),
                     _WB_TYPES.get(hdr.get("data type", "float").lower(), "f32"))
    if fmt == "idrisi":
        hdr = {}
        with open(os.path.splitext(path)[0] + ".rdc") as f:
            for ln in f:
                if ":" in ln:
                    k, v = ln.split(":", 1)
                    hdr[k.strip().lower()] = v.strip()
        nodata = float(hdr["flag value"]) if hdr.get(
            "flag value", "none").lower() not in ("none", "") else -32768.0
        return _meta(int(float(hdr["rows"])), int(float(hdr["columns"])),
                     float(hdr["min. x"]), float(hdr["min. y"]),
                     float(hdr["max. x"]), float(hdr["max. y"]), nodata)
    if fmt == "saga":
        hdr = {}
        with open(os.path.splitext(path)[0] + ".sgrd") as f:
            for ln in f:
                if "=" in ln:
                    k, v = ln.split("=", 1)
                    hdr[k.strip().lower()] = v.strip()
        rows, cols = int(float(hdr["cellcount_y"])), int(float(hdr["cellcount_x"]))
        res = float(hdr["cellsize"])
        west, south = float(hdr["position_xmin"]), float(hdr["position_ymin"])
        return _meta(rows, cols, west, south, west + cols * res,
                     south + rows * res, float(hdr.get("nodata_value", -99999.0)))
    if fmt == "surfer7":
        with open(path, "rb") as f:
            buf = f.read(100)
        rows, cols = struct.unpack_from("<2i", buf, 20)
        west, south, res_x, res_y = struct.unpack_from("<4d", buf, 28)
        blank = struct.unpack_from("<d", buf, 84)[0]
        return _meta(rows, cols, west, south, west + res_x * cols,
                     south + res_x * rows, blank, "f64")
    if fmt == "surfer_ascii":
        with open(path) as f:
            head = [f.readline() for _ in range(5)]
        tok = " ".join(head).split()
        return _meta(int(tok[2]), int(tok[1]), float(tok[3]), float(tok[5]),
                     float(tok[4]), float(tok[6]), SURFER_BLANK)
    # arc ascii / grass ascii: header = first lines
    hdr_lines = []
    with open(path) as f:
        for _ in range(10):
            ln = f.readline()
            if not ln:
                break
            hdr_lines.append(ln)
    if fmt == "grass":
        hdr = {}
        for ln in hdr_lines:
            if ":" in ln and not _is_data_line(ln):
                k, v = ln.split(":", 1)
                hdr[k.strip().lower()] = v.strip()
        return _meta(int(float(hdr["rows"])), int(float(hdr["cols"])),
                     float(hdr["west"]), float(hdr["south"]),
                     float(hdr["east"]), float(hdr["north"]),
                     float(hdr.get("null", -32768.0)))
    hdr = {}
    for ln in hdr_lines:
        parts = ln.split()
        if len(parts) >= 2:
            hdr[parts[0].lower()] = parts[-1]
    rows, cols = int(float(hdr["nrows"])), int(float(hdr["ncols"]))
    res = float(hdr["cellsize"])
    nodata = float(hdr.get("nodata_value", -32768.0))
    if "xllcorner" in hdr:
        west, south = float(hdr["xllcorner"]), float(hdr["yllcorner"])
    else:
        west = float(hdr["xllcenter"]) - 0.5 * res
        south = float(hdr["yllcenter"]) - 0.5 * res
    return _meta(rows, cols, west, south, west + cols * res,
                 south + rows * res, nodata)
