"""Hierarchical spatial cell indexes — the engine's shuffle keys.

Two families, both pure NumPy and both packable into one int64 column
(the co-partitioning key for every "wide" spatial operation, per
SURVEY.md §1.6 / §7):

- **Quad cells** (the S2 analog for projected/planar data): a quadtree
  over a fixed world frame; cell id = Morton (Z-order) interleave of the
  (ix, iy) integer cell coords at a level, tagged with the level. Parent /
  child / range-prefix operations are bit shifts, so a sort by ``quad_id``
  groups children under parents — the property S2 cell ids provide on the
  sphere.  Levels 0..24 supported (48 bits of Morton + 5 bits level tag → 1 m
  minimum cell over a 2^24 m frame).
- **Hex cells** (the H3 analog for projected/planar data; also the exact
  engine form of the reference's own planar hex binning,
  /root/reference/src/tools/gis_analysis/vector_hex_bin.rs): pointy-top
  axial-coordinate hexagons, cube-rounded; id packs (res, q, r).

True H3/S2 are geodesic; the reference operates in projected coordinates
(UTM metres — testdata/DEM.dep), where planar analogs are the faithful
equivalent. Resolutions 5-12 map to halving cell sizes from
``base_size / 2**res``.

Everything here must stay expressible in ANSI SQL (DuckDB oracle):
``quad_cell`` has a generator (:func:`quad_cell_sql`) that emits the exact
equivalent SQL expression for the driver's correctness gate.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "morton_interleave",
    "quad_cell",
    "quad_parent",
    "quad_cell_sql",
    "hex_cell",
    "hex_cell_center",
    "pack_hex",
]

# Fixed world frame for quad cells: covers the fixture extents with margin.
QUAD_FRAME_X0 = 0.0
QUAD_FRAME_Y0 = 0.0
QUAD_FRAME_SIZE = 2.0**24  # world units (metres) covered by the level-0 cell


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each int64 so there is a zero bit between
    every pair (standard 64-bit Morton 'part' sequence)."""
    v = v.astype(np.int64) & 0xFFFFFFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def morton_interleave(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Z-order code: bits of ix in even positions, iy in odd (up to 29-bit each)."""
    return _part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << 1)


def quad_cell(x, y, level: int) -> np.ndarray:
    """int64 quad-cell id at ``level`` (0..24) for world points.

    Layout: ``(morton << 5) | level`` — sorting by id groups spatially,
    and a parent's id is ``((morton >> 2) << 5) | (level-1)``.
    """
    if not 0 <= level <= 24:
        raise ValueError("level must be in 0..24")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    size = QUAD_FRAME_SIZE / (1 << level)
    ix = np.floor((x - QUAD_FRAME_X0) / size).astype(np.int64)
    iy = np.floor((y - QUAD_FRAME_Y0) / size).astype(np.int64)
    ix = np.clip(ix, 0, (1 << level) - 1 if level else 0)
    iy = np.clip(iy, 0, (1 << level) - 1 if level else 0)
    return (morton_interleave(ix, iy) << 5) | level


def quad_parent(cell_id: np.ndarray) -> np.ndarray:
    """Parent cell id one level up (vectorized)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    level = cell_id & 0x1F
    morton = cell_id >> 5
    return ((morton >> 2) << 5) | np.maximum(level - 1, 0)


def _part1by1_sql(expr: str) -> str:
    """SQL expression performing _part1by1 on ``expr`` (DuckDB int64 ops)."""
    v = f"(({expr}) & 4294967295)"
    v = f"(({v} | ({v} * 65536)) & 281470681808895)"  # << 16
    v = f"(({v} | ({v} * 256)) & 71777214294589695)"  # << 8
    v = f"(({v} | ({v} * 16)) & 1085102592571150095)"  # << 4
    v = f"(({v} | ({v} * 4)) & 3689348814741910323)"  # << 2
    v = f"(({v} | ({v} * 2)) & 6148914691236517205)"  # << 1
    return v


def quad_cell_sql(x_expr: str, y_expr: str, level: int) -> str:
    """The exact SQL equivalent of :func:`quad_cell` for the DuckDB oracle.

    Clipping is emitted with GREATEST/LEAST; shifts via multiplication
    (DuckDB `<<` also works but * keeps it ANSI-ish).
    """
    size = QUAD_FRAME_SIZE / (1 << level)
    hi = (1 << level) - 1 if level else 0
    ix = f"GREATEST(0, LEAST({hi}, CAST(FLOOR((({x_expr}) - {QUAD_FRAME_X0}) / {size!r}) AS BIGINT)))"
    iy = f"GREATEST(0, LEAST({hi}, CAST(FLOOR((({y_expr}) - {QUAD_FRAME_Y0}) / {size!r}) AS BIGINT)))"
    morton = f"({_part1by1_sql(ix)} | ({_part1by1_sql(iy)} * 2))"
    return f"(({morton}) * 32 + {level})"


# --- hex cells (pointy-top axial coordinates) ---

HEX_BASE_SIZE = 65536.0  # circumradius at res 0, world units


def _hex_size(res: int) -> float:
    return HEX_BASE_SIZE / (2.0**res)


def hex_cell(x, y, res: int) -> tuple[np.ndarray, np.ndarray]:
    """(q, r) axial hex coords at resolution ``res`` (pointy-top, cube-rounded)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    size = _hex_size(res)
    qf = (np.sqrt(3.0) / 3.0 * x - 1.0 / 3.0 * y) / size
    rf = (2.0 / 3.0 * y) / size
    # cube rounding
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.round(xf)
    ry = np.round(yf)
    rz = np.round(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_cell_center(q, r, res: int) -> tuple[np.ndarray, np.ndarray]:
    """World center of an axial hex cell."""
    size = _hex_size(res)
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    x = size * (np.sqrt(3.0) * q + np.sqrt(3.0) / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


def pack_hex(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    """Pack (res, q, r) into one int64: res<<48 | (q+2^23)<<24 | (r+2^23)."""
    q = np.asarray(q, dtype=np.int64) + (1 << 23)
    r = np.asarray(r, dtype=np.int64) + (1 << 23)
    return (np.int64(res) << 48) | (q << 24) | r
