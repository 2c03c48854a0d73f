"""Vector fixture layers (polygons, points, attribute side-table) + part slicing.

Arrow schemas follow SURVEY.md §1.6: multi-part geometries as nested
lists sharing one flat point array (the shapefile parts/points layout,
/root/reference/src/vector/shapefile/geometry.rs:13-30), with bbox columns
for pruning.

Two distinct part end-point formulas exist in the reference and BOTH are
reproduced:

- ``part_slices``       — full closed ring incl. the duplicated closing
  vertex: end = parts[p+1]-1 or num_points-1 (clip.rs:246-252). Feed to
  point-in-poly.
- ``part_slices_for_hole`` — the is_hole vertex run EXCLUDING the closing
  vertex, with the reference's quirk that the second-to-last part's end
  also falls to num_points-2 (geometry.rs:328-335). Feed to is_hole_ring.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import geometry

POLY_SCHEMA = pa.schema(
    [
        ("record_id", pa.int32()),
        ("parts", pa.list_(pa.int32())),
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
        ("x_min", pa.float64()),
        ("x_max", pa.float64()),
        ("y_min", pa.float64()),
        ("y_max", pa.float64()),
        ("name", pa.string()),
        ("zone", pa.int32()),
    ]
)

POINT_SCHEMA = pa.schema(
    [
        ("record_id", pa.int32()),
        ("x", pa.float64()),
        ("y", pa.float64()),
        ("label", pa.string()),
        ("value", pa.float64()),
        ("fkey", pa.string()),
    ]
)


def part_slices(parts: np.ndarray, num_points: int):
    """[(first, last_inclusive)] per part — the closed-ring slice
    (clip.rs:246-252): last = parts[p+1]-1, final part → num_points-1."""
    out = []
    n = len(parts)
    for p in range(n):
        first = int(parts[p])
        last = int(parts[p + 1]) - 1 if p < n - 1 else num_points - 1
        out.append((first, last))
    return out


def part_slices_for_hole(parts: np.ndarray, num_points: int):
    """[(st, end_inclusive)] per part for the is_hole test
    (geometry.rs:328-335): end = parts[p+1]-2 when p < num_parts-2, else
    num_points-2 (the reference's exact quirk, reproduced verbatim)."""
    out = []
    n = len(parts)
    for p in range(n):
        st = int(parts[p])
        end = int(parts[p + 1]) - 2 if p < n - 2 else num_points - 2
        out.append((st, end))
    return out


def record_is_hole(parts: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> list[bool]:
    """Per-part hole flags for one polygon record (geometry.rs:305-412)."""
    flags = []
    for st, end in part_slices_for_hole(parts, len(xs)):
        if end - st + 1 < 3:
            flags.append(False)
        else:
            flags.append(geometry.is_hole_ring(xs[st : end + 1], ys[st : end + 1]))
    return flags


def _close(ring: list[tuple[float, float]]) -> list[tuple[float, float]]:
    if ring[0] != ring[-1]:
        ring = ring + [ring[0]]
    return ring


def make_polygon_record(record_id: int, rings: list[list[tuple[float, float]]], name: str, zone: int):
    """Build one multi-part record from rings (auto-closed). Callers supply
    ring orientation: clockwise = shell, counter-clockwise = hole
    (geometry.rs:318 comment)."""
    parts = []
    xs: list[float] = []
    ys: list[float] = []
    for ring in rings:
        ring = _close(list(ring))
        parts.append(len(xs))
        xs.extend(p[0] for p in ring)
        ys.extend(p[1] for p in ring)
    return {
        "record_id": record_id,
        "parts": parts,
        "xs": xs,
        "ys": ys,
        "x_min": min(xs),
        "x_max": max(xs),
        "y_min": min(ys),
        "y_max": max(ys),
        "name": name,
        "zone": zone,
    }


def _rect(x0, y0, x1, y1, ccw=False):
    """Rectangle ring; clockwise by default in (x→E, y→N) coords (a shell)."""
    ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]
    if ccw:
        ring = ring[::-1]
    return ring


def fixture_polygons(x0: float = 0.0, y0: float = 0.0, s: float = 1000.0) -> pa.Table:
    """FIXTURES.md F2 — ~12 polygons over a [x0, x0+s]² frame: convex,
    concave, multi-part with holes, sliver, boundary-edge cases,
    overlapping pair (last-part-wins), plus attrs."""
    recs = []
    # 1: big convex (clockwise shell)
    recs.append(make_polygon_record(1, [_rect(x0 + 50, y0 + 50, x0 + 350, y0 + 350)], "convex_a", 1))
    # 2: concave L-shape (clockwise)
    L = [
        (x0 + 400, y0 + 50),
        (x0 + 400, y0 + 300),
        (x0 + 500, y0 + 300),
        (x0 + 500, y0 + 150),
        (x0 + 620, y0 + 150),
        (x0 + 620, y0 + 50),
    ]
    recs.append(make_polygon_record(2, [L[::-1]], "concave_l", 1))
    # 3: multi-part with two holes (shell CW, holes CCW)
    recs.append(
        make_polygon_record(
            3,
            [
                _rect(x0 + 50, y0 + 450, x0 + 400, y0 + 800),
                _rect(x0 + 100, y0 + 500, x0 + 180, y0 + 580, ccw=True),
                _rect(x0 + 250, y0 + 650, x0 + 330, y0 + 730, ccw=True),
            ],
            "donut",
            2,
        )
    )
    # 4: thin sliver crossing tile boundaries
    recs.append(make_polygon_record(4, [_rect(x0 + 450, y0 + 400, x0 + 950, y0 + 420)], "sliver", 2))
    # 5: polygon whose edges pass exactly through lattice coordinates
    recs.append(make_polygon_record(5, [_rect(x0 + 700, y0 + 500, x0 + 800, y0 + 600)], "edge_exact", 3))
    # 6 & 7: overlapping pair (exercises the all-parts scan; later record's
    # part is scanned after earlier ones)
    recs.append(make_polygon_record(6, [_rect(x0 + 600, y0 + 650, x0 + 750, y0 + 800)], "overlap_a", 3))
    recs.append(make_polygon_record(7, [_rect(x0 + 700, y0 + 700, x0 + 850, y0 + 850)], "overlap_b", 3))
    # 8: triangle
    recs.append(
        make_polygon_record(8, [[(x0 + 850, y0 + 50), (x0 + 900, y0 + 250), (x0 + 950, y0 + 50)]], "tri", 4)
    )
    # 9: single-part shell with one hole (hole CCW) — donut2
    recs.append(
        make_polygon_record(
            9,
            [
                _rect(x0 + 500, y0 + 870, x0 + 700, y0 + 980),
                _rect(x0 + 560, y0 + 900, x0 + 640, y0 + 950, ccw=True),
            ],
            "donut2",
            4,
        )
    )
    # 10: small box inside donut's first hole (island)
    recs.append(make_polygon_record(10, [_rect(x0 + 120, y0 + 520, x0 + 160, y0 + 560)], "island", 5))
    # 11: pentagon (convex, CW)
    pent = [
        (x0 + 150, y0 + 880),
        (x0 + 230, y0 + 940),
        (x0 + 310, y0 + 880),
        (x0 + 280, y0 + 800),
        (x0 + 180, y0 + 800),
    ]
    recs.append(make_polygon_record(11, [pent[::-1]], "pentagon", 5))
    # 12: zig-zag concave polygon
    zz = [
        (x0 + 820, y0 + 300),
        (x0 + 860, y0 + 420),
        (x0 + 900, y0 + 330),
        (x0 + 940, y0 + 430),
        (x0 + 970, y0 + 300),
    ]
    recs.append(make_polygon_record(12, [zz[::-1]], "zigzag", 6))

    cols = {n: [r[n] for r in recs] for n in POLY_SCHEMA.names}
    return pa.Table.from_arrays(
        [pa.array(cols[n], type=POLY_SCHEMA.field(n).type) for n in POLY_SCHEMA.names],
        schema=POLY_SCHEMA,
    )


def fixture_points(
    n: int = 5000, x0: float = 0.0, y0: float = 0.0, s: float = 1000.0, seed: int = 42
) -> pa.Table:
    """FIXTURES.md F3 — uniform points + cluster inside holes + boundary /
    vertex / lattice points; fkey joins to the attrs side-table."""
    rng = np.random.RandomState(seed)
    xs = list(x0 + rng.uniform(0.0, s, n - 40))
    ys = list(y0 + rng.uniform(0.0, s, n - 40))
    # points exactly on polygon 5's edges and vertices (boundary = outside)
    for t in np.linspace(0.0, 1.0, 10):
        xs.append(x0 + 700 + 100 * float(t))
        ys.append(y0 + 500.0)
    for t in np.linspace(0.0, 1.0, 10):
        xs.append(x0 + 700.0)
        ys.append(y0 + 500 + 100 * float(t))
    # cluster inside donut hole 1 (should be OUT via hole rule)
    xs.extend(x0 + rng.uniform(110, 170, 10))
    ys.extend(y0 + rng.uniform(510, 570, 10))
    # lattice points on integer cell centers
    xs.extend(x0 + np.arange(10) * 100.0 + 50.0)
    ys.extend(y0 + np.arange(10) * 100.0 + 50.0)
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    m = len(xs)
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(1, m + 1, dtype=np.int32)),
            pa.array(xs),
            pa.array(ys),
            pa.array([f"p{i}" for i in range(m)], type=pa.string()),
            pa.array(rng.uniform(0.0, 100.0, m)),
            pa.array([f"k{i % 97}" for i in range(m)], type=pa.string()),
        ],
        schema=POINT_SCHEMA,
    )


def fixture_attrs(seed: int = 42) -> pa.Table:
    """FIXTURES.md F4 — side table with duplicate fkeys (last-dup-wins)
    and missing keys (left-outer Null padding), join_tables.rs:316-361."""
    rng = np.random.RandomState(seed + 7)
    fkeys = [f"k{i}" for i in range(80)] + [f"k{i}" for i in range(0, 20)]  # dups for k0..k19
    return pa.Table.from_arrays(
        [
            pa.array(fkeys, type=pa.string()),
            pa.array(rng.randint(0, 1000, len(fkeys)).astype(np.int32)),
            pa.array(rng.uniform(0, 1, len(fkeys))),
            pa.array([f"payload_{i}" for i in range(len(fkeys))], type=pa.string()),
        ],
        names=["fkey", "payload_a", "payload_b", "payload_c"],
    )
