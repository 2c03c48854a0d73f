"""Per-record polygon shape metrics — the gis_analysis metric family.

Each reference tool (~250-550 LoC each, SURVEY.md §2.4) appends one
attribute per record; here they are one ``map_batches`` stage computing
any subset of metrics per polygon record with the kernel library:

- AREA        — polygon_area (poly_area.rs:12, holes subtract)
- PERIMETER   — polygon_perimeter (poly_perimeter.rs:12, all rings)
- COMPACT     — CompactnessRatio: P / (2√(πA))
- ELONGATION  — ElongationRatio: 1 − short/long axis of the min box
  (minimum_bounding_box.rs rotating calipers)
- P-A_RATIO   — PerimeterAreaRatio: P / A
- MBB_AREA / MBB_LONG / MBB_SHORT — minimum bounding box metrics
- MBC_RADIUS  — MinimumBoundingCircle radius (smallest_enclosing_circle.rs)
- HULL_PTS    — MinimumConvexHull vertex count
- CENTROID_X/Y— CentroidVector: mean of shell vertices (reference uses
  vertex-average centroid, centroid_vector.rs)
- HOLE_PROP   — HoleProportion: hole area / shell area
- LINEARITY   — LinearityIndex: r² of the regression through vertices

Hole handling: shells ADD area, holes SUBTRACT (classic shapefile
convention; is_hole per geometry.rs:305-412).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..kernels import geometry
from ..sources.vectors import part_slices, record_is_hole

ALL_METRICS = (
    "AREA",
    "PERIMETER",
    "COMPACT",
    "ELONGATION",
    "PA_RATIO",
    "MBB_AREA",
    "MBB_LONG",
    "MBB_SHORT",
    "MBC_RADIUS",
    "HULL_PTS",
    "CENTROID_X",
    "CENTROID_Y",
    "HOLE_PROP",
    "LINEARITY",
    "RC_CIRCLE",
    "COMPLEXITY",
    "ORIENT",
    "GY_RADIUS",
)


def record_metrics(parts: np.ndarray, xs: np.ndarray, ys: np.ndarray, metrics) -> dict[str, float]:
    holes = record_is_hole(parts, xs, ys)
    slices = part_slices(parts, len(xs))
    shell_area = 0.0
    hole_area = 0.0
    perimeter = 0.0
    for p, (first, last) in enumerate(slices):
        rx, ry = xs[first : last + 1], ys[first : last + 1]
        a = geometry.polygon_area(rx, ry)
        if holes[p]:
            hole_area += a
        else:
            shell_area += a
        perimeter += geometry.polygon_perimeter(rx, ry)
    area = shell_area - hole_area
    out: dict[str, float] = {}
    need = set(metrics)
    if "AREA" in need:
        out["AREA"] = area
    if "PERIMETER" in need:
        out["PERIMETER"] = perimeter
    if "COMPACT" in need:
        out["COMPACT"] = perimeter / (2.0 * math.sqrt(math.pi * area)) if area > 0 else float("nan")
    if "PA_RATIO" in need:
        out["PA_RATIO"] = perimeter / area if area else float("nan")
    if need & {"ELONGATION", "MBB_AREA", "MBB_LONG", "MBB_SHORT"}:
        corners, mbb_area = geometry.minimum_bounding_box(xs, ys)
        e1 = math.hypot(*(corners[1] - corners[0]))
        e2 = math.hypot(*(corners[2] - corners[1]))
        long_ax, short_ax = max(e1, e2), min(e1, e2)
        out.update(
            {
                k: v
                for k, v in {
                    "MBB_AREA": mbb_area,
                    "MBB_LONG": long_ax,
                    "MBB_SHORT": short_ax,
                    "ELONGATION": 1.0 - short_ax / long_ax if long_ax else float("nan"),
                }.items()
                if k in need
            }
        )
    if "MBC_RADIUS" in need:
        out["MBC_RADIUS"] = geometry.smallest_enclosing_circle(xs, ys)[2]
    if "HULL_PTS" in need:
        out["HULL_PTS"] = float(len(geometry.convex_hull(xs, ys)))
    if need & {"CENTROID_X", "CENTROID_Y"}:
        # vertex-average over shell rings excluding closing duplicates
        sx = sy = 0.0
        n = 0
        for p, (first, last) in enumerate(slices):
            if holes[p]:
                continue
            rx, ry = xs[first:last], ys[first:last]  # drop closing vertex
            sx += float(np.sum(rx))
            sy += float(np.sum(ry))
            n += len(rx)
        if "CENTROID_X" in need:
            out["CENTROID_X"] = sx / n if n else float("nan")
        if "CENTROID_Y" in need:
            out["CENTROID_Y"] = sy / n if n else float("nan")
    if "HOLE_PROP" in need:
        out["HOLE_PROP"] = hole_area / shell_area if shell_area else 0.0
    if "LINEARITY" in need:
        vx = xs - xs.mean()
        vy = ys - ys.mean()
        sxx, syy, sxy = float(vx @ vx), float(vy @ vy), float(vx @ vy)
        denom = sxx * syy
        out["LINEARITY"] = (sxy * sxy) / denom if denom else 1.0
    if "RC_CIRCLE" in need:
        # RelatedCircumscribingCircle (related_circumscribing_circle.rs:23-27):
        # 1 − A/Ac, Ac = smallest enclosing circle area
        rad = geometry.smallest_enclosing_circle(xs, ys)[2]
        ac = math.pi * rad * rad
        out["RC_CIRCLE"] = 1.0 - area / ac if ac > 0 else float("nan")
    if "COMPLEXITY" in need:
        # ShapeComplexityIndex (shape_complexity_index.rs:25-33): 1 − A/Ah
        hidx = geometry.convex_hull(xs, ys)  # vertex INDICES
        ah = geometry.polygon_area(xs[hidx], ys[hidx])
        out["COMPLEXITY"] = 1.0 - area / ah if ah > 0 else 0.0
    if "ORIENT" in need:
        # PatchOrientation (patch_orientation.rs:16-21): RMA regression on
        # the exterior hull nodes; slope sign from covariance; degrees
        # from north.
        hidx = geometry.convex_hull(xs, ys)
        hx = xs[hidx] - xs[hidx].mean()
        hy = ys[hidx] - ys[hidx].mean()
        sxx_h = float(hx @ hx)
        syy_h = float(hy @ hy)
        sxy_h = float(hx @ hy)
        if sxx_h == 0.0:
            out["ORIENT"] = 0.0  # vertical line → due north
        else:
            slope = math.copysign(math.sqrt(syy_h / sxx_h), sxy_h) if syy_h > 0 else 0.0
            out["ORIENT"] = (90.0 - math.degrees(math.atan(slope))) % 180.0
    if "GY_RADIUS" in need:
        # radius of gyration of the vertex set: mean distance to centroid
        cx, cy = xs.mean(), ys.mean()
        out["GY_RADIUS"] = float(np.hypot(xs - cx, ys - cy).mean())
    return out


def polygon_metrics(poly_ds, metrics=ALL_METRICS, round_to: int = 6):
    """Dataset of POLY_SCHEMA records → record_id + requested metrics."""

    def per_batch(batch: pa.Table) -> pa.Table:
        rid = batch["record_id"].to_pylist()
        parts_col = batch["parts"].to_pylist()
        xs_col = batch["xs"].to_pylist()
        ys_col = batch["ys"].to_pylist()
        rows = {m: [] for m in metrics}
        for parts, xs, ys in zip(parts_col, xs_col, ys_col):
            vals = record_metrics(
                np.asarray(parts, dtype=np.int64),
                np.asarray(xs, dtype=np.float64),
                np.asarray(ys, dtype=np.float64),
                metrics,
            )
            for m in metrics:
                rows[m].append(round(vals[m], round_to) if np.isfinite(vals[m]) else None)
        out = {"record_id": pa.array(rid, pa.int32())}
        for m in metrics:
            out[m] = pa.array(rows[m], pa.float64())
        return pa.table(out)

    return poly_ds.map_batches(per_batch, batch_format="pyarrow")


def polygon_axes(poly_ds, which: str = "long", round_to: int = 6):
    """PolygonLongAxis / PolygonShortAxis (polygon_long_axis.rs): the line
    through the MBB centre parallel to its long (short) side, with the
    side's length. Returns record_id, x1, y1, x2, y2."""

    def per_batch(batch: pa.Table) -> pa.Table:
        rid = batch["record_id"].to_pylist()
        out = {"record_id": [], "x1": [], "y1": [], "x2": [], "y2": []}
        for r, xs, ys in zip(rid, batch["xs"].to_pylist(), batch["ys"].to_pylist()):
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            corners, _a = geometry.minimum_bounding_box(xs, ys)
            e1 = corners[1] - corners[0]
            e2 = corners[2] - corners[1]
            l1, l2 = math.hypot(*e1), math.hypot(*e2)
            if (l1 >= l2) == (which == "long"):
                axis, length = e1, l1
            else:
                axis, length = e2, l2
            cx, cy = corners.mean(axis=0)
            ux, uy = (axis / (math.hypot(*axis) or 1.0)) * (length / 2.0)
            out["record_id"].append(r)
            out["x1"].append(round(cx - ux, round_to))
            out["y1"].append(round(cy - uy, round_to))
            out["x2"].append(round(cx + ux, round_to))
            out["y2"].append(round(cy + uy, round_to))
        return pa.table(
            {
                "record_id": pa.array(out["record_id"], pa.int32()),
                **{k: pa.array(out[k], pa.float64()) for k in ("x1", "y1", "x2", "y2")},
            }
        )

    return poly_ds.map_batches(per_batch, batch_format="pyarrow")


def minimum_bounding_envelope(poly_ds, round_to: int = 6):
    """MinimumBoundingEnvelope (minimum_bounding_envelope.rs): per-feature
    axis-aligned box."""

    def per_batch(batch: pa.Table) -> pa.Table:
        rid = batch["record_id"].to_pylist()
        cols = {"record_id": [], "xmin": [], "xmax": [], "ymin": [], "ymax": []}
        for r, xs, ys in zip(rid, batch["xs"].to_pylist(), batch["ys"].to_pylist()):
            xs = np.asarray(xs)
            ys = np.asarray(ys)
            cols["record_id"].append(r)
            cols["xmin"].append(round(float(xs.min()), round_to))
            cols["xmax"].append(round(float(xs.max()), round_to))
            cols["ymin"].append(round(float(ys.min()), round_to))
            cols["ymax"].append(round(float(ys.max()), round_to))
        return pa.table(
            {
                "record_id": pa.array(cols["record_id"], pa.int32()),
                **{k: pa.array(cols[k], pa.float64()) for k in ("xmin", "xmax", "ymin", "ymax")},
            }
        )

    return poly_ds.map_batches(per_batch, batch_format="pyarrow")


def medoid(poly_ds, round_to: int = 6):
    """Medoid (medoid.rs:17-24): per feature, the NODE nearest the
    axis-wise median of the feature's nodes."""

    def per_batch(batch: pa.Table) -> pa.Table:
        rid = batch["record_id"].to_pylist()
        cols = {"record_id": [], "x": [], "y": []}
        for r, xs, ys in zip(rid, batch["xs"].to_pylist(), batch["ys"].to_pylist()):
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            mx, my = np.median(xs), np.median(ys)
            j = int(np.argmin((xs - mx) ** 2 + (ys - my) ** 2))
            cols["record_id"].append(r)
            cols["x"].append(round(float(xs[j]), round_to))
            cols["y"].append(round(float(ys[j]), round_to))
        return pa.table(
            {
                "record_id": pa.array(cols["record_id"], pa.int32()),
                "x": pa.array(cols["x"], pa.float64()),
                "y": pa.array(cols["y"], pa.float64()),
            }
        )

    return poly_ds.map_batches(per_batch, batch_format="pyarrow")


def layer_footprint(poly_ds):
    """LayerFootprint (layer_footprint.rs): bounding box of the whole
    layer — a tiny min/max aggregate."""
    from ray.data.aggregate import Max, Min

    def partial(batch: pa.Table) -> pa.Table:
        xs = [np.asarray(v) for v in batch["xs"].to_pylist()]
        ys = [np.asarray(v) for v in batch["ys"].to_pylist()]
        return pa.table(
            {
                "xmin": [float(min(v.min() for v in xs))] if xs else [np.inf],
                "xmax": [float(max(v.max() for v in xs))] if xs else [-np.inf],
                "ymin": [float(min(v.min() for v in ys))] if ys else [np.inf],
                "ymax": [float(max(v.max() for v in ys))] if ys else [-np.inf],
            }
        )

    agg = poly_ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Min("xmin", alias_name="xmin"), Max("xmax", alias_name="xmax"),
        Min("ymin", alias_name="ymin"), Max("ymax", alias_name="ymax"),
    )
    return {k: float(v) for k, v in agg.items()}
