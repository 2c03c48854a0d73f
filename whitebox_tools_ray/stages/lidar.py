"""LiDAR point-stream operators (SURVEY §2.7) over columnar point
Datasets (x, y, z, + optional intensity / class_ / scan_angle /
gps_time / flightline columns — the LAS PointData analog,
src/lidar/point_data.rs:183-187).

Every operator is a vectorized ``map_batches`` filter/projection or a
quantized-cell groupby — the natural columnar wins of the Ray Data
model. Heavier reference tools with neighborhood models
(LidarGroundPointFilter, RANSAC planes, segmentation) remain open; the
ones here reproduce the reference's simple point-stream semantics
exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def filter_lidar_classes(ds, exclude: list[int], class_col: str = "class_"):
    """FilterLidarClasses (filter_lidar_classes.rs): drop points whose
    class is in the exclusion list."""
    vals = pa.array(sorted(set(int(c) for c in exclude)))

    def fn(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[class_col], value_set=vals.cast(batch[class_col].type))
        return batch.filter(pc.invert(m))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_scan_angles(ds, threshold: float, angle_col: str = "scan_angle"):
    """FilterLidarScanAngles (filter_lidar_scan_angles.rs): drop points
    with |scan angle| above the threshold."""

    def fn(batch: pa.Table) -> pa.Table:
        a = pc.abs(batch[angle_col].cast(pa.float64()))
        return batch.filter(pc.less_equal(a, pa.scalar(float(threshold))))

    return ds.map_batches(fn, batch_format="pyarrow")


def elevation_slice(ds, minz: float, maxz: float, z_col: str = "z",
                    cls: int | None = None, class_col: str = "class_"):
    """LidarElevationSlice (lidar_elevation_slice.rs): keep points with
    minz ≤ z ≤ maxz; optionally reclass the survivors to ``cls``."""

    def fn(batch: pa.Table) -> pa.Table:
        z = batch[z_col].cast(pa.float64())
        m = pc.and_(pc.greater_equal(z, pa.scalar(float(minz))),
                    pc.less_equal(z, pa.scalar(float(maxz))))
        out = batch.filter(m)
        if cls is not None and class_col in out.schema.names:
            idx = out.schema.get_field_index(class_col)
            out = out.set_column(
                idx, class_col, pa.array(np.full(out.num_rows, cls, dtype=np.int32), out[class_col].type)
            )
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def lidar_thin(ds, resolution: float, method: str = "first",
               x_col: str = "x", y_col: str = "y", z_col: str = "z",
               id_col: str = "point_id"):
    """LidarThin (lidar_thin.rs): one survivor per ``resolution`` grid
    cell — 'first' (lowest id = scan order), 'lowest' or 'highest' z.
    One keyed shuffle on the quantized cell."""

    def add_key(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor(x / resolution).astype(np.int64)
        cy = np.floor(y / resolution).astype(np.int64)
        return batch.append_column("__cell", pa.array(cx * 2_000_003 + cy, pa.int64()))

    # salt partitions (one vectorized idxmin/idxmax per partition) — a
    # pandas call per DISTINCT CELL is millions of tiny groups at scale
    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__salt", pa.array(batch["__cell"].to_numpy(zero_copy_only=False) % 64))

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby("__cell", sort=False)
        if method == "lowest":
            idx = grp[z_col].idxmin()
        elif method == "highest":
            idx = grp[z_col].idxmax()
        else:
            idx = grp[id_col].idxmin()
        return g.loc[idx].drop(columns=["__cell", "__salt"])

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(keep, batch_format="pandas")
    )


def point_density(ds, resolution: float, x_col: str = "x", y_col: str = "y"):
    """LidarPointDensity (lidar_point_density.rs cell form): points per
    unit area on a ``resolution`` grid. Returns Dataset[cell_x, cell_y,
    density] — partial counts per batch, one tiny groupby."""
    from ray.data.aggregate import Sum

    area = resolution * resolution

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor(x / resolution).astype(np.int64)
        cy = np.floor(y / resolution).astype(np.int64)
        key = cx * 2_000_003 + cy
        u, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = cell // 2_000_003
        cy = cell - cx * 2_000_003
        return pa.table(
            {
                "cell_x": pa.array(cx, pa.int64()),
                "cell_y": pa.array(cy, pa.int64()),
                "density": pa.array(n / area, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def flightline_overlap(ds, resolution: float, x_col: str = "x", y_col: str = "y",
                       fl_col: str = "flightline"):
    """FlightlineOverlap (flightline_overlap.rs): per grid cell, the
    number of DISTINCT flightlines with points in the cell."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        fl = batch[fl_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = np.floor(x / resolution).astype(np.int64)
        cy = np.floor(y / resolution).astype(np.int64)
        key = cx * 2_000_003 + cy
        u = np.unique(np.column_stack([key, fl]), axis=0)
        return pa.table(
            {
                "cell": pa.array(u[:, 0], pa.int64()),
                "fl": pa.array(u[:, 1], pa.int64()),
            }
        )

    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__salt", pa.array(batch["cell"].to_numpy(zero_copy_only=False) % 64))

    def count(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("cell", sort=False)["fl"].nunique().reset_index()
        cell = agg["cell"].to_numpy(np.int64)
        return pd.DataFrame(
            {"cell_x": cell // 2_000_003,
             "cell_y": cell - (cell // 2_000_003) * 2_000_003,
             "n_flightlines": agg["fl"].to_numpy(np.int64)}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(count, batch_format="pandas")
    )


def classify_overlap_points(ds, resolution: float, x_col: str = "x", y_col: str = "y",
                            fl_col: str = "flightline", gps_col: str = "gps_time"):
    """ClassifyOverlapPoints (classify_overlap_points.rs semantics,
     'keep earliest flightline' policy): in cells visited by multiple
    flightlines, points NOT from the earliest (min gps_time) flightline
    are flagged ``overlap=True``."""

    def add_key(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor(x / resolution).astype(np.int64)
        cy = np.floor(y / resolution).astype(np.int64)
        return batch.append_column("__cell", pa.array(cx * 2_000_003 + cy, pa.int64()))

    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__salt", pa.array(batch["__cell"].to_numpy(zero_copy_only=False) % 64))

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        first_idx = g.groupby("__cell", sort=False)[gps_col].idxmin()
        first_fl = g.loc[first_idx].set_index("__cell")[fl_col]
        g = g.copy()
        g["overlap"] = g[fl_col].to_numpy() != first_fl.reindex(g["__cell"]).to_numpy()
        return g.drop(columns=["__cell", "__salt"])

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(mark, batch_format="pandas")
    )
