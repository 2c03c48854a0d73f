"""LiDAR neighbourhood-model family — the heavier point-cloud tools.

Scale shape: points hash-partition into square cells of edge
``radius``; each point is emitted to its OWN cell plus any 8-neighbour
cell whose boundary lies within ``radius`` (margin copies, flagged
``own=0``) — the point-cloud analog of the raster halo exchange. One
``groupby(cell)`` then gives every owned point its full radius
neighbourhood locally, and each group's kernel is vectorized numpy
(cKDTree-free: pairwise distances within a cell are small). Own rows
are the only rows emitted, so no deduplication pass is needed.

- lidar_remove_outliers — LidarRemoveOutliers (lidar_outliers.rs:22-24):
  drop a point when |z − mean z of its neighbours (self excluded)| >
  elev_diff.
- lidar_ground_point_filter — LidarGroundPointFilter
  (lidar_ground_point_filter.rs:21-29): a point is OFF-ground when some
  neighbour below it is separated by ≥ height_threshold AND the
  inter-point slope exceeds slope_threshold.
- normal_vectors — NormalVectors (normal_vectors.rs): unit normal of
  the local PCA plane fit (smallest eigenvector), flipped to +z.
- lidar_hillshade — LidarHillshade (lidar_hillshade.rs): per-point
  hillshade from the local normal.
- lidar_tophat — LidarTophatTransform (lidar_tophat.rs): z − opening(z)
  over the neighbourhood (morphological non-ground height).
- lidar_segmentation — LidarSegmentation (lidar_segmentation.rs):
  region growing by normal similarity + z continuity; per-cell local
  labels, margin points carry both labels → driver union-find →
  broadcast relabel (same pattern as the raster clump).
- lidar_ransac_planes — LidarRansacPlanes (lidar_ransac_planes.rs):
  seeded per-neighbourhood RANSAC; inlier points take the model id.
- lidar_segmentation_based_filter — ground = segments whose normals are
  near-vertical and z-range small.
- find_flightline_edge_points, lidar_info, lidar_point_stats,
  lidar_join, lidar_classify_subset, lidar_kappa, las_to_ascii /
  las_to_shapefile / las_to_multipoint_shapefile, lidar_colourize —
  point-stream / join forms documented inline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _emit_with_halo(ds, radius: float, cols: list[str] | None = None):
    """Append cell key + own flag; margin copies go to neighbour cells
    whose square lies within ``radius`` of the point."""
    r = float(radius)

    def fn(batch: pa.Table) -> pa.Table:
        t = batch if cols is None else batch.select(cols)
        x = t["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor(x / r).astype(np.int64)
        cy = np.floor(y / r).astype(np.int64)
        tables = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    g = t.append_column("cell", pa.array(cy * 1_000_003 + cx, pa.int64()))
                    tables.append(
                        g.append_column("own", pa.array(np.ones(len(x), dtype=np.int8)))
                    )
                    continue
                ncx, ncy = cx + dx, cy + dy
                # distance from point to the neighbour cell's square
                ddx = np.maximum(np.maximum(ncx * r - x, x - (ncx + 1) * r), 0.0)
                ddy = np.maximum(np.maximum(ncy * r - y, y - (ncy + 1) * r), 0.0)
                m = np.hypot(ddx, ddy) <= r
                if not m.any():
                    continue
                idx = np.flatnonzero(m)
                g = t.take(pa.array(idx, pa.int64()))
                g = g.append_column("cell", pa.array(ncy[m] * 1_000_003 + ncx[m], pa.int64()))
                tables.append(
                    g.append_column("own", pa.array(np.zeros(len(idx), dtype=np.int8)))
                )
        return pa.concat_tables(tables)

    return ds.map_batches(fn, batch_format="pyarrow")


def _neighbour_apply(ds, radius: float, group_fn, cols: list[str] | None = None):
    """groupby(cell) → ``group_fn(g: DataFrame) -> DataFrame`` applied to
    each cell (own + margin points); the fn must return only own rows."""
    halo = _emit_with_halo(ds, radius, cols)
    return halo.groupby("cell").map_groups(group_fn, batch_format="pandas")


def lidar_remove_outliers(ds, radius: float = 2.0, elev_diff: float = 50.0):
    """Drop points with |z − neighbour mean (self excluded)| > elev_diff."""
    r = float(radius)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        own = g["own"].to_numpy() == 1
        oi = np.nonzero(own)[0]
        keep = np.ones(len(oi), dtype=bool)
        for k, i in enumerate(oi):
            d = np.hypot(x - x[i], y - y[i])
            m = (d <= r)
            m[i] = False
            if m.any():
                keep[k] = abs(z[i] - z[m].mean()) <= elev_diff
        out = g[own].iloc[keep].drop(columns=["cell", "own"])
        return out

    return _neighbour_apply(ds, radius, per_cell)


def lidar_ground_point_filter(ds, radius: float = 2.0, slope_threshold: float = 45.0,
                              height_threshold: float = 1.0, classify: bool = False):
    """Slope-based off-ground detection; ``classify`` keeps points and
    adds ``is_ground``; else off-ground points are dropped."""
    r = float(radius)
    tan_t = np.tan(np.radians(slope_threshold))

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        own = g["own"].to_numpy() == 1
        oi = np.nonzero(own)[0]
        ground = np.ones(len(oi), dtype=bool)
        for k, i in enumerate(oi):
            d = np.hypot(x - x[i], y - y[i])
            m = (d <= r) & (d > 0)
            if not m.any():
                continue
            dz = z[i] - z[m]
            below = dz >= height_threshold
            if below.any():
                slopes = dz[below] / np.maximum(d[m][below], 1e-9)
                if (slopes > tan_t).any():
                    ground[k] = False
        out = g[own].drop(columns=["cell", "own"]).copy()
        if classify:
            out["is_ground"] = ground.astype(np.int8)
            return out
        return out.iloc[ground]

    return _neighbour_apply(ds, radius, per_cell)


def _normals_for_cell(x, y, z, own_idx, radius):
    normals = np.zeros((len(own_idx), 3))
    for k, i in enumerate(own_idx):
        d = np.hypot(x - x[i], y - y[i])
        m = d <= radius
        if m.sum() < 3:
            normals[k] = (0.0, 0.0, 1.0)
            continue
        pts = np.stack([x[m], y[m], z[m]], axis=1)
        pts = pts - pts.mean(axis=0)
        cov = pts.T @ pts / len(pts)
        w, v = np.linalg.eigh(cov)
        n = v[:, 0]
        if n[2] < 0:
            n = -n
        normals[k] = n
    return normals


def normal_vectors(ds, radius: float = 2.0):
    """Append nx/ny/nz from the local PCA plane (smallest eigenvector)."""

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        own = g["own"].to_numpy() == 1
        oi = np.nonzero(own)[0]
        n = _normals_for_cell(x, y, z, oi, float(radius))
        out = g[own].drop(columns=["cell", "own"]).copy()
        out["nx"], out["ny"], out["nz"] = n[:, 0], n[:, 1], n[:, 2]
        return out

    return _neighbour_apply(ds, radius, per_cell)


def lidar_hillshade(ds, radius: float = 2.0, azimuth: float = 315.0, altitude: float = 30.0):
    """Per-point hillshade from the local normal (lidar_hillshade.rs)."""
    az = np.radians(azimuth - 90.0)
    alt = np.radians(altitude)
    sx, sy, sz = np.cos(alt) * np.cos(az), -np.cos(alt) * np.sin(az), np.sin(alt)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        own = g["own"].to_numpy() == 1
        oi = np.nonzero(own)[0]
        n = _normals_for_cell(x, y, z, oi, float(radius))
        hs = np.clip(n[:, 0] * sx + n[:, 1] * sy + n[:, 2] * sz, 0.0, 1.0)
        out = g[own].drop(columns=["cell", "own"]).copy()
        out["hillshade"] = np.round(hs * 255.0)
        return out

    return _neighbour_apply(ds, radius, per_cell)


def lidar_tophat(ds, radius: float = 2.0):
    """White tophat: z − max-over-neighbourhood(min-over-neighbourhood)
    ≈ height above the local ground surface (lidar_tophat.rs)."""
    r = float(radius)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        own = g["own"].to_numpy() == 1
        oi = np.nonzero(own)[0]
        # erosion at every point in the cell (incl. margins, needed for
        # the subsequent dilation of own points)
        ero = np.empty(len(x))
        for i in range(len(x)):
            d = np.hypot(x - x[i], y - y[i])
            ero[i] = z[d <= r].min()
        out_vals = np.empty(len(oi))
        for k, i in enumerate(oi):
            d = np.hypot(x - x[i], y - y[i])
            out_vals[k] = z[i] - ero[d <= r].max()
        out = g[own].drop(columns=["cell", "own"]).copy()
        out["tophat"] = out_vals
        return out

    return _neighbour_apply(ds, radius, per_cell)


def lidar_segmentation(ds, radius: float = 2.0, norm_diff_deg: float = 10.0,
                       max_z_diff: float = 1.0, point_id_col: str = "pid"):
    """Region growing by normal similarity + z continuity
    (lidar_segmentation.rs).

    Per-cell local segmentation (union-find over neighbour pairs that
    satisfy both thresholds); margin points — which appear in several
    cells — contribute label-equivalence pairs via a ``groupby(pid)``;
    the pairs resolve through the DISTRIBUTED min-label propagation
    (``dedup.components_minlabel``), so the driver only ever holds the
    resolved component map — O(cell-boundary equivalence labels), a tiny
    fraction of the cloud — never a per-point table. Requires a unique
    ``pid`` column."""
    import ray

    from .dedup import components_minlabel

    cos_t = np.cos(np.radians(norm_diff_deg))

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        pid = g[point_id_col].to_numpy()
        own = g["own"].to_numpy() == 1
        n = _normals_for_cell(x, y, z, np.arange(len(x)), float(radius))
        parent = np.arange(len(x))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(x)):
            d = np.hypot(x - x[i], y - y[i])
            m = (d <= radius) & (d > 0)
            for j in np.nonzero(m)[0]:
                if abs(z[i] - z[j]) <= max_z_diff and float(n[i] @ n[j]) >= cos_t:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        roots = np.array([find(i) for i in range(len(x))])
        # local label = pid of the root point (globally unique)
        lab = pid[roots]
        out = g.drop(columns=["cell"]).copy()
        out["label"] = lab
        return out

    # all rows (own + margin copies) keep their full columns + local label
    labeled = _neighbour_apply(ds, radius, per_cell)

    # a pid seen in k cells carries k labels → (min, other) equivalences
    def equiv_pairs(g: pd.DataFrame) -> pd.DataFrame:
        labs = pd.unique(g["label"])
        root = labs.min()
        others = labs[labs != root]
        return pd.DataFrame(
            {"id_a": np.full(len(others), root, dtype=np.int64),
             "id_b": others.astype(np.int64)}
        )

    pairs = (
        labeled.select_columns([point_id_col, "label"])
        .groupby(point_id_col)
        .map_groups(equiv_pairs, batch_format="pandas")
        .materialize()
    )
    comp_map: dict = {}
    if pairs.count() > 0:
        cp = components_minlabel(pairs).to_pandas()  # O(boundary labels)
        comp_map = dict(zip(cp["node"], cp["component"]))
    ref = ray.put(comp_map)

    def relabel(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        out = batch[batch["own"] == 1].drop(columns=["own"]).copy()
        lab = out.pop("label")
        seg = lab.map(m) if m else pd.Series(np.nan, index=lab.index)
        out["segment"] = seg.where(seg.notna(), lab).astype(np.int64)
        return out

    return labeled.map_batches(relabel, batch_format="pandas")


def lidar_ransac_planes(ds, radius: float = 2.0, num_iter: int = 20,
                        threshold: float = 0.15, min_inliers: int = 10, seed: int = 42):
    """Seeded per-neighbourhood RANSAC; inliers of an accepted plane get
    ``model_id`` (= cell key), others −1."""
    r = float(radius)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        x = g["x"].to_numpy(dtype=np.float64)
        y = g["y"].to_numpy(dtype=np.float64)
        z = g["z"].to_numpy(dtype=np.float64)
        own = g["own"].to_numpy() == 1
        cell = int(g["cell"].iloc[0])
        rng = np.random.default_rng(seed ^ (cell & 0x7FFFFFFF))
        pts = np.stack([x, y, z], axis=1)
        best_inl = None
        if len(pts) >= 3:
            for _ in range(num_iter):
                idx = rng.choice(len(pts), 3, replace=False)
                p0, p1, p2 = pts[idx]
                nvec = np.cross(p1 - p0, p2 - p0)
                nn = np.linalg.norm(nvec)
                if nn < 1e-12:
                    continue
                nvec = nvec / nn
                dist = np.abs((pts - p0) @ nvec)
                inl = dist <= threshold
                if best_inl is None or inl.sum() > best_inl.sum():
                    best_inl = inl
        out = g[own].drop(columns=["cell", "own"]).copy()
        if best_inl is not None and best_inl.sum() >= min_inliers:
            out["model_id"] = np.where(best_inl[own], cell, -1)
        else:
            out["model_id"] = -1
        return out

    return _neighbour_apply(ds, radius, per_cell)


def lidar_segmentation_based_filter(ds, radius: float = 2.0, norm_diff_deg: float = 10.0,
                                    max_z_diff: float = 1.0):
    """Ground = segments whose mean normal is near-vertical
    (lidar_segmentation_based_filter.rs simplification, documented)."""
    seg = lidar_segmentation(ds, radius, norm_diff_deg, max_z_diff)
    nv = normal_vectors(seg, radius)

    def per_seg(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["is_ground"] = np.int8(1) if g["nz"].mean() > 0.95 else np.int8(0)
        return g

    return nv.groupby("segment").map_groups(per_seg, batch_format="pandas")


# ---------------------------------------------------------- point-stream


def find_flightline_edge_points(ds, angle_col: str = "scan_angle",
                                line_col: str = "flightline"):
    """FindFlightlineEdgePoints: points at the max |scan angle| of their
    flightline."""

    def per_line(g: pd.DataFrame) -> pd.DataFrame:
        a = g[angle_col].abs()
        return g[a == a.max()]

    return ds.groupby(line_col).map_groups(per_line, batch_format="pandas")


def lidar_info(ds) -> dict:
    """LidarInfo: point count, extent, z range, class histogram."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        out = {
            "n": [len(x)],
            "xmin": [float(x.min())], "xmax": [float(x.max())],
            "ymin": [float(y.min())], "ymax": [float(y.max())],
            "zmin": [float(z.min())], "zmax": [float(z.max())],
        }
        return pa.table(out)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"),
        Min("xmin", alias_name="xmin"), Max("xmax", alias_name="xmax"),
        Min("ymin", alias_name="ymin"), Max("ymax", alias_name="ymax"),
        Min("zmin", alias_name="zmin"), Max("zmax", alias_name="zmax"),
    )
    info = {k: (int(v) if k == "n" else float(v)) for k, v in agg.items()}
    if "class_" in ds.schema().names:
        hist = ds.groupby("class_").count().to_pandas()
        info["classes"] = dict(zip(hist["class_"].astype(int), hist["count()"].astype(int)))
    return info


def lidar_point_stats(ds, resolution: float = 1.0):
    """LidarPointStats: per grid cell n / z min / max / range."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch["y"].to_numpy(zero_copy_only=False).astype(np.float64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor(x / resolution).astype(np.int64)
        cy = np.floor(y / resolution).astype(np.int64)
        keys = cy * 1_000_003 + cx
        uk, first, inv = np.unique(keys, return_index=True, return_inverse=True)
        n = np.bincount(inv)
        zmin = np.full(len(uk), np.inf)
        zmax = np.full(len(uk), -np.inf)
        np.minimum.at(zmin, inv, z)
        np.maximum.at(zmax, inv, z)
        return pa.table(
            {
                "cy": pa.array(cy[first], pa.int64()),
                "cx": pa.array(cx[first], pa.int64()),
                "n": pa.array(n, pa.int64()),
                "zmin": pa.array(zmin),
                "zmax": pa.array(zmax),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["cy", "cx"])
        .aggregate(
            Sum("n", alias_name="n"),
            Min("zmin", alias_name="zmin"),
            Max("zmax", alias_name="zmax"),
        )
    )


def lidar_join(ds_list):
    """LidarJoin: union of point datasets."""
    out = ds_list[0]
    for d in ds_list[1:]:
        out = out.union(d)
    return out


def lidar_classify_subset(base_ds, subset_poly, cls: int, class_col: str = "class_"):
    """LidarClassifySubset: points inside the polygon get ``cls``."""
    from ..kernels import geometry
    import ray

    xs = np.asarray(subset_poly["xs"], dtype=np.float64)
    ys = np.asarray(subset_poly["ys"], dtype=np.float64)
    ref = ray.put((xs, ys))

    def fn(batch: pa.Table) -> pa.Table:
        pxs, pys = ray.get(ref)
        inside = geometry.points_in_poly(
            batch["x"].to_numpy(zero_copy_only=False).astype(np.float64),
            batch["y"].to_numpy(zero_copy_only=False).astype(np.float64),
            pxs, pys,
        )
        old = batch[class_col].to_numpy(zero_copy_only=False)
        new = np.where(inside, cls, old)
        i = batch.schema.get_field_index(class_col)
        return batch.set_column(i, class_col, pa.array(new, batch[class_col].type))

    return base_ds.map_batches(fn, batch_format="pyarrow")


def lidar_kappa(ds_a, ds_b, id_col: str = "pid", class_col: str = "class_"):
    """LidarKappaIndex: Cohen's kappa of class columns joined on pid."""
    from .joins import hash_join_bucketed
    from .stats2 import kappa_index

    b = ds_b.map_batches(
        lambda t: pa.table({id_col: t[id_col], "class_b": t[class_col]}),
        batch_format="pyarrow",
    )
    joined = hash_join_bucketed(ds_a, b, key=id_col)
    return kappa_index(joined, class_col, "class_b")


def las_to_ascii(ds, round_to: int = 3):
    """LasToAscii: x, y, z (+intensity/class when present) as strings —
    Arrow-native (pc.round/cast/binary_join_element_wise), no pandas
    object-string assembly in the export hot path."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        parts = [
            pc.cast(pc.round(batch[c], ndigits=round_to), pa.string())
            for c in ("x", "y", "z")
        ]
        for c in ("intensity", "class_"):
            if c in batch.schema.names:
                parts.append(pc.cast(batch[c], pa.string()))
        line = pc.binary_join_element_wise(*parts, " ")
        return pa.table({"line": line})

    return ds.map_batches(fn, batch_format="pyarrow")


def las_to_shapefile(ds):
    """LasToShapefile: one POINT record per point (record table form) —
    Arrow-native casts, zero-copy where dtypes already match."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        cols = {c: pc.cast(batch[c], pa.float64()) for c in ("x", "y", "z")}
        for c in ("intensity", "class_"):
            if c in batch.schema.names:
                cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def las_to_multipoint_shapefile(ds, line_col: str = "flightline"):
    """LasToMultipointShapefile: one MULTIPOINT record per flightline."""

    def per_line(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "flightline": [g[line_col].iloc[0]],
                "xs": [g["x"].to_numpy(dtype=np.float64).tolist()],
                "ys": [g["y"].to_numpy(dtype=np.float64).tolist()],
                "zs": [g["z"].to_numpy(dtype=np.float64).tolist()],
            }
        )

    return ds.groupby(line_col).map_groups(per_line, batch_format="pandas")


def lidar_colourize(points_ds, tiles_ds, spec):
    """LidarColourize: sample the tile raster value at each point into a
    ``colour`` column — points co-partition to their tile (keyed zip
    with the tile rows, both sides stream)."""
    from ..kernels import codecs

    gs = spec.grid_spec()
    tpx = spec.tile_px

    def key_points(batch: pa.Table) -> pa.Table:
        col = np.floor(
            (batch["x"].to_numpy(zero_copy_only=False) - gs.west) / spec.res
        ).astype(np.int64)
        row = np.floor(
            (gs.north - batch["y"].to_numpy(zero_copy_only=False)) / spec.res
        ).astype(np.int64)
        t = batch.append_column("__r", pa.array(row, pa.int64()))
        t = t.append_column("__c", pa.array(col, pa.int64()))
        t = t.append_column(
            "tkey", pa.array((row // tpx) * spec.tiles_x + (col // tpx), pa.int64())
        )
        return t.append_column("__side", pa.array(np.zeros(len(row), dtype=np.int8)))

    def key_tiles(batch: pa.Table) -> pa.Table:
        tr = batch["tile_row"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = batch["tile_col"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch.append_column("tkey", pa.array(tr * spec.tiles_x + tc, pa.int64()))
        return t.append_column("__side", pa.array(np.ones(len(tr), dtype=np.int8)))

    pts = points_ds.map_batches(key_points, batch_format="pyarrow")
    tls = tiles_ds.map_batches(key_tiles, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        tile_rows = g[g["__side"] == 1]
        pts_rows = g[g["__side"] == 0]
        if not len(pts_rows):
            return pd.DataFrame(
                {c: [] for c in pts_rows.columns if c not in ("__side", "tkey", "__r", "__c",
                                                              "tile_row", "tile_col", "bytes", "fmt")}
            ).assign(colour=[])
        out = pts_rows.drop(
            columns=[c for c in ("__side", "tkey", "tile_row", "tile_col", "bytes", "fmt") if c in pts_rows],
            errors="ignore",
        ).copy()
        if len(tile_rows):
            grid = codecs.decode_tile(bytes(tile_rows["bytes"].iloc[0]), tile_rows["fmt"].iloc[0])
            # union with the tile side leaves __r/__c as float (nulls on
            # tile rows) — cast back for indexing
            r = out["__r"].to_numpy().astype(np.int64) % tpx
            c = out["__c"].to_numpy().astype(np.int64) % tpx
            ok = (r >= 0) & (r < grid.shape[0]) & (c >= 0) & (c < grid.shape[1])
            vals = np.where(ok, grid[np.clip(r, 0, grid.shape[0] - 1),
                                     np.clip(c, 0, grid.shape[1] - 1)], np.nan)
            out["colour"] = vals
        else:
            out["colour"] = np.nan
        return out.drop(columns=["__r", "__c"])

    return pts.union(tls).groupby("tkey").map_groups(merge, batch_format="pandas")
