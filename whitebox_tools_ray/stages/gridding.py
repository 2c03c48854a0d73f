"""Points → raster gridding (interpolation) — the SJ + stateful-index
family (SURVEY.md §2.4 gridding table).

Reference semantics:
- IdwInterpolation (gis_analysis/idw_interpolation.rs): per output cell,
  weights 1/d^p over neighbors within a radius (FRS) or k nearest
  (kdtree); value = Σ w z / Σ w.
- NearestNeighbourGridding: value of the single nearest point.
- BlockMaximum/MinimumGridding: per-cell extreme of the points that fall
  in the cell (a pure GBA on cell id — no index needed).

Ray-Data design: output tiles stream through an ACTOR POOL whose
``__init__`` receives the point layer partitioned by tile with a
neighbor-margin duplication of ``radius`` (each point is also assigned
to any tile whose window+margin contains it) — so every tile's
interpolation is local. Points are the broadcast side here; for huge
point sets the same stage runs after a groupby co-partition on tile id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.frs import FixedRadiusSearch2D
from ..kernels.grid import GridSpec


def _points_by_tile(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray, spec, margin: float
) -> dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Assign each point to every tile whose window+margin contains it
    (the neighbor-duplication co-partitioning)."""
    gs = spec.grid_spec()
    tile_w = spec.tile_px * gs.res_x
    out: dict[int, list] = {}
    t0x = np.floor((px - margin - gs.west) / tile_w).astype(np.int64)
    t1x = np.floor((px + margin - gs.west) / tile_w).astype(np.int64)
    t0y = np.floor((gs.north - (py + margin)) / tile_w).astype(np.int64)
    t1y = np.floor((gs.north - (py - margin)) / tile_w).astype(np.int64)
    for i in range(len(px)):
        for tr in range(max(t0y[i], 0), min(t1y[i], spec.tiles_y - 1) + 1):
            for tc in range(max(t0x[i], 0), min(t1x[i], spec.tiles_x - 1) + 1):
                out.setdefault(tr * spec.tiles_x + tc, []).append(i)
    return {
        tid: (px[np.array(ix)], py[np.array(ix)], pz[np.array(ix)]) for tid, ix in out.items()
    }


def _interp_points_tile(px, py, pz, tid: int, spec, gs: GridSpec, method: str,
                        radius: float, power: float,
                        frs: FixedRadiusSearch2D | None = None,
                        min_points: int = 0,
                        max_dist: float = np.inf) -> np.ndarray:
    """Interpolate one tile from its (margin-duplicated) point set —
    shared by the broadcast actor and the co-partition path, so both
    produce identical values for identical per-tile point sets."""
    tpx = spec.tile_px
    tr, tc = tid // spec.tiles_x, tid % spec.tiles_x
    out = np.full((tpx, tpx), gs.nodata)
    if len(px) == 0:
        return out
    # canonical point order: the weighted sums reassociate under
    # reordering (~1e-14), and the co-partition path's group concat
    # order is nondeterministic — sort so both paths sum identically
    order = np.lexsort((pz, py, px))
    px, py, pz = px[order], py[order], pz[order]
    if frs is not None and not np.array_equal(order, np.arange(len(order))):
        frs = None
    rows = np.arange(tr * tpx, (tr + 1) * tpx)
    cols = np.arange(tc * tpx, (tc + 1) * tpx)
    ys = gs.y_from_row(rows)
    xs = gs.x_from_col(cols)
    # vectorized path: full (cells × points) distance matrix when it
    # fits comfortably; FRS per-cell loop otherwise
    if len(px) * tpx * tpx <= 5_000_000:
        gx, gy = np.meshgrid(xs, ys)
        d = np.hypot(gx.ravel()[:, None] - px[None, :], gy.ravel()[:, None] - py[None, :])
        if method == "idw":
            with np.errstate(divide="ignore"):
                w = np.where(d <= radius, 1.0 / d**power, 0.0)
            exact = d == 0.0
            has_exact = exact.any(axis=1)
            wsum = w.sum(axis=1)
            # idw_interpolation.rs:581: a cell interpolates only when the
            # radius captures at least min_points points (exact hits too)
            enough = (d <= radius).sum(axis=1) >= min_points
            vals = np.where((wsum > 0) & enough,
                            (w @ pz) / np.maximum(wsum, 1e-300), gs.nodata)
            ok_exact = has_exact & enough
            if ok_exact.any():
                first_exact = exact.argmax(axis=1)
                vals[ok_exact] = pz[first_exact[ok_exact]]
            out[:] = vals.reshape(tpx, tpx)
        elif method == "nearest":
            # nearest_neighbour_gridding.rs:427: the nearest point only
            # counts within max_dist (default infinity); farther -> nodata
            nn_i = d.argmin(axis=1)
            nn_d = d.min(axis=1)
            out[:] = np.where(nn_d <= max_dist, pz[nn_i], gs.nodata).reshape(tpx, tpx)
        else:
            raise ValueError(method)
        return out
    if frs is None:
        frs = FixedRadiusSearch2D(px, py, radius)
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            if method == "idw":
                idx, d = frs.search(x, y)
                if len(idx) == 0 or len(idx) < min_points:
                    continue
                if np.any(d == 0.0):
                    out[i, j] = pz[idx[d == 0.0][0]]
                else:
                    w = 1.0 / d**power
                    out[i, j] = float(np.sum(w * pz[idx]) / np.sum(w))
            elif method == "nearest":
                idx, d = frs.knn(x, y, 1)
                if len(idx) and d[0] <= max_dist:
                    out[i, j] = pz[idx[0]]
            else:
                raise ValueError(method)
    return out


class _GriddingActor:
    """Per-actor: per-tile FRS indexes built lazily; per tile batch,
    interpolate every cell center."""

    def __init__(self, pts_ref, spec, method: str, radius: float, k: int, power: float, out_fmt: str,
                 min_points: int = 0, max_dist: float = np.inf):
        import ray

        self.by_tile = ray.get(pts_ref)
        self.spec = spec
        self.gs: GridSpec = spec.grid_spec()
        self.method = method
        self.radius = radius
        self.k = k
        self.power = power
        self.out_fmt = out_fmt
        self.min_points = min_points
        self.max_dist = max_dist
        self._frs_cache: dict[int, FixedRadiusSearch2D] = {}

    def _interp_tile(self, tid: int) -> np.ndarray:
        tpx = self.spec.tile_px
        pts = self.by_tile.get(tid)
        if pts is None:
            return np.full((tpx, tpx), self.gs.nodata)
        px, py, pz = pts
        frs = self._frs_cache.get(tid)
        if frs is None:
            frs = FixedRadiusSearch2D(px, py, self.radius)
            self._frs_cache[tid] = frs
        return _interp_points_tile(px, py, pz, tid, self.spec, self.gs,
                                   self.method, self.radius, self.power, frs,
                                   min_points=self.min_points,
                                   max_dist=self.max_dist)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import codecs

        tids = batch["tile_id"].to_numpy(zero_copy_only=False)
        blobs = [codecs.encode_tile(self._interp_tile(int(t)), self.out_fmt) for t in tids]
        return pa.table(
            {
                "tile_id": batch["tile_id"],
                "tile_row": pa.array((tids // self.spec.tiles_x).astype("int32"), pa.int32()),
                "tile_col": pa.array((tids % self.spec.tiles_x).astype("int32"), pa.int32()),
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array([self.out_fmt] * len(blobs), pa.string()),
            }
        )


def idw_gridding(
    points_table: pa.Table,
    spec,
    radius: float,
    power: float = 2.0,
    method: str = "idw",
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "value",
    concurrency=(1, 8),
    out_fmt: str = "f32",
    min_points: int = 0,
    max_dist: float = np.inf,
):
    """IDW / nearest-neighbor gridding of a point layer onto the scene's
    tile grid. Returns Dataset[tile_id, tile_row, tile_col, bytes, fmt]."""
    import ray
    import ray.data as rd

    px = points_table.column(x_col).to_numpy()
    py = points_table.column(y_col).to_numpy()
    pz = points_table.column(z_col).to_numpy()
    margin = radius if method == "idw" else max(radius, 4.0 * spec.res)
    by_tile = _points_by_tile(px, py, pz, spec, margin)
    ref = ray.put(by_tile)
    n_tiles = spec.tiles_x * spec.tiles_y
    tiles = rd.range(n_tiles).map_batches(
        lambda b: pa.table({"tile_id": pa.array(b["id"].to_numpy(zero_copy_only=False), pa.int64())}),
        batch_format="pyarrow",
    )
    return tiles.map_batches(
        _GriddingActor,
        fn_constructor_args=(ref, spec, method, radius, 1, power, out_fmt, min_points, max_dist),
        batch_format="pyarrow",
        batch_size=4,
        concurrency=concurrency,
    )


def idw_gridding_ds(
    points_ds,
    spec,
    radius: float,
    power: float = 2.0,
    method: str = "idw",
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "value",
    out_fmt: str = "f32",
    min_points: int = 0,
):
    """Point-side co-partition gridding (the documented fallback for
    point sets too large to materialize/broadcast): each point flat-maps
    to every tile whose window+margin contains it (margin duplication,
    typically a few % for radius ≪ tile width), and a tile-key groupby
    interpolates each tile from its local point set — identical values
    to the broadcast path via the shared ``_interp_points_tile`` kernel.
    Shuffle payload = points × duplication factor; the driver never
    touches the point table. Tie-breaking among EXACT-duplicate
    distances may differ from the broadcast path (group concat order is
    not the table order); the reference leaves that order unspecified
    too."""
    import ray.data as rd

    from ..kernels import codecs

    gs = spec.grid_spec()
    margin = radius if method == "idw" else max(radius, 4.0 * spec.res)
    tile_w = spec.tile_px * gs.res_x
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y

    def assign(batch: pa.Table) -> pa.Table:
        px = batch.column(x_col).to_numpy(zero_copy_only=False)
        py = batch.column(y_col).to_numpy(zero_copy_only=False)
        pz = batch.column(z_col).to_numpy(zero_copy_only=False)
        t0x = np.floor((px - margin - gs.west) / tile_w).astype(np.int64)
        t1x = np.floor((px + margin - gs.west) / tile_w).astype(np.int64)
        t0y = np.floor((gs.north - (py + margin)) / tile_w).astype(np.int64)
        t1y = np.floor((gs.north - (py - margin)) / tile_w).astype(np.int64)
        tid, xs_, ys_, zs_ = [], [], [], []
        for i in range(len(px)):
            for tr in range(max(t0y[i], 0), min(t1y[i], tiles_y - 1) + 1):
                for tc in range(max(t0x[i], 0), min(t1x[i], tiles_x - 1) + 1):
                    tid.append(tr * tiles_x + tc)
                    xs_.append(px[i])
                    ys_.append(py[i])
                    zs_.append(pz[i])
        return pa.table(
            {
                "tile_id": pa.array(tid, pa.int64()),
                "px": pa.array(xs_, pa.float64()),
                "py": pa.array(ys_, pa.float64()),
                "pz": pa.array(zs_, pa.float64()),
                "marker": pa.array([0] * len(tid), pa.int8()),
            }
        )

    # one marker row per tile so empty tiles still emit (all-nodata)
    def markers(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        n = len(ids)
        return pa.table(
            {
                "tile_id": pa.array(ids, pa.int64()),
                "px": pa.array([0.0] * n, pa.float64()),
                "py": pa.array([0.0] * n, pa.float64()),
                "pz": pa.array([0.0] * n, pa.float64()),
                "marker": pa.array([1] * n, pa.int8()),
            }
        )

    def per_tile(g: pd.DataFrame) -> pd.DataFrame:
        tid = int(g["tile_id"].iloc[0])
        pts = g[g["marker"] == 0]
        out = _interp_points_tile(pts["px"].to_numpy(), pts["py"].to_numpy(),
                                  pts["pz"].to_numpy(), tid, spec,
                                  gs, method, radius, power,
                                  min_points=min_points)
        return pa.table(
            {
                "tile_id": pa.array([tid], pa.int64()),
                "tile_row": pa.array([tid // tiles_x], pa.int32()),
                "tile_col": pa.array([tid % tiles_x], pa.int32()),
                "bytes": pa.array([codecs.encode_tile(out, out_fmt)], pa.binary()),
                "fmt": pa.array([out_fmt], pa.string()),
            }
        )

    pts = points_ds.map_batches(assign, batch_format="pyarrow")
    seed = rd.range(tiles_x * tiles_y).map_batches(markers, batch_format="pyarrow")
    return pts.union(seed).groupby("tile_id").map_groups(per_tile, batch_format="pandas")


def idw_gridding_auto(points, spec, radius: float, **kw):
    """Registry dispatcher: an Arrow table (small side) takes the
    broadcast actor path; a Dataset (large side) takes the co-partition
    path."""
    if isinstance(points, pa.Table):
        return idw_gridding(points, spec, radius, **kw)
    kw.pop("concurrency", None)
    return idw_gridding_ds(points, spec, radius, **kw)


def block_gridding(points_ds, gs: GridSpec, stat: str = "max", x_col="x", y_col="y", z_col="value"):
    """BlockMaximum/Minimum gridding: per-cell extreme of in-cell points
    (block_maximum.rs / block_minimum.rs) — a pure groupby-aggregate."""
    from ray.data.aggregate import Max, Min

    def assign(batch: pa.Table) -> pa.Table:
        col = gs.col_from_x(batch[x_col].to_numpy(zero_copy_only=False))
        row = gs.row_from_y(batch[y_col].to_numpy(zero_copy_only=False))
        ok = (row >= 0) & (row < gs.rows) & (col >= 0) & (col < gs.columns)
        t = batch.append_column("cell", pa.array(row * gs.columns + col, pa.int64()))
        return t.filter(pa.array(ok))

    agg = Max(z_col, alias_name="VALUE") if stat == "max" else Min(z_col, alias_name="VALUE")
    return points_ds.map_batches(assign, batch_format="pyarrow").groupby("cell").aggregate(agg)


def tin_gridding(
    points_table: pa.Table,
    spec,
    margin_cells: float = 8.0,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "value",
    concurrency=(1, 8),
):
    """TINGridding (gis_analysis/tin_gridding.rs / LidarTINGridding):
    per-tile Delaunay + barycentric interpolation of cell centers
    (kernels/delaunay.py Bowyer-Watson).

    Partitioning: points co-partition to tiles with a ``margin_cells``-
    cell neighbor-duplication margin so border triangles form
    identically on both sides of a tile edge; triangles wider than the
    margin (very sparse areas) fall back to nodata — the documented
    assumption of the SURVEY §2.4 per-partition plan."""
    import ray

    from ..kernels.delaunay import delaunay, tin_interpolate

    px = points_table.column(x_col).to_numpy().astype(np.float64)
    py = points_table.column(y_col).to_numpy().astype(np.float64)
    pz = points_table.column(z_col).to_numpy().astype(np.float64)
    margin = margin_cells * spec.res
    by_tile = _points_by_tile(px, py, pz, spec, margin)
    ref = ray.put(by_tile)

    class TinActor:
        def __init__(self):
            self.by_tile = ray.get(ref)
            self.gs = spec.grid_spec()

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..kernels import codecs

            tpx = spec.tile_px
            tids = batch["tile_id"].to_numpy(zero_copy_only=False)
            blobs = []
            for t in tids:
                t = int(t)
                tr, tc = t // spec.tiles_x, t % spec.tiles_x
                out = np.full((tpx, tpx), self.gs.nodata)
                pts = self.by_tile.get(t)
                if pts is not None and len(pts[0]) >= 3:
                    p = np.column_stack([pts[0], pts[1]])
                    tris = delaunay(p)
                    rows = np.arange(tr * tpx, (tr + 1) * tpx)
                    cols = np.arange(tc * tpx, (tc + 1) * tpx)
                    gx, gy = np.meshgrid(self.gs.x_from_col(cols), self.gs.y_from_row(rows))
                    out = tin_interpolate(p, pts[2], tris, gx, gy, self.gs.nodata)
                blobs.append(codecs.encode_tile(out, "f32"))
            return pa.table(
                {
                    "tile_id": batch["tile_id"],
                    "tile_row": pa.array((tids // spec.tiles_x).astype("int32"), pa.int32()),
                    "tile_col": pa.array((tids % spec.tiles_x).astype("int32"), pa.int32()),
                    "bytes": pa.array(blobs, pa.binary()),
                    "fmt": pa.array(["f32"] * len(blobs), pa.string()),
                }
            )

    import ray.data as rd

    n_tiles = spec.tiles_x * spec.tiles_y
    tiles = rd.range(n_tiles).map_batches(
        lambda b: pa.table({"tile_id": pa.array(b["id"].to_numpy(zero_copy_only=False), pa.int64())}),
        batch_format="pyarrow",
    )
    return tiles.map_batches(
        TinActor, batch_format="pyarrow", batch_size=4, concurrency=concurrency
    )


def construct_vector_tin(points_table: pa.Table, x_col="x", y_col="y", z_col="value"):
    """ConstructVectorTIN (construct_vector_tin.rs): the triangle list as
    polygon records (FID = triangle index, vertices CCW)."""
    from ..kernels.delaunay import delaunay

    px = points_table.column(x_col).to_numpy().astype(np.float64)
    py = points_table.column(y_col).to_numpy().astype(np.float64)
    pz = points_table.column(z_col).to_numpy().astype(np.float64)
    p = np.column_stack([px, py])
    tris = delaunay(p)
    recs = []
    for i, t in enumerate(tris):
        xs = [float(px[t[0]]), float(px[t[1]]), float(px[t[2]]), float(px[t[0]])]
        ys = [float(py[t[0]]), float(py[t[1]]), float(py[t[2]]), float(py[t[0]])]
        recs.append(
            {
                "record_id": i + 1,
                "parts": [0],
                "xs": xs,
                "ys": ys,
                "z_mean": float((pz[t[0]] + pz[t[1]] + pz[t[2]]) / 3.0),
            }
        )
    return recs


def voronoi_diagram(points_table: pa.Table, bbox, x_col="x", y_col="y"):
    """VoronoiDiagram (voronoi_diagram.rs): one polygon record per input
    point, clipped to ``bbox``."""
    from ..kernels.delaunay import voronoi_cells

    px = points_table.column(x_col).to_numpy().astype(np.float64)
    py = points_table.column(y_col).to_numpy().astype(np.float64)
    cells = voronoi_cells(np.column_stack([px, py]), bbox)
    recs = []
    for i, c in enumerate(cells):
        if len(c) < 3:
            continue
        xs = [float(v) for v in c[:, 0]] + [float(c[0, 0])]
        ys = [float(v) for v in c[:, 1]] + [float(c[0, 1])]
        recs.append({"record_id": i + 1, "parts": [0], "xs": xs, "ys": ys})
    return recs
