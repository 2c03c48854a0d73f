"""Dataset-level ingest/export for the reference's front-door file
formats — LAS point clouds, ESRI Shapefiles, GeoTIFF rasters — on top of
the pure-numpy codecs in ``kernels/las_codec.py`` / ``shp_codec.py`` /
``tiff_codec.py``.

Scale model:

- **LAS**: one file = one parse task (``read_binary_files`` →
  ``flat_map``-style batch parse). Real LAS tiles are ≤ a few GB, so
  per-file parallelism is the natural grain; a 100-TB survey is many
  thousand files and saturates the cluster. Output columns match the
  engine's point tables (x/y/z/intensity/class/...; las.rs parity).
- **Shapefile**: vector side-tables are the broadcast side of every
  spatial join in this engine; one file parses in one task and the
  record batches stream out. Attributes from the sibling .dbf join
  positionally (the shapefile contract, attributes.rs).
- **GeoTIFF**: one file = one scene (or one mosaic sheet = one task for
  multi-file mosaics); the parse task re-tiles the grid into the
  engine's native tile table (tile_row/tile_col/bytes/fmt).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..kernels import codecs, las_codec, shp_codec, tiff_codec


def _as_paths(paths) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, f)
                for f in os.listdir(paths)
                if f.lower().endswith((".las", ".las.zip", ".zip", ".shp", ".tif", ".tiff"))
            )
        return [paths]
    return list(paths)


def read_las(paths, columns: list[str] | None = None):
    """LAS file(s) → Dataset of points (one parse task per file).

    ``columns`` prunes the output (x/y/z always included). Each point
    carries ``source_file`` so multi-flightline tools (flightline edges,
    kappa) can group by origin."""
    import ray.data as rd

    flist = _as_paths(paths)

    def parse(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            buf = batch["bytes"][i].as_py()
            path = batch["path"][i].as_py()
            parsed = las_codec.parse_las(buf)
            cols = parsed["columns"]
            if columns is not None:
                keep = set(columns) | {"x", "y", "z"}
                cols = {k: v for k, v in cols.items() if k in keep}
            cols["source_file"] = np.full(len(parsed["columns"]["x"]), os.path.basename(path), dtype=object)
            out.append(pa.table({k: pa.array(v) for k, v in cols.items()}))
        return pa.concat_tables(out) if out else pa.table({})

    ds = rd.read_binary_files(flist, include_paths=True)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)


def write_las(ds, out_dir: str, point_format: int = 1, zipped: bool = False) -> list[str]:
    """Dataset of points → one .las per input block (resumable layout:
    deterministic part-N names, re-running overwrites in place).
    ``zipped=True`` writes DEFLATE one-member .las.zip archives — the
    reference's zipped-LAS model (las.rs:1163-1200)."""
    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table, idx: list[int] = [0]) -> pa.Table:
        cols = {name: batch[name].to_numpy(zero_copy_only=False) for name in batch.schema.names}
        blob = las_codec.write_las(cols, point_format=point_format)
        # per-task unique name via pid — parallel writers cannot collide
        name = f"part-{os.getpid()}-{idx[0]:05d}.las"
        idx[0] += 1
        if zipped:
            blob = las_codec.zip_las(blob, member=name)
            name += ".zip"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        return pa.table({"file": [name], "n_points": [batch.num_rows]})

    return ds.map_batches(dump, batch_format="pyarrow")


def read_shapefile(shp_path: str, read_attributes: bool = True):
    """.shp (+ sibling .dbf) → Dataset matching the engine's vector
    schema: record_id, parts, xs, ys, bbox columns, plus one column per
    .dbf attribute (positional join, attributes.rs semantics)."""
    import ray.data as rd

    with open(shp_path, "rb") as f:
        parsed = shp_codec.parse_shp(f.read())
    recs = parsed["records"]
    cols: dict[str, list] = {
        "record_id": [r["record_id"] for r in recs],
        "parts": [np.asarray(r["parts"], dtype=np.int32) for r in recs],
        "xs": [np.asarray(r["xs"], dtype=np.float64) for r in recs],
        "ys": [np.asarray(r["ys"], dtype=np.float64) for r in recs],
        "x_min": [r["bbox"][0] for r in recs],
        "y_min": [r["bbox"][1] for r in recs],
        "x_max": [r["bbox"][2] for r in recs],
        "y_max": [r["bbox"][3] for r in recs],
    }
    if any("zs" in r for r in recs):
        cols["zs"] = [np.asarray(r.get("zs", np.zeros(len(r["xs"]))), dtype=np.float64) for r in recs]
    dbf_path = os.path.splitext(shp_path)[0] + ".dbf"
    if read_attributes and os.path.isfile(dbf_path):
        with open(dbf_path, "rb") as f:
            attrs = shp_codec.parse_dbf(f.read())
        for name, vals in attrs["columns"].items():
            if name not in cols and len(vals) == len(recs):
                cols[name] = vals
    t = pa.table(
        {
            "record_id": pa.array(cols.pop("record_id"), pa.int32()),
            "parts": pa.array(cols.pop("parts"), pa.list_(pa.int32())),
            "xs": pa.array(cols.pop("xs"), pa.list_(pa.float64())),
            "ys": pa.array(cols.pop("ys"), pa.list_(pa.float64())),
            **{k: pa.array(v) for k, v in cols.items()},
        }
    )
    return rd.from_arrow(t)


def write_shapefile(records: list[dict], shp_path: str, shape_type: int,
                    attributes: dict | None = None) -> None:
    """records (xs/ys[+parts] dicts) → .shp + .dbf pair."""
    with open(shp_path, "wb") as f:
        f.write(shp_codec.write_shp(records, shape_type))
    if attributes:
        n = len(records)
        with open(os.path.splitext(shp_path)[0] + ".dbf", "wb") as f:
            f.write(shp_codec.write_dbf(attributes, n))


def read_geotiff_tiles(paths, tile_px: int = 128):
    """GeoTIFF file(s) → engine tile table. One parse task per file;
    each task re-tiles its grid into tile_px² f32 tiles. Returns
    (Dataset[tile_row, tile_col, bytes, fmt, file_idx], metas) where
    metas[i] carries the i-th file's nodata/pixel_scale/tiepoint/dims
    (parsed driver-side from the header bytes only)."""
    import ray.data as rd

    flist = _as_paths(paths)
    metas = []
    for p in flist:
        with open(p, "rb") as f:
            head = f.read(1 << 20)  # classic TIFF IFDs sit near the front
        try:
            m = tiff_codec.parse_geotiff(head)["meta"]
        except Exception:
            with open(p, "rb") as f:
                m = tiff_codec.parse_geotiff(f.read())["meta"]
        metas.append(m)

    def parse(batch: pa.Table) -> pa.Table:
        out = {"tile_row": [], "tile_col": [], "bytes": [], "fmt": [], "file_idx": []}
        for i in range(batch.num_rows):
            buf = batch["bytes"][i].as_py()
            path = batch["path"][i].as_py()
            fidx = flist.index(path) if path in flist else [
                j for j, p in enumerate(flist) if os.path.basename(p) == os.path.basename(path)
            ][0]
            grid = tiff_codec.parse_geotiff(buf)["grid"]
            h, w = grid.shape
            for tr in range((h + tile_px - 1) // tile_px):
                for tc in range((w + tile_px - 1) // tile_px):
                    sub = grid[tr * tile_px : (tr + 1) * tile_px, tc * tile_px : (tc + 1) * tile_px]
                    if sub.shape != (tile_px, tile_px):  # pad edge tiles
                        pad = np.full((tile_px, tile_px), np.nan)
                        pad[: sub.shape[0], : sub.shape[1]] = sub
                        sub = pad
                    out["tile_row"].append(tr)
                    out["tile_col"].append(tc)
                    out["bytes"].append(codecs.encode_tile(sub, "f32"))
                    out["fmt"].append("f32")
                    out["file_idx"].append(fidx)
        return pa.table(
            {
                "tile_row": pa.array(out["tile_row"], pa.int32()),
                "tile_col": pa.array(out["tile_col"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "file_idx": pa.array(out["file_idx"], pa.int32()),
            }
        )

    ds = rd.read_binary_files(flist, include_paths=True)
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1), metas


def write_geotiff(tiles_ds, spec, out_path: str, nodata: float | None = None,
                  compress: bool | str = "lzw", dtype: str = "f4") -> None:
    """Engine tile table → one GeoTIFF. The tile table streams through a
    groupby-free path: tiles land in a preallocated grid driver-side ONLY
    for single-sheet export (the reference's write model is one whole
    in-memory raster per file, geotiff/mod.rs); sheet size is capped by
    the caller choosing scene extents. ``dtype="rgb8"/"rgba8"`` writes a
    chunky multi-band file from packed-composite tiles."""
    grid = np.full((spec.rows, spec.columns), np.nan)
    for batch in tiles_ds.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            t = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            r0 = int(batch["tile_row"][i].as_py()) * spec.tile_px
            c0 = int(batch["tile_col"][i].as_py()) * spec.tile_px
            # clip tile-pad overhang (readers pad edge tiles to tile_px)
            t = t[: max(0, spec.rows - r0), : max(0, spec.columns - c0)]
            grid[r0 : r0 + t.shape[0], c0 : c0 + t.shape[1]] = t
    gs = spec.grid_spec()
    nd = nodata if nodata is not None else spec.nodata
    # cells never covered by a tile: nodata for value bands (reference
    # initialises rasters to nodata), packed 0 for rgb composites
    grid = np.nan_to_num(grid, nan=0.0 if dtype in ("rgb8", "rgba8") else nd)
    blob = tiff_codec.write_geotiff(
        grid,
        nodata=nd,
        pixel_scale=(spec.res, spec.res),
        tiepoint=(0.0, 0.0, 0.0, gs.west, gs.north, 0.0),
        dtype=dtype,
        compress=compress,
    )
    with open(out_path, "wb") as f:
        f.write(blob)


def read_raster_grid(paths, tile_px: int = 128):
    """Legacy grid raster file(s) (Arc ASCII/binary, GRASS, Idrisi,
    SAGA, Surfer 7/ASCII, Whitebox .dep/.tas — kernels/grid_codecs.py)
    → engine tile table. Same shape as ``read_geotiff_tiles``: one
    parse task per file, each re-tiling its grid into tile_px² tiles;
    returns (Dataset[tile_row, tile_col, bytes, fmt, file_idx], metas).

    Sibling files (.hdr/.dep/.rdc/.sgrd) are read inside the task via
    the path — these formats are small single-scene grids, so the task
    reads from the shared filesystem directly rather than shipping
    bytes through read_binary_files."""
    import ray.data as rd

    from ..kernels import grid_codecs

    flist = _as_paths(paths)
    # headers only driver-side (O(header) per file); the data payload is
    # parsed inside the per-file task below
    metas = [grid_codecs.read_grid_meta(p) for p in flist]

    def parse(batch: pa.Table) -> pa.Table:
        out = {"tile_row": [], "tile_col": [], "bytes": [], "fmt": [], "file_idx": []}
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            fidx = flist.index(path) if path in flist else [
                j for j, p in enumerate(flist) if os.path.basename(p) == os.path.basename(path)
            ][0]
            from ..kernels import grid_codecs as gc

            grid, _m = gc.read_grid(path)
            h, w = grid.shape
            for tr in range((h + tile_px - 1) // tile_px):
                for tc in range((w + tile_px - 1) // tile_px):
                    sub = grid[tr * tile_px : (tr + 1) * tile_px, tc * tile_px : (tc + 1) * tile_px]
                    if sub.shape != (tile_px, tile_px):
                        pad = np.full((tile_px, tile_px), np.nan)
                        pad[: sub.shape[0], : sub.shape[1]] = sub
                        sub = pad
                    out["tile_row"].append(tr)
                    out["tile_col"].append(tc)
                    out["bytes"].append(codecs.encode_tile(sub, "f32"))
                    out["fmt"].append("f32")
                    out["file_idx"].append(fidx)
        return pa.table(
            {
                "tile_row": pa.array(out["tile_row"], pa.int32()),
                "tile_col": pa.array(out["tile_col"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "file_idx": pa.array(out["file_idx"], pa.int32()),
            }
        )

    # ship only paths; each task opens its own file (+ sibling header)
    ds = rd.from_items([{"path": p} for p in flist]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )
    return ds, metas


def write_raster_grid(tiles_ds, spec, out_path: str,
                      nodata: float | None = None,
                      fmt: str | None = None) -> None:
    """Engine tile table → one legacy grid raster (format by extension,
    write dispatch identical to the reference's Raster::new write mode).
    Single-sheet export like ``write_geotiff``: the reference's write
    model is one whole in-memory grid per file (raster/mod.rs:1030)."""
    from ..kernels import grid_codecs

    nd = nodata if nodata is not None else spec.nodata
    grid = np.full((spec.rows, spec.columns), nd, dtype=np.float64)
    for batch in tiles_ds.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            t = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            r0 = int(batch["tile_row"][i].as_py()) * spec.tile_px
            c0 = int(batch["tile_col"][i].as_py()) * spec.tile_px
            # clip tile-pad overhang (readers pad edge tiles to tile_px)
            t = t[: max(0, spec.rows - r0), : max(0, spec.columns - c0)]
            grid[r0 : r0 + t.shape[0], c0 : c0 + t.shape[1]] = t
    gs = spec.grid_spec()
    meta = {
        "rows": spec.rows, "cols": spec.columns,
        "west": gs.west, "south": gs.south, "east": gs.east,
        "north": gs.north,
        "res_x": spec.res, "res_y": spec.res,
        "nodata": nd, "data_type": "f32",
    }
    grid = np.where(np.isnan(grid), nd, grid)
    grid_codecs.write_grid(out_path, grid, meta, fmt=fmt)
