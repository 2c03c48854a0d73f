"""Line-of-sight / directional terrain ops (SURVEY §2.10 "long-range"
family): Viewshed, HorizonAngle, FetchAnalysis, DirectionalRelief,
VisibilityIndex.

Reference: terrain_analysis/viewshed.rs (station-to-cell vertical-angle
test along the sight line), horizon_angle.rs (max elevation angle along
an azimuth ray), fetch_analysis.rs (distance to the first obstructing
cell along an azimuth), directional_relief.rs:20-27,
visibility_index.rs.

Two execution tiers share one step-major vectorized core (no per-cell
Python in either):

1. single-grid kernels (``viewshed``, ``horizon_angle``, …) — the whole
   scene in one ndarray; used by tests and as the per-task body below;
2. Dataset forms (``viewshed_ds``, ``horizon_angle_ds``, …) over the
   tile table, the registered tool surface:

   - the three *directional* ops (horizon/fetch/relief) walk a fixed
     azimuth at most ``max_dist`` cells, so each destination tile
     gathers exactly the tiles its rays can sample (a one-direction
     halo of O(max_dist/tile_px) tiles) through a single tile-key
     shuffle — the replication factor is the documented partitioning
     assumption;
   - ``viewshed_ds`` decomposes the scene into ``n_sectors`` azimuthal
     wedges around the station (SURVEY §7's azimuthal repartition). A
     wedge is star-convex about the station, so every sight line to a
     wedge-owned cell stays inside the wedge (+2-cell dilation for the
     bilinear quad), and each sector task gathers only the tiles its
     wedge touches — memory per task is the wedge's bounding box,
     ~scene/n_sectors for axis wedges.

All arithmetic is in ABSOLUTE scene coordinates regardless of the patch
a task holds, so tiled and single-grid runs are bit-identical (rounding
of sample positions depends on absolute index parity).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = [
    "viewshed",
    "horizon_angle",
    "fetch_analysis",
    "directional_relief",
    "visibility_index",
    "viewshed_ds",
    "horizon_angle_ds",
    "fetch_analysis_ds",
    "directional_relief_ds",
    "visibility_index_ds",
]


# ---------------------------------------------------------------------------
# shared step-major cores
# ---------------------------------------------------------------------------


def _az_deltas(azimuth_deg: float) -> tuple[float, float]:
    # azimuth measured clockwise from north (row -, col +)
    az = np.deg2rad(azimuth_deg)
    return -np.cos(az), np.sin(az)  # (dr, dc)


def _directional_walk(
    patch: np.ndarray,
    pr0: int,
    pc0: int,
    rows: int,
    cols: int,
    out_r0: int,
    out_c0: int,
    out_h: int,
    out_w: int,
    nodata: float,
    azimuth_deg: float,
    max_dist: float,
    res: float,
    mode: str,
    height_increment: float = 0.022,
) -> np.ndarray:
    """One azimuth walk over the cells of the ``out`` box, sampling from
    ``patch`` (scene rows [pr0, pr0+patch.h) × cols [pc0, …)). Absolute
    sample index ri = round(r + dr·s); out-of-scene samples are invalid
    (raster/mod.rs out-of-bounds → nodata semantics)."""
    dr, dc = _az_deltas(azimuth_deg)
    nsteps = int(max_dist / res)
    if mode == "relief":
        nsteps = max(nsteps, 1)
    rr0, cc0 = np.meshgrid(
        np.arange(out_r0, out_r0 + out_h, dtype=np.float64),
        np.arange(out_c0, out_c0 + out_w, dtype=np.float64),
        indexing="ij",
    )
    z0 = patch[out_r0 - pr0 : out_r0 - pr0 + out_h, out_c0 - pc0 : out_c0 - pc0 + out_w]
    ph, pw = patch.shape
    if mode == "horizon":
        best = np.full((out_h, out_w), -np.inf)
    elif mode == "fetch":
        fetch = np.full((out_h, out_w), max_dist)
        found = np.zeros((out_h, out_w), dtype=bool)
    else:
        tot = np.zeros((out_h, out_w))
        cnt = np.zeros((out_h, out_w))
    for s in range(1, nsteps + 1):
        ri = np.round(rr0 + dr * s).astype(np.int64)
        ci = np.round(cc0 + dc * s).astype(np.int64)
        ok = (ri >= 0) & (ri < rows) & (ci >= 0) & (ci < cols)
        pri = np.clip(ri - pr0, 0, ph - 1)
        pci = np.clip(ci - pc0, 0, pw - 1)
        zi = np.where(ok, patch[pri, pci], nodata)
        valid = ok & (zi != nodata)
        if mode == "horizon":
            ang = np.where(valid, np.arctan2(zi - z0, s * res), -np.inf)
            best = np.maximum(best, ang)
        elif mode == "fetch":
            block = valid & (zi > z0 + height_increment * s * res) & ~found
            fetch = np.where(block, s * res, fetch)
            found |= block
        else:
            tot += np.where(valid, zi, 0.0)
            cnt += valid
    nod = z0 == nodata
    if mode == "horizon":
        out = np.where(np.isfinite(best), best, -np.pi / 2.0)
    elif mode == "fetch":
        out = fetch
    else:
        out = np.where(cnt > 0, tot / np.maximum(cnt, 1.0) - z0, 0.0)
    out[nod] = nodata
    return out


def _viewshed_cells(
    patch: np.ndarray,
    pr0: int,
    pc0: int,
    rows: int,
    cols: int,
    nodata: float,
    sr: int,
    sc: int,
    zs: float,
    res: float,
    r_t: np.ndarray,
    c_t: np.ndarray,
    z_t: np.ndarray,
) -> np.ndarray:
    """0/1 visibility of target cells (absolute (r_t, c_t), elevations
    z_t, station excluded by the caller). Cell visible iff the vertical
    angle from the station is ≥ the max angle over every intervening
    sample (bilinear z along the sight line, viewshed.rs interpolated
    profile). Step-major: one vectorized pass per sample index s, all
    targets with ≥ s+1 samples active."""
    dy = r_t.astype(np.float64) - sr
    dx = c_t.astype(np.float64) - sc
    dist = np.sqrt(dy * dy + dx * dx)
    target = (z_t - zs) / (dist * res)
    n = np.ceil(dist)
    maxn = int(n.max()) if len(n) else 0
    blocked = np.zeros(r_t.shape, dtype=bool)
    ph, pw = patch.shape
    for s in range(1, maxn):
        act = s < n  # the loop form samples s = 1 .. ceil(dist)-1
        if not act.any():
            break
        t = s / dist
        rr = sr + dy * t
        cc = sc + dx * t
        r0 = np.clip(np.floor(rr), 0, rows - 2).astype(np.int64)
        c0 = np.clip(np.floor(cc), 0, cols - 2).astype(np.int64)
        fr = rr - r0
        fc = cc - c0
        i0 = np.clip(r0 - pr0, 0, ph - 2)
        j0 = np.clip(c0 - pc0, 0, pw - 2)
        q00 = patch[i0, j0]
        q01 = patch[i0, j0 + 1]
        q10 = patch[i0 + 1, j0]
        q11 = patch[i0 + 1, j0 + 1]
        zi = (
            q00 * (1 - fr) * (1 - fc)
            + q01 * (1 - fr) * fc
            + q10 * fr * (1 - fc)
            + q11 * fr * fc
        )
        anynod = (q00 == nodata) | (q01 == nodata) | (q10 == nodata) | (q11 == nodata)
        zi = np.where(anynod, q00, zi)
        ang = (zi - zs) / (t * dist * res)
        blocked |= act & (zi != nodata) & (ang > target + 1e-12)
    return np.where(blocked, 0.0, 1.0)


# ---------------------------------------------------------------------------
# single-grid kernels
# ---------------------------------------------------------------------------


def viewshed(grid: np.ndarray, nodata: float, station_rc: tuple[int, int],
             station_height: float = 2.0, res: float = 1.0) -> np.ndarray:
    """Viewshed (viewshed.rs): 1 where the cell is visible from the
    station (z_station + height), 0 where hidden, nodata passthrough."""
    rows, cols = grid.shape
    sr, sc = station_rc
    zs = float(grid[sr, sc]) + station_height
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    r_t = rr.ravel()
    c_t = cc.ravel()
    stn = (r_t == sr) & (c_t == sc)
    vis = np.ones(rows * cols)
    vis[~stn] = _viewshed_cells(
        grid, 0, 0, rows, cols, nodata, sr, sc, zs, res,
        r_t[~stn], c_t[~stn], grid.ravel()[~stn],
    )
    out = vis.reshape(rows, cols)
    out[grid == nodata] = nodata
    return out


def horizon_angle(grid: np.ndarray, nodata: float, azimuth_deg: float,
                  max_dist: float, res: float = 1.0) -> np.ndarray:
    """HorizonAngle (horizon_angle.rs): per cell, the maximum elevation
    angle (radians) of the terrain along the ``azimuth`` ray out to
    ``max_dist`` (−π/2 where no terrain is sampled)."""
    rows, cols = grid.shape
    return _directional_walk(grid, 0, 0, rows, cols, 0, 0, rows, cols,
                             nodata, azimuth_deg, max_dist, res, "horizon")


def fetch_analysis(grid: np.ndarray, nodata: float, azimuth_deg: float,
                   max_dist: float, height_increment: float = 0.022,
                   res: float = 1.0) -> np.ndarray:
    """FetchAnalysis (fetch_analysis.rs): distance upwind (along the
    azimuth) to the first cell higher than the start cell + a height
    allowance growing with distance; max_dist where unobstructed."""
    rows, cols = grid.shape
    return _directional_walk(grid, 0, 0, rows, cols, 0, 0, rows, cols,
                             nodata, azimuth_deg, max_dist, res, "fetch",
                             height_increment=height_increment)


def directional_relief(grid: np.ndarray, nodata: float, azimuth_deg: float,
                       max_dist: float, res: float = 1.0) -> np.ndarray:
    """DirectionalRelief (directional_relief.rs:20-27): average
    elevation along the azimuth ray minus the cell's own elevation."""
    rows, cols = grid.shape
    return _directional_walk(grid, 0, 0, rows, cols, 0, 0, rows, cols,
                             nodata, azimuth_deg, max_dist, res, "relief")


def visibility_index(grid: np.ndarray, nodata: float, station_step: int = 8,
                     height: float = 2.0, res: float = 1.0) -> np.ndarray:
    """VisibilityIndex (visibility_index.rs): the proportion of sampled
    stations (one per ``station_step``² cells) that can see each cell."""
    rows, cols = grid.shape
    count = np.zeros((rows, cols))
    n_st = 0
    for r in range(station_step // 2, rows, station_step):
        for c in range(station_step // 2, cols, station_step):
            if grid[r, c] == nodata:
                continue
            vs = viewshed(grid, nodata, (r, c), station_height=height, res=res)
            count += vs == 1.0
            n_st += 1
    out = count / max(n_st, 1)
    out[grid == nodata] = nodata
    return out


# ---------------------------------------------------------------------------
# Dataset forms
# ---------------------------------------------------------------------------


def _directional_ds(tiles_ds, spec, azimuth_deg: float, max_dist: float,
                    mode: str, height_increment: float = 0.022,
                    out_fmt: str = "f32"):
    """Directional-halo engine shared by horizon/fetch/relief: each
    destination tile gathers the tiles its rays sample (one tile-key
    shuffle, replication O(max_dist/tile_px) in ONE direction), then
    runs the exact step-major walk on the assembled strip."""
    import pandas as pd
    import pyarrow as pa

    from ..kernels import codecs

    dr, dc = _az_deltas(azimuth_deg)
    nsteps = int(max_dist / spec.res)
    if mode == "relief":
        nsteps = max(nsteps, 1)
    tpx = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    rows, cols = spec.rows, spec.columns
    nodata, res = spec.nodata, spec.res
    # sample offset envelope (±1 for rounding)
    rlo = int(np.floor(min(0.0, dr * nsteps))) - 1
    rhi = int(np.ceil(max(0.0, dr * nsteps))) + 1
    clo = int(np.floor(min(0.0, dc * nsteps))) - 1
    chi = int(np.ceil(max(0.0, dc * nsteps))) + 1

    def emit(batch: pa.Table) -> pa.Table:
        trs = batch["tile_row"].to_numpy(zero_copy_only=False)
        tcs = batch["tile_col"].to_numpy(zero_copy_only=False)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        tkey, src_tr, src_tc, data, pfmt = [], [], [], [], []
        for i in range(batch.num_rows):
            tr, tc = int(trs[i]), int(tcs[i])
            # dest cells reading from my rows [tr·tpx, …): r_dest + rlo ≤ my_hi
            dtr_lo = max(0, (tr * tpx - rhi) // tpx)
            dtr_hi = min(tiles_y - 1, ((tr + 1) * tpx - 1 - rlo) // tpx)
            dtc_lo = max(0, (tc * tpx - chi) // tpx)
            dtc_hi = min(tiles_x - 1, ((tc + 1) * tpx - 1 - clo) // tpx)
            for dtr in range(dtr_lo, dtr_hi + 1):
                for dtc in range(dtc_lo, dtc_hi + 1):
                    tkey.append(dtr * tiles_x + dtc)
                    src_tr.append(tr)
                    src_tc.append(tc)
                    data.append(blobs[i])
                    pfmt.append(fmts[i])
        return pa.table(
            {
                "tkey": pa.array(tkey, pa.int64()),
                "src_tr": pa.array(src_tr, pa.int64()),
                "src_tc": pa.array(src_tc, pa.int64()),
                "data": pa.array(data, pa.binary()),
                "pfmt": pa.array(pfmt, pa.string()),
            }
        )

    def per_dest(g: pd.DataFrame) -> pd.DataFrame:
        tkey = int(g["tkey"].iloc[0])
        tr, tc = tkey // tiles_x, tkey % tiles_x
        pr0 = max(0, tr * tpx + rlo)
        pr1 = min(rows, (tr + 1) * tpx + rhi)
        pc0 = max(0, tc * tpx + clo)
        pc1 = min(cols, (tc + 1) * tpx + chi)
        patch = np.full((pr1 - pr0, pc1 - pc0), nodata, dtype=np.float64)
        for str_, stc, data, pfmt in zip(g["src_tr"], g["src_tc"], g["data"], g["pfmt"]):
            garr = codecs.decode_tile(bytes(data), pfmt)
            a0, a1 = int(str_) * tpx, (int(str_) + 1) * tpx
            b0, b1 = int(stc) * tpx, (int(stc) + 1) * tpx
            ra0, ra1 = max(a0, pr0), min(a1, pr1)
            rb0, rb1 = max(b0, pc0), min(b1, pc1)
            if ra0 >= ra1 or rb0 >= rb1:
                continue
            patch[ra0 - pr0 : ra1 - pr0, rb0 - pc0 : rb1 - pc0] = garr[
                ra0 - a0 : ra1 - a0, rb0 - b0 : rb1 - b0
            ]
        out = _directional_walk(
            patch, pr0, pc0, rows, cols, tr * tpx, tc * tpx, tpx, tpx,
            nodata, azimuth_deg, max_dist, res, mode,
            height_increment=height_increment,
        )
        return pd.DataFrame(
            {
                "tile_row": [tr],
                "tile_col": [tc],
                "bytes": [codecs.encode_tile(out, out_fmt)],
                "fmt": [out_fmt],
            }
        )

    halo = tiles_ds.map_batches(emit, batch_format="pyarrow")
    return halo.groupby("tkey").map_groups(per_dest, batch_format="pandas")


def horizon_angle_ds(tiles_ds, spec, azimuth_deg: float, max_dist: float,
                     out_fmt: str = "f32"):
    """HorizonAngle over the tile table (directional-halo gather)."""
    return _directional_ds(tiles_ds, spec, azimuth_deg, max_dist, "horizon",
                           out_fmt=out_fmt)


def fetch_analysis_ds(tiles_ds, spec, azimuth_deg: float, max_dist: float,
                      height_increment: float = 0.022, out_fmt: str = "f32"):
    """FetchAnalysis over the tile table (directional-halo gather)."""
    return _directional_ds(tiles_ds, spec, azimuth_deg, max_dist, "fetch",
                           height_increment=height_increment, out_fmt=out_fmt)


def directional_relief_ds(tiles_ds, spec, azimuth_deg: float, max_dist: float,
                          out_fmt: str = "f32"):
    """DirectionalRelief over the tile table (directional-halo gather)."""
    return _directional_ds(tiles_ds, spec, azimuth_deg, max_dist, "relief",
                           out_fmt=out_fmt)


def _sectors_of_rect(r_lo: float, r_hi: float, c_lo: float, c_hi: float,
                     sr: int, sc: int, n_sectors: int) -> list[int]:
    """Sector indices whose wedge intersects the rect (station-centred
    angular decomposition; sector k covers [k·w − π, (k+1)·w − π),
    w = 2π/S). The rect's angular extent from an external station is
    < π and attained at corners; the ε padding absorbs float drift of
    on-ray samples."""
    if r_lo <= sr <= r_hi and c_lo <= sc <= c_hi:
        return list(range(n_sectors))
    two_pi = 2.0 * math.pi
    angs = sorted(
        math.atan2(r - sr, c - sc) for r in (r_lo, r_hi) for c in (c_lo, c_hi)
    )
    gaps = [(angs[(i + 1) % 4] - angs[i]) % two_pi for i in range(4)]
    i = max(range(4), key=gaps.__getitem__)
    start = angs[(i + 1) % 4]
    span = two_pi - gaps[i]
    eps = 1e-6
    start -= eps
    span += 2 * eps
    w = two_pi / n_sectors
    out = []
    for k in range(n_sectors):
        b = k * w - math.pi
        if ((b - start) % two_pi) <= span or ((start - b) % two_pi) <= w:
            out.append(k)
    return out


def viewshed_ds(tiles_ds, spec, station_rc: tuple[int, int],
                station_height: float = 2.0, n_sectors: int = 8,
                out_fmt: str = "f32"):
    """Viewshed over the tile table via azimuthal sector decomposition:
    tiles flat-map to every sector whose wedge touches their 2-cell
    dilation, each sector task assembles its wedge's bounding box and
    runs the exact step-major kernel for the cells it owns, and partial
    tiles merge back on tile key. Two shuffles, each carrying ~1-2×
    the wedge data; per-task memory = wedge bbox (~scene/n_sectors)."""
    import pandas as pd
    import pyarrow as pa

    from ..kernels import codecs

    tpx = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y
    rows, cols = spec.rows, spec.columns
    nodata = spec.nodata
    res = spec.res
    sr, sc = int(station_rc[0]), int(station_rc[1])
    S = int(n_sectors)
    w = 2.0 * math.pi / S

    def emit(batch: pa.Table) -> pa.Table:
        trs = batch["tile_row"].to_numpy(zero_copy_only=False)
        tcs = batch["tile_col"].to_numpy(zero_copy_only=False)
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        skey, src_tr, src_tc, data, pfmt = [], [], [], [], []
        for i in range(batch.num_rows):
            tr, tc = int(trs[i]), int(tcs[i])
            ks = _sectors_of_rect(
                tr * tpx - 2, (tr + 1) * tpx + 1, tc * tpx - 2, (tc + 1) * tpx + 1,
                sr, sc, S,
            )
            for k in ks:
                skey.append(k)
                src_tr.append(tr)
                src_tc.append(tc)
                data.append(blobs[i])
                pfmt.append(fmts[i])
        return pa.table(
            {
                "skey": pa.array(skey, pa.int64()),
                "src_tr": pa.array(src_tr, pa.int64()),
                "src_tc": pa.array(src_tc, pa.int64()),
                "data": pa.array(data, pa.binary()),
                "pfmt": pa.array(pfmt, pa.string()),
            }
        )

    def per_sector(g: pd.DataFrame) -> pd.DataFrame:
        k = int(g["skey"].iloc[0])
        tiles: dict[tuple[int, int], np.ndarray] = {}
        for tr, tc, data, pfmt in zip(g["src_tr"], g["src_tc"], g["data"], g["pfmt"]):
            tiles[(int(tr), int(tc))] = codecs.decode_tile(bytes(data), pfmt)
        trs = [t for t, _ in tiles]
        tcs = [c for _, c in tiles]
        pr0, pr1 = min(trs) * tpx, (max(trs) + 1) * tpx
        pc0, pc1 = min(tcs) * tpx, (max(tcs) + 1) * tpx
        patch = np.full((pr1 - pr0, pc1 - pc0), nodata, dtype=np.float64)
        for (tr, tc), garr in tiles.items():
            patch[tr * tpx - pr0 : (tr + 1) * tpx - pr0,
                  tc * tpx - pc0 : (tc + 1) * tpx - pc0] = garr
        # the station's tile is in every sector's wedge (its dilated rect
        # contains the station → full-circle interval)
        zs = float(patch[sr - pr0, sc - pc0]) + station_height
        out_keys, out_data = [], []
        for (tr, tc), garr in tiles.items():
            rr, cc = np.meshgrid(
                np.arange(tr * tpx, (tr + 1) * tpx),
                np.arange(tc * tpx, (tc + 1) * tpx),
                indexing="ij",
            )
            theta = np.arctan2(rr - sr, cc - sc)
            own = np.clip(np.floor((theta + math.pi) / w).astype(np.int64), 0, S - 1) == k
            if not own.any():
                continue
            idx = np.flatnonzero(own.ravel())
            r_t = rr.ravel()[idx]
            c_t = cc.ravel()[idx]
            z_t = garr.ravel()[idx]
            stn = (r_t == sr) & (c_t == sc)
            vis = np.ones(len(idx))
            nz = ~stn
            if nz.any():
                vis[nz] = _viewshed_cells(
                    patch, pr0, pc0, rows, cols, nodata, sr, sc, zs, res,
                    r_t[nz], c_t[nz], z_t[nz],
                )
            vis[z_t == nodata] = nodata
            partial = np.full((tpx, tpx), np.nan)
            partial.ravel()[idx] = vis
            out_keys.append(tr * tiles_x + tc)
            out_data.append(codecs.encode_tile(partial, "f64"))
        return pd.DataFrame(
            {
                "tkey": pd.Series(out_keys, dtype=np.int64),
                "data": pd.Series(out_data, dtype=object),
            }
        )

    def merge_tile(g: pd.DataFrame) -> pd.DataFrame:
        tkey = int(g["tkey"].iloc[0])
        out = np.full((tpx, tpx), np.nan)
        for data in g["data"]:
            p = codecs.decode_tile(bytes(data), "f64")
            m = ~np.isnan(p)
            out[m] = p[m]
        out[np.isnan(out)] = nodata
        return pd.DataFrame(
            {
                "tile_row": [tkey // tiles_x],
                "tile_col": [tkey % tiles_x],
                "bytes": [codecs.encode_tile(out, out_fmt)],
                "fmt": [out_fmt],
            }
        )

    sectors = tiles_ds.map_batches(emit, batch_format="pyarrow")
    partials = sectors.groupby("skey").map_groups(per_sector, batch_format="pandas")
    return partials.groupby("tkey").map_groups(merge_tile, batch_format="pandas")


def visibility_index_ds(tiles_ds, spec, station_step: int = 8,
                        height: float = 2.0, out_fmt: str = "f32"):
    """VisibilityIndex over the tile table: broadcast-DEM +
    station-parallel. The DEM is assembled once and ``ray.put`` into the
    object store (the small side — the op is O(stations × cells ×
    ray-length) compute-bound); stations fan out as a Dataset, each task
    accumulates visible-counts for its stations over the whole scene,
    and per-tile counts reduce on tile key. For scenes too large to
    broadcast, run ``viewshed_ds`` per station instead."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    from ..kernels import codecs

    tpx = spec.tile_px
    tiles_x = spec.tiles_x
    nodata = spec.nodata
    res = spec.res

    table = pa.concat_tables(
        [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
         for t in ray.get(tiles_ds.to_arrow_refs())]
    )
    grid = np.full((spec.rows, spec.columns), nodata, dtype=np.float64)
    for i in range(table.num_rows):
        tr = int(table["tile_row"][i].as_py())
        tc = int(table["tile_col"][i].as_py())
        grid[tr * tpx : (tr + 1) * tpx, tc * tpx : (tc + 1) * tpx] = codecs.decode_tile(
            table["bytes"][i].as_py(), table["fmt"][i].as_py()
        )
    grid_ref = ray.put(grid)
    stations = [
        {"sr": r, "sc": c}
        for r in range(station_step // 2, spec.rows, station_step)
        for c in range(station_step // 2, spec.columns, station_step)
        if grid[r, c] != nodata
    ]
    n_st = max(len(stations), 1)

    def per_station_batch(batch: pa.Table) -> pa.Table:
        g = ray.get(grid_ref)
        count = np.zeros(g.shape)
        for srv, scv in zip(
            batch["sr"].to_numpy(zero_copy_only=False),
            batch["sc"].to_numpy(zero_copy_only=False),
        ):
            vs = viewshed(g, nodata, (int(srv), int(scv)),
                          station_height=height, res=res)
            count += vs == 1.0
        tkeys, blobs = [], []
        for tr in range(spec.tiles_y):
            for tc in range(tiles_x):
                sub = count[tr * tpx : (tr + 1) * tpx, tc * tpx : (tc + 1) * tpx]
                if not sub.any():
                    continue
                tkeys.append(tr * tiles_x + tc)
                blobs.append(codecs.encode_tile(sub, "f64"))
        return pa.table(
            {"tkey": pa.array(tkeys, pa.int64()), "data": pa.array(blobs, pa.binary())}
        )

    def reduce_tile(g: pd.DataFrame) -> pd.DataFrame:
        tkey = int(g["tkey"].iloc[0])
        tot = np.zeros((tpx, tpx))
        for data in g["data"]:
            tot += codecs.decode_tile(bytes(data), "f64")
        tr, tc = tkey // tiles_x, tkey % tiles_x
        out = tot / n_st
        g0 = ray.get(grid_ref)
        sub = g0[tr * tpx : (tr + 1) * tpx, tc * tpx : (tc + 1) * tpx]
        out[sub == nodata] = nodata
        return pd.DataFrame(
            {
                "tile_row": [tr],
                "tile_col": [tc],
                "bytes": [codecs.encode_tile(out, out_fmt)],
                "fmt": [out_fmt],
            }
        )

    st_ds = rd.from_items(stations).map_batches(per_station_batch, batch_format="pyarrow", batch_size=4)
    return st_ds.groupby("tkey").map_groups(reduce_tile, batch_format="pandas")
