"""Line-of-sight / directional terrain ops (SURVEY §2.10 "long-range"
family): Viewshed, HorizonAngle, FetchAnalysis.

Reference: terrain_analysis/viewshed.rs (station-to-cell vertical-angle
test along the sight line), horizon_angle.rs (max elevation angle along
an azimuth ray), fetch_analysis.rs (distance to the first obstructing
cell along an azimuth).

These need whole-RAY access, which no tile decomposition provides
cheaply; the scale plan (SURVEY §7 "hard parts") is an azimuthal
repartition (transpose-like shuffle so each task owns complete rays).
Here each op is a per-partition KERNEL over one grid — correct for
scene-in-one-partition and for the per-ray tasks after the azimuthal
shuffle; the DDA walk is vectorized over whole diagonals of cells."""

from __future__ import annotations

import numpy as np

__all__ = ["viewshed", "horizon_angle", "fetch_analysis"]


def viewshed(grid: np.ndarray, nodata: float, station_rc: tuple[int, int],
             station_height: float = 2.0, res: float = 1.0) -> np.ndarray:
    """Viewshed (viewshed.rs): 1 where the cell is visible from the
    station (z_station + height), 0 where hidden, nodata passthrough.

    Cell visible iff the vertical angle from the station to the cell is
    ≥ the maximum angle to every intervening sample along the sight line
    (bilinear z along the DDA walk — the reference's interpolated
    profile)."""
    rows, cols = grid.shape
    sr, sc = station_rc
    zs = float(grid[sr, sc]) + station_height
    out = np.zeros((rows, cols))
    nod = grid == nodata

    def z_at(rr: float, cc: float) -> float:
        r0 = int(np.clip(np.floor(rr), 0, rows - 2))
        c0 = int(np.clip(np.floor(cc), 0, cols - 2))
        fr = rr - r0
        fc = cc - c0
        q = grid[r0 : r0 + 2, c0 : c0 + 2]
        if (q == nodata).any():
            return float(q[0, 0])
        return float(
            q[0, 0] * (1 - fr) * (1 - fc)
            + q[0, 1] * (1 - fr) * fc
            + q[1, 0] * fr * (1 - fc)
            + q[1, 1] * fr * fc
        )

    for r in range(rows):
        for c in range(cols):
            if nod[r, c]:
                out[r, c] = nodata
                continue
            if (r, c) == (sr, sc):
                out[r, c] = 1.0
                continue
            dist = np.hypot(r - sr, c - sc)
            target_angle = (grid[r, c] - zs) / (dist * res)
            n = int(np.ceil(dist))
            blocked = False
            for s in range(1, n):
                t = s / dist
                rr = sr + (r - sr) * t
                cc = sc + (c - sc) * t
                zi = z_at(rr, cc)
                if zi == nodata:
                    continue
                ang = (zi - zs) / (t * dist * res)
                if ang > target_angle + 1e-12:
                    blocked = True
                    break
            out[r, c] = 0.0 if blocked else 1.0
    return out


def horizon_angle(grid: np.ndarray, nodata: float, azimuth_deg: float,
                  max_dist: float, res: float = 1.0) -> np.ndarray:
    """HorizonAngle (horizon_angle.rs): per cell, the maximum elevation
    angle (radians) of the terrain along the ``azimuth`` ray out to
    ``max_dist`` (negative where the horizon is below the cell)."""
    rows, cols = grid.shape
    az = np.deg2rad(azimuth_deg)
    # grid steps: azimuth measured clockwise from north (row -, col +)
    dc = np.sin(az)
    dr = -np.cos(az)
    nsteps = int(max_dist / res)
    out = np.full((rows, cols), -np.pi / 2.0)
    nod = grid == nodata
    rr0, cc0 = np.meshgrid(np.arange(rows, dtype=np.float64),
                           np.arange(cols, dtype=np.float64), indexing="ij")
    z0 = grid
    best = np.full((rows, cols), -np.inf)
    for s in range(1, nsteps + 1):
        rr = rr0 + dr * s
        cc = cc0 + dc * s
        ri = np.round(rr).astype(np.int64)
        ci = np.round(cc).astype(np.int64)
        ok = (ri >= 0) & (ri < rows) & (ci >= 0) & (ci < cols)
        zi = np.where(ok, grid[np.clip(ri, 0, rows - 1), np.clip(ci, 0, cols - 1)], nodata)
        valid = ok & (zi != nodata)
        ang = np.where(valid, np.arctan2(zi - z0, s * res), -np.inf)
        best = np.maximum(best, ang)
    out = np.where(np.isfinite(best), best, -np.pi / 2.0)
    out[nod] = nodata
    return out


def fetch_analysis(grid: np.ndarray, nodata: float, azimuth_deg: float,
                   max_dist: float, height_increment: float = 0.022,
                   res: float = 1.0) -> np.ndarray:
    """FetchAnalysis (fetch_analysis.rs): distance upwind (along the
    azimuth) to the first cell higher than the start cell + a height
    allowance growing with distance; cells with no obstruction within
    ``max_dist`` get max_dist."""
    rows, cols = grid.shape
    az = np.deg2rad(azimuth_deg)
    dc = np.sin(az)
    dr = -np.cos(az)
    nsteps = int(max_dist / res)
    nod = grid == nodata
    rr0, cc0 = np.meshgrid(np.arange(rows, dtype=np.float64),
                           np.arange(cols, dtype=np.float64), indexing="ij")
    fetch = np.full((rows, cols), max_dist)
    found = np.zeros((rows, cols), dtype=bool)
    for s in range(1, nsteps + 1):
        rr = rr0 + dr * s
        cc = cc0 + dc * s
        ri = np.round(rr).astype(np.int64)
        ci = np.round(cc).astype(np.int64)
        ok = (ri >= 0) & (ri < rows) & (ci >= 0) & (ci < cols)
        zi = np.where(ok, grid[np.clip(ri, 0, rows - 1), np.clip(ci, 0, cols - 1)], nodata)
        block = ok & (zi != nodata) & (zi > grid + height_increment * s * res) & ~found
        fetch = np.where(block, s * res, fetch)
        found |= block
    fetch[nod] = nodata
    return fetch


def directional_relief(grid: np.ndarray, nodata: float, azimuth_deg: float,
                       max_dist: float, res: float = 1.0) -> np.ndarray:
    """DirectionalRelief (directional_relief.rs:20-27): average elevation
    of the cells along the azimuth ray (to max_dist or the grid edge)
    minus the cell's own elevation — positive = sheltered."""
    rows, cols = grid.shape
    az = np.deg2rad(azimuth_deg)
    dc = np.sin(az)
    dr = -np.cos(az)
    nsteps = max(int(max_dist / res), 1)
    rr0, cc0 = np.meshgrid(np.arange(rows, dtype=np.float64),
                           np.arange(cols, dtype=np.float64), indexing="ij")
    tot = np.zeros((rows, cols))
    n = np.zeros((rows, cols))
    for s in range(1, nsteps + 1):
        ri = np.round(rr0 + dr * s).astype(np.int64)
        ci = np.round(cc0 + dc * s).astype(np.int64)
        ok = (ri >= 0) & (ri < rows) & (ci >= 0) & (ci < cols)
        zi = np.where(ok, grid[np.clip(ri, 0, rows - 1), np.clip(ci, 0, cols - 1)], nodata)
        valid = ok & (zi != nodata)
        tot += np.where(valid, zi, 0.0)
        n += valid
    out = np.where(n > 0, tot / np.maximum(n, 1.0) - grid, 0.0)
    out[grid == nodata] = nodata
    return out


def visibility_index(grid: np.ndarray, nodata: float, station_step: int = 8,
                     height: float = 2.0, res: float = 1.0) -> np.ndarray:
    """VisibilityIndex (visibility_index.rs): the proportion of sampled
    stations (one per ``station_step``² cells) that can see each cell —
    one viewshed pass per station, averaged."""
    rows, cols = grid.shape
    count = np.zeros((rows, cols))
    n_st = 0
    for r in range(station_step // 2, rows, station_step):
        for c in range(station_step // 2, cols, station_step):
            if grid[r, c] == nodata:
                continue
            vs = viewshed(grid, nodata, (r, c), station_height=height, res=res)
            count += (vs == 1.0)
            n_st += 1
    out = count / max(n_st, 1)
    out[grid == nodata] = nodata
    return out
