"""Basins / Watershed — terminal-labeling over the D8 pointer grid.

Reference: hydro_analysis/basins.rs / watershed.rs — every cell receives
the label of the terminal it drains to (Basins: each outlet/pit gets its
own id; Watershed: labels seeded from pour points, unseeded cells 0).
The reference propagates labels upstream cell-by-cell.

Engine form: **pointer doubling** — build ``next[i]`` = flat index of
each cell's downstream neighbor (self for terminals), then repeat
``next = next[next]`` until fixed point: O(log longest-flow-path) fully
vectorized rounds instead of per-cell chasing. After convergence every
cell indexes its terminal directly; labels are a single gather.

Distribution note: pointer doubling is exactly the BSP-friendly form —
each doubling round is a gather that crosses tiles only through the
boundary cells' ``next`` entries, so the tiled version exchanges
per-tile (cell → next) tables for log(path) rounds. Here (single node)
the doubling runs on the assembled pointer grid; the flow-accumulation
actor machinery (stages/flow.py) is the template for the sharded form.
"""

from __future__ import annotations

import numpy as np

from ..kernels import codecs
from .focal import DX8, DY8


def _pointer_mosaic(pointer_tiles: dict[int, bytes], spec) -> np.ndarray:
    tpx = spec.tile_px
    ptr = np.full((spec.rows, spec.columns), -2, dtype=np.int8)
    for tid, blob in pointer_tiles.items():
        g = codecs.decode_tile(blob, "i8").astype(np.int8)
        r0 = (tid // spec.tiles_x) * tpx
        c0 = (tid % spec.tiles_x) * tpx
        ptr[r0 : r0 + tpx, c0 : c0 + tpx] = g
    return ptr


def terminal_index(ptr: np.ndarray) -> np.ndarray:
    """Flat index of each cell's drainage terminal via pointer doubling."""
    rows, cols = ptr.shape
    idx = np.arange(rows * cols, dtype=np.int64).reshape(rows, cols)
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    nxt = idx.copy()
    valid = ptr >= 0
    d = np.where(valid, ptr, 0).astype(np.int64)
    nr = rr + DY8[d]
    nc = cc + DX8[d]
    in_grid = (nr >= 0) & (nr < rows) & (nc >= 0) & (nc < cols)
    move = valid & in_grid
    nxt[move] = (nr[move] * cols + nc[move]).astype(np.int64)
    flat = nxt.ravel()
    while True:
        nxt2 = flat[flat]
        if np.array_equal(nxt2, flat):
            break
        flat = nxt2
    return flat.reshape(rows, cols)


def basins(pointer_tiles: dict[int, bytes], spec) -> dict[int, np.ndarray]:
    """Basins: unique 1-based id per terminal, ids in row-major terminal
    order (the reference's discovery ordering); nodata cells → nodata."""
    ptr = _pointer_mosaic(pointer_tiles, spec)
    term = terminal_index(ptr)
    rows, cols = ptr.shape
    valid = ptr != -2
    terms = np.unique(term[valid])
    label_of = np.zeros(rows * cols, dtype=np.int64)
    label_of[np.sort(terms)] = np.arange(1, len(terms) + 1)
    lab = label_of[term].astype(np.float64)
    lab[~valid] = spec.nodata
    tpx = spec.tile_px
    return {
        tid: lab[(tid // spec.tiles_x) * tpx : (tid // spec.tiles_x) * tpx + tpx,
                 (tid % spec.tiles_x) * tpx : (tid % spec.tiles_x) * tpx + tpx]
        for tid in pointer_tiles
    }


def watershed(pointer_tiles: dict[int, bytes], spec, pour_points: list[tuple[float, float, int]]):
    """Watershed: pour points (x, y, id) snap to their cell; every cell
    whose flow PATH passes through a pour cell gets that id (nearest pour
    point downstream wins, i.e. the FIRST one encountered walking
    downstream — watershed.rs semantics); others 0.

    Implemented as doubling over a modified pointer field where pour
    cells are made terminal first."""
    gs = spec.grid_spec()
    ptr = _pointer_mosaic(pointer_tiles, spec)
    rows, cols = ptr.shape
    pour = np.zeros((rows, cols), dtype=np.int64)
    ptr_mod = ptr.copy()
    for x, y, pid in pour_points:
        r = int(gs.row_from_y(np.float64(y)))
        c = int(gs.col_from_x(np.float64(x)))
        if 0 <= r < rows and 0 <= c < cols:
            pour[r, c] = pid
            ptr_mod[r, c] = -1  # pour cells become terminals
    term = terminal_index(ptr_mod)
    lab = pour.ravel()[term.ravel()].reshape(rows, cols).astype(np.float64)
    lab[ptr == -2] = spec.nodata
    tpx = spec.tile_px
    return {
        tid: lab[(tid // spec.tiles_x) * tpx : (tid // spec.tiles_x) * tpx + tpx,
                 (tid % spec.tiles_x) * tpx : (tid % spec.tiles_x) * tpx + tpx]
        for tid in pointer_tiles
    }


def _doubling_to_targets(ptr: np.ndarray, is_target: np.ndarray, step_values: np.ndarray):
    """Additive pointer doubling: for every cell, the SUM of step_values
    along its flow path until a target cell (or terminal) is reached.

    Returns (total, reached_target, terminal_index). log(path) rounds,
    each fully vectorized — the BSP-friendly form of the reference's
    per-cell downslope walks."""
    rows, cols = ptr.shape
    idx = np.arange(rows * cols, dtype=np.int64)
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    valid = ptr >= 0
    d = np.where(valid, ptr, 0).astype(np.int64)
    nr = rr + DY8[d]
    nc = cc + DX8[d]
    in_grid = (nr >= 0) & (nr < rows) & (nc >= 0) & (nc < cols)
    move = valid & in_grid & ~is_target  # targets are absorbing
    nxt = idx.reshape(rows, cols).copy()
    nxt[move] = (nr[move] * cols + nc[move]).astype(np.int64)
    nxt = nxt.ravel()
    acc = np.where(move, step_values, 0.0).ravel()
    while True:
        nxt2 = nxt[nxt]
        if np.array_equal(nxt2, nxt):
            break
        # absorbing cells (targets/terminals) carry acc = 0, so the
        # classic doubling update is exact everywhere:
        acc = acc + acc[nxt]
        nxt = nxt2
    term = nxt.reshape(rows, cols)
    reached = is_target.ravel()[nxt].reshape(rows, cols)
    return acc.reshape(rows, cols), reached, term


def downslope_distance_to_stream(pointer_tiles: dict[int, bytes], stream_tiles: dict[int, np.ndarray], spec):
    """DownslopeDistanceToStream (hydro_analysis/
    downslope_distance_to_stream.rs): flow-path length from each cell to
    the first stream cell; stream cells 0; paths that never reach a
    stream → nodata."""
    ptr = _pointer_mosaic(pointer_tiles, spec)
    rows, cols = ptr.shape
    stream = np.zeros((rows, cols), dtype=bool)
    tpx = spec.tile_px
    for tid, s in stream_tiles.items():
        r0 = (tid // spec.tiles_x) * tpx
        c0 = (tid % spec.tiles_x) * tpx
        stream[r0 : r0 + tpx, c0 : c0 + tpx] = s == 1.0
    res = spec.res
    diag = float(np.sqrt(2.0)) * res
    lengths = np.where((DY8 != 0) & (DX8 != 0), diag, res)
    step = np.where(ptr >= 0, lengths[np.where(ptr >= 0, ptr, 0)], 0.0)
    dist, reached, _term = _doubling_to_targets(ptr, stream, step)
    out = np.where(stream, 0.0, np.where(reached, dist, spec.nodata))
    out[ptr == -2] = spec.nodata
    return {
        tid: out[(tid // spec.tiles_x) * tpx : (tid // spec.tiles_x) * tpx + tpx,
                 (tid % spec.tiles_x) * tpx : (tid % spec.tiles_x) * tpx + tpx]
        for tid in pointer_tiles
    }


def elevation_above_stream(pointer_tiles: dict[int, bytes], stream_tiles: dict[int, np.ndarray],
                           dem_tiles: dict[int, np.ndarray], spec):
    """ElevationAboveStream (hydro_analysis/elevation_above_stream.rs):
    z(cell) − z(first stream cell downstream)."""
    ptr = _pointer_mosaic(pointer_tiles, spec)
    rows, cols = ptr.shape
    tpx = spec.tile_px
    stream = np.zeros((rows, cols), dtype=bool)
    dem = np.full((rows, cols), spec.nodata)
    for tid in pointer_tiles:
        r0 = (tid // spec.tiles_x) * tpx
        c0 = (tid % spec.tiles_x) * tpx
        stream[r0 : r0 + tpx, c0 : c0 + tpx] = stream_tiles[tid] == 1.0
        dem[r0 : r0 + tpx, c0 : c0 + tpx] = dem_tiles[tid]
    _dist, reached, term = _doubling_to_targets(ptr, stream, np.zeros((rows, cols)))
    zs = dem.ravel()[term.ravel()].reshape(rows, cols)
    out = np.where(reached & (dem != spec.nodata), dem - zs, spec.nodata)
    out[stream] = 0.0
    out[ptr == -2] = spec.nodata
    return {
        tid: out[(tid // spec.tiles_x) * tpx : (tid // spec.tiles_x) * tpx + tpx,
                 (tid % spec.tiles_x) * tpx : (tid % spec.tiles_x) * tpx + tpx]
        for tid in pointer_tiles
    }


def snap_pour_points(points: list[tuple[float, float, int]], accum_tiles: dict[int, np.ndarray], spec,
                     snap_dist: float):
    """SnapPourPoints (hydro_analysis/snap_pour_points.rs): move each
    pour point to the max-accumulation cell within ``snap_dist``."""
    gs = spec.grid_spec()
    tpx = spec.tile_px
    accum = np.full((spec.rows, spec.columns), spec.nodata)
    for tid, g in accum_tiles.items():
        r0 = (tid // spec.tiles_x) * tpx
        c0 = (tid % spec.tiles_x) * tpx
        accum[r0 : r0 + tpx, c0 : c0 + tpx] = g
    rad = int(np.floor(snap_dist / gs.res_x))
    out = []
    for x, y, pid in points:
        r = int(gs.row_from_y(np.float64(y)))
        c = int(gs.col_from_x(np.float64(x)))
        r0, r1 = max(0, r - rad), min(spec.rows, r + rad + 1)
        c0, c1 = max(0, c - rad), min(spec.columns, c + rad + 1)
        win = accum[r0:r1, c0:c1]
        br, bc = np.unravel_index(np.argmax(np.where(win == spec.nodata, -np.inf, win)), win.shape)
        out.append((float(gs.x_from_col(c0 + bc)), float(gs.y_from_row(r0 + br)), pid))
    return out
