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
