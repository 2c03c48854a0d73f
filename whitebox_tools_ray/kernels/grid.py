"""Raster-grid coordinate math and the tile-assignment rule.

Reproduces the reference's cell-addressing invariants exactly
(float64, same arithmetic order):

- world→grid: ``col = floor((x - west)/res_x)``,
  ``row = floor((north - y)/res_y)``  (/root/reference/src/raster/mod.rs:635-641)
- grid→world (cell-center convention): ``x = west + res_x/2 + col*res_x``,
  ``y = north - res_y/2 - row*res_y``  (raster/mod.rs:620-633)
- tile assignment (LidarTile rule, lidar_analysis/lidar_tile.rs:257-281):
  grid anchored at a user origin;
  ``start_x_grid = floor((min_x - origin_x)/width_x)``;
  ``col = floor((x - origin_x)/width_x - start_x_grid)``;
  ``tile_id = row * cols + col``; hard cap 32767 tiles
  (lidar_tile.rs:265-270); tiles with ``<= min_points`` points dropped
  (lidar_tile.rs:313-318); output naming re-based to the minimum occupied
  row/col + 1 (lidar_tile.rs:320-360).

The default grid origin/resolution mirrors the reference fixture DEM
extents (testdata/DEM.dep:3-6): west 664737.05, north 4895782.59, res 90.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# Reference-fixture-aligned defaults (testdata/DEM.dep:3-6,17)
DEFAULT_WEST = 664737.05
DEFAULT_NORTH = 4895782.59
DEFAULT_RES = 90.0
DEFAULT_NODATA = -32768.0


@dataclass(frozen=True)
class GridSpec:
    """Georeferencing of a dense grid — the RasterConfigs analog
    (src/raster/mod.rs:1140-1216; nodata default -32768, :1184)."""

    west: float = DEFAULT_WEST
    north: float = DEFAULT_NORTH
    res_x: float = DEFAULT_RES
    res_y: float = DEFAULT_RES
    rows: int = 0
    columns: int = 0
    nodata: float = DEFAULT_NODATA
    epsg: int = 26918

    @property
    def south(self) -> float:
        return self.north - self.rows * self.res_y

    @property
    def east(self) -> float:
        return self.west + self.columns * self.res_x

    # --- world↔grid, vectorized (accept scalars or arrays) ---

    def col_from_x(self, x):
        return np.floor((np.asarray(x, dtype=np.float64) - self.west) / self.res_x).astype(np.int64)

    def row_from_y(self, y):
        return np.floor((self.north - np.asarray(y, dtype=np.float64)) / self.res_y).astype(np.int64)

    def x_from_col(self, col):
        return self.west + self.res_x / 2.0 + np.asarray(col, dtype=np.float64) * self.res_x

    def y_from_row(self, row):
        return self.north - self.res_y / 2.0 - np.asarray(row, dtype=np.float64) * self.res_y


@dataclass(frozen=True)
class TileGrid:
    """The LidarTile tiling rule (lidar_tile.rs:257-281) over an extent.

    ``width_x``/``width_y`` are tile sizes in world units; ``origin``
    anchors the grid. ``from_extent`` computes ``start/end`` grid lines
    and row/col counts exactly as the reference does.
    """

    origin_x: float
    origin_y: float
    width_x: float
    width_y: float
    start_x_grid: float
    start_y_grid: float
    cols: int
    rows: int

    MAX_TILES: int = field(default=32767, init=False, repr=False)

    @classmethod
    def from_extent(
        cls,
        min_x: float,
        max_x: float,
        min_y: float,
        max_y: float,
        width_x: float,
        width_y: float,
        origin_x: float = 0.0,
        origin_y: float = 0.0,
    ) -> "TileGrid":
        start_x_grid = np.floor((min_x - origin_x) / width_x)
        end_x_grid = np.ceil((max_x - origin_x) / width_x)
        start_y_grid = np.floor((min_y - origin_y) / width_y)
        end_y_grid = np.ceil((max_y - origin_y) / width_y)
        cols = int(abs(end_x_grid - start_x_grid))
        rows = int(abs(end_y_grid - start_y_grid))
        tg = cls(
            origin_x=origin_x,
            origin_y=origin_y,
            width_x=width_x,
            width_y=width_y,
            start_x_grid=float(start_x_grid),
            start_y_grid=float(start_y_grid),
            cols=cols,
            rows=rows,
        )
        if rows * cols > tg.MAX_TILES:
            raise ValueError(
                f"too many output tiles ({rows * cols} > {tg.MAX_TILES}); "
                "choose a larger tile width (lidar_tile.rs:265-270)"
            )
        return tg

    def assign(self, x, y):
        """(tile_row, tile_col, tile_id) per point — lidar_tile.rs:277-281.

        ``col = floor((x - origin_x)/width_x - start_x_grid)`` (as usize —
        we keep int64), ``tile_id = row * cols + col``.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        col = np.floor((x - self.origin_x) / self.width_x - self.start_x_grid).astype(np.int64)
        row = np.floor((y - self.origin_y) / self.width_y - self.start_y_grid).astype(np.int64)
        tile_id = row * self.cols + col
        return row, col, tile_id


def rebase_tile_names(tile_rows: np.ndarray, tile_cols: np.ndarray):
    """Output tile naming: ``_row{r}_col{c}`` with r/c re-based to the
    minimum OCCUPIED row/col + 1 (lidar_tile.rs:320-360).

    Returns (name_rows, name_cols) arrays aligned with the inputs.
    """
    min_row = int(tile_rows.min())
    min_col = int(tile_cols.min())
    return tile_rows - min_row + 1, tile_cols - min_col + 1
