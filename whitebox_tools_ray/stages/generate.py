"""Deterministic raster / vector generators.

- create_plane        — CreatePlane (create_plane.rs): z = base +
  tan(slope)·distance along the aspect azimuth.
- random_field        — RandomField (random_field.rs): i.i.d. standard
  normal per cell; the reference draws thread_rng — a distributed
  engine needs replayable randomness, so cells hash (gid, seed) through
  splitmix64 and two uniforms → Box-Muller.
- turning_bands       — TurningBandsSimulation
  (turning_bands_simulation.rs): spatially autocorrelated field as the
  sum of `num_bands` 1-D cosine band processes with seeded directions
  and phases (Matheron's turning-bands construction); the `range`
  parameter sets the correlation length.
- create_rectangular_vector_grid / create_hexagonal_vector_grid —
  (create_rectangular_vector_grid.rs, create_hexagonal_vector_grid.rs):
  POLY_SCHEMA fishnets generated distributedly from a row range.

All raster generators emit the standard tile table shape
(tile_row, tile_col, bytes, fmt[, nodata]) via ``ray.data.range`` →
``map_batches`` — generation itself is distributed and deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import codecs


def _tile_table(spec, fn, fmt: str = "f32"):
    """Distributed tile synthesis: fn(global_row, global_col) -> grid."""
    import ray.data as rd

    tiles_x, tiles_y, tpx = spec.tiles_x, spec.tiles_y, spec.tile_px

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        rows = {"tile_row": [], "tile_col": [], "bytes": [], "fmt": []}
        for tid in ids:
            tr, tc = int(tid) // tiles_x, int(tid) % tiles_x
            yy, xx = np.meshgrid(
                np.arange(tr * tpx, (tr + 1) * tpx, dtype=np.float64),
                np.arange(tc * tpx, (tc + 1) * tpx, dtype=np.float64),
                indexing="ij",
            )
            rows["tile_row"].append(tr)
            rows["tile_col"].append(tc)
            rows["bytes"].append(codecs.encode_tile(fn(yy, xx), fmt))
            rows["fmt"].append(fmt)
        return pa.table(
            {
                "tile_row": pa.array(rows["tile_row"], pa.int32()),
                "tile_col": pa.array(rows["tile_col"], pa.int32()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "fmt": pa.array(rows["fmt"], pa.string()),
            }
        )

    return rd.range(tiles_x * tiles_y).map_batches(synth, batch_format="pyarrow", batch_size=16)


def create_plane(spec, base: float = 0.0, slope_deg: float = 1.0, aspect_deg: float = 90.0,
                 fmt: str = "f32"):
    """z = base + tan(slope)·(distance along aspect azimuth)."""
    g = np.tan(np.radians(slope_deg)) * spec.res
    az = np.radians(aspect_deg)
    dx, dy = np.sin(az), np.cos(az)

    def fn(yy, xx):
        return base + g * (xx * dx - yy * dy)

    return _tile_table(spec, fn, fmt=fmt)


def _splitmix_u01(gid: np.ndarray, seed: int) -> np.ndarray:
    x = (gid.astype(np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return ((x >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)


def random_field(spec, seed: int = 42):
    """Standard-normal field via per-cell Box-Muller on hashed uniforms."""
    W = spec.tiles_x * spec.tile_px

    def fn(yy, xx):
        gid = (yy * W + xx).astype(np.int64)
        u1 = _splitmix_u01(gid, seed * 2 + 1)
        u2 = _splitmix_u01(gid, seed * 2 + 2)
        return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)

    return _tile_table(spec, fn)


def turning_bands(spec, range_: float = 10.0, num_bands: int = 64, seed: int = 42):
    """Σ over bands of cos(ω·(x·cosθ + y·sinθ) + φ), scaled √(2/N)."""
    rng = np.random.default_rng(seed)
    thetas = rng.uniform(0.0, np.pi, num_bands)
    phases = rng.uniform(0.0, 2.0 * np.pi, num_bands)
    omegas = rng.rayleigh(scale=2.0 * np.pi / max(range_, 1e-9), size=num_bands)

    def fn(yy, xx):
        out = np.zeros_like(yy)
        for th, ph, om in zip(thetas, phases, omegas):
            out += np.cos(om * (xx * np.cos(th) + yy * np.sin(th)) + ph)
        return out * np.sqrt(2.0 / num_bands)

    return _tile_table(spec, fn)


def create_rectangular_vector_grid(xmin: float, ymin: float, xmax: float, ymax: float,
                                   width: float, height: float):
    """Fishnet of clockwise rectangles covering the extent."""
    import ray.data as rd

    from ..sources.vectors import POLY_SCHEMA, make_polygon_record

    nx = int(np.ceil((xmax - xmin) / width))
    ny = int(np.ceil((ymax - ymin) / height))

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        recs = []
        for i in ids:
            gx, gy = int(i) % nx, int(i) // nx
            x0, y0 = xmin + gx * width, ymin + gy * height
            x1, y1 = x0 + width, y0 + height
            ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0)]  # clockwise in y-up
            recs.append(make_polygon_record(int(i) + 1, [ring], f"cell_{gy}_{gx}", 1))
        return pa.Table.from_pydict(
            {k: [r[k] for r in recs] for k in POLY_SCHEMA.names}, schema=POLY_SCHEMA
        )

    return rd.range(nx * ny).map_batches(synth, batch_format="pyarrow", batch_size=256)


def create_hexagonal_vector_grid(xmin: float, ymin: float, xmax: float, ymax: float,
                                 width: float):
    """Pointy-top hex fishnet with edge length ``width``
    (create_hexagonal_vector_grid.rs layout: staggered columns)."""
    import ray.data as rd

    from ..sources.vectors import POLY_SCHEMA, make_polygon_record

    half_w = np.sqrt(3.0) / 2.0 * width  # horizontal half-pitch
    nx = int(np.ceil((xmax - xmin) / (2.0 * half_w))) + 1
    ny = int(np.ceil((ymax - ymin) / (1.5 * width))) + 1

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        recs = []
        for i in ids:
            gx, gy = int(i) % nx, int(i) // nx
            cx = xmin + gx * 2.0 * half_w + (half_w if gy % 2 else 0.0)
            cy = ymin + gy * 1.5 * width
            ring = []
            for k in range(6):
                a = np.pi / 6.0 + k * np.pi / 3.0
                ring.append((cx + width * np.cos(a), cy + width * np.sin(a)))
            ring = ring[::-1]  # clockwise shells in the y-up frame
            recs.append(make_polygon_record(int(i) + 1, [ring], f"hex_{gy}_{gx}", 1))
        return pa.Table.from_pydict(
            {k: [r[k] for r in recs] for k in POLY_SCHEMA.names}, schema=POLY_SCHEMA
        )

    return rd.range(nx * ny).map_batches(synth, batch_format="pyarrow", batch_size=256)
