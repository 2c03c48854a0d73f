"""Grouped aggregates: ZonalStatistics, unique-value counts, binning.

ZonalStatistics (/root/reference/src/tools/math_stat_analysis/
zonal_statistics.rs:299-380+): per zone id over a value grid →
n/total/min/max/mean/std (σ via sum of squares pass). Here generalized to
any (zone_col, value_col) pair of a Dataset.

Scale pattern (ray_guide "Aggregation at scale"): partial aggregation
inside ``map_batches`` — one row per zone per batch — then a tiny
``groupby(zone).aggregate`` over the partials. The full-row shuffle a
bare groupby would do never happens; only (zones × batches) partial rows
move.

``list_unique_values`` is the ListUniqueValues analog
(math_stat_analysis/list_unique_values.rs — distinct + count) via the
same partial pattern. ``cell_binning`` is the VectorHexBinning analog
(gis_analysis/vector_hex_bin.rs:313-386 — per-point cell assign + count
per cell) on quad or hex cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import cells


def _partial_stats(batch: pa.Table, zone_col: str, value_col: str) -> pa.Table:
    df = pd.DataFrame(
        {
            "zone": batch[zone_col].to_numpy(zero_copy_only=False),
            "v": batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
        }
    )
    g = df.groupby("zone")["v"]
    out = pd.DataFrame(
        {
            "zone": g.count().index,
            "n": g.count().to_numpy(np.int64),
            "total": g.sum().to_numpy(np.float64),
            "total_sq": g.apply(lambda s: float((s**2).sum())).to_numpy(np.float64),
            "vmin": g.min().to_numpy(np.float64),
            "vmax": g.max().to_numpy(np.float64),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def zonal_statistics(ds, zone_col: str, value_col: str):
    """Dataset → Dataset[zone, n, total, vmin, vmax, mean, std].

    std is the population σ (√(E[x²]−E[x]²)) matching the reference's
    two-pass mean/σ computation (zonal_statistics.rs).
    """
    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(
        lambda b: _partial_stats(b, zone_col, value_col),
        batch_format="pyarrow",
        batch_size=262144,  # coalesce over-split blocks: Aggregate cost ~ input block count
    )
    agg = partials.groupby("zone").aggregate(
        Sum("n", alias_name="n"),
        Sum("total", alias_name="total"),
        Sum("total_sq", alias_name="total_sq"),
        Min("vmin", alias_name="vmin"),
        Max("vmax", alias_name="vmax"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        total = batch["total"].to_numpy(zero_copy_only=False)
        total_sq = batch["total_sq"].to_numpy(zero_copy_only=False)
        mean = total / n
        var = np.maximum(total_sq / n - mean**2, 0.0)
        t = batch.append_column("mean", pa.array(mean))
        t = t.append_column("std", pa.array(np.sqrt(var)))
        return t.drop_columns(["total_sq"])

    return agg.map_batches(finalize, batch_format="pyarrow")


def list_unique_values(ds, col: str):
    """Distinct values + counts of one column (partial-combine pattern)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch[col].to_pandas()).value_counts()
        return pa.table({"value": pa.array(vc.index), "n": pa.array(vc.to_numpy(np.int64))})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )


def cell_binning(
    ds,
    x_col: str,
    y_col: str,
    kind: str = "quad",
    level: int = 12,
):
    """Per-point cell assignment + count per cell — the hex/H3 binning
    analog on quad cells (kind='quad', SQL-oracle-able) or planar hex
    cells (kind='hex')."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        px = batch[x_col].to_numpy(zero_copy_only=False)
        py = batch[y_col].to_numpy(zero_copy_only=False)
        if kind == "quad":
            cid = cells.quad_cell(px, py, level)
        elif kind == "hex":
            q, r = cells.hex_cell(px, py, level)
            cid = cells.pack_hex(q, r, level)
        else:
            raise ValueError("kind must be 'quad' or 'hex'")
        vc = pd.Series(cid).value_counts()
        return pa.table(
            {"cell": pa.array(vc.index.to_numpy(np.int64)), "n": pa.array(vc.to_numpy(np.int64))}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
    )
