"""Deterministic global row numbering (FID assignment) without a
single-node bottleneck.

The reference assigns FIDs by sequential scan order (clip.rs:338-354 —
survivors renumbered 1..n in input order; raster_to_vector_points.rs:
209-229 — row-major scan order). A distributed engine must reproduce that
exactly without funnelling the dataset through one task, so:

1. bucket every row by a coarse monotone key ``bucket = order_key // B``
   (order_key must be a non-negative int64 whose sort order IS the scan
   order — e.g. ``record_id`` or ``row * columns + col``),
2. count rows per bucket (a tiny groupby), cumulative-sum the counts on
   the driver (bucket count is small and bounded by key_range/B),
3. broadcast the offsets; ``groupby(bucket).map_groups`` sorts each
   bucket internally and adds its offset.

One hash shuffle on an integer key; no global sort, no repartition(1).
At 100 TB, B is chosen so each bucket is ~one block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def zip_with_order_index(
    ds,
    order_col: str,
    index_col: str = "FID",
    start: int = 1,
    bucket_size: int = 1 << 20,
):
    """Append ``index_col`` = rank of ``order_col`` (1-based by default).

    ``order_col`` must be int64-castable, non-negative, and unique (it
    defines the total order). Returns a new Dataset; row order of the
    result is by bucket (ascending), which downstream sinks are free to
    re-sort or ignore — the INDEX VALUES are what carry the scan order.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("__bucket", pa.array(key // bucket_size, pa.int64()))

    with_bucket = ds.map_batches(add_bucket, batch_format="pyarrow")

    counts = with_bucket.groupby("__bucket").count().to_pandas()
    counts = counts.sort_values("__bucket")
    offs = counts["count()"].cumsum().shift(fill_value=0).astype(np.int64)
    offsets = dict(zip(counts["__bucket"].astype(np.int64), offs))

    def number_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        b = int(g["__bucket"].iloc[0])
        g[index_col] = np.arange(len(g), dtype=np.int64) + offsets[b] + start
        return g.drop(columns="__bucket")

    return with_bucket.groupby("__bucket").map_groups(number_group, batch_format="pandas")
