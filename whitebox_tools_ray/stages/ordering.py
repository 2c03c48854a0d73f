"""Deterministic global row numbering (FID assignment) without a
single-node bottleneck.

The reference assigns FIDs by sequential scan order (clip.rs:338-354 —
survivors renumbered 1..n in input order; raster_to_vector_points.rs:
209-229 — row-major scan order). A distributed engine must reproduce
that exactly without funnelling the dataset through one task. Two
strategies:

- ``sort`` (default): ONE range-partitioned ``Dataset.sort`` on the
  order key (Ray's best-optimized shuffle), materialized, then two
  block-level passes: (a) per-block (min_key, row_count) — a tiny
  table — cumulated driver-side into per-block offsets; (b) per-block
  rank = offset + local position. Sorted blocks hold disjoint key
  ranges, so block offsets are exact. The materialize pins only the
  SURVIVOR set (already filtered), not the input.
- ``groupby``: the original bucketed form (hash shuffle on
  ``key // bucket_size``, per-bucket sort + prefix offsets) — no
  materialization, for survivor sets too large to pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _sort_strategy(ds, order_col: str, index_col: str, start: int):
    sorted_ds = ds.sort(order_col).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        key = batch[order_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {"min_key": [int(key.min()) if len(key) else -1], "n": [len(key)]}
        )

    meta = sorted_ds.map_batches(block_meta, batch_size=None, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0].sort_values("min_key")
    offsets = dict(
        zip(meta["min_key"].astype(np.int64), meta["n"].cumsum().shift(fill_value=0).astype(np.int64))
    )

    def assign(batch: pa.Table) -> pa.Table:
        key = batch[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(key) == 0:
            return batch.append_column(index_col, pa.array([], pa.int64()))
        off = offsets[int(key.min())]
        order = np.argsort(key, kind="stable")
        rank = np.empty(len(key), dtype=np.int64)
        rank[order] = np.arange(len(key), dtype=np.int64)
        return batch.append_column(index_col, pa.array(rank + off + start, pa.int64()))

    return sorted_ds.map_batches(assign, batch_size=None, batch_format="pyarrow")


def _groupby_strategy(ds, order_col: str, index_col: str, start: int, bucket_size: int):
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


def zip_with_order_index(
    ds,
    order_col: str,
    index_col: str = "FID",
    start: int = 1,
    bucket_size: int = 1 << 20,
    strategy: str = "sort",
    tiebreak_col: str | None = None,
):
    """Append ``index_col`` = rank of ``order_col`` (1-based by default).

    ``order_col`` must be int64-castable and unique (it defines the total
    order). Result row order is whatever the strategy's shuffle produced
    — the INDEX VALUES carry the scan order.

    ``auto`` (default): when the survivor KEY COLUMN is small (< ~80 MB,
    10M rows), pull just that column, sort driver-side, broadcast the
    sorted array and assign rank = searchsorted — one parallel pass and
    no shuffle (Ray's range-partitioned sort carries a ~2 s fixed cost
    that dwarfs small inputs; measured 2.0 s for 1.4 M rows at 32 CPUs
    vs 0.3 s for this path). Larger inputs use the sort strategy.
    """
    if strategy == "auto":
        mat = ds.materialize()
        n = mat.count()
        if n <= 10_000_000:
            out = _broadcast_strategy(mat, order_col, index_col, start, tiebreak_col)
            if out is not None:
                return out
        return _sort_strategy(mat, order_col, index_col, start)
    if strategy == "sort":
        return _sort_strategy(ds, order_col, index_col, start)
    if strategy == "groupby":
        return _groupby_strategy(ds, order_col, index_col, start, bucket_size)
    raise ValueError("strategy must be 'sort' or 'groupby'")


def _block_refs(mat_ds):
    """Ordered NON-EMPTY block refs of a materialized Dataset (data
    stays in the object store; only refs + metadata come to the
    driver). Empty blocks are dropped — they can carry an empty schema
    that would poison the re-assembled dataset's schema union."""
    refs = []
    for bundle in mat_ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    return refs


def _broadcast_strategy(mat_ds, order_col: str, index_col: str, start: int,
                        tiebreak_col: str | None = None):
    """Small-side exact ranks: driver sorts the key column only.

    Key collection and rank assignment run as ONE raw Ray task per
    already-materialized block (refs from ``iter_internal_ref_bundles``)
    instead of two further Dataset executions — each extra execution
    round was a measured ~0.2-0.4 s of fixed operator setup at this
    input size, which dominated the FID overhead. Blocks never leave
    the object store; the driver holds only the key column.

    The driver computes the FULL rank array with a stable sort over the
    keys in block-concatenation order (optionally refined by
    ``tiebreak_col`` via lexsort) and ships each block its own slice —
    no broadcast table, no worker-side searchsorted. Tied keys take
    distinct consecutive ranks in block order; that is deterministic
    for a given materialized block layout, and when tied rows are
    full-row duplicates (the only case the reference's scan-order FID
    can't distinguish either) every assignment yields the same row
    multiset."""
    import ray
    import ray.data as rd

    cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    refs = _block_refs(mat_ds)
    if not refs:  # all blocks empty — typed empty result
        schema = mat_ds.schema()
        fields = list(zip(schema.names, schema.types)) + [(index_col, pa.int64())]
        empty = pa.table({n: pa.array([], type=t) for n, t in fields})
        return rd.from_arrow(empty)

    @ray.remote
    def pull_keys(block):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0:  # empty blocks may carry an empty schema
            return {c: np.array([], dtype=np.int64) for c in cols}
        return {c: t[c].to_numpy(zero_copy_only=False) for c in cols}

    key_parts = ray.get([pull_keys.remote(r) for r in refs])
    keys = np.concatenate([p[order_col] for p in key_parts]).astype(np.int64) \
        if key_parts else np.array([], dtype=np.int64)
    if tiebreak_col:
        tb_all = np.concatenate([p[tiebreak_col] for p in key_parts]).astype(
            np.float64).view(np.int64) if key_parts else np.array([], dtype=np.int64)
        order = np.lexsort((tb_all, keys))  # stable: block order breaks remaining ties
    else:
        order = np.argsort(keys, kind="stable")
    rank = np.empty(len(keys), dtype=np.int64)
    rank[order] = np.arange(len(keys), dtype=np.int64)

    sizes = [len(p[order_col]) for p in key_parts]
    bounds = np.concatenate([[0], np.cumsum(sizes)])

    @ray.remote
    def assign_blk(block, rk):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0:
            return t.append_column(index_col, pa.array([], pa.int64()))
        return t.append_column(index_col, pa.array(rk, pa.int64()))

    return rd.from_arrow_refs(
        [
            assign_blk.remote(r, rank[bounds[i]: bounds[i + 1]] + start)
            for i, r in enumerate(refs)
        ]
    )
