"""Windowed aggregates over the events log.

The reference is strictly batch (SURVEY.md §2.11 — no streaming
operators exist), so windows are engine value-add following the
ray_guide "Streaming-shaped workloads" recipe: the events table is an
ordered, partitioned log — partition by key, sort by ts within the
partition group, window with pandas inside ``map_groups``.

- ``tumbling``  — fixed-size windows: floor(ts / size) (SQL-expressible).
- ``sliding``   — hop < size: a row lands in size/hop windows
  (flat-mapped per batch, then grouped).
- ``session``   — gap-based sessionization per key (map_groups with a
  cumulative gap counter — SQL twin uses LAG + running SUM).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_SEC = 1_000_000


def _ts_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    return batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)


def tumbling(ds, key_col: str, ts_col: str, value_col: str, size_s: int = 3600):
    """count + sum per (key, window-start-epoch-bucket)."""
    from ray.data.aggregate import Count, Sum

    def add_window(batch: pa.Table) -> pa.Table:
        w = _ts_us(batch, ts_col) // (size_s * US_PER_SEC)
        return batch.append_column("wstart", pa.array(w, pa.int64()))

    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby([key_col, "wstart"])
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="total"))
    )


def sliding(ds, key_col: str, ts_col: str, value_col: str, size_s: int = 3600, hop_s: int = 900):
    """Each event replicates into size/hop overlapping windows."""
    from ray.data.aggregate import Count, Sum

    n_windows = size_s // hop_s

    def explode(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch, ts_col)
        hop_us = hop_s * US_PER_SEC
        base = ts // hop_us
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        out_k, out_w, out_v = [], [], []
        for off in range(n_windows):
            w = (base - off) * hop_us
            valid = ts < w + size_s * US_PER_SEC
            out_k.append(keys[valid])
            out_w.append(w[valid])
            out_v.append(vals[valid])
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_k)),
                "wstart_us": pa.array(np.concatenate(out_w), pa.int64()),
                value_col: pa.array(np.concatenate(out_v)),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby([key_col, "wstart_us"])
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="total"))
    )


def session(ds, key_col: str, ts_col: str, value_col: str, gap_s: int = 1800):
    """Gap-based sessions per key: a new session starts when the gap to
    the previous event exceeds ``gap_s``. Returns one row per session:
    (key, session_start_us, n, total, duration_s).

    Ordering assumption: events for one key fit one group (hash shuffle
    on key); within the group pandas sorts by ts."""

    gap_us = gap_s * US_PER_SEC

    # coarse key-salt (one vectorized kernel per partition) instead of
    # one pandas call per distinct key — all keys of a salt partition
    # sessionize in one sorted sweep; a session break also falls on
    # every key change
    def add_salt(batch):
        import pyarrow as _pa

        k = batch[key_col]
        try:
            kv = k.to_numpy(zero_copy_only=False).astype(np.int64)
        except (ValueError, TypeError):
            kv = np.asarray([hash(x) for x in k.to_pylist()], dtype=np.int64)
        return batch.append_column("__salt", _pa.array(kv % 64))

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col], kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys = g[key_col].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (ts[1:] - ts[:-1] > gap_us) | (keys[1:] != keys[:-1])
        sid = np.cumsum(new_session) - 1
        n_sessions = int(sid[-1]) + 1 if len(g) else 0
        vals = g[value_col].to_numpy(np.float64)
        counts = np.bincount(sid, minlength=n_sessions)
        totals = np.bincount(sid, weights=vals, minlength=n_sessions)
        first_idx = np.flatnonzero(new_session)
        starts = ts[first_idx]  # ts sorted within each session run
        last_idx = np.append(first_idx[1:] - 1, len(g) - 1)
        ends = ts[last_idx]
        return pd.DataFrame(
            {
                key_col: keys[first_idx],
                "session_start_us": starts.astype(np.int64),
                "n": counts.astype(np.int64),
                "total": np.round(totals, 6),
                "duration_s": np.round((ends - starts) / US_PER_SEC, 6),
            }
        )

    return (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(lambda g: sessionize(g.drop(columns="__salt")), batch_format="pandas")
    )
