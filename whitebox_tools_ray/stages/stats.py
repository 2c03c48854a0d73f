"""Global aggregate → broadcast → re-map stages (the GA→M family).

- ``zscores``   — math_stat_analysis/zscores.rs: global mean/σ
  (Raster::calculate_mean_and_stdev, raster/mod.rs:961-997) then
  per-record standardize.
- ``quantiles`` — math_stat_analysis/quantiles.rs: global quantile cuts
  then per-record class assignment (1-based class index).
- ``reclass``   — math_stat_analysis/reclass.rs: value→class LUT with
  (new, from, to) ranges, broadcast, one vectorized map.
- ``minmax_stretch`` / ``histogram`` — the contrast-stretch family's
  two-phase skeleton (image_analysis/histogram_equalization.rs:252-296).

All compute the scalar(s) with Dataset aggregates (tiny result), then run
ONE second map pass — the input streams twice but never materializes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_mean_std(ds, col: str) -> tuple[float, float]:
    """Population mean/σ via sum + sum-of-squares partials."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"s": [float(v.sum())], "ss": [float((v**2).sum())], "n": [len(v)]})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("s", alias_name="s"), Sum("ss", alias_name="ss"), Sum("n", alias_name="n"))
    )
    n = float(agg["n"])
    mean = agg["s"] / n
    var = max(agg["ss"] / n - mean**2, 0.0)
    return mean, float(np.sqrt(var))


def zscores(ds, col: str, out_col: str = "zscore"):
    mean, std = global_mean_std(ds, col)

    def remap(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column(out_col, pa.array((v - mean) / std))

    return ds.map_batches(remap, batch_format="pyarrow")


def quantile_cuts(ds, col: str, num_quantiles: int, sample_limit: int = 2_000_000) -> np.ndarray:
    """Quantile cut points. Exact when the column fits the driver cap,
    else a uniform sample (documented approximation for 100 TB inputs;
    the reference loads everything in RAM so exactness there is moot)."""
    n = ds.count()
    col_ds = ds.select_columns([col])
    if n > sample_limit:
        col_ds = col_ds.random_sample(sample_limit / n, seed=42)
    v = col_ds.to_pandas()[col].to_numpy(np.float64)
    qs = np.linspace(0, 1, num_quantiles + 1)[1:-1]
    return np.quantile(v, qs)


def quantiles(ds, col: str, num_quantiles: int = 4, out_col: str = "quantile"):
    """Append 1-based quantile class of ``col`` (quantiles.rs GA→M)."""
    cuts = quantile_cuts(ds, col, num_quantiles)

    def remap(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        cls = np.searchsorted(cuts, v, side="right") + 1
        return batch.append_column(out_col, pa.array(cls.astype(np.int64)))

    return ds.map_batches(remap, batch_format="pyarrow")


def reclass(ds, col: str, ranges: list[tuple[float, float, float]], out_col: str = "reclass", nodata: float | None = None):
    """LUT reclass: ranges = [(new_value, from_incl, to_excl), ...]
    (reclass.rs range mode). Values matching no range pass through
    (or become ``nodata`` when given)."""
    rng = np.asarray(ranges, dtype=np.float64)

    def remap(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = v.copy() if nodata is None else np.full_like(v, nodata)
        for new, lo, hi in rng:
            m = (v >= lo) & (v < hi)
            out[m] = new
        return batch.append_column(out_col, pa.array(out))

    return ds.map_batches(remap, batch_format="pyarrow")


def minmax_stretch(ds, col: str, out_min: float = 0.0, out_max: float = 255.0, out_col: str = "stretched"):
    """MinMaxContrastStretch (image_analysis/min_max_contrast_stretch.rs):
    global min/max then linear remap."""
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(agg["lo"]), float(agg["hi"])
    span = (hi - lo) or 1.0

    def remap(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        s = (v - lo) / span * (out_max - out_min) + out_min
        return batch.append_column(out_col, pa.array(s))

    return ds.map_batches(remap, batch_format="pyarrow")


def histogram(ds, col: str, bins: int = 64, lo: float | None = None, hi: float | None = None):
    """Global histogram (RasterHistogram analog): per-batch partial
    counts summed driver-side; returns (edges, counts)."""
    from ray.data.aggregate import Max, Min

    if lo is None or hi is None:
        agg = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
        lo = float(agg["lo"]) if lo is None else lo
        hi = float(agg["hi"]) if hi is None else hi
    edges = np.linspace(lo, hi, bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        c, _ = np.histogram(v, bins=edges)
        return pa.table({"bin": np.arange(bins, dtype=np.int64), "n": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    counts = np.zeros(bins, dtype=np.int64)
    counts[out["bin"].to_numpy()] = out["n"].to_numpy()
    return edges, counts


def hypsometric_curve(ds, col: str, bins: int = 100):
    """Hypsometric curve (terrain_analysis/hypsometric_analysis.rs):
    normalized cumulative area ABOVE each normalized elevation.

    For each of ``bins`` relative-elevation levels h_i in [0,1]:
    rel_area_i = (#cells with elevation > lo + h_i*(hi-lo)) / N — the
    classic area-above-elevation distribution. Computed from the global
    histogram (one pass + one tiny shuffle); returns a pandas DataFrame
    (rel_elev, rel_area) with rel_elev ascending.
    """
    import pandas as pd

    edges, counts = histogram(ds, col, bins=bins)
    n = counts.sum()
    if n == 0:
        return pd.DataFrame({"rel_elev": [], "rel_area": []})
    lo, hi = edges[0], edges[-1]
    span = (hi - lo) or 1.0
    # area above the LOWER edge of each bin = suffix sum of counts
    above = np.cumsum(counts[::-1])[::-1]
    rel_elev = (edges[:-1] - lo) / span
    rel_area = above / n
    return pd.DataFrame({"rel_elev": rel_elev, "rel_area": rel_area})


def reclass_equal_interval(ds, col: str, interval: float, start: float | None = None,
                           out_col: str = "reclass"):
    """ReclassEqualInterval (reclass_equal_interval.rs): class value =
    lower edge of the interval bin containing the value."""
    lo, hi = None, None
    if start is None:
        from ray.data.aggregate import Max, Min

        def partial(batch):
            import pyarrow as _pa

            v = batch[col].to_numpy(zero_copy_only=False)
            return _pa.table({"lo": [float(np.nanmin(v))], "hi": [float(np.nanmax(v))]})

        agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
            Min("lo", alias_name="lo"), Max("hi", alias_name="hi")
        )
        lo, hi = float(agg["lo"]), float(agg["hi"])
        start = lo
    _ = hi

    def remap(batch):
        import pyarrow as _pa

        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        out = np.floor((v - start) / interval) * interval + start
        return batch.append_column(out_col, _pa.array(out, _pa.float64()))

    return ds.map_batches(remap, batch_format="pyarrow")


def reclass_from_file(ds, col: str, text: str, out_col: str = "reclass"):
    """ReclassFromFile (reclass_from_file.rs): parse 'new;from;to' lines
    (comma/semicolon/tab/space separated) into the range LUT."""
    ranges = []
    for line in text.strip().splitlines():
        parts = [p for p in line.replace(",", " ").replace(";", " ").replace("\t", " ").split() if p]
        if len(parts) >= 3:
            ranges.append((float(parts[0]), float(parts[1]), float(parts[2])))
    return reclass(ds, col, ranges, out_col=out_col)
