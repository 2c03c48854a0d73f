"""Multi-raster per-cell combines — the M2 family (SURVEY.md §2.4/§2.6).

Reference tools: Max/Min/Sum/Average/WeightedSum overlays
(gis_analysis/*_overlay.rs, weighted_sum.rs), NormalizedDifferenceIndex
(image_analysis/normalized_difference_index.rs: (A−B)/(A+B) with a 0/0
guard), HighestPosition/LowestPosition (argmax/argmin across a stack),
CountIf / PercentEqualTo (per-cell stack stats), ChangeVectorAnalysis.

Engine form: the aligned tile tables are zipped ON THE TILE KEY — every
input layer's batch carries (tile_row, tile_col, bytes, fmt); layers are
co-keyed by construction (same scene grid), so the combine is a groupby
on the tile key with one decoded stack per tile. For two layers with one
small side, the small side broadcasts instead (no shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import codecs

_STACK_OPS = {
    "max": lambda s: s.max(axis=0),
    "min": lambda s: s.min(axis=0),
    "sum": lambda s: s.sum(axis=0),
    "average": lambda s: s.mean(axis=0),
    "highest_position": lambda s: s.argmax(axis=0).astype(np.float64) + 1.0,  # 1-based like the reference
    "lowest_position": lambda s: s.argmin(axis=0).astype(np.float64) + 1.0,
    # MaxAbsoluteOverlay / MinAbsoluteOverlay (max_absolute_overlay.rs):
    # the SIGNED value whose magnitude is extreme
    "max_absolute": lambda s: np.take_along_axis(s, np.abs(s).argmax(axis=0)[None], 0)[0],
    "min_absolute": lambda s: np.take_along_axis(s, np.abs(s).argmin(axis=0)[None], 0)[0],
}

def _tag_layer(i):
    """Tag a tile table with a layer index; casts keys to the canonical
    int32 so unions of mixed-dtype layer inputs keep ONE schema."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile_row": batch["tile_row"].cast(pa.int32()),
                "tile_col": batch["tile_col"].cast(pa.int32()),
                "bytes": batch["bytes"],
                "fmt": batch["fmt"],
                "__layer": pa.array(np.full(batch.num_rows, i, dtype=np.int64)),
            }
        )

    return fn


def overlay(layer_dss: list, spec, op: str = "max", weights: list[float] | None = None):
    """N-ary per-cell overlay of aligned tile Datasets.

    ``op`` ∈ max|min|sum|average|highest_position|lowest_position or
    'weighted_sum' with ``weights``. Nodata in ANY layer → nodata out
    (the reference's overlay convention). Returns
    Dataset[tile_row, tile_col, bytes, fmt].
    """
    if op == "weighted_sum":
        if weights is None or len(weights) != len(layer_dss):
            raise ValueError("weighted_sum needs one weight per layer")
    elif op not in _STACK_OPS:
        raise ValueError(f"unknown overlay op {op!r}")
    nodata = spec.nodata

    tagged = layer_dss[0].map_batches(_tag_layer(0), batch_format="pyarrow")
    for i, ds in enumerate(layer_dss[1:], 1):
        tagged = tagged.union(ds.map_batches(_tag_layer(i), batch_format="pyarrow"))

    n_layers = len(layer_dss)
    w = np.asarray(weights, dtype=np.float64) if weights is not None else None

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__layer")
        if len(g) != n_layers:
            raise ValueError(f"tile ({g['tile_row'].iloc[0]},{g['tile_col'].iloc[0]}) has {len(g)} layers")
        stack = np.stack([codecs.decode_tile(bytes(b), f) for b, f in zip(g["bytes"], g["fmt"])])
        bad = (stack == nodata).any(axis=0)
        if op == "weighted_sum":
            out = np.tensordot(w, stack, axes=1)
        else:
            out = _STACK_OPS[op](stack)
        out[bad] = nodata
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(out, "f32"), "f32",
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")


def normalized_difference(ds_a, ds_b, spec, clip: float = 0.0):
    """NDI = (A−B)/(A+B); 0/0 → 0 (normalized_difference_index.rs
    convention); nodata in either input propagates.

    Routed through the same keyed tile zip as ``overlay`` (one groupby
    shuffle, both layers STREAM) — the broadcast-B driver dict of round 1
    capped B at driver memory and is gone (VERDICT r1)."""
    nodata = spec.nodata

    tagged = ds_a.map_batches(_tag_layer(0), batch_format="pyarrow").union(
        ds_b.map_batches(_tag_layer(1), batch_format="pyarrow")
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__layer")
        a = codecs.decode_tile(bytes(g["bytes"].iloc[0]), g["fmt"].iloc[0])
        b = codecs.decode_tile(bytes(g["bytes"].iloc[1]), g["fmt"].iloc[1])
        denom = a + b
        with np.errstate(all="ignore"):
            nd = np.where(denom != 0.0, (a - b) / denom, 0.0)
        nd[(a == nodata) | (b == nodata)] = nodata
        if clip > 0:
            nd = np.clip(nd, -clip, clip)
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(nd, "f32"), "f32",
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")


def count_if(layer_dss: list, spec, value: float):
    """CountIf (count_if.rs:239-249): per cell, how many stack layers
    equal ``value``. Reference semantics: a layer's nodata cell is simply
    skipped (``z == comparison_value && z != in_nodata``), and a cell that
    never matched in any layer stays NODATA in the output (the output is
    initialised to nodata and only set on the first match). Same
    zip-by-tile-key shape as overlay."""
    nodata = spec.nodata

    tagged = layer_dss[0].map_batches(_tag_layer(0), batch_format="pyarrow")
    for i, ds in enumerate(layer_dss[1:], 1):
        tagged = tagged.union(ds.map_batches(_tag_layer(i), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack([codecs.decode_tile(bytes(b), f) for b, f in zip(g["bytes"], g["fmt"])])
        cnt = ((stack == value) & (stack != nodata)).sum(axis=0).astype(np.float64)
        out = np.where(cnt > 0, cnt, nodata)
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(out, "f32"), "f32",
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")


def overlay_fn(ds_a, ds_b, spec, fn, out_fmt: str = "f32"):
    """Binary per-cell combine ``fn(a, b) -> out`` of two aligned tile
    Datasets via the keyed tile zip (one groupby shuffle, both layers
    stream). Nodata in either input propagates."""
    nodata = spec.nodata

    tagged = ds_a.map_batches(_tag_layer(0), batch_format="pyarrow").union(
        ds_b.map_batches(_tag_layer(1), batch_format="pyarrow")
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__layer")
        a = codecs.decode_tile(bytes(g["bytes"].iloc[0]), g["fmt"].iloc[0])
        b = codecs.decode_tile(bytes(g["bytes"].iloc[1]), g["fmt"].iloc[1])
        bad = (a == nodata) | (b == nodata)
        out = fn(a, b)
        out = np.where(bad, nodata, out)
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(out, out_fmt), out_fmt,
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")


def compare_overlay(layer_dss: list, cmp_ds, spec, op: str = "eq", out_fmt: str = "f32"):
    """PercentEqualTo / PercentGreaterThan / PercentLessThan
    (percent_equal_to.rs family): per cell, the percentage of stack
    layers whose value compares true against the comparison layer."""
    fns = {
        "eq": lambda s, c: s == c,
        "gt": lambda s, c: s > c,
        "lt": lambda s, c: s < c,
    }
    cmp_fn = fns[op]
    nodata = spec.nodata
    n_layers = len(layer_dss)

    tagged = cmp_ds.map_batches(_tag_layer(-1), batch_format="pyarrow")
    for i, ds in enumerate(layer_dss):
        tagged = tagged.union(ds.map_batches(_tag_layer(i), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__layer")
        grids = [codecs.decode_tile(bytes(b), f) for b, f in zip(g["bytes"], g["fmt"])]
        cmp_g = grids[0]  # __layer == -1 sorts first
        stack = np.stack(grids[1:])
        bad = (stack == nodata).any(axis=0) | (cmp_g == nodata)
        out = cmp_fn(stack, cmp_g[None]).sum(axis=0) / float(n_layers) * 100.0
        out[bad] = nodata
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(out, out_fmt), out_fmt,
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")


def pick_from_list(layer_dss: list, pos_ds, spec, out_fmt: str = "f32"):
    """PickFromList (pick_from_list.rs): the position raster selects,
    per cell, which stack layer's value to output (1-based)."""
    nodata = spec.nodata

    tagged = pos_ds.map_batches(_tag_layer(-1), batch_format="pyarrow")
    for i, ds in enumerate(layer_dss):
        tagged = tagged.union(ds.map_batches(_tag_layer(i), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__layer")
        grids = [codecs.decode_tile(bytes(b), f) for b, f in zip(g["bytes"], g["fmt"])]
        pos = grids[0]
        stack = np.stack(grids[1:])
        idx = np.clip(pos.astype(np.int64) - 1, 0, stack.shape[0] - 1)
        out = np.take_along_axis(stack, idx[None], 0)[0]
        bad = (pos == nodata) | (pos.astype(np.int64) - 1 < 0) | (pos.astype(np.int64) > stack.shape[0])
        out = np.where(bad, nodata, out)
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(out, out_fmt), out_fmt,
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")


def weighted_overlay(layer_dss: list, spec, weights: list[float],
                     cost: list[bool] | None = None, scale_max: float = 1.0,
                     out_fmt: str = "f32"):
    """WeightedOverlay (weighted_overlay.rs): each factor min/max
    normalized onto [0, scale_max] (cost layers inverted), then the
    weighted sum with weights normalized to Σ=1."""
    from .stretch import _pixel_minmax

    w = np.asarray(weights, dtype=np.float64)
    w = w / w.sum()
    costs = cost or [False] * len(layer_dss)
    ranges = [_pixel_minmax(ds) for ds in layer_dss]
    nodata = spec.nodata

    tagged = layer_dss[0].map_batches(_tag_layer(0), batch_format="pyarrow")
    for i, ds in enumerate(layer_dss[1:], 1):
        tagged = tagged.union(ds.map_batches(_tag_layer(i), batch_format="pyarrow"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__layer")
        out = None
        bad = None
        for (_, row), wi, ci, (lo, hi) in zip(g.iterrows(), w, costs, ranges):
            grid = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
            span = (hi - lo) or 1.0
            norm = (grid - lo) / span
            if ci:
                norm = 1.0 - norm
            term = wi * norm * scale_max
            b = grid == nodata
            out = term if out is None else out + term
            bad = b if bad is None else (bad | b)
        out[bad] = nodata
        return codecs.tile_row_table(
            g["tile_row"].iloc[0], g["tile_col"].iloc[0],
            codecs.encode_tile(out, out_fmt), out_fmt,
        )

    return tagged.groupby(["tile_row", "tile_col"]).map_groups(combine, batch_format="pandas")
