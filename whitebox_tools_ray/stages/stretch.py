"""Global contrast/stretch family — two-phase GA→M over tile pixels.

Reference pattern (SURVEY.md §2.6): compute a GLOBAL histogram /
statistic over every pixel, broadcast the derived LUT, remap each cell.

- ``histogram_equalization`` — image_analysis/histogram_equalization.rs:
  252-296: build a num_tones-bin histogram (reference default 1024 via
  ``--num_tones``), CDF → output value = cdf(bin)/n * (num_tones-1)
  rescaled to the output range.
- ``gaussian_stretch`` — histogram shaped to a normal distribution.
- ``percentage_stretch`` — clip percent tails then linear stretch
  (percentage_contrast_stretch.rs).

All phases stream tiles; only the histogram (num_tones ints) crosses to
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import codecs


def _tile_histograms(tiles_ds, bins: int, lo: float, hi: float):
    edges = np.linspace(lo, hi, bins + 1)

    def partial(batch: pa.Table) -> pa.Table:
        counts = np.zeros(bins, dtype=np.int64)
        for i in range(batch.num_rows):
            g = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            nod = batch["nodata"][i].as_py() if "nodata" in batch.schema.names else None
            v = g[g != nod] if nod is not None else g.ravel()
            c, _ = np.histogram(v, bins=edges)
            counts += c
        return pa.table({"bin": np.arange(bins, dtype=np.int64), "n": counts})

    from ray.data.aggregate import Sum

    out = (
        tiles_ds.map_batches(partial, batch_format="pyarrow", batch_size=16)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    counts = np.zeros(bins, dtype=np.int64)
    counts[out["bin"].to_numpy()] = out["n"].to_numpy()
    return edges, counts


def _pixel_minmax(tiles_ds):
    def partial(batch: pa.Table) -> pa.Table:
        lo, hi = np.inf, -np.inf
        for i in range(batch.num_rows):
            g = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            nod = batch["nodata"][i].as_py() if "nodata" in batch.schema.names else None
            v = g[g != nod] if nod is not None else g
            if v.size:
                lo = min(lo, float(v.min()))
                hi = max(hi, float(v.max()))
        return pa.table({"lo": [lo], "hi": [hi]})

    from ray.data.aggregate import Max, Min

    agg = tiles_ds.map_batches(partial, batch_format="pyarrow", batch_size=16).aggregate(
        Min("lo", alias_name="lo"), Max("hi", alias_name="hi")
    )
    return float(agg["lo"]), float(agg["hi"])


def _remap_tiles(tiles_ds, fn, out_fmt: str = "f32"):
    def remap(batch: pa.Table) -> pa.Table:
        blobs = []
        for i in range(batch.num_rows):
            g = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            nod = batch["nodata"][i].as_py() if "nodata" in batch.schema.names else None
            out = fn(g)
            if nod is not None:
                out = np.where(g != nod, out, nod)
            blobs.append(codecs.encode_tile(out, out_fmt))
        t = batch.set_column(batch.schema.get_field_index("bytes"), "bytes", pa.array(blobs, pa.binary()))
        return t.set_column(t.schema.get_field_index("fmt"), "fmt", pa.array([out_fmt] * t.num_rows))

    return tiles_ds.map_batches(remap, batch_format="pyarrow", batch_size=16)


def histogram_equalization(tiles_ds, num_tones: int = 1024, out_min: float = 0.0, out_max: float = 1023.0,
                           out_fmt: str = "f32"):
    """HistogramEqualization (histogram_equalization.rs:252-296): global
    num_tones histogram → CDF LUT → remap. Requires two passes over the
    tile stream (min/max, histogram) then the remap pass."""
    lo, hi = _pixel_minmax(tiles_ds)
    edges, counts = _tile_histograms(tiles_ds, num_tones, lo, hi)
    cdf = np.cumsum(counts).astype(np.float64)
    n = cdf[-1] if cdf[-1] else 1.0
    lut = cdf / n * (out_max - out_min) + out_min
    span = (hi - lo) or 1.0

    def fn(g: np.ndarray) -> np.ndarray:
        b = np.clip(((g - lo) / span * (num_tones - 1)).astype(np.int64), 0, num_tones - 1)
        return lut[b]

    return _remap_tiles(tiles_ds, fn, out_fmt=out_fmt)


def percentage_stretch(tiles_ds, clip_percent: float = 1.0, num_tones: int = 1024, out_min=0.0, out_max=255.0):
    """PercentageContrastStretch: clip `clip_percent` tails by the global
    histogram, then linear stretch."""
    lo, hi = _pixel_minmax(tiles_ds)
    edges, counts = _tile_histograms(tiles_ds, num_tones, lo, hi)
    cdf = np.cumsum(counts) / max(counts.sum(), 1)
    lo_idx = int(np.searchsorted(cdf, clip_percent / 100.0))
    hi_idx = int(np.searchsorted(cdf, 1.0 - clip_percent / 100.0))
    new_lo = edges[min(lo_idx, num_tones - 1)]
    new_hi = edges[min(hi_idx + 1, num_tones)]
    span = (new_hi - new_lo) or 1.0

    def fn(g: np.ndarray) -> np.ndarray:
        return np.clip((g - new_lo) / span, 0.0, 1.0) * (out_max - out_min) + out_min

    return _remap_tiles(tiles_ds, fn)


def gaussian_stretch(tiles_ds, num_tones: int = 1024, out_min=0.0, out_max=255.0):
    """GaussianContrastStretch: histogram-match the pixel distribution to
    a standard normal (via CDF → inverse-normal LUT)."""
    lo, hi = _pixel_minmax(tiles_ds)
    edges, counts = _tile_histograms(tiles_ds, num_tones, lo, hi)
    cdf = np.clip(np.cumsum(counts) / max(counts.sum(), 1), 1e-6, 1 - 1e-6)
    # inverse normal CDF (Acklam rational approximation, public domain)
    z = _norm_ppf(cdf)
    z = (z - z.min()) / (z.max() - z.min() or 1.0)
    lut = z * (out_max - out_min) + out_min
    span = (hi - lo) or 1.0

    def fn(g: np.ndarray) -> np.ndarray:
        b = np.clip(((g - lo) / span * (num_tones - 1)).astype(np.int64), 0, num_tones - 1)
        return lut[b]

    return _remap_tiles(tiles_ds, fn)


def _norm_ppf(p: np.ndarray) -> np.ndarray:
    """Acklam's inverse-normal-CDF approximation (no scipy in env)."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    p = np.asarray(p, dtype=np.float64)
    out = np.empty_like(p)
    plow, phigh = 0.02425, 1 - 0.02425
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    return out


def sigmoidal_stretch(tiles_ds, cutoff: float = 0.0, gain: float = 1.0,
                      num_tones: int = 1024, out_fmt: str = "f32"):
    """SigmoidalContrastStretch (sigmoidal_contrast_stretch.rs:25-36):
    z normalized to [0,1] over the global min/max, then
    ``z_out = ((1/(1+exp(gain*(cutoff−z))) − a)/b) * (num_tones−1)``
    with a = 1/(1+exp(gain*cutoff)),
    b = 1/(1+exp(gain*(cutoff−1))) − a. GA (min/max) → M remap."""
    lo, hi = _pixel_minmax(tiles_ds)
    span = (hi - lo) or 1.0
    a = 1.0 / (1.0 + np.exp(gain * cutoff))
    b = 1.0 / (1.0 + np.exp(gain * (cutoff - 1.0))) - a

    def fn(g: np.ndarray) -> np.ndarray:
        zn = (g - lo) / span
        return (1.0 / (1.0 + np.exp(gain * (cutoff - zn))) - a) / b * (num_tones - 1)

    return _remap_tiles(tiles_ds, fn, out_fmt)


def histogram_matching(tiles_ds, ref_cdf_x: np.ndarray, ref_cdf_p: np.ndarray,
                       num_tones: int = 1024, out_fmt: str = "f32"):
    """HistogramMatching (histogram_matching.rs:274-340): source CDF per
    bin; each pixel's cumulative probability maps through the INVERSE
    reference CDF (linear interpolation — the reference's x1/x2/p1/p2
    walk is exactly np.interp on the monotone CDF)."""
    lo, hi = _pixel_minmax(tiles_ds)
    edges, counts = _tile_histograms(tiles_ds, num_tones, lo, hi + 1e-9)
    cdf = np.cumsum(counts).astype(np.float64)
    cdf /= max(cdf[-1], 1.0)
    ref_cdf_x = np.asarray(ref_cdf_x, dtype=np.float64)
    ref_cdf_p = np.asarray(ref_cdf_p, dtype=np.float64)

    def fn(g: np.ndarray) -> np.ndarray:
        bins = np.clip(((g - lo) / (hi + 1e-9 - lo) * num_tones).astype(np.int64), 0, num_tones - 1)
        return np.interp(cdf[bins], ref_cdf_p, ref_cdf_x)

    return _remap_tiles(tiles_ds, fn, out_fmt)


def histogram_matching_two_images(tiles_ds, ref_tiles_ds, num_tones: int = 1024,
                                  out_fmt: str = "f32"):
    """HistogramMatchingTwoImages (histogram_matching_two_images.rs): the
    reference CDF comes from a second tile Dataset (GA on both inputs,
    then the same inverse-CDF remap)."""
    rlo, rhi = _pixel_minmax(ref_tiles_ds)
    redges, rcounts = _tile_histograms(ref_tiles_ds, num_tones, rlo, rhi + 1e-9)
    rcdf = np.cumsum(rcounts).astype(np.float64)
    rcdf /= max(rcdf[-1], 1.0)
    # reference CDF sampled at bin centers
    centers = (redges[:-1] + redges[1:]) / 2.0
    return histogram_matching(tiles_ds, centers, rcdf, num_tones, out_fmt)


def balance_contrast_enhancement(tiles_ds, e_mean: float = 100.0,
                                 out_min: float = 0.0, out_max: float = 255.0,
                                 out_fmt: str = "f32"):
    """BalanceContrastEnhancement (balance_contrast_enhancement.rs, Liu
    1991 BCET): parabolic stretch y = a(x−b)² + c mapping the band's
    (min, mean, max) to (L, E, H) while keeping histogram shape.

        b = (h²(E−L) − s(H−L) + l²(H−E)) / (2·(h(E−L) − e(H−L) + l(H−E)))
        a = (H−L) / ((h−l)(h+l−2b)),   c = L − a(l−b)²

    with l/h/e = band min/max/mean and s = band mean square. GA → M."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n = 0
        tot = 0.0
        tot2 = 0.0
        lo, hi = np.inf, -np.inf
        for i in range(batch.num_rows):
            g = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            nod = batch["nodata"][i].as_py() if "nodata" in batch.schema.names else None
            v = g[g != nod].ravel() if nod is not None else g.ravel()
            if v.size:
                n += v.size
                tot += float(v.sum())
                tot2 += float((v * v).sum())
                lo = min(lo, float(v.min()))
                hi = max(hi, float(v.max()))
        return pa.table({"k": [0], "n": [n], "tot": [tot], "tot2": [tot2], "lo": [lo], "hi": [hi]})

    from ray.data.aggregate import Max, Min

    agg = (
        tiles_ds.map_batches(partial, batch_format="pyarrow", batch_size=16)
        .groupby("k")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("tot", alias_name="tot"),
            Sum("tot2", alias_name="tot2"),
            Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"),
        )
        .to_pandas()
        .iloc[0]
    )
    l, h = float(agg["lo"]), float(agg["hi"])
    n = max(int(agg["n"]), 1)
    e = float(agg["tot"]) / n
    s = float(agg["tot2"]) / n
    L, H, E = out_min, out_max, e_mean
    denom = 2.0 * (h * (E - L) - e * (H - L) + l * (H - E))
    b = (h * h * (E - L) - s * (H - L) + l * l * (H - E)) / (denom or 1e-30)
    a = (H - L) / (((h - l) * (h + l - 2.0 * b)) or 1e-30)
    c = L - a * (l - b) ** 2

    def fn(g: np.ndarray) -> np.ndarray:
        return a * (g - b) ** 2 + c

    return _remap_tiles(tiles_ds, fn, out_fmt)


def rescale_value_range(tiles_ds, new_min: float, new_max: float,
                        clip_min: float | None = None, clip_max: float | None = None,
                        out_fmt: str = "f32"):
    """RescaleValueRange (rescale_value_range.rs): linear remap of the
    pixel range [min, max] (or user clip bounds) onto [new_min, new_max]."""
    lo, hi = _pixel_minmax(tiles_ds)
    if clip_min is not None:
        lo = clip_min
    if clip_max is not None:
        hi = clip_max
    span = (hi - lo) or 1.0

    def fn(g: np.ndarray) -> np.ndarray:
        return np.clip((g - lo) / span, 0.0, 1.0) * (new_max - new_min) + new_min

    return _remap_tiles(tiles_ds, fn, out_fmt)


def gamma_correction(tiles_ds, gamma: float = 0.5, out_fmt: str = "f32"):
    """GammaCorrection (gamma_correction.rs): v' = range·(v_norm)^gamma
    with v_norm the min/max-normalized pixel value."""
    lo, hi = _pixel_minmax(tiles_ds)
    span = (hi - lo) or 1.0

    def fn(g: np.ndarray) -> np.ndarray:
        return np.power(np.clip((g - lo) / span, 0.0, 1.0), gamma) * span + lo

    return _remap_tiles(tiles_ds, fn, out_fmt)


def stdev_contrast_stretch(tiles_ds, num_sd: float = 2.0,
                           out_min: float = 0.0, out_max: float = 255.0,
                           out_fmt: str = "f32"):
    """StandardDeviationContrastStretch
    (stdev_contrast_stretch.rs): linear stretch of [μ−kσ, μ+kσ]."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        n, tot, tot2 = 0, 0.0, 0.0
        for i in range(batch.num_rows):
            g = codecs.decode_tile(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            nod = batch["nodata"][i].as_py() if "nodata" in batch.schema.names else None
            v = g[g != nod].ravel() if nod is not None else g.ravel()
            n += v.size
            tot += float(v.sum())
            tot2 += float((v * v).sum())
        return pa.table({"n": [n], "tot": [tot], "tot2": [tot2]})

    agg = tiles_ds.map_batches(partial, batch_format="pyarrow", batch_size=16).aggregate(
        Sum("n", alias_name="n"), Sum("tot", alias_name="tot"), Sum("tot2", alias_name="tot2")
    )
    n = max(int(agg["n"]), 1)
    mu = float(agg["tot"]) / n
    sd = float(np.sqrt(max(float(agg["tot2"]) / n - mu * mu, 0.0)))
    lo, hi = mu - num_sd * sd, mu + num_sd * sd
    span = (hi - lo) or 1.0

    def fn(g: np.ndarray) -> np.ndarray:
        return np.clip((g - lo) / span, 0.0, 1.0) * (out_max - out_min) + out_min

    return _remap_tiles(tiles_ds, fn, out_fmt)
