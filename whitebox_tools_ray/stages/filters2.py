"""Extended focal-filter family — image_analysis filters part 2.

All kernels run on the existing halo-exchange engine
(``focal.focal_op``): one shuffle ships each tile plus ``halo``-wide
margins to its owner, the kernel is pure numpy over the padded array.
Multi-pass tools (almost-Gaussian, morphology, thinning) chain focal
passes; the scene-level loop only moves per-pass change COUNTS through
the driver, never pixels.

Kernels (reference semantics, cited per function):
- convolution      — UserDefinedWeightsFilter (user_defined_weights_filter.rs)
- gaussian         — GaussianFilter (gaussian_filter.rs): truncated
  2-D Gaussian, weights renormalized over valid cells.
- diff_of_gaussian — DiffOfGaussianFilter (diff_of_gaussians_filter.rs)
- laplacian_of_gaussian — LaplacianOfGaussianFilter (log kernel)
- fast_almost_gaussian — FastAlmostGaussianFilter
  (fast_almost_gaussian_filter.rs:196-209): n=5 box passes, box widths
  wl/wu from P. Kovesi's formula.
- high_pass / high_pass_median — HighPassFilter, HighPassMedianFilter:
  z − window mean / median.
- adaptive         — AdaptiveFilter (adaptive_filter.rs:415-426):
  output mean when (z − mean)/s > threshold else z.
- bilateral        — BilateralFilter: spatial × intensity Gaussian.
- conservative_smoothing — ConservativeSmoothingFilter: clamp z to
  [min, max] of neighbours (centre excluded).
- edge_preserving_mean — EdgePreservingMeanFilter: mean of window
  values with |v − z| ≤ threshold.
- k_nearest_mean   — KNearestMeanFilter: mean of the k window values
  nearest z in VALUE.
- lee_sigma        — LeeSigmaFilter (lee_filter.rs:340-375): mean of
  window values in z±σ when count > m, else 8-neighbour mean.
- emboss           — EmbossFilter: directional 3×3 stencil.
- roberts_cross / scharr — RobertsCrossFilter, ScharrFilter: gradient
  magnitudes.
- line_detection   — LineDetectionFilter: max response of the four
  3×3 line stencils (or a chosen direction).
- unsharp_masking  — UnsharpMasking: z + amount·(z − gaussian) where
  |diff| ≥ threshold.
- opening / closing / tophat — Opening, Closing, TophatTransform:
  min∘max morphology compositions.
- corner_detection — CornerDetection: hit-and-miss corner patterns on
  a boolean image.
- line_thinning / remove_spurs / thicken_line — LineThinning
  (line_thin.rs:226-275), RemoveSpurs, ThickenRasterLine: iterated
  directional hit-and-miss passes; each sub-pattern is applied
  image-wide per pass (parallel thinning) where the reference mutates
  in scan order — identical skeletons on the tested shapes, and the
  only order-free formulation that distributes.
"""

from __future__ import annotations

import numpy as np

from .focal import focal_op, _shifted, _window_stat


def _win(pad, spec, radius):
    """(tpx, tpx, k, k) sliding windows centred on each core cell."""
    from numpy.lib.stride_tricks import sliding_window_view

    tpx = spec.tile_px
    halo = (pad.shape[0] - tpx) // 2
    lo = halo - radius
    k = 2 * radius + 1
    sub = pad[lo : lo + tpx + 2 * radius, lo : lo + tpx + 2 * radius]
    return sliding_window_view(sub, (k, k))


def make_convolution_kernel(weights: np.ndarray, normalize: bool = False):
    """General odd-sized convolution; nodata cells contribute 0 weight.
    With ``normalize``, weights renormalize over valid cells (smoothing
    kernels); without, invalid contributions are simply dropped
    (derivative kernels)."""
    weights = np.asarray(weights, dtype=np.float64)
    radius = weights.shape[0] // 2

    def kernel(pad, nodata, spec):
        win = _win(pad, spec, radius)
        valid = win != nodata
        halo = (pad.shape[0] - spec.tile_px) // 2
        z = _shifted(pad, halo, spec.tile_px, 0, 0)
        w = weights[None, None, :, :] * valid
        s = (np.where(valid, win, 0.0) * weights[None, None, :, :]).sum(axis=(-2, -1))
        if normalize:
            tot = w.sum(axis=(-2, -1))
            out = np.where(tot != 0, s / np.where(tot != 0, tot, 1.0), nodata)
        else:
            out = s
        return np.where(z != nodata, out, nodata)

    return kernel


def gaussian_weights(sigma: float) -> np.ndarray:
    radius = max(1, int(np.ceil(3.0 * sigma)))
    ax = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2.0 * sigma * sigma))
    return g / g.sum()


def log_weights(sigma: float) -> np.ndarray:
    """Laplacian-of-Gaussian kernel, zero-sum normalized."""
    radius = max(1, int(np.ceil(3.0 * sigma)))
    ax = np.arange(-radius, radius + 1, dtype=np.float64)
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    s2 = sigma * sigma
    g = -1.0 / (np.pi * s2 * s2) * (1.0 - r2 / (2.0 * s2)) * np.exp(-r2 / (2.0 * s2))
    return g - g.mean()


def gaussian_filter(tiles_ds, spec, sigma: float = 0.75, out_fmt: str = "f32"):
    w = gaussian_weights(sigma)
    return focal_op(tiles_ds, spec, make_convolution_kernel(w, normalize=True), w.shape[0] // 2,
                    out_fmt=out_fmt)


def diff_of_gaussian_filter(tiles_ds, spec, sigma1: float = 2.0, sigma2: float = 4.0):
    w1, w2 = gaussian_weights(sigma1), gaussian_weights(sigma2)
    r = max(w1.shape[0], w2.shape[0]) // 2
    k = 2 * r + 1
    pad1 = np.zeros((k, k))
    o1 = r - w1.shape[0] // 2
    pad1[o1 : o1 + w1.shape[0], o1 : o1 + w1.shape[0]] = w1
    pad2 = np.zeros((k, k))
    o2 = r - w2.shape[0] // 2
    pad2[o2 : o2 + w2.shape[0], o2 : o2 + w2.shape[0]] = w2
    return focal_op(tiles_ds, spec, make_convolution_kernel(pad1 - pad2), r)


def laplacian_of_gaussian_filter(tiles_ds, spec, sigma: float = 0.75):
    w = log_weights(sigma)
    return focal_op(tiles_ds, spec, make_convolution_kernel(w), w.shape[0] // 2)


def fast_almost_gaussian_filter(tiles_ds, spec, sigma: float = 1.8):
    """n=5 iterated box means with Kovesi's wl/wu split
    (fast_almost_gaussian_filter.rs:196-209)."""
    sigma = max(sigma, 1.8)
    n = 5
    w_ideal = np.sqrt(12.0 * sigma * sigma / n + 1.0)
    wl = int(np.floor(w_ideal))
    if wl % 2 == 0:
        wl -= 1
    wu = wl + 2
    m = int(
        round(
            (12.0 * sigma * sigma - n * wl * wl - 4.0 * n * wl - 3.0 * n)
            / (-4.0 * wl - 4.0)
        )
    )
    ds = tiles_ds
    from .focal import make_window_kernel

    for i in range(n):
        w = wl if i < m else wu
        ds = focal_op(ds, spec, make_window_kernel("mean", w // 2), w // 2)
    return ds


def high_pass_filter(tiles_ds, spec, radius: int = 1):
    def kernel(pad, nodata, spec_):
        mean = _window_stat(pad, nodata, spec_, "mean", radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        return np.where((z != nodata) & (mean != nodata), z - mean, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def high_pass_median_filter(tiles_ds, spec, radius: int = 1):
    def kernel(pad, nodata, spec_):
        med = _window_stat(pad, nodata, spec_, "median", radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        return np.where((z != nodata) & (med != nodata), z - med, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def adaptive_filter(tiles_ds, spec, radius: int = 1, threshold: float = 2.0):
    """adaptive_filter.rs:415-426: mean replaces z when (z−mean)/s > t."""

    def kernel(pad, nodata, spec_):
        mean = _window_stat(pad, nodata, spec_, "mean", radius)
        sd = _window_stat(pad, nodata, spec_, "stdev", radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        with np.errstate(all="ignore"):
            hit = (sd > 0) & ((z - mean) / np.where(sd > 0, sd, 1.0) > threshold)
        out = np.where(hit, mean, z)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def bilateral_filter(tiles_ds, spec, sigma_dist: float = 0.75, sigma_int: float = 1.0):
    radius = max(1, int(np.ceil(3.0 * sigma_dist)))
    ax = np.arange(-radius, radius + 1, dtype=np.float64)
    spatial = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2.0 * sigma_dist**2))

    def kernel(pad, nodata, spec_):
        win = _win(pad, spec_, radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        valid = win != nodata
        with np.errstate(all="ignore"):
            wi = np.exp(-((win - z[..., None, None]) ** 2) / (2.0 * sigma_int**2))
            w = spatial[None, None, :, :] * wi * valid
            tot = w.sum(axis=(-2, -1))
            s = (np.where(valid, win, 0.0) * w).sum(axis=(-2, -1))
            out = np.where(tot > 0, s / np.where(tot > 0, tot, 1.0), nodata)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def conservative_smoothing_filter(tiles_ds, spec, radius: int = 1):
    def kernel(pad, nodata, spec_):
        win = _win(pad, spec_, radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        k = 2 * radius + 1
        centre = k * k // 2
        flat = win.reshape(*win.shape[:2], -1)
        mask = np.ones(k * k, dtype=bool)
        mask[centre] = False
        nb = flat[..., mask]
        vnb = nb != nodata
        mn = np.where(vnb, nb, np.inf).min(axis=-1)
        mx = np.where(vnb, nb, -np.inf).max(axis=-1)
        out = np.clip(z, np.where(np.isfinite(mn), mn, z), np.where(np.isfinite(mx), mx, z))
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def edge_preserving_mean_filter(tiles_ds, spec, radius: int = 1, threshold: float = 1.0):
    def kernel(pad, nodata, spec_):
        win = _win(pad, spec_, radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        near = (win != nodata) & (np.abs(win - z[..., None, None]) <= threshold)
        c = near.sum(axis=(-2, -1))
        s = np.where(near, win, 0.0).sum(axis=(-2, -1))
        out = np.where(c > 0, s / np.maximum(c, 1), z)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def k_nearest_mean_filter(tiles_ds, spec, radius: int = 1, k: int = 5):
    def kernel(pad, nodata, spec_):
        win = _win(pad, spec_, radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        flat = win.reshape(*win.shape[:2], -1)
        dist = np.where(flat != nodata, np.abs(flat - z[..., None]), np.inf)
        idx = np.argsort(dist, axis=-1)[..., :k]
        vals = np.take_along_axis(flat, idx, axis=-1)
        ok = np.take_along_axis(dist, idx, axis=-1) != np.inf
        c = ok.sum(axis=-1)
        s = np.where(ok, vals, 0.0).sum(axis=-1)
        out = np.where(c > 0, s / np.maximum(c, 1), nodata)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


def lee_sigma_filter(tiles_ds, spec, radius: int = 3, sigma: float = 10.0, m: float = 5.0):
    """lee_filter.rs:340-375: window mean over z±σ when count > m, else
    8-neighbour mean."""

    def kernel(pad, nodata, spec_):
        win = _win(pad, spec_, radius)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        inb = (win != nodata) & (np.abs(win - z[..., None, None]) <= sigma)
        c = inb.sum(axis=(-2, -1)).astype(np.float64)
        s = np.where(inb, win, 0.0).sum(axis=(-2, -1))
        sel = np.where(c > 0, s / np.maximum(c, 1), z)
        # fallback: mean of the 8 immediate neighbours
        n8 = np.zeros_like(z)
        s8 = np.zeros_like(z)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                nb = _shifted(pad, halo, spec_.tile_px, dy, dx)
                ok = nb != nodata
                n8 += ok
                s8 += np.where(ok, nb, 0.0)
        fb = np.where(n8 > 0, s8 / np.maximum(n8, 1), z)
        out = np.where(c > m, sel, fb)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, radius)


EMBOSS = {
    "n": np.array([[0, -1, 0], [0, 0, 0], [0, 1, 0]], float),
    "s": np.array([[0, 1, 0], [0, 0, 0], [0, -1, 0]], float),
    "e": np.array([[0, 0, 0], [1, 0, -1], [0, 0, 0]], float),
    "w": np.array([[0, 0, 0], [-1, 0, 1], [0, 0, 0]], float),
    "ne": np.array([[0, 0, -1], [0, 0, 0], [1, 0, 0]], float),
    "sw": np.array([[0, 0, 1], [0, 0, 0], [-1, 0, 0]], float),
    "nw": np.array([[-1, 0, 0], [0, 0, 0], [0, 0, 1]], float),
    "se": np.array([[1, 0, 0], [0, 0, 0], [0, 0, -1]], float),
}


def emboss_filter(tiles_ds, spec, direction: str = "n"):
    return focal_op(tiles_ds, spec, make_convolution_kernel(EMBOSS[direction]), 1)


def roberts_cross_filter(tiles_ds, spec):
    w1 = np.array([[0, 0, 0], [0, 1, 0], [0, 0, -1]], float)
    w2 = np.array([[0, 0, 0], [0, 0, 1], [0, -1, 0]], float)

    def kernel(pad, nodata, spec_):
        g1 = make_convolution_kernel(w1)(pad, nodata, spec_)
        g2 = make_convolution_kernel(w2)(pad, nodata, spec_)
        return np.where(
            (g1 != nodata) & (g2 != nodata), np.hypot(g1, g2), nodata
        )

    return focal_op(tiles_ds, spec, kernel, 1)


def scharr_filter(tiles_ds, spec):
    wx = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]], float)
    wy = np.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]], float)

    def kernel(pad, nodata, spec_):
        gx = make_convolution_kernel(wx)(pad, nodata, spec_)
        gy = make_convolution_kernel(wy)(pad, nodata, spec_)
        return np.where((gx != nodata) & (gy != nodata), np.hypot(gx, gy), nodata)

    return focal_op(tiles_ds, spec, kernel, 1)


LINE_KERNELS = {
    "h": np.array([[-1, -1, -1], [2, 2, 2], [-1, -1, -1]], float),
    "v": np.array([[-1, 2, -1], [-1, 2, -1], [-1, 2, -1]], float),
    "45": np.array([[-1, -1, 2], [-1, 2, -1], [2, -1, -1]], float),
    "135": np.array([[2, -1, -1], [-1, 2, -1], [-1, -1, 2]], float),
}


def line_detection_filter(tiles_ds, spec, direction: str | None = None, absolute: bool = True):
    kernels = [LINE_KERNELS[direction]] if direction else list(LINE_KERNELS.values())

    def kernel(pad, nodata, spec_):
        rs = [make_convolution_kernel(w)(pad, nodata, spec_) for w in kernels]
        stack = np.stack([np.where(r != nodata, np.abs(r) if absolute else r, -np.inf) for r in rs])
        out = stack.max(axis=0)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        return np.where((z != nodata) & np.isfinite(out), out, nodata)

    return focal_op(tiles_ds, spec, kernel, 1)


def unsharp_masking(tiles_ds, spec, sigma: float = 0.75, amount: float = 100.0, threshold: float = 0.0):
    """UnsharpMasking: z + (amount/100)·Δ where Δ = z − gaussian(z),
    applied when |Δ| ≥ threshold."""
    w = gaussian_weights(sigma)
    conv = make_convolution_kernel(w, normalize=True)

    def kernel(pad, nodata, spec_):
        blur = conv(pad, nodata, spec_)
        halo = (pad.shape[0] - spec_.tile_px) // 2
        z = _shifted(pad, halo, spec_.tile_px, 0, 0)
        delta = z - blur
        out = np.where(np.abs(delta) >= threshold, z + amount / 100.0 * delta, z)
        return np.where((z != nodata) & (blur != nodata), out, nodata)

    return focal_op(tiles_ds, spec, kernel, w.shape[0] // 2)


def opening(tiles_ds, spec, radius: int = 1):
    """Opening: erosion (min) then dilation (max)."""
    from .focal import make_window_kernel

    eroded = focal_op(tiles_ds, spec, make_window_kernel("min", radius), radius)
    return focal_op(eroded, spec, make_window_kernel("max", radius), radius)


def closing(tiles_ds, spec, radius: int = 1):
    from .focal import make_window_kernel

    dilated = focal_op(tiles_ds, spec, make_window_kernel("max", radius), radius)
    return focal_op(dilated, spec, make_window_kernel("min", radius), radius)


def tophat_transform(tiles_ds, spec, radius: int = 1, variant: str = "white"):
    """TophatTransform: white = z − opening, black = closing − z."""
    from . import band_math

    if variant == "white":
        op = opening(tiles_ds, spec, radius)
        return band_math.overlay_fn(tiles_ds, op, spec, lambda a, b: a - b)
    cl = closing(tiles_ds, spec, radius)
    return band_math.overlay_fn(cl, tiles_ds, spec, lambda a, b: a - b)


# ------------------------------------------------- binary hit-and-miss


# line_thin.rs:226-247 — neighbour ring order: dx/dy start at NE, go CW
_THIN_DX = [1, 1, 1, 0, -1, -1, -1, 0]
_THIN_DY = [-1, 0, 1, 1, 1, 0, -1, -1]
_THIN_EL1 = [[6, 7, 0, 4, 3, 2], [0, 1, 2, 4, 5, 6], [2, 3, 4, 6, 7, 0], [4, 5, 6, 0, 1, 2]]
_THIN_EL2 = [[7, 0, 1, 3, 5], [1, 2, 3, 5, 7], [3, 4, 5, 7, 1], [5, 6, 7, 1, 3]]
_THIN_V1 = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]
_THIN_V2 = [0.0, 0.0, 0.0, 1.0, 1.0]


def _hit_and_miss_pass(patterns):
    """One Jacobi sub-pass: foreground cells matching ANY pattern become
    background. Patterns: list of (elements idx list, expected vals).
    Output channel 1 = new grid; the kernel also returns the per-tile
    change count in out[0,0] of a companion stats grid — instead we
    count changes downstream by diffing datasets, so the kernel output
    is just the new grid."""

    def kernel(pad, nodata, spec_):
        tpx = spec_.tile_px
        halo = (pad.shape[0] - tpx) // 2
        z = _shifted(pad, halo, tpx, 0, 0)
        fg = (z > 0) & (z != nodata)
        nb = [
            _shifted(pad, halo, tpx, _THIN_DY[i], _THIN_DX[i]) for i in range(8)
        ]
        nbb = [np.where((n > 0) & (n != nodata), 1.0, 0.0) for n in nb]
        remove = np.zeros_like(fg)
        for elements, vals in patterns:
            match = fg.copy()
            for e, v in zip(elements, vals):
                match &= nbb[e] == v
            remove |= match
        out = np.where(remove, 0.0, np.where(fg, 1.0, 0.0))
        return np.where(z != nodata, out, nodata)

    return kernel


def line_thinning(tiles_ds, spec, max_loops: int = 50):
    """LineThinning (line_thin.rs): iterate the 8 directional patterns
    until a full loop changes nothing. Per loop: 8 focal sub-passes
    (one per pattern — parallel thinning), then one count aggregate."""
    from ..kernels import codecs
    import pyarrow as pa

    ds = tiles_ds

    def count_fg(batch: pa.Table) -> pa.Table:
        tot = 0
        for bb, ff in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            g = codecs.decode_tile(bb, ff)
            tot += int(((g > 0) & (g != spec.nodata)).sum())
        return pa.table({"n": [tot]})

    prev = None
    for _loop in range(max_loops):
        for i in range(4):
            ds = focal_op(ds, spec, _hit_and_miss_pass([(_THIN_EL1[i], _THIN_V1)]), 1)
            ds = focal_op(ds, spec, _hit_and_miss_pass([(_THIN_EL2[i], _THIN_V2)]), 1)
        ds = ds.materialize()
        cnt = int(ds.map_batches(count_fg, batch_format="pyarrow").to_pandas()["n"].sum())
        if prev is not None and cnt == prev:
            break
        prev = cnt
    return ds


# remove_spurs.rs endpoint patterns: a foreground cell with <= 1
# foreground neighbour is a spur tip
def remove_spurs(tiles_ds, spec, iterations: int = 10):
    def kernel(pad, nodata, spec_):
        tpx = spec_.tile_px
        halo = (pad.shape[0] - tpx) // 2
        z = _shifted(pad, halo, tpx, 0, 0)
        fg = (z > 0) & (z != nodata)
        n = np.zeros(z.shape)
        for i in range(8):
            nb = _shifted(pad, halo, tpx, _THIN_DY[i], _THIN_DX[i])
            n += ((nb > 0) & (nb != nodata)).astype(np.float64)
        out = np.where(fg & (n <= 1), 0.0, np.where(fg, 1.0, 0.0))
        return np.where(z != nodata, out, nodata)

    ds = tiles_ds
    for _ in range(iterations):
        ds = focal_op(ds, spec, kernel, 1)
    return ds


def thicken_raster_line(tiles_ds, spec):
    """ThickenRasterLine (thicken_line.rs): background cells bridging a
    diagonal-only foreground pair become foreground."""

    def kernel(pad, nodata, spec_):
        tpx = spec_.tile_px
        halo = (pad.shape[0] - tpx) // 2
        z = _shifted(pad, halo, tpx, 0, 0)

        def fgs(dy, dx):
            nb = _shifted(pad, halo, tpx, dy, dx)
            return (nb > 0) & (nb != nodata)

        fg = (z > 0) & (z != nodata)
        up, down = fgs(-1, 0), fgs(1, 0)
        left, right = fgs(0, -1), fgs(0, 1)
        ul, ur = fgs(-1, -1), fgs(-1, 1)
        ll, lr = fgs(1, -1), fgs(1, 1)
        # a background cell adjacent to a diagonal foreground pair that
        # has no orthogonal connection becomes foreground
        diag_break = (ul & ~up & ~left) | (ur & ~up & ~right) | (ll & ~down & ~left) | (lr & ~down & ~right)
        out = np.where(fg | diag_break, 1.0, 0.0)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, 1)


# corner_detection.rs: hit-and-miss corner patterns (Fisher et al.) on a
# boolean image — foreground cell whose 8-neighbourhood matches one of
# the four L-corner configurations
_CORNER_PATTERNS = []
for rot in range(4):
    # base pattern: fg at centre, fg arm up+right, bg elsewhere (rotated)
    arm = [(0 + 2 * rot) % 8, (2 + 2 * rot) % 8]  # two adjacent arms (ring idx)
    bgs = [i for i in range(8) if i not in arm]
    _CORNER_PATTERNS.append((arm + bgs, [1.0] * 2 + [0.0] * 6))


def corner_detection(tiles_ds, spec):
    def kernel(pad, nodata, spec_):
        tpx = spec_.tile_px
        halo = (pad.shape[0] - tpx) // 2
        z = _shifted(pad, halo, tpx, 0, 0)
        fg = (z > 0) & (z != nodata)
        nbb = [
            np.where(
                (_shifted(pad, halo, tpx, _THIN_DY[i], _THIN_DX[i]) > 0)
                & (_shifted(pad, halo, tpx, _THIN_DY[i], _THIN_DX[i]) != nodata),
                1.0,
                0.0,
            )
            for i in range(8)
        ]
        hit = np.zeros_like(fg)
        for elements, vals in _CORNER_PATTERNS:
            match = fg.copy()
            for e, v in zip(elements, vals):
                match &= nbb[e] == v
            hit |= match
        out = np.where(hit, 1.0, 0.0)
        return np.where(z != nodata, out, nodata)

    return focal_op(tiles_ds, spec, kernel, 1)


def user_defined_weights_filter(tiles_ds, spec, weights: np.ndarray, normalize: bool = False):
    w = np.asarray(weights, dtype=np.float64)
    return focal_op(tiles_ds, spec, make_convolution_kernel(w, normalize), w.shape[0] // 2)
