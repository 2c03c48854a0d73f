"""RGB ↔ IHS color transforms — image_analysis/rgb_to_ihs.rs:798-818 and
ihs_to_rgb.rs:628 semantics, vectorized over table columns (r, g, b in
0-1 after the per-band min/max normalization the reference applies).

Exact arithmetic of ``rgb2hsi``:
    i = (r+g+b)/3; rn,gn,bn = channel / (r+g+b)
    h = acos( 0.5((rn-gn)+(rn-bn)) / sqrt((rn-gn)² + (rn-bn)(gn-bn)) )
        (0 when rn==gn==bn);  h = 2π − h when b > g
    s = 1 − 3·min(rn, gn, bn)
(acos argument clipped to [-1, 1] — fp-boundary guard, same clip in the
SQL oracle). ``hsi2rgb`` is the standard three-sector inverse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def rgb2ihs_arrays(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    tot = r + g + b
    with np.errstate(all="ignore"):
        i = tot / 3.0
        rn, gn, bn = r / tot, g / tot, b / tot
        num = 0.5 * ((rn - gn) + (rn - bn))
        den = np.sqrt((rn - gn) ** 2 + (rn - bn) * (gn - bn))
        arg = np.clip(np.where(den != 0, num / den, 1.0), -1.0, 1.0)
        h = np.where((rn != gn) | (rn != bn), np.arccos(arg), 0.0)
        h = np.where(b > g, 2.0 * np.pi - h, h)
        s = 1.0 - 3.0 * np.minimum(np.minimum(rn, gn), bn)
    return h, s, i


def ihs2rgb_arrays(h: np.ndarray, s: np.ndarray, i: np.ndarray):
    """Three-sector inverse (ihs_to_rgb.rs hsi2rgb, continuous form)."""
    third = np.pi / 3.0
    two_third = 2.0 * np.pi / 3.0
    x = i * (1.0 - s)

    def sector(hh):
        with np.errstate(all="ignore"):
            y = i * (1.0 + (s * np.cos(hh)) / np.cos(third - hh))
        z = 3.0 * i - (x + y)
        return y, z

    r = np.empty_like(h)
    g = np.empty_like(h)
    b = np.empty_like(h)
    m0 = h < two_third
    m1 = (h >= two_third) & (h < 2 * two_third)
    m2 = ~(m0 | m1)
    y0, z0 = sector(h)
    r[m0], g[m0], b[m0] = y0[m0], z0[m0], x[m0]
    y1, z1 = sector(h - two_third)
    r[m1], g[m1], b[m1] = x[m1], y1[m1], z1[m1]
    y2, z2 = sector(h - 2 * two_third)
    r[m2], g[m2], b[m2] = z2[m2], x[m2], y2[m2]
    return r, g, b


def rgb_to_ihs(ds, r_col="r", g_col="g", b_col="b", round_to: int = 6):
    def fn(batch: pa.Table) -> pa.Table:
        r = batch[r_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = batch[g_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h, s, i = rgb2ihs_arrays(r, g, b)
        # only hue is rounded: acos differs in the last ulp across libms,
        # while s/i are pure rational arithmetic (bit-identical everywhere)
        # — rounding THEM would create half-even-vs-half-away mismatches
        # at exact .5e-6 boundaries
        return (
            batch.append_column("hue", pa.array(np.round(h, round_to)))
            .append_column("saturation", pa.array(s))
            .append_column("intensity", pa.array(i))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def ihs_to_rgb(ds, h_col="hue", s_col="saturation", i_col="intensity", round_to: int = 6):
    def fn(batch: pa.Table) -> pa.Table:
        h = batch[h_col].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch[s_col].to_numpy(zero_copy_only=False).astype(np.float64)
        i = batch[i_col].to_numpy(zero_copy_only=False).astype(np.float64)
        r, g, b = ihs2rgb_arrays(h, s, i)
        return (
            batch.append_column("r", pa.array(np.round(r, round_to)))
            .append_column("g", pa.array(np.round(g, round_to)))
            .append_column("b", pa.array(np.round(b, round_to)))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def direct_decorrelation_stretch(ds, k: float = 0.5, r_col="r", g_col="g", b_col="b",
                                 round_to: int = 6):
    """DirectDecorrelationStretch (direct_decorrelation_stretch.rs:27-33):
    subtract the achromatic component — c' = c − k·min(r, g, b) per band."""

    def fn(batch: pa.Table) -> pa.Table:
        r = batch[r_col].to_numpy(zero_copy_only=False).astype(np.float64)
        g = batch[g_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = k * np.minimum(np.minimum(r, g), b)
        for name, v in (("dds_r", r - m), ("dds_g", g - m), ("dds_b", b - m)):
            batch = batch.append_column(name, pa.array(np.round(v, round_to), pa.float64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")
