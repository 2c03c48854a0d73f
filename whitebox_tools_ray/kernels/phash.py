"""64-bit perceptual hash of a pixel grid (DCT method, pure NumPy).

Standard pHash recipe: resize to 32×32 (block mean), 2-D DCT-II, take the
top-left 8×8 coefficient block excluding the DC term's dominance by
thresholding against the median, pack row-major into an int64.
Deterministic — the fixture generator and any verifier produce identical
values for identical pixels.
"""

from __future__ import annotations

import numpy as np

__all__ = ["phash64", "hamming64"]

_DCT_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    mat = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    mat[0] *= np.sqrt(1.0 / n)
    mat[1:] *= np.sqrt(2.0 / n)
    return mat


_DCT_M = _dct_matrix(_DCT_N)


def _block_mean_resize(grid: np.ndarray, n: int) -> np.ndarray:
    """Resize (h, w) to (n, n) by averaging over index-partitioned blocks."""
    h, w = grid.shape
    if h % n == 0 and w % n == 0:  # exact blocks → one reshape-mean
        return grid.reshape(n, h // n, n, w // n).mean(axis=(1, 3))
    ri = (np.arange(h) * n) // h
    ci = (np.arange(w) * n) // w
    out = np.zeros((n, n), dtype=np.float64)
    cnt = np.zeros((n, n), dtype=np.float64)
    np.add.at(out, (ri[:, None].repeat(w, 1), ci[None, :].repeat(h, 0)), grid)
    np.add.at(cnt, (ri[:, None].repeat(w, 1), ci[None, :].repeat(h, 0)), 1.0)
    return out / np.maximum(cnt, 1.0)


def phash64(grid: np.ndarray) -> int:
    """64-bit perceptual hash of a float/int 2-D pixel grid."""
    g = _block_mean_resize(np.asarray(grid, dtype=np.float64), _DCT_N)
    d = _DCT_M @ g @ _DCT_M.T
    block = d[:8, :8].copy()
    med = np.median(block.ravel()[1:])  # exclude DC
    bits = (block > med).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    # wrap to signed int64 for Arrow
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
