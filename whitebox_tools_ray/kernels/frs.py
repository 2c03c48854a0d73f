"""Fixed-radius search — the reference's join/kNN accelerator, NumPy form.

Reference: /root/reference/src/structures/fixed_radius_search.rs —
hash grid binned at ``radius/2``; a radius query probes the 5×5 cell
neighborhood (:46-130); approximate kNN expands the window until enough
neighbors are found (:134-218).

This implementation bins points into a dict of cell → index array once
(built in an actor's ``__init__``), then answers
vectorized radius / kNN queries. No scipy in the container — this IS the
engine's neighbor index for IDW / nearest-neighbor gridding / outlier
tools.
"""

from __future__ import annotations

import numpy as np

__all__ = ["FixedRadiusSearch2D"]


class FixedRadiusSearch2D:
    def __init__(self, xs: np.ndarray, ys: np.ndarray, radius: float):
        self.xs = np.asarray(xs, dtype=np.float64)
        self.ys = np.asarray(ys, dtype=np.float64)
        self.radius = float(radius)
        self.cell = self.radius / 2.0 if self.radius > 0 else 1.0
        cx = np.floor(self.xs / self.cell).astype(np.int64)
        cy = np.floor(self.ys / self.cell).astype(np.int64)
        order = np.lexsort((cy, cx))
        key = cx[order] * (1 << 32) + cy[order]
        # contiguous runs per cell
        self._order = order
        uniq, starts = np.unique(key, return_index=True)
        self._cells = dict(zip(uniq.tolist(), zip(starts.tolist(), np.append(starts[1:], len(key)).tolist())))

    def _candidates(self, x: float, y: float, window: int = 2) -> np.ndarray:
        cx = int(np.floor(x / self.cell))
        cy = int(np.floor(y / self.cell))
        idx: list[np.ndarray] = []
        for dx in range(-window, window + 1):
            for dy in range(-window, window + 1):
                rng = self._cells.get((cx + dx) * (1 << 32) + (cy + dy))
                if rng:
                    idx.append(self._order[rng[0] : rng[1]])
        if not idx:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(idx)

    def search(self, x: float, y: float) -> tuple[np.ndarray, np.ndarray]:
        """Exact radius search: (indices, distances) within ``radius``
        (5×5-cell probe like the reference)."""
        cand = self._candidates(x, y, 2)
        if len(cand) == 0:
            return cand, np.empty(0)
        d = np.hypot(self.xs[cand] - x, self.ys[cand] - y)
        m = d <= self.radius
        return cand[m], d[m]

    def knn(self, x: float, y: float, k: int, max_window: int = 32) -> tuple[np.ndarray, np.ndarray]:
        """Approximate kNN with an expanding window (:134-218): widen the
        probe until ≥k candidates, then take the k nearest."""
        window = 2
        while True:
            cand = self._candidates(x, y, window)
            if len(cand) >= k or window >= max_window:
                break
            window *= 2
        if len(cand) == 0:
            return cand, np.empty(0)
        d = np.hypot(self.xs[cand] - x, self.ys[cand] - y)
        kk = min(k, len(cand))
        sel = np.argpartition(d, kk - 1)[:kk]
        o = np.argsort(d[sel], kind="stable")
        return cand[sel][o], d[sel][o]
