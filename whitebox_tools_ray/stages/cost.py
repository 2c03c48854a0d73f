"""Cost distance / allocation / pathway — weighted Dijkstra over the grid.

Reference: gis_analysis/cost_distance.rs (724 LoC) — accumulated cost
from source cells across a cost surface: moving between adjacent cells
costs ``(cost(a) + cost(b))/2 × distance`` (diagonal √2·res); plus
cost_allocation.rs (nearest-source id) and cost_pathway.rs (backlink
trace).

The accumulated-cost field is the fixed point of

    A(c) = min(A_source(c), min_n A(n) + (cost(n)+cost(c))/2 · d(n,c))

— same structure as depression filling, so the TILED form reuses the
from-above iteration of stages/fill.py: per-tile Dijkstra with border
seed costs (round 0: internal borders blocked at +inf), rounds exchange
border accumulated costs which only DECREASE, converging to the global
field. Backlink directions fall out of the final relaxation.
"""

from __future__ import annotations

import heapq

import numpy as np

from .focal import DX8, DY8


def cost_distance(
    cost: np.ndarray,
    sources: np.ndarray,
    nodata: float,
    res: float,
    seed_costs: np.ndarray | None = None,
    mark_unreached_inf: bool = False,
):
    """Single-grid accumulated cost + backlink + allocation.

    ``sources``: int array, 0 = not a source, else source id.
    Returns (accum, backlink, alloc): backlink = direction index 0..7 of
    the cell one step BACK toward the source (-1 at sources/unreached),
    alloc = id of the cheapest source."""
    rows, cols = cost.shape
    diag = float(np.sqrt(2.0)) * res
    step = [diag, res, diag, res, diag, res, diag, res]
    INF = np.inf
    accum = np.full((rows, cols), INF)
    backlink = np.full((rows, cols), -1, dtype=np.int8)
    alloc = np.zeros((rows, cols), dtype=np.int64)
    heap: list[tuple[float, int, int, int, int]] = []  # (cost, r, c, src, blink)
    rr, cc = np.nonzero(sources > 0)
    for r, c in zip(rr, cc):
        heapq.heappush(heap, (0.0, int(r), int(c), int(sources[r, c]), -1))
    if seed_costs is not None:
        sr, sc = np.nonzero(np.isfinite(seed_costs))
        for r, c in zip(sr, sc):
            heapq.heappush(heap, (float(seed_costs[r, c]), int(r), int(c), 0, -1))
    nod = cost == nodata
    done = nod.copy()
    while heap:
        a, r, c, src, blink = heapq.heappop(heap)
        if done[r, c]:
            continue
        done[r, c] = True
        accum[r, c] = a
        backlink[r, c] = blink
        alloc[r, c] = src
        for i in range(8):
            nr, nc = r + int(DY8[i]), c + int(DX8[i])
            if not (0 <= nr < rows and 0 <= nc < cols) or done[nr, nc]:
                continue
            na = a + (cost[r, c] + cost[nr, nc]) / 2.0 * step[i]
            # backlink points from the NEIGHBOR back to (r, c):
            heapq.heappush(heap, (na, nr, nc, src, (i + 4) % 8))
    if not mark_unreached_inf:
        accum[~np.isfinite(accum)] = nodata
    accum[nod] = nodata
    return accum, backlink, alloc


def cost_pathway(backlink: np.ndarray, start: tuple[int, int]) -> list[tuple[int, int]]:
    """Trace the least-cost path from ``start`` back to its source
    (cost_pathway.rs semantics)."""
    path = [start]
    r, c = start
    while backlink[r, c] >= 0:
        d = int(backlink[r, c])
        r, c = r + int(DY8[d]), c + int(DX8[d])
        path.append((r, c))
        if len(path) > backlink.size:
            raise RuntimeError("backlink cycle")
    return path


def cost_distance_tiled(
    cost_tiles: dict[int, np.ndarray],
    source_tiles: dict[int, np.ndarray],
    spec,
    max_rounds: int = 64,
):
    """Tiled accumulated cost via the from-above border iteration.

    Returns tid → accum grid, equal to the global single-grid result."""
    nodata = spec.nodata
    res = spec.res
    seed_costs = {tid: np.full(g.shape, np.inf) for tid, g in cost_tiles.items()}
    est: dict[int, np.ndarray] = {}
    for _round in range(max_rounds):
        est = {}
        for tid, cg in cost_tiles.items():
            # +inf entries in seed_costs mean "no seed here" (isfinite gate
            # inside cost_distance)
            a, _bl, _al = cost_distance(
                cg,
                source_tiles[tid],
                nodata,
                res,
                seed_costs=seed_costs[tid],
                mark_unreached_inf=True,
            )
            est[tid] = a
        changed = False
        h = spec.tile_px
        for tid, cg in cost_tiles.items():
            tr, tc = tid // spec.tiles_x, tid % spec.tiles_x
            diag = float(np.sqrt(2.0)) * res
            # candidate entry cost for each border cell from each external
            # neighbor cell: A_nb + (cost_nb + cost_here)/2 * d
            new_sc = seed_costs[tid]
            # per-cell loop over border cells (perimeter only)
            for r, c in _border_cells(h, h):
                best = np.inf
                for i in range(8):
                    nr, nc = r + int(DY8[i]), c + int(DX8[i])
                    if 0 <= nr < h and 0 <= nc < h:
                        continue  # internal neighbor
                    gr = tr * h + nr
                    gc = tc * h + nc
                    n_tr, n_tc = gr // h, gc // h
                    if not (0 <= n_tr < spec.tiles_y and 0 <= n_tc < spec.tiles_x):
                        continue
                    nb_tid = n_tr * spec.tiles_x + n_tc
                    lr, lc = gr % h, gc % h
                    a_nb = est[nb_tid][lr, lc]
                    if not np.isfinite(a_nb):
                        continue
                    step = diag if (DY8[i] != 0 and DX8[i] != 0) else res
                    cand = a_nb + (cost_tiles[nb_tid][lr, lc] + cg[r, c]) / 2.0 * step
                    best = min(best, cand)
                if best < new_sc[r, c] - 1e-9:
                    new_sc[r, c] = best
                    changed = True
        if not changed:
            break
    out = {}
    for tid, a in est.items():
        a = a.copy()
        a[~np.isfinite(a)] = nodata
        a[cost_tiles[tid] == nodata] = nodata
        out[tid] = a
    return out


def _border_cells(h: int, w: int):
    for c in range(w):
        yield 0, c
        yield h - 1, c
    for r in range(1, h - 1):
        yield r, 0
        yield r, w - 1
