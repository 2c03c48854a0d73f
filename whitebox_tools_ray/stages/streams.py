"""Stream-network analysis over the D8 flow DAG.

Reference family (SURVEY.md §2.9, stream_network_analysis/): all tools
consume a streams raster (cells above an accumulation threshold) + a D8
pointer raster, extract the LINK GRAPH (junction-to-junction segments),
then traverse it. The reference walks whole-raster arrays; the engine:

1. ``extract_streams`` — threshold the accumulation tiles (**M**,
   extract_streams.rs: ``accum >= threshold``);
2. ``stream_links`` — build the link table: per stream cell follow the
   pointer; junctions = stream cells with ≥2 inflowing stream neighbors
   or outlets. Link identification (stream_link_id.rs) assigns each
   junction-free run one id. The link TABLE is tiny relative to the
   raster (≈ drainage density × cells), so per-link graph traversal
   (orders, lengths, slopes) runs driver-side exactly like the
   reference's link phase — the raster-scale work stays distributed.
3. ``strahler_order`` / ``shreve_magnitude`` — classic orders on the
   link DAG (strahler_order.rs / shreve_magnitude.rs semantics).

Operates on the dict-of-tiles form produced by ``flow_accumulation``
(tid → grid) plus pointer tiles — the same contract the flow stage uses.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..kernels import codecs
from .focal import DX8, DY8


def extract_streams(accum_tiles: dict[int, np.ndarray], threshold: float, nodata: float):
    """Stream mask per tile: 1.0 where accumulation ≥ threshold
    (extract_streams.rs), nodata preserved."""
    out = {}
    for tid, g in accum_tiles.items():
        s = np.where(g == nodata, nodata, (g >= threshold).astype(np.float64))
        out[tid] = s
    return out


def _mosaic(tiles: dict[int, np.ndarray], spec) -> np.ndarray:
    tpx = spec.tile_px
    full = np.full((spec.rows, spec.columns), spec.nodata)
    for tid, g in tiles.items():
        r0 = (tid // spec.tiles_x) * tpx
        c0 = (tid % spec.tiles_x) * tpx
        full[r0 : r0 + tpx, c0 : c0 + tpx] = g
    return full


def stream_links(stream_tiles: dict[int, np.ndarray], pointer_tiles: dict[int, bytes], spec):
    """Link identification (stream_link_id.rs semantics).

    Returns (link_id_grid, links) where links is a list of dicts
    {link_id, cells, ds_link (downstream link id or -1), length}.
    The link phase runs on the assembled stream mask — the stream set is
    O(channel cells), far smaller than the raster; the distributed part
    already happened (accumulation + threshold).
    """
    stream = _mosaic(stream_tiles, spec)
    tpx = spec.tile_px
    ptr = np.full((spec.rows, spec.columns), -2, dtype=np.int8)
    for tid, blob in pointer_tiles.items():
        g = codecs.decode_tile(blob, "i8").astype(np.int8)
        r0 = (tid // spec.tiles_x) * tpx
        c0 = (tid % spec.tiles_x) * tpx
        ptr[r0 : r0 + tpx, c0 : c0 + tpx] = g

    rows, cols = stream.shape
    is_stream = stream == 1.0
    # inflowing stream-neighbor count per stream cell
    inflow = np.zeros((rows, cols), dtype=np.int8)
    INFLOW_OF = np.array([4, 5, 6, 7, 0, 1, 2, 3], dtype=np.int8)
    ptr_pad = np.full((rows + 2, cols + 2), -2, dtype=np.int8)
    ptr_pad[1:-1, 1:-1] = ptr
    stream_pad = np.zeros((rows + 2, cols + 2), dtype=bool)
    stream_pad[1:-1, 1:-1] = is_stream
    for i in range(8):
        neigh_ptr = ptr_pad[1 + DY8[i] : 1 + DY8[i] + rows, 1 + DX8[i] : 1 + DX8[i] + cols]
        neigh_stream = stream_pad[1 + DY8[i] : 1 + DY8[i] + rows, 1 + DX8[i] : 1 + DX8[i] + cols]
        inflow += ((neigh_ptr == INFLOW_OF[i]) & neigh_stream).astype(np.int8)
    # heads: stream cells with 0 stream inflows; junctions: ≥2
    link_id = np.zeros((rows, cols), dtype=np.int64)
    links: list[dict] = []
    next_id = 1
    diag = float(np.sqrt(2.0) * spec.res)
    lengths = [diag, spec.res, diag, spec.res, diag, spec.res, diag, spec.res]

    starts = [(r, c) for r, c in zip(*np.nonzero(is_stream & ((inflow == 0) | (inflow >= 2))))]
    for sr, sc in starts:
        # each start begins one link downstream (junction cells start a NEW link)
        lid = next_id
        next_id += 1
        cells_in_link = []
        length = 0.0
        r, c = sr, sc
        while True:
            if link_id[r, c] != 0:
                break
            link_id[r, c] = lid
            cells_in_link.append((r, c))
            d = int(ptr[r, c])
            if d < 0:
                break
            rn, cn = r + int(DY8[d]), c + int(DX8[d])
            if not (0 <= rn < rows and 0 <= cn < cols) or not is_stream[rn, cn]:
                break
            length += lengths[d]
            if inflow[rn, cn] >= 2:  # next cell is a junction → link ends
                break
            r, c = rn, cn
        if cells_in_link:
            links.append({"link_id": lid, "cells": cells_in_link, "length": length})
    # downstream link pointers
    by_cell = {cell: lk["link_id"] for lk in links for cell in lk["cells"]}
    for lk in links:
        r, c = lk["cells"][-1]
        d = int(ptr[r, c])
        lk["ds_link"] = -1
        if d >= 0:
            rn, cn = r + int(DY8[d]), c + int(DX8[d])
            if 0 <= rn < rows and 0 <= cn < cols and is_stream[rn, cn]:
                ds = by_cell.get((rn, cn), -1)
                lk["ds_link"] = ds if ds != lk["link_id"] else -1
    return link_id, links


def strahler_order(links: list[dict]) -> dict[int, int]:
    """Strahler stream order on the link DAG (strahler_order.rs):
    leaves = 1; a link's order = max upstream order, +1 when ≥2 upstream
    links share that max."""
    ups: dict[int, list[int]] = defaultdict(list)
    for lk in links:
        if lk["ds_link"] != -1:
            ups[lk["ds_link"]].append(lk["link_id"])
    order: dict[int, int] = {}

    def compute(lid: int) -> int:
        if lid in order:
            return order[lid]
        u = ups.get(lid, [])
        if not u:
            order[lid] = 1
        else:
            ords = sorted((compute(x) for x in u), reverse=True)
            order[lid] = ords[0] + 1 if len(ords) > 1 and ords[0] == ords[1] else ords[0]
        return order[lid]

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, len(links) + 100))
    for lk in links:
        compute(lk["link_id"])
    sys.setrecursionlimit(old)
    return order


def shreve_magnitude(links: list[dict]) -> dict[int, int]:
    """Shreve magnitude (shreve_magnitude.rs): leaves = 1; links sum
    their upstream magnitudes."""
    ups: dict[int, list[int]] = defaultdict(list)
    for lk in links:
        if lk["ds_link"] != -1:
            ups[lk["ds_link"]].append(lk["link_id"])
    mag: dict[int, int] = {}

    def compute(lid: int) -> int:
        if lid in mag:
            return mag[lid]
        u = ups.get(lid, [])
        mag[lid] = 1 if not u else sum(compute(x) for x in u)
        return mag[lid]

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, len(links) + 100))
    for lk in links:
        compute(lk["link_id"])
    sys.setrecursionlimit(old)
    return mag
