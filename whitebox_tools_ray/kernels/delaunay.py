"""Delaunay triangulation (Bowyer-Watson), TIN interpolation and the
Voronoi dual — pure NumPy, no scipy.

Reference parity targets: src/algorithms/delaunay_triangulation.rs:446
(``triangulate``), gis_analysis/tin_gridding.rs /
construct_vector_tin.rs (Delaunay + per-triangle linear interpolation of
cell centers), gis_analysis/voronoi_diagram.rs (the dual). The engine
runs one triangulation per PARTITION (tile group with neighbor-cell
point duplication) inside actors — the SURVEY §2.4 plan — so this kernel
only ever sees a partition's points.
"""

from __future__ import annotations

import numpy as np

__all__ = ["delaunay", "tin_interpolate", "voronoi_cells"]


def _circumcircle(p: np.ndarray, tri: np.ndarray):
    """Circumcenter + squared radius for each triangle (T,3) of points
    (N,2) — vectorized."""
    a = p[tri[:, 0]]
    b = p[tri[:, 1]]
    c = p[tri[:, 2]]
    d = 2.0 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1]) + c[:, 0] * (a[:, 1] - b[:, 1]))
    d = np.where(np.abs(d) < 1e-300, 1e-300, d)
    a2 = (a * a).sum(1)
    b2 = (b * b).sum(1)
    c2 = (c * c).sum(1)
    ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1]) + c2 * (a[:, 1] - b[:, 1])) / d
    uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0]) + c2 * (b[:, 0] - a[:, 0])) / d
    ctr = np.column_stack([ux, uy])
    r2 = ((a - ctr) ** 2).sum(1)
    return ctr, r2


def delaunay(points: np.ndarray) -> np.ndarray:
    """Bowyer-Watson Delaunay triangulation.

    points: (N,2) float64. Returns (T,3) int vertex indices (CCW).
    O(N·T) with vectorized circumcircle tests per insertion — fine for
    per-partition point counts (≤ ~50k)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # super-triangle around everything
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    span = max(float((hi - lo).max()), 1.0)
    mid = (lo + hi) / 2.0
    # far-away super vertices approximate points at infinity so no hull
    # triangle loses to a super-vertex triangle (sliver loss otherwise);
    # 1e4×span keeps circumcircle arithmetic well inside float64 range
    big = 1e4 * span
    sup = np.array(
        [
            [mid[0] - 2 * big, mid[1] - big],
            [mid[0] + 2 * big, mid[1] - big],
            [mid[0], mid[1] + 2 * big],
        ]
    )
    allp = np.vstack([pts, sup])
    tris = np.array([[n, n + 1, n + 2]], dtype=np.int64)
    ctrs, r2s = _circumcircle(allp, tris)

    # deterministic insertion order (sorted by x then y) improves locality
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    for pi in order:
        p = allp[pi]
        bad = ((ctrs - p) ** 2).sum(1) < r2s * (1.0 - 1e-12)
        if not bad.any():
            # numerical edge: attach to the nearest triangle's cavity
            bad = np.zeros(len(tris), dtype=bool)
            bad[np.argmin(((ctrs - p) ** 2).sum(1) - r2s)] = True
        bad_tris = tris[bad]
        # boundary polygon = edges appearing exactly once among bad tris
        edges = np.vstack(
            [bad_tris[:, [0, 1]], bad_tris[:, [1, 2]], bad_tris[:, [2, 0]]]
        )
        key = np.sort(edges, axis=1)
        _, inv, cnt = np.unique(key, axis=0, return_inverse=True, return_counts=True)
        boundary = edges[cnt[inv] == 1]
        new_tris = np.column_stack(
            [boundary[:, 0], boundary[:, 1], np.full(len(boundary), pi, dtype=np.int64)]
        )
        tris = np.vstack([tris[~bad], new_tris])
        new_ctrs, new_r2s = _circumcircle(allp, new_tris)
        ctrs = np.vstack([ctrs[~bad], new_ctrs])
        r2s = np.concatenate([r2s[~bad], new_r2s])

    keep = (tris < n).all(axis=1)
    tris = tris[keep]
    # normalize to CCW
    a, b, c = allp[tris[:, 0]], allp[tris[:, 1]], allp[tris[:, 2]]
    cw = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]) < 0
    tris[cw] = tris[cw][:, ::-1]
    return tris


def tin_interpolate(points: np.ndarray, values: np.ndarray, tris: np.ndarray,
                    qx: np.ndarray, qy: np.ndarray, nodata: float) -> np.ndarray:
    """Linear (barycentric) interpolation of query points inside the TIN
    (tin_gridding.rs interpolation); queries outside every triangle get
    nodata. Vectorized per triangle over its bbox candidates."""
    out = np.full(qx.shape, nodata, dtype=np.float64)
    if len(tris) == 0:
        return out
    done = np.zeros(qx.shape, dtype=bool)
    q = np.column_stack([qx.ravel(), qy.ravel()])
    outf = out.ravel()
    donef = done.ravel()
    for t in tris:
        a, b, c = points[t[0]], points[t[1]], points[t[2]]
        xmin, ymin = min(a[0], b[0], c[0]), min(a[1], b[1], c[1])
        xmax, ymax = max(a[0], b[0], c[0]), max(a[1], b[1], c[1])
        cand = np.nonzero(
            ~donef
            & (q[:, 0] >= xmin) & (q[:, 0] <= xmax)
            & (q[:, 1] >= ymin) & (q[:, 1] <= ymax)
        )[0]
        if len(cand) == 0:
            continue
        det = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(det) < 1e-300:
            continue
        l1 = ((b[1] - c[1]) * (q[cand, 0] - c[0]) + (c[0] - b[0]) * (q[cand, 1] - c[1])) / det
        l2 = ((c[1] - a[1]) * (q[cand, 0] - c[0]) + (a[0] - c[0]) * (q[cand, 1] - c[1])) / det
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -1e-12) & (l2 >= -1e-12) & (l3 >= -1e-12)
        sel = cand[inside]
        outf[sel] = (
            l1[inside] * values[t[0]] + l2[inside] * values[t[1]] + l3[inside] * values[t[2]]
        )
        donef[sel] = True
    return outf.reshape(qx.shape)


def voronoi_cells(points: np.ndarray, bbox: tuple[float, float, float, float]):
    """Voronoi polygons as the Delaunay dual (voronoi_diagram.rs):
    each point's cell = its triangles' circumcenters ordered by angle;
    unbounded cells are clipped by intersecting half-planes against the
    ``bbox`` rectangle (exact half-plane clipping, Sutherland-Hodgman)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    x0, y0, x1, y1 = bbox
    rect = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)
    cells = []
    for i in range(n):
        poly = rect
        for j in range(n):
            if i == j:
                continue
            # half-plane: points closer to i than to j
            mid = (pts[i] + pts[j]) / 2.0
            nrm = pts[j] - pts[i]  # outward normal
            poly = _clip_halfplane(poly, mid, nrm)
            if len(poly) == 0:
                break
        cells.append(poly)
    return cells


def _clip_halfplane(poly: np.ndarray, origin: np.ndarray, normal: np.ndarray) -> np.ndarray:
    """Keep the side with (p − origin)·normal ≤ 0."""
    if len(poly) == 0:
        return poly
    d = (poly - origin) @ normal
    out = []
    m = len(poly)
    for k in range(m):
        a, b = poly[k], poly[(k + 1) % m]
        da, db = d[k], d[(k + 1) % m]
        if da <= 0:
            out.append(a)
        if (da <= 0) != (db <= 0):
            t = da / (da - db)
            out.append(a + t * (b - a))
    return np.asarray(out) if out else np.empty((0, 2))
