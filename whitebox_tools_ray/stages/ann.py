"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk`` — the exact baseline: the query matrix is
  broadcast (``ray.put``); every batch does one float64 matmul; partial
  per-batch top-k heaps merge in one tiny final reduce. Scales linearly
  in corpus size with zero shuffle.
- ``lsh_bucket_topk``  — the scale path: random-hyperplane LSH codes
  assign each vector to a bucket; queries probe only matching (and
  neighboring, multi-probe) buckets → per-bucket exact rerank. Recall
  traded via num_planes/num_probes.
- ``ivf_topk``         — IVF variant: k-means coarse centroids (trained
  via stages.kmeans), nprobe nearest lists per query, exact rerank
  inside lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix.

    Arrow path: flatten the list values array (zero-copy for
    non-null fixed-dim embeddings) and reshape — ~30x the python
    per-row np.stack for wide embedding columns."""
    import pyarrow as _pa

    if isinstance(col, (_pa.ChunkedArray, _pa.Array)):
        arr = col.combine_chunks() if isinstance(col, _pa.ChunkedArray) else col
        n = len(arr)
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(n, -1)
    return np.stack([np.asarray(e, dtype=np.float64) for e in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Exact cosine top-k for each query row.

    Returns a pandas DataFrame (query_idx, rank, id, cosine) — a small
    result (Q×k rows) assembled from per-batch partial top-ks.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    ref = ray.put(q)

    class Partial:
        def __init__(self):
            self.q = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_to_matrix(batch[emb_col]))
            sims = self.q @ m.T  # (Q, B)
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out_q = np.repeat(np.arange(self.q.shape[0]), kk)
            out_id = ids[idx].ravel()
            out_sim = np.take_along_axis(sims, idx, axis=1).ravel()
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int64()),
                    "id": pa.array(out_id),
                    "cosine": pa.array(out_sim),
                }
            )

    partials = ds.map_batches(Partial, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)).to_pandas()
    out = []
    for qi, g in partials.groupby("query_idx"):
        g = g.sort_values(["cosine", "id"], ascending=[False, False]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = np.round(res["cosine"], 6)
    return res[["query_idx", "rank", "id", "cosine"]]


def lsh_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane codes: bit i = sign(v · plane_i)."""
    bits = (m @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def make_planes(dim: int, num_planes: int = 12, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(num_planes, dim))


def lsh_bucket_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    num_planes: int = 4,
    num_tables: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    multiprobe: int = 1,
):
    """Multi-table LSH approximate top-k.

    Standard construction: L independent tables of b hyperplanes each; a
    corpus vector lands in L buckets; queries probe their bucket (plus
    ``multiprobe`` single-bit flips) in every table and rerank exactly.
    Recall for a neighbor at angle theta is 1-(1-(1-theta/pi)^b)^L —
    tune (b, L) per similarity regime. Candidates dedup per (query, id)
    before the final top-k."""
    import ray

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    tables = [make_planes(q.shape[1], num_planes, seed=42 + 17 * t) for t in range(num_tables)]
    probes: list[dict[int, list[int]]] = []
    for planes in tables:
        qcodes = lsh_codes(q, planes)
        probe: dict[int, list[int]] = {}
        for qi, code in enumerate(qcodes):
            cset = [int(code)] + [int(code) ^ (1 << b) for b in range(min(multiprobe, num_planes))]
            for c in cset:
                probe.setdefault(c, []).append(qi)
        probes.append(probe)
    refs = ray.put((q, tables, probes))

    class BucketScore:
        def __init__(self):
            self.q, self.tables, self.probes = ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_to_matrix(batch[emb_col]))
            cand: dict[int, set[int]] = {}
            for planes, probe in zip(self.tables, self.probes):
                codes = lsh_codes(m, planes)
                for c in np.unique(codes):
                    qis = probe.get(int(c))
                    if not qis:
                        continue
                    sel = np.nonzero(codes == c)[0]
                    for qi in qis:
                        cand.setdefault(qi, set()).update(sel.tolist())
            out_q, out_id, out_sim = [], [], []
            for qi, rows in cand.items():
                rows = np.fromiter(rows, dtype=np.int64, count=len(rows))
                sims = self.q[qi] @ m[rows].T
                out_q.extend([qi] * len(rows))
                out_id.extend(ids[rows])
                out_sim.extend(np.atleast_1d(sims))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int64()),
                    "id": pa.array(out_id),
                    "cosine": pa.array(np.asarray(out_sim, dtype=np.float64)),
                }
            )

    partials = ds.map_batches(BucketScore, batch_format="pyarrow", batch_size=4096, concurrency=(1, 8)).to_pandas()
    out = []
    for qi in range(q.shape[0]):
        g = partials[partials["query_idx"] == qi]
        g = g.sort_values(["cosine", "id"], ascending=[False, False]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = np.round(res["cosine"], 6)
    return res[["query_idx", "rank", "id", "cosine"]]


def _kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 12, seed: int = 7) -> np.ndarray:
    """Spherical k-means on a (normalized) training sample — the
    standard IVF coarse quantizer (trained on a bounded sample, the
    faiss convention). Returns L2-normalized centroids."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    c = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ c.T, axis=1)  # cosine on normalized rows
        for j in range(c.shape[0]):
            m = assign == j
            if m.any():
                c[j] = sample[m].mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 65536,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """IVF (inverted-file) approximate top-k — the 100-TB similarity-
    search path: a coarse quantizer of ``n_centroids`` spherical-kmeans
    cells; each corpus vector scores ONLY when its cell is among the
    query's ``nprobe`` nearest cells. With nprobe == n_centroids the
    result is exactly brute force (the pytest/gate parity anchor).

    Scale shape: the quantizer trains on a bounded driver-side sample
    (the faiss convention); the corpus pass is one map_batches holding
    the (tiny) centroid matrix via ray.put — no shuffle, no index
    materialization. For repeated query workloads, persist the cell id
    per vector (one extra column) and hash-partition by it so probes
    read only nprobe/n_centroids of the data.
    """
    import ray

    q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    sample_tbl = ds.limit(train_sample).select_columns([emb_col]).to_pandas()
    sample = _normalize(
        np.stack([np.asarray(e, dtype=np.float64) for e in sample_tbl[emb_col]])
    )
    cents = _kmeans_fit(sample, n_centroids)
    nprobe = min(nprobe, cents.shape[0])
    # per-query probed cells
    qcell = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    refs = ray.put((q, cents, qcell))

    class ProbeScore:
        def __init__(self):
            self.q, self.cents, self.qcell = ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            m = _normalize(_to_matrix(batch[emb_col]))
            cells = np.argmax(m @ self.cents.T, axis=1)  # vector -> cell
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                rows = np.nonzero(np.isin(cells, self.qcell[qi]))[0]
                if not len(rows):
                    continue
                sims = self.q[qi] @ m[rows].T
                kk = min(k, len(rows))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[rows[top]])
                out_sim.extend(np.atleast_1d(sims[top]))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int64()),
                    "id": pa.array(out_id),
                    "cosine": pa.array(np.asarray(out_sim, dtype=np.float64)),
                }
            )

    partials = ds.map_batches(
        ProbeScore, batch_format="pyarrow", batch_size=65536, concurrency=(1, 8)
    ).to_pandas()
    out = []
    for qi in range(q.shape[0]):
        g = partials[partials["query_idx"] == qi]
        g = g.sort_values(["cosine", "id"], ascending=[False, False]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    res["cosine"] = np.round(res["cosine"], 6)
    return res[["query_idx", "rank", "id", "cosine"]]
