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
            m = _normalize(_to_matrix(batch[emb_col].to_pylist()))
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
            m = _normalize(_to_matrix(batch[emb_col].to_pylist()))
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
