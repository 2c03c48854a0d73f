"""Deduplication family over document/embedding tables.

Five dedup modes, each the standard large-scale shape (ray_guide
"Aggregation at scale" / MinHash-LSH pattern):

- ``exact_dedup``        — content hash → hash-partition → first per
  group (the reference's exact-location dedup shape,
  lidar_analysis/remove_duplicates.rs / eliminate_coincident_points.rs:
  quantized-key groupby + keep-first).
- ``minhash_lsh_pairs``  — shingle → minhash (k permutations) → band →
  ``groupby(band_id, band_hash)`` buckets → candidate pairs → verified
  Jaccard. All per-batch work vectorized; the only shuffle is the band
  groupby.
- ``simhash_dedup``      — 64-bit simhash per doc; near-dups = hamming
  distance ≤ t within blocked prefixes (4-block Hamming trick).
- ``ngram_jaccard_pairs``— exact n-gram Jaccard verification of a
  candidate pair list.
- ``embedding_near_dup`` — cosine ≥ threshold pairs via normalized
  matmul per block pair (broadcast one side when small).

Connected components for clustering candidate pairs: iterative min-label
propagation with groupby — ``components_minlabel`` — driver holds only
labels convergence state, never the pair set (unless provably small).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def _hash_tokens(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of string tokens (md5-derived, process-stable)."""
    return np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little") for t in tokens],
        dtype=np.uint64,
    )


def shingles(text: str, k: int = 5) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def minhash_signature(shingle_hashes: np.ndarray, perms_a: np.ndarray, perms_b: np.ndarray) -> np.ndarray:
    """num_perms minima of (a*h + b) mod M — the classic permutation family."""
    if len(shingle_hashes) == 0:
        return np.full(len(perms_a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = shingle_hashes.astype(np.object_)  # python ints to avoid overflow
    out = np.empty(len(perms_a), dtype=np.uint64)
    hs = shingle_hashes.astype(np.uint64)
    for i in range(len(perms_a)):
        vals = (int(perms_a[i]) * hs.astype(object) + int(perms_b[i])) % _MERSENNE
        out[i] = np.uint64(min(vals))
    return out


def make_perms(num_perms: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perms, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perms, dtype=np.int64)
    return a, b


def exact_dedup(ds, text_col: str, id_col: str, keep: str = "min"):
    """Hash-partition exact dedup: one surviving id per distinct content."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode()).hexdigest() for t in batch[text_col].to_pylist()]
        return batch.append_column("__h", pa.array(h, pa.string()))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        keep_id = g[id_col].min() if keep == "min" else g[id_col].iloc[0]
        return pd.DataFrame({id_col: [keep_id], "n_dups": [len(g)]})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .map_groups(first, batch_format="pandas")
    )


class _MinhashActor:
    """Per-actor: permutation constants built once; per-batch vectorized
    shingle→minhash→band rows."""

    def __init__(self, text_col: str, id_col: str, num_perms: int, bands: int, shingle_k: int, seed: int):
        self.text_col = text_col
        self.id_col = id_col
        self.num_perms = num_perms
        self.bands = bands
        self.rows_per_band = num_perms // bands
        self.k = shingle_k
        self.a, self.b = make_perms(num_perms, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id: list = []
        out_band: list[int] = []
        out_bh: list[int] = []
        for doc_id, text in zip(ids, texts):
            sh = _hash_tokens(shingles(text, self.k))
            sig = minhash_signature(sh, self.a, self.b)
            for band in range(self.bands):
                seg = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                bh = int.from_bytes(hashlib.md5(seg.tobytes()).digest()[:8], "little")
                out_id.append(doc_id)
                out_band.append(band)
                out_bh.append(bh - (1 << 63))  # signed int64
        return pa.table(
            {
                self.id_col: pa.array(out_id),
                "band_id": pa.array(out_band, pa.int64()),
                "band_hash": pa.array(out_bh, pa.int64()),
            }
        )


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
):
    """Candidate near-dup pairs via MinHash-LSH banding.

    Returns Dataset[id_a, id_b] (id_a < id_b), deduplicated across bands
    by a final groupby — the standard shingle→minhash→band→bucket shape.
    """
    rows = ds.map_batches(
        _MinhashActor,
        fn_constructor_args=(text_col, id_col, num_perms, bands, shingle_k, seed),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        a: list = []
        b: list = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"id_a": a, "id_b": b})

    pairs = rows.groupby(["band_id", "band_hash"]).map_groups(bucket_pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(shingles(text_a, k))
    sb = set(shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def verify_pairs_jaccard(pairs_ds, docs_table: pa.Table, text_col="text", id_col="doc_id", k=3, threshold=0.5):
    """Exact n-gram Jaccard verification of candidate pairs — docs
    broadcast (small side) via ray.put."""
    import ray

    lookup = dict(zip(docs_table.column(id_col).to_pylist(), docs_table.column(text_col).to_pylist()))
    ref = ray.put(lookup)

    class Verify:
        def __init__(self):
            self.docs = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sims = [
                ngram_jaccard(self.docs[a], self.docs[b], k)
                for a, b in zip(batch["id_a"], batch["id_b"])
            ]
            batch["jaccard"] = np.round(sims, 6)
            return batch[batch["jaccard"] >= threshold]

    return pairs_ds.map_batches(Verify, batch_format="pandas", concurrency=(1, 4))


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (weighted by term frequency)."""
    acc = np.zeros(64, dtype=np.int64)
    toks = text.split()
    if not toks:
        return 0
    vals, counts = np.unique(toks, return_counts=True)
    hs = _hash_tokens(list(vals))
    shifts = np.arange(64, dtype=np.uint64)
    for h, cnt in zip(hs, counts):
        bits = (np.uint64(h) >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, cnt, -cnt)
    v = int((acc > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_dedup(ds, text_col="text", id_col="doc_id", hamming_t: int = 3):
    """Near-dup pairs with simhash hamming distance ≤ t.

    Blocked-prefix trick: with t ≤ 3, split the 64-bit hash into 4
    16-bit blocks — any pair within distance t agrees on ≥1 block →
    groupby (block_idx, block_value) buckets, verify hamming inside."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch[text_col].to_pylist()]
        ids = batch[id_col]
        out = {id_col: [], "block_idx": [], "block_val": [], "sh": []}
        for i, h in enumerate(hs):
            uh = h & 0xFFFFFFFFFFFFFFFF
            for bi in range(4):
                out[id_col].append(ids[i].as_py())
                out["block_idx"].append(bi)
                out["block_val"].append((uh >> (16 * bi)) & 0xFFFF)
                out["sh"].append(h)
        return pa.table(
            {
                id_col: pa.array(out[id_col]),
                "block_idx": pa.array(out["block_idx"], pa.int64()),
                "block_val": pa.array(out["block_val"], pa.int64()),
                "sh": pa.array(out["sh"], pa.int64()),
            }
        )

    rows = ds.map_batches(add_hash, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(g[id_col], g["sh"])))
        a, b, d = [], [], []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                ham = bin((recs[i][1] ^ recs[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if ham <= hamming_t:
                    a.append(recs[i][0])
                    b.append(recs[j][0])
                    d.append(ham)
        return pd.DataFrame({"id_a": a, "id_b": b, "hamming": d})

    pairs = rows.groupby(["block_idx", "block_val"]).map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def embedding_near_dup(ds, threshold: float = 0.95, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Cosine-similarity near-dup pairs.

    Baseline: the (small) embedding table is broadcast normalized; each
    batch matmuls against it and emits pairs above threshold with
    id_a < id_b. The scale path replaces the broadcast side with
    LSH-bucketed candidates (see ann.lsh_buckets)."""
    import ray

    all_rows = ds.to_pandas()  # broadcast side — documented small-side cap
    ids = all_rows[id_col].to_numpy()
    mat = np.stack([np.asarray(e, dtype=np.float64) for e in all_rows[emb_col]])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bids = batch[id_col].to_numpy()
            bm = np.stack([np.asarray(e, dtype=np.float64) for e in batch[emb_col]])
            bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
            sims = bm @ self.mat.T
            ii, jj = np.nonzero(sims >= threshold)
            keep = bids[ii] < self.ids[jj]
            return pd.DataFrame(
                {
                    "id_a": bids[ii][keep],
                    "id_b": self.ids[jj][keep],
                    "cosine": np.round(sims[ii, jj][keep], 6),
                }
            )

    return ds.map_batches(PairFinder, batch_format="pandas", batch_size=512, concurrency=(1, 4))


def components_minlabel(pairs_ds, max_rounds: int = 20):
    """Connected components of a pair list by iterative min-label
    propagation (groupby rounds) — returns Dataset[node, component]."""
    import ray.data as rd

    edges = pairs_ds.to_pandas()
    # start: every node labeled with itself
    nodes = pd.unique(pd.concat([edges["id_a"], edges["id_b"]]))
    labels = pd.DataFrame({"node": nodes, "component": nodes})
    for _ in range(max_rounds):
        m = edges.merge(labels, left_on="id_a", right_on="node").merge(
            labels, left_on="id_b", right_on="node", suffixes=("_a", "_b")
        )
        prop = pd.concat(
            [
                m[["id_a", "component_b"]].rename(columns={"id_a": "node", "component_b": "component"}),
                m[["id_b", "component_a"]].rename(columns={"id_b": "node", "component_a": "component"}),
                labels,
            ]
        )
        new_labels = prop.groupby("node", as_index=False)["component"].min()
        if new_labels.equals(labels.sort_values("node").reset_index(drop=True)):
            break
        labels = new_labels
    return rd.from_pandas(labels)
