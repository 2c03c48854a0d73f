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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


def _hash_tokens(tokens: list[str] | np.ndarray) -> np.ndarray:
    """Stable 64-bit hashes of string tokens (vectorized pandas siphash
    with a fixed key — process-stable, no per-token Python hashing)."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object), hash_key="wbtr_tok_hash_1_")


def shingles(text: str, k: int = 5) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 odd constant


def shingle_hashes_from_tokens(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """k-gram shingle hashes from per-token hashes, vectorized: positional
    mix-and-sum over k shifted views (order-sensitive, uint64 wraparound)."""
    n = len(token_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        k = n
    th = token_hashes.astype(np.uint64)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    for j in range(k):  # k is tiny (3-5); the vector axis is n
        out = (out * _MIX) ^ th[j : n - k + 1 + j]
    return out


def minhash_signature(shingle_hashes: np.ndarray, perms_a: np.ndarray, perms_b: np.ndarray) -> np.ndarray:
    """num_perms minima of the multiply-shift family a*h+b (mod 2^64),
    computed as ONE (perms × shingles) uint64 broadcast — no Python loop,
    no object dtype."""
    if len(shingle_hashes) == 0:
        return np.full(len(perms_a), np.iinfo(np.uint64).max, dtype=np.uint64)
    hs = shingle_hashes.astype(np.uint64)
    m = perms_a[:, None].astype(np.uint64) * hs[None, :] + perms_b[:, None].astype(np.uint64)
    return m.min(axis=1)


def make_perms(num_perms: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perms, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, _MERSENNE, size=num_perms, dtype=np.int64).astype(np.uint64)
    return a, b


def content_hash128(values: list[str] | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized 128-bit content hash: two independent 64-bit siphashes
    (pandas hash_array, fixed keys → process-stable). 128 bits keeps the
    birthday-collision expectation ≪1 even at 10^12 rows, where a single
    64-bit key would collide ~10^7 times."""
    arr = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key="wbtr_content_h1_")
    h2 = pd.util.hash_array(arr, hash_key="wbtr_content_h2_")
    return h1.view(np.int64), h2.view(np.int64)


def exact_dedup(ds, text_col: str, id_col: str, keep: str = "min"):
    """Hash-partition exact dedup: one surviving id per distinct content.

    Scale shape: vectorized 128-bit content hash per batch → groupby the
    hash (the only shuffle; shuffles 2×int64 + id, never the content) →
    Min/Count native aggregates (no per-group Python)."""
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = content_hash128(batch[text_col].to_pylist())
        return pa.table(
            {
                id_col: batch[id_col],
                "__h1": pa.array(h1, pa.int64()),
                "__h2": pa.array(h2, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby(["__h1", "__h2"])
        .aggregate(Min(id_col), Count())
    )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[f"min({id_col})"],
                "n_dups": batch["count()"],
            }
        )

    return agg.map_batches(project, batch_format="pyarrow")


def coincident_dedup(
    ds,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str | None = None,
    tolerance: float = 1e-9,
    id_col: str | None = None,
):
    """Coordinate dedup with tolerance — EliminateCoincidentPoints /
    LidarRemoveDuplicates semantics (reference
    gis_analysis/eliminate_coincident_points.rs,
    lidar_analysis/remove_duplicates.rs: FRS-quantized x,y[,z] match,
    keep the first point per occupied cell).

    Quantize each coordinate to the tolerance grid (floor), groupby the
    quantized key, keep the record with the smallest id (scan order when
    ids are scan-ordered). Records shuffle once on the quantized key —
    the minimum any dedup that must emit surviving full rows can do."""
    cols = [x_col, y_col] + ([z_col] if z_col else [])
    if id_col is None:
        # assign a deterministic scan-order id per row if none provided
        raise ValueError("coincident_dedup requires id_col (stable point id)")

    def add_key(batch: pa.Table) -> pa.Table:
        for c in cols:
            v = np.asarray(batch[c].to_numpy(zero_copy_only=False), dtype=np.float64)
            batch = batch.append_column(
                "__q_" + c, pa.array(np.floor(v / tolerance).astype(np.int64), pa.int64())
            )
        return batch

    keys = ["__q_" + c for c in cols]

    # coarse salt (key-hash % 64) + one vectorized within-partition
    # groupby, NOT groupby(keys) directly — per-distinct-key map_groups
    # pays a pandas call per surviving point (the jaccard/distinct-scan
    # lesson: ~100k tiny groups ≈ tens of seconds of pure overhead)
    def add_salt(batch: pa.Table) -> pa.Table:
        acc = np.zeros(batch.num_rows, dtype=np.int64)
        for k in keys:
            acc = acc * 1_000_003 + batch[k].to_numpy(zero_copy_only=False)
        return batch.append_column("__salt", pa.array(acc % 64))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(keys, sort=False)[id_col].idxmin()
        return g.loc[idx].drop(columns=keys + ["__salt"])

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(keep_first, batch_format="pandas")
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
        ndocs = len(texts)
        if ndocs == 0:
            return pa.table(
                {self.id_col: pa.array([]), "band_id": pa.array([], pa.int64()),
                 "band_hash": pa.array([], pa.int64())}
            )
        # ONE vectorized token-hash call over the whole batch, then per-doc
        # shingle mixing (numpy per doc), then ONE (perms × shingles)
        # broadcast + minimum.reduceat for every signature in the batch.
        tok_lists = [t.split() for t in texts]
        flat = [tok for toks in tok_lists for tok in toks]
        th_flat = _hash_tokens(flat)
        sh_list: list[np.ndarray] = []
        offsets = [0]
        empty: list[int] = []
        pos = 0
        sent = np.array([np.iinfo(np.uint64).max], np.uint64)
        for di, toks in enumerate(tok_lists):
            n = len(toks)
            sh = shingle_hashes_from_tokens(th_flat[pos : pos + n], self.k)
            pos += n
            if len(sh) == 0:
                sh = sent
                empty.append(di)
            sh_list.append(sh)
            offsets.append(offsets[-1] + len(sh))
        hs_all = np.concatenate(sh_list)
        m = self.a[:, None] * hs_all[None, :] + self.b[:, None]
        sig = np.minimum.reduceat(m, np.array(offsets[:-1]), axis=1)  # (P, D)
        if empty:
            sig[:, empty] = np.iinfo(np.uint64).max
        # band hashes: fold rows_per_band signature rows per band (vector over docs)
        r = self.rows_per_band
        bh = np.zeros((self.bands, ndocs), dtype=np.uint64)
        for band in range(self.bands):
            acc = np.zeros(ndocs, dtype=np.uint64)
            for row in range(band * r, (band + 1) * r):
                acc = (acc * _MIX) ^ sig[row]
            bh[band] = acc
        out_id = np.repeat(np.asarray(ids, dtype=object), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int64), ndocs)
        out_bh = bh.T.reshape(-1).view(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(out_id.tolist()),
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

    # coarse salt (bucket-hash % 64) + one vectorized kernel per salt
    # partition: grouping directly on (band_id, band_hash) pays one
    # pandas call per DISTINCT BUCKET (≈ bands × docs tiny groups)
    P = 64

    def add_salt(batch: pa.Table) -> pa.Table:
        bi = batch["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("__salt", pa.array((bi * 1_000_003 + bh) % P))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((
            g[id_col].to_numpy(),
            g["band_hash"].to_numpy(),
            g["band_id"].to_numpy(),
        ))
        bi = g["band_id"].to_numpy()[order]
        bh = g["band_hash"].to_numpy()[order]
        ids = g[id_col].to_numpy()[order]
        key = bi.astype(np.int64) * 1_000_003 + bh.astype(np.int64)
        _, starts, counts = np.unique(key, return_index=True, return_counts=True)
        a_parts, b_parts = [], []
        for s0, n in zip(starts[counts >= 2], counts[counts >= 2]):
            ii, jj = np.triu_indices(int(n), 1)
            a_parts.append(ids[s0 + ii])
            b_parts.append(ids[s0 + jj])
        if not a_parts:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(a_parts),
                             "id_b": np.concatenate(b_parts)})

    pairs = (
        rows.map_batches(add_salt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def add_psalt(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return batch.append_column("__salt", pa.array((a * 1_000_003 + b) % P))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"]).drop(columns="__salt")

    return (
        pairs.map_batches(add_psalt, batch_format="pyarrow")
        .groupby("__salt")
        .map_groups(dedup_pairs, batch_format="pandas")
    )


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
    """64-bit SimHash over word tokens (weighted by term frequency) —
    one (tokens × 64) bit matrix, no per-token Python loop."""
    toks = text.split()
    if not toks:
        return 0
    vals, counts = np.unique(toks, return_counts=True)
    hs = _hash_tokens(vals)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    v = int((acc > 0).astype(np.uint64) @ (np.uint64(1) << shifts))
    return v - (1 << 64) if v >= (1 << 63) else v


def simhash_dedup(ds, text_col="text", id_col="doc_id", hamming_t: int = 3):
    """Near-dup pairs with simhash hamming distance ≤ t.

    Blocked-prefix trick: with t ≤ 3, split the 64-bit hash into 4
    16-bit blocks — any pair within distance t agrees on ≥1 block →
    groupby (block_idx, block_value) buckets, verify hamming inside."""

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = np.array([simhash64(t) for t in batch[text_col].to_pylist()], dtype=np.int64)
        uh = hs.view(np.uint64)
        n = len(ids)
        block_idx = np.tile(np.arange(4, dtype=np.int64), n)
        block_val = (
            (uh[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64)[None, :]))
            & np.uint64(0xFFFF)
        ).reshape(-1).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(np.asarray(ids, dtype=object), 4).tolist()),
                "block_idx": pa.array(block_idx, pa.int64()),
                "block_val": pa.array(block_val, pa.int64()),
                "sh": pa.array(np.repeat(hs, 4), pa.int64()),
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


def embedding_near_dup(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    method: str = "auto",
    num_planes: int = 8,
    num_tables: int = 12,
    broadcast_cap: int = 200_000,
):
    """Cosine-similarity near-dup pairs (id_a < id_b).

    Three paths:
    - ``auto`` (default) — EXACT ``broadcast`` while ``ds.count()`` is at
      most ``broadcast_cap`` rows (count is parquet-metadata-cheap on the
      usual read path), else the ``lsh`` scale path. This keeps the
      registered tool safe at 100 TB without sacrificing the exact
      small-table answer the oracle gate checks.
    - ``broadcast`` — EXACT: the embedding table is broadcast once
      (``ray.put``) and every batch matmuls against it. O(N²) work but
      zero shuffle; correct only while the table fits one worker heap
      (the oracle-checked gate query uses this path at sf scale).
    - ``lsh`` — the 100-TB path: multi-table random-hyperplane codes,
      ``groupby(table, code)`` buckets, exact pairwise cosine inside a
      bucket, pair-dedup across tables. Near-1 recall at high thresholds
      (miss prob ≈ (1-(1-θ/π)^b)^L per pair), linear shuffle volume —
      codes + ids only, never an all-pairs exchange.
    """
    if method == "auto":
        method = "broadcast" if ds.count() <= broadcast_cap else "lsh"
    if method == "lsh":
        return _embedding_near_dup_lsh(
            ds, threshold, id_col, emb_col, num_planes=num_planes, num_tables=num_tables
        )
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


def _embedding_near_dup_lsh(
    ds,
    threshold: float,
    id_col: str,
    emb_col: str,
    num_planes: int = 8,
    num_tables: int = 12,
    seed: int = 42,
):
    """LSH-bucketed near-dup: emit (table, code, id, embedding) rows,
    groupby bucket, exact cosine inside, dedup pairs across tables."""
    from .ann import lsh_codes, make_planes

    dim = len(ds.take(1)[0][emb_col])
    tables = np.stack([make_planes(dim, num_planes, seed=seed + 17 * t) for t in range(num_tables)])
    import ray

    ref = ray.put(tables)

    class CodeEmit:
        def __init__(self):
            self.tables = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            bids = batch[id_col].to_numpy()
            m = np.stack([np.asarray(e, dtype=np.float64) for e in batch[emb_col]])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            frames = []
            for t, planes in enumerate(self.tables):
                codes = lsh_codes(m, planes)
                frames.append(
                    pd.DataFrame(
                        {
                            "table": t,
                            "code": codes,
                            id_col: bids,
                            emb_col: list(m),
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

    rows = ds.map_batches(CodeEmit, batch_format="pandas", batch_size=1024, concurrency=(1, 8))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = np.stack(g[emb_col].to_list())
        sims = m @ m.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ii], "id_b": ids[jj], "cosine": np.round(sims[ii, jj], 6)}
        )

    pairs = rows.groupby(["table", "code"]).map_groups(bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def components_minlabel(pairs_ds, max_rounds: int = 64):
    """Connected components of a pair list by DISTRIBUTED min-label
    propagation WITH pointer jumping — returns Dataset[node, component].

    Each round: (1) push — every edge forwards its endpoint's current
    label to the peer (bucketed hash join of edges × labels), every node
    takes the min candidate (native ``Min`` aggregate); (2) jump — each
    node replaces its label by its label's label (labels self-join),
    halving chain depth. Push alone needs O(diameter) rounds; push+jump
    converges in O(log n) — a 10⁹-node path resolves in ~30 rounds. The
    driver holds only a per-round convergence checksum (sum of label
    hashes — labels are monotone non-increasing, so an unchanged sum ⇒
    fixed point); edges and labels stay in the object store."""
    from ray.data.aggregate import Min, Sum

    from .joins import hash_join_bucketed

    # node ids may be strings or ints; propagate on whatever the min order is
    def edge_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([batch["id_a"], batch["id_b"]], ignore_index=True),
                "peer": pd.concat([batch["id_b"], batch["id_a"]], ignore_index=True),
            }
        )

    edges = pairs_ds.map_batches(edge_rows, batch_format="pandas").materialize()
    # bounded block count: every round's join/groupby multiplies tiny
    # blocks (measured ×4/round → round time compounds); repartitioning
    # the label table back to nb blocks keeps per-round cost flat
    nb = int(min(max(edges.num_blocks(), 8), 200))
    labels = (
        edges.groupby("node")
        .aggregate(Min("peer"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "component": pc.min_element_wise(b["node"], b["min(peer)"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # convergence: labels are monotone NON-INCREASING per node, so for
    # NUMERIC node ids an unchanged Sum(component) IS a fixed point (any
    # change strictly lowers the sum) — no hashing scan. String ids keep
    # the hash checksum.
    sch = labels.schema()
    comp_type = dict(zip(sch.names, sch.types))["component"]
    numeric = pa.types.is_integer(comp_type) or pa.types.is_floating(comp_type)

    def checksum(lab) -> float:
        if numeric:
            return lab.aggregate(Sum("component"))["sum(component)"]
        h = lab.map_batches(
            lambda b: pa.table(
                {
                    "s": pa.array(
                        [float(np.sum(pd.util.hash_array(
                            np.asarray(b["component"].to_pylist(), dtype=object)
                        ).view(np.int64) % (1 << 40)))]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        return h.aggregate(Sum("s"))["sum(s)"]

    prev = checksum(labels)
    for _ in range(max_rounds):
        # push: each edge forwards label[node] to peer; min per node over
        # pushed candidates and the node's own label (native aggregates)
        fwd = hash_join_bucketed(edges, labels, key="node", how="inner")
        cand_push = fwd.map_batches(
            lambda b: pa.table({"node": b["peer"], "cand": b["component"]}),
            batch_format="pyarrow",
        )
        cand_self = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "cand": b["component"]}),
            batch_format="pyarrow",
        )
        pushed = (
            cand_push.union(cand_self)
            .groupby("node")
            .aggregate(Min("cand"))
            .map_batches(
                lambda b: pa.table({"node": b["node"], "component": b["min(cand)"]}),
                batch_format="pyarrow",
            )
            .repartition(nb)
            .materialize()  # consumed twice below (join left + label lookup)
        )
        # jump: component ← label[component]. Every component value is a
        # live node id of the same component, so the inner join is total.
        lk = pushed.map_batches(
            lambda b: pa.table({"k": b["node"], "comp2": b["component"]}),
            batch_format="pyarrow",
        )
        labels = (
            hash_join_bucketed(pushed, lk, key="component", right_key="k", how="inner")
            .map_batches(
                lambda b: pa.table({"node": b["node"], "component": b["comp2"]}),
                batch_format="pyarrow",
            )
            .repartition(nb)
            .materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def functional_roots(parents_ds, max_rounds: int = 64):
    """Root of every node of a functional forest — Dataset[node, root].

    Input: Dataset[node, parent] where roots are self-parented
    (``parent == node``); every node has exactly one parent row (a
    forest of in-trees / chains, e.g. D8 run predecessors). Pointer
    doubling (``anc ← anc[anc]`` via a bucketed self-join) halves chain
    depth per round → O(log depth) rounds; per-round block count is
    repartition-bounded (same measured blowup fix as
    ``components_minlabel``). Driver holds only the convergence
    checksum."""
    from ray.data.aggregate import Sum

    from .joins import hash_join_bucketed

    def local_collapse(b: pa.Table) -> pa.Table:
        # chains are mostly intra-block (runs are tile-local, and the
        # input blocks come off per-tile stages), so resolve every hop
        # whose target lives in THIS block before any global round —
        # numpy pointer doubling against a sorted local index. Global
        # rounds then only chase the few cross-block hops.
        node = np.asarray(b["node"].to_numpy(zero_copy_only=False))
        anc = np.asarray(b["anc"].to_numpy(zero_copy_only=False)).copy()
        if len(node) == 0 or node.dtype.kind not in "iu":
            return pa.table({"node": b["node"], "anc": b["anc"]})
        order = np.argsort(node, kind="stable")
        sn = node[order]
        for _ in range(64):
            pos = np.searchsorted(sn, anc)
            posc = np.clip(pos, 0, len(sn) - 1)
            ok = sn[posc] == anc
            nxt = anc[order[posc]]
            hop = ok & (nxt != anc)
            if not hop.any():
                break
            anc = np.where(hop, nxt, anc)
        return pa.table({"node": pa.array(node), "anc": pa.array(anc)})

    labels = parents_ds.map_batches(
        lambda b: pa.table({"node": b["node"], "anc": b["parent"]}),
        batch_format="pyarrow",
    ).materialize()
    nb = int(min(max(labels.num_blocks(), 4), 200))
    labels = (
        labels.repartition(nb)
        .map_batches(local_collapse, batch_format="pyarrow")
        .materialize()
    )

    for _ in range(max_rounds):
        lk = labels.map_batches(
            lambda b: pa.table({"k": b["node"], "anc2": b["anc"]}),
            batch_format="pyarrow",
        )

        def hop(b: pa.Table) -> pa.Table:
            a = b["anc"].to_numpy(zero_copy_only=False)
            a2 = b["anc2"].to_numpy(zero_copy_only=False)
            # carry the per-row changed flag so convergence needs no
            # extra hashing pass — one tiny Sum over the same table
            return pa.table({"node": b["node"], "anc": b["anc2"],
                             "chg": pa.array((a != a2).astype(np.int64))})

        labels = (
            hash_join_bucketed(labels, lk, key="anc", right_key="k", how="inner",
                               num_buckets=nb)
            .map_batches(hop, batch_format="pyarrow")
            .repartition(nb)
            .materialize()
        )
        # the chg column rides along into the next round's projection
        # (lk only reads node/anc) — no strip pass needed
        changed = labels.aggregate(Sum("chg"))["sum(chg)"]
        if not changed:
            break
    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "root": b["anc"]}),
        batch_format="pyarrow",
    )


def ngram_jaccard_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    hot_cap: int = 10_000,
    strict: bool = False,
):
    """EXACT n-gram Jaccard near-dup pairs (id_a < id_b, jaccard ≥ t).

    Fully distributed, no candidate generation and no broadcast:
    1. explode each doc into its DISTINCT word-k-gram shingle hashes,
       carrying the doc's distinct-shingle count on every row;
    2. ``groupby(shingle)`` — docs sharing a shingle meet in one group,
       which emits its C(n,2) id pairs (with both sizes);
    3. ``groupby(pair)`` counts the intersection; jaccard =
       inter / (|A| + |B| − inter) needs nothing else.
    Shuffle volume is O(total shingles), never all-pairs. ``hot_cap``
    bounds a pathological shingle shared by ~everything (a stop-shingle:
    its group would emit n²/2 pairs); a group past the cap is dropped
    WITH a warning log line per dropped shingle (worker log) — pairs
    sharing only hot shingles get an undercounted intersection, so
    exactness degrades for them. Pass ``strict=True`` to raise instead
    of dropping; at 100 TB pre-filter stop-shingles by document
    frequency instead. 64-bit shingle hashing: a collision merges two
    shingles (prob ≈ n²/2⁶⁵ — negligible against doc-count scales)."""
    import pyarrow as pa

    def explode(batch: pa.Table) -> pa.Table:
        ids_out, sh_out, sz_out = [], [], []
        ids = batch[id_col].to_pylist()
        for i, text in enumerate(batch[text_col].to_pylist()):
            toks = text.split()
            th = _hash_tokens(toks)
            sh = np.unique(shingle_hashes_from_tokens(th, k))
            ids_out.append(np.full(len(sh), ids[i], dtype=np.int64))
            sh_out.append(sh.view(np.int64))
            sz_out.append(np.full(len(sh), len(sh), dtype=np.int64))
        if not ids_out:
            return pa.table({"sh": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "sz": pa.array([], pa.int64())})
        return pa.table(
            {
                "sh": pa.array(np.concatenate(sh_out), pa.int64()),
                "id": pa.array(np.concatenate(ids_out), pa.int64()),
                "sz": pa.array(np.concatenate(sz_out), pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # Both exchange stages group by a COARSE salt (hash % 64) and run
    # ONE vectorized kernel per partition: grouping directly on the
    # shingle / pair key spawns a pandas call per DISTINCT key (~100 k
    # tiny groups on the sf0.01 gate, measured ~20 s of pure per-group
    # overhead; the salted form is ~1 s). Results are identical — the
    # salt only controls co-location granularity.
    P = 64

    def add_shp(batch: pa.Table) -> pa.Table:
        sh = batch["sh"].to_numpy(zero_copy_only=False)
        return batch.append_column("shp", pa.array(sh % P))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all shingles of one salt partition at once
        order = np.lexsort((g["id"].to_numpy(), g["sh"].to_numpy()))
        sh = g["sh"].to_numpy()[order]
        ids = g["id"].to_numpy()[order]
        szs = g["sz"].to_numpy()[order]
        uniq, starts, counts = np.unique(sh, return_index=True, return_counts=True)
        hot = counts > hot_cap
        if hot.any():
            if strict:
                raise ValueError(
                    f"ngram_jaccard_pairs: {int(hot.sum())} shingle(s) shared by "
                    f"up to {int(counts.max())} docs exceed hot_cap={hot_cap}; "
                    "exactness would degrade (pre-filter stop-shingles or "
                    "raise hot_cap)"
                )
            import logging

            for s, n in zip(uniq[hot], counts[hot]):
                logging.getLogger(__name__).warning(
                    "ngram_jaccard_pairs: dropping hot shingle %#x shared by "
                    "%d docs (hot_cap=%d) — intersections involving it are "
                    "undercounted", int(s), int(n), hot_cap,
                )
        ia, ib, sa, sb = [], [], [], []
        for s0, n in zip(starts[(counts >= 2) & ~hot], counts[(counts >= 2) & ~hot]):
            ii, jj = np.triu_indices(int(n), 1)
            ia.append(ids[s0 + ii])
            ib.append(ids[s0 + jj])
            sa.append(szs[s0 + ii])
            sb.append(szs[s0 + jj])
        if not ia:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"),
                 "sz_a": pd.Series([], dtype="int64"), "sz_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(ia), "id_b": np.concatenate(ib),
             "sz_a": np.concatenate(sa), "sz_b": np.concatenate(sb)}
        )

    pairs = (
        exploded.map_batches(add_shp, batch_format="pyarrow")
        .groupby("shp")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def add_pp(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].to_numpy(zero_copy_only=False)
        b = batch["id_b"].to_numpy(zero_copy_only=False)
        return batch.append_column("pp", pa.array((a * 1_000_003 + b) % P))

    def score(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["id_a", "id_b"], as_index=False)
            .agg(inter=("sz_a", "size"), sz_a=("sz_a", "first"), sz_b=("sz_b", "first"))
        )
        j = agg["inter"] / (agg["sz_a"] + agg["sz_b"] - agg["inter"])
        keep = j >= threshold
        return pd.DataFrame(
            {"id_a": agg.loc[keep, "id_a"].astype(np.int64),
             "id_b": agg.loc[keep, "id_b"].astype(np.int64),
             "jaccard": np.round(j[keep].to_numpy(np.float64), 6)}
        )

    return (
        pairs.map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(score, batch_format="pandas")
    )
