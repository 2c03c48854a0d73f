"""Cross-column statistics — the math_stat_analysis pair/regression family.

All two-phase GA patterns over Dataset columns (the reference's
raster∘raster versions operate per-cell over aligned grids; over the
tile table the same kernels run on decoded pixel pairs — over relational
tables they run on value columns; the math is identical):

- ``correlation``   — ImageCorrelation (image_correlation.rs): Pearson r
  via per-batch partial sums (n, Σx, Σy, Σx², Σy², Σxy).
- ``rmse``          — RootMeanSquareError (rmse.rs): √(Σ(a−b)²/n).
- ``cross_tabulation`` — CrossTabulation (cross_tabulation.rs):
  contingency counts of two categorical columns.
- ``kappa_index``   — KappaIndex (kappa_index.rs): Cohen's κ + overall
  accuracy from the contingency matrix.
- ``trend_surface`` — TrendSurface (trend_surface.rs): least-squares
  polynomial z = f(x, y) of given order via normal equations
  accumulated per batch (X'X and X'z partials summed driver-side).
- ``random_sample`` — RandomSample (random_sample.rs): seeded per-batch
  Bernoulli filter, deterministic given (seed, row index).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pair_partials(ds, a: str, b: str):
    def partial(batch: pa.Table) -> pa.Table:
        x = batch[a].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[b].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n": [len(x)],
                "sx": [float(x.sum())],
                "sy": [float(y.sum())],
                "sxx": [float((x * x).sum())],
                "syy": [float((y * y).sum())],
                "sxy": [float((x * y).sum())],
                "sdd": [float(((x - y) ** 2).sum())],
            }
        )

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *(Sum(c, alias_name=c) for c in ["n", "sx", "sy", "sxx", "syy", "sxy", "sdd"])
    )
    return {k: float(v) for k, v in agg.items()}


def correlation(ds, a: str, b: str) -> float:
    """Pearson correlation of two columns (ImageCorrelation kernel)."""
    p = _pair_partials(ds, a, b)
    n = p["n"]
    cov = p["sxy"] / n - (p["sx"] / n) * (p["sy"] / n)
    vx = p["sxx"] / n - (p["sx"] / n) ** 2
    vy = p["syy"] / n - (p["sy"] / n) ** 2
    return cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")


def rmse(ds, a: str, b: str) -> float:
    p = _pair_partials(ds, a, b)
    return float(np.sqrt(p["sdd"] / p["n"]))


def regression(ds, x: str, y: str) -> dict:
    """ImageRegression (image_regression.rs): OLS y = b0 + b1·x with
    slope/intercept standard errors and R², all from one partials pass."""
    p = _pair_partials(ds, x, y)
    n = p["n"]
    mx, my = p["sx"] / n, p["sy"] / n
    cov = p["sxy"] / n - mx * my
    vx = p["sxx"] / n - mx * mx
    vy = p["syy"] / n - my * my
    slope = cov / vx
    intercept = my - slope * mx
    r2 = (cov * cov) / (vx * vy) if vx > 0 and vy > 0 else float("nan")
    # residual variance from the same partials: SSE = Syy - b1*Sxy (centered)
    sse = n * (vy - slope * cov)
    mse = sse / (n - 2) if n > 2 else float("nan")
    se_slope = float(np.sqrt(mse / (n * vx))) if n > 2 and vx > 0 else float("nan")
    return {
        "n": int(n),
        "slope": slope,
        "intercept": intercept,
        "r2": r2,
        "se_slope": se_slope,
        "mse": mse,
    }


def cross_tabulation(ds, a: str, b: str):
    """Contingency table Dataset[a, b, n] via the partial-combine pattern."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"a": batch[a].to_pandas(), "b": batch[b].to_pandas()})
        g = df.groupby(["a", "b"], as_index=False).size()
        return pa.table({a: pa.array(g["a"]), b: pa.array(g["b"]), "n": pa.array(g["size"].to_numpy(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow").groupby([a, b]).aggregate(Sum("n", alias_name="n"))


def kappa_index(ds, a: str, b: str) -> dict:
    """Cohen's kappa + overall accuracy from the contingency counts."""
    ct = cross_tabulation(ds, a, b).to_pandas()
    total = ct["n"].sum()
    po = ct[ct[a] == ct[b]]["n"].sum() / total
    pa_ = ct.groupby(a)["n"].sum() / total
    pb = ct.groupby(b)["n"].sum() / total
    cats = set(pa_.index) | set(pb.index)
    pe = sum(pa_.get(c, 0.0) * pb.get(c, 0.0) for c in cats)
    kappa = (po - pe) / (1 - pe) if pe < 1 else 1.0
    return {"overall_accuracy": float(po), "kappa": float(kappa), "n": int(total)}


def _design_terms(order: int):
    return [(i, j) for i in range(order + 1) for j in range(order + 1 - i)]


def trend_surface(ds, x: str, y: str, z: str, order: int = 1):
    """Least-squares polynomial surface fit.

    Normal equations X'X / X'z accumulated per batch (each partial is a
    (terms × terms) flat row), solved driver-side; returns
    (coefficients dict term→coef, predict(ds) stage)."""
    terms = _design_terms(order)
    t = len(terms)

    def partial(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.float64)
        ys = batch[y].to_numpy(zero_copy_only=False).astype(np.float64)
        zs = batch[z].to_numpy(zero_copy_only=False).astype(np.float64)
        X = np.stack([xs**i * ys**j for i, j in terms], axis=1)
        xtx = (X.T @ X).ravel()
        xtz = X.T @ zs
        cols = {f"xtx{k}": [float(v)] for k, v in enumerate(xtx)}
        cols.update({f"xtz{k}": [float(v)] for k, v in enumerate(xtz)})
        return pa.table(cols)

    from ray.data.aggregate import Sum

    names = [f"xtx{k}" for k in range(t * t)] + [f"xtz{k}" for k in range(t)]
    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *(Sum(c, alias_name=c) for c in names)
    )
    xtx = np.array([agg[f"xtx{k}"] for k in range(t * t)]).reshape(t, t)
    xtz = np.array([agg[f"xtz{k}"] for k in range(t)])
    coef = np.linalg.solve(xtx, xtz)
    coefs = {terms[k]: float(coef[k]) for k in range(t)}

    def predict(ds2, out_col: str = "trend"):
        def fn(batch: pa.Table) -> pa.Table:
            xs = batch[x].to_numpy(zero_copy_only=False).astype(np.float64)
            ys = batch[y].to_numpy(zero_copy_only=False).astype(np.float64)
            out = np.zeros_like(xs)
            for (i, j), c in coefs.items():
                out += c * xs**i * ys**j
            return batch.append_column(out_col, pa.array(out))

        return ds2.map_batches(fn, batch_format="pyarrow")

    return coefs, predict


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    """(rows, dim) float64 view of a list<float> column — flatten the
    Arrow child buffer instead of a per-row to_pylist loop."""
    arr = batch[emb_col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def pca(ds, emb_col: str = "embedding", n_components: int = 4):
    """PrincipalComponentAnalysis: covariance via batch partials + eigen
    decomposition driver-side; returns (components, explained_ratio,
    project stage)."""
    def partial(batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, emb_col)
        # one row per batch: [n, sum(d), sum-of-outer(d*d)] packed flat —
        # a 16k-way named-Sum aggregate here measured 79 s on 500 rows;
        # summing a handful of packed partials driver-side is instant
        pack = np.concatenate(([float(len(m))], m.sum(axis=0), (m.T @ m).ravel()))
        return pa.table({"pack": pa.array([pack.tolist()], pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = np.sum(np.stack(parts["pack"].to_numpy()), axis=0)
    # 1 + d + d*d = len(tot)  →  d
    d = int(round((-1.0 + np.sqrt(4.0 * len(tot) - 3.0)) / 2.0))
    n = float(tot[0])
    mean = tot[1 : 1 + d] / n
    ss = tot[1 + d :].reshape(d, d)
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    ratio = evals[order] / evals.sum()

    def project(ds2, out_col: str = "pc"):
        import ray

        ref = ray.put((mean, comps))

        class Project:
            def __init__(self):
                self.mean, self.comps = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                m = _emb_matrix(batch, emb_col)
                p = (m - self.mean) @ self.comps.T
                return batch.append_column(out_col, pa.array(list(p)))

        return ds2.map_batches(Project, batch_format="pyarrow", concurrency=(1, 4))

    return comps, ratio, project


def random_sample(ds, fraction: float, seed: int = 42, id_col: str | None = None):
    """Deterministic Bernoulli sample: hash(seed, id) when an id column
    exists (stable under repartitioning), else seeded per-batch RNG."""

    def fn(batch: pa.Table) -> pa.Table:
        if id_col is not None:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            # Knuth multiplicative scramble kept within int64 (no wraparound)
            # so a SQL oracle can reproduce it: ((id+seed)*2654435761) % 2^31
            h = ((ids + seed) * np.int64(2654435761)) % np.int64(2147483648)
            u = h.astype(np.float64) / 2147483648.0
            keep = u < fraction
        else:
            rng = np.random.RandomState(seed + len(batch))
            keep = rng.uniform(size=batch.num_rows) < fraction
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def crispness_index(ds, col: str) -> float:
    """CrispnessIndex (crispness_index.rs:40): for a membership-probability
    column, C = Σ(p−p̄)² / [Σp·(1−p̄)² + p̄²(n−Σp)]."""

    def partial(batch: pa.Table) -> pa.Table:
        p = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        p = p[~np.isnan(p)]
        return pa.table({"n": [len(p)], "s": [float(p.sum())], "ss": [float((p * p).sum())]})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("ss", alias_name="ss")
    )
    n, s, ss = float(agg["n"]), float(agg["s"]), float(agg["ss"])
    pbar = s / n
    num = ss - n * pbar * pbar
    den = s * (1.0 - pbar) ** 2 + pbar * pbar * (n - s)
    return num / den if den else float("nan")
