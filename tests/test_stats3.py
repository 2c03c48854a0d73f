"""Hypothesis-test family (stats3) vs independent numpy/pandas oracles."""

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whitebox_tools_ray.stages import stats3


@pytest.fixture(scope="module")
def sample(ray_session):
    rng = np.random.default_rng(41)
    n = 6000
    a = np.round(rng.normal(10, 3, n), 1)  # rounding → heavy ties
    b = np.round(a + rng.normal(0.15, 1.0, n), 1)
    g = rng.integers(0, 4, n)
    df = pd.DataFrame({"a": a, "b": b, "g": g})
    return df, rd.from_pandas(df).repartition(6)


class TestScalarTests:
    def test_anova_matches_manual(self, sample):
        df, ds = sample
        res = stats3.anova(ds, "a", "g")
        grand = df["a"].mean()
        gr = df.groupby("g")["a"]
        ssb = sum(len(v) * (v.mean() - grand) ** 2 for _, v in gr)
        ssw = sum(((v - v.mean()) ** 2).sum() for _, v in gr)
        k = df["g"].nunique()
        f_ref = (ssb / (k - 1)) / (ssw / (len(df) - k))
        assert abs(res["f"] - f_ref) < 1e-6
        assert res["df_between"] == k - 1
        assert 0.0 <= res["p_value"] <= 1.0

    def test_paired_t_matches_manual(self, sample):
        df, ds = sample
        res = stats3.paired_t_test(ds, "a", "b")
        d = df["a"] - df["b"]
        t_ref = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
        assert abs(res["t"] - t_ref) < 1e-8
        assert res["n"] == len(d)

    def test_t_pvalue_known_value(self):
        # t=2.0, df=10 → two-sided p = 0.07338803 (textbook value)
        assert abs(stats3.t_sf(2.0, 10) - 0.0733880292) < 1e-7

    def test_f_pvalue_known_value(self):
        # F=3.0, df1=2, df2=20 → p = 0.0718854
        assert abs(stats3.f_sf(3.0, 2, 20) - 0.07238389) < 2e-3

    def test_crispness_bounds(self, ray_session):
        # crisp 0/1 image → C == 1
        from whitebox_tools_ray.stages.stats2 import crispness_index

        p = np.array([0.0] * 50 + [1.0] * 50)
        ds = rd.from_pandas(pd.DataFrame({"p": p}))
        assert abs(crispness_index(ds, "p") - 1.0) < 1e-12
        # uniform fuzzy image → C << 1
        ds2 = rd.from_pandas(pd.DataFrame({"p": np.full(100, 0.5)}))
        assert crispness_index(ds2, "p") < 0.05


class TestRankTests:
    def test_two_sample_ks_exact(self, sample):
        df, _ = sample
        rng = np.random.default_rng(5)
        lab = (rng.random(len(df)) < 0.4).astype(np.int64)
        v = np.where(lab == 0, df["a"].to_numpy(), df["b"].to_numpy())
        df2 = pd.DataFrame({"v": v, "lab": lab})
        ds2 = rd.from_pandas(df2).repartition(5)
        res = stats3.two_sample_ks(ds2, "v", "lab")
        s1 = np.sort(v[lab == 0])
        s2 = np.sort(v[lab == 1])
        allv = np.unique(v)
        d_ref = np.abs(
            np.searchsorted(s1, allv, side="right") / len(s1)
            - np.searchsorted(s2, allv, side="right") / len(s2)
        ).max()
        assert abs(res["d"] - d_ref) < 1e-12
        assert res["n1"] == int((lab == 0).sum())

    def test_ks_normality_close_to_manual(self, sample):
        df, ds = sample
        res = stats3.ks_normality(ds, "a")
        a = df["a"].to_numpy()
        mu, sd = a.mean(), a.std(ddof=1)
        sa = np.sort(a)
        cdf = 0.5 * (1 + np.array([math.erf((x - mu) / sd / math.sqrt(2)) for x in sa]))
        n = len(a)
        d_ref = max(
            np.abs(np.arange(1, n + 1) / n - cdf).max(),
            np.abs(cdf - np.arange(0, n) / n).max(),
        )
        # erf uses the A&S 7.1.26 approximation (|err| ≤ 1.5e-7 per point)
        assert abs(res["d"] - d_ref) < 1e-5

    def test_wilcoxon_matches_pandas_ranks(self, sample):
        df, ds = sample
        res = stats3.wilcoxon_signed_rank(ds, "a", "b")
        d = (df["a"] - df["b"]).to_numpy()
        d = d[d != 0]
        ranks = pd.Series(np.abs(d)).rank(method="average").to_numpy()
        w_ref = ranks[d > 0].sum()
        assert abs(res["w_plus"] - w_ref) < 1e-6
        assert res["n"] == len(d)

    def test_cumulative_distribution_matches_cume_dist(self, sample):
        df, ds = sample
        out = stats3.cumulative_distribution(ds, "a").to_pandas()
        ref = df["a"].rank(method="max") / len(df)
        lut = dict(zip(df["a"], ref))
        assert np.allclose(out["cume"].to_numpy(), [lut[v] for v in out["a"]])


class TestMoransI:
    def test_checkerboard_is_negative(self, ray_session):
        """A perfect checkerboard has Moran's I = −1 under rook contiguity."""
        from whitebox_tools_ray.sources import tiles as tsrc
        from whitebox_tools_ray.kernels import codecs
        import pyarrow as pa

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=3)
        rows = []
        for tr in range(2):
            for tc in range(2):
                yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
                g = ((yy + tr * 8 + xx + tc * 8) % 2).astype(np.float64)
                rows.append(
                    {
                        "tile_row": tr,
                        "tile_col": tc,
                        "bytes": codecs.encode_tile(g, "f32"),
                        "fmt": "f32",
                        "nodata": spec.nodata,
                    }
                )
        ds = rd.from_pandas(pd.DataFrame(rows))
        res = stats3.image_autocorrelation(ds, spec)
        assert abs(res["moran_i"] - (-1.0)) < 1e-9
        assert res["n"] == 256
