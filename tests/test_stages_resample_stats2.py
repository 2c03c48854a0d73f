"""Resample / aggregate / mosaic and cross-statistics tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from whitebox_tools_ray.kernels import codecs
from whitebox_tools_ray.kernels.grid import GridSpec
from whitebox_tools_ray.sources import tiles as tsrc


@pytest.fixture(scope="module")
def scene(ray_session):
    spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=9)
    table = tsrc.generate_tiles(spec, fmt_cycle=("f32",))
    return spec, table, tsrc.assemble_scene(table, spec)


def collect(out_df, tiles_x, tpx, rows, cols, nodata):
    full = np.full((rows, cols), nodata)
    for _, r in out_df.iterrows():
        g = codecs.decode_tile(bytes(r["bytes"]), r["fmt"])
        r0 = int(r["tile_row"]) * tpx
        c0 = int(r["tile_col"]) * tpx
        full[r0 : r0 + g.shape[0], c0 : c0 + g.shape[1]] = g
    return full


class TestResample:
    def test_identity_nn(self, scene):
        """Resampling onto the SAME grid with nn must reproduce pixels."""
        from whitebox_tools_ray.stages.resample import resample

        spec, table, grid = scene
        gs = spec.grid_spec()
        out = resample(table, spec, gs, dest_tile_px=16, method="nn").to_pandas()
        got = collect(out, 2, 16, gs.rows, gs.columns, gs.nodata)
        np.testing.assert_allclose(got, grid)

    def test_downsample_bilinear_reference_arithmetic(self, scene):
        """2× coarser grid via "bilinear" == the reference's ACTUAL
        arithmetic (resample.rs:395-457): inverse-distance² over the 2×2
        neighbourhood at edge-fraction coords, exact hits zero-weighted
        and overwritten by the weighted mean of the valid corners —
        oracle implemented directly here, exact compare."""
        from whitebox_tools_ray.stages.resample import resample

        spec, table, grid = scene
        gs = spec.grid_spec()
        dest = GridSpec(
            west=gs.west, north=gs.north, res_x=gs.res_x * 2, res_y=gs.res_y * 2,
            rows=gs.rows // 2, columns=gs.columns // 2, nodata=gs.nodata,
        )
        out = resample(table, spec, dest, dest_tile_px=8, method="bilinear").to_pandas()
        got = collect(out, 2, 8, dest.rows, dest.columns, dest.nodata)
        g32 = grid.astype(np.float32).astype(np.float64)  # fixture tiles are f32
        sg = spec.grid_spec()
        expect = np.full((dest.rows, dest.columns), dest.nodata)
        for r in range(dest.rows):
            for c in range(dest.columns):
                yq = dest.north - (r + 0.5) * dest.res_y
                xq = dest.west + (c + 0.5) * dest.res_x
                row_src = (sg.north - yq) / sg.res_y
                col_src = (xq - sg.west) / sg.res_x
                orr, occ = int(np.floor(row_src)), int(np.floor(col_src))
                num = den = 0.0
                hit = None
                for sy, sx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    rn, cn = orr + sy, occ + sx
                    if not (0 <= rn < sg.rows and 0 <= cn < sg.columns):
                        continue
                    v = g32[rn, cn]
                    dy, dx = rn - row_src, cn - col_src
                    if (dx + dy) != 0.0:
                        w = 1.0 / (dx * dx + dy * dy)
                        num += v * w
                        den += w
                    else:
                        hit = v
                if den > 0:
                    expect[r, c] = num / den
                elif hit is not None:
                    expect[r, c] = hit
        np.testing.assert_allclose(got.astype(np.float32), expect.astype(np.float32), rtol=1e-6)

    def test_aggregate_raster(self, scene):
        from whitebox_tools_ray.stages.resample import aggregate_raster

        spec, table, grid = scene
        out = aggregate_raster(rd.from_arrow(table), spec, factor=4, stat="mean").to_pandas()
        # per-tile 4x4 block means
        for _, r in out.iterrows():
            g = codecs.decode_tile(bytes(r["bytes"]), r["fmt"])
            r0 = int(r["tile_row"]) * 16
            c0 = int(r["tile_col"]) * 16
            src = grid[r0 : r0 + 16, c0 : c0 + 16]
            expect = src.reshape(4, 4, 4, 4).mean(axis=(1, 3))
            np.testing.assert_allclose(g, expect.astype(np.float32).astype(np.float64), rtol=1e-6)

    @staticmethod
    def _assemble(out_ds, gs, tpx):
        got = np.full((gs.rows, gs.columns), gs.nodata)
        for _, r in out_ds.to_pandas().iterrows():
            g = codecs.decode_tile(bytes(r["bytes"]), r["fmt"])
            r0 = int(r["tile_row"]) * tpx
            c0 = int(r["tile_col"]) * tpx
            got[r0 : r0 + tpx, c0 : c0 + tpx] = g[: gs.rows - r0, : gs.columns - c0]
        return got

    def test_mosaic_first_valid_wins(self, scene):
        # mosaic.rs:362-370 — per dest cell, sources iterate IN ORDER and
        # the loop breaks on the first non-nodata value: the EARLIER
        # source takes priority; later sources only fill its holes
        from whitebox_tools_ray.stages.resample import mosaic

        spec, table, grid = scene
        gs = spec.grid_spec()
        spec2 = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=77)
        table2 = tsrc.generate_tiles(spec2, fmt_cycle=("f32",))
        out = mosaic([(table, spec), (table2, spec2)], gs, dest_tile_px=16, method="nn")
        got = self._assemble(out, gs, 16)
        expect = grid.astype(np.float32).astype(np.float64)  # same extent → FIRST source wins
        np.testing.assert_allclose(got, expect)

    def test_mosaic_fills_holes_and_dataset_source(self, scene):
        # second source extends past the first; first-source cells win
        # where both cover, uncovered dest tiles come out nodata; one
        # source passed as a Dataset exercises the co-partitioned route
        from whitebox_tools_ray.kernels.grid import GridSpec
        from whitebox_tools_ray.stages.resample import mosaic

        spec, table, grid = scene  # 2x2 tiles of 16 => 32x32
        sg = spec.grid_spec()
        # source 2: 32x32 scene shifted one tile right (covers cols 16..47)
        spec2 = tsrc.SceneSpec(
            tiles_x=2, tiles_y=2, tile_px=16, seed=77, west=sg.west + 16 * sg.res_x
        )
        table2 = tsrc.generate_tiles(spec2, fmt_cycle=("f32",))
        grid2 = tsrc.assemble_scene(table2, spec2)
        # dest: 64 cols x 32 rows covering both plus an uncovered strip
        gs = GridSpec(west=sg.west, north=sg.north, res_x=sg.res_x, res_y=sg.res_y,
                      rows=32, columns=64, nodata=sg.nodata)
        out = mosaic([(rd.from_arrow(table), spec), (table2, spec2)], gs, dest_tile_px=16, method="nn")
        got = self._assemble(out, gs, 16)
        expect = np.full((32, 64), gs.nodata)
        expect[:, 16:48] = grid2.astype(np.float32).astype(np.float64)
        expect[:, :32] = grid.astype(np.float32).astype(np.float64)  # first wins on overlap
        np.testing.assert_allclose(got, expect)

    def test_resample_shuffled_matches_broadcast(self, scene):
        from whitebox_tools_ray.stages.resample import resample, resample_shuffled

        spec, table, grid = scene
        gs = spec.grid_spec()
        dest = tsrc.SceneSpec(tiles_x=3, tiles_y=3, tile_px=8, res=spec.res * 1.3).grid_spec()
        for method in ("nn", "bilinear", "cc"):
            a = self._assemble(resample(table, spec, dest, 8, method), dest, 8)
            b = self._assemble(resample_shuffled(rd.from_arrow(table), spec, dest, 8, method), dest, 8)
            np.testing.assert_allclose(a, b, err_msg=method)


class TestStats2:
    def test_correlation_and_rmse(self, ray_session):
        from whitebox_tools_ray.stages.stats2 import correlation, rmse

        rng = np.random.RandomState(0)
        x = rng.uniform(0, 1, 5000)
        y = 2 * x + rng.normal(0, 0.1, 5000)
        ds = rd.from_arrow(pa.table({"x": x, "y": y}))
        r = correlation(ds, "x", "y")
        assert r == pytest.approx(np.corrcoef(x, y)[0, 1], rel=1e-9)
        assert rmse(ds, "x", "y") == pytest.approx(np.sqrt(((x - y) ** 2).mean()), rel=1e-9)

    def test_trend_surface_recovers_plane(self, ray_session):
        from whitebox_tools_ray.stages.stats2 import trend_surface

        rng = np.random.RandomState(1)
        x = rng.uniform(0, 100, 2000)
        y = rng.uniform(0, 100, 2000)
        z = 3.0 + 0.5 * x - 0.25 * y
        ds = rd.from_arrow(pa.table({"x": x, "y": y, "z": z}))
        coefs, predict = trend_surface(ds, "x", "y", "z", order=1)
        assert coefs[(0, 0)] == pytest.approx(3.0, abs=1e-6)
        assert coefs[(1, 0)] == pytest.approx(0.5, abs=1e-8)
        assert coefs[(0, 1)] == pytest.approx(-0.25, abs=1e-8)
        out = predict(ds).to_pandas()
        np.testing.assert_allclose(out["trend"], z, atol=1e-6)

    def test_pca_variance_order(self, ray_session):
        from whitebox_tools_ray.stages.stats2 import pca

        rng = np.random.RandomState(2)
        base = rng.normal(size=(400, 8))
        base[:, 0] *= 10  # dominant axis
        ds = rd.from_arrow(pa.table({"embedding": list(base)}))
        comps, ratio, project = pca(ds, n_components=2)
        assert ratio[0] > ratio[1]
        assert abs(comps[0][0]) > 0.9  # first PC aligned with the scaled axis
        out = project(ds).to_pandas()
        assert len(out["pc"].iloc[0]) == 2

    def test_random_sample_deterministic(self, ray_session):
        from whitebox_tools_ray.stages.stats2 import random_sample

        ds = rd.from_arrow(pa.table({"k": np.arange(10000, dtype=np.int64)}))
        a = random_sample(ds, 0.2, seed=5, id_col="k").to_pandas()
        b = random_sample(ds, 0.2, seed=5, id_col="k").to_pandas()
        assert a["k"].tolist() == b["k"].tolist()
        assert 0.17 < len(a) / 10000 < 0.23


class TestRound2Stretches:
    def _tiles(self, spec, full):
        import pyarrow as pa
        from whitebox_tools_ray.kernels import codecs
        t = spec.tile_px
        cols = {"tile_row": [], "tile_col": [], "bytes": [], "fmt": [], "nodata": []}
        for tr in range(spec.tiles_y):
            for tc in range(spec.tiles_x):
                cols["tile_row"].append(tr)
                cols["tile_col"].append(tc)
                cols["bytes"].append(codecs.encode_tile(full[tr*t:(tr+1)*t, tc*t:(tc+1)*t], "f32"))
                cols["fmt"].append("f32")
                cols["nodata"].append(spec.nodata)
        return pa.table({"tile_row": pa.array(cols["tile_row"], pa.int32()),
                         "tile_col": pa.array(cols["tile_col"], pa.int32()),
                         "bytes": pa.array(cols["bytes"], pa.binary()),
                         "fmt": pa.array(cols["fmt"], pa.string()),
                         "nodata": pa.array(cols["nodata"], pa.float64())})

    def _assemble(self, out_ds, spec):
        from whitebox_tools_ray.kernels import codecs
        t = spec.tile_px
        full = np.zeros((spec.rows, spec.columns))
        for _, row in out_ds.to_pandas().iterrows():
            g = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
            full[int(row["tile_row"])*t:(int(row["tile_row"])+1)*t,
                 int(row["tile_col"])*t:(int(row["tile_col"])+1)*t] = g
        return full

    def test_sigmoidal(self, ray_session):
        import ray.data as rd
        from whitebox_tools_ray.stages.stretch import sigmoidal_stretch

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8)
        rng = np.random.RandomState(3)
        full = np.float32(rng.uniform(10, 90, (16, 16))).astype(np.float64)
        out = self._assemble(sigmoidal_stretch(rd.from_arrow(self._tiles(spec, full)),
                                               cutoff=0.4, gain=2.0, num_tones=256), spec)
        lo, hi = full.min(), full.max()
        zn = (full - lo) / (hi - lo)
        a = 1/(1+np.exp(2.0*0.4)); b = 1/(1+np.exp(2.0*(0.4-1.0))) - a
        expect = (1/(1+np.exp(2.0*(0.4-zn))) - a)/b*255
        np.testing.assert_allclose(np.float32(out), np.float32(expect), rtol=1e-5)

    def test_bce_maps_min_mean_max(self, ray_session):
        import ray.data as rd
        from whitebox_tools_ray.stages.stretch import balance_contrast_enhancement

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8)
        rng = np.random.RandomState(5)
        full = np.float32(rng.uniform(50, 200, (16, 16))).astype(np.float64)
        E = 100.0
        out = self._assemble(balance_contrast_enhancement(
            rd.from_arrow(self._tiles(spec, full)), e_mean=E), spec)
        # parabola maps min→0, max→255 exactly; mean(out) ≈ E
        np.testing.assert_allclose(out.min(), 0.0, atol=1e-6)
        np.testing.assert_allclose(out.max(), 255.0, atol=1e-6)
        assert abs(out.mean() - E) < 1.0

    def test_histogram_matching_two_images(self, ray_session):
        import ray.data as rd
        from whitebox_tools_ray.stages.stretch import histogram_matching_two_images

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8)
        rng = np.random.RandomState(7)
        src = np.float32(rng.uniform(0, 50, (16, 16))).astype(np.float64)
        ref = np.float32(rng.normal(500, 40, (16, 16))).astype(np.float64)
        out = self._assemble(histogram_matching_two_images(
            rd.from_arrow(self._tiles(spec, src)), rd.from_arrow(self._tiles(spec, ref)),
            num_tones=64), spec)
        # matched output's distribution ≈ reference's (quartiles close)
        for q in (0.25, 0.5, 0.75):
            assert abs(np.quantile(out, q) - np.quantile(ref, q)) < 25.0


class TestCCResampleAndFeathering:
    def _table(self, spec, full):
        import pyarrow as pa
        from whitebox_tools_ray.kernels import codecs
        t = spec.tile_px
        cols = {"tile_row": [], "tile_col": [], "bytes": [], "fmt": []}
        for tr in range(spec.tiles_y):
            for tc in range(spec.tiles_x):
                cols["tile_row"].append(tr)
                cols["tile_col"].append(tc)
                cols["bytes"].append(codecs.encode_tile(full[tr*t:(tr+1)*t, tc*t:(tc+1)*t], "f32"))
                cols["fmt"].append("f32")
        return pa.table({"tile_row": pa.array(cols["tile_row"], pa.int32()),
                         "tile_col": pa.array(cols["tile_col"], pa.int32()),
                         "bytes": pa.array(cols["bytes"], pa.binary()),
                         "fmt": pa.array(cols["fmt"], pa.string())})

    def test_cc_reproduces_linear_field(self, ray_session):
        """Cubic convolution is exact on linear fields (Keys kernel sums
        to 1 with zero first moment)."""
        from whitebox_tools_ray.kernels.grid import GridSpec
        from whitebox_tools_ray.stages.resample import resample
        from whitebox_tools_ray.kernels import codecs

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16)
        gs = spec.grid_spec()
        rows = np.arange(32); cols = np.arange(32)
        gx, gy = np.meshgrid(gs.x_from_col(cols), gs.y_from_row(rows))
        full = 0.001 * gx + 0.002 * gy
        # dest grid: half resolution over the interior
        dest = GridSpec(rows=24, columns=24, west=gs.west + 3 * gs.res_x,
                        north=gs.north - 3 * gs.res_y,
                        res_x=gs.res_x, res_y=gs.res_y, nodata=gs.nodata)
        out = resample(self._table(spec, full), spec, dest, dest_tile_px=12, method="cc").to_pandas()
        for _, row in out.iterrows():
            g = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
            tr, tc = int(row["tile_row"]), int(row["tile_col"])
            rr = np.arange(tr * 12, (tr + 1) * 12)
            cc_ = np.arange(tc * 12, (tc + 1) * 12)
            dgx, dgy = np.meshgrid(dest.x_from_col(cc_), dest.y_from_row(rr))
            expect = 0.001 * dgx + 0.002 * dgy
            np.testing.assert_allclose(g, expect, rtol=1e-5)

    def test_feathering_blends_overlap(self, ray_session):
        from whitebox_tools_ray.kernels.grid import GridSpec
        from whitebox_tools_ray.stages.resample import mosaic_with_feathering
        from whitebox_tools_ray.kernels import codecs
        from dataclasses import replace

        spec_a = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16)
        gs = spec_a.grid_spec()
        # scene B shifted half a scene east
        spec_b = replace(spec_a, west=spec_a.west + 16 * spec_a.res)
        full_a = np.full((32, 32), 10.0)
        full_b = np.full((32, 32), 30.0)
        dest = GridSpec(rows=32, columns=48, west=gs.west, north=gs.north,
                        res_x=gs.res_x, res_y=gs.res_y, nodata=gs.nodata)
        out = mosaic_with_feathering(
            [(self._table(spec_a, full_a), spec_a), (self._table(spec_b, full_b), spec_b)],
            dest, dest_tile_px=16, method="nn").to_pandas()
        scene = np.full((32, 48), np.nan)
        for _, row in out.iterrows():
            g = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
            scene[int(row["tile_row"])*16:(int(row["tile_row"])+1)*16,
                  int(row["tile_col"])*16:(int(row["tile_col"])+1)*16] = g
        mid = scene[16, :]
        # left of the overlap: pure A; right: pure B; inside: monotone blend
        assert np.isclose(mid[2], 10.0)
        assert np.isclose(mid[45], 30.0)
        ov = mid[17:31]
        assert (np.diff(ov) >= -1e-9).all() and ov.min() >= 10.0 and ov.max() <= 30.0
