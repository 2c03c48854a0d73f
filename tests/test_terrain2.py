"""Terrain part-2 family: tiled output vs whole-scene oracles."""

import numpy as np
import pytest

import ray.data as rd

from whitebox_tools_ray.kernels import codecs
from whitebox_tools_ray.sources import tiles as tsrc
from whitebox_tools_ray.stages import terrain2
from whitebox_tools_ray.stages.focal import DX8, DY8


@pytest.fixture(scope="module")
def scene(ray_session):
    spec = tsrc.SceneSpec(tiles_x=3, tiles_y=3, tile_px=16, seed=13)
    table = tsrc.generate_tiles(spec, fmt_cycle=("f32",))
    grid = tsrc.assemble_scene(table, spec)
    return spec, table, grid


def assemble(df, spec):
    full = np.full((spec.rows, spec.columns), spec.nodata)
    for _, row in df.iterrows():
        g = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
        r0 = int(row["tile_row"]) * spec.tile_px
        c0 = int(row["tile_col"]) * spec.tile_px
        full[r0 : r0 + g.shape[0], c0 : c0 + g.shape[1]] = g
    return full


def neighbours(grid, r, c, z, nodata):
    rows, cols = grid.shape
    n = []
    for i in range(8):
        rr, cc = r + DY8[i], c + DX8[i]
        zi = grid[rr, cc] if 0 <= rr < rows and 0 <= cc < cols else nodata
        n.append(zi if zi != nodata else z)
    return n


class TestCurvatures:
    def test_prof_curvature_matches_whole_scene(self, scene):
        """Literal prof_curvature.rs:285-300 over the whole raster."""
        spec, table, grid = scene
        got = assemble(terrain2.prof_curvature(rd.from_pandas(table.to_pandas()), spec).to_pandas(), spec)
        res = spec.res
        for r, c in [(5, 5), (16, 17), (30, 8), (1, 40)]:
            z = grid[r, c]
            n = neighbours(grid, r, c, z, spec.nodata)
            zx = (n[1] - n[5]) / (2 * res)
            zy = (n[7] - n[3]) / (2 * res)
            zxx = (n[1] - 2 * z + n[5]) / res**2
            zyy = (n[7] - 2 * z + n[3]) / res**2
            zxy = (-n[6] + n[0] + n[4] - n[2]) / (4 * res**2)
            p = zx**2 + zy**2
            q = p + 1.0
            want = np.degrees((zxx * zx**2 + 2 * zxy * zx * zy + zyy * zy**2) / (p * q**1.5)) * 100
            assert got[r, c] == pytest.approx(want, rel=1e-5, abs=1e-6)

    def test_total_curvature_nonnegative(self, scene):
        spec, table, _ = scene
        got = assemble(terrain2.total_curvature(rd.from_pandas(table.to_pandas()), spec).to_pandas(), spec)
        assert (got >= 0).all()


class TestNeighbourCounts:
    def test_up_plus_down_at_most_8(self, scene):
        spec, table, grid = scene
        ds = rd.from_pandas(table.to_pandas())
        down = assemble(terrain2.num_downslope_neighbours(ds, spec).to_pandas(), spec)
        up = assemble(terrain2.num_upslope_neighbours(ds, spec).to_pandas(), spec)
        assert ((down + up) <= 8).all()
        r, c = 10, 10
        want_down = sum(
            1 for i in range(8) if grid[r + DY8[i], c + DX8[i]] < grid[r, c]
        )
        assert down[r, c] == want_down

    def test_max_downslope_change(self, scene):
        spec, table, grid = scene
        got = assemble(
            terrain2.max_downslope_elev_change(rd.from_pandas(table.to_pandas()), spec).to_pandas(),
            spec,
        )
        r, c = 12, 20
        drops = [
            grid[r, c] - grid[r + DY8[i], c + DX8[i]]
            for i in range(8)
            if grid[r + DY8[i], c + DX8[i]] < grid[r, c]
        ]
        want = max(drops) if drops else 0.0
        assert got[r, c] == pytest.approx(want, abs=1e-5)


class TestTexture:
    def test_surface_area_ratio_at_least_one(self, scene):
        spec, table, _ = scene
        got = assemble(terrain2.surface_area_ratio(rd.from_pandas(table.to_pandas()), spec).to_pandas(), spec)
        assert (got >= 1.0 - 1e-9).all()

    def test_circular_variance_range(self, scene):
        spec, table, _ = scene
        got = assemble(
            terrain2.circular_variance_of_aspect(rd.from_pandas(table.to_pandas()), spec, 2).to_pandas(),
            spec,
        )
        v = got[got != spec.nodata]
        assert ((v >= -1e-9) & (v <= 1.0 + 1e-9)).all()

    def test_flat_dem_zero_slope_stdev(self, ray_session):
        import pandas as pd

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=1)
        rows = []
        for tr in range(2):
            for tc in range(2):
                rows.append(
                    {
                        "tile_row": tr,
                        "tile_col": tc,
                        "bytes": codecs.encode_tile(np.full((16, 16), 5.0), "f32"),
                        "fmt": "f32",
                    }
                )
        ds = rd.from_pandas(pd.DataFrame(rows))
        got = assemble(terrain2.stdev_of_slope(ds, spec, 2).to_pandas(), spec)
        assert np.allclose(got, 0.0, atol=1e-9)
        ed = assemble(terrain2.edge_density(ds, spec, 2, 5.0).to_pandas(), spec)
        assert np.allclose(ed, 0.0, atol=1e-9)

    def test_pennock_classes_in_range(self, scene):
        spec, table, _ = scene
        got = assemble(
            terrain2.pennock_landform_class(rd.from_pandas(table.to_pandas()), spec).to_pandas(), spec
        )
        v = got[got != spec.nodata]
        assert set(np.unique(v)).issubset({1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0})


class TestTwoLayer:
    def test_wetness_index_formula(self, scene):
        spec, table, _ = scene
        from whitebox_tools_ray.stages.focal import slope as slope_op

        ds = rd.from_pandas(table.to_pandas())
        slope_ds = slope_op(ds, spec)
        # fake SCA layer = constant 10
        import pandas as pd

        rows = []
        for tr in range(spec.tiles_y):
            for tc in range(spec.tiles_x):
                rows.append(
                    {
                        "tile_row": tr,
                        "tile_col": tc,
                        "bytes": codecs.encode_tile(np.full((spec.tile_px, spec.tile_px), 10.0), "f32"),
                        "fmt": "f32",
                    }
                )
        sca_ds = rd.from_pandas(pd.DataFrame(rows))
        wi = assemble(terrain2.wetness_index(sca_ds, slope_ds, spec).to_pandas(), spec)
        sl = assemble(slope_ds.to_pandas(), spec)
        r, c = 10, 10
        want = np.log(10.0 / max(np.tan(np.radians(sl[r, c])), 1e-12))
        assert wi[r, c] == pytest.approx(want, rel=1e-6)


class TestElevAbovePit:
    def test_cone_dem(self, ray_session):
        """An inward-draining cone: every cell drains to the centre pit,
        so elev_above_pit == z − z_min."""
        import pandas as pd

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        full = np.hypot(yy - 7.3, xx - 7.7)
        rows = []
        for tr in range(2):
            for tc in range(2):
                g = full[tr * 8 : tr * 8 + 8, tc * 8 : tc * 8 + 8]
                rows.append(
                    {
                        "tile_row": tr,
                        "tile_col": tc,
                        "bytes": codecs.encode_tile(g, "f32"),
                        "fmt": "f32",
                    }
                )
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = assemble(terrain2.elev_above_pit(ds, spec, num_workers=2).to_pandas(), spec)
        want = full - full.min()
        np.testing.assert_allclose(out, want, atol=1e-5)
