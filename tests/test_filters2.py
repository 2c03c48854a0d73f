"""Extended filter family: tiled engine output == whole-scene numpy run."""

import numpy as np
import pytest

import ray.data as rd

from whitebox_tools_ray.kernels import codecs
from whitebox_tools_ray.sources import tiles as tsrc
from whitebox_tools_ray.stages import filters2


@pytest.fixture(scope="module")
def scene(ray_session):
    spec = tsrc.SceneSpec(tiles_x=3, tiles_y=3, tile_px=16, seed=11)
    table = tsrc.generate_tiles(spec, fmt_cycle=("f32",))
    grid = tsrc.assemble_scene(table, spec)
    return spec, table, grid


def assemble_result(df, spec):
    full = np.full((spec.rows, spec.columns), spec.nodata)
    for _, row in df.iterrows():
        g = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
        r0 = int(row["tile_row"]) * spec.tile_px
        c0 = int(row["tile_col"]) * spec.tile_px
        full[r0 : r0 + g.shape[0], c0 : c0 + g.shape[1]] = g
    return full


def conv_whole(grid, w, nodata, normalize=False):
    """Whole-scene convolution oracle with out-of-bounds = nodata."""
    rad = w.shape[0] // 2
    rows, cols = grid.shape
    out = np.full_like(grid, nodata)
    for r in range(rows):
        for c in range(cols):
            if grid[r, c] == nodata:
                continue
            s = tot = 0.0
            for dy in range(-rad, rad + 1):
                for dx in range(-rad, rad + 1):
                    rr, cc = r + dy, c + dx
                    v = grid[rr, cc] if 0 <= rr < rows and 0 <= cc < cols else nodata
                    if v != nodata:
                        wv = w[dy + rad, dx + rad]
                        s += v * wv
                        tot += wv
            out[r, c] = s / tot if normalize and tot != 0 else s
    return out


class TestConvolutions:
    def test_gaussian_matches_whole_scene(self, scene):
        spec, table, grid = scene
        w = filters2.gaussian_weights(0.75)
        got = assemble_result(
            filters2.gaussian_filter(rd.from_pandas(table.to_pandas()), spec, 0.75).to_pandas(),
            spec,
        )
        want = conv_whole(grid, w, spec.nodata, normalize=True)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_user_defined_weights(self, scene):
        spec, table, grid = scene
        w = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], float)
        got = assemble_result(
            filters2.user_defined_weights_filter(
                rd.from_pandas(table.to_pandas()), spec, w
            ).to_pandas(),
            spec,
        )
        want = conv_whole(grid, w, spec.nodata)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_scharr_is_hypot_of_gradients(self, scene):
        spec, table, grid = scene
        got = assemble_result(
            filters2.scharr_filter(rd.from_pandas(table.to_pandas()), spec).to_pandas(), spec
        )
        wx = np.array([[3, 0, -3], [10, 0, -10], [3, 0, -3]], float)
        wy = np.array([[3, 10, 3], [0, 0, 0], [-3, -10, -3]], float)
        want = np.hypot(
            conv_whole(grid, wx, spec.nodata), conv_whole(grid, wy, spec.nodata)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


class TestValueFilters:
    def test_conservative_smoothing_bounds(self, scene):
        """Output is always within [min, max] of the 3x3 neighbourhood and
        equals z when z already lies within the neighbour range."""
        spec, table, grid = scene
        got = assemble_result(
            filters2.conservative_smoothing_filter(
                rd.from_pandas(table.to_pandas()), spec
            ).to_pandas(),
            spec,
        )
        rows, cols = grid.shape
        for r in range(1, rows - 1, 7):
            for c in range(1, cols - 1, 5):
                nb = [
                    grid[r + dy, c + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if not (dy == 0 and dx == 0)
                ]
                assert min(nb) <= got[r, c] <= max(nb) or got[r, c] == grid[r, c]
                if min(nb) <= grid[r, c] <= max(nb):
                    assert got[r, c] == pytest.approx(grid[r, c], abs=1e-5)

    def test_edge_preserving_mean(self, scene):
        spec, table, grid = scene
        thr = 0.5
        got = assemble_result(
            filters2.edge_preserving_mean_filter(
                rd.from_pandas(table.to_pandas()), spec, 1, thr
            ).to_pandas(),
            spec,
        )
        rows, cols = grid.shape
        for r in range(1, rows - 1, 9):
            for c in range(1, cols - 1, 6):
                vals = [
                    grid[r + dy, c + dx]
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if abs(grid[r + dy, c + dx] - grid[r, c]) <= thr
                ]
                assert got[r, c] == pytest.approx(np.mean(vals), abs=1e-5)

    def test_high_pass_is_z_minus_mean(self, scene):
        spec, table, grid = scene
        got = assemble_result(
            filters2.high_pass_filter(rd.from_pandas(table.to_pandas()), spec, 1).to_pandas(),
            spec,
        )
        r, c = 8, 8
        nb = grid[r - 1 : r + 2, c - 1 : c + 2]
        assert got[r, c] == pytest.approx(grid[r, c] - nb.mean(), abs=1e-5)


class TestMorphology:
    def test_opening_closing_ordering(self, scene):
        """opening(z) <= z <= closing(z) pointwise (standard morphology)."""
        spec, table, _ = scene
        ds = rd.from_pandas(table.to_pandas())
        op = assemble_result(filters2.opening(ds, spec, 1).to_pandas(), spec)
        cl = assemble_result(filters2.closing(ds, spec, 1).to_pandas(), spec)
        z = assemble_result(ds.to_pandas(), spec)
        assert (op <= z + 1e-6).all()
        assert (cl >= z - 1e-6).all()

    def test_white_tophat_nonnegative(self, scene):
        spec, table, _ = scene
        ds = rd.from_pandas(table.to_pandas())
        th = assemble_result(filters2.tophat_transform(ds, spec, 1, "white").to_pandas(), spec)
        assert (th >= -1e-6).all()


class TestBinaryOps:
    @pytest.fixture()
    def binary_scene(self, ray_session):
        """A thick L-shaped line on a 2x2-tile boolean scene."""
        import pandas as pd

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=1)
        full = np.zeros((32, 32))
        full[10:13, 4:28] = 1.0  # horizontal bar, 3 px thick
        full[10:26, 25:28] = 1.0  # vertical bar
        rows = []
        for tr in range(2):
            for tc in range(2):
                g = full[tr * 16 : tr * 16 + 16, tc * 16 : tc * 16 + 16]
                rows.append(
                    {
                        "tile_row": tr,
                        "tile_col": tc,
                        "bytes": codecs.encode_tile(g, "f32"),
                        "fmt": "f32",
                    }
                )
        return spec, rd.from_pandas(pd.DataFrame(rows)), full

    def test_line_thinning_reduces_to_thin_connected_skeleton(self, binary_scene):
        spec, ds, full = binary_scene
        out = assemble_result(filters2.line_thinning(ds, spec, max_loops=10).to_pandas(), spec)
        fg = (out > 0).sum()
        assert 0 < fg < (full > 0).sum()
        # skeleton must be 1-px thin: no 2x2 block fully foreground
        b = out > 0
        assert not (b[:-1, :-1] & b[1:, :-1] & b[:-1, 1:] & b[1:, 1:]).any()

    def test_remove_spurs_removes_isolated_tip(self, binary_scene):
        spec, ds, full = binary_scene
        out = assemble_result(filters2.remove_spurs(ds, spec, iterations=3).to_pandas(), spec)
        assert (out > 0).sum() <= (full > 0).sum()

    def test_thicken_bridges_diagonal(self, ray_session):
        import pandas as pd

        spec = tsrc.SceneSpec(tiles_x=1, tiles_y=1, tile_px=16, seed=1)
        g = np.zeros((16, 16))
        for i in range(4, 10):
            g[i, i] = 1.0  # pure diagonal line
        ds = rd.from_pandas(
            pd.DataFrame(
                [{"tile_row": 0, "tile_col": 0, "bytes": codecs.encode_tile(g, "f32"), "fmt": "f32"}]
            )
        )
        out = assemble_result(filters2.thicken_raster_line(ds, spec).to_pandas(), spec)
        assert (out > 0).sum() > (g > 0).sum()
