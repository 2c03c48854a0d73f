"""Patch metrics, overlay extensions, allocation, generators."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whitebox_tools_ray.kernels import codecs
from whitebox_tools_ray.sources import tiles as tsrc
from whitebox_tools_ray.stages import band_math, distance, generate, patch


def tiles_from_grid(full, spec, fmt="f32"):
    rows = []
    tpx = spec.tile_px
    for tr in range(spec.tiles_y):
        for tc in range(spec.tiles_x):
            g = full[tr * tpx : (tr + 1) * tpx, tc * tpx : (tc + 1) * tpx]
            rows.append(
                {
                    "tile_row": tr,
                    "tile_col": tc,
                    "bytes": codecs.encode_tile(np.ascontiguousarray(g), fmt),
                    "fmt": fmt,
                }
            )
    return rd.from_pandas(pd.DataFrame(rows))


def assemble(df, spec):
    full = np.full((spec.rows, spec.columns), spec.nodata)
    for _, row in df.iterrows():
        g = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
        r0 = int(row["tile_row"]) * spec.tile_px
        c0 = int(row["tile_col"]) * spec.tile_px
        full[r0 : r0 + g.shape[0], c0 : c0 + g.shape[1]] = g
    return full


@pytest.fixture(scope="module")
def patches(ray_session):
    """Two rectangular patches (class 1: 6x4, class 2: 3x3) crossing a
    tile boundary."""
    spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
    full = np.zeros((16, 16))
    full[2:8, 5:9] = 1.0  # crosses the col-boundary at 8
    full[10:13, 10:13] = 2.0
    return spec, full, tiles_from_grid(full, spec)


class TestPatchMetrics:
    def test_raster_area(self, patches):
        spec, full, ds = patches
        out = patch.raster_area(ds, spec).set_index("cls")["area"]
        cell = spec.res * spec.res
        assert out[1.0] == pytest.approx(24 * cell)
        assert out[2.0] == pytest.approx(9 * cell)

    def test_centroid(self, patches):
        spec, full, ds = patches
        gs = spec.grid_spec()
        out = patch.centroid_raster(ds, spec).set_index("cls")
        # class 2 centroid: rows 10-12, cols 10-12 → centre (11, 11)
        assert out.loc[2.0, "x"] == pytest.approx(gs.west + 11.5 * spec.res)
        assert out.loc[2.0, "y"] == pytest.approx(gs.north - 11.5 * spec.res)

    def test_radius_of_gyration_matches_brute(self, patches):
        spec, full, ds = patches
        out = patch.radius_of_gyration(ds, spec).set_index("cls")["gyradius"]
        rr, cc = np.nonzero(full == 1.0)
        d = np.hypot(rr - rr.mean(), cc - cc.mean()).mean() * spec.res
        assert out[1.0] == pytest.approx(d, abs=1e-5)

    def test_edge_proportion_small_square(self, patches):
        spec, full, ds = patches
        out = patch.edge_proportion(ds, spec, output_raster=False).set_index("cls")
        # 3x3 patch: all but the centre cell are edge cells → 8/9
        assert out.loc[2.0, "edge_proportion"] == pytest.approx(8.0 / 9.0, abs=1e-6)

    def test_narrowness_square_close_to_circle_ratio(self, patches):
        spec, full, ds = patches
        out = patch.narrowness_index(ds, spec).set_index("cls")["narrowness"]
        # 3x3 square: MD = res (centre) + res/2; NI = 9res²/(π·2.25res²)
        assert out[2.0] == pytest.approx(9.0 / (np.pi * 2.25), rel=1e-3)

    def test_lowest_highest_points(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        yy, xx = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
        full = yy * 16 + xx
        ds = tiles_from_grid(full, spec)
        out = patch.find_lowest_or_highest_points(ds, spec)
        lo = out[out["kind"] == "lowest"].iloc[0]
        hi = out[out["kind"] == "highest"].iloc[0]
        assert lo["z"] == 0.0 and hi["z"] == 255.0


class TestOverlays:
    def test_max_absolute(self, ray_session):
        # max_abs_overlay.rs:225-229: the output is |value|, not the
        # signed value whose magnitude is extreme
        spec = tsrc.SceneSpec(tiles_x=1, tiles_y=1, tile_px=8, seed=1)
        a = tiles_from_grid(np.full((8, 8), -5.0), spec)
        b = tiles_from_grid(np.full((8, 8), 3.0), spec)
        out = assemble(band_math.overlay([a, b], spec, "max_absolute").to_pandas(), spec)
        assert (out == 5.0).all()

    def test_overlay_skips_per_layer_nodata(self, ray_session):
        # max_overlay.rs: a layer's nodata cell is skipped, not poisoning
        spec = tsrc.SceneSpec(tiles_x=1, tiles_y=1, tile_px=8, seed=1)
        ga = np.full((8, 8), 4.0)
        ga[0, 0] = spec.nodata
        gb = np.full((8, 8), 3.0)
        gb[0, 1] = spec.nodata
        gb[0, 0] = spec.nodata
        out = assemble(band_math.overlay(
            [tiles_from_grid(ga, spec), tiles_from_grid(gb, spec)], spec, "max"
        ).to_pandas(), spec)
        assert out[0, 0] == spec.nodata  # valid in NO layer
        assert out[0, 1] == 4.0          # b nodata skipped
        assert out[1, 1] == 4.0

    def test_percent_greater_than(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=1, tiles_y=1, tile_px=8, seed=1)
        layers = [tiles_from_grid(np.full((8, 8), v), spec) for v in (1.0, 3.0, 5.0, 7.0)]
        cmp_ds = tiles_from_grid(np.full((8, 8), 4.0), spec)
        out = assemble(band_math.compare_overlay(layers, cmp_ds, spec, "gt").to_pandas(), spec)
        assert (out == 50.0).all()

    def test_pick_from_list(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=1, tiles_y=1, tile_px=8, seed=1)
        layers = [tiles_from_grid(np.full((8, 8), v), spec) for v in (10.0, 20.0)]
        # pick_from_list.rs:16-21: positions are ZERO-based
        pos = np.zeros((8, 8))
        pos[:, 4:] = 1.0
        out = assemble(
            band_math.pick_from_list(layers, tiles_from_grid(pos, spec), spec).to_pandas(), spec
        )
        assert (out[:, :4] == 10.0).all() and (out[:, 4:] == 20.0).all()

    def test_weighted_overlay_sums_to_scale(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=1, tiles_y=1, tile_px=8, seed=1)
        yy, xx = np.meshgrid(np.arange(8.0), np.arange(8.0), indexing="ij")
        a = tiles_from_grid(xx, spec)
        b = tiles_from_grid(yy, spec)
        out = assemble(
            band_math.weighted_overlay([a, b], spec, [1.0, 1.0], scale_max=100.0).to_pandas(),
            spec,
        )
        # corner (0,0): both normalized 0 → 0; corner (7,7): both 1 → 100
        assert out[0, 0] == pytest.approx(0.0)
        assert out[7, 7] == pytest.approx(100.0)


class TestAllocation:
    def test_allocation_matches_brute_force(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        full = np.zeros((16, 16))
        sites = [(2, 3, 7.0), (12, 13, 9.0), (8, 2, 4.0)]
        for r, c, v in sites:
            full[r, c] = v
        ds = tiles_from_grid(full, spec)
        out = assemble(distance.euclidean_allocation_ds(ds, spec).to_pandas(), spec)
        for r in range(16):
            for c in range(16):
                d2 = [(r - sr) ** 2 + (c - sc) ** 2 for sr, sc, _ in sites]
                jmin = int(np.argmin(d2))
                # ties can go either way — only assert on unique minima
                if sorted(d2)[0] != sorted(d2)[1]:
                    assert out[r, c] == sites[jmin][2], (r, c)

    def test_buffer_raster(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        full = np.zeros((16, 16))
        full[8, 8] = 1.0
        ds = tiles_from_grid(full, spec)
        out = assemble(distance.buffer_raster(ds, spec, 3.0 * spec.res).to_pandas(), spec)
        assert out[8, 8] == 1.0 and out[8, 11] == 1.0 and out[8, 12] == 0.0


class TestGenerators:
    def test_create_plane_gradient(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        out = assemble(generate.create_plane(spec, 0.0, 45.0, 90.0).to_pandas(), spec)
        # 45° slope due east: z increases by res per column
        assert np.allclose(np.diff(out, axis=1), spec.res)

    def test_random_field_stats_and_determinism(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=1)
        a = assemble(generate.random_field(spec, seed=9).to_pandas(), spec)
        b = assemble(generate.random_field(spec, seed=9).to_pandas(), spec)
        np.testing.assert_array_equal(a, b)
        assert abs(a.mean()) < 0.1 and abs(a.std() - 1.0) < 0.1

    def test_turning_bands_autocorrelated(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=1)
        f = assemble(generate.turning_bands(spec, range_=20.0, num_bands=32).to_pandas(), spec)
        # neighbour correlation far above the white-noise level
        v = f[:, :-1].ravel()
        w = f[:, 1:].ravel()
        r = np.corrcoef(v, w)[0, 1]
        assert r > 0.5

    def test_rect_grid_covers_extent(self, ray_session):
        out = generate.create_rectangular_vector_grid(0, 0, 10, 10, 2.5, 2.5).to_pandas()
        assert len(out) == 16
        assert out["x_min"].min() == 0.0 and out["x_max"].max() == 10.0

    def test_hex_grid_nonempty_and_closed(self, ray_session):
        out = generate.create_hexagonal_vector_grid(0, 0, 10, 10, 1.0).to_pandas()
        assert len(out) > 20
        xs = np.asarray(out.iloc[0]["xs"])
        assert xs[0] == xs[-1]  # rings closed
