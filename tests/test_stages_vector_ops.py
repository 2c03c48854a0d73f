"""Vector transform (M family) + tile footprint/selection tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from whitebox_tools_ray.sources import tiles as tsrc
from whitebox_tools_ray.sources.vectors import POLY_SCHEMA, fixture_polygons, make_polygon_record
from whitebox_tools_ray.stages import vector_ops as V


@pytest.fixture(scope="module")
def polys(ray_session):
    return fixture_polygons()


class TestVectorOps:
    def test_extract_nodes_counts(self, polys):
        out = V.extract_nodes(rd.from_arrow(polys)).to_pandas()
        # donut record (id 3): 3 rings of 4 distinct vertices each
        donut = out[out["record_id"] == 3]
        assert len(donut) == 12

    def test_multipart_explode_and_merge(self, polys):
        exploded = V.multipart_to_singlepart(rd.from_arrow(polys)).to_pandas()
        donut_parts = exploded[exploded["record_id"] == 3]
        assert len(donut_parts) == 3
        # merge back by record_id
        merged = V.singlepart_to_multipart(
            rd.from_arrow(pa.Table.from_pandas(exploded, preserve_index=False)), "record_id"
        ).to_pandas()
        m3 = merged[merged["record_id"] == 3].iloc[0]
        assert len(m3["parts"]) == 3

    def test_remove_holes(self, polys):
        out = V.remove_polygon_holes(rd.from_arrow(polys)).to_pandas()
        donut = out[out["record_id"] == 3].iloc[0]
        assert len(donut["parts"]) == 1  # only the shell survives

    def test_clean_vector_drops_degenerate(self, ray_session):
        rec = make_polygon_record(1, [[(0, 0), (1, 0), (0, 1)]], "tri", 1)
        bad = dict(rec, record_id=2, xs=[0.0, 1.0], ys=[0.0, 0.0])
        t = pa.Table.from_pydict(
            {k: [rec[k], bad[k]] for k in POLY_SCHEMA.names}, schema=POLY_SCHEMA
        )
        out = V.clean_vector(rd.from_arrow(t)).to_pandas()
        assert out["record_id"].tolist() == [1]

    def test_smooth_keeps_endpoints_and_closure(self, polys):
        out = V.smooth_vectors(rd.from_arrow(polys), filter_size=3).to_pandas()
        r1 = out[out["record_id"] == 1].iloc[0]
        assert r1["xs"][0] == r1["xs"][-1] and r1["ys"][0] == r1["ys"][-1]

    def test_lines_to_polygons_closes(self, ray_session):
        t = pa.table(
            {
                "record_id": pa.array([1], pa.int32()),
                "parts": pa.array([[0]], pa.list_(pa.int32())),
                "xs": pa.array([[0.0, 5.0, 5.0]], pa.list_(pa.float64())),
                "ys": pa.array([[0.0, 0.0, 5.0]], pa.list_(pa.float64())),
            }
        )
        out = V.lines_to_polygons(rd.from_arrow(t)).to_pandas().iloc[0]
        assert out["xs"][-1] == 0.0 and out["ys"][-1] == 0.0

    def test_extend_lines(self, ray_session):
        t = pa.table(
            {
                "record_id": pa.array([1], pa.int32()),
                "parts": pa.array([[0]], pa.list_(pa.int32())),
                "xs": pa.array([[0.0, 10.0]], pa.list_(pa.float64())),
                "ys": pa.array([[0.0, 0.0]], pa.list_(pa.float64())),
            }
        )
        out = V.extend_vector_lines(rd.from_arrow(t), 2.0).to_pandas().iloc[0]
        assert out["xs"][0] == -2.0 and out["xs"][-1] == 12.0

    def test_add_coordinates(self, ray_session):
        t = pa.table({"record_id": [1], "x": [3.0], "y": [4.0]})
        out = V.add_point_coordinates(rd.from_arrow(t)).to_pandas()
        assert out["XCOORD"].iloc[0] == 3.0 and out["YCOORD"].iloc[0] == 4.0


class TestTileSelection:
    def test_footprints_and_select(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=4, tiles_y=4, tile_px=8)
        table = tsrc.generate_tiles(spec, fmt_cycle=("f32",))
        fps = V.tile_footprints(rd.from_arrow(table)).to_pandas()
        assert len(fps) == 16
        gs = spec.grid_spec()
        # polygon covering only the north-west tile
        rec = make_polygon_record(
            1,
            [[(gs.west + 10, gs.north - 10), (gs.west + 10, gs.north - 300),
              (gs.west + 300, gs.north - 300), (gs.west + 300, gs.north - 10)]],
            "nw",
            1,
        )
        pt = pa.Table.from_pydict({k: [rec[k]] for k in POLY_SCHEMA.names}, schema=POLY_SCHEMA)
        sel = V.select_tiles_by_polygon(rd.from_arrow(table), pt).to_pandas()
        assert len(sel) >= 1
        assert ((sel["tile_row"] == 0) & (sel["tile_col"] == 0)).any()
        # the polygon is 290 m wide vs 720 m tiles → only the NW tile hit
        assert len(sel) == 1


class TestColor:
    def test_rgb_ihs_roundtrip(self, ray_session):
        import pyarrow as pa

        from whitebox_tools_ray.stages.color import ihs2rgb_arrays, rgb2ihs_arrays

        rng = np.random.RandomState(0)
        r = rng.uniform(0.05, 1.0, 500)
        g = rng.uniform(0.05, 1.0, 500)
        b = rng.uniform(0.05, 1.0, 500)
        h, s, i = rgb2ihs_arrays(r, g, b)
        r2, g2, b2 = ihs2rgb_arrays(h, s, i)
        np.testing.assert_allclose(r2, r, atol=1e-9)
        np.testing.assert_allclose(g2, g, atol=1e-9)
        np.testing.assert_allclose(b2, b, atol=1e-9)

    def test_known_values(self, ray_session):
        from whitebox_tools_ray.stages.color import rgb2ihs_arrays

        # pure red: h=0, s=1, i=1/3
        h, s, i = rgb2ihs_arrays(np.array([1.0]), np.array([0.0]), np.array([0.0]))
        assert h[0] == 0.0 and s[0] == 1.0 and i[0] == pytest.approx(1 / 3)
        # grey: s=0, h=0
        h, s, i = rgb2ihs_arrays(np.array([0.5]), np.array([0.5]), np.array([0.5]))
        assert h[0] == 0.0 and abs(s[0]) < 1e-12


class TestLineIntersections:
    def test_cross_lines(self, ray_session):
        from whitebox_tools_ray.stages.line_ops import line_intersections, segment_intersections

        # kernel: X crossing at (5, 5)
        xs, ys = segment_intersections(
            np.array([0.0, 10.0]), np.array([0.0, 10.0]),
            np.array([0.0, 10.0]), np.array([10.0, 0.0]),
        )
        assert len(xs) == 1 and xs[0] == 5.0 and ys[0] == 5.0

        mk = lambda rid, pts: {
            "record_id": rid,
            "parts": [0],
            "xs": [p[0] for p in pts],
            "ys": [p[1] for p in pts],
        }
        a = pa.Table.from_pylist([mk(1, [(0.0, 0.0), (10.0, 10.0)])])
        b = pa.Table.from_pylist([mk(7, [(0.0, 10.0), (10.0, 0.0)]), mk(8, [(0.0, 4.0), (10.0, 4.0)])])
        out = line_intersections(rd.from_arrow(a), b).to_pandas().sort_values("record_b")
        assert len(out) == 2
        assert out.iloc[0]["record_b"] == 7 and out.iloc[0]["x"] == 5.0
        assert out.iloc[1]["record_b"] == 8 and out.iloc[1]["x"] == 4.0 and out.iloc[1]["y"] == 4.0

    def test_no_intersection_disjoint(self, ray_session):
        from whitebox_tools_ray.stages.line_ops import line_intersections

        mk = lambda rid, pts: {
            "record_id": rid,
            "parts": [0],
            "xs": [p[0] for p in pts],
            "ys": [p[1] for p in pts],
        }
        a = pa.Table.from_pylist([mk(1, [(0.0, 0.0), (1.0, 0.0)])])
        b = pa.Table.from_pylist([mk(2, [(5.0, 5.0), (6.0, 5.0)])])
        out = line_intersections(rd.from_arrow(a), b).to_pandas()
        assert len(out) == 0


class TestRasterize:
    def test_polygons_to_raster(self, ray_session):
        from whitebox_tools_ray.kernels import codecs as C
        from whitebox_tools_ray.stages.rasterize import polygons_to_raster

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8)
        table = tsrc.generate_tiles(spec, fmt_cycle=("f32",))
        gs = spec.grid_spec()
        # polygon over a known cell block (cells 2..5 x 2..5 by centers)
        x0 = gs.west + 2 * gs.res_x - 1.0
        x1 = gs.west + 6 * gs.res_x + 1.0
        y1 = gs.north - 2 * gs.res_y + 1.0
        y0 = gs.north - 6 * gs.res_y - 1.0
        rec = make_polygon_record(9, [[(x0, y0), (x0, y1), (x1, y1), (x1, y0)]], "sq", 1)
        pt = pa.Table.from_pydict({k: [rec[k]] for k in POLY_SCHEMA.names}, schema=POLY_SCHEMA)
        out = polygons_to_raster(rd.from_arrow(table), pt, spec).to_pandas()
        full = np.full((16, 16), gs.nodata)
        for _, r in out.iterrows():
            g = C.decode_tile(bytes(r["bytes"]), r["fmt"])
            full[r["tile_row"] * 8 : r["tile_row"] * 8 + 8, r["tile_col"] * 8 : r["tile_col"] * 8 + 8] = g
        assert (full[2:6, 2:6] == 9.0).all()
        assert full[0, 0] == np.float32(gs.nodata)
        assert full[7, 7] == np.float32(gs.nodata)

    def test_lines_to_raster(self, ray_session):
        from whitebox_tools_ray.kernels import codecs as C
        from whitebox_tools_ray.stages.rasterize import lines_to_raster

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8)
        table = tsrc.generate_tiles(spec, fmt_cycle=("f32",))
        gs = spec.grid_spec()
        # horizontal line through the centers of row 3, crossing both tiles
        y = float(gs.y_from_row(3))
        line = pa.Table.from_pylist(
            [{"record_id": 5, "parts": [0], "xs": [gs.west + 1.0, gs.east - 1.0], "ys": [y, y]}]
        )
        out = lines_to_raster(rd.from_arrow(table), line, spec).to_pandas()
        full = np.full((16, 16), gs.nodata)
        for _, r in out.iterrows():
            g = C.decode_tile(bytes(r["bytes"]), r["fmt"])
            full[r["tile_row"] * 8 : r["tile_row"] * 8 + 8, r["tile_col"] * 8 : r["tile_col"] * 8 + 8] = g
        assert (full[3, :] == 5.0).all()
        assert (full[5, :] == np.float32(gs.nodata)).all()


class TestRound2SmallTools:
    def test_knn_join(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from whitebox_tools_ray import api

        rng = np.random.RandomState(4)
        rx, ry = rng.uniform(0, 100, 200), rng.uniform(0, 100, 200)
        right = pa.table({"record_id": pa.array(np.arange(200, dtype=np.int64)),
                          "x": pa.array(rx), "y": pa.array(ry)})
        lx, ly = rng.uniform(10, 90, 50), rng.uniform(10, 90, 50)
        left = rd.from_arrow(pa.table({"record_id": pa.array(np.arange(50, dtype=np.int64)),
                                       "x": pa.array(lx), "y": pa.array(ly)}))
        out = api.run("KNearestJoin", left, right, k=3).to_pandas()
        assert len(out) == 150
        # spot-check: rank-1 neighbor equals the numpy argmin
        for lid in range(0, 50, 10):
            d = np.hypot(rx - lx[lid], ry - ly[lid])
            expect = int(np.argmin(d))
            got = out[(out["left_id"] == lid) & (out["rank"] == 1)]["right_id"].iloc[0]
            assert got == expect

    def test_reinitialize_attribute_table(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from whitebox_tools_ray import api
        from whitebox_tools_ray.sources.vectors import POLY_SCHEMA, make_polygon_record

        recs = [make_polygon_record(1, [[(0, 0), (0, 1), (1, 1), (1, 0)]], "a", 3)]
        ds = rd.from_arrow(pa.Table.from_pylist(recs, schema=POLY_SCHEMA))
        out = api.run("ReinitializeAttributeTable", ds).to_pandas()
        assert "name" not in out.columns and "zone" not in out.columns
        assert "record_id" in out.columns and "xs" in out.columns

    def test_raster_to_vector_lines_cross_tile(self, ray_session):
        import pyarrow as pa
        import ray.data as rd
        from whitebox_tools_ray import api
        from whitebox_tools_ray.kernels import codecs
        from whitebox_tools_ray.sources.tiles import SceneSpec

        spec = SceneSpec(tiles_x=2, tiles_y=1, tile_px=8)
        full = np.zeros((8, 16))
        full[:, 8:] = 1.0  # boundary exactly on the tile border
        cols = {"tile_row": [], "tile_col": [], "bytes": [], "fmt": []}
        for tc in range(2):
            cols["tile_row"].append(0)
            cols["tile_col"].append(tc)
            cols["bytes"].append(codecs.encode_tile(full[:, tc * 8 : (tc + 1) * 8], "f32"))
            cols["fmt"].append("f32")
        ds = rd.from_arrow(pa.table({
            "tile_row": pa.array(cols["tile_row"], pa.int32()),
            "tile_col": pa.array(cols["tile_col"], pa.int32()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "fmt": pa.array(cols["fmt"], pa.string())}))
        out = api.run("RasterToVectorLines", ds, spec).to_pandas()
        assert len(out) == 1 and out["n_segments"].iloc[0] == 8
