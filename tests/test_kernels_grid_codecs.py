"""Grid transforms, tile-assignment rule, cell indexes, codecs, phash."""

import numpy as np
import pytest

from whitebox_tools_ray.kernels import cells, codecs, phash
from whitebox_tools_ray.kernels.grid import GridSpec, TileGrid, rebase_tile_names
from whitebox_tools_ray.sources import tiles as tsrc


class TestGridSpec:
    # raster/mod.rs:620-641 invariants
    def test_roundtrip_cell_center(self):
        gs = GridSpec(rows=188, columns=237)
        cols = np.arange(0, 237)
        xs = gs.x_from_col(cols)
        assert np.array_equal(gs.col_from_x(xs), cols)
        rows = np.arange(0, 188)
        ys = gs.y_from_row(rows)
        assert np.array_equal(gs.row_from_y(ys), rows)

    def test_floor_boundary(self):
        gs = GridSpec(west=0.0, north=100.0, res_x=10.0, res_y=10.0, rows=10, columns=10)
        # x exactly on a cell edge belongs to the right cell (floor)
        assert gs.col_from_x(10.0) == 1
        assert gs.col_from_x(9.999999) == 0
        # y exactly on an edge: row = floor((north - y)/res)
        assert gs.row_from_y(90.0) == 1
        assert gs.row_from_y(90.0000001) == 0


class TestTileGrid:
    # lidar_tile.rs:257-281
    def test_assignment_rule(self):
        tg = TileGrid.from_extent(3.0, 97.0, 3.0, 97.0, 25.0, 25.0, origin_x=0.0, origin_y=0.0)
        assert tg.start_x_grid == 0.0 and tg.cols == 4 and tg.rows == 4
        x = np.array([3.0, 24.999, 25.0, 96.0])
        y = np.array([3.0, 3.0, 3.0, 96.0])
        row, col, tid = tg.assign(x, y)
        assert col.tolist() == [0, 0, 1, 3]
        assert row.tolist() == [0, 0, 0, 3]
        assert tid.tolist() == [0, 0, 1, 15]

    def test_negative_origin_offset(self):
        # grid anchored away from data: start grid lines shift but ids re-base
        tg = TileGrid.from_extent(1003.0, 1097.0, 503.0, 597.0, 25.0, 25.0, origin_x=0.0, origin_y=0.0)
        row, col, tid = tg.assign(np.array([1003.0]), np.array([503.0]))
        assert row[0] == 0 and col[0] == 0 and tid[0] == 0

    def test_tile_cap(self):
        with pytest.raises(ValueError):
            TileGrid.from_extent(0.0, 1e6, 0.0, 1e6, 1.0, 1.0)

    def test_rebase(self):
        rows = np.array([2, 3, 5])
        cols = np.array([7, 9, 7])
        nr, nc = rebase_tile_names(rows, cols)
        assert nr.tolist() == [1, 2, 4]
        assert nc.tolist() == [1, 3, 1]


class TestCells:
    def test_morton_known(self):
        # x bits in even positions, y bits in odd: y2x2 y1x1 y0x0 = 01 10 11
        assert cells.morton_interleave(np.array([0b101]), np.array([0b011]))[0] == 0b011011

    def test_quad_parent_prefix(self):
        x = np.array([123456.7])
        y = np.array([234567.8])
        c10 = cells.quad_cell(x, y, 10)
        c9 = cells.quad_cell(x, y, 9)
        assert cells.quad_parent(c10)[0] == c9[0]

    def test_quad_sql_equivalence(self):
        import duckdb

        rng = np.random.RandomState(3)
        x = rng.uniform(0, 2**23, 1000)
        y = rng.uniform(0, 2**23, 1000)
        for level in (5, 9, 12):
            expect = cells.quad_cell(x, y, level)
            sql = cells.quad_cell_sql("x", "y", level)
            con = duckdb.connect()
            con.register("pts", __import__("pandas").DataFrame({"x": x, "y": y}))
            got = con.execute(f"SELECT {sql} AS c FROM pts").fetchnumpy()["c"]
            assert np.array_equal(got.astype(np.int64), expect)

    def test_hex_roundtrip_center(self):
        rng = np.random.RandomState(4)
        x = rng.uniform(-1e5, 1e5, 2000)
        y = rng.uniform(-1e5, 1e5, 2000)
        q, r = cells.hex_cell(x, y, 7)
        cx, cy = cells.hex_cell_center(q, r, 7)
        # every point is within one circumradius of its assigned center
        size = cells._hex_size(7)
        d = np.hypot(x - cx, y - cy)
        assert np.all(d <= size * 1.0001)

    def test_pack_hex_unique(self):
        q = np.array([-5, 0, 5])
        r = np.array([3, 0, -3])
        packed = cells.pack_hex(q, r, 8)
        assert len(set(packed.tolist())) == 3


class TestCodecs:
    def test_png_roundtrip_u8(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (33, 47), dtype=np.uint8)
        assert np.array_equal(codecs.png_decode(codecs.png_encode(img)), img)

    def test_png_roundtrip_u16(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 65536, (16, 21), dtype=np.uint16)
        assert np.array_equal(codecs.png_decode(codecs.png_encode(img)), img)

    def test_png_roundtrip_rgb(self):
        rng = np.random.RandomState(2)
        img = rng.randint(0, 256, (8, 9, 3), dtype=np.uint8)
        assert np.array_equal(codecs.png_decode(codecs.png_encode(img)), img)

    def test_f32_exact(self):
        grid = np.linspace(-500, 1500, 64 * 64).reshape(64, 64)
        out = codecs.decode_tile(codecs.encode_tile(grid.astype(np.float32).astype(np.float64), "f32"), "f32")
        assert np.array_equal(out, grid.astype(np.float32).astype(np.float64))

    def test_q16_psnr(self):
        rng = np.random.RandomState(5)
        grid = rng.uniform(0, 1000, (64, 64))
        out = codecs.decode_tile(codecs.encode_tile(grid, "q16"), "q16")
        assert codecs.psnr(grid, out) >= 40.0

    def test_png_float_psnr(self):
        rng = np.random.RandomState(6)
        grid = rng.uniform(-100, 900, (32, 32))
        out = codecs.decode_tile(codecs.encode_tile(grid, "png"), "png")
        assert codecs.psnr(grid, out) >= 40.0

    def test_jpeg_tile_round_trip(self):
        # jpeg is the lossy tile tier (pure-numpy baseline codec)
        rng = np.random.default_rng(9)
        g = rng.uniform(-20, 80, (24, 24))
        back = codecs.decode_tile(codecs.encode_tile(g, "jpeg"), "jpeg")
        assert back.shape == g.shape
        assert np.abs(back - g).max() < (g.max() - g.min()) * 0.06


class TestPhash:
    def test_deterministic_and_robust(self):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=32)
        g0 = spec.tile_grid(0, 0)
        h1 = phash.phash64(g0)
        h2 = phash.phash64(g0.copy())
        assert h1 == h2
        # q16 quantization shouldn't move the hash far
        g0q = codecs.decode_tile(codecs.encode_tile(g0, "q16"), "q16")
        assert phash.hamming64(h1, phash.phash64(g0q)) <= 4
        # a different tile should differ
        g1 = spec.tile_grid(1, 1)
        assert phash.hamming64(h1, phash.phash64(g1)) > 4


class TestTileTable:
    def test_generate_and_assemble(self):
        spec = tsrc.SceneSpec(tiles_x=4, tiles_y=3, tile_px=16)
        table = tsrc.generate_tiles(spec)
        assert table.num_rows == 12
        assert table.schema.names == tsrc.TILE_SCHEMA.names
        full = tsrc.assemble_scene(table, spec)
        # lossless f32 tiles match the field exactly (float32 precision)
        ref = spec.field(np.arange(spec.rows)[:, None], np.arange(spec.columns)[None, :])
        assert codecs.psnr(ref, full) >= 40.0

    def test_captions(self):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8)
        t = tsrc.generate_tiles(spec)
        caps = t.column("caption").to_pylist()
        assert caps[0] == "tile r0 c0 of scene 0"
        assert caps[-1] == "tile r1 c1 of scene 0"
