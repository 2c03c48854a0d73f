"""Round-trip + structure tests for the front-door format codecs
(LAS / Shapefile / GeoTIFF) and their Dataset-level sources."""

import os

import numpy as np
import pytest

from whitebox_tools_ray.kernels import las_codec, shp_codec, tiff_codec


class TestLasCodec:
    def _cloud(self, n=5000, seed=3):
        rng = np.random.default_rng(seed)
        return {
            "x": rng.uniform(1000, 2000, n).round(3),
            "y": rng.uniform(5000, 6000, n).round(3),
            "z": rng.uniform(0, 100, n).round(3),
            "intensity": rng.integers(0, 65535, n),
            "return_num": rng.integers(1, 5, n),
            "num_returns": rng.integers(1, 5, n),
            "classification": rng.integers(0, 20, n),
            "scan_angle": rng.integers(-90, 90, n),
            "pt_src_id": rng.integers(0, 100, n),
            "gps_time": rng.uniform(0, 1e6, n),
        }

    @pytest.mark.parametrize("fmt", [0, 1, 2, 3])
    def test_round_trip(self, fmt):
        cols = self._cloud()
        if fmt in (2, 3):
            cols["red"] = cols["intensity"]
            cols["green"] = cols["intensity"] // 2
            cols["blue"] = cols["intensity"] // 3
        blob = las_codec.write_las(cols, point_format=fmt)
        parsed = las_codec.parse_las(blob)
        assert parsed["meta"]["point_format"] == fmt
        assert parsed["meta"]["n_points"] == 5000
        got = parsed["columns"]
        # mm scale → coordinates exact to 0.5 mm
        np.testing.assert_allclose(got["x"], cols["x"], atol=5e-4)
        np.testing.assert_allclose(got["y"], cols["y"], atol=5e-4)
        np.testing.assert_allclose(got["z"], cols["z"], atol=5e-4)
        np.testing.assert_array_equal(got["intensity"], cols["intensity"])
        np.testing.assert_array_equal(got["return_num"], cols["return_num"])
        np.testing.assert_array_equal(got["num_returns"], cols["num_returns"])
        np.testing.assert_array_equal(got["classification"], cols["classification"])
        if fmt in (1, 3):
            np.testing.assert_allclose(got["gps_time"], cols["gps_time"])
        if fmt in (2, 3):
            np.testing.assert_array_equal(got["red"], cols["red"])

    @pytest.mark.parametrize("fmt", [6, 7, 8])
    def test_extended_round_trip(self, fmt):
        """LAS 1.4 extended formats write as 375-byte-header files with
        u64 counts, 4+4-bit return packing and i16 scan angles."""
        cols = self._cloud()
        rng = np.random.default_rng(9)
        cols["return_num"] = rng.integers(1, 16, 5000)
        cols["num_returns"] = rng.integers(1, 16, 5000)
        cols["scan_angle"] = rng.integers(-30000, 30000, 5000)
        if fmt in (7, 8):
            cols["red"] = cols["intensity"]
            cols["green"] = cols["intensity"] // 2
            cols["blue"] = cols["intensity"] // 3
        if fmt == 8:
            cols["nir"] = cols["intensity"] // 4
        blob = las_codec.write_las(cols, point_format=fmt)
        assert blob[24] == 1 and blob[25] == 4  # LAS 1.4
        parsed = las_codec.parse_las(blob)
        assert parsed["meta"]["point_format"] == fmt
        assert parsed["meta"]["n_points"] == 5000
        got = parsed["columns"]
        np.testing.assert_allclose(got["x"], cols["x"], atol=5e-4)
        np.testing.assert_allclose(got["z"], cols["z"], atol=5e-4)
        np.testing.assert_array_equal(got["return_num"], cols["return_num"])
        np.testing.assert_array_equal(got["num_returns"], cols["num_returns"])
        np.testing.assert_array_equal(got["scan_angle"], cols["scan_angle"])
        np.testing.assert_allclose(got["gps_time"], cols["gps_time"])
        if fmt in (7, 8):
            np.testing.assert_array_equal(got["red"], cols["red"])
        if fmt == 8:
            np.testing.assert_array_equal(got["nir"], cols["nir"])

    def test_extra_bytes_stride(self):
        """Files with extra per-point bytes parse via the record stride."""
        cols = self._cloud(100)
        blob = bytearray(las_codec.write_las(cols, point_format=0))
        # grow each record by 4 trailing bytes
        import struct

        hdr = 227
        rec = 20
        n = 100
        out = bytearray(blob[:hdr])
        struct.pack_into("<H", out, 105, rec + 4)
        for i in range(n):
            out += blob[hdr + i * rec : hdr + (i + 1) * rec] + b"\x00" * 4
        parsed = las_codec.parse_las(bytes(out))
        np.testing.assert_allclose(parsed["columns"]["x"], cols["x"], atol=5e-4)

    def test_laz_rejected(self):
        cols = self._cloud(10)
        blob = bytearray(las_codec.write_las(cols, point_format=0))
        blob[104] = 128  # LAZ marker bit
        with pytest.raises(NotImplementedError):
            las_codec.parse_las(bytes(blob))


class TestShpCodec:
    def test_polygon_round_trip(self):
        recs = [
            {
                "xs": np.array([0.0, 10.0, 10.0, 0.0, 0.0, 2.0, 4.0, 3.0, 2.0]),
                "ys": np.array([0.0, 0.0, 10.0, 10.0, 0.0, 2.0, 2.0, 4.0, 2.0]),
                "parts": np.array([0, 5], dtype=np.int32),  # outer ring + hole
            },
            {
                "xs": np.array([20.0, 30.0, 25.0, 20.0]),
                "ys": np.array([20.0, 20.0, 30.0, 20.0]),
                "parts": np.array([0], dtype=np.int32),
            },
        ]
        blob = shp_codec.write_shp(recs, shp_codec.SHAPE_POLYGON)
        parsed = shp_codec.parse_shp(blob)
        assert parsed["shape_type"] == shp_codec.SHAPE_POLYGON
        assert len(parsed["records"]) == 2
        r0 = parsed["records"][0]
        assert r0["record_id"] == 1
        np.testing.assert_array_equal(r0["parts"], [0, 5])
        np.testing.assert_allclose(r0["xs"], recs[0]["xs"])
        np.testing.assert_allclose(r0["ys"], recs[0]["ys"])
        assert r0["bbox"] == (0.0, 0.0, 10.0, 10.0)

    def test_point_and_dbf_round_trip(self):
        recs = [{"xs": [1.5], "ys": [2.5]}, {"xs": [3.0], "ys": [4.0]}]
        blob = shp_codec.write_shp(recs, shp_codec.SHAPE_POINT)
        parsed = shp_codec.parse_shp(blob)
        assert [r["xs"][0] for r in parsed["records"]] == [1.5, 3.0]
        attrs = {"name": ["alpha", "beta"], "value": [12.5, -3.25], "rank": [1, 2]}
        dblob = shp_codec.write_dbf(attrs, 2)
        back = shp_codec.parse_dbf(dblob)
        assert back["columns"]["name"] == ["alpha", "beta"]
        assert back["columns"]["rank"] == [1, 2]
        np.testing.assert_allclose(back["columns"]["value"], [12.5, -3.25])


class TestTiffCodec:
    @pytest.mark.parametrize("dtype", ["f4", "f8", "i2", "u1"])
    @pytest.mark.parametrize("compress", [True, False])
    def test_round_trip(self, dtype, compress):
        rng = np.random.default_rng(11)
        if dtype in ("f4", "f8"):
            grid = rng.uniform(-100, 4000, (97, 130))  # non-multiple of strip
            if dtype == "f4":
                grid = grid.astype(np.float32).astype(np.float64)
        elif dtype == "i2":
            grid = rng.integers(-3000, 3000, (97, 130)).astype(np.float64)
        else:
            grid = rng.integers(0, 255, (97, 130)).astype(np.float64)
        blob = tiff_codec.write_geotiff(
            grid, nodata=-32768.0, pixel_scale=(30.0, 30.0),
            tiepoint=(0, 0, 0, 500000.0, 4600000.0, 0), dtype=dtype, compress=compress,
        )
        parsed = tiff_codec.parse_geotiff(blob)
        np.testing.assert_allclose(parsed["grid"], grid)
        m = parsed["meta"]
        assert m["nodata"] == -32768.0
        assert m["pixel_scale"] == (30.0, 30.0)
        assert m["tiepoint"][3:5] == (500000.0, 4600000.0)

    def test_big_endian_and_tiled_rejected_gracefully(self):
        with pytest.raises(ValueError):
            tiff_codec.parse_geotiff(b"XX\x00\x00")
        # BigTIFF now PARSES (round-trip pinned in test_tiff_lzw); a
        # malformed BigTIFF header (offset size != 8) still errors clearly
        with pytest.raises(ValueError, match="BigTIFF"):
            tiff_codec.parse_geotiff(b"II\x2b\x00\x04\x00\x00\x00" + b"\x00" * 12)


class TestFormatSources:
    def test_las_dataset_round_trip(self, ray_session, tmp_path):
        from whitebox_tools_ray.sources import formats

        rng = np.random.default_rng(5)
        n = 4000
        cols = {
            "x": rng.uniform(0, 100, n).round(3),
            "y": rng.uniform(0, 100, n).round(3),
            "z": rng.uniform(0, 50, n).round(3),
            "classification": rng.integers(0, 5, n),
        }
        for part in range(2):
            sl = slice(part * 2000, (part + 1) * 2000)
            blob = las_codec.write_las({k: v[sl] for k, v in cols.items()}, point_format=1)
            (tmp_path / f"tile{part}.las").write_bytes(blob)
        ds = formats.read_las(str(tmp_path))
        df = ds.to_pandas()
        assert len(df) == n
        assert set(df["source_file"]) == {"tile0.las", "tile1.las"}
        assert abs(sorted(df["x"])[0] - sorted(cols["x"])[0]) < 5e-4

    def test_zipped_las_round_trip(self, ray_session, tmp_path):
        # zipped-LAS (las.rs:486-534): one-member DEFLATE .zip archive;
        # parse_las sniffs PK and decompresses, reader matches plain .las
        from whitebox_tools_ray.sources import formats

        rng = np.random.default_rng(6)
        n = 3000
        cols = {
            "x": rng.uniform(0, 100, n).round(3),
            "y": rng.uniform(0, 100, n).round(3),
            "z": rng.uniform(0, 50, n).round(3),
        }
        blob = las_codec.write_las(cols, point_format=0)
        (tmp_path / "cloud.las.zip").write_bytes(las_codec.zip_las(blob, "cloud.las"))
        df = formats.read_las(str(tmp_path)).to_pandas()
        assert len(df) == n
        np.testing.assert_allclose(np.sort(df["x"]), np.sort(cols["x"]), atol=5e-4)
        # non-.las member must be rejected (las.rs:527-531)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="las"):
            las_codec.parse_las(las_codec.zip_las(blob, "cloud.txt"))

    def test_shapefile_dataset(self, ray_session, tmp_path):
        from whitebox_tools_ray.sources import formats

        recs = [
            {"xs": np.array([0.0, 5.0, 5.0, 0.0, 0.0]), "ys": np.array([0.0, 0.0, 5.0, 5.0, 0.0]),
             "parts": np.array([0], dtype=np.int32)},
            {"xs": np.array([10.0, 15.0, 12.0, 10.0]), "ys": np.array([0.0, 0.0, 5.0, 0.0]),
             "parts": np.array([0], dtype=np.int32)},
        ]
        shp = str(tmp_path / "zones.shp")
        formats.write_shapefile(recs, shp, shp_codec.SHAPE_POLYGON,
                                attributes={"zone": [7, 9], "name": ["a", "b"]})
        df = formats.read_shapefile(shp).to_pandas()
        assert list(df["record_id"]) == [1, 2]
        assert list(df["zone"]) == [7, 9]
        assert list(df["name"]) == ["a", "b"]
        assert df["xs"].iloc[0][1] == 5.0
        assert df["x_max"].iloc[0] == 5.0

    def test_geotiff_tiles_round_trip(self, ray_session, tmp_path):
        from whitebox_tools_ray.sources import formats
        from whitebox_tools_ray.sources.tiles import SceneSpec

        spec = SceneSpec(tiles_x=3, tiles_y=2, tile_px=16, seed=8)
        rng = np.random.default_rng(8)
        grid = rng.uniform(0, 1000, (spec.rows, spec.columns))
        tif = str(tmp_path / "dem.tif")
        with open(tif, "wb") as f:
            f.write(
                tiff_codec.write_geotiff(grid, nodata=spec.nodata,
                                         pixel_scale=(spec.res, spec.res), dtype="f8")
            )
        ds, metas = formats.read_geotiff_tiles(tif, tile_px=16)
        assert metas[0]["width"] == spec.columns and metas[0]["nodata"] == spec.nodata
        df = ds.to_pandas()
        assert len(df) == 6
        from whitebox_tools_ray.kernels import codecs

        got = np.full((spec.rows, spec.columns), np.nan)
        for _, row in df.iterrows():
            t = codecs.decode_tile(bytes(row["bytes"]), row["fmt"])
            r0, c0 = int(row["tile_row"]) * 16, int(row["tile_col"]) * 16
            got[r0 : r0 + 16, c0 : c0 + 16] = t
        np.testing.assert_allclose(got, np.float32(grid), rtol=1e-6)
        # full circle: tile table → geotiff → grid
        out_tif = str(tmp_path / "out.tif")
        formats.write_geotiff(ds.drop_columns(["file_idx"]), spec, out_tif, compress=True)
        back = tiff_codec.parse_geotiff(open(out_tif, "rb").read())
        np.testing.assert_allclose(back["grid"], np.float32(grid), rtol=1e-6)


class TestLas14Extended:
    """LAS 1.4 extended point formats 6-10 (read-only): hand-built
    375-byte header + raw records, including extra bytes via stride."""

    def _build(self, point_format: int, record_len: int, recs: bytes,
               n: int) -> bytes:
        import struct

        hdr = bytearray(375)
        hdr[0:4] = b"LASF"
        hdr[24] = 1  # version 1.4
        hdr[25] = 4
        struct.pack_into("<H", hdr, 94, 375)          # header size
        struct.pack_into("<I", hdr, 96, 375)          # offset to points
        hdr[104] = point_format
        struct.pack_into("<H", hdr, 105, record_len)
        struct.pack_into("<I", hdr, 107, 0)           # legacy count = 0
        struct.pack_into("<3d", hdr, 131, 0.01, 0.01, 0.01)
        struct.pack_into("<3d", hdr, 155, 100.0, 200.0, 0.0)
        struct.pack_into("<Q", hdr, 247, n)           # 64-bit count
        return bytes(hdr) + recs

    def test_format6_and_extra_bytes(self):
        import struct

        recs = b""
        for i in range(4):
            recs += struct.pack(
                "<3i H B B B B h H d",
                1000 * i, 2000 * i, 300 * i,         # X Y Z
                i * 7,                                # intensity
                (3 << 4) | (i % 3 + 1),               # returns: num=3, ret=i%3+1
                0,                                    # flags
                5 + i,                                # classification
                9,                                    # user_data
                -15000 + i,                           # scan_angle (i16!)
                42,                                   # pt_src_id
                1e9 + i,                              # gps_time
            ) + b"\xee\xee"                           # 2 extra bytes
        blob = self._build(6, 32, recs, 4)
        p = las_codec.parse_las(blob)
        cols = p["columns"]
        assert p["meta"]["point_format"] == 6 and p["meta"]["n_points"] == 4
        np.testing.assert_allclose(cols["x"], 100.0 + 0.01 * 1000 * np.arange(4))
        np.testing.assert_array_equal(cols["return_num"], [1, 2, 3, 1])
        np.testing.assert_array_equal(cols["num_returns"], [3, 3, 3, 3])
        np.testing.assert_array_equal(cols["scan_angle"], -15000 + np.arange(4))
        np.testing.assert_array_equal(cols["classification"], [5, 6, 7, 8])
        np.testing.assert_allclose(cols["gps_time"], 1e9 + np.arange(4))

    def test_format8_rgb_nir(self):
        import struct

        recs = struct.pack(
            "<3i H B B B B h H d 4H",
            100, 200, 300, 55, 0x21, 0, 2, 0, 900, 7, 5.5,
            11, 22, 33, 44,  # R G B NIR
        )
        blob = self._build(8, 38, recs, 1)
        cols = las_codec.parse_las(blob)["columns"]
        assert cols["red"][0] == 11 and cols["blue"][0] == 33
        assert cols["nir"][0] == 44
        assert cols["return_num"][0] == 1 and cols["num_returns"][0] == 2

    def test_write_waveform_rejected(self):
        """Formats 9/10 stay read-only: no waveform packets to serialize."""
        with pytest.raises(NotImplementedError):
            las_codec.write_las(
                {"x": np.zeros(1), "y": np.zeros(1), "z": np.zeros(1)},
                point_format=9,
            )


class TestGeoTiffRgbWrite:
    def _composite(self, h=70, w=50, seed=5):
        rng = np.random.default_rng(seed)
        r = rng.integers(0, 256, (h, w), dtype=np.int64)
        g = rng.integers(0, 256, (h, w), dtype=np.int64)
        b = rng.integers(0, 256, (h, w), dtype=np.int64)
        a = rng.integers(0, 256, (h, w), dtype=np.int64)
        return ((a << 24) | (b << 16) | (g << 8) | r).astype(np.float64)

    def test_rgba_round_trip(self):
        comp = self._composite()
        blob = tiff_codec.write_geotiff(comp, dtype="rgba8", pixel_scale=(30.0, 30.0))
        out = tiff_codec.parse_geotiff(blob)
        assert out["meta"]["samples_per_pixel"] == 4
        np.testing.assert_array_equal(out["grid"], comp)
        assert out["meta"]["pixel_scale"] == (30.0, 30.0)

    def test_rgb_round_trip_opaque_alpha(self):
        comp = self._composite()
        blob = tiff_codec.write_geotiff(comp, dtype="rgb8", compress=False)
        out = tiff_codec.parse_geotiff(blob)
        assert out["meta"]["samples_per_pixel"] == 3
        # rgb8 drops the alpha channel; the reader packs a=255
        expect = (np.float64(0xFF000000) +
                  (comp.astype(np.int64) & 0x00FFFFFF).astype(np.float64))
        np.testing.assert_array_equal(out["grid"], expect)
