"""Round-trip tests for the legacy grid raster codecs
(kernels/grid_codecs.py) and the Dataset-level source/sink
(sources/formats.py read_raster_grid / write_raster_grid)."""
import os

import numpy as np
import pytest

from whitebox_tools_ray.kernels import grid_codecs as gc


@pytest.fixture
def grid_meta():
    rng = np.random.default_rng(11)
    grid = np.round(rng.uniform(0, 100, size=(20, 30)), 3)
    grid[3, 4] = -9999.0
    meta = {
        "rows": 20, "cols": 30, "west": 1000.0, "south": 2000.0,
        "east": 1000.0 + 30 * 5.0, "north": 2000.0 + 20 * 5.0,
        "res_x": 5.0, "res_y": 5.0, "nodata": -9999.0, "data_type": "f32",
    }
    return grid, meta


GEOREF = ("west", "south", "east", "north", "rows", "cols")

CASES = [
    # (name, extension, exact grid round trip?)
    ("arcascii", ".asc", True),
    ("arcbinary", ".flt", False),   # f32 storage
    ("grass", ".asc", True),
    ("whitebox", ".tas", False),    # f32 storage (data_type f32)
    ("idrisi", ".rst", False),      # f32 storage
    ("saga", ".sdat", False),       # f32 storage
    ("surfer7", ".grd", True),      # f64 storage
    ("surfer_ascii", ".grd", True),
]


@pytest.mark.parametrize("fmt,ext,exact", CASES)
def test_round_trip(tmp_path, grid_meta, fmt, ext, exact):
    grid, meta = grid_meta
    if fmt.startswith("surfer"):
        # surfer blanks replace the nodata value on write
        pass
    path = str(tmp_path / f"g{ext}")
    gc._WRITERS[fmt](path, grid, meta)
    back, m2 = gc.read_grid(path)  # exercises extension/content sniffing
    assert (m2["rows"], m2["cols"]) == (20, 30)
    for k in ("west", "south", "east", "north"):
        assert m2[k] == pytest.approx(meta[k], abs=1e-6), k
    expect = grid.copy()
    if fmt.startswith("surfer"):
        expect = np.where(expect == meta["nodata"], gc.SURFER_BLANK, expect)
    if exact:
        np.testing.assert_allclose(back, expect, rtol=0, atol=1e-9)
    else:
        np.testing.assert_allclose(back, expect.astype(np.float32), rtol=1e-6)


def test_dispatch_sniffing(tmp_path, grid_meta):
    grid, meta = grid_meta
    # .asc written as grass vs arc must route to the right parser
    a, g = str(tmp_path / "a.asc"), str(tmp_path / "g.asc")
    gc.write_arc_ascii(a, grid, meta)
    gc.write_grass_ascii(g, grid, meta)
    assert gc.format_of(a, "r") == "arcascii"
    assert gc.format_of(g, "r") == "grass"
    # .grd DSAA vs DSRB
    s7, sa = str(tmp_path / "b.grd"), str(tmp_path / "t.grd")
    gc.write_surfer7(s7, grid, meta)
    gc.write_surfer_ascii(sa, grid, meta)
    assert gc.format_of(s7, "r") == "surfer7"
    assert gc.format_of(sa, "r") == "surfer_ascii"


def test_header_only_meta(tmp_path, grid_meta):
    grid, meta = grid_meta
    for fmt, ext, _ in CASES:
        path = str(tmp_path / f"m_{fmt}{ext}")
        gc._WRITERS[fmt](path, grid, meta)
        m = gc.read_grid_meta(path)
        assert (m["rows"], m["cols"]) == (20, 30), fmt
        assert m["west"] == pytest.approx(1000.0), fmt
        assert m["north"] == pytest.approx(2100.0), fmt


def test_arc_ascii_center_registration(tmp_path):
    # xllcenter/yllcenter shift to the outer corner (spec semantics;
    # the reference's variable swap is documented in the module docstring)
    p = str(tmp_path / "c.asc")
    with open(p, "w") as f:
        f.write("ncols 4\nnrows 2\nxllcenter 10.0\nyllcenter 20.0\n")
        f.write("cellsize 2.0\nNODATA_value -1\n")
        f.write("1 2 3 4\n5 6 7 8\n")
    grid, m = gc.read_grid(p)
    assert m["west"] == 9.0 and m["south"] == 19.0
    assert m["east"] == 17.0 and m["north"] == 23.0
    assert grid[0, 0] == 1 and grid[1, 3] == 8


def test_saga_bottom_up_and_zfactor(tmp_path, grid_meta):
    grid, meta = grid_meta
    path = str(tmp_path / "z.sdat")
    gc.write_saga(path, grid, meta)
    # hand-check the raw layout: first row of .sdat = LAST grid row
    raw = np.fromfile(path, dtype="<f4").reshape(20, 30)
    np.testing.assert_allclose(raw[0], grid[-1].astype(np.float32))
    # z_factor scales values on read
    sgrd = str(tmp_path / "z.sgrd")
    with open(sgrd) as f:
        text = f.read()
    with open(sgrd, "w") as f:
        f.write(text.replace("Z_FACTOR\t= 1.000000", "Z_FACTOR\t= 2.0"))
    back, _ = gc.read_grid(path)
    np.testing.assert_allclose(
        back, (grid.astype(np.float32) * 2.0).astype(np.float64), rtol=1e-6
    )


def test_dataset_source_sink(ray_session, tmp_path, grid_meta):
    """read_raster_grid -> tiles -> write_raster_grid across formats."""
    from whitebox_tools_ray.sources import formats
    from whitebox_tools_ray.sources.tiles import SceneSpec

    spec = SceneSpec(tiles_x=2, tiles_y=2, tile_px=16)
    rr, cc = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    grid = ((rr * 31 + cc * 17) % 97).astype(np.float64)
    gs = spec.grid_spec()
    meta = {
        "rows": 32, "cols": 32, "west": gs.west, "south": gs.south,
        "east": gs.east, "north": gs.north, "res_x": spec.res,
        "res_y": spec.res, "nodata": spec.nodata, "data_type": "f32",
    }
    src = str(tmp_path / "scene.dep")
    gc.write_whitebox(src, grid, meta)

    ds, metas = formats.read_raster_grid(src, tile_px=16)
    assert metas[0]["rows"] == 32 and metas[0]["cols"] == 32
    tiles = ds.to_pandas()
    assert len(tiles) == 4

    # convert: whitebox -> arc ascii (ConvertRasterFormat end-to-end)
    ds2, _ = formats.read_raster_grid(src, tile_px=16)
    out = str(tmp_path / "scene.asc")
    formats.write_raster_grid(ds2, spec, out)
    back, m2 = gc.read_grid(out)
    np.testing.assert_allclose(back, grid.astype(np.float32), rtol=1e-6)
    assert m2["west"] == pytest.approx(gs.west)
