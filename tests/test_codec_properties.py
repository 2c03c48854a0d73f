"""Property-based codec round-trips (hypothesis): adversarial grids —
odd shapes, extreme magnitudes, nodata speckle, constant sheets —
through every legacy grid writer/reader pair, the GeoTIFF codec and the
LAS codec. Deterministic profile (derandomize) so the suite stays
reproducible. Mirrors the reference's kernel-unit-test strategy
(SURVEY.md §5) with broader input coverage."""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whitebox_tools_ray.kernels import grid_codecs, las_codec, tiff_codec

SET = settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

NOD = -32768.0


@st.composite
def grids(draw, max_dim: int = 23):
    h = draw(st.integers(1, max_dim))
    w = draw(st.integers(1, max_dim))
    seed = draw(st.integers(0, 2**31 - 1))
    scale = draw(st.sampled_from([1.0, 1e-3, 1e4]))
    rng = np.random.RandomState(seed)
    g = (rng.uniform(-1000, 1000, (h, w)) * scale).astype(np.float32).astype(np.float64)
    if draw(st.booleans()):
        g[rng.uniform(0, 1, (h, w)) < 0.1] = NOD
    if draw(st.booleans()) and h * w > 1:
        g[:] = g.flat[0]  # constant sheet
    return g


class TestGridCodecProperties:
    @SET
    @given(g=grids())
    def test_all_grid_formats_round_trip(self, g, tmp_path):
        h, w = g.shape
        meta = grid_codecs._meta(h, w, 0.0, 0.0, w * 90.0, h * 90.0, NOD, "f32")
        exts = {"arcascii": "asc", "arcbinary": "flt", "grass": "grass",
                "whitebox": "dep", "idrisi": "rst", "saga": "sdat",
                "surfer7": "grd", "surfer_ascii": "sgrd.txt"}
        for fmt in grid_codecs._WRITERS:
            path = str(tmp_path / f"g_{fmt}.{exts.get(fmt, 'bin')}")
            grid_codecs._WRITERS[fmt](path, g, dict(meta))
            back, m2 = grid_codecs._READERS[fmt](path)
            assert back.shape == g.shape, fmt
            # nodata survives as the FORMAT's own sentinel (Surfer's
            # blank 1.70141e38 etc. — the reference keeps the file's
            # value and reports it in the header, surfer7_raster.rs:372)
            nod_mask = g == NOD
            assert (np.asarray(back)[nod_mask] == m2["nodata"]).all(), fmt
            valid = ~nod_mask
            # f32 quantization is the only allowed loss; ASCII formats
            # print %.6g-style — compare at their documented precision
            if fmt in ("arcascii", "grass", "surfer_ascii"):
                np.testing.assert_allclose(back[valid], g[valid],
                                           rtol=1e-5, atol=1e-4, err_msg=fmt)
            else:
                np.testing.assert_allclose(
                    back[valid], g.astype(np.float32).astype(np.float64)[valid],
                    rtol=1e-6, atol=1e-6, err_msg=fmt)

    @SET
    @given(g=grids())
    def test_geotiff_round_trip(self, g, tmp_path):
        blob = tiff_codec.write_geotiff(
            np.nan_to_num(g, nan=NOD), nodata=NOD,
            pixel_scale=(90.0, 90.0),
            tiepoint=(0.0, 0.0, 0.0, 0.0, float(g.shape[0]) * 90.0, 0.0),
            dtype="f4",
        )
        out = tiff_codec.parse_geotiff(blob)
        np.testing.assert_allclose(
            out["grid"], g.astype(np.float32).astype(np.float64), rtol=1e-6)
        assert out["meta"]["nodata"] == NOD


class TestLasProperties:
    @SET
    @given(n=st.integers(1, 500), seed=st.integers(0, 2**31 - 1),
           pf=st.sampled_from([0, 1, 2, 3, 6, 7, 8]),
           zipped=st.booleans())
    def test_las_round_trip_formats(self, n, seed, pf, zipped):
        rng = np.random.RandomState(seed)
        cols = {
            "x": rng.uniform(-1e5, 1e5, n).round(3),
            "y": rng.uniform(-1e5, 1e5, n).round(3),
            "z": rng.uniform(-100, 4000, n).round(3),
            "intensity": rng.randint(0, 65535, n),
            "classification": rng.randint(0, 31, n),
        }
        blob = las_codec.write_las(cols, point_format=pf)
        if zipped:
            blob = las_codec.zip_las(blob)
        out = las_codec.parse_las(blob)["columns"]
        assert len(out["x"]) == n
        np.testing.assert_allclose(out["x"], cols["x"], atol=5e-4)
        np.testing.assert_allclose(out["y"], cols["y"], atol=5e-4)
        np.testing.assert_allclose(out["z"], cols["z"], atol=5e-4)
        np.testing.assert_array_equal(out["intensity"], cols["intensity"])
