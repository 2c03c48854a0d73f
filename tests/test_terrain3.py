"""Multiscale terrain family tests."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whitebox_tools_ray.kernels import codecs
from whitebox_tools_ray.sources import tiles as tsrc
from whitebox_tools_ray.stages import terrain3


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
def dem(ray_session):
    spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=4)
    yy, xx = np.meshgrid(np.arange(32.0), np.arange(32.0), indexing="ij")
    # smooth tilt + one sharp bump (high DEV at small scale near bump)
    full = 0.2 * yy + 0.1 * xx + 8.0 * np.exp(-((yy - 16) ** 2 + (xx - 16) ** 2) / 4.0)
    return spec, full, tiles_from_grid(full, spec)


class TestMultiscale:
    def test_max_elev_deviation_layers(self, dem):
        spec, full, ds = dem
        mag, scl = terrain3.max_elevation_deviation(ds, spec, 1, 3)
        m = assemble(mag.to_pandas(), spec)
        s = assemble(scl.to_pandas(), spec)
        assert set(np.unique(s[s != spec.nodata])).issubset({1.0, 2.0, 3.0})
        # bump centre has extreme positive DEV
        assert m[16, 16] > 1.0

    def test_scale_matches_argmax_of_signature(self, dem):
        spec, full, ds = dem
        gs = spec.grid_spec()
        x = gs.west + 16.5 * spec.res
        y = gs.north - 16.5 * spec.res
        sig = terrain3.max_elev_dev_signature(ds, spec, [(x, y, 1)], 1, 3)
        mag, scl = terrain3.max_elevation_deviation(ds, spec, 1, 3)
        s = assemble(scl.to_pandas(), spec)
        best = sig.loc[sig["value"].abs().idxmax(), "scale"]
        assert s[16, 16] == float(best)

    def test_flat_plane_zero_roughness(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=4)
        yy, xx = np.meshgrid(np.arange(32.0), np.arange(32.0), indexing="ij")
        plane = 0.3 * xx + 0.1 * yy
        ds = tiles_from_grid(plane, spec)
        out = assemble(terrain3.spherical_std_dev_of_normals(ds, spec, 2).to_pandas(), spec)
        inner = out[4:-4, 4:-4]
        assert np.allclose(inner, 0.0, atol=1e-4)
        av = assemble(
            terrain3.average_normal_vector_angular_deviation(ds, spec, 2).to_pandas(), spec
        )
        assert np.allclose(av[4:-4, 4:-4], 0.0, atol=1e-3)

    def test_roughness_positive_near_bump(self, dem):
        spec, full, ds = dem
        mag, _ = terrain3.multiscale_roughness(ds, spec, 1, 2)
        m = assemble(mag.to_pandas(), spec)
        assert m[16, 16] >= 0.0
        assert m[14, 14] > 0.3  # bump flank is rough (degrees of normal spread)

    def test_anisotropy_ridge_vs_plane(self, ray_session):
        """A tilted plane has ~zero DEV anisotropy (every directional
        window is centred on its mean); a ridge flank does not."""
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=16, seed=4)
        yy, xx = np.meshgrid(np.arange(32.0), np.arange(32.0), indexing="ij")
        ridge = 5.0 * np.exp(-((xx - 16) ** 2) / 8.0)
        plane = 0.4 * xx + 0.2 * yy
        amr, _ = terrain3.max_anisotropy_dev(tiles_from_grid(ridge, spec), spec, 2, 2)
        amp, _ = terrain3.max_anisotropy_dev(tiles_from_grid(plane, spec), spec, 2, 2)
        r = assemble(amr.to_pandas(), spec)
        p = assemble(amp.to_pandas(), spec)
        assert abs(p[16, 16]) < 1e-6
        assert r[16, 16] > 0.1

    def test_mtpi_packs_rgb(self, dem):
        spec, full, ds = dem
        out = assemble(
            terrain3.multiscale_topographic_position_image(ds, spec, 1, 2, 3).to_pandas(), spec
        )
        v = out[out != spec.nodata]
        assert (v >= 0).all() and (v <= 255255255.0).all()
