"""Final coverage batch: image stragglers, downslope index, isobasins —
plus the registry-complete invariant (every active reference tool name
is registered)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whitebox_tools_ray.kernels import codecs
from whitebox_tools_ray.sources import tiles as tsrc
from whitebox_tools_ray.stages import hydro2, image2


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


class TestRegistryComplete:
    def test_every_reference_tool_registered(self, ray_session):
        import re

        src = open("/root/reference/src/tools/mod.rs").read()
        lines = [l for l in src.splitlines() if "tool_names.push" in l]
        active = [
            re.search(r'"([^"]+)"', l).group(1)
            for l in lines
            if not l.strip().startswith("//")
        ]
        from whitebox_tools_ray import api

        reg = set(api.list_tools())
        missing = [n for n in active if n not in reg]
        assert missing == [], f"unregistered reference tools: {missing}"


class TestImageStragglers:
    def test_change_vector_analysis(self, ray_session):
        df = pd.DataFrame({"b1_t1": [1.0, 5.0], "b2_t1": [2.0, 5.0],
                           "b1_t2": [4.0, 4.0], "b2_t2": [6.0, 5.0]})
        out = image2.change_vector_analysis(
            rd.from_pandas(df), ["b1_t1", "b2_t1"], ["b1_t2", "b2_t2"]
        ).to_pandas()
        assert out["cva_magnitude"].iloc[0] == pytest.approx(5.0)  # 3-4-5
        assert out["cva_sector"].iloc[0] == 0  # both increased
        assert out["cva_sector"].iloc[1] == 1  # band 1 decreased

    def test_vignetting_brightens_corners(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        full = np.full((16, 16), 100.0)
        out = assemble(image2.correct_vignetting(tiles_from_grid(full, spec), spec).to_pandas(), spec)
        assert out[0, 0] > out[8, 8] >= 100.0 - 1e-9

    def test_brovey_sharpening(self, ray_session):
        df = pd.DataFrame({"r": [30.0], "g": [60.0], "b": [90.0], "pan": [90.0]})
        out = image2.panchromatic_sharpening(rd.from_pandas(df)).to_pandas()
        # ratio = 3*90/180 = 1.5
        assert out["sharp_r"].iloc[0] == pytest.approx(45.0)
        assert out["sharp_b"].iloc[0] == pytest.approx(135.0)

    def test_stack_profile(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        gs = spec.grid_spec()
        layers = [tiles_from_grid(np.full((16, 16), float(v)), spec) for v in (7, 11)]
        pts = [(gs.west + 3.5 * spec.res, gs.north - 3.5 * spec.res, 1)]
        out = image2.image_stack_profile(layers, spec, pts)
        assert out["value"].tolist() == [7.0, 11.0]

    def test_modified_kmeans_merges_small(self, ray_session):
        rng = np.random.default_rng(2)
        big1 = rng.normal((0, 0), 0.1, (60, 2))
        big2 = rng.normal((10, 10), 0.1, (60, 2))
        df = pd.DataFrame({"embedding": [list(v) for v in np.vstack([big1, big2])]})
        out, cents = image2.modified_k_means(
            rd.from_pandas(df), k=6, min_class_size=15, max_iters=8
        )
        pdf = out.to_pandas()
        counts = pdf["cluster"].value_counts()
        assert (counts >= 15).all()


class TestLastHydro:
    def test_downslope_index_east_plane(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        yy, xx = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
        full = 100.0 - xx  # 1 unit drop per cell east
        out = assemble(
            hydro2.downslope_index(tiles_from_grid(full, spec), spec, drop=2.0, num_workers=2).to_pandas(),
            spec,
        )
        # 2 units of drop take 2 cells: angle = atan(2 / 2res)
        want = np.degrees(np.arctan2(2.0, 2.0 * spec.res))
        assert out[7, 5] == pytest.approx(want, rel=1e-6)

    def test_isobasins_runs_and_labels(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        yy, xx = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
        full = 100.0 - xx - 0.01 * yy
        out = assemble(hydro2.isobasins(tiles_from_grid(full, spec), spec, 16, 2).to_pandas(), spec)
        labs = np.unique(out[out != spec.nodata])
        assert len(labs) >= 2

    def test_impoundment_volume_on_cone(self, ray_session):
        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        yy, xx = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
        # shallow cone: every cell below pit + dam height (the regime
        # where the two-accumulation approximation is exact)
        full = 0.1 * np.hypot(yy - 7.6, xx - 7.4)
        out = assemble(
            hydro2.impoundment_size_index(tiles_from_grid(full, spec), spec, 2.0, 2).to_pandas(),
            spec,
        )
        # the pit impounds the most; rim cells the least
        pit = np.unravel_index(np.argmin(full), full.shape)
        assert out[pit] == out[out != spec.nodata].max()


class TestVisibilityKernels:
    def test_directional_relief_tilt(self, ray_session):
        from whitebox_tools_ray.stages.visibility import directional_relief

        yy, xx = np.meshgrid(np.arange(16.0), np.arange(16.0), indexing="ij")
        g = xx.astype(np.float64)  # rises east
        out = directional_relief(g, -32768.0, 90.0, 8.0, 1.0)
        # looking east from col 4: mean of higher cells > own z
        assert out[8, 4] > 0
        assert out[8, 12] > 0 or np.isnan(out[8, 12]) is False

    def test_visibility_index_range(self, ray_session):
        from whitebox_tools_ray.stages.visibility import visibility_index

        rng = np.random.default_rng(3)
        g = rng.uniform(0, 2, (16, 16))
        out = visibility_index(g, -32768.0, station_step=8)
        assert ((out >= 0) & (out <= 1)).all()
