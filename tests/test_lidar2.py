"""LiDAR neighbourhood family: halo-cell engine vs brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from whitebox_tools_ray.stages import lidar2


@pytest.fixture(scope="module")
def cloud(ray_session):
    """A gently sloping ground plane + a few high outliers + a 'roof'."""
    rng = np.random.default_rng(17)
    n = 600
    x = rng.uniform(0, 40, n)
    y = rng.uniform(0, 40, n)
    z = 0.02 * x + 0.01 * y + rng.normal(0, 0.02, n)
    # the roof occludes the ground beneath it — no returns there
    under_roof = (x >= 17.5) & (x <= 30.5) & (y >= 17.5) & (y <= 30.5)
    x, y, z = x[~under_roof], y[~under_roof], z[~under_roof]
    # outliers
    x = np.append(x, [10.0, 30.0])
    y = np.append(y, [10.0, 30.0])
    z = np.append(z, [80.0, -70.0])
    # a flat roof 5m above ground over [18,30]x[18,30]
    rx = rng.uniform(18, 30, 240)
    ry = rng.uniform(18, 30, 240)
    rz = np.full(240, 5.5)
    x = np.append(x, rx)
    y = np.append(y, ry)
    z = np.append(z, rz)
    df = pd.DataFrame({"x": x, "y": y, "z": z, "pid": np.arange(len(x), dtype=np.int64)})
    df["flightline"] = (df["pid"] % 2).astype(np.int64)
    df["scan_angle"] = (df["pid"] % 21 - 10).astype(np.int64)
    df["class_"] = np.int32(0)
    return df, rd.from_pandas(df).repartition(4)


class TestOutliers:
    def test_outliers_removed_ground_kept(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_remove_outliers(ds, radius=3.0, elev_diff=10.0).to_pandas()
        assert 80.0 not in out["z"].values and -70.0 not in out["z"].values
        assert len(out) >= len(df) - 2 - 5  # nearly everything else kept


class TestGroundFilter:
    def test_roof_marked_off_ground(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_ground_point_filter(
            ds, radius=3.0, slope_threshold=30.0, height_threshold=1.0, classify=True
        ).to_pandas()
        roof = out[out["z"] > 5]
        # slope-based filters catch the roof EDGES (interior of a level
        # roof is locally flat — the reference documents this weakness);
        # edge band = within 1.5 of the footprint boundary
        edge = roof[
            (roof["x"] < 19.5) | (roof["x"] > 28.5) | (roof["y"] < 19.5) | (roof["y"] > 28.5)
        ]
        ground = out[(out["z"] < 2) & (out["z"] > -5) & (out["x"] < 15)]
        assert len(edge) and (edge["is_ground"] == 0).mean() > 0.6
        assert (ground["is_ground"] == 1).mean() > 0.95


class TestNormals:
    def test_plane_normals_vertical_ish(self, cloud):
        df, ds = cloud
        out = lidar2.normal_vectors(ds, radius=3.0).to_pandas()
        roof = out[out["z"] == 5.5]
        flat = roof[
            (roof["x"] > 21.5) & (roof["x"] < 26.5) & (roof["y"] > 21.5) & (roof["y"] < 26.5)
        ]  # interior: every neighbour within the radius is also roof
        assert (flat["nz"] > 0.999).all()
        norms = np.sqrt(out["nx"] ** 2 + out["ny"] ** 2 + out["nz"] ** 2)
        assert np.allclose(norms, 1.0, atol=1e-9)

    def test_hillshade_range(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_hillshade(ds, radius=3.0).to_pandas()
        assert out["hillshade"].between(0, 255).all()


class TestTophat:
    def test_roof_height_recovered(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_tophat(ds, radius=8.0).to_pandas()
        roof = out[out["z"] == 5.5]
        # structuring radius (8) exceeds the roof half-width (6), so the
        # opening recovers the ground surface under the roof
        assert roof["tophat"].median() > 3.0
        ground = out[(out["z"] < 2) & (out["x"] < 15)]
        assert ground["tophat"].abs().median() < 0.5


class TestSegmentation:
    def test_roof_and_ground_separate_segments(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_segmentation(ds, radius=3.0, norm_diff_deg=20.0, max_z_diff=0.5).to_pandas()
        roof = out[out["z"] == 5.5]
        ground = out[(out["z"] < 2) & (out["z"] > -5)]
        # roof forms one segment, distinct from the ground segment(s)
        assert roof["segment"].nunique() == 1
        assert set(roof["segment"]).isdisjoint(set(ground["segment"]))

    def test_ransac_finds_roof_plane(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_ransac_planes(ds, radius=4.0, threshold=0.1, min_inliers=10).to_pandas()
        roof = out[out["z"] == 5.5]
        assert (roof["model_id"] >= 0).mean() > 0.8


class TestPointStream:
    def test_flightline_edges(self, cloud):
        df, ds = cloud
        out = lidar2.find_flightline_edge_points(ds).to_pandas()
        for fl, grp in df.groupby("flightline"):
            m = grp["scan_angle"].abs().max()
            got = out[out["flightline"] == fl]
            assert (got["scan_angle"].abs() == m).all()

    def test_lidar_info(self, cloud):
        df, ds = cloud
        info = lidar2.lidar_info(ds)
        assert info["n"] == len(df)
        assert info["zmax"] == pytest.approx(df["z"].max())
        assert 0 in info["classes"]

    def test_point_stats_counts(self, cloud):
        df, ds = cloud
        out = lidar2.lidar_point_stats(ds, resolution=10.0).to_pandas()
        assert out["n"].sum() == len(df)

    def test_las_to_ascii_roundtrip_count(self, cloud):
        df, ds = cloud
        out = lidar2.las_to_ascii(ds).to_pandas()
        assert len(out) == len(df)
        assert len(out["line"].iloc[0].split()) >= 3

    def test_classify_subset(self, cloud):
        df, ds = cloud
        poly = {"xs": [0.0, 0.0, 15.0, 15.0, 0.0], "ys": [0.0, 15.0, 15.0, 0.0, 0.0]}
        out = lidar2.lidar_classify_subset(ds, poly, cls=2).to_pandas()
        inside = out[(out["x"] > 0.1) & (out["x"] < 14.9) & (out["y"] > 0.1) & (out["y"] < 14.9)]
        assert (inside["class_"] == 2).all()

    def test_multipoint_per_flightline(self, cloud):
        df, ds = cloud
        out = lidar2.las_to_multipoint_shapefile(ds).to_pandas()
        assert len(out) == df["flightline"].nunique()
        assert sum(len(v) for v in out["xs"]) == len(df)


class TestColourize:
    def test_sample_tile_values(self, ray_session):
        from whitebox_tools_ray.kernels import codecs
        from whitebox_tools_ray.sources import tiles as tsrc

        spec = tsrc.SceneSpec(tiles_x=2, tiles_y=2, tile_px=8, seed=1)
        gs = spec.grid_spec()
        rows = []
        for tr in range(2):
            for tc in range(2):
                g = np.full((8, 8), float(tr * 2 + tc))
                rows.append(
                    {"tile_row": tr, "tile_col": tc, "bytes": codecs.encode_tile(g, "f32"), "fmt": "f32"}
                )
        tiles = rd.from_pandas(pd.DataFrame(rows))
        pts = pd.DataFrame(
            {
                "x": [gs.west + 2 * spec.res, gs.west + 10 * spec.res],
                "y": [gs.north - 2 * spec.res, gs.north - 10 * spec.res],
                "z": [0.0, 0.0],
                "pid": [0, 1],
            }
        )
        out = lidar2.lidar_colourize(rd.from_pandas(pts), tiles, spec).to_pandas().sort_values("pid")
        assert out["colour"].tolist() == [0.0, 3.0]
