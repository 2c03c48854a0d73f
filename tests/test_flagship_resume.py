"""Flagship pipeline: checkpoint manifests and resume-skip behavior."""

import json
import os
import shutil

import pytest

from whitebox_tools_ray.pipelines.flagship import run_tiling_pipeline, synthesize_tiles_parallel
from whitebox_tools_ray.sources.tiles import SceneSpec
from whitebox_tools_ray.state.manifest import Manifest


@pytest.fixture(scope="module")
def tiny_scene(ray_session, tmp_path_factory):
    spec = SceneSpec(tiles_x=4, tiles_y=4, tile_px=16)
    path = str(tmp_path_factory.mktemp("tiles") / "t")
    synthesize_tiles_parallel(spec, path, num_bands=2)
    return spec, path


class TestResume:
    def test_manifest_written_and_resume_skips(self, tiny_scene, tmp_path):
        spec, tiles_path = tiny_scene
        out = str(tmp_path / "out")
        m1 = run_tiling_pipeline(tiles_path, out, spec, num_bands=2)
        assert m1["tiles"] == 16
        assert m1["bands_skipped"] == 0
        man = os.path.join(out, "MANIFEST.jsonl")
        recs = [json.loads(l) for l in open(man)]
        assert len(recs) == 2
        assert all(r["rows_out"] > 0 and r["content_hash"] for r in recs)
        # rerun: everything skipped, nothing recomputed
        m2 = run_tiling_pipeline(tiles_path, out, spec, num_bands=2)
        assert m2["bands_skipped"] == 2
        assert m2["tiles"] == 0

    def test_partial_resume(self, tiny_scene, tmp_path):
        spec, tiles_path = tiny_scene
        out = str(tmp_path / "out2")
        run_tiling_pipeline(tiles_path, out, spec, num_bands=2)
        # simulate a crash that lost band 1's manifest line (bands run
        # concurrently → line order is nondeterministic, so select by id)
        man = os.path.join(out, "MANIFEST.jsonl")
        recs = [json.loads(l) for l in open(man)]
        keep = [r for r in recs if r["partition_id"] == "band0000"]
        with open(man, "w") as f:
            f.write(json.dumps(keep[0]) + "\n")
        shutil.rmtree(os.path.join(out, "band0001"))
        m = run_tiling_pipeline(tiles_path, out, spec, num_bands=2)
        assert m["bands_skipped"] == 1
        assert m["tiles"] == 8  # only the lost band recomputed
        assert os.path.isdir(os.path.join(out, "band0001"))

    def test_params_change_invalidates(self, tiny_scene, tmp_path):
        spec, tiles_path = tiny_scene
        out = str(tmp_path / "out3")
        run_tiling_pipeline(tiles_path, out, spec, num_bands=2, quad_level=12)
        m = run_tiling_pipeline(tiles_path, out, spec, num_bands=2, quad_level=10)
        # different params_hash → no skips
        assert m["bands_skipped"] == 0

    def test_torn_tail_line_ignored(self, tmp_path):
        man = Manifest(str(tmp_path / "m.jsonl"), run_params={"a": 1})
        man.record("p0", (0, 1), 5, 5, 0.1, "/tmp/x")
        with open(man.path, "a") as f:
            f.write('{"partition_id": "p1", "key_ra')  # crash mid-write
        assert man.completed() == {"p0"}
