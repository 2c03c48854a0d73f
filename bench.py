"""Benchmark harness — prints ONE JSON line per run (driver contract).

Headline = the BASELINE.md measured path:
  1. tiling stage: synthetic tile table → decode/verify → key assignment
     → partitioned parquet with manifest checkpointing (tiles/sec);
  2. spatial-join stage: deterministic point layer from
     $GRAFT_SF_DIR/lineitem clipped against the fixture polygon layer
     (join output rows/sec);
plus a timed subset of the relational query suite.

Usage:
  python bench.py                  # one measured run
  python bench.py --scaling        # fresh 8-CPU and 32-CPU processes,
                                   # reports throughputs + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32),
     BENCH_TILES    (default "32x32x128" = tiles_x x tiles_y x tile_px).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from whitebox_tools_ray.pipelines import relational as R
    from whitebox_tools_ray.pipelines.flagship import run_tiling_pipeline, synthesize_tiles_parallel
    from whitebox_tools_ray.sources.tiles import SceneSpec
    from whitebox_tools_ray.sources.vectors import fixture_polygons
    from whitebox_tools_ray.stages.spatial_join import clip_points

    tx, ty, tpx = (int(v) for v in os.environ.get("BENCH_TILES", "128x128x128").split("x"))
    spec = SceneSpec(tiles_x=tx, tiles_y=ty, tile_px=tpx)
    fmt = os.environ.get("BENCH_FMT", "png")
    tiles_path = f"/tmp/wbt_bench/tiles_{tx}x{ty}x{tpx}_{fmt}"
    if not os.path.isdir(tiles_path) or not os.listdir(tiles_path):
        synthesize_tiles_parallel(spec, tiles_path, fmt=fmt)

    queries: dict[str, float] = {}

    # 0. untimed warmup: spin up the worker pool so steady-state throughput
    # is measured, not process startup (cluster boot isn't part of the
    # BASELINE metric)
    import numpy as _np
    import pyarrow as _pa
    import ray.data as _rd

    def _warm(b: "_pa.Table") -> "_pa.Table":
        _ = _np.sin(_np.arange(2000.0)).sum()
        return b

    _rd.range(100_000, override_num_blocks=num_cpus * 4).map_batches(
        _warm, batch_format="pyarrow"
    ).count()

    # 1. tiling stage (fresh output dir each run — measure full work)
    out_dir = f"/tmp/wbt_bench/out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    tiling = run_tiling_pipeline(tiles_path, out_dir, spec, num_bands=4, read_blocks=num_cpus * 2)
    t_tiling = time.time() - t0
    queries["tiling"] = round(t_tiling, 3)

    # 2. spatial-join stage (point layer replicated BENCH_JOIN_MULT times
    # with disjoint record_id ranges so the join is a real workload)
    mult = int(os.environ.get("BENCH_JOIN_MULT", "8"))
    polys = fixture_polygons()  # frame [0,1000]² matches the synth points

    def points_multiplied():
        # single-operator replication: one flat map emits `mult` shifted
        # copies per batch (Dataset.union with many branches was measured
        # to anti-scale at 32 CPUs — multi-branch scheduling overhead)
        import numpy as np
        import pyarrow as pa

        def replicate(b: "pa.Table") -> "pa.Table":
            rid = b["record_id"].to_numpy(zero_copy_only=False)
            parts = []
            for k in range(mult):
                t = b.set_column(
                    b.schema.get_field_index("record_id"),
                    "record_id",
                    pa.array(rid + k * 100_000_000, pa.int64()),
                )
                parts.append(t)
            return pa.concat_tables(parts)

        return R.synth_points(sf_dir).map_batches(replicate, batch_format="pyarrow", batch_size=65536)

    t0 = time.time()
    joined = clip_points(points_multiplied(), polys, renumber_fid=True)
    join_rows = joined.count()
    t_join = time.time() - t0
    queries["spatial_join"] = round(t_join, 3)

    # 3. query-suite subset
    for name, fn in [
        ("pricing_summary", R.q_pricing_summary),
        ("zonal_stats", R.q_zonal_stats),
        ("cell_binning", R.q_cell_binning),
        ("tile_assign", R.q_tile_assign),
        ("join_bucketed", R.q_join_bucketed),
        ("dedup_exact", R.q_dedup_exact),
        ("ann_topk", R.q_ann_topk),
    ]:
        t0 = time.time()
        out = fn(sf_dir)
        _ = out.to_pandas() if hasattr(out, "to_pandas") else out
        queries[name] = round(time.time() - t0, 3)

    # headline = the BASELINE.md measured path (tiling + spatial join);
    # the query suite is reported alongside but not part of the scaling
    # criterion's numerator
    headline = queries["tiling"] + queries["spatial_join"]
    result = {
        "metric": "headline pipeline wall time (tiling + spatial join)",
        "value": round(headline, 3),
        "suite_total_sec": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "tiles_per_s": round(tiling["tiles_per_s"], 1),
        "join_rows": int(join_rows),
        "join_rows_per_s": round(join_rows / t_join, 1) if t_join else 0.0,
    }
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    return result


def run_scaling(repeats: int | None = None) -> dict:
    """BASELINE.md protocol: fresh processes per config, ≥3 repeats,
    MEDIAN (this box carries noisy background load — load avg ≈5 idle).
    BENCH_REPEATS overrides the repeat count (long 4×-input runs)."""
    import statistics

    if repeats is None:
        repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def median_runs(ncpu: int) -> dict:
        runs = [one(ncpu) for _ in range(repeats)]
        keyed = sorted(runs, key=lambda r: r["value"])
        return keyed[len(keyed) // 2]

    one(8)  # untimed warmup: page cache + tile-table generation
    lo = median_runs(8)
    hi = median_runs(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling efficiency (8 vs 32 CPUs, fresh processes, median of 3)",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "tiles_per_s_8": lo["tiles_per_s"],
        "tiles_per_s_32": hi["tiles_per_s"],
        "join_rows_per_s_8": lo["join_rows_per_s"],
        "join_rows_per_s_32": hi["join_rows_per_s"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
