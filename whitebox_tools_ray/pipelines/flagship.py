"""The flagship pipeline: read tiles → decode/verify → assign keys →
spatial join → partitioned parquet, checkpointed per partition.

This is the measured path of BASELINE.md: tiles/sec through the tiling
stage and join-output rows/sec through the spatial-join stage, with
per-partition manifest checkpointing INCLUDED in the measured time.

Partitioning for resume: the tile table is processed in ``tile_row``
bands (one partition = one band of tile rows ≈ one key range). Each band
is a filtered parquet read (row-group pushdown on tile_row) → streamed
pipeline → atomic output dir + manifest line. A rerun skips finished
bands. At cluster scale each band is itself hundreds of blocks, so the
driver loop adds no serialization — bands just bound the blast radius of
a failure and give the resume grain.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels.grid import TileGrid
from ..sources import tiles as tsrc
from ..stages.assign import DecodeVerifyReencode, make_assign_fn
from ..state.manifest import Manifest, dir_content_hash


def _patch_fsspec_http_probe():
    """Make Ray's fsspec-HTTP filesystem probe thread-safe in this env.

    ``fsspec.implementations.http`` raises ModuleNotFoundError (aiohttp
    absent). Ray's ``_is_http_filesystem`` catches exactly that — but
    when two THREADS construct datasets concurrently, the second import
    attempt can observe the first's partially-initialized module and
    raise a bare ImportError instead, which escapes. Wrap the probe to
    treat any import failure as "not an HTTP filesystem"."""
    try:
        from ray.data.datasource import path_util

        orig = path_util._is_http_filesystem

        def safe(fs):
            try:
                return orig(fs)
            except Exception:
                return False

        if getattr(path_util._is_http_filesystem, "__name__", "") != "safe":
            path_util._is_http_filesystem = safe
    except Exception:
        pass


def synthesize_tiles_parallel(spec: tsrc.SceneSpec, out_path: str, fmt: str = "f32", num_bands: int = 4,
                              rows_per_file: int = 512):
    """Generate a scene's tile table WITH Ray (NewRasterFromBase analog):
    range over tile ids → per-batch field evaluation + encode → parquet,
    laid out one directory per tile-row band (``band=K/``) so the banded
    tiling pipeline reads exactly its own partition — the layout a
    resumable 100 TB ingest would use."""
    import ray.data as rd

    n = spec.tiles_x * spec.tiles_y

    def synth(batch: pa.Table) -> pa.Table:
        from ..kernels import codecs, phash

        ids = batch["id"].to_numpy(zero_copy_only=False)
        cols: dict[str, list] = {name: [] for name in tsrc.TILE_SCHEMA.names}
        for idx in ids:
            tr, tc = int(idx) // spec.tiles_x, int(idx) % spec.tiles_x
            grid = spec.tile_grid(tr, tc)
            cols["image_id"].append(f"img{spec.scene:02d}{int(idx):06d}")
            cols["bytes"].append(codecs.encode_tile(grid, fmt))
            cols["w"].append(spec.tile_px)
            cols["h"].append(spec.tile_px)
            cols["fmt"].append(fmt)
            cols["caption"].append(tsrc.caption_for(tr, tc, spec.scene))
            cols["phash"].append(phash.phash64(grid))
            cols["west"].append(spec.west + tc * spec.tile_px * spec.res)
            cols["north"].append(spec.north - tr * spec.tile_px * spec.res)
            cols["res_x"].append(spec.res)
            cols["res_y"].append(spec.res)
            cols["nodata"].append(spec.nodata)
            cols["epsg"].append(26918)
            cols["tile_row"].append(tr)
            cols["tile_col"].append(tc)
            cols["scene"].append(spec.scene)
        return pa.Table.from_arrays(
            [pa.array(cols[k], type=tsrc.TILE_SCHEMA.field(k).type) for k in tsrc.TILE_SCHEMA.names],
            schema=tsrc.TILE_SCHEMA,
        )

    band_edges = np.linspace(0, spec.tiles_y, num_bands + 1).astype(int)
    for b in range(num_bands):
        lo, hi = int(band_edges[b]), int(band_edges[b + 1])
        ids_lo, ids_hi = lo * spec.tiles_x, hi * spec.tiles_x
        if ids_lo == ids_hi:
            continue
        # one BLOCK per rows_per_file rows: write_parquet emits one file
        # per block (min_rows_per_file only merges, never splits), so
        # this is the only way to actually control the output file
        # count — and file count IS the downstream tiling pipeline's
        # task granularity (it fuses one task per file). The previous
        # range default yielded 16 files/band = 16 fused tasks, which
        # at 32 CPUs x 2 bands in flight is exactly one task wave with
        # zero straggler slack (measured: long 90%-idle stretches).
        n_blocks = max(1, -(-(ids_hi - ids_lo) // rows_per_file))
        ds = rd.range(ids_hi - ids_lo, override_num_blocks=n_blocks).map_batches(
            lambda t, off=ids_lo: synth(t.set_column(0, "id", pa.array(t["id"].to_numpy(zero_copy_only=False) + off))),
            batch_format="pyarrow",
            batch_size=32,
        )
        # bound the file count: many tiny parquet files make every
        # downstream read pay per-file metadata costs — and, because the
        # tiling pipeline fuses read->assign->decode->write ONE TASK PER
        # FILE, rows_per_file IS the pipeline's block granularity: the
        # streaming executor's per-block driver cost is a measured
        # anti-scaling term on one node (same total work at 64 vs 256
        # blocks: 0.70 vs 0.43 efficiency 8->32 CPUs), so larger files
        # amortize it
        ds.write_parquet(os.path.join(out_path, f"band={b}"),
                         min_rows_per_file=rows_per_file)
    return out_path


def run_tiling_pipeline(
    input_path: str,
    out_dir: str,
    spec: tsrc.SceneSpec,
    num_bands: int = 4,
    quad_level: int = 12,
    hex_res: int = 7,
    decode: bool = True,
    resume: bool = True,
    read_blocks: int | None = None,
    bands_in_flight: int = 3,
) -> dict:
    """Banded, checkpointed tiling stage. Returns metrics dict."""
    import pyarrow.compute as pc
    import ray.data as rd

    gs = spec.grid_spec()
    # honor the reference's 32767-output-tile cap (lidar_tile.rs:265-270)
    # by coarsening the assignment grid for large scenes: group k×k scene
    # tiles per output tile so the tile count stays under the cap
    group = 1
    while (spec.tiles_x // group + 1) * (spec.tiles_y // group + 1) > 32767:
        group *= 2
    tg = TileGrid.from_extent(
        gs.west,
        gs.east,
        gs.south,
        gs.north,
        spec.tile_px * spec.res * group,
        spec.tile_px * spec.res * group,
        origin_x=gs.west,
        origin_y=gs.south,
    )
    manifest = Manifest(
        os.path.join(out_dir, "MANIFEST.jsonl"),
        run_params={
            "input": input_path,
            "bands": num_bands,
            "quad_level": quad_level,
            "hex_res": hex_res,
            "decode": decode,
        },
    )
    done = manifest.completed() if resume else set()
    band_edges = np.linspace(0, spec.tiles_y, num_bands + 1).astype(int)
    skipped = 0
    to_run: list[tuple[int, str, int, int]] = []
    for b in range(num_bands):
        pid = f"band{b:04d}"
        lo, hi = int(band_edges[b]), int(band_edges[b + 1])
        if lo == hi:
            continue
        if pid in done:
            skipped += 1
            continue
        to_run.append((b, pid, lo, hi))

    import threading

    _patch_fsspec_http_probe()
    manifest_lock = threading.Lock()

    def run_band(b: int, pid: str, lo: int, hi: int) -> int:
        t0 = time.time()
        band_dir = os.path.join(input_path, f"band={b}")
        if os.path.isdir(band_dir):
            # partition-pruned read: this band's files only. Default to ONE
            # block per file: matching override_num_blocks to the file count
            # keeps read->assign->decode->write FUSED into a single task
            # (measured: auto-split breaks fusion and the decoded payloads
            # round-trip through the object store — 2x the band's CPU and
            # a large page-fault/TLB load at 32 CPUs)
            if read_blocks is None:
                n_files = sum(1 for f in os.listdir(band_dir) if f.endswith(".parquet"))
                blocks = {"override_num_blocks": n_files} if n_files else {}
            else:
                blocks = {"override_num_blocks": read_blocks}
            ds = rd.read_parquet(band_dir, **blocks)
        else:
            ds = rd.read_parquet(
                input_path,
                filter=(pc.field("tile_row") >= lo) & (pc.field("tile_row") < hi),
                **({"override_num_blocks": read_blocks} if read_blocks else {}),
            )
        ds = ds.map_batches(make_assign_fn(tg, quad_level, hex_res), batch_format="pyarrow")
        if decode:
            # decode carries no per-actor state -> STATELESS task pool
            # (elastic, no actor churn across bands). NO batch_size:
            # block-sized batches are zero-copy — an explicit batch_size
            # forces a rebatch that was measured at 2.3 s per band of
            # pure slicing overhead at 32 CPUs
            dec = DecodeVerifyReencode("q16", False)
            ds = ds.map_batches(lambda b2: dec(b2), batch_format="pyarrow")
        part_dir = os.path.join(out_dir, pid)
        ds.write_parquet(part_dir)
        rows = sum(
            pq.read_metadata(os.path.join(part_dir, f)).num_rows
            for f in os.listdir(part_dir)
            if f.endswith(".parquet")
        )
        dt = time.time() - t0
        with manifest_lock:
            manifest.record(
                pid,
                (lo, hi),
                rows_in=rows,
                rows_out=rows,
                wall_s=dt,
                output_uri=part_dir,
                content_hash=dir_content_hash(part_dir),
            )
        return rows

    # THREE bands in flight: one streaming executor per band thread, the
    # others overlap their reads/writes with the first's compute. On the
    # 16-files-per-band layout 2-way was fastest (4-way pinned the
    # driver at 24 s); re-measured on the round-5 128-files-per-band
    # layout at 512×512×128, 3-way wins at BOTH CPU levels (32 CPUs:
    # 11.2/12.0 s vs 13.8/17.7 s 2-way; 8 CPUs: 26.7/30.2 vs 28.2/32.3)
    # — finer tasks leave straggler slack that a third executor fills
    # without pinning the driver. Keeps the per-band resume grain.
    t_all = time.time()
    total_tiles = 0
    if to_run:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(to_run), bands_in_flight)) as ex:
            for rows in ex.map(lambda args: run_band(*args), to_run):
                total_tiles += rows
    total_s = time.time() - t_all
    return {
        "tiles": total_tiles,
        "wall_s": total_s,
        "tiles_per_s": total_tiles / total_s if total_s else 0.0,
        "bands_skipped": skipped,
    }
