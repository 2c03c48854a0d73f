"""whitebox_tools_ray — a from-scratch Ray-Data-native spatial-join + tiling engine.

Re-expresses the query / data-processing surface of WhiteboxTools
(reference surveyed in SURVEY.md) as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches:

- ``kernels``   — pure-NumPy geometry / grid / cell-index / codec kernels
                  (no Ray imports; unit-testable in isolation).
- ``sources``   — deterministic synthetic fixture generators + readers
                  (tile tables, polygon/point layers, DEM grids).
- ``stages``    — Ray Data batch transforms (assign, spatial join, clip,
                  zonal stats, focal filters, flow accumulation, dedup,
                  text analysis, ANN, scalar math ops).
- ``state``     — per-partition lineage manifests for resumable runs.
- ``pipelines`` — end-to-end composed pipelines (the flagship
                  read → decode/assign → spatial-join → write path).

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
hosting process owns the Ray session.
"""

__version__ = "0.1.0"
