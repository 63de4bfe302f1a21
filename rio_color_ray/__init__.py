"""rio_color_ray — a Ray-Data-native spatial-join + tiling + color engine.

A from-scratch engine (NOT a port) with the pixel-math capabilities of
mapbox/rio-color (reference at /root/reference, v2.0.1) re-expressed as
vectorized numpy kernels inside Ray Data ``map_batches`` stages, plus the
spatial core mandated by BASELINE.json: H3-style / S2-style cell indexing,
point-in-polygon joins, kNN via cell-ring expansion, cell aggregation with
salted shuffles, raster-tile materialization, dedup / text-analysis /
similarity-search operators for web-scale corpora, and per-partition
lineage + resume.

Subpackages
-----------
color      -- numerically exact reimplementation of rio-color's operators
              (reference: rio_color/operations.py, colorspace.pyx, utils.py)
spatial    -- cell indexes (hex hierarchy + quadsphere), R-tree, PIP, kNN
sources    -- deterministic synthetic pages/tiles/polygons generators
stages     -- Ray Data map_batches stage callables (stateless fns + actor classes)
pipelines  -- end-to-end Dataset pipelines (flagship, relational, dedup, ann)
state      -- lineage records, checkpointed writes, resume
"""

__version__ = "0.1.0"

# Ray 2.49's block concat tries `hash(pa.Schema)` as a dedup fast path
# (ray/data/_internal/arrow_ops/transform_pyarrow.py:175) and pyarrow
# raises "unhashable type: 'dict'" for any schema carrying pandas
# metadata — which every pandas-written parquet (all the driver's
# testdata) does. Ray catches it and falls back correctly, but logs a
# WARNING per concat from every worker. Filter THAT message only (not
# the whole logger: the same module warns on genuinely divergent
# schemas, which we want to see); io.read_table additionally strips the
# metadata so most paths never hit it.
import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    def filter(self, record):  # noqa: A003 - logging API name
        return not str(record.getMessage()).startswith(
            "Failed to hash the schemas"
        )


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoiseFilter())

# Every exchange in this engine wants hash partitioning (key colocation,
# no ordering); applied at import so the driver's own `ray.init` +
# `queries()` calls get the tuned executor too. Measurements: ctx.py.
try:  # pragma: no cover - trivial guard
    from .ctx import tune_data_context

    tune_data_context()
except Exception as _e:  # noqa: BLE001 — a DataContext rename / kwarg change
    # must degrade to Ray's defaults with a warning, never abort import
    import warnings

    warnings.warn(
        f"rio_color_ray: DataContext tuning failed ({_e!r}); running with "
        "Ray's default shuffle strategy — see rio_color_ray/ctx.py",
        RuntimeWarning,
        stacklevel=2,
    )
